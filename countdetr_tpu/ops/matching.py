"""Batched on-device assignment (Hungarian replacement).

The reference solves matching with scipy's linear_sum_assignment on the CPU
inside the training loop — a device->host round trip per image per step
(reference 2nd-stage matcher.py:243-246). Here matching is a jit-compatible
Bertsekas forward auction, vmapped over the batch, so the whole train step is
one XLA program.

Algorithm choice (measured on v5e, B=8 Q=600 T=128):
  * square reduction with dummy bidders + eps-scaling: EXACT but the
    ~(Q - T) dummy bidders fight price wars at tiny eps — 7.6 s/call;
  * single-phase ASYMMETRIC forward auction, persons = valid targets only,
    zero initial prices, fixed eps = span/1000: 4-2000 Jacobi rounds,
    ~5-500 ms/call, with measured optimality gaps <= 0.05% of |optimal| on
    random, rank-1-degenerate, clustered, and early-training-DETR cost
    structures (tests/test_matching.py re-checks vs scipy).
Zero initial prices are what make the single fixed-eps phase valid for the
asymmetric problem (eps-scaling with carried prices loses the guarantee when
T < Q: unassigned objects keep stale prices).

Interface: costs are (Q, T) like the reference's (num_queries, num_targets)
matrix. When T <= Q every valid target gets a distinct query. When T > Q
(FSC-147 train images run to ~3.7k dots vs 576 grid queries) the reference's
scipy LAP assigns the best min(Q, T) pairs (reference 2nd-stage
matcher.py:243-246 on the rectangular matrix); here the auction is
TRANSPOSED — all Q queries bid over the T targets (invalid slots act as
uniformly-terrible dummy objects), so exactly min(Q, #valid) targets win a
query, the rectangular-LAP optimum — and `matched` marks the winners.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30

# startup-only knob (read once at import, like COUNTDETR_PALLAS_VARIANT):
#   auto (default)  - fused Pallas auction on a single-device TPU process
#   off             - always the XLA while_loop body
#   interpret       - Pallas in interpreter mode (CPU tests)
PALLAS_AUCTION = os.environ.get("COUNTDETR_PALLAS_AUCTION", "auto")

# Square-reduction eps-scaling for the T > Q dense tiers (round 5,
# VERDICT r3 next #3). Plain eps-scaling (carry prices across shrinking-eps
# phases) is UNSOUND on the asymmetric problem: the optimality proof needs
# "positively-priced => assigned" at termination, and a phase reset leaves
# objects priced-but-unassigned (measured: 80%+ optimality gaps). Padding
# the persons side with zero-benefit dummy rows makes the problem square,
# where every object ends assigned and scaling is the textbook-sound
# Bertsekas schedule. The round-1 attempt at squaring (PERFORMANCE.md
# "What mattered" #2) died at 7.6 s/call because its ~472 IDENTICAL dummy
# rows all bid the same cheapest object each Jacobi round — one winner per
# round, fully serialized; here each dummy row carries deterministic
# sub-eps noise (_dummy_rows_unit) so their first-round argmaxes
# decorrelate. The noise perturbs the squared objective by
# <= (T-Q) * eps/2, within the eps-CS slack the matcher already accepts
# (tests re-check gaps vs scipy). Applied only where shapes allow it:
# T > Q and T*T within the Pallas VMEM budget (the 4096 tier keeps the
# single-phase asymmetric form).
#
# DEFAULT OFF — measured a net regression on v5e at the dense-tier
# geometry (B8 Q576 T700, cli/bench.py --mode match, Pallas route,
# same-day A/B, PERFORMANCE.md round-5 post-mortem): the hard degenerate
# structure improves 546 -> 486 ms but random regresses 3.9 -> 423 ms and
# DETR-shaped 15.4 -> 239 ms. Two structural taxes: (1) every phase restarts
# the full assignment, so easy costs pay ~#phases x their single-phase
# round count; (2) the sub-eps noise only decorrelates dummies while
# prices are still flat — once prices separate by O(eps) the ~(T-Q)
# dummies chase the single cheapest object one-win-per-round, a
# serialization floor that applies per phase. Fixing (2) soundly needs
# price-lowering reverse-auction iterations (Bertsekas-Castanon
# asymmetric), not a bigger noise budget (optimality caps noise at
# eps-scale). Kept env-gated for experiments: COUNTDETR_AUCTION_SCALING=1.
AUCTION_SCALING = os.environ.get("COUNTDETR_AUCTION_SCALING", "0") == "1"


def _square_scaling_ok(Q: int, T: int) -> bool:
    if not AUCTION_SCALING or T <= Q:
        return False
    from countdetr_tpu.ops.pallas import auction_kernel

    return T * T <= auction_kernel.MAX_ELEMS


def _dummy_rows_unit(n_dummy: int, n_obj: int):
    """Deterministic unit-scale noise block (n_dummy, n_obj) in [0, 1) for
    the square reduction's dummy bidder rows — callers scale by eps/2. A
    cheap multiplicative hash keyed on (row, col) so every dummy row's
    argmax lands on a different object (identical rows would serialize the
    Jacobi auction: one winner per round)."""
    di = jnp.arange(n_dummy, dtype=jnp.uint32)[:, None]
    dj = jnp.arange(n_obj, dtype=jnp.uint32)[None, :]
    h = di * jnp.uint32(2654435761) + dj * jnp.uint32(2246822519)
    h = (h >> jnp.uint32(12)) & jnp.uint32(0xFFFFF)
    return h.astype(jnp.float32) * (1.0 / float(1 << 20))


def _pallas_auction_mode(
    persons: int, objects: int, sharded: bool = False
) -> str | None:
    """Route to the VMEM-resident kernel (ops/pallas/auction_kernel.py) when
    it applies: the benefit block must fit the kernel's VMEM budget, and
    pallas_call has no SPMD partitioning rule of its own, so multi-device
    programs only take the kernel when the caller provides a mesh to
    shard_map it over (`sharded`); otherwise they keep the partitionable
    XLA body."""
    if PALLAS_AUCTION == "off":
        return None
    from countdetr_tpu.ops.pallas import auction_kernel

    if persons * objects > auction_kernel.MAX_ELEMS:
        return None
    if PALLAS_AUCTION == "interpret":
        return "interpret"
    if jax.default_backend() == "tpu" and (
        (jax.device_count() == 1 and jax.process_count() == 1) or sharded
    ):
        return "tpu"
    return None


# eps-scaling schedule for the SQUARE path (_auction(scaling=True)):
# eps_0 = SCALE_START * eps_final, divided by SCALE_THETA at each phase
# boundary (everyone assigned), carrying prices — 512/8 gives 4 phases.
# Sound only on square all-active problems (see AUCTION_SCALING note).
SCALE_START = 512.0
SCALE_THETA = 8.0


def _auction(benefit, active, eps, max_iters, scaling=False):
    """Jacobi (all-bidders-at-once) forward auction.

    benefit: (T, Q) value of object q for person t; active: (T,) persons that
    must be assigned. Returns assigned (T,) object per person (-1 possible
    only if max_iters was hit).

    The round body is all DENSE (T, Q) ops — no scatters. TPU A/B at
    (B8, 576x700): scatter-based second-best masking / assignment rebuild
    run ~1.7x slower (406 -> 239 ms on a 1629-round degenerate cost,
    210 -> 126 ms on an 835-round init-model cost); scatter-max bid
    resolution and top_k variants are far worse still (300-1400 ms). Round
    count, not round cost, is the remaining ceiling: contention on
    near-identical rows needs O(1000) rounds at eps = span/1000 — the
    square T > Q tiers attack that with eps-scaling (`scaling=True`:
    start at SCALE_START * eps, divide by SCALE_THETA each time everyone
    is assigned, carry prices, unassign, repeat until eps reaches final;
    ONLY sound when the problem is square with every person active — see
    the AUCTION_SCALING module note), while sparse images route to small-T
    box tiers (data/batching.py box_tiers) that converge in tens of rounds.
    """
    T, Q = benefit.shape
    owner0 = jnp.full((Q,), -1, dtype=jnp.int32)
    assigned0 = jnp.where(active, -1, 0).astype(jnp.int32)
    prices0 = jnp.zeros((Q,), dtype=benefit.dtype)
    iota_q = jnp.arange(Q, dtype=jnp.int32)
    iota_t = jnp.arange(T, dtype=jnp.int32)
    eps_fin = jnp.asarray(eps, benefit.dtype)
    eps0 = eps_fin * (SCALE_START if scaling else 1.0)

    def cond(state):
        i, owner, assigned, prices, cur_eps = state
        done = ~jnp.any((assigned < 0) & active)
        return jnp.logical_and(
            i < max_iters, ~(done & (cur_eps <= eps_fin * 1.5))
        )

    def body(state):
        i, owner, assigned, prices, cur_eps = state
        eps = cur_eps
        unassigned = (assigned < 0) & active

        values = benefit - prices[None, :]  # (T, Q)
        q1 = jnp.argmax(values, axis=1)
        v1 = jnp.take_along_axis(values, q1[:, None], axis=1)[:, 0]
        masked = jnp.where(iota_q[None, :] == q1[:, None], NEG_INF, values)
        v2 = jnp.max(masked, axis=1)
        v2 = jnp.where(v2 > NEG_INF / 2, v2, v1 - 1.0)  # Q == 1 fallback
        # bid for object q1: benefit[t, q1] - v2 + eps. Since benefit[t, q1]
        # == v1 + prices[q1], post prices + (v1 - v2 + eps) on column q1 —
        # no gather, and the SAME f32 expression as the Pallas kernel (the
        # algebraically-equal gather form drifts by 1 ulp after many scaled
        # phase updates, breaking the bit-identity the kernel tests pin).
        incr = v1 - v2 + eps  # (T,)

        # per object, the highest simultaneous bidder wins
        bid_matrix = jnp.where(
            unassigned[:, None] & (q1[:, None] == iota_q[None, :]),
            prices[None, :] + incr[:, None],
            NEG_INF,
        )
        winner_bid = jnp.max(bid_matrix, axis=0)
        winner_t = jnp.argmax(bid_matrix, axis=0).astype(jnp.int32)
        has_winner = winner_bid > NEG_INF / 2

        new_owner = jnp.where(has_winner, winner_t, owner)
        new_prices = jnp.where(has_winner, winner_bid, prices)

        # rebuild assignment from ownership, densely: person t owns object
        # q iff new_owner[q] == t (each person owns <= 1 object)
        own_mat = new_owner[None, :] == iota_t[:, None]  # (T, Q)
        assigned_new = jnp.max(
            jnp.where(own_mat, iota_q[None, :], -1), axis=1
        )
        assigned_new = jnp.where(active, assigned_new, 0)

        # eps-scaling phase boundary (no-op when scaling=False: cur_eps
        # stays at eps_fin so shrink is constant-false): everyone assigned
        # but eps still above final -> shrink eps, keep PRICES, restart the
        # assignment. Carried prices are what make the next phase short.
        done = ~jnp.any((assigned_new < 0) & active)
        shrink = done & (cur_eps > eps_fin * 1.5)
        next_eps = jnp.where(
            shrink, jnp.maximum(cur_eps / SCALE_THETA, eps_fin), cur_eps
        )
        new_owner = jnp.where(shrink, owner0, new_owner)
        assigned_new = jnp.where(shrink, assigned0, assigned_new)
        return (i + 1, new_owner, assigned_new, new_prices, next_eps)

    _, _, assigned, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), owner0, assigned0, prices0, eps0)
    )
    return assigned


def auction_lap(
    cost: jnp.ndarray,  # (Q, T)
    tgt_valid: jnp.ndarray,  # (T,) bool
    eps_frac: float = 1e-3,
    iters_cap: int | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assign distinct queries to targets, minimizing total cost (within
    T * eps of optimal). Returns (tgt2query (T,) int32, matched (T,) bool).

    T <= Q: every valid target is matched (matched == tgt_valid).
    T > Q: rectangular-LAP semantics — the auction transposes (queries bid
    over targets), so exactly min(Q, #valid) targets win a query (matching
    the reference's scipy behavior on rectangular costs, 2nd-stage
    matcher.py:243-246) and `matched` marks the winners.
    """
    Q, T = cost.shape
    if T <= Q:
        span = jnp.maximum(jnp.max(cost) - jnp.min(cost), 1e-3)
        benefit = jnp.where(tgt_valid[:, None], -cost.T, 0.0)  # (T, Q)
        if iters_cap is None:
            iters_cap = 16 * T + 2048
        assigned = _auction(benefit, tgt_valid, span * eps_frac, iters_cap)
        return jnp.where(tgt_valid, jnp.clip(assigned, 0), 0), tgt_valid

    # T > Q: transpose the auction — queries become the bidders (persons),
    # targets the objects. Every query wins a distinct target, so exactly
    # min(Q, #valid) valid targets end up matched — the rectangular-LAP
    # optimum the reference's scipy call computes. Invalid target slots act
    # as uniformly-terrible dummy objects (value -big, below any reachable
    # price) that absorb overflow queries when #valid < Q. Dense tiers
    # square the problem with noise-decorrelated dummy bidders so the
    # eps-scaled schedule applies (see AUCTION_SCALING note).
    squared = _square_scaling_ok(Q, T)
    span = jnp.maximum(jnp.max(cost) - jnp.min(cost), 1e-3)
    eps = span * eps_frac
    big = (span + eps * (SCALE_START if squared else 1.0)) * (
        (T if squared else Q) + 2
    )  # above the max possible price escalation
    benefit = jnp.where(tgt_valid[None, :], -cost, -big)
    if iters_cap is None:
        iters_cap = 16 * T + 2048
    if squared:
        dummies = _dummy_rows_unit(T - Q, T) * (eps * 0.5)
        benefit = jnp.concatenate(
            [benefit, dummies.astype(benefit.dtype)], axis=0
        )  # (T, T)
        assigned = _auction(
            benefit, jnp.ones((T,), bool), eps, iters_cap, scaling=True
        )[:Q]
    else:
        assigned = _auction(
            benefit, jnp.ones((Q,), bool), eps, iters_cap
        )  # (Q,) target index per query
    q_of_t = jnp.full((T + 1,), -1, jnp.int32)
    t_scatter = jnp.where(assigned >= 0, assigned, T)
    q_of_t = q_of_t.at[t_scatter].set(
        jnp.arange(Q, dtype=jnp.int32), mode="drop"
    )[:T]
    matched = (q_of_t >= 0) & tgt_valid
    tgt2query = jnp.where(matched, jnp.clip(q_of_t, 0), 0)
    return tgt2query, matched


@functools.partial(
    jax.jit, static_argnames=("eps_frac", "mesh", "data_axis")
)
def batched_match(
    cost: jnp.ndarray,  # (B, Q, T)
    tgt_valid: jnp.ndarray,  # (B, T) bool
    eps_frac: float = 1e-3,
    mesh=None,
    data_axis: str = "data",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched auction over the batch (vmapped XLA body, or the fused
    Pallas kernel when _pallas_auction_mode applies — same algorithm, with
    per-image early exit instead of vmap's batch-max round count).

    `mesh`: a jax.sharding.Mesh whose `data_axis` shards the batch dim.
    When given (and the batch divides the axis), the Pallas kernel is
    shard_mapped over it so multi-device programs keep the kernel — each
    device solves its local batch slice in VMEM; without a mesh,
    multi-device programs fall back to the partitionable XLA body.

    Returns (tgt2query (B, T) int32, matched (B, T) bool); matched ==
    tgt_valid when T <= Q, a subset of it otherwise.

    Always solves in float32: under a bfloat16 compute dtype the cost
    matrix arrives bf16, and eps = span/1000 is BELOW bf16's ~2^-8
    relative resolution — price increments round to zero and the auction
    can cycle to its iteration cap, returning an INCOMPLETE matching
    (fewer than min(Q, #valid) pairs; tests/test_matching.py pins this)."""
    cost = cost.astype(jnp.float32)
    B, Q, T = cost.shape
    n_shards = 1
    if mesh is not None and data_axis in getattr(mesh, "shape", {}):
        n = mesh.shape[data_axis]
        if n > 1 and B % n == 0:
            n_shards = n
    squared = _square_scaling_ok(Q, T)
    if T <= Q:
        persons, objects = T, Q
    elif squared:
        persons = objects = T  # dummy bidder rows pad persons to T
    else:
        persons, objects = Q, T
    mode = _pallas_auction_mode(persons, objects, sharded=n_shards > 1)
    if mode is None:
        return jax.vmap(lambda c, v: auction_lap(c, v, eps_frac=eps_frac))(
            cost, tgt_valid
        )

    from countdetr_tpu.ops.pallas import auction_kernel

    interpret = mode == "interpret"
    iters_cap = 16 * T + 2048
    scaling = squared and T > Q

    def assign(benefit, active, eps):
        return auction_kernel.auction_assign(
            benefit, active, eps, iters_cap, interpret=interpret,
            scaling=scaling,
        )

    if n_shards > 1:
        from jax.sharding import PartitionSpec as _P

        spec = _P(data_axis)
        assign = jax.shard_map(
            assign, mesh=mesh, in_specs=(spec, spec, spec),
            out_specs=spec, check_vma=False,
        )

    span = jnp.maximum(
        cost.max(axis=(1, 2)) - cost.min(axis=(1, 2)), 1e-3
    )
    eps = span * eps_frac
    if T <= Q:
        benefit = jnp.where(
            tgt_valid[:, :, None], -jnp.swapaxes(cost, 1, 2), 0.0
        )
        assigned = assign(benefit, tgt_valid, eps)
        return jnp.where(tgt_valid, jnp.clip(assigned, 0), 0), tgt_valid

    # T > Q: transposed auction, same prep as auction_lap's T > Q branch
    # (incl. the square reduction for the eps-scaled dense tiers)
    big = (span + eps * (SCALE_START if squared else 1.0)) * (
        (T if squared else Q) + 2
    )
    benefit = jnp.where(tgt_valid[:, None, :], -cost, -big[:, None, None])
    if squared:
        dummies = (
            _dummy_rows_unit(T - Q, T)[None]
            * (eps[:, None, None] * 0.5)
        ).astype(benefit.dtype)  # (B, T-Q, T)
        benefit = jnp.concatenate([benefit, dummies], axis=1)  # (B, T, T)
        assigned = assign(benefit, jnp.ones((B, T), bool), eps)[:, :Q]
    else:
        assigned = assign(benefit, jnp.ones((B, Q), bool), eps)

    def post(a):
        q_of_t = jnp.full((T + 1,), -1, jnp.int32)
        t_scatter = jnp.where(a >= 0, a, T)
        return q_of_t.at[t_scatter].set(
            jnp.arange(Q, dtype=jnp.int32), mode="drop"
        )[:T]

    q_of_t = jax.vmap(post)(assigned)
    matched = (q_of_t >= 0) & tgt_valid
    return jnp.where(matched, jnp.clip(q_of_t, 0), 0), matched


def exact_batched_match(
    cost: jnp.ndarray,  # (B, Q, T)
    tgt_valid: jnp.ndarray,  # (B, T) bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """jit-compatible EXACT matching via a host callback to scipy's LAP —
    the --exact_replay path. The reference solves matching with
    linear_sum_assignment per image on the CPU (2nd-stage matcher.py:243-246);
    calling the identical solver makes the replayed update sequence
    bit-faithful, including tie-breaks the eps-auction may resolve
    differently (native/lapjv.cpp finds the same optimal COST but not
    necessarily the same optimal assignment on ties, so replay uses scipy).

    Single-host by design: --exact_replay forces batch_size 1 (the
    reference's per-image schedule), and pure_callback on sharded inputs
    would run per-shard. Not for the performance path — batched_match is
    the on-device solver."""
    import numpy as np

    B, Q, T = cost.shape

    def cb(c, v):
        tq, m = scipy_match(c, v)
        return np.asarray(tq, np.int32), np.asarray(m, bool)

    return jax.pure_callback(
        cb,
        (
            jax.ShapeDtypeStruct((B, T), jnp.int32),
            jax.ShapeDtypeStruct((B, T), jnp.bool_),
        ),
        cost,
        tgt_valid,
    )


def scipy_match(cost, tgt_valid) -> Tuple:
    """Host-side exact LAP for parity tests (what the reference does per
    image at matcher.py:243-246). Handles rectangular costs (T > Q) the way
    scipy does: min(Q, #valid) optimal pairs. Returns (tgt2query (B, T),
    matched (B, T)). NOT for the training hot path."""
    import numpy as np
    from scipy.optimize import linear_sum_assignment

    cost = np.asarray(cost)
    tgt_valid = np.asarray(tgt_valid)
    B, Q, T = cost.shape
    out = np.zeros((B, T), dtype=np.int32)
    matched = np.zeros((B, T), dtype=bool)
    for b in range(B):
        t_idx = np.nonzero(tgt_valid[b])[0]
        if len(t_idx) == 0:
            continue
        rows, cols = linear_sum_assignment(cost[b][:, t_idx])
        out[b, t_idx[cols]] = rows.astype(np.int32)
        matched[b, t_idx[cols]] = True
    return out, matched


# ---------------------------------------------------------------------------
# Alternate matchers (reference 2nd-stage matcher.py:11-172 keeps these as
# selectable strategies: point-L1 Hungarian, EMD/Chamfer point distances,
# argmin-both-ways Chamfer matching). All jit-compatible.
# ---------------------------------------------------------------------------


def point_cost_matrix(pred_boxes, tgt_boxes, point_cost=2.0, giou_cost=2.0):
    """Center-distance + GIoU cost (reference ChamferDistanceMatching /
    PointHungarianMatcher cost, matcher.py:150-166). Shapes like
    stage2_cost_matrix: (B, Q, 4), (B, T, 4) -> (B, Q, T)."""
    from countdetr_tpu.ops import boxes as box_ops

    l1 = jnp.abs(
        pred_boxes[:, :, None, :2] - tgt_boxes[:, None, :, :2]
    ).sum(-1)
    giou = box_ops.generalized_box_iou_pairwise(
        box_ops.box_cxcywh_to_xyxy(pred_boxes),
        box_ops.box_cxcywh_to_xyxy(tgt_boxes),
    )
    return point_cost * l1 + giou_cost * (-giou)


def chamfer_match(cost: jnp.ndarray):
    """Argmin both ways (reference ChamferDistanceMatching, matcher.py:168-171):
    returns (best query per target (B, T), best target per query (B, Q))."""
    return jnp.argmin(cost, axis=1), jnp.argmin(cost, axis=2)


def chamfer_point_distance(pred_pts, tgt_pts, tgt_valid=None):
    """Symmetric Chamfer distance between point sets (the reference's
    PointsDistance 'chamfer' mode, matcher.py:66-137).
    pred_pts (B, N, 2), tgt_pts (B, M, 2) -> (B,)."""
    d = jnp.square(pred_pts[:, :, None, :] - tgt_pts[:, None, :, :]).sum(-1)
    if tgt_valid is not None:
        big = jnp.float32(1e9)
        d = jnp.where(tgt_valid[:, None, :], d, big)
        fwd = d.min(axis=2).mean(axis=1)  # pred -> nearest tgt
        bwd_all = d.min(axis=1)  # (B, M)
        nv = jnp.maximum(tgt_valid.sum(axis=1), 1)
        bwd = jnp.where(tgt_valid, bwd_all, 0.0).sum(axis=1) / nv
        return fwd + bwd
    return d.min(axis=2).mean(axis=1) + d.min(axis=1).mean(axis=1)
