"""VMEM-resident Pallas auction matcher.

Why a kernel: the XLA auction (ops/matching.py::_auction) runs its Jacobi
round body as ~6 dense (P, O) ops inside a while_loop. XLA materializes the
round intermediates through HBM — at (B8, 576x700) each round streams
~13 MB, and a real init-model cost structure needs ~835 rounds (degenerate
near-identical rows ~1630), so the matcher alone costs 126-239 ms/step and
gates production-geometry stage-2 training (PERFORMANCE.md round-3 table).
Fused here, the whole auction state (benefit matrix, prices, ownership)
lives in VMEM for the kernel's lifetime and each round is pure VPU work.

Second structural win: grid=(B,) gives every image its OWN while_loop. The
vmapped XLA auction batches the cond (logical OR over images), so all B
images pay the batch-max round count; here a batch with one degenerate
image runs rounds_0 + ... + rounds_{B-1} sequential-program rounds instead
of B * max(rounds).

Semantics: identical algorithm to ops/matching.py::_auction (same Jacobi
bidding, same eps, same first-index tie-breaks — argmaxes are expressed as
dense min-index-over-maxima so ties resolve like jnp.argmax). The reference
solves this assignment with scipy on the host per image (2nd-stage
matcher.py:243-246); both auction bodies replace that with an on-device
solver whose measured optimality gap is <= 0.05% of |optimal|
(tests/test_matching.py).

Capacity: the benefit block plus its round intermediates must fit VMEM, so
the dispatch in ops/matching.py routes only P*O <= MAX_ELEMS problems here
(576x700 box-tier shapes easily fit; the rare 4096 tier falls back to the
XLA body).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# largest (P * O) routed to the kernel: benefit block (f32, double-buffered
# by the pipeline) + ~4 live (P, O) round temporaries must stay well under
# the ~16 MB VMEM budget. 576*1024 -> ~2.4 MB/block, ~14 MB worst case.
MAX_ELEMS = 576 * 1024


def _auction_round_kernel(eps_ref, benefit_ref, active_ref, out_ref,
                          *, max_iters: int, scaling: bool = False):
    benefit = benefit_ref[0]            # (P, O) f32
    active = active_ref[0] > 0          # (P, 1) bool
    eps_fin = eps_ref[pl.program_id(0)]  # scalar-prefetch: (B,) in SMEM
    P, O = benefit.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (P, O), 1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (P, O), 0)

    owner0 = jnp.full((1, O), -1, jnp.int32)
    prices0 = jnp.zeros((1, O), jnp.float32)
    assigned0 = jnp.where(active, -1, 0).astype(jnp.int32)  # (P, 1)
    # eps-scaling phases mirror ops/matching.py::_auction EXACTLY (same
    # formulas, same f32 order) so assignments stay bit-identical between
    # the two bodies with or without scaling (tests/test_pallas_auction.py)
    from countdetr_tpu.ops.matching import SCALE_START, SCALE_THETA

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
        unassigned = (assigned < 0) & active                    # (P, 1)

        values = benefit - prices                               # (P, O)
        v1 = jnp.max(values, axis=1, keepdims=True)             # (P, 1)
        # first-max column index, densely (== jnp.argmax tie-break)
        q1 = jnp.min(
            jnp.where(values >= v1, col_ids, O), axis=1, keepdims=True
        )
        masked = jnp.where(col_ids == q1, NEG_INF, values)
        v2 = jnp.max(masked, axis=1, keepdims=True)
        v2 = jnp.where(v2 > NEG_INF / 2, v2, v1 - 1.0)          # O == 1

        # bid for object q1: benefit[p, q1] - v2 + eps. Since
        # benefit[p, q1] == v1 + prices[q1], posting prices + (v1 - v2 +
        # eps) on column q1 needs no gather — prices broadcasts by column.
        incr = v1 - v2 + eps                                    # (P, 1)
        bid_mask = unassigned & (col_ids == q1)
        bid_matrix = jnp.where(bid_mask, prices + incr, NEG_INF)
        winner_bid = jnp.max(bid_matrix, axis=0, keepdims=True)  # (1, O)
        winner_p = jnp.min(
            jnp.where(bid_matrix >= winner_bid, row_ids, P),
            axis=0, keepdims=True,
        )
        has_winner = winner_bid > NEG_INF / 2

        new_owner = jnp.where(has_winner, winner_p, owner)
        new_prices = jnp.where(has_winner, winner_bid, prices)

        own_mat = new_owner == row_ids                          # (P, O)
        assigned_new = jnp.max(
            jnp.where(own_mat, col_ids, -1), axis=1, keepdims=True
        )
        assigned_new = jnp.where(active, assigned_new, 0)

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
    out_ref[0] = assigned


@functools.partial(
    jax.jit, static_argnames=("max_iters", "interpret", "scaling")
)
def auction_assign(
    benefit: jnp.ndarray,   # (B, P, O) f32: value of object o for person p
    active: jnp.ndarray,    # (B, P) bool: persons that must be assigned
    eps: jnp.ndarray,       # (B,) f32: per-image bidding increment
    max_iters: int,
    interpret: bool = False,
    scaling: bool = False,
) -> jnp.ndarray:
    """Batched Jacobi forward auction, one grid program per image.

    Returns assigned (B, P) int32: object per person (-1 only if max_iters
    was hit). Drop-in for vmap(ops.matching._auction) on f32 inputs;
    `scaling` enables the eps-scaled phase schedule (callers must ensure
    the problem is square with every person active — the matching.py
    square reduction — or optimality is lost)."""
    B, P, O = benefit.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # eps (B,) lands in SMEM, whole
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, P, O), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, 1), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, P, 1), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(
            _auction_round_kernel, max_iters=max_iters, scaling=scaling
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, P, 1), jnp.int32),
        interpret=interpret,
    )(
        eps.astype(jnp.float32),
        benefit.astype(jnp.float32),
        active.astype(jnp.int32)[..., None],
    )
    return out[..., 0]
