"""Experiment: eps-scaling / dispersed-bidding auction variants vs the
shipped single-phase body — the measured post-mortem for the dense-tier
round-count attack.

Measures (a) Jacobi round count, (b) optimality gap vs scipy, on the bench's
cost structures at production geometry (Q=576, T=700). CPU-only: round
counts are platform-independent; wall-clock comes from the chip bench
(cli/bench.py --mode match).

MEASURED RESULTS (2026-08-19, this exact script):

    random      baseline    rounds=[31, 33]       gap=0.0031%
    random      red4ph      rounds=[40, 47]       gap=2.7662%
    random      red3ph      rounds=[43, 45]       gap=2.7457%
    random      red4ph+w.5  rounds=[51, 65]       gap=2.9014%
    random      red5ph      rounds=[65, 58]       gap=2.9001%
    detr        baseline    rounds=[154, 371]     gap=0.0250%
    detr        red4ph      rounds=[147, 87]      gap=2.9914%
    detr        red3ph      rounds=[108, 82]      gap=2.3923%
    detr        red4ph+w.5  rounds=[126, 118]     gap=3.2791%
    detr        red5ph      rounds=[89, 102]      gap=2.7934%
    degenerate  baseline    rounds=[12457, 11866] gap=0.0475%
    degenerate  red4ph      rounds=[1929, 2068]   gap=69.1010%
    degenerate  red3ph      rounds=[2051, 2103]   gap=63.0269%
    degenerate  red4ph+w.5  rounds=[1439, 1610]   gap=52.5059%
    degenerate  red5ph      rounds=[2120, 2126]   gap=93.2359%

Reading: every carried-price scaling variant cuts rounds 6x on the
degenerate tier but destroys solution quality (2.4-93% above optimal vs
the shipped <=0.05%). The cause is structural, not a tuning artifact: the
assignment problem here is ASYMMETRIC (persons < objects), and Bertsekas's
optimality argument for the forward auction requires unassigned objects to
sit at a common minimal price level at termination — true with zero
initial prices, violated by any carried-price phase schedule. Between-phase
price resets (tried: unowned -> global-min floor, and eps_k-CS-violation
unassignment "red*" above) either reintroduce the full round count or
oscillate: a 1-person 3-object example alternates its choice with phase
parity and can terminate on the wrong object, which is exactly the
measured 50-90% degenerate gaps. The correct scaled method is Bertsekas &
Castanon's forward-REVERSE auction (objects bid prices back down between
forward phases); its kernel roughly doubles the auction state and round
body for a ceiling of ~P rounds on the degenerate tier (~2.8x) -- the
Jacobi round floor is one net assignment per round once every contended
bidder targets the same object, independent of eps. Conclusion recorded in
ops/matching.py: the single-phase zero-price auction stays, and the
dense-tier lever is eps_frac (gap-validated per tier), not phases.
"""
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from scipy.optimize import linear_sum_assignment

NEG_INF = -1e30


def _auction_rounds(benefit, active, eps, max_iters, window_frac=0.0,
                    phases=1, theta=5.0):
    """Returns (assigned, rounds). window_frac: candidate window as a
    fraction of the CURRENT phase eps. phases: eps-scaling phases; phase k
    uses eps * theta**(phases-1-k), carrying prices, resetting assignment."""
    T, Q = benefit.shape
    iota_q = jnp.arange(Q, dtype=jnp.int32)
    iota_t = jnp.arange(T, dtype=jnp.int32)
    rot = (iota_q[None, :] - iota_t[:, None]) % Q  # person-rotated pref

    def run_phase(carry, eps_k, reduced=False):
        prices0, owner0_in, rounds0 = carry
        if not reduced:
            owner0 = jnp.full((Q,), -1, dtype=jnp.int32)
            assigned0 = jnp.where(active, -1, 0).astype(jnp.int32)
        else:
            # reduced scaling: keep prices AND ownership; unassign only the
            # pairs violating the new (tighter) eps_k-CS
            values0 = benefit - prices0[None, :]
            v1_0 = jnp.max(values0, axis=1)
            own_mat0 = owner0_in[None, :] == iota_t[:, None]
            a0 = jnp.max(jnp.where(own_mat0, iota_q[None, :], -1), axis=1)
            va = jnp.where(
                a0 >= 0,
                jnp.take_along_axis(values0, jnp.clip(a0, 0)[:, None], 1)[:, 0],
                NEG_INF,
            )
            keep = (a0 >= 0) & (va >= v1_0 - eps_k)
            assigned0 = jnp.where(active, jnp.where(keep, a0, -1), 0)
            # kicked persons release their objects
            kept_of_q = jnp.zeros((Q,), bool).at[
                jnp.where(keep & active, jnp.clip(a0, 0), Q)
            ].set(True, mode="drop")
            owner0 = jnp.where(kept_of_q, owner0_in, -1)
        kappa = eps_k * window_frac

        def cond(state):
            i, owner, assigned, prices = state
            return jnp.logical_and(i < max_iters,
                                   jnp.any((assigned < 0) & active))

        def body(state):
            i, owner, assigned, prices = state
            unassigned = (assigned < 0) & active
            values = benefit - prices[None, :]
            v1 = jnp.max(values, axis=1)
            cand = values >= (v1 - kappa)[:, None]
            # among candidates, min rotated index
            rkey = jnp.where(cand, rot, Q)
            rmin = jnp.min(rkey, axis=1)
            q1 = (rmin + iota_t) % Q
            vq1 = jnp.take_along_axis(values, q1[:, None], axis=1)[:, 0]
            masked = jnp.where(iota_q[None, :] == q1[:, None], NEG_INF, values)
            v2 = jnp.max(masked, axis=1)
            v2 = jnp.where(v2 > NEG_INF / 2, v2, v1 - 1.0)
            incr = vq1 - v2 + eps_k  # >= eps_k * (1 - window_frac)
            bid_matrix = jnp.where(
                unassigned[:, None] & (q1[:, None] == iota_q[None, :]),
                (prices[None, :] + incr[:, None]),
                NEG_INF,
            )
            winner_bid = jnp.max(bid_matrix, axis=0)
            winner_t = jnp.argmax(bid_matrix, axis=0).astype(jnp.int32)
            has_winner = winner_bid > NEG_INF / 2
            new_owner = jnp.where(has_winner, winner_t, owner)
            new_prices = jnp.where(has_winner, winner_bid, prices)
            own_mat = new_owner[None, :] == iota_t[:, None]
            assigned_new = jnp.max(jnp.where(own_mat, iota_q[None, :], -1), axis=1)
            assigned_new = jnp.where(active, assigned_new, 0)
            return (i + 1, new_owner, assigned_new, new_prices)

        i, owner, assigned, prices = jax.lax.while_loop(
            cond, body, (jnp.int32(0), owner0, assigned0, prices0))
        return (prices, owner, rounds0 + i), assigned

    prices = jnp.zeros((Q,), benefit.dtype)
    owner = jnp.full((Q,), -1, jnp.int32)
    rounds = jnp.int32(0)
    assigned = jnp.where(active, -1, 0).astype(jnp.int32)
    for k in range(phases):
        eps_k = eps * (theta ** (phases - 1 - k))
        (prices, owner, rounds), assigned = run_phase(
            (prices, owner, rounds), eps_k, reduced=(k > 0))
    return assigned, rounds


def auction_lap_proto(cost, tgt_valid, eps_frac=1e-3, **kw):
    Q, T = cost.shape
    span = jnp.maximum(jnp.max(cost) - jnp.min(cost), 1e-3)
    eps = span * eps_frac
    iters_cap = 16 * T + 2048
    if T <= Q:
        benefit = jnp.where(tgt_valid[:, None], -cost.T, 0.0)
        assigned, rounds = _auction_rounds(benefit, tgt_valid, eps, iters_cap, **kw)
        return jnp.where(tgt_valid, jnp.clip(assigned, 0), 0), tgt_valid, rounds
    big = (span + eps) * (Q + 2)
    benefit = jnp.where(tgt_valid[None, :], -cost, -big)
    assigned, rounds = _auction_rounds(
        benefit, jnp.ones((Q,), bool), eps, iters_cap, **kw)
    q_of_t = jnp.full((T + 1,), -1, jnp.int32)
    t_scatter = jnp.where(assigned >= 0, assigned, T)
    q_of_t = q_of_t.at[t_scatter].set(jnp.arange(Q, dtype=jnp.int32), mode="drop")[:T]
    matched = (q_of_t >= 0) & tgt_valid
    return jnp.where(matched, jnp.clip(q_of_t, 0), 0), matched, rounds


def structures(B, Q, T, seed=0):
    rng = np.random.default_rng(seed)
    out = {}
    out["random"] = rng.normal(size=(B, Q, T)).astype(np.float32) * 5
    pb = rng.uniform(0.1, 0.9, (B, Q, 2))
    tb = rng.uniform(0.1, 0.9, (B, T, 2))
    l1 = np.abs(pb[:, :, None] - tb[:, None, :]).sum(-1)
    cls = rng.uniform(-1, 0, (B, Q, 1))
    out["detr"] = (5 * l1 + 2 * cls).astype(np.float32)
    base = rng.normal(size=(B, 1, T)).astype(np.float32)
    out["degenerate"] = (base + rng.normal(size=(B, Q, T)).astype(np.float32) * 1e-4)
    return out


def main():
    import sys
    B, Q, T = 2, 576, 700
    if len(sys.argv) > 1:
        Q, T = int(sys.argv[1]), int(sys.argv[2])
    mode = sys.argv[3] if len(sys.argv) > 3 else "eps"
    if mode == "phases":
        configs = [
            ("baseline", dict(window_frac=0.0, phases=1)),
            ("red4ph", dict(window_frac=0.0, phases=4, theta=5.0)),
            ("red3ph", dict(window_frac=0.0, phases=3, theta=10.0)),
            ("red4ph+w.5", dict(window_frac=0.5, phases=4, theta=5.0)),
            ("red5ph", dict(window_frac=0.0, phases=5, theta=4.0)),
        ]
    else:
        # the surviving lever: single sound zero-price phase, coarser eps
        configs = [
            (f"eps={f:g}", dict(window_frac=0.0, phases=1, eps_frac=f))
            for f in (1e-3, 2e-3, 4e-3, 8e-3, 1.6e-2)
        ]
    for name, cost in structures(B, Q, T).items():
        valid = np.ones((B, T), bool)
        opts = []
        for b in range(B):
            r, c = linear_sum_assignment(cost[b])
            opts.append(cost[b][r, c].sum())
        for cname, kw in configs:
            fn = jax.jit(jax.vmap(lambda c, v: auction_lap_proto(c, v, **kw)))
            tq, m, rounds = fn(jnp.array(cost), jnp.array(valid))
            tq, m, rounds = map(np.asarray, (tq, m, rounds))
            gaps = []
            for b in range(B):
                ours = cost[b][tq[b][m[b]], np.nonzero(m[b])[0]].sum()
                assert m[b].sum() == min(Q, T), (name, cname, m[b].sum())
                gaps.append((ours - opts[b]) / abs(opts[b]))
            print(f"{name:11s} {cname:11s} rounds={rounds.tolist()} "
                  f"gap={max(gaps)*100:.4f}%")


if __name__ == "__main__":
    main()
