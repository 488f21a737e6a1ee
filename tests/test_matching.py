import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from countdetr_tpu.ops import matching


def total_cost(cost, tgt2query, valid):
    c = 0.0
    for t in np.nonzero(valid)[0]:
        c += cost[tgt2query[t], t]
    return c


def test_auction_matches_scipy_optimum_random(rng):
    B, Q, T = 4, 40, 25
    cost = rng.normal(size=(B, Q, T)).astype(np.float32) * 5
    valid = np.ones((B, T), dtype=bool)
    valid[0, 20:] = False  # some padding
    valid[1, 5:] = False

    got = np.asarray(matching.batched_match(jnp.array(cost), jnp.array(valid)))
    for b in range(B):
        t_idx = np.nonzero(valid[b])[0]
        rows, cols = linear_sum_assignment(cost[b][:, t_idx])
        opt = cost[b][:, t_idx][rows, cols].sum()
        ours = total_cost(cost[b], got[b], valid[b])
        # distinct queries per target
        assigned = got[b][valid[b]]
        assert len(set(assigned.tolist())) == len(assigned)
        assert ours <= opt + 1e-2 * max(1.0, abs(opt)), (b, ours, opt)


def test_auction_realistic_detr_costs(rng):
    """Costs shaped like stage-2 matching: L1 + class + giou terms, Q=100, T=60."""
    B, Q, T = 2, 100, 60
    pb = rng.uniform(0.1, 0.9, (B, Q, 2))
    tb = rng.uniform(0.1, 0.9, (B, T, 2))
    l1 = np.abs(pb[:, :, None] - tb[:, None, :]).sum(-1)
    cls = rng.uniform(-1, 0, (B, Q, 1))
    cost = (5 * l1 + 2 * cls).astype(np.float32)
    valid = np.ones((B, T), dtype=bool)
    valid[1, 33:] = False

    got = np.asarray(matching.batched_match(jnp.array(cost), jnp.array(valid)))
    for b in range(B):
        t_idx = np.nonzero(valid[b])[0]
        rows, cols = linear_sum_assignment(cost[b][:, t_idx])
        opt = cost[b][:, t_idx][rows, cols].sum()
        ours = total_cost(cost[b], got[b], valid[b])
        assert ours <= opt + 1e-2 * max(1.0, abs(opt))


def test_auction_all_invalid():
    cost = jnp.zeros((1, 5, 3))
    valid = jnp.zeros((1, 3), dtype=bool)
    got = np.asarray(matching.batched_match(cost, valid))
    assert got.shape == (1, 3)


def test_auction_single_target():
    cost = np.array([[[3.0], [1.0], [2.0]]], dtype=np.float32)  # (1, 3, 1)
    valid = np.ones((1, 1), dtype=bool)
    got = np.asarray(matching.batched_match(jnp.array(cost), jnp.array(valid)))
    assert got[0, 0] == 1  # cheapest query
