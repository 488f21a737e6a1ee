"""The fused Pallas auction (ops/pallas/auction_kernel.py) must be a
drop-in for the XLA auction body: same algorithm, same tie-breaks, so on
identical inputs the ASSIGNMENTS are bit-identical, and the scipy
near-optimality bound carries over unchanged. CPU suite -> interpret mode
(the real-chip A/B lives in cli/bench.py --mode match)."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from countdetr_tpu.ops import matching
from countdetr_tpu.ops.pallas.auction_kernel import auction_assign


def _routed(cost, valid, mode):
    """batched_match with the auction route pinned to `mode`."""
    old = matching.PALLAS_AUCTION
    matching.PALLAS_AUCTION = mode
    matching.batched_match.clear_cache()
    try:
        got = matching.batched_match(jnp.array(cost), jnp.array(valid))
        return tuple(np.asarray(x) for x in got)
    finally:
        matching.PALLAS_AUCTION = old
        matching.batched_match.clear_cache()


def test_kernel_identical_to_xla_auction_with_ties(rng):
    """Integer costs force exact ties; the kernel's dense min-index argmax
    must resolve them exactly like jnp.argmax in the XLA body."""
    for B, P, O in ((3, 23, 43), (2, 5, 5), (2, 2, 30), (1, 1, 9)):
        cost = rng.integers(-4, 4, size=(B, P, O)).astype(np.float32)
        active = rng.random((B, P)) < 0.8
        benefit = jnp.where(
            jnp.array(active)[:, :, None], jnp.array(-cost), 0.0
        )
        span = np.maximum(cost.max((1, 2)) - cost.min((1, 2)), 1e-3)
        eps = jnp.array(span * 1e-3, jnp.float32)
        cap = 16 * O + 2048
        got = auction_assign(
            benefit, jnp.array(active), eps, cap, interpret=True
        )
        want = jax.vmap(
            lambda b, a, e: matching._auction(b, a, e, cap)
        )(benefit, jnp.array(active), eps)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_batched_match_pallas_route_matches_xla_route(rng):
    """End-to-end batched_match equality between the two routes, both
    orientations (T <= Q direct, T > Q transposed)."""
    for B, Q, T in ((3, 40, 25), (3, 12, 40)):
        cost = rng.normal(size=(B, Q, T)).astype(np.float32) * 5
        valid = np.ones((B, T), dtype=bool)
        valid[0, T // 2:] = False
        tq_x, m_x = _routed(cost, valid, "off")
        tq_p, m_p = _routed(cost, valid, "interpret")
        np.testing.assert_array_equal(m_p, m_x)
        np.testing.assert_array_equal(tq_p[m_p], tq_x[m_x])


def test_batched_match_pallas_near_scipy_optimum(rng):
    B, Q, T = 2, 30, 18
    cost = rng.normal(size=(B, Q, T)).astype(np.float32) * 5
    valid = np.ones((B, T), dtype=bool)
    got, matched = _routed(cost, valid, "interpret")
    for b in range(B):
        rows, cols = linear_sum_assignment(cost[b])
        opt = cost[b][rows, cols].sum()
        ours = cost[b][got[b][matched[b]], np.nonzero(matched[b])[0]].sum()
        assert ours <= opt + 1e-2 * max(1.0, abs(opt)), (b, ours, opt)


def test_batched_match_sharded_pallas_route_matches_xla(rng):
    """With a mesh, multi-device programs keep the kernel: batched_match
    shard_maps the pallas call over the data axis, and each device solves
    its local batch slice — results must equal the unsharded XLA route
    (both orientations). Runs on the conftest's 8 virtual CPU devices."""
    from countdetr_tpu.core.mesh import make_mesh

    mesh = make_mesh((8,), ("data",))
    for B, Q, T in ((8, 24, 16), (8, 10, 30)):
        cost = rng.normal(size=(B, Q, T)).astype(np.float32) * 5
        valid = np.ones((B, T), dtype=bool)
        valid[0, T // 2:] = False
        tq_x, m_x = _routed(cost, valid, "off")
        old = matching.PALLAS_AUCTION
        matching.PALLAS_AUCTION = "interpret"
        matching.batched_match.clear_cache()
        try:
            got = matching.batched_match(
                jnp.array(cost), jnp.array(valid), mesh=mesh,
                data_axis="data",
            )
            tq_p, m_p = (np.asarray(x) for x in got)
        finally:
            matching.PALLAS_AUCTION = old
            matching.batched_match.clear_cache()
        np.testing.assert_array_equal(m_p, m_x)
        np.testing.assert_array_equal(tq_p[m_p], tq_x[m_x])


def test_batched_match_mesh_indivisible_batch_falls_back(rng):
    """B not divisible by the data axis: the mesh routing must quietly fall
    back to the (partitionable) XLA body rather than failing to shard."""
    from countdetr_tpu.core.mesh import make_mesh

    mesh = make_mesh((8,), ("data",))
    B, Q, T = 3, 12, 8
    cost = rng.normal(size=(B, Q, T)).astype(np.float32)
    valid = np.ones((B, T), dtype=bool)
    want = _routed(cost, valid, "off")
    got = matching.batched_match(
        jnp.array(cost), jnp.array(valid), mesh=mesh, data_axis="data"
    )
    np.testing.assert_array_equal(np.asarray(got[0]), want[0])
    np.testing.assert_array_equal(np.asarray(got[1]), want[1])


def test_capacity_gate_falls_back_to_xla():
    """Shapes past the VMEM budget must take the XLA route even when the
    kernel is requested (the 4096 box tier)."""
    old = matching.PALLAS_AUCTION
    matching.PALLAS_AUCTION = "interpret"
    try:
        assert matching._pallas_auction_mode(576, 4096) is None
        assert matching._pallas_auction_mode(576, 700) == "interpret"
    finally:
        matching.PALLAS_AUCTION = old
    from countdetr_tpu.ops.pallas.auction_kernel import MAX_ELEMS
    assert 576 * 700 <= MAX_ELEMS < 576 * 4096


def test_kernel_identical_to_xla_auction_scaled_square(rng):
    """scaling=True (the square-reduction dense-tier path): the kernel's
    eps-scaled phase schedule must stay bit-identical to the XLA body's —
    same phase boundaries, same carried prices, same tie-breaks. Integer
    costs force exact ties; square all-active inputs are the only sound
    domain for scaling (see ops/matching.py AUCTION_SCALING note)."""
    for B, N in ((2, 17), (1, 33)):
        cost = rng.integers(-4, 4, size=(B, N, N)).astype(np.float32)
        benefit = jnp.array(-cost)
        active = jnp.ones((B, N), bool)
        span = np.maximum(cost.max((1, 2)) - cost.min((1, 2)), 1e-3)
        eps = jnp.array(span * 1e-3, jnp.float32)
        cap = 16 * N + 2048
        got = auction_assign(
            benefit, active, eps, cap, interpret=True, scaling=True
        )
        want = jax.vmap(
            lambda b, a, e: matching._auction(b, a, e, cap, scaling=True)
        )(benefit, active, eps)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        # and the scaled square solution is the scipy optimum's cost
        for b in range(B):
            rows, cols = linear_sum_assignment(cost[b])
            opt = cost[b][rows, cols].sum()
            ours = cost[b][np.arange(N), np.asarray(got)[b]].sum()
            assert ours <= opt + 0.05 * max(1.0, abs(opt)), (b, ours, opt)
