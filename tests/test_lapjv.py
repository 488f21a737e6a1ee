"""Native C++ LAP vs scipy (exactness) and vs the on-device auction."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from countdetr_tpu.ops import lapjv


@pytest.mark.skipif(not lapjv.available(), reason="no C++ toolchain")
def test_lapjv_matches_scipy_square(rng):
    for n in (1, 5, 40, 128):
        cost = rng.normal(size=(n, n)).astype(np.float32) * 7
        cols, total = lapjv.solve(cost)
        r, c = linear_sum_assignment(cost)
        assert len(set(cols.tolist())) == n
        np.testing.assert_allclose(total, cost[r, c].sum(), rtol=1e-5)


@pytest.mark.skipif(not lapjv.available(), reason="no C++ toolchain")
def test_lapjv_rectangular(rng):
    cost = rng.normal(size=(30, 80)).astype(np.float32) * 3
    cols, total = lapjv.solve(cost)
    r, c = linear_sum_assignment(cost)
    np.testing.assert_allclose(total, cost[r, c].sum(), rtol=1e-5)


@pytest.mark.skipif(not lapjv.available(), reason="no C++ toolchain")
def test_lapjv_batch_padded(rng):
    B, Q, T = 3, 50, 30
    cost = rng.normal(size=(B, Q, T)).astype(np.float32) * 4
    valid = np.ones((B, T), dtype=bool)
    valid[1, 10:] = False
    valid[2, :] = False
    out = lapjv.solve_batch(cost, valid)
    for b in range(B):
        t_idx = np.nonzero(valid[b])[0]
        if len(t_idx) == 0:
            assert (out[b] == 0).all()
            continue
        r, c = linear_sum_assignment(cost[b][:, t_idx])
        opt = cost[b][:, t_idx][r, c].sum()
        ours = sum(cost[b][out[b, t], t] for t in t_idx)
        np.testing.assert_allclose(ours, opt, rtol=1e-5)
