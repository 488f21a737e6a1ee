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

    got, matched = matching.batched_match(jnp.array(cost), jnp.array(valid))
    got, matched = np.asarray(got), np.asarray(matched)
    assert (matched == valid).all()  # T <= Q: every valid target matched
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

    got, _ = matching.batched_match(jnp.array(cost), jnp.array(valid))
    got = np.asarray(got)
    for b in range(B):
        t_idx = np.nonzero(valid[b])[0]
        rows, cols = linear_sum_assignment(cost[b][:, t_idx])
        opt = cost[b][:, t_idx][rows, cols].sum()
        ours = total_cost(cost[b], got[b], valid[b])
        assert ours <= opt + 1e-2 * max(1.0, abs(opt))


def test_auction_all_invalid():
    cost = jnp.zeros((1, 5, 3))
    valid = jnp.zeros((1, 3), dtype=bool)
    got, matched = matching.batched_match(cost, valid)
    assert np.asarray(got).shape == (1, 3)
    assert not np.asarray(matched).any()


def test_auction_single_target():
    cost = np.array([[[3.0], [1.0], [2.0]]], dtype=np.float32)  # (1, 3, 1)
    valid = np.ones((1, 1), dtype=bool)
    got, _ = matching.batched_match(jnp.array(cost), jnp.array(valid))
    assert np.asarray(got)[0, 0] == 1  # cheapest query


def test_auction_more_targets_than_queries(rng):
    """T > Q: rectangular-LAP semantics — exactly min(Q, #valid) targets get
    distinct queries and the total matched cost is near the scipy optimum
    (the reference's scipy LAP on the rectangular matrix,
    2nd-stage matcher.py:243-246)."""
    B, Q, T = 3, 12, 40
    cost = rng.normal(size=(B, Q, T)).astype(np.float32) * 5
    valid = np.ones((B, T), dtype=bool)
    valid[1, 30:] = False  # still more valid than queries
    valid[2, 6:] = False  # fewer valid than queries

    got, matched = matching.batched_match(jnp.array(cost), jnp.array(valid))
    got, matched = np.asarray(got), np.asarray(matched)
    for b in range(B):
        n_valid = valid[b].sum()
        assert matched[b].sum() == min(Q, n_valid), (b, matched[b].sum())
        assert not matched[b][~valid[b]].any()
        # distinct queries among matched targets
        assigned = got[b][matched[b]]
        assert len(set(assigned.tolist())) == len(assigned)
        t_idx = np.nonzero(valid[b])[0]
        rows, cols = linear_sum_assignment(cost[b][:, t_idx])
        opt = cost[b][:, t_idx][rows, cols].sum()
        ours = cost[b][got[b][matched[b]], np.nonzero(matched[b])[0]].sum()
        assert ours <= opt + 0.05 * max(1.0, abs(opt)), (b, ours, opt)


def test_auction_t_gt_q_realistic_costs(rng):
    """T > Q on DETR-shaped costs (spatially structured): the transposed
    auction (queries as bidders) should be near-optimal here."""
    B, Q, T = 2, 25, 60
    pb = rng.uniform(0.1, 0.9, (B, Q, 2))
    tb = rng.uniform(0.1, 0.9, (B, T, 2))
    l1 = np.abs(pb[:, :, None] - tb[:, None, :]).sum(-1)
    cls = rng.uniform(-1, 0, (B, Q, 1))
    cost = (5 * l1 + 2 * cls).astype(np.float32)
    valid = np.ones((B, T), dtype=bool)

    got, matched = matching.batched_match(jnp.array(cost), jnp.array(valid))
    got, matched = np.asarray(got), np.asarray(matched)
    _, sp_matched = matching.scipy_match(cost, valid)
    for b in range(B):
        assert matched[b].sum() == Q
        assert np.asarray(sp_matched)[b].sum() == Q
        rows, cols = linear_sum_assignment(cost[b])
        opt = cost[b][rows, cols].sum()
        ours = cost[b][got[b][matched[b]], np.nonzero(matched[b])[0]].sum()
        assert ours <= opt + 0.05 * max(1.0, abs(opt)), (b, ours, opt)


def test_exact_batched_match_equals_scipy_under_jit(rng):
    """--exact_replay path: the pure_callback matcher returns scipy's exact
    assignment (indices AND matched mask) from inside a jitted program, on
    both T <= Q and T > Q geometries (reference matcher.py:243-246)."""
    import jax

    for B, Q, T in ((2, 10, 6), (2, 6, 17)):
        cost = rng.normal(size=(B, Q, T)).astype(np.float32) * 3
        valid = np.ones((B, T), dtype=bool)
        valid[1, T // 2:] = False

        got, matched = jax.jit(matching.exact_batched_match)(
            jnp.array(cost), jnp.array(valid)
        )
        want_tq, want_m = matching.scipy_match(cost, valid)
        np.testing.assert_array_equal(np.asarray(matched), want_m)
        np.testing.assert_array_equal(
            np.asarray(got)[want_m], np.asarray(want_tq)[want_m]
        )


def test_exact_match_trains_stage2():
    """exact_match=True inside the full jitted stage-2 train step (grads
    through stop_gradient'ed callback outputs must be a no-op)."""
    import jax

    from countdetr_tpu import config as cfglib
    from countdetr_tpu.models import CountingDetr
    from countdetr_tpu.train.optimizer import build_optimizer
    from countdetr_tpu.train.train_step import create_state, make_train_step

    cfg = cfglib.stage2_config()
    cfg = cfg.replace(
        model=cfg.model.replace(
            enc_layers=1, dec_layers=1, hidden_dim=32, nheads=4,
            dim_feedforward=64, num_query_position=9,
        ),
        train=cfg.train.replace(exact_match=True),
    )
    r = np.random.default_rng(0)
    B, H, W, T = 2, 32, 32, 5
    batch = {
        "images": jnp.array(r.normal(size=(B, H, W, 3)).astype(np.float32)),
        "pad_mask": jnp.zeros((B, H, W), dtype=bool),
        "exemplar_boxes": jnp.tile(
            jnp.array([[0.1, 0.1, 0.3, 0.3]], jnp.float32), (B, 3, 1)
        ),
        "boxes": jnp.array(r.uniform(0.2, 0.7, (B, T, 4)).astype(np.float32)),
        "boxes_valid": jnp.ones((B, T), dtype=bool),
        "batch_valid": jnp.ones((B,), dtype=bool),
    }
    model = CountingDetr(cfg.model)
    params = model.init(
        jax.random.PRNGKey(0), batch["images"], batch["pad_mask"],
        exemplar_boxes=batch["exemplar_boxes"],
    )
    tx = build_optimizer(cfg.train, params, 10)
    state = create_state(params, tx)
    step = make_train_step(model, tx, cfg)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_bf16_costs_converge_and_match_fully(rng):
    """Regression: a bfloat16 cost matrix (what a bf16 compute dtype feeds
    the matcher) must still converge — eps = span/1000 is below bf16's
    ~2^-8 relative resolution, so solving in bf16 cycles to the iteration
    cap and returns an INCOMPLETE matching. The matcher casts to float32
    internally; every min(Q, #valid) pair must be assigned."""
    B, Q, T = 4, 48, 64  # T > Q: the transposed (tight-market) path
    cost = rng.normal(size=(B, Q, T)).astype(np.float32)
    valid = np.ones((B, T), dtype=bool)
    got, matched = matching.batched_match(
        jnp.array(cost, dtype=jnp.bfloat16), jnp.array(valid)
    )
    matched = np.asarray(matched)
    for b in range(B):
        assert matched[b].sum() == Q, (b, matched[b].sum())
    # T <= Q path too: all valid targets matched
    got2, matched2 = matching.batched_match(
        jnp.array(cost[:, :, :32], dtype=jnp.bfloat16).transpose(0, 2, 1)[:, :, :20],
        jnp.ones((B, 20), bool),
    )
    assert np.asarray(matched2).all()


def _force_scaling(on=True):
    """Flip the (default-off, see the AUCTION_SCALING post-mortem note)
    square-reduction eps-scaling and invalidate the jit caches keyed on
    trace-time reads of the flag."""
    matching.AUCTION_SCALING = on
    matching.batched_match.clear_cache()


def test_squared_scaling_degenerate_t_gt_q(rng):
    """The eps-scaled square reduction (env-gated, sound-but-slower — see
    the AUCTION_SCALING post-mortem) on its target workload:
    near-identical rows, the contention structure that needs ~span/eps
    Jacobi rounds single-phase. Gap vs scipy must stay within the suite's
    5% tolerance, matched-set semantics unchanged."""
    B, Q, T = 2, 24, 40
    base = rng.normal(size=(B, 1, T)).astype(np.float32)
    cost = base + rng.normal(size=(B, Q, T)).astype(np.float32) * 1e-4
    valid = np.ones((B, T), dtype=bool)
    valid[1, 34:] = False
    _force_scaling(True)
    try:
        assert matching._square_scaling_ok(Q, T)
        got, matched = matching.batched_match(
            jnp.array(cost), jnp.array(valid)
        )
    finally:
        _force_scaling(False)
    got, matched = np.asarray(got), np.asarray(matched)
    for b in range(B):
        n_valid = valid[b].sum()
        assert matched[b].sum() == min(Q, n_valid)
        assigned = got[b][matched[b]]
        assert len(set(assigned.tolist())) == len(assigned)
        t_idx = np.nonzero(valid[b])[0]
        rows, cols = linear_sum_assignment(cost[b][:, t_idx])
        opt = cost[b][:, t_idx][rows, cols].sum()
        ours = cost[b][got[b][matched[b]], np.nonzero(matched[b])[0]].sum()
        assert ours <= opt + 0.05 * max(1.0, abs(opt)), (b, ours, opt)


def test_squared_scaling_few_valid_targets(rng):
    """Square reduction with #valid < Q: overflow queries and all dummy
    bidders must absorb the invalid -big slots without stealing valid
    targets from real queries."""
    B, Q, T = 1, 20, 36
    cost = rng.normal(size=(B, Q, T)).astype(np.float32) * 5
    valid = np.zeros((B, T), dtype=bool)
    valid[0, :8] = True  # 8 valid << 20 queries
    _force_scaling(True)
    try:
        got, matched = matching.batched_match(
            jnp.array(cost), jnp.array(valid)
        )
    finally:
        _force_scaling(False)
    got, matched = np.asarray(got), np.asarray(matched)
    assert matched[0].sum() == 8
    t_idx = np.nonzero(valid[0])[0]
    rows, cols = linear_sum_assignment(cost[0][:, t_idx])
    opt = cost[0][:, t_idx][rows, cols].sum()
    ours = cost[0][got[0][matched[0]], np.nonzero(matched[0])[0]].sum()
    assert ours <= opt + 0.05 * max(1.0, abs(opt)), (ours, opt)


def test_scaled_auction_unsound_outside_square():
    """Guard the invariant the square reduction exists for: scaling=True on
    an ASYMMETRIC problem (persons < objects, no dummy rows) loses the
    optimality guarantee — this pins that _auction(scaling=True) is only
    reachable through the square path in production code."""
    import ast
    import inspect

    src = inspect.getsource(matching)
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            fn = node.func
            name = getattr(fn, "id", getattr(fn, "attr", ""))
            if name == "_auction":
                kw = {k.arg: k.value for k in node.keywords}
                if "scaling" in kw:
                    assert isinstance(kw["scaling"], ast.Constant)
                    # scaling=True is the squared (T, T) all-active call
                    if kw["scaling"].value:
                        parent_ok = "jnp.ones((T,), bool)" in ast.unparse(
                            node
                        )
                        assert parent_ok, ast.unparse(node)
