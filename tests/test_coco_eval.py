"""Randomized parity: CocoEvaluator (vectorized, countdetr_tpu.eval.coco_eval)
vs the pycocotools-faithful oracle (tests/cocoeval_oracle.py) — SURVEY.md
section 4 item 5, with the reference's maxDets [900, 1000, 1100]
(reference CountDETR_147_2nd_stage/eval_all.py:516)."""

import numpy as np
import pytest

from countdetr_tpu.eval.coco_eval import CocoEvaluator
from tests import cocoeval_oracle as oracle

KEYS = ["AP", "AP50", "AP75", "APs", "APm", "APl", "AR@900", "AR@1000", "AR@1100"]


def _random_image(rng, n_gt, n_det, size=640.0, jitter=0.3):
    """GTs across all three area ranges; dets = jittered gts + pure noise."""
    gts = []
    for _ in range(n_gt):
        # areas spanning small (<32^2), medium, large (>96^2)
        s = rng.choice([8.0, 24.0, 48.0, 80.0, 120.0, 200.0])
        w = s * rng.uniform(0.5, 1.5)
        h = s * rng.uniform(0.5, 1.5)
        x = rng.uniform(0, size - w)
        y = rng.uniform(0, size - h)
        gts.append([x, y, w, h])
    gts = np.array(gts, np.float64).reshape(-1, 4)
    dets, scores = [], []
    for g in gts[: int(n_gt * 0.8)]:
        d = g * (1.0 + rng.uniform(-jitter, jitter, 4))
        dets.append(d)
        scores.append(rng.uniform(0.3, 1.0))
    for _ in range(n_det - len(dets)):
        w, h = rng.uniform(5, 150, 2)
        dets.append([rng.uniform(0, size - w), rng.uniform(0, size - h), w, h])
        scores.append(rng.uniform(0.0, 0.9))
    dets = np.array(dets, np.float64).reshape(-1, 4)
    scores = np.array(scores, np.float64)
    return dets, scores, gts


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_evaluator_matches_pycocotools_semantics(seed):
    rng = np.random.default_rng(seed)
    images = []
    ev = CocoEvaluator(max_dets=(900, 1000, 1100))
    for _ in range(6):
        n_gt = int(rng.integers(0, 15))
        n_det = int(rng.integers(0, 25))
        d, s, g = _random_image(rng, n_gt, n_det)
        images.append((d, s, g))
        ev.add_image(d, s, g)
    got = ev.summarize()
    want = oracle.summarize(images)
    for k in KEYS:
        assert got[k] == pytest.approx(want[k], abs=1e-9), (k, got[k], want[k])


def test_evaluator_matches_oracle_ignored_gt_before_real():
    """The exact failure mode of the old break rule: an area-ignored gt that
    appears BEFORE a real gt in annotation order, with a det overlapping
    both. pycocotools sorts gts ignore-last, so the det must match the real
    gt, not abort at the ignored one."""
    # gt0: tiny (small-range) box listed first; gt1: large box
    gts = np.array([[10, 10, 8, 8], [5, 5, 120, 120]], np.float64)
    # det overlaps both; IoU with gt1 is high
    dets = np.array([[6, 6, 118, 118]], np.float64)
    scores = np.array([0.9])

    ev = CocoEvaluator(max_dets=(900, 1000, 1100))
    ev.add_image(dets, scores, gts)
    got = ev.summarize()
    want = oracle.summarize([(dets, scores, gts)])
    for k in KEYS:
        assert got[k] == pytest.approx(want[k], abs=1e-9), (k, got[k], want[k])
    # in the 'large' area range the small gt is ignored and the det matches
    # the large gt -> APl must be perfect
    assert got["APl"] == pytest.approx(1.0)


def test_evaluator_matches_oracle_maxdet_truncation():
    rng = np.random.default_rng(7)
    ev = CocoEvaluator(max_dets=(2, 5, 8))
    images = []
    for _ in range(3):
        d, s, g = _random_image(rng, 6, 12)
        images.append((d, s, g))
        ev.add_image(d, s, g)
    got = ev.summarize()
    want = oracle.summarize(images, max_dets=(2, 5, 8))
    for k in ["AP", "AP50", "AP75", "APs", "APm", "APl", "AR@2", "AR@5", "AR@8"]:
        assert got[k] == pytest.approx(want[k], abs=1e-9), (k, got[k], want[k])


def test_native_matcher_matches_python(rng=None):
    """native/cocoeval.cpp vs the numpy greedy loop: identical matches and
    ignore flags on randomized inputs incl. ignored gts and ties."""
    from countdetr_tpu.eval import native_match
    from countdetr_tpu.eval.coco_eval import IOU_THRS, _match_image_py, box_iou_xywh

    if not native_match.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(11)
    for trial in range(8):
        n_det = int(rng.integers(0, 30))
        n_gt = int(rng.integers(0, 20))
        d, s, g = _random_image(rng, n_gt, max(n_det, 1))
        d = d[:n_det]
        s = s[:n_det]
        order = np.argsort(-s, kind="mergesort")
        d = d[order]
        iou = box_iou_xywh(d, g)
        gt_ig = rng.random(n_gt) < 0.3
        want_m, want_ig = _match_image_py(
            s[order], g, gt_ig, iou, IOU_THRS, 1000
        )
        got = native_match.match_image(
            iou.astype(np.float64), gt_ig, np.asarray(IOU_THRS)
        )
        assert got is not None
        np.testing.assert_array_equal(got[0], want_m, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(got[1], want_ig, err_msg=f"trial {trial}")


def test_analytic_ap_perfect_detection():
    """Hand-derivable case: every GT detected exactly once at IoU 1.0 ->
    AP = AP50 = AP75 = 1.0, AR = 1.0. Catches any shared misunderstanding
    between implementation and the hand-written oracle (the genuine
    pycocotools source is not obtainable in this image — no pip, no
    network, no on-disk copy)."""
    ev = CocoEvaluator(max_dets=(900, 1000, 1100))
    for k in range(3):
        g = np.array([[10.0 * k, 5.0, 20.0, 30.0], [100.0, 100.0, 50.0, 40.0]])
        ev.add_image(g.copy(), np.array([0.9, 0.8]), g)
    out = ev.summarize()
    for k in ("AP", "AP50", "AP75", "AR@900"):
        assert out[k] == pytest.approx(1.0), (k, out[k])


def test_analytic_ap50_half_matched():
    """One image, 2 GTs, 2 dets: det A = GT1 exactly (score 0.9), det B
    pure miss (score 0.8). Precision-recall curve: P=1 at R=0.5, then
    P=1/2 at R=0.5 (no new recall). 101-pt interpolated AP50 =
    sum_{r<=0.5} 1.0 / 101 = 51/101."""
    ev = CocoEvaluator(max_dets=(900, 1000, 1100))
    gts = np.array([[0.0, 0.0, 10.0, 10.0], [50.0, 50.0, 10.0, 10.0]])
    dets = np.array([[0.0, 0.0, 10.0, 10.0], [200.0, 200.0, 10.0, 10.0]])
    ev.add_image(dets, np.array([0.9, 0.8]), gts)
    out = ev.summarize()
    assert out["AP50"] == pytest.approx(51.0 / 101.0)
    assert out["AR@900"] == pytest.approx(0.5)


def test_analytic_iou_threshold_boundary():
    """Det overlapping a GT at IoU exactly 0.5: pycocotools matches at
    threshold 0.5 (>= semantics) but not at 0.55. Shifted box [0,5,10,20]
    vs GT [0,0,10,20]: inter = 10x15, union = 2*200-150 = 250, IoU = 0.6;
    scaled construction below gives IoU exactly 0.5: det [0,10,10,20] vs
    gt [0,0,10,20] -> inter 10x10=100, union 400-100=300 ... use a box
    pair engineered for IoU=0.5: gt [0,0,10,30], det [0,10,10,30]:
    inter 10x20=200, union 600-200=400, IoU=0.5."""
    gt = np.array([[0.0, 0.0, 10.0, 30.0]])
    det = np.array([[0.0, 10.0, 10.0, 30.0]])
    ev = CocoEvaluator(max_dets=(900, 1000, 1100))
    ev.add_image(det, np.array([0.9]), gt)
    out = ev.summarize()
    # matched at t=0.50 only -> AP50 = 1, AP55..AP95 = 0; AP = 1/10
    assert out["AP50"] == pytest.approx(1.0)
    assert out["AP"] == pytest.approx(0.1)


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_evaluator_matches_oracle_with_crowds(seed):
    """Randomized parity incl. iscrowd gts: crowd regions are ignored,
    IoU vs a crowd uses the det area as denominator, and a crowd absorbs
    multiple dets without being consumed."""
    rng = np.random.default_rng(seed)
    images = []
    ev = CocoEvaluator(max_dets=(900, 1000, 1100))
    for _ in range(6):
        n_gt = int(rng.integers(1, 15))
        n_det = int(rng.integers(0, 25))
        d, s, g = _random_image(rng, n_gt, n_det)
        crowd = rng.uniform(size=len(g)) < 0.3
        images.append((d, s, g, crowd))
        ev.add_image(d, s, g, gt_iscrowd=crowd)
    got = ev.summarize()
    want = oracle.summarize(images)
    for k in KEYS:
        assert got[k] == pytest.approx(want[k], abs=1e-9), (k, got[k], want[k])


def test_analytic_crowd_absorbs_multiple_dets():
    """Two dets inside one big crowd region + one real gt matched by a third
    det: the crowd dets are ignored (not false positives), so AP stays 1.0.
    Without crowd semantics the two extra dets would be FPs and AP < 1."""
    gts = np.array([[0.0, 0.0, 10.0, 10.0], [200.0, 200.0, 100.0, 100.0]])
    crowd = np.array([False, True])
    dets = np.array([
        [0.0, 0.0, 10.0, 10.0],        # matches the real gt
        [210.0, 210.0, 10.0, 10.0],    # inside the crowd
        [250.0, 250.0, 10.0, 10.0],    # also inside the crowd
    ])
    scores = np.array([0.9, 0.8, 0.7])
    ev = CocoEvaluator(max_dets=(900, 1000, 1100))
    ev.add_image(dets, scores, gts, gt_iscrowd=crowd)
    got = ev.summarize()
    assert got["AP"] == pytest.approx(1.0)

    # sanity: WITHOUT the crowd flag those dets are false positives
    ev2 = CocoEvaluator(max_dets=(900, 1000, 1100))
    ev2.add_image(dets, scores, gts)
    assert ev2.summarize()["AP"] < 1.0


def test_analytic_crowd_iou_uses_det_area():
    """A small det fully inside a huge crowd has IoU 1.0 in crowd mode
    (inter/det_area), so it matches and is ignored even though classic IoU
    would be ~0.01 and it would count as a false positive."""
    gts = np.array([[0.0, 0.0, 100.0, 100.0], [300.0, 300.0, 10.0, 10.0]])
    crowd = np.array([True, False])
    dets = np.array([
        [45.0, 45.0, 10.0, 10.0],      # tiny det inside the crowd
        [300.0, 300.0, 10.0, 10.0],    # matches the real gt
    ])
    scores = np.array([0.9, 0.8])
    ev = CocoEvaluator(max_dets=(900, 1000, 1100))
    ev.add_image(dets, scores, gts, gt_iscrowd=crowd)
    assert ev.summarize()["AP"] == pytest.approx(1.0)
