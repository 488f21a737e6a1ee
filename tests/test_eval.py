import numpy as np

from countdetr_tpu.eval.coco_eval import CocoEvaluator, box_iou_xywh
from countdetr_tpu.eval.counting import counting_metrics
from countdetr_tpu.eval.postprocess import adaptive_threshold_counting


def test_counting_metrics():
    m = counting_metrics([10, 20], [12, 20])
    assert m["MAE"] == 1.0
    assert abs(m["RMSE"] - (4 / 2) ** 0.5) < 1e-9
    assert abs(m["NAE"] - (2 / 10) / 2) < 1e-9
    assert abs(m["SRE"] - ((4 / 10) / 2) ** 0.5) < 1e-9


def test_adaptive_threshold_basic():
    probs = np.array([0.9, 0.8, 0.6, 0.4, 0.3, 0.1])
    keep, thr = adaptive_threshold_counting(probs)
    # n=3 at 0.5 -> threshold = 6th highest (idx 5) = 0.1 -> keep all
    assert thr == 0.1
    assert keep.sum() == 6


def test_adaptive_threshold_no_detections():
    probs = np.array([0.4, 0.3, 0.2])
    keep, thr = adaptive_threshold_counting(probs)
    # n=0 -> idx=-1 -> threshold = lowest score -> keep everything
    # (a reference quirk worth preserving: engine.py:127-128)
    assert thr == 0.2
    assert keep.sum() == 3


def test_adaptive_threshold_cap():
    probs = np.linspace(1, 0.51, 500)  # n=500 -> 2n-1=999 >= 900 -> thr 0
    keep, thr = adaptive_threshold_counting(probs)
    assert thr == 0.0
    assert keep.all()


def test_iou_xywh():
    d = np.array([[0, 0, 10, 10]])
    g = np.array([[0, 0, 10, 10], [5, 5, 10, 10]])
    iou = box_iou_xywh(d, g)
    assert abs(iou[0, 0] - 1.0) < 1e-9
    assert abs(iou[0, 1] - 25 / 175) < 1e-9


def test_coco_eval_perfect_predictions():
    ev = CocoEvaluator(max_dets=(900, 1000, 1100))
    gts = np.array([[10, 10, 20, 20], [50, 50, 30, 30]], dtype=np.float64)
    ev.add_image(gts, np.array([0.9, 0.8]), gts)
    m = ev.summarize()
    assert abs(m["AP"] - 1.0) < 1e-6
    assert abs(m["AP50"] - 1.0) < 1e-6
    assert abs(m["AR@1100"] - 1.0) < 1e-6


def test_coco_eval_half_detected():
    ev = CocoEvaluator()
    gts = np.array([[10, 10, 20, 20], [100, 100, 30, 30]], dtype=np.float64)
    dets = np.array([[10, 10, 20, 20]], dtype=np.float64)  # only first found
    ev.add_image(dets, np.array([0.9]), gts)
    m = ev.summarize()
    # recall caps at 0.5; 101-pt AP: precision 1 up to recall 0.5 -> ~0.5
    assert abs(m["AP50"] - 0.50495) < 1e-2
    assert m["AP"] < 0.6


def test_coco_eval_false_positive_ranking():
    """A high-scoring FP before the TP hurts precision."""
    ev = CocoEvaluator()
    gts = np.array([[10, 10, 20, 20]], dtype=np.float64)
    dets = np.array([[200, 200, 20, 20], [10, 10, 20, 20]], dtype=np.float64)
    ev.add_image(dets, np.array([0.95, 0.9]), gts)
    m1 = ev.summarize()

    ev2 = CocoEvaluator()
    ev2.add_image(dets, np.array([0.9, 0.95]), gts)  # TP ranked first now
    m2 = ev2.summarize()
    assert m2["AP50"] > m1["AP50"]


def test_coco_eval_localization_threshold():
    """A det with IoU ~0.6 counts at AP50 but not AP75."""
    ev = CocoEvaluator()
    gts = np.array([[0, 0, 10, 10]], dtype=np.float64)
    dets = np.array([[0, 0, 10, 16.5]], dtype=np.float64)  # IoU = 10*10/(10*16.5)
    iou = box_iou_xywh(dets, gts)[0, 0]
    assert 0.5 < iou < 0.75
    ev.add_image(dets, np.array([0.9]), gts)
    m = ev.summarize()
    assert m["AP50"] > 0.9
    assert m["AP75"] == 0.0


def test_analyze_results_and_per_image_ap(tmp_path):
    """Per-image report (each_img_info.json, the reference's
    each_img_infor.pkl) carries count errors + per-image AP columns and
    ranks worst-first (reference scripts/analyze_res.py)."""
    import json

    from countdetr_tpu.cli.offline_eval import analyze_results, per_image_ap

    class _Ds:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return {
                "image_name": f"{i}.jpg",
                "orig_size": (100, 100),
                # one normalized cxcywh GT box per image
                "boxes": np.array([[0.5, 0.5, 0.2, 0.2]], np.float32),
            }

    results = [
        {  # perfect prediction
            "image_name": "0.jpg", "image_id": 0, "count_gt": 1,
            "count_pred": 1, "scores": np.array([0.9]),
            "boxes_cxcywh_px": np.array([[50.0, 50.0, 20.0, 20.0]]),
        },
        {  # badly off
            "image_name": "1.jpg", "image_id": 1, "count_gt": 1,
            "count_pred": 5, "scores": np.full(5, 0.5),
            "boxes_cxcywh_px": np.tile([5.0, 5.0, 2.0, 2.0], (5, 1)),
        },
    ]
    aps = per_image_ap(results, _Ds())
    assert aps["0.jpg"]["AP50"] == 1.0
    assert aps["1.jpg"]["AP50"] == 0.0
    worst = analyze_results(results, str(tmp_path), image_aps=aps)
    assert worst[0]["image_name"] == "1.jpg"  # biggest count error first
    with open(tmp_path / "each_img_info.json") as f:
        full = json.load(f)
    assert len(full) == 2 and "AP50" in full[0]
