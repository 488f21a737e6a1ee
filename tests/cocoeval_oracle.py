"""pycocotools-faithful COCOeval oracle (single category, bbox, incl.
crowd semantics: crowd gts are always ignored, IoU vs a crowd uses the det
area as denominator, and a crowd gt is re-matchable).

A straight reimplementation of cocoeval.py's evaluateImg/accumulate/summarize
control flow (per-image loops, gt ignore-last argsort, greedy threshold
matching, global stable score sort, 101-point interpolated precision) used as
the independent oracle for countdetr_tpu.eval.coco_eval.CocoEvaluator —
SURVEY.md section 4 item 5 ("our evaluator vs pycocotools COCOeval on
recorded predictions"); pycocotools itself is not installed in this image.

Deliberately structured like pycocotools (per-image dicts, loop-heavy) so the
two implementations share no code shape with the vectorized evaluator.
"""

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = [
    ("all", [0.0, 1e10]),
    ("small", [0.0, 32.0**2]),
    ("medium", [32.0**2, 96.0**2]),
    ("large", [96.0**2, 1e10]),
]


def _iou_xywh(d, g, crowd=None):
    if len(d) == 0 or len(g) == 0:
        return np.zeros((len(d), len(g)))
    out = np.zeros((len(d), len(g)))
    for i, db in enumerate(d):
        for j, gb in enumerate(g):
            x1 = max(db[0], gb[0])
            y1 = max(db[1], gb[1])
            x2 = min(db[0] + db[2], gb[0] + gb[2])
            y2 = min(db[1] + db[3], gb[1] + gb[3])
            iw, ih = max(0.0, x2 - x1), max(0.0, y2 - y1)
            inter = iw * ih
            if crowd is not None and crowd[j]:
                # maskUtils.iou iscrowd mode: denominator is the det area
                union = db[2] * db[3]
            else:
                union = db[2] * db[3] + gb[2] * gb[3] - inter
            out[i, j] = inter / union if union > 0 else 0.0
    return out


def evaluate_img(dts, scores, gts, area_rng, max_det, iscrowd=None):
    """cocoeval.COCOeval.evaluateImg for one image, one category.

    dts (N,4) xywh, scores (N,), gts (M,4) xywh. Returns dict with dtMatches,
    dtIgnore, gtIgnore, dtScores (all in the sorted-by-score det order).
    """
    gt_areas = gts[:, 2] * gts[:, 3] if len(gts) else np.zeros(0)
    if iscrowd is None:
        iscrowd = np.zeros(len(gts), dtype=bool)
    iscrowd = np.asarray(iscrowd, dtype=bool)
    # _prepare: gt['ignore'] = gt['ignore'] or gt['iscrowd']
    gt_ig = (gt_areas < area_rng[0]) | (gt_areas > area_rng[1]) | iscrowd
    gtind = np.argsort(gt_ig, kind="mergesort")  # ignore-last
    gts = gts[gtind]
    gt_ig = gt_ig[gtind]
    iscrowd = iscrowd[gtind]
    dtind = np.argsort(-scores, kind="mergesort")[:max_det]
    dts = dts[dtind]
    scores = scores[dtind]

    ious = _iou_xywh(dts, gts, iscrowd)
    T, D, G = len(IOU_THRS), len(dts), len(gts)
    gtm = -np.ones((T, G))
    dtm = -np.ones((T, D))
    dt_ig_out = np.zeros((T, D), dtype=bool)
    for tind, t in enumerate(IOU_THRS):
        for dind in range(D):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind in range(G):
                # crowd gts stay matchable (cocoeval.evaluateImg)
                if gtm[tind, gind] > -1 and not iscrowd[gind]:
                    continue
                if m > -1 and not gt_ig[m] and gt_ig[gind]:
                    break
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dt_ig_out[tind, dind] = gt_ig[m]
            dtm[tind, dind] = m
            gtm[tind, m] = dind
    # unmatched dets outside the area range are ignored
    dt_areas = dts[:, 2] * dts[:, 3] if D else np.zeros(0)
    a = (dt_areas < area_rng[0]) | (dt_areas > area_rng[1])
    dt_ig_out = dt_ig_out | ((dtm == -1) & a[None, :])
    return {
        "dtMatches": dtm,
        "dtIgnore": dt_ig_out,
        "gtIgnore": gt_ig,
        "dtScores": scores,
    }


def accumulate(img_evals):
    """cocoeval.COCOeval.accumulate for one (category, area, maxdet) cell.

    img_evals: list of evaluate_img outputs (None entries skipped).
    Returns (precision (T, R), recall (T,)) or (None, None) if no gts.
    """
    evals = [e for e in img_evals if e is not None]
    npig = sum(int((~e["gtIgnore"]).sum()) for e in evals)
    if npig == 0:
        return None, None
    dt_scores = np.concatenate([e["dtScores"] for e in evals])
    inds = np.argsort(-dt_scores, kind="mergesort")
    dtm = np.concatenate([e["dtMatches"] for e in evals], axis=1)[:, inds]
    dt_ig = np.concatenate([e["dtIgnore"] for e in evals], axis=1)[:, inds]

    T = len(IOU_THRS)
    tps = (dtm > -1) & ~dt_ig
    fps = (dtm == -1) & ~dt_ig
    tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
    fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
    precision = -np.ones((T, len(REC_THRS)))
    recall = -np.ones((T,))
    for t in range(T):
        tp, fp = tp_sum[t], fp_sum[t]
        nd = len(tp)
        rc = tp / npig
        pr = tp / (fp + tp + np.spacing(1))
        recall[t] = rc[-1] if nd else 0.0
        pr = pr.tolist()
        for i in range(nd - 1, 0, -1):
            if pr[i] > pr[i - 1]:
                pr[i - 1] = pr[i]
        q = np.zeros(len(REC_THRS))
        inds_r = np.searchsorted(rc, REC_THRS, side="left")
        for ri, pi in enumerate(inds_r):
            if pi < nd:
                q[ri] = pr[pi]
        precision[t] = q
    return precision, recall


def summarize(images, max_dets=(900, 1000, 1100)):
    """images: list of (dets_xywh, scores, gts_xywh[, iscrowd]). Returns the
    same keys as CocoEvaluator.summarize()."""
    max_dets = sorted(max_dets)
    md = max_dets[-1]

    def cell(area_key, m):
        rng = dict(AREA_RANGES)[area_key]
        evs = [
            evaluate_img(np.asarray(im[0], np.float64).reshape(-1, 4),
                         np.asarray(im[1], np.float64).reshape(-1),
                         np.asarray(im[2], np.float64).reshape(-1, 4), rng, m,
                         iscrowd=im[3] if len(im) > 3 else None)
            for im in images
        ]
        return accumulate(evs)

    def mean_ap(precision, thr=None):
        if precision is None:
            return -1.0
        p = precision
        if thr is not None:
            p = p[[int(np.argmin(np.abs(IOU_THRS - thr)))]]
        p = p[p > -1]
        return float(p.mean()) if p.size else -1.0

    out = {}
    pr, _ = cell("all", md)
    out["AP"] = mean_ap(pr)
    out["AP50"] = mean_ap(pr, 0.5)
    out["AP75"] = mean_ap(pr, 0.75)
    for key, name in (("small", "APs"), ("medium", "APm"), ("large", "APl")):
        pr, _ = cell(key, md)
        out[name] = mean_ap(pr)
    for m in max_dets:
        _, rc = cell("all", m)
        out[f"AR@{m}"] = (
            float(rc[rc > -1].mean())
            if rc is not None and (rc > -1).any() else -1.0
        )
    return out
