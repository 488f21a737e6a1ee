// Native COCO greedy matcher — the framework's equivalent of detectron2's
// C++ COCOeval_opt (the reference evaluates with it: eval_all.py:18,516).
// Semantics mirror countdetr_tpu/eval/coco_eval._match_image exactly
// (which itself mirrors pycocotools.cocoeval.evaluateImg): gts are scanned
// ignore-last, a det takes the best-IoU free gt above the threshold, and
// once matched to a real gt it never switches to an ignored one.
//
// Python is the wrong tool for this loop: 10 thresholds x 1100 dets x
// thousands of gts per dense FSC-147 image is tens of millions of
// iterations per image. This runs it in C++ via ctypes
// (countdetr_tpu/eval/native_match.py); the numpy implementation stays as
// the oracle and fallback.
//
// Build: make -C native   (produces libcocoeval.so)

#include <algorithm>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// iou: row-major (n_det, n_gt), dets already sorted by score descending.
// gt_ignore: per-gt ignore flags (area-range OR iscrowd) of length n_gt.
// gt_crowd: per-gt iscrowd flags — a crowd gt is never consumed; multiple
//           dets may match it (pycocotools evaluateImg's
//           `if gtm[tind,gind]>0 and not iscrowd[gind]: continue`).
// iou_thrs: n_thrs ascending thresholds.
// out_m: (n_thrs, n_det) matched ORIGINAL gt index or -1.
// out_ig: (n_thrs, n_det) 1 if the det matched an ignored gt.
// (_v2: the crowd-aware signature; the symbol is versioned so a stale
// libcocoeval.so can never be called with a mismatched ABI.)
void coco_match_image_v2(const double* iou, int n_det, int n_gt,
                         const uint8_t* gt_ignore, const uint8_t* gt_crowd,
                         const double* iou_thrs, int n_thrs, int64_t* out_m,
                         uint8_t* out_ig) {
  // sort gts ignore-last, stable (pycocotools' gtind mergesort argsort)
  std::vector<int> order(n_gt);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    return gt_ignore[a] < gt_ignore[b];
  });
  std::vector<uint8_t> gig(n_gt), gcr(n_gt);
  for (int g = 0; g < n_gt; ++g) {
    gig[g] = gt_ignore[order[g]];
    gcr[g] = gt_crowd[order[g]];
  }

  std::vector<uint8_t> taken(n_gt);
  for (int t = 0; t < n_thrs; ++t) {
    std::fill(taken.begin(), taken.end(), 0);
    const double thr = std::min(iou_thrs[t], 1.0 - 1e-10);
    for (int d = 0; d < n_det; ++d) {
      int best = -1;
      double best_iou = thr;
      const double* row = iou + (int64_t)d * n_gt;
      for (int g = 0; g < n_gt; ++g) {
        // crowd gts are re-matchable
        if (taken[g] && !gcr[g]) continue;
        // sorted ignore-last: matched to a real gt => stop at ignored region
        if (best > -1 && !gig[best] && gig[g]) break;
        const double v = row[order[g]];
        if (v < best_iou) continue;
        best_iou = v;
        best = g;
      }
      int64_t* om = out_m + (int64_t)t * n_det + d;
      uint8_t* oi = out_ig + (int64_t)t * n_det + d;
      if (best >= 0) {
        taken[best] = 1;
        *om = order[best];
        *oi = gig[best];
      } else {
        *om = -1;
        *oi = 0;
      }
    }
  }
}

}  // extern "C"
