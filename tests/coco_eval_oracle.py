"""Independent COCO keypoint-AP oracle for cross-checking the product
scorer (caffe_rtpose_tpu/tools/eval_pose.py:coco_keypoint_ap).

Written directly from the PUBLISHED COCOeval algorithm (the cocoapi
PythonAPI pycocotools/cocoeval.py keypoint protocol, as documented at
cocodataset.org/#keypoints-eval) and deliberately NOT from the scorer
under test: it follows COCOeval's own three-phase structure —
per-image OKS matrices (computeOks), per-image/threshold match arrays
dtm/gtm/dtIg (evaluateImg), then a global accumulate() that builds the
101-point precision matrix from the concatenated per-image results —
whereas the product scorer re-scans greedily per threshold and samples
the envelope directly.  Two implementations of the same spec with
different shapes: agreement validates the semantics, shared bugs would
require the same mistake twice in different structures.

Input format matches the test fixtures (and the product scorer):
  gts: {image_id: [{"keypoints": (17,3) with v flags, "area": float,
                    optional "bbox" [x,y,w,h], "iscrowd", "ignore"}]}
  dts: {image_id: [{"keypoints": (17,3), "score": float}]}
"""

import numpy as np

# COCO keypoint sigmas (cocoapi Params.setKpParams)
SIGMAS = np.array([
    .26, .25, .25, .35, .35, .79, .79, .72, .72, .62, .62,
    1.07, 1.07, .87, .87, .89, .89]) / 10.0

REC_THRS = np.linspace(0.0, 1.0, 101)


def _oks_matrix(dts, gts):
    """ious[d, g] per cocoapi computeOks: visible-keypoint Gaussian when
    the GT has k1>0 visible keypoints, expanded-bbox distance otherwise."""
    var = (SIGMAS * 2.0) ** 2
    ious = np.zeros((len(dts), len(gts)))
    for gi, g in enumerate(gts):
        gkp = np.asarray(g["keypoints"], np.float64)
        xg, yg, vg = gkp[:, 0], gkp[:, 1], gkp[:, 2]
        k1 = int((vg > 0).sum())
        denom = 2.0 * var * (float(g["area"]) + np.spacing(1))
        if k1 == 0 and g.get("bbox") is None:
            continue  # nothing to measure against
        if k1 == 0:
            bx, by, bw, bh = [float(v) for v in g["bbox"]]
            x0, x1 = bx - bw, bx + 2 * bw
            y0, y1 = by - bh, by + 2 * bh
        for di, d in enumerate(dts):
            dkp = np.asarray(d["keypoints"], np.float64)
            xd, yd = dkp[:, 0], dkp[:, 1]
            if k1 > 0:
                dx, dy = xd - xg, yd - yg
            else:
                z = np.zeros(len(SIGMAS))
                dx = np.max((z, x0 - xd), axis=0) + np.max((z, xd - x1),
                                                           axis=0)
                dy = np.max((z, y0 - yd), axis=0) + np.max((z, yd - y1),
                                                           axis=0)
            e = (dx ** 2 + dy ** 2) / denom
            if k1 > 0:
                e = e[vg > 0]
            ious[di, gi] = np.sum(np.exp(-e)) / e.shape[0]
    return ious


def _dt_area(d):
    """loadRes keypoint-result area: tight bbox over ALL keypoint coords."""
    kp = np.asarray(d["keypoints"], np.float64)
    return float((kp[:, 0].max() - kp[:, 0].min())
                 * (kp[:, 1].max() - kp[:, 1].min()))


def _evaluate_img(gts, dts, ious, thrs, area_rng, max_det):
    """cocoeval.evaluateImg: per-threshold greedy matching over score-sorted
    detections and ignore-sorted GTs; returns the dtm/dtIg/gtIg arrays plus
    the scores of the kept (top max_det) detections."""
    lo, hi = area_rng
    g_ig = np.array([
        1 if (g.get("_ignore") or not (lo <= float(g["area"]) <= hi)) else 0
        for g in gts])
    gt_order = np.argsort(g_ig, kind="mergesort")
    dt_order = np.argsort([-float(d["score"]) for d in dts],
                          kind="mergesort")[:max_det]
    iscrowd = [bool(gts[gi].get("iscrowd")) for gi in gt_order]

    T, D, G = len(thrs), len(dt_order), len(gt_order)
    gtm = np.zeros((T, G), dtype=np.int64)
    dtm = np.zeros((T, D), dtype=np.int64)
    dt_ig = np.zeros((T, D))
    gt_ig_sorted = g_ig[gt_order]
    if G:
        for ti, t in enumerate(thrs):
            for di, dind in enumerate(dt_order):
                iou = min(t, 1 - 1e-10)
                m = -1
                for gi in range(G):
                    if gtm[ti, gi] > 0 and not iscrowd[gi]:
                        continue
                    if m > -1 and gt_ig_sorted[m] == 0 \
                            and gt_ig_sorted[gi] == 1:
                        break
                    if ious[dind, gt_order[gi]] < iou:
                        continue
                    iou = ious[dind, gt_order[gi]]
                    m = gi
                if m == -1:
                    continue
                dt_ig[ti, di] = gt_ig_sorted[m]
                dtm[ti, di] = 1 + gt_order[m]
                gtm[ti, m] = 1 + dind
    # unmatched detections whose own area is outside the range are ignored
    a_out = np.array([not (lo <= _dt_area(dts[dind]) <= hi)
                      for dind in dt_order]).reshape(1, -1)
    dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0,
                                                np.repeat(a_out, T, 0)))
    return {
        "dtm": dtm,
        "dt_ig": dt_ig,
        "gt_ig": gt_ig_sorted,
        "scores": np.array([float(dts[i]["score"]) for i in dt_order]),
    }


def evaluate(gts, dts, thresholds=None, max_dets=20):
    """Full COCOeval keypoint protocol over fixture-format inputs.
    Returns {AP, AP50, AP75, AP_medium, AP_large} (value -1.0 where a
    range has no non-ignored GT, matching COCOeval's sentinel)."""
    thrs = np.asarray(thresholds if thresholds is not None
                      else np.arange(0.5, 1.0, 0.05))
    img_ids = sorted(set(gts) | set(dts))
    for gl in gts.values():
        for g in gl:
            vis = np.asarray(g["keypoints"])[:, 2] > 0
            g["_ignore"] = 1 if (g.get("ignore") or g.get("iscrowd")
                                 or not vis.any()) else 0
    oks_by_img = {i: _oks_matrix(dts.get(i, []), gts.get(i, []))
                  for i in img_ids}

    ranges = {"all": (0.0, 1e10), "medium": (32.0 ** 2, 96.0 ** 2),
              "large": (96.0 ** 2, 1e10)}
    out = {}
    for name, rng in ranges.items():
        per_img = [_evaluate_img(gts.get(i, []), dts.get(i, []),
                                 oks_by_img[i], thrs, rng, max_dets)
                   for i in img_ids]
        scores = np.concatenate([e["scores"] for e in per_img])
        order = np.argsort(-scores, kind="mergesort")
        dtm = np.concatenate([e["dtm"] for e in per_img], axis=1)[:, order]
        dt_ig = np.concatenate([e["dt_ig"] for e in per_img],
                               axis=1)[:, order]
        gt_ig = np.concatenate([e["gt_ig"] for e in per_img])
        npig = int((gt_ig == 0).sum())
        if npig == 0:
            ap_per_t = np.full(len(thrs), -1.0)
        else:
            tps = np.logical_and(dtm != 0, np.logical_not(dt_ig))
            fps = np.logical_and(dtm == 0, np.logical_not(dt_ig))
            tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
            fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
            ap_per_t = np.zeros(len(thrs))
            for ti in range(len(thrs)):
                tp, fp = tp_sum[ti], fp_sum[ti]
                nd = len(tp)
                rc = tp / npig
                pr = (tp / (fp + tp + np.spacing(1))).tolist()
                q = np.zeros(101)
                for i in range(nd - 1, 0, -1):
                    if pr[i] > pr[i - 1]:
                        pr[i - 1] = pr[i]
                inds = np.searchsorted(rc, REC_THRS, side="left")
                for ri, pi in enumerate(inds):
                    if pi < nd:
                        q[ri] = pr[pi]
                ap_per_t[ti] = q.mean()
        key = "AP" if name == "all" else f"AP_{name}"
        valid = ap_per_t[ap_per_t > -1]
        out[key] = float(valid.mean()) if valid.size else -1.0
        if name == "all":
            for label, tval in (("AP50", 0.5), ("AP75", 0.75)):
                (idx,) = np.where(np.isclose(thrs, tval))
                if idx.size:
                    out[label] = float(ap_per_t[int(idx[0])])
    return out
