"""Test-only brute-force COCOeval bbox oracle.

A deliberately naive, loop-everything transcription of the published COCO
evaluation protocol (the algorithm pycocotools implements), kept structurally
different from cocodet_tpu/evaluators/coco_metric.py so the two can serve as
independent checks of each other: no caching, no vectorized matching, the
101-point interpolation is computed by the "max precision at recall >= r"
definition rather than the envelope+searchsorted trick.
"""

import numpy as np

IOU_THRS = [0.5 + 0.05 * i for i in range(10)]
RECALL_THRS = [i / 100.0 for i in range(101)]
AREAS = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
MAX_DETS = (1, 10, 100)


def iou_xywh(d, g, crowd):
    dx1, dy1, dw, dh = d
    gx1, gy1, gw, gh = g
    iw = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
    ih = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
    if iw <= 0 or ih <= 0:
        return 0.0
    inter = iw * ih
    union = dw * dh if crowd else dw * dh + gw * gh - inter
    return inter / union if union > 0 else 0.0


def evaluate(gt_anns, det_anns):
    """gt_anns / det_anns: COCO-format dicts. Returns the 12 summary stats."""
    imgs = sorted({a["image_id"] for a in gt_anns}
                  | {d["image_id"] for d in det_anns})
    cats = sorted({a["category_id"] for a in gt_anns}
                  | {d["category_id"] for d in det_anns})

    # precision[t][r][cat][area][maxdet], recall[t][cat][area][maxdet]
    P = {}
    R = {}
    for ci, cat in enumerate(cats):
        for ai, (aname, arng) in enumerate(AREAS.items()):
            for mi, mdet in enumerate(MAX_DETS):
                # ---- per-image greedy matching --------------------------
                all_scores, all_tp, all_ig = [], [], []  # per iou thr lists
                npig = 0
                for img in imgs:
                    gts = [a for a in gt_anns if a["image_id"] == img
                           and a["category_id"] == cat]
                    dts = [d for d in det_anns if d["image_id"] == img
                           and d["category_id"] == cat]
                    if not gts and not dts:
                        continue
                    for a in gts:
                        a["_ig"] = bool(a.get("iscrowd", 0)) or (
                            a.get("area", a["bbox"][2] * a["bbox"][3])
                            < arng[0]) or (
                            a.get("area", a["bbox"][2] * a["bbox"][3])
                            > arng[1])
                    # gts ignore-last (stable), dets score-desc (stable)
                    gts = sorted(gts, key=lambda a: a["_ig"])
                    dts = sorted(dts, key=lambda d: -d["score"])[:mdet]
                    npig += sum(not a["_ig"] for a in gts)

                    tp_img = []  # [thr][det] matched-non-ignored flag
                    ig_img = []
                    for t in IOU_THRS:
                        gt_used = [False] * len(gts)
                        tps, igs = [], []
                        for d in dts:
                            best, bi = min(t, 1 - 1e-10), -1
                            for gi, a in enumerate(gts):
                                if gt_used[gi] and not a.get("iscrowd", 0):
                                    continue
                                if (bi > -1 and not gts[bi]["_ig"]
                                        and a["_ig"]):
                                    break
                                v = iou_xywh(d["bbox"], a["bbox"],
                                             bool(a.get("iscrowd", 0)))
                                if v < best:
                                    continue
                                best, bi = v, gi
                            if bi > -1:
                                gt_used[bi] = True
                                tps.append(True)
                                igs.append(gts[bi]["_ig"])
                            else:
                                darea = d["bbox"][2] * d["bbox"][3]
                                tps.append(False)
                                igs.append(darea < arng[0]
                                           or darea > arng[1])
                        tp_img.append(tps)
                        ig_img.append(igs)
                    all_scores.extend(d["score"] for d in dts)
                    all_tp.append(tp_img)
                    all_ig.append(ig_img)

                if npig == 0:
                    continue
                order = np.argsort(-np.asarray(all_scores, np.float64),
                                   kind="mergesort") if all_scores else []
                for ti in range(len(IOU_THRS)):
                    flat_tp = [x for img_t in all_tp for x in img_t[ti]]
                    flat_ig = [x for img_i in all_ig for x in img_i[ti]]
                    tp = [flat_tp[i] for i in order]
                    ig = [flat_ig[i] for i in order]
                    rc, pr = [], []
                    n_tp = n_fp = 0
                    for m, i in zip(tp, ig):
                        if i:
                            continue  # ignored det: neither tp nor fp
                        n_tp += m
                        n_fp += not m
                        rc.append(n_tp / npig)
                        pr.append(n_tp / (n_tp + n_fp))
                    R[(ti, ci, ai, mi)] = rc[-1] if rc else 0.0
                    prec_at = []
                    for rt in RECALL_THRS:
                        # interpolated precision at recall rt: the best raw
                        # precision achieved at any recall >= rt
                        best = 0.0
                        for k in range(len(rc)):
                            if rc[k] >= rt:
                                best = max(pr[k:])
                                break
                        prec_at.append(best)
                    P[(ti, ci, ai, mi)] = prec_at

    def mean_ap(thr=None, area="all", mdet=100):
        ai = list(AREAS).index(area)
        mi = MAX_DETS.index(mdet)
        vals = []
        for (ti, ci, a_, m_), prec in P.items():
            if a_ != ai or m_ != mi:
                continue
            if thr is not None and abs(IOU_THRS[ti] - thr) > 1e-9:
                continue
            vals.extend(prec)
        return float(np.mean(vals)) if vals else -1.0

    def mean_ar(area="all", mdet=100):
        ai = list(AREAS).index(area)
        mi = MAX_DETS.index(mdet)
        vals = [v for (ti, ci, a_, m_), v in R.items()
                if a_ == ai and m_ == mi]
        return float(np.mean(vals)) if vals else -1.0

    return {
        "AP": mean_ap(), "AP50": mean_ap(0.5), "AP75": mean_ap(0.75),
        "APs": mean_ap(area="small"), "APm": mean_ap(area="medium"),
        "APl": mean_ap(area="large"),
        "AR1": mean_ar(mdet=1), "AR10": mean_ar(mdet=10),
        "AR100": mean_ar(mdet=100),
        "ARs": mean_ar(area="small"), "ARm": mean_ar(area="medium"),
        "ARl": mean_ar(area="large"),
    }
