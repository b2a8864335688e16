"""Test-only oracle: a faithful transliteration of the pycocotools COCOeval
bbox algorithm (evaluate/accumulate), written in the CANONICAL single-pass
loop structure of pycocotools/cocoeval.py so it can cross-check our two-pass
reformulation + C++ kernel (VERDICT r1 item 3 / Missing #2).

pycocotools is not installed in this image; this module re-derives the
published algorithm (COCO API, Lin et al.) independently of the package
implementation in pointtinybenchmark_tpu/evaluation/cocoeval.py.
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np


def bbox_iou_xywh(d, g, iscrowd):
    """pycocotools maskUtils.iou for bbox lists: crowd gt -> IoD."""
    D, G = len(d), len(g)
    out = np.zeros((D, G))
    for i, db in enumerate(d):
        dx1, dy1, dw, dh = db
        da = dw * dh
        for j, gb in enumerate(g):
            gx1, gy1, gw, gh = gb
            iw = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
            ih = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = da if iscrowd[j] else da + gw * gh - inter
            out[i, j] = inter / union
    return out


class OracleCOCOeval:
    """bbox-only COCOeval with params: imgIds, catIds, iouThrs, recThrs,
    maxDets, areaRng, areaRngLbl, useCats."""

    def __init__(self, cocoGt, cocoDt, iouThrs, recThrs, maxDets, areaRng,
                 useCats=1):
        self.cocoGt, self.cocoDt = cocoGt, cocoDt
        self.imgIds = sorted(cocoGt.get_img_ids())
        self.catIds = sorted(cocoGt.get_cat_ids()) if useCats else [-1]
        self.iouThrs = np.asarray(iouThrs, float)
        self.recThrs = np.asarray(recThrs, float)
        self.maxDets = list(maxDets)
        self.areaRng = areaRng
        self.useCats = useCats

    def _prepare(self):
        gts = self.cocoGt.load_anns(self.cocoGt.get_ann_ids(
            img_ids=self.imgIds))
        dts = self.cocoDt.load_anns(self.cocoDt.get_ann_ids(
            img_ids=self.imgIds))
        self._gts = defaultdict(list)
        self._dts = defaultdict(list)
        for gt in gts:
            gt = dict(gt)
            gt["ignore"] = gt.get("ignore", 0) or gt.get("iscrowd", 0)
            cat = gt["category_id"] if self.useCats else -1
            self._gts[gt["image_id"], cat].append(gt)
        for dt in dts:
            cat = dt["category_id"] if self.useCats else -1
            self._dts[dt["image_id"], cat].append(dict(dt))

    def evaluate(self):
        self._prepare()
        self.ious = {}
        for img_id in self.imgIds:
            for cat_id in self.catIds:
                gt = self._gts[img_id, cat_id]
                dt = sorted(self._dts[img_id, cat_id],
                            key=lambda d: -d["score"])[:self.maxDets[-1]]
                if not gt or not dt:
                    self.ious[img_id, cat_id] = np.zeros((len(dt), len(gt)))
                    continue
                self.ious[img_id, cat_id] = bbox_iou_xywh(
                    [d["bbox"] for d in dt], [g["bbox"] for g in gt],
                    [g.get("iscrowd", 0) for g in gt])
        self.evalImgs = {
            (i, c, a): self.evaluate_img(i, c, self.areaRng[a])
            for c in self.catIds for a in range(len(self.areaRng))
            for i in self.imgIds}

    def evaluate_img(self, img_id, cat_id, a_rng):
        # canonical pycocotools evaluateImg single-pass loop
        gt = self._gts[img_id, cat_id]
        dt = self._dts[img_id, cat_id]
        if len(gt) == 0 and len(dt) == 0:
            return None
        gt = [dict(g) for g in gt]
        for g in gt:
            g["_ignore"] = 1 if (g["ignore"] or g["area"] < a_rng[0]
                                 or g["area"] > a_rng[1]) else 0
        gtind = np.argsort([g["_ignore"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[:self.maxDets[-1]]]
        iscrowd = [int(g.get("iscrowd", 0)) for g in gt]
        ious = (self.ious[img_id, cat_id][:, gtind]
                if len(self.ious[img_id, cat_id]) > 0
                else self.ious[img_id, cat_id])
        T, G, D = len(self.iouThrs), len(gt), len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gtIg = np.array([g["_ignore"] for g in gt])
        dtIg = np.zeros((T, D))
        if len(ious):
            for tind, t in enumerate(self.iouThrs):
                for dind, d in enumerate(dt):
                    iou = min(t, 1 - 1e-10)
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dtIg[tind, dind] = gtIg[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        a = np.array([d["area"] < a_rng[0] or d["area"] > a_rng[1]
                      for d in dt]).reshape((1, len(dt)))
        dtIg = np.logical_or(dtIg, np.logical_and(
            dtm == 0, np.repeat(a, T, 0)))
        return dict(dtMatches=dtm, gtMatches=gtm,
                    dtScores=[d["score"] for d in dt],
                    gtIgnore=gtIg, dtIgnore=dtIg)

    def accumulate(self):
        T = len(self.iouThrs)
        R = len(self.recThrs)
        K = len(self.catIds)
        A = len(self.areaRng)
        M = len(self.maxDets)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        for k, cat_id in enumerate(self.catIds):
            for a in range(A):
                E = [self.evalImgs.get((i, cat_id, a)) for i in self.imgIds]
                E = [e for e in E if e is not None]
                if not E:
                    continue
                for m, maxDet in enumerate(self.maxDets):
                    dtScores = np.concatenate(
                        [e["dtScores"][:maxDet] for e in E])
                    inds = np.argsort(-dtScores, kind="mergesort")
                    dtScoresSorted = dtScores[inds]
                    dtmc = np.concatenate(
                        [e["dtMatches"][:, :maxDet] for e in E],
                        axis=1)[:, inds]
                    dtIgc = np.concatenate(
                        [e["dtIgnore"][:, :maxDet] for e in E],
                        axis=1)[:, inds]
                    gtIg = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gtIg == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtmc, np.logical_not(dtIgc))
                    fps = np.logical_and(np.logical_not(dtmc),
                                         np.logical_not(dtIgc))
                    tp_sum = np.cumsum(tps, axis=1).astype(float)
                    fp_sum = np.cumsum(fps, axis=1).astype(float)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        recall[t, k, a, m] = rc[-1] if nd else 0
                        pr = pr.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds_r = np.searchsorted(rc, self.recThrs,
                                                 side="left")
                        for ri, pi in enumerate(inds_r):
                            if pi < nd:
                                q[ri] = pr[pi]
                        precision[t, :, k, a, m] = np.array(q)
        self.precision = precision
        self.recall = recall
