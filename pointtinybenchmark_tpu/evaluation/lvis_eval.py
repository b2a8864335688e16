"""LVIS-protocol evaluation (federated + frequency-binned AP) in numpy.

Parity target: the official lvis-api LVISEval as consumed by the reference
(TOV_mmdetection/mmdet/datasets/lvis.py:308-417 — metrics AP/APr/APc/APf/
AP50/AP75/APs/APm/APl at maxDets=300), re-derived without the external
package:

- **federated filtering**: a detection of category c on image i only counts
  if c has gt on i (positive set) or c is in the image's declared
  `neg_category_ids` (verified absent). Everything else is dropped — LVIS
  is not exhaustively annotated, so such dts are unknowable.
- **not-exhaustive ignore**: for categories in the image's
  `not_exhaustive_category_ids`, unmatched detections are ignored rather
  than counted as false positives.
- **frequency bins**: APr/APc/APf = mean AP over categories whose
  `frequency` field is 'r' (rare), 'c' (common), 'f' (frequent).
"""
from __future__ import annotations

from collections import OrderedDict

import numpy as np

from .cocoeval import COCOExpandEval, Params

__all__ = ["LVISExpandEval"]


class LVISExpandEval(COCOExpandEval):
    def __init__(self, cocoGt, cocoDt, iouType: str = "bbox",
                 max_dets: int = 300, **kwargs):
        cocofmt_param = dict(kwargs.pop("cocofmt_param", {}) or {})
        cocofmt_param.setdefault("maxDets", [max_dets])
        super().__init__(cocoGt, cocoDt, iouType,
                         cocofmt_param=cocofmt_param, **kwargs)

    def _prepare(self):
        super()._prepare()
        imgs = {i: self.cocoGt.load_imgs([i])[0]
                for i in self.params.imgIds}
        # positive set: categories with gt on the image
        img_pl = {i: set() for i in self.params.imgIds}
        for (img_id, cat_id), gts in self._gts.items():
            if gts:
                img_pl[img_id].add(cat_id)
        self._img_nel = {i: set(imgs[i].get("neg_category_ids", []))
                         for i in self.params.imgIds}
        self._img_ne = {i: set(imgs[i].get("not_exhaustive_category_ids",
                                           []))
                        for i in self.params.imgIds}
        # federated drop: dt categories outside pos ∪ neg are unknowable
        for (img_id, cat_id) in list(self._dts.keys()):
            if (cat_id not in img_pl[img_id]
                    and cat_id not in self._img_nel[img_id]):
                del self._dts[img_id, cat_id]

    def _finish_eval_img(self, img_id, cat_id, a_rng, max_det, dt, gt,
                         dtm, gtm, gt_ig, dt_ig):
        out = super()._finish_eval_img(img_id, cat_id, a_rng, max_det, dt,
                                       gt, dtm, gtm, gt_ig, dt_ig)
        if out is not None and cat_id in self._img_ne.get(img_id, ()):
            # not exhaustively annotated: unmatched dts -> ignored, not FP
            out["dtIgnore"] = np.logical_or(out["dtIgnore"],
                                            out["dtMatches"] == 0)
        return out

    def summarize(self):
        p = self.params
        max_det = p.maxDets[-1]
        stats: "OrderedDict[str, float]" = OrderedDict()
        stats["mAP"] = self._summarize(1, None, "all", max_det)
        stats["AP50"] = self._summarize(1, 0.5, "all", max_det)
        stats["AP75"] = self._summarize(1, 0.75, "all", max_det)
        for lbl in p.areaRngLbl[1:]:
            stats[f"AP{lbl[0]}"] = self._summarize(1, None, lbl, max_det)
        # frequency bins from the gt category records
        freq = {c["id"]: c.get("frequency", "f")
                for c in self.cocoGt.load_cats(p.catIds)}
        precision = self.eval["precision"]  # (T, R, K, A, M)
        for band, key in (("r", "APr"), ("c", "APc"), ("f", "APf")):
            ks = [k for k, cid in enumerate(p.catIds) if freq[cid] == band]
            if not ks:
                stats[key] = -1.0
                continue
            s = precision[:, :, ks, 0, -1]
            stats[key] = float(np.mean(s[s > -1])) if (s > -1).any() else -1.0
        stats["AR@%d" % max_det] = self._summarize(0, None, "all", max_det)
        self.stats_dict = stats
        self.stats = np.asarray(list(stats.values()))
        return stats


def _lvis_params_patch(params: Params):  # pragma: no cover - documentation
    """LVIS uses the coco iouThrs/recThrs/areaRng with maxDets=[300]."""
    params.maxDets = [300]
    return params
