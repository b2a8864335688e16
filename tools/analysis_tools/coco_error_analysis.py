"""COCO error-type decomposition (PR curves per error source).

Parity target: reference tools/analysis_tools/coco_error_analysis.py —
decomposes per-class precision into C75 / C50 / Loc (IoU .1) / Sim
(supercategory confusion ignored) / Oth (all class confusion ignored) /
BG (background FPs removed) / FN (=1), stacked PR plots per class + area.

Runs on this framework's own COCO + COCOExpandEval (no pycocotools).
"""
import argparse
import copy
import os

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import os.path as osp  # noqa: E402
import sys  # noqa: E402
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

from pointtinybenchmark_tpu.data.coco import COCO  # noqa: E402
from pointtinybenchmark_tpu.evaluation.cocoeval import COCOExpandEval  # noqa: E402

AREA_NAMES = ["allarea", "small", "medium", "large"]
TYPES = ["C75", "C50", "Loc", "Sim", "Oth", "BG", "FN"]
COLORS = np.vstack([
    np.ones((2, 3)),
    [0.31, 0.51, 0.74],
    [0.75, 0.31, 0.30],
    [0.36, 0.90, 0.38],
    [0.50, 0.39, 0.64],
    [1.0, 0.6, 0.0],
])


def _area_rng(areas):
    if areas:
        a0, a1, a2 = areas
        return [[0, a2], [0, a0], [a0, a1], [a1, a2]]
    return [[0, 1e10], [0, 32 ** 2], [32 ** 2, 96 ** 2], [96 ** 2, 1e10]]


def _run_eval(gt, dt, iou_thrs, areas):
    ev = COCOExpandEval(gt, dt, cocofmt_param=dict(
        iouThrs=np.asarray(iou_thrs, float), maxDets=[100],
        areaRng=_area_rng(areas),
        areaRngLbl=AREA_NAMES))
    ev.evaluate()
    ev.accumulate()
    return ev


def _relabel_ignored(gt: COCO, cat_id: int, cat_ids_to_fold) -> COCO:
    """Copy gt with the given other categories re-labelled to cat_id and
    marked ignore, so their matches don't count as FP or FN."""
    ds = copy.deepcopy(gt.dataset)
    for ann in ds.get("annotations", []):
        if ann["category_id"] in cat_ids_to_fold and \
                ann["category_id"] != cat_id:
            ann["ignore"] = 1
            ann["iscrowd"] = 1
            ann["category_id"] = cat_id
    return COCO(ds)


def analyze_per_category(gt: COCO, dt: COCO, cat_id: int, areas):
    """Returns (ps_supercategory, ps_allcategory): (R, A) precision at
    IoU 0.1 with confusion sources progressively ignored."""
    cat = gt.cats[cat_id]
    sup = cat.get("supercategory")
    sup_ids = [c["id"] for c in gt.cats.values()
               if c.get("supercategory") == sup] if sup else []
    dt_sel = COCO(dict(images=dt.dataset.get("images", []),
                       categories=dt.dataset.get("categories", []),
                       annotations=[a for a in
                                    dt.dataset.get("annotations", [])
                                    if a["category_id"] == cat_id]))
    ev = _run_eval(_relabel_ignored(gt, cat_id, sup_ids), dt_sel, [0.1],
                   areas)
    k = sorted(gt.get_cat_ids()).index(cat_id)
    ps_sup = ev.eval["precision"][0, :, k, :, 0]
    all_ids = list(gt.cats.keys())
    ev = _run_eval(_relabel_ignored(gt, cat_id, all_ids), dt_sel, [0.1],
                   areas)
    ps_all = ev.eval["precision"][0, :, k, :, 0]
    return ps_sup, ps_all


def make_plot(rec_thrs, ps, out_dir, class_name):
    """ps: (7, R, A) per error type. Stacked PR curves per area group."""
    for ai, area in enumerate(AREA_NAMES):
        curves = [np.zeros_like(rec_thrs)]
        aps = []
        for t in range(7):
            c = ps[t, :, ai]
            aps.append(float(np.mean(c)))
            curves.append(c)
        fig, ax = plt.subplots()
        for t in range(7):
            ax.plot(rec_thrs, curves[t + 1], color="k", linewidth=0.5)
            ax.fill_between(rec_thrs, curves[t], curves[t + 1],
                            color=COLORS[t],
                            label=f"[{aps[t]:.3f}]{TYPES[t]}")
        ax.set_xlabel("recall")
        ax.set_ylabel("precision")
        ax.set_xlim(0, 1)
        ax.set_ylim(0, 1)
        ax.set_title(f"bbox-{class_name}-{area}")
        ax.legend()
        fig.savefig(os.path.join(out_dir, f"bbox-{class_name}-{area}.png"))
        plt.close(fig)


def analyze_results(res_file, ann_file, out_dir, areas=None):
    os.makedirs(out_dir, exist_ok=True)
    gt = COCO(ann_file)
    dt = gt.loadRes(res_file)
    cat_ids = sorted(gt.get_cat_ids())
    K = len(cat_ids)

    ev = _run_eval(gt, dt, [0.75, 0.5, 0.1], areas)
    prec = ev.eval["precision"][:, :, :, :, 0]       # (3, R, K, A)
    rec_thrs = np.asarray(ev.params.recThrs, float)
    R, A = prec.shape[1], prec.shape[3]
    ps = np.zeros((7, R, K, A))
    ps[:3] = prec
    for k, cid in enumerate(cat_ids):
        ps_sup, ps_all = analyze_per_category(gt, dt, cid, areas)
        ps[3, :, k] = ps_sup
        ps[4, :, k] = ps_all
    ps[ps == -1] = 0
    ps[5] = (ps[4] > 0).astype(float)
    ps[6] = 1.0
    for k, cid in enumerate(cat_ids):
        make_plot(rec_thrs, ps[:, :, k], out_dir, gt.cats[cid]["name"])
    make_plot(rec_thrs, ps.mean(axis=2), out_dir, "allclass")
    return ps


def main():
    ap = argparse.ArgumentParser(description="COCO error analysis")
    ap.add_argument("result", help="result json path")
    ap.add_argument("out_dir", help="dir to save plots")
    ap.add_argument("--ann", required=True, help="annotation json path")
    ap.add_argument("--areas", type=int, nargs=3, default=None,
                    help="small/medium/large area thresholds")
    args = ap.parse_args()
    analyze_results(args.result, args.ann, args.out_dir, areas=args.areas)


if __name__ == "__main__":
    main()
