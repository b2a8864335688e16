#!/usr/bin/env python
"""Visualize CPR point refinement: annotated point -> refined point arrows.

Parity target: the reference's TestCPRHead debug plots (cpr_head.py
:1330-1607, saved under exp/debug/CPR/) — here a standalone tool reading the
refined-result json produced by tools/test.py on a CPR config.
"""
import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ori_ann", help="original (noisy point) annotation json")
    p.add_argument("det_file", help="refined result json (with ann_id)")
    p.add_argument("--img-prefix", default="")
    p.add_argument("--output-dir", default="work_dirs/cpr_debug")
    p.add_argument("--number", type=int, default=10)
    p.add_argument("--stats", action="store_true",
                   help="print refine-rate / outside-rate statistics "
                        "(TestCPRHead parity) instead of images")
    p.add_argument("--move-thr", type=float, default=1.0,
                   help="min pixel movement to count as refined")
    args = p.parse_args()

    import numpy as np
    from PIL import Image, ImageDraw

    with open(args.ori_ann) as f:
        ds = json.load(f)
    with open(args.det_file) as f:
        dets = json.load(f)
    by_ann = {d["ann_id"]: d for d in dets if "ann_id" in d}
    by_img = {}
    for a in ds["annotations"]:
        by_img.setdefault(a["image_id"], []).append(a)
    imgs = {i["id"]: i for i in ds["images"]}

    if args.stats:
        print_refine_stats(ds, by_ann, move_thr=args.move_thr)
        return

    os.makedirs(args.output_dir, exist_ok=True)
    for n, (img_id, anns) in enumerate(by_img.items()):
        if n >= args.number:
            break
        info = imgs[img_id]
        path = osp.join(args.img_prefix, info["file_name"])
        pil = (Image.open(path).convert("RGB") if osp.exists(path)
               else Image.new("RGB", (info["width"], info["height"]),
                              (40, 40, 40)))
        draw = ImageDraw.Draw(pil)
        for a in anns:
            x, y, w, h = a["bbox"]
            ox, oy = x + w / 2, y + h / 2
            det = by_ann.get(a["id"])
            draw.ellipse([ox - 2, oy - 2, ox + 2, oy + 2],
                         outline=(255, 200, 0))
            if det is None:
                continue
            bx, by_, bw, bh = det["bbox"]
            rx, ry = bx + bw / 2, by_ + bh / 2
            draw.line([ox, oy, rx, ry], fill=(0, 255, 0), width=1)
            draw.ellipse([rx - 2, ry - 2, rx + 2, ry + 2],
                         fill=(255, 0, 0))
        out = osp.join(args.output_dir, f"refine_{img_id}.png")
        pil.save(out)
        print("wrote", out)


def print_refine_stats(ds, by_ann, move_thr: float = 1.0):
    """Refine-rate / outside-rate statistics (reference TestCPRHead
    cpr_head.py:1330-1607): how many annotated points moved, and how many
    refined points fall outside their object's true box (needs
    `true_bbox` in the annotations — noise-point datasets have it)."""
    import numpy as np
    moved, total, outside, with_tb = 0, 0, 0, 0
    dists = []
    for a in ds["annotations"]:
        det = by_ann.get(a["id"])
        if det is None:
            continue
        total += 1
        x, y, w, h = a["bbox"]
        ox, oy = x + w / 2, y + h / 2
        bx, by_, bw, bh = det["bbox"]
        rx, ry = bx + bw / 2, by_ + bh / 2
        d = float(np.hypot(rx - ox, ry - oy))
        dists.append(d)
        if d > move_thr:
            moved += 1
        tb = a.get("true_bbox")
        if tb is not None:
            with_tb += 1
            tx, ty, tw, th = tb
            if not (tx <= rx <= tx + tw and ty <= ry <= ty + th):
                outside += 1
    if total == 0:
        print("no matched annotations")
        return
    print(f"points: {total}")
    print(f"refine rate: {moved / total:.4f} (moved > {move_thr}px)")
    print(f"mean move: {float(np.mean(dists)):.2f}px  "
          f"median: {float(np.median(dists)):.2f}px")
    if with_tb:
        print(f"outside rate: {outside / with_tb:.4f} "
              f"(of {with_tb} with true_bbox)")


if __name__ == "__main__":
    main()
