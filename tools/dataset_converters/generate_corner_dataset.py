#!/usr/bin/env python
"""Offline corner (tile) dataset generation CLI.

Parity target: huicv corner_dataset generation CLI (reference
docs/tov/evaluation_of_tiny_object.md + configs2/TinyPersonV2/
TinyPersonV2.md:7-36): split a COCO json into overlapping tiles whose image
entries carry `corner=(l,u,r,b)` + `ori_id`.
"""
import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ann_file")
    p.add_argument("out_file")
    p.add_argument("--sub-img-w", type=int, default=640)
    p.add_argument("--sub-img-h", type=int, default=512)
    p.add_argument("--overlap-w", type=int, default=0)
    p.add_argument("--overlap-h", type=int, default=0)
    p.add_argument("--keep-ratio-th", type=float, default=0.3)
    args = p.parse_args()

    from pointtinybenchmark_tpu.data.tiling import generate_corner_dataset

    ds = generate_corner_dataset(
        args.ann_file,
        dict(sub_img_w=args.sub_img_w, sub_img_h=args.sub_img_h,
             overlap_w=args.overlap_w, overlap_h=args.overlap_h,
             keep_ratio_th=args.keep_ratio_th))
    with open(args.out_file, "w") as f:
        json.dump(ds, f)
    print(f"{len(ds['images'])} tiles, {len(ds['annotations'])} annotations "
          f"-> {args.out_file}")


if __name__ == "__main__":
    main()
