#!/usr/bin/env python
"""Single-image detection demo.

Parity target: TOV_mmdetection/demo/image_demo.py — init_detector +
inference_detector + show_result.
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("img")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--out-file", default="demo_out.png")
    p.add_argument("--score-thr", type=float, default=0.3)
    args = p.parse_args()

    import numpy as np
    from PIL import Image

    from pointtinybenchmark_tpu.apis import (inference_detector,
                                             init_detector, show_result)

    handle = init_detector(args.config, args.checkpoint)
    result = inference_detector(handle, args.img)
    img = np.asarray(Image.open(args.img).convert("RGB"))
    show_result(img, result, classes=handle.classes,
                score_thr=args.score_thr, out_file=args.out_file)
    print(f"{len(result['bboxes'])} detections -> {args.out_file}")


if __name__ == "__main__":
    main()
