#!/usr/bin/env python
"""P2P point-output demo.

Parity target: TOV_mmdetection/demo/p2p_image_demo.py — runs a P2P point
localizer and draws predicted points.
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
    p.add_argument("--out-file", default="p2p_demo_out.png")
    p.add_argument("--score-thr", type=float, default=0.3)
    args = p.parse_args()

    import numpy as np
    from PIL import Image, ImageDraw

    from pointtinybenchmark_tpu.apis import inference_detector, init_detector

    handle = init_detector(args.config, args.checkpoint)
    result = inference_detector(handle, args.img)
    pil = Image.open(args.img).convert("RGB")
    draw = ImageDraw.Draw(pil)
    n = 0
    for bb in np.asarray(result["bboxes"]):
        if bb[4] < args.score_thr:
            continue
        cx, cy = (bb[0] + bb[2]) / 2, (bb[1] + bb[3]) / 2
        r = 3
        draw.ellipse([cx - r, cy - r, cx + r, cy + r], fill=(255, 0, 0))
        n += 1
    pil.save(args.out_file)
    print(f"{n} points -> {args.out_file}")


if __name__ == "__main__":
    main()
