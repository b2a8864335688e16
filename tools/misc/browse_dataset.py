#!/usr/bin/env python
"""Visualize pipeline-processed training samples.

Parity target: TOV_mmdetection/tools/misc/browse_dataset.py — runs the train
pipeline and saves images with gt boxes drawn.
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--output-dir", default="work_dirs/browse")
    p.add_argument("--number", type=int, default=10)
    args = p.parse_args()

    import numpy as np

    from pointtinybenchmark_tpu.data import build_dataset
    from pointtinybenchmark_tpu.utils import Config
    from pointtinybenchmark_tpu.visualization import imshow_det_bboxes

    cfg = Config.fromfile(args.config)
    dataset = build_dataset(cfg.data["train"])
    os.makedirs(args.output_dir, exist_ok=True)
    mean = np.asarray([123.675, 116.28, 103.53])
    std = np.asarray([58.395, 57.12, 57.375])
    for i in range(min(args.number, len(dataset))):
        sample = dataset[i]
        if sample is None:
            continue
        img = sample["img"] * std + mean  # denormalize for display
        out = osp.join(args.output_dir, f"sample_{i}.png")
        imshow_det_bboxes(img, sample.get("gt_bboxes", np.zeros((0, 4))),
                          sample.get("gt_labels", np.zeros((0,), int)),
                          class_names=dataset.classes, out_file=out)
        print("wrote", out)


if __name__ == "__main__":
    main()
