#!/usr/bin/env python
"""Evaluate an exported serving artifact against a dataset.

Parity target: the reference's tools/deployment/test.py (run the exported
ONNX/TensorRT model through the test pipeline and dataset.evaluate). Here
the artifact is the StableHLO module from export_model.py: it is
deserialized, called on collated batches, and the detections are scored
with the same dataset.evaluate path as tools/test.py — proving the SERVING
artifact (not just the python model) reproduces the metrics.
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("artifact", help=".stablehlo from export_model.py")
    p.add_argument("--split", default="test")
    p.add_argument("--eval", default="bbox")
    p.add_argument("--out", default=None, help="save detection json")
    args = p.parse_args()

    import numpy as np
    import jax.numpy as jnp
    from jax import export as jexport

    from pointtinybenchmark_tpu.data import DetCollator, build_dataset
    from pointtinybenchmark_tpu.utils import Config, get_root_logger

    logger = get_root_logger()
    cfg = Config.fromfile(args.config)
    with open(args.artifact, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    in_aval = exported.in_avals[0]
    b, h, w = in_aval.shape[0], in_aval.shape[1], in_aval.shape[2]
    logger.info("artifact expects (%d, %d, %d, 3) images", b, h, w)

    ds_cfg = dict(cfg.data[args.split])
    ds_cfg["test_mode"] = True
    dataset = build_dataset(ds_cfg)
    collator = DetCollator(pad_shape=(h, w))

    results = []
    for start in range(0, len(dataset), b):
        samples = [dataset[i] for i in range(start, min(start + b,
                                                        len(dataset)))]
        # NoAug/MultiScaleFlipAug pipelines wrap the single view in
        # "views" (engine/test.py run_test does the same unwrap)
        flat = [s_["views"][0] if "views" in s_ else s_
                for s_ in samples if s_ is not None]
        batch = collator(flat)
        img = np.asarray(batch["img"], np.float32)
        n = img.shape[0]
        if n < b:  # pad the tail batch to the artifact's static shape
            img = np.concatenate(
                [img, np.zeros((b - n, h, w, 3), np.float32)])
            shp = np.concatenate([batch["img_shape"],
                                  np.tile([[h, w]], (b - n, 1))]).astype(
                np.int32)
        else:
            shp = np.asarray(batch["img_shape"], np.int32)
        out = exported.call(jnp.asarray(img), jnp.asarray(shp))
        # flat leaves: (bboxes (B,M,5), labels (B,M), valid (B,M)[, ...])
        bboxes, labels, valid = (np.asarray(out[0]), np.asarray(out[1]),
                                 np.asarray(out[2]))
        for i in range(n):
            keep = valid[i].astype(bool)
            results.append(dict(bboxes=bboxes[i][keep],
                                labels=labels[i][keep]))
    if args.out:
        import json
        with open(args.out, "w") as f:
            json.dump(dataset.format_results(results), f)
    metrics = dataset.evaluate(results, metric=args.eval)
    for k, v in metrics.items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
