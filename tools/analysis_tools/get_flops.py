#!/usr/bin/env python
"""Model FLOPs/params report.

Parity target: TOV_mmdetection/tools/analysis_tools/get_flops.py (mmcv
get_model_complexity_info) — here via XLA's own compiled cost analysis,
which is exact for the whole fused forward.
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--shape", type=int, nargs=2, default=None)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from pointtinybenchmark_tpu.models import build_detector
    from pointtinybenchmark_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    model = build_detector(dict(cfg.model),
                           cfg.get("train_cfg") or cfg.model.get("train_cfg"),
                           cfg.get("test_cfg") or cfg.model.get("test_cfg"))
    shape = args.shape or tuple(cfg.get("loader", {}).get("pad_shape",
                                                          (512, 640)))
    img = jnp.zeros((1, shape[0], shape[1], 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)

    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(variables["params"]))

    lowered = jax.jit(lambda i: model.apply(variables, i)).lower(img)
    cost = lowered.compile().cost_analysis()
    flops = cost.get("flops", float("nan")) if cost else float("nan")
    print(f"Input shape: (1, {shape[0]}, {shape[1]}, 3)")
    print(f"Params: {n_params / 1e6:.2f} M")
    print(f"FLOPs (XLA cost analysis): {flops / 1e9:.2f} GFLOPs")


if __name__ == "__main__":
    main()
