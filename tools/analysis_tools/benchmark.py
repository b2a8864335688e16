#!/usr/bin/env python
"""Inference FPS benchmark.

Parity target: TOV_mmdetection/tools/analysis_tools/benchmark.py:85-108 —
warmup + timed loop over the model forward, reporting img/s.
"""
import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--num-iters", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--shape", type=int, nargs=2, default=None,
                   help="H W (defaults to cfg.loader.pad_shape)")
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
    b = args.batch_size
    img = jnp.asarray(np.random.rand(b, shape[0], shape[1], 3), jnp.float32)
    img_shape = jnp.tile(jnp.asarray([list(shape)], jnp.int32), (b, 1))

    if args.checkpoint:
        from pointtinybenchmark_tpu.engine import load_checkpoint_any
        state = load_checkpoint_any(args.checkpoint)["state"]
        variables = {"params": state["params"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
    else:
        variables = model.init(jax.random.PRNGKey(0), img, train=False)

    @jax.jit
    def infer(img, img_shape):
        return model.apply(variables, img, img_shape,
                           method=model.simple_test)

    for _ in range(args.warmup):
        out = infer(img, img_shape)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(args.num_iters):
        out = infer(img, img_shape)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = b * args.num_iters / dt
    print(f"Overall fps: {fps:.1f} img/s "
          f"({dt / args.num_iters * 1000:.2f} ms/batch of {b}, "
          f"device={jax.devices()[0].device_kind})")


if __name__ == "__main__":
    main()
