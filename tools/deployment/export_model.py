#!/usr/bin/env python
"""Export the jitted inference function for serving.

Parity target: the reference's deployment tools (tools/deployment/
pytorch2onnx.py etc., SURVEY.md §2.4 ONNX export). On TPU the serving
artifact is a `jax.export` StableHLO module — portable across JAX versions
and loadable by any XLA runtime.
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--out", default="model.stablehlo")
    p.add_argument("--batch-size", type=int, default=1)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from pointtinybenchmark_tpu.models import build_detector
    from pointtinybenchmark_tpu.utils import Config

    cfg = Config.fromfile(args.config)
    model = build_detector(dict(cfg.model),
                           cfg.get("train_cfg") or cfg.model.get("train_cfg"),
                           cfg.get("test_cfg") or cfg.model.get("test_cfg"))
    shape = tuple(cfg.get("loader", {}).get("pad_shape", (512, 640)))
    b = args.batch_size
    img = jnp.zeros((b, shape[0], shape[1], 3), jnp.float32)
    img_shape = jnp.tile(jnp.asarray([list(shape)], jnp.int32), (b, 1))

    if args.checkpoint:
        from pointtinybenchmark_tpu.engine import load_checkpoint_any
        state = load_checkpoint_any(args.checkpoint)["state"]
        variables = {"params": state["params"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
    else:
        variables = model.init(jax.random.PRNGKey(0), img, train=False)

    # the serving artifact returns flat array leaves (bboxes, labels,
    # valid[, masks...]) — namedtuple wrappers are host-side conveniences
    fn = jax.jit(lambda i, s: tuple(jax.tree_util.tree_leaves(
        model.apply(variables, i, s, method=model.simple_test))))
    exported = jexport.export(fn)(img, img_shape)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob) / 1e6:.1f} MB StableHLO -> {args.out}")
    print("in_avals:", exported.in_avals)


if __name__ == "__main__":
    main()
