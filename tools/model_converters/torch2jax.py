#!/usr/bin/env python
"""Convert torch ResNet checkpoints (torchvision or mmdet `backbone.*`) into
this framework's flax parameter tree.

Parity role: the reference loads ImageNet-pretrained torch backbones via
`init_cfg`/`load_from` (mmdet models/backbones/resnet.py + mmcv
load_checkpoint); users migrating bring the same .pth files. This tool maps

  conv1/bn1                  -> Conv_0 / BatchNorm_0          (stem)
  layer{L}.{B}.conv{k}/bn{k} -> layer{L}_block{B}.Conv_{k-1}/BatchNorm_{k-1}
  layer{L}.{B}.downsample.0/1-> last Conv_/BatchNorm_ slot of the block

with OIHW->HWIO kernel transposition and BN (weight, bias, running_mean,
running_var) -> (scale, bias, batch_stats.mean, batch_stats.var).

Usage:
  python tools/model_converters/torch2jax.py in.pth out.ckpt --depth 50
The output is a msgpack checkpoint loadable with
`engine.checkpoint.load_checkpoint`, shaped {"state": {"params": {...},
"batch_stats": {...}}} so it drops into `load_from` for the backbone.
"""
import argparse
import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

BASIC_DEPTHS = (18, 34)


def convert_resnet_state_dict(sd, depth: int):
    """torch state_dict (numpy-valued ok) -> (params, batch_stats) trees."""
    # strip common prefixes (mmdet: 'backbone.', DDP: 'module.')
    def strip(k):
        for p in ("module.", "backbone."):
            if k.startswith(p):
                k = k[len(p):]
        return k

    sd = {strip(k): np.asarray(v) for k, v in sd.items()
          if not strip(k).startswith(("fc.", "head."))}
    params, stats = {}, {}

    def put(tree, path, val):
        d = tree
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = val

    def conv(src, dst_scope, dst_idx):
        w = sd[f"{src}.weight"]                  # (O, I, H, W)
        put(params, dst_scope + [f"Conv_{dst_idx}", "kernel"],
            np.transpose(w, (2, 3, 1, 0)).astype(np.float32))

    def bn(src, dst_scope, dst_idx):
        put(params, dst_scope + [f"BatchNorm_{dst_idx}", "scale"],
            sd[f"{src}.weight"].astype(np.float32))
        put(params, dst_scope + [f"BatchNorm_{dst_idx}", "bias"],
            sd[f"{src}.bias"].astype(np.float32))
        put(stats, dst_scope + [f"BatchNorm_{dst_idx}", "mean"],
            sd[f"{src}.running_mean"].astype(np.float32))
        put(stats, dst_scope + [f"BatchNorm_{dst_idx}", "var"],
            sd[f"{src}.running_var"].astype(np.float32))

    conv("conv1", [], 0)
    bn("bn1", [], 0)
    n_convs = 2 if depth in BASIC_DEPTHS else 3
    lidx = 0
    while f"layer{lidx + 1}.0.conv1.weight" in sd:
        lidx += 1
        b = 0
        while f"layer{lidx}.{b}.conv1.weight" in sd:
            scope = [f"layer{lidx}_block{b}"]
            for k in range(n_convs):
                conv(f"layer{lidx}.{b}.conv{k + 1}", scope, k)
                bn(f"layer{lidx}.{b}.bn{k + 1}", scope, k)
            if f"layer{lidx}.{b}.downsample.0.weight" in sd:
                conv(f"layer{lidx}.{b}.downsample.0", scope, n_convs)
                bn(f"layer{lidx}.{b}.downsample.1", scope, n_convs)
            b += 1
    return params, stats


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help="torch .pth checkpoint")
    p.add_argument("dst", help="output .ckpt (flax msgpack)")
    p.add_argument("--depth", type=int, default=50)
    args = p.parse_args()

    import torch
    raw = torch.load(args.src, map_location="cpu")
    sd = raw.get("state_dict", raw.get("model", raw))
    sd = {k: v.numpy() for k, v in sd.items()
          if hasattr(v, "numpy")}
    params, stats = convert_resnet_state_dict(sd, args.depth)

    from pointtinybenchmark_tpu.engine.checkpoint import save_checkpoint
    save_checkpoint(args.dst,
                    {"params": params, "batch_stats": stats},
                    meta=dict(source=args.src, depth=args.depth,
                              converter="torch2jax"))
    n = sum(1 for _ in _leaves(params))
    print(f"wrote {args.dst}: {n} param tensors")


def _leaves(d):
    for v in d.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
