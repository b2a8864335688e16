#!/usr/bin/env python
"""Convert torch checkpoints into this framework's flax parameter tree.

Two modes:
- backbone (default for plain ResNet state_dicts): torchvision / mmdet
  `backbone.*` ResNet -> backbone param tree.
- full detector (auto-detected via neck./rpn_head./bbox_head./roi_head.
  keys, or --full): a trained mmdet Faster R-CNN / RetinaNet checkpoint
  (the TinyPerson protocol models) -> the complete detector tree
  (backbone_m/neck_m/rpn_head_m/roi_head_m or bbox_head_m), so reference
  users can bring their trained weights across.

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




def _conv_w(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0)).astype(np.float32)


def _fc_w(w):
    return np.transpose(np.asarray(w), (1, 0)).astype(np.float32)


def _put(tree, path, val):
    d = tree
    for p in path[:-1]:
        d = d.setdefault(p, {})
    d[path[-1]] = val


def convert_detector_state_dict(sd, depth: int):
    """Full mmdet detector state_dict -> this framework's flax tree.

    Covers the TinyPerson protocol models (reference
    configs2/TinyPerson/base/*): backbone ResNet -> backbone_m, FPN neck ->
    neck_m, RPNHead -> rpn_head_m, Shared2FCBBoxHead ->
    roi_head_m/bbox_head_m, RetinaHead -> bbox_head_m. Conv kernels go
    OIHW->HWIO; linear weights transpose; the FIRST shared fc additionally
    permutes its input dim from torch's (C, 7, 7) roi-flatten order to our
    (7, 7, C) channel-last order. Returns (params, batch_stats, unmapped).
    """
    sd = {k[len("module."):] if k.startswith("module.") else k:
          np.asarray(v) for k, v in sd.items()}
    params, stats = {}, {}
    unmapped = []

    bb = {k[len("backbone."):]: v for k, v in sd.items()
          if k.startswith("backbone.")}
    if bb:
        p_bb, s_bb = convert_resnet_state_dict(bb, depth)
        params["backbone_m"] = p_bb
        stats["backbone_m"] = s_bb

    # mmdet keeps extra-level convs (add_extra_convs) in the same
    # `fpn_convs` ModuleList after the per-lateral output convs; our FPN
    # names them extra_conv{j}. Lateral count tells where the split is.
    n_lateral = len({int(k.split(".")[2]) for k in sd
                     if k.startswith("neck.lateral_convs.")})

    for k, v in sd.items():
        if k.startswith("backbone."):
            continue
        parts = k.split(".")
        if k.startswith("neck.lateral_convs.") or \
                k.startswith("neck.fpn_convs."):
            i, leaf = int(parts[2]), parts[-1]
            if "lateral" in parts[1]:
                name = "lateral_conv" + str(i)
            elif i >= n_lateral > 0:
                name = "extra_conv" + str(i - n_lateral)
            else:
                name = "fpn_conv" + str(i)
            if leaf == "weight":
                _put(params, ["neck_m", name, "kernel"], _conv_w(v))
            else:
                _put(params, ["neck_m", name, "bias"], v.astype(np.float32))
        elif k.startswith("rpn_head."):
            name, leaf = parts[1], parts[-1]
            if name in ("rpn_conv", "rpn_cls", "rpn_reg"):
                _put(params, ["rpn_head_m", name,
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_w(v) if leaf == "weight"
                     else v.astype(np.float32))
            else:
                unmapped.append(k)
        elif k.startswith("roi_head.bbox_head."):
            leaf = parts[-1]
            scope = ["roi_head_m", "bbox_head_m"]
            if parts[2] == "shared_fcs":
                i = int(parts[3])
                if leaf == "weight" and i == 0:
                    o, flat = v.shape
                    c = flat // 49
                    w = v.reshape(o, c, 7, 7).transpose(2, 3, 1, 0)
                    _put(params, scope + ["shared_fc0", "kernel"],
                         w.reshape(49 * c, o).astype(np.float32))
                elif leaf == "weight":
                    _put(params, scope + [f"shared_fc{i}", "kernel"],
                         _fc_w(v))
                else:
                    _put(params, scope + [f"shared_fc{i}", "bias"],
                         v.astype(np.float32))
            elif parts[2] in ("fc_cls", "fc_reg"):
                _put(params, scope + [parts[2],
                                      "kernel" if leaf == "weight"
                                      else "bias"],
                     _fc_w(v) if leaf == "weight"
                     else v.astype(np.float32))
            else:
                unmapped.append(k)
        elif k.startswith("bbox_head."):
            leaf = parts[-1]
            if parts[1] in ("cls_convs", "reg_convs", "ins_convs"):
                i = int(parts[2])
                name = parts[1][:3] + f"_conv{i}"
                if parts[3] == "conv":
                    _put(params, ["bbox_head_m", name, "Conv_0",
                                  "kernel" if leaf == "weight" else "bias"],
                         _conv_w(v) if leaf == "weight"
                         else v.astype(np.float32))
                elif parts[3] == "gn":
                    # mmcv ConvModule GN (FCOS/ATSS towers) -> our
                    # ConvModule's GroupNorm_0 {scale, bias}
                    _put(params, ["bbox_head_m", name, "GroupNorm_0",
                                  "scale" if leaf == "weight" else "bias"],
                         v.astype(np.float32))
                else:
                    unmapped.append(k)
            elif parts[1] in ("retina_cls", "retina_reg", "conv_cls",
                              "conv_reg", "conv_centerness"):
                _put(params, ["bbox_head_m", parts[1],
                              "kernel" if leaf == "weight" else "bias"],
                     _conv_w(v) if leaf == "weight"
                     else v.astype(np.float32))
            elif parts[1] == "scales":
                # mmcv Scale (FCOS per-level regression scale) -> scale{i}
                _put(params, ["bbox_head_m", f"scale{int(parts[2])}",
                              "scale"], v.astype(np.float32))
            elif parts[1] in ("cls_out", "reg_out", "ins_out"):
                # P2P (Conv2d outs) / CPR (Linear outs) point heads —
                # disambiguate by weight rank
                w = (_conv_w(v) if v.ndim == 4 else _fc_w(v)) \
                    if leaf == "weight" else v.astype(np.float32)
                _put(params, ["bbox_head_m", parts[1],
                              "kernel" if leaf == "weight" else "bias"], w)
            elif parts[1] in ("cls_fcs", "ins_fcs"):
                # CPR point-head fcs (reference cpr_head.py:1000-1006)
                i = int(parts[2])
                name = parts[1][:3] + f"_fc{i}"
                _put(params, ["bbox_head_m", name,
                              "kernel" if leaf == "weight" else "bias"],
                     _fc_w(v) if leaf == "weight" else v.astype(np.float32))
            else:
                unmapped.append(k)
        else:
            unmapped.append(k)
    return params, stats, unmapped


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help="torch .pth checkpoint")
    p.add_argument("dst", help="output .ckpt (flax msgpack)")
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--full", action="store_true",
                   help="convert a full mmdet detector checkpoint "
                        "(neck + heads), not just the backbone")
    args = p.parse_args()

    import torch
    raw = torch.load(args.src, map_location="cpu")
    sd = raw.get("state_dict", raw.get("model", raw))
    sd = {k: v.numpy() for k, v in sd.items()
          if hasattr(v, "numpy")}
    if args.full or any(k.startswith(("neck.", "rpn_head.", "bbox_head.",
                                      "roi_head.")) for k in sd):
        params, stats, unmapped = convert_detector_state_dict(sd, args.depth)
        if unmapped:
            print(f"warning: {len(unmapped)} unmapped keys "
                  f"(first: {unmapped[:5]})")
    else:
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
