"""Optimizer + LR schedule building from reference-style configs.

Parity targets:
- optimizer=dict(type='SGD', lr=.., momentum=.., weight_decay=..) /
  dict(type='Adam', lr=..) (reference configs).
- optimizer_config=dict(grad_clip=dict(max_norm=N, norm_type=2)) — the
  tiny-object NaN-prevention recipe ("-c" configs, SURVEY.md §2.2/§5.3).
- lr_config=dict(policy='step', warmup='linear', warmup_iters, warmup_ratio,
  step=[e1, e2]) — mmcv StepLrUpdaterHook semantics: lr multiplied by 0.1 at
  the given epochs, linear warmup from lr*warmup_ratio over warmup_iters.
"""
from __future__ import annotations

from typing import Optional, Sequence

import optax

__all__ = ["build_optimizer", "build_lr_schedule"]


def build_lr_schedule(base_lr: float, lr_config: Optional[dict],
                      iters_per_epoch: int, max_epochs: int):
    """Returns an optax schedule fn step -> lr."""
    lr_config = dict(lr_config or {})
    policy = lr_config.get("policy", "fixed")
    warmup = lr_config.get("warmup")
    warmup_iters = int(lr_config.get("warmup_iters", 500))
    warmup_ratio = float(lr_config.get("warmup_ratio", 0.1))
    gamma = float(lr_config.get("gamma", 0.1))
    steps: Sequence[int] = lr_config.get("step", [])
    min_lr = lr_config.get("min_lr")

    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step)
        epoch = step // max(iters_per_epoch, 1)
        if policy == "step":
            mult = jnp.asarray(1.0)
            for s in steps:
                mult = mult * jnp.where(epoch >= s, gamma, 1.0)
            lr = base_lr * mult
        elif policy == "cosine" or policy == "CosineAnnealing":
            total = max(iters_per_epoch * max_epochs, 1)
            frac = jnp.clip(step / total, 0, 1)
            floor = min_lr if min_lr is not None else 0.0
            lr = floor + (base_lr - floor) * 0.5 * (1 + jnp.cos(jnp.pi * frac))
        else:
            lr = jnp.asarray(base_lr)
        if warmup == "linear":
            k = jnp.clip(step / max(warmup_iters, 1), 0, 1)
            warm = base_lr * (warmup_ratio + (1 - warmup_ratio) * k)
            lr = jnp.where(step < warmup_iters, jnp.minimum(warm, lr), lr)
        elif warmup == "constant":
            lr = jnp.where(step < warmup_iters, base_lr * warmup_ratio, lr)
        return lr

    return schedule


def frozen_param_mask(params, frozen_stages: int,
                      backbone_key: str = "backbone_m"):
    """Trainability mask implementing the reference's `frozen_stages`
    (ResNet stem + stages 1..frozen_stages stop updating — mmdet
    ResNet._freeze_stages). Returns a pytree of bools (True = trainable)."""
    import jax

    def trainable(path) -> bool:
        keys = [getattr(p, "key", str(p)) for p in path]
        if backbone_key not in keys:
            return True
        name = "/".join(str(k) for k in keys)
        if frozen_stages >= 0 and ("Conv_0" in name or "BatchNorm_0" in name):
            # stem conv/bn are the first anonymous modules of the backbone
            bi = keys.index(backbone_key)
            if bi + 1 < len(keys) and str(keys[bi + 1]) in ("Conv_0",
                                                            "BatchNorm_0"):
                return False
        for s in range(1, frozen_stages + 1):
            if any(str(k).startswith(f"layer{s}_") for k in keys):
                return False
        return True

    return jax.tree_util.tree_map_with_path(
        lambda path, _: trainable(path), params)


def build_optimizer(optimizer_cfg: dict,
                    optimizer_config: Optional[dict] = None,
                    lr_config: Optional[dict] = None,
                    iters_per_epoch: int = 1,
                    max_epochs: int = 12,
                    param_mask=None) -> optax.GradientTransformation:
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop("type", "SGD")
    base_lr = float(cfg.pop("lr"))
    schedule = build_lr_schedule(base_lr, lr_config, iters_per_epoch,
                                 max_epochs)

    chain = []
    grad_clip = (optimizer_config or {}).get("grad_clip")
    if grad_clip:
        chain.append(optax.clip_by_global_norm(float(grad_clip["max_norm"])))

    wd = float(cfg.pop("weight_decay", 0.0))
    if opt_type == "SGD":
        momentum = float(cfg.pop("momentum", 0.0))
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.sgd(learning_rate=schedule, momentum=momentum,
                               nesterov=bool(cfg.pop("nesterov", False))))
    elif opt_type in ("Adam", "AdamW"):
        if opt_type == "AdamW" or wd:
            chain.append(optax.adamw(learning_rate=schedule, weight_decay=wd,
                                     b1=float(cfg.pop("betas", (0.9, 0.999))[0]
                                              if "betas" in cfg else 0.9)))
        else:
            chain.append(optax.adam(learning_rate=schedule))
    else:
        raise ValueError(f"unsupported optimizer type {opt_type}")
    tx = optax.chain(*chain)
    if param_mask is not None:
        import jax
        # zero updates for frozen params (reference requires_grad=False)
        frozen = (param_mask if callable(param_mask) else
                  jax.tree_util.tree_map(lambda t: not t, param_mask))
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen))
    return tx
