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
                      iters_per_epoch: int, max_epochs: int,
                      by_epoch: bool = True):
    """Returns an optax schedule fn step -> lr. `by_epoch=False`
    (IterBasedRunner) interprets `step=[...]` boundaries as iterations
    (mmcv StepLrUpdaterHook by_epoch semantics)."""
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
            ref = epoch if by_epoch else step
            mult = jnp.asarray(1.0)
            for s in steps:
                mult = mult * jnp.where(ref >= s, gamma, 1.0)
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


def _paramwise_mults_fn(paramwise_cfg: dict):
    """Per-leaf (lr_mult, decay_mult) from a path — mmcv
    DefaultOptimizerConstructor semantics (custom_keys longest-match first,
    then norm decay mult, then bias lr/decay mult). Names here are flax
    paths ("backbone_m.layer1_0.conv1.kernel"), so custom_keys substrings
    like 'backbone' still match."""
    custom = {k: dict(v)
              for k, v in (paramwise_cfg.get("custom_keys") or {}).items()}
    keys_sorted = sorted(custom, key=len, reverse=True)
    bias_lr_mult = float(paramwise_cfg.get("bias_lr_mult", 1.0))
    bias_decay_mult = float(paramwise_cfg.get("bias_decay_mult", 1.0))
    norm_decay_mult = float(paramwise_cfg.get("norm_decay_mult", 1.0))

    def mults(path):
        name = ".".join(str(getattr(p, "key", p)) for p in path)
        for k in keys_sorted:
            if k in name:
                return (float(custom[k].get("lr_mult", 1.0)),
                        float(custom[k].get("decay_mult", 1.0)))
        low = name.lower()
        if any(t in low for t in ("batchnorm", "groupnorm", "layernorm",
                                  ".norm", "_bn")):
            return 1.0, norm_decay_mult
        if name.endswith("bias"):
            return bias_lr_mult, bias_decay_mult
        return 1.0, 1.0

    return mults


def _paramwise_lr_scale(mults) -> optax.GradientTransformation:
    import jax

    def update_fn(updates, state, params=None):
        del params
        return jax.tree_util.tree_map_with_path(
            lambda p, u: u * mults(p)[0], updates), state

    return optax.GradientTransformation(lambda _: optax.EmptyState(),
                                        update_fn)


def _paramwise_decay(wd: float, mults) -> optax.GradientTransformation:
    import jax

    def update_fn(updates, state, params):
        new = jax.tree_util.tree_map_with_path(
            lambda path, u, p: u + wd * mults(path)[1] * p, updates, params)
        return new, state

    return optax.GradientTransformation(lambda _: optax.EmptyState(),
                                        update_fn)


def build_optimizer(optimizer_cfg: dict,
                    optimizer_config: Optional[dict] = None,
                    lr_config: Optional[dict] = None,
                    iters_per_epoch: int = 1,
                    max_epochs: int = 12,
                    param_mask=None,
                    by_epoch: bool = True) -> optax.GradientTransformation:
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop("type", "SGD")
    base_lr = float(cfg.pop("lr"))
    paramwise_cfg = cfg.pop("paramwise_cfg", None)
    if paramwise_cfg:
        return _build_paramwise(opt_type, base_lr, cfg, dict(paramwise_cfg),
                                optimizer_config, lr_config, iters_per_epoch,
                                max_epochs, param_mask, by_epoch)
    schedule = build_lr_schedule(base_lr, lr_config, iters_per_epoch,
                                 max_epochs, by_epoch)

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
    return _apply_frozen(tx, param_mask)


def _apply_frozen(tx, param_mask):
    if param_mask is not None:
        import jax
        # zero updates for frozen params (reference requires_grad=False)
        frozen = (param_mask if callable(param_mask) else
                  jax.tree_util.tree_map(lambda t: not t, param_mask))
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen))
    return tx


def _build_paramwise(opt_type, base_lr, cfg, paramwise_cfg, optimizer_config,
                     lr_config, iters_per_epoch, max_epochs, param_mask,
                     by_epoch: bool = True):
    """paramwise_cfg path: decompose the optimizer so lr_mult scales the
    final update and decay_mult scales the weight-decay term per leaf —
    mmcv DefaultOptimizerConstructor parity (torch param-group semantics).

    torch ordering is preserved: SGD/Adam add wd*p to the gradient BEFORE
    the momentum/adam statistics; AdamW decays decoupled, after adam."""
    mults = _paramwise_mults_fn(paramwise_cfg)
    schedule = build_lr_schedule(base_lr, lr_config, iters_per_epoch,
                                 max_epochs, by_epoch)
    wd = float(cfg.pop("weight_decay", 0.0))
    chain = []
    grad_clip = (optimizer_config or {}).get("grad_clip")
    if grad_clip:
        chain.append(optax.clip_by_global_norm(float(grad_clip["max_norm"])))
    if opt_type == "SGD":
        if wd:
            chain.append(_paramwise_decay(wd, mults))
        momentum = float(cfg.pop("momentum", 0.0))
        if momentum:
            chain.append(optax.trace(decay=momentum,
                                     nesterov=bool(cfg.pop("nesterov",
                                                           False))))
    elif opt_type in ("Adam", "AdamW"):
        betas = cfg.pop("betas", (0.9, 0.999))
        if opt_type == "Adam" and wd:
            chain.append(_paramwise_decay(wd, mults))
        chain.append(optax.scale_by_adam(b1=float(betas[0]),
                                         b2=float(betas[1])))
        if opt_type == "AdamW" and wd:
            chain.append(_paramwise_decay(wd, mults))
    else:
        raise ValueError(f"unsupported optimizer type {opt_type}")
    chain.append(_paramwise_lr_scale(mults))
    chain.append(optax.scale_by_learning_rate(schedule))
    return _apply_frozen(optax.chain(*chain), param_mask)
