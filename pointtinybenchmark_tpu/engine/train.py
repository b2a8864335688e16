"""Training engine: jit-compiled train step + epoch loop + hooks.

Parity target: mmdet apis/train.py:37-203 (train_detector: dataloaders, DDP
wrap, EpochBasedRunner + hooks: optimizer/lr/ckpt/logger, EvalHook with
do_first_eval/do_final_eval/exit_after_eval — fork eval_hooks.py:11-39 — and
LogNanStopHook :177-203).

TPU design: one jitted train_step closes over the model; the device mesh
replaces DDP (gradients psum'd by XLA over the `data` axis); hooks run on
host between steps. Loss values are fetched asynchronously once per
log_interval, which also serves the NaN guard (the reference checks every
iter on host; here the check rides the logging sync to avoid stalling the
device pipeline).
"""
from __future__ import annotations

import os.path as osp
import sys
import time
from functools import partial
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..data import DataLoader, DetCollator, build_dataset, prefetch_to_device
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..utils.logging import get_root_logger
from .checkpoint import (load_checkpoint_any, save_checkpoint_any,
                         wait_for_pending)
from .optimizer import build_optimizer, frozen_param_mask

__all__ = ["train_detector", "make_train_step", "init_model"]

BATCH_GT_KEYS = ("img", "gt_bboxes", "gt_labels", "gt_valid", "img_shape",
                 "gt_bboxes_ignore", "gt_ignore_valid", "gt_true_bboxes",
                 "gt_anns_id", "gt_masks", "scale_factor",
                 "proposals", "proposals_valid")


def init_model(model, sample_batch: Dict[str, Any], seed: int = 0):
    img = jnp.asarray(sample_batch["img"])
    variables = model.init(jax.random.PRNGKey(seed), img, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return params, batch_stats


def make_train_step(model, tx: optax.GradientTransformation,
                    loss_keys_prefix: str = "loss") -> Callable:
    """Build the jitted train step: (state, batch, rng) -> (state, metrics).

    state = dict(params, batch_stats, opt_state, step).
    The total loss is the sum of every metric whose name starts with
    `loss` (mmdet _parse_losses parity).
    """

    # donate the state buffers: params/opt_state update in place on device
    # (halves peak HBM for the update step)
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state, batch, rng):
        def loss_fn(params):
            variables = {"params": params}
            mutable = False
            if state["batch_stats"]:
                variables["batch_stats"] = state["batch_stats"]
                mutable = ["batch_stats"]
            out = model.apply(variables, batch["img"], batch,
                              method=model.forward_train, mutable=mutable,
                              rngs={"sampler": rng})
            losses, mut = out if mutable else (out, {})
            total = sum(v for k, v in losses.items()
                        if k.startswith(loss_keys_prefix))
            return total, (losses, mut)

        (total, (losses, mut)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        # Per-step NaN guard (reference LogNanStopHook, apis/train.py:177-203,
        # checks every iter). In-graph: when the loss or any grad is
        # non-finite, SKIP the whole update (params/opt_state keep their
        # previous values) so detection latency on host can never corrupt
        # state; a sticky `nan_seen` flag rides the state and surfaces at the
        # next host sync, where train_detector exits 254.
        loss_finite = jnp.isfinite(total)
        grad_leaves = jax.tree_util.tree_leaves(grads)
        grads_finite = jnp.stack(
            [jnp.all(jnp.isfinite(g)) for g in grad_leaves]).all() \
            if grad_leaves else jnp.bool_(True)
        prev_nan = state["nan_seen"] if "nan_seen" in state \
            else jnp.bool_(False)
        # freeze state entirely once NaN was ever seen: params at host stop
        # are exactly those of the last step before the first NaN, matching
        # the reference's immediate exit semantics.
        ok = loss_finite & grads_finite & ~prev_nan
        keep = lambda new, old: jnp.where(ok, new, old)
        params = jax.tree_util.tree_map(keep, params, state["params"])
        opt_state = jax.tree_util.tree_map(keep, opt_state,
                                           state["opt_state"])
        nan_seen = prev_nan | ~loss_finite
        new_state = dict(
            params=params,
            batch_stats=mut.get("batch_stats", state["batch_stats"]),
            opt_state=opt_state,
            step=state["step"] + 1,
        )
        if "nan_seen" in state:
            new_state["nan_seen"] = nan_seen
        metrics = dict(losses)
        metrics["loss"] = total
        metrics["nan_seen"] = nan_seen
        return new_state, metrics

    return train_step


def train_detector(model, dataset, cfg, work_dir: str,
                   validate: bool = False, val_dataset=None,
                   eval_fn: Optional[Callable] = None,
                   resume_from: Optional[str] = None,
                   load_from: Optional[str] = None,
                   seed: int = 0) -> Dict[str, Any]:
    """Top-level fit loop (reference apis/train.py:37).

    eval_fn(state) -> dict of metrics; called per EvalHook policy.
    Returns the final state dict.
    """
    import os
    os.makedirs(work_dir, exist_ok=True)
    logger = get_root_logger()
    data_cfg = cfg.get("data", {})
    samples_per_gpu = int(data_cfg.get("samples_per_gpu", 2))

    mesh = make_mesh()
    n_data = mesh.devices.shape[0]
    global_batch = samples_per_gpu * n_data
    logger.info("mesh %s, global batch %d", mesh.devices.shape, global_batch)

    loader_cfg = cfg.get("loader", {})
    collator = DetCollator(
        pad_shape=tuple(loader_cfg["pad_shape"]) if loader_cfg.get("pad_shape") else None,
        size_divisor=int(loader_cfg.get("size_divisor", 32)),
        max_gt=int(loader_cfg.get("max_gt", 200)),
        max_gt_ignore=int(loader_cfg.get("max_gt_ignore", 50)))
    shuffle = data_cfg.get("shuffle")
    workers = data_cfg.get("workers_per_gpu")
    loader = DataLoader(dataset, global_batch, collator,
                        shuffle=True if shuffle is None else bool(shuffle),
                        seed=seed,
                        # variable image sizes: aspect grouping keeps the
                        # max-in-batch padding small (GroupSampler parity)
                        group_by_aspect=loader_cfg.get("pad_shape") is None,
                        num_workers=int(workers) if workers else None,
                        use_processes=bool(
                            loader_cfg.get("use_processes", False)))
    iters_per_epoch = len(loader)

    runner_cfg = cfg.get("runner", dict(type="EpochBasedRunner", max_epochs=12))
    iter_based = (str(runner_cfg.get("type", "EpochBasedRunner"))
                  == "IterBasedRunner")
    if iter_based:
        # mmcv IterBasedRunner: max_iters total steps; lr step boundaries,
        # checkpoint/eval intervals are ITERATIONS (by_epoch=False)
        max_iters = int(runner_cfg["max_iters"])
        max_epochs = max(1, -(-max_iters // max(iters_per_epoch, 1)))
    else:
        max_iters = None
        max_epochs = int(runner_cfg.get("max_epochs", 12))

    sample = next(iter(loader))
    params, batch_stats = init_model(model, sample, seed)

    # frozen_stages -> zero-update mask (reference ResNet._freeze_stages)
    frozen_stages = int(dict(cfg.get("model", {}).get(
        "backbone", {})).get("frozen_stages", -1))
    mask = (frozen_param_mask(params, frozen_stages)
            if frozen_stages >= 0 else None)
    tx = build_optimizer(cfg["optimizer"], cfg.get("optimizer_config"),
                         cfg.get("lr_config"), iters_per_epoch, max_epochs,
                         param_mask=mask, by_epoch=not iter_based)
    state = dict(params=params, batch_stats=batch_stats,
                 opt_state=tx.init(params), step=jnp.int32(0),
                 nan_seen=jnp.bool_(False))

    # model.pretrained (reference init_cfg=Pretrained semantics): a LOCAL
    # converted checkpoint loads here (backbone-only torch2jax artifacts
    # merge into backbone_m; full-detector artifacts load whole);
    # torchvision:// / http URLs cannot be fetched in this environment —
    # point the user at tools/model_converters/torch2jax.py instead.
    pretrained = dict(cfg.get("model", {}) or {}).get("pretrained")
    if pretrained and not (resume_from or load_from):
        import os.path as _osp
        if _osp.exists(str(pretrained)):
            ck = load_checkpoint_any(str(pretrained))
            ck_params = ck["state"]["params"]
            if "backbone_m" in ck_params:
                state["params"] = ck_params
                if ck["state"].get("batch_stats"):
                    state["batch_stats"] = ck["state"]["batch_stats"]
            else:
                state["params"] = dict(state["params"],
                                       backbone_m=ck_params)
                bs = ck["state"].get("batch_stats")
                if bs:
                    state["batch_stats"] = dict(state["batch_stats"],
                                                backbone_m=bs)
            logger.info("loaded pretrained weights from %s", pretrained)
        else:
            logger.warning(
                "model.pretrained=%r is not a local file (no network "
                "access); convert the torch checkpoint with "
                "tools/model_converters/torch2jax.py and pass it here or "
                "via --load-from", pretrained)

    start_epoch = 0
    if resume_from:
        ck = load_checkpoint_any(resume_from, state)
        state = ck["state"]
        start_epoch = int(ck["meta"].get("epoch", 0))
        logger.info("resumed from %s (epoch %d)", resume_from, start_epoch)
    elif load_from:
        ck = load_checkpoint_any(load_from)
        state["params"] = ck["state"]["params"]
        if ck["state"].get("batch_stats"):
            state["batch_stats"] = ck["state"]["batch_stats"]
        logger.info("loaded weights from %s", load_from)

    state = replicate(state, mesh)
    train_step = make_train_step(model, tx)

    log_interval = int(cfg.get("log_config", {}).get("interval", 50))
    ckpt_cfg = dict(cfg.get("checkpoint_config", {}) or {})
    ckpt_interval = int(ckpt_cfg.get("interval", 1))
    ckpt_backend = str(ckpt_cfg.get("backend", "msgpack"))
    ckpt_async = bool(ckpt_cfg.get("async_save", False))
    eval_cfg = dict(cfg.get("evaluation", {}) or {})
    eval_interval = int(eval_cfg.get("interval", 1))
    do_first_eval = bool(eval_cfg.get("do_first_eval", False))
    do_final_eval = bool(eval_cfg.get("do_final_eval", True))
    exit_after_eval = bool(eval_cfg.get("exit_after_eval", False))
    stop_while_nan = bool(cfg.get("check", {}).get("stop_while_nan", False))

    rng = jax.random.PRNGKey(seed + 1)
    history = []
    if do_first_eval and eval_fn is not None:
        logger.info("eval (first): %s", eval_fn(state))
        if exit_after_eval:
            wait_for_pending()
            return state

    gstep = start_epoch * iters_per_epoch
    stop_now = False
    for epoch in range(start_epoch, max_epochs):
        loader.set_epoch(epoch)
        t0 = time.perf_counter()
        pending = None
        for it, batch in enumerate(prefetch_to_device(loader)):
            dev = {k: batch[k] for k in BATCH_GT_KEYS if k in batch}
            dev = shard_batch(dev, mesh)
            rng, step_rng = jax.random.split(rng)
            state, metrics = train_step(state, dev, step_rng)
            pending = metrics
            gstep += 1
            if iter_based:
                if gstep % ckpt_interval == 0 or gstep == max_iters:
                    path = osp.join(work_dir, f"iter_{gstep}.ckpt")
                    save_checkpoint_any(path, jax.device_get(state),
                                        meta=dict(epoch=epoch + 1,
                                                  iter=gstep),
                                        backend=ckpt_backend,
                                        async_save=ckpt_async)
                    logger.info("saved %s", path)
                if (validate and eval_fn is not None
                        and gstep % eval_interval == 0
                        and gstep != max_iters):
                    logger.info("eval iter %d: %s", gstep, eval_fn(state))
                if gstep >= max_iters:
                    stop_now = True
            if (it + 1) % log_interval == 0 or it == iters_per_epoch - 1:
                vals = {k: float(v) for k, v in jax.device_get(metrics).items()}
                dt = (time.perf_counter() - t0) / (it + 1)
                logger.info("epoch %d iter %d/%d %s %.3fs/iter", epoch + 1,
                            it + 1, iters_per_epoch,
                            {k: round(v, 4) for k, v in vals.items()}, dt)
                entry = dict(epoch=epoch + 1, iter=it + 1, iter_time=dt,
                             **vals)
                history.append(entry)
                with open(osp.join(work_dir, "log.json"), "a") as f:
                    import json as _json
                    f.write(_json.dumps(entry) + "\n")
                if stop_while_nan and (vals.get("nan_seen", 0.0) > 0 or
                                       not np.isfinite(vals.get("loss", 0.0))):
                    # reference LogNanStopHook exits 254 (apis/train.py:203).
                    # nan_seen is sticky and per-step; the in-graph update was
                    # skipped for every non-finite step, so params are those
                    # of the last finite step (uncorrupted).
                    logger.error("loss went NaN — stopping (exit 254)")
                    sys.exit(254)
            if stop_now:
                break
        del pending
        if stop_now:
            if validate and eval_fn is not None and do_final_eval:
                logger.info("eval (final, iter %d): %s", gstep,
                            eval_fn(state))
            break

        if not iter_based and ((epoch + 1) % ckpt_interval == 0
                               or epoch + 1 == max_epochs):
            path = osp.join(work_dir, f"epoch_{epoch + 1}.ckpt")
            save_checkpoint_any(path, jax.device_get(state),
                                meta=dict(epoch=epoch + 1),
                                backend=ckpt_backend, async_save=ckpt_async)
            logger.info("saved %s", path)

        is_last = epoch + 1 == max_epochs
        if not iter_based and validate and eval_fn is not None and (
                (epoch + 1) % eval_interval == 0 or (is_last and do_final_eval)):
            metrics = eval_fn(state)
            logger.info("eval epoch %d: %s", epoch + 1, metrics)
            if exit_after_eval and not is_last:
                wait_for_pending()
                return state
    wait_for_pending()  # commit any async orbax saves before returning
    state = jax.device_get(state)
    state["history"] = history
    return state
