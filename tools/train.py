#!/usr/bin/env python
"""Train CLI.

Parity target: TOV_mmdetection/tools/train.py:86-184 — config + --cfg-options
deep-merge, work_dir handling, config dump, deterministic seeding, then
train_detector. The DDP launcher surface is replaced by the single-controller
JAX mesh (all local devices are used automatically).
"""
import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Train a detector")
    p.add_argument("config", help="config file path")
    p.add_argument("--work-dir", help="dir to save logs and checkpoints")
    p.add_argument("--resume-from", help="checkpoint to resume from")
    p.add_argument("--load-from", help="checkpoint to load weights from")
    p.add_argument("--no-validate", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--launcher", default="none",
                   choices=["none", "pytorch", "slurm", "mpi"],
                   help="kept for reference-CLI compatibility; "
                        "single-controller JAX needs no per-rank launch")
    p.add_argument("--cfg-options", nargs="+", default=[],
                   help="override config entries: key=value (dotted keys)")
    return p.parse_args()


def main():
    args = parse_args()
    from pointtinybenchmark_tpu.data import (CocoFmtDataset, DetCollator,
                                             build_dataset)
    from pointtinybenchmark_tpu.engine import run_test, run_tiled_test, train_detector
    from pointtinybenchmark_tpu.models import build_detector
    from pointtinybenchmark_tpu.utils import (Config, collect_env,
                                              get_root_logger,
                                              import_modules_from_strings,
                                              parse_cfg_option)

    cfg = Config.fromfile(args.config)
    if cfg.get("custom_imports"):
        import_modules_from_strings(**dict(cfg["custom_imports"]))
    if args.cfg_options:
        overrides = {}
        for kv in args.cfg_options:
            k, v = kv.split("=", 1)
            overrides[k] = parse_cfg_option(v)
        cfg.merge_from_dict(overrides)

    work_dir = args.work_dir or cfg.get("work_dir") or osp.join(
        "./work_dirs", osp.splitext(osp.basename(args.config))[0])
    os.makedirs(work_dir, exist_ok=True)
    timestamp = time.strftime("%Y%m%d_%H%M%S", time.localtime())
    logger = get_root_logger(osp.join(work_dir, f"{timestamp}.log"))
    logger.info("environment: %s", collect_env())
    cfg.dump(osp.join(work_dir, osp.basename(args.config)))

    model = build_detector(cfg.model.to_dict() if hasattr(cfg.model, "to_dict")
                           else dict(cfg.model),
                           cfg.get("train_cfg") or cfg.model.get("train_cfg"),
                           cfg.get("test_cfg") or cfg.model.get("test_cfg"))
    dataset = build_dataset(cfg.data["train"])

    eval_fn = None
    val_dataset = None
    if not args.no_validate and "val" in cfg.data:
        val_cfg = dict(cfg.data["val"])
        val_cfg["test_mode"] = True
        val_dataset = build_dataset(val_cfg)
        eval_kwargs = dict(cfg.get("evaluation", {}) or {})
        eval_kwargs.pop("interval", None)
        for k in ("do_first_eval", "do_final_eval", "exit_after_eval"):
            eval_kwargs.pop(k, None)
        tiled = bool(eval_kwargs.pop("tiled", False))
        loader_cfg = dict(cfg.get("loader", {}) or {})
        collator = DetCollator(
            pad_shape=tuple(loader_cfg["pad_shape"]) if loader_cfg.get("pad_shape") else None,
            size_divisor=int(loader_cfg.get("size_divisor", 32)),
            max_gt=int(loader_cfg.get("max_gt", 200)))

        is_refine_head = dict(cfg.model)["bbox_head"]["type"] == "CPRHead"

        def eval_fn(state, _ds=val_dataset, _c=collator, _kw=eval_kwargs):
            import jax
            from pointtinybenchmark_tpu.engine.test import run_refine_test
            host_state = jax.device_get(state)
            if is_refine_head:
                results = run_refine_test(model, host_state, _ds, _c)
            elif tiled:
                results = run_tiled_test(model, host_state, _ds, _c)
            else:
                results = run_test(model, host_state, _ds, _c)
            return _ds.evaluate(results, **_kw)

    train_detector(model, dataset, cfg, work_dir,
                   validate=eval_fn is not None, eval_fn=eval_fn,
                   resume_from=args.resume_from or cfg.get("resume_from"),
                   load_from=args.load_from or cfg.get("load_from"),
                   seed=args.seed)


if __name__ == "__main__":
    main()
