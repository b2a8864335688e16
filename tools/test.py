#!/usr/bin/env python
"""Test CLI.

Parity target: TOV_mmdetection/tools/test.py (flow at :191-229) — load
config + checkpoint, run (tiled) inference, save results json, evaluate.
"""
import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Test a detector")
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--out", help="output result file (json)")
    p.add_argument("--eval", nargs="+", default=["bbox"],
                   help="evaluation metrics")
    p.add_argument("--split", default="test", choices=["val", "test"])
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    from pointtinybenchmark_tpu.data import DetCollator, build_dataset
    from pointtinybenchmark_tpu.engine import (load_checkpoint_any,
                                               run_test, run_tiled_test)
    from pointtinybenchmark_tpu.engine.test import run_refine_test
    from pointtinybenchmark_tpu.models import build_detector
    from pointtinybenchmark_tpu.utils import (Config, get_root_logger,
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
    logger = get_root_logger()

    model = build_detector(dict(cfg.model),
                           cfg.get("train_cfg") or cfg.model.get("train_cfg"),
                           cfg.get("test_cfg") or cfg.model.get("test_cfg"))
    ds_cfg = dict(cfg.data[args.split])
    ds_cfg["test_mode"] = True
    dataset = build_dataset(ds_cfg)

    ck = load_checkpoint_any(args.checkpoint)
    state = ck["state"]

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
    if is_refine_head:
        pseudo_wh = tuple((cfg.get("test_cfg") or {}).get("pseudo_wh", (16, 16)))
        results = run_refine_test(model, state, dataset, collator,
                                  pseudo_wh=pseudo_wh)
    elif tiled:
        results = run_tiled_test(model, state, dataset, collator)
    else:
        results = run_test(model, state, dataset, collator)

    if args.out:
        with open(args.out, "w") as f:
            json.dump(dataset.format_results(results), f)
        logger.info("wrote %s", args.out)

    metrics = dataset.evaluate(results, **eval_kwargs)
    logger.info("metrics: %s", metrics)
    print(json.dumps({k: float(v) for k, v in metrics.items()}, indent=1))


if __name__ == "__main__":
    main()
