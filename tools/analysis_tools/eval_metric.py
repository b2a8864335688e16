#!/usr/bin/env python
"""Evaluate a saved detection-result json without re-running inference.

Parity target: reference tools/analysis_tools/eval_metric.py — load config,
read saved results, call the dataset evaluation. Here the saved artifact is
the COCO-format detection json written by tools/test.py, evaluated through
COCOExpandEval with the config's `evaluation` kwargs (tiny standard, IOD
ignore handling etc.).
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

from pointtinybenchmark_tpu.data.coco import COCO  # noqa: E402
from pointtinybenchmark_tpu.evaluation.cocoeval import COCOExpandEval  # noqa: E402
from pointtinybenchmark_tpu.utils.config import Config  # noqa: E402


def evaluate_file(cfg_path: str, result_file: str, cfg_options=None):
    cfg = Config.fromfile(cfg_path)
    if cfg_options:
        cfg.merge_from_dict(cfg_options)
    test_cfg = dict(cfg.data["test"])
    ann_file = test_cfg["ann_file"]
    ev_cfg = dict(cfg.get("evaluation", {}) or {})
    gt = COCO(ann_file)
    dt = gt.loadRes(result_file)
    ev = COCOExpandEval(
        gt, dt,
        ignore_uncertain=bool(ev_cfg.get("ignore_uncertain", False)),
        use_ignore_attr=bool(ev_cfg.get("use_ignore_attr", False)),
        use_iod_for_ignore=bool(ev_cfg.get("use_iod_for_ignore", False)),
        cocofmt_param=dict(ev_cfg.get("cocofmt_kwargs", {})))
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    return dict(ev.stats_dict)


def main():
    ap = argparse.ArgumentParser(
        description="Evaluate saved result json against a config's test set")
    ap.add_argument("config")
    ap.add_argument("results", help="COCO-format detection json")
    ap.add_argument("--cfg-options", nargs="+", default=None,
                    help="key=value config overrides")
    args = ap.parse_args()
    opts = None
    if args.cfg_options:
        from pointtinybenchmark_tpu.utils.config import parse_cfg_option
        opts = {}
        for kv in args.cfg_options:
            k, v = kv.split("=", 1)
            opts[k] = parse_cfg_option(v)
    stats = evaluate_file(args.config, args.results, opts)
    for k, v in stats.items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
