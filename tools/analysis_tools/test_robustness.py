#!/usr/bin/env python
"""Corruption-robustness benchmark.

Parity target: reference tools/analysis_tools/test_robustness.py +
robustness_eval.py — evaluate a detector under image corruptions at
severities 0..5 and report per-corruption AP plus mPC (mean performance
under corruption) and rPC (relative to clean). The `imagecorruptions`
package is replaced by the built-in `Corrupt` pipeline transform
(numpy/PIL re-implementations of the noise/blur/digital families —
weather corruptions need texture assets and are excluded).
"""
import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("--corruptions", nargs="+", default=["benchmark"],
                   help="'benchmark' = all supported, or a subset by name")
    p.add_argument("--severities", nargs="+", type=int,
                   default=[0, 1, 2, 3, 4, 5])
    p.add_argument("--eval", nargs="+", default=["bbox"])
    p.add_argument("--split", default="test", choices=["val", "test"])
    p.add_argument("--out", default=None,
                   help="save the per-corruption/severity metric table as "
                        "json (readable by robustness_eval.py)")
    return p.parse_args()


def main():
    args = parse_args()
    from pointtinybenchmark_tpu.data import DetCollator, build_dataset
    from pointtinybenchmark_tpu.data.transforms import Corrupt
    from pointtinybenchmark_tpu.engine import load_checkpoint_any, run_test
    from pointtinybenchmark_tpu.models import build_detector
    from pointtinybenchmark_tpu.utils import Config, get_root_logger

    logger = get_root_logger()
    cfg = Config.fromfile(args.config)
    corruptions = (list(Corrupt.SUPPORTED)
                   if args.corruptions == ["benchmark"]
                   else args.corruptions)

    model = build_detector(dict(cfg.model),
                           cfg.get("train_cfg") or cfg.model.get("train_cfg"),
                           cfg.get("test_cfg") or cfg.model.get("test_cfg"))
    state = load_checkpoint_any(args.checkpoint)["state"]
    loader_cfg = dict(cfg.get("loader", {}) or {})
    collator = DetCollator(
        pad_shape=tuple(loader_cfg["pad_shape"])
        if loader_cfg.get("pad_shape") else None,
        size_divisor=int(loader_cfg.get("size_divisor", 32)),
        max_gt=int(loader_cfg.get("max_gt", 200)))
    eval_kwargs = dict(cfg.get("evaluation", {}) or {})
    for k in ("interval", "do_first_eval", "do_final_eval",
              "exit_after_eval", "tiled"):
        eval_kwargs.pop(k, None)
    eval_kwargs["metric"] = args.eval

    table = {}
    clean_ap = None
    for corruption in corruptions:
        for severity in args.severities:
            if severity == 0 and clean_ap is not None:
                table.setdefault(corruption, {})[0] = clean_ap
                continue
            ds_cfg = dict(cfg.data[args.split])
            ds_cfg["test_mode"] = True
            if severity > 0:
                # inject the corruption right after image loading
                pipeline = [dict(p) for p in ds_cfg["pipeline"]]
                pipeline.insert(1, dict(type="Corrupt",
                                        corruption=corruption,
                                        severity=severity))
                ds_cfg["pipeline"] = pipeline
            dataset = build_dataset(ds_cfg)
            results = run_test(model, state, dataset, collator)
            metrics = dataset.evaluate(results, **eval_kwargs)
            ap = float(next(iter(metrics.values())))
            table.setdefault(corruption, {})[severity] = ap
            if severity == 0:
                clean_ap = ap
            logger.info("%s severity %d: %.4f", corruption, severity, ap)

    # aggregate: mPC over severities 1..5, rPC = mPC / clean
    rows = []
    for corruption, sev_map in table.items():
        cor_aps = [v for s, v in sev_map.items() if s > 0]
        mpc = sum(cor_aps) / max(len(cor_aps), 1)
        rows.append((corruption, sev_map.get(0, float("nan")), mpc))
    print(f"{'corruption':<20} {'clean':>8} {'mPC':>8} {'rPC':>8}")
    overall = []
    for corruption, clean, mpc in rows:
        rpc = mpc / clean if clean else float("nan")
        overall.append(mpc)
        print(f"{corruption:<20} {clean:>8.4f} {mpc:>8.4f} {rpc:>8.4f}")
    if overall:
        print(f"{'OVERALL mPC':<20} {'':>8} "
              f"{sum(overall) / len(overall):>8.4f}")
    if args.out:
        with open(args.out, "w") as f:
            json.dump(table, f, indent=2)


if __name__ == "__main__":
    main()
