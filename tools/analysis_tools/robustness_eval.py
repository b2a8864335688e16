#!/usr/bin/env python
"""Corruption-benchmark summary (reference tools/analysis_tools/
robustness_eval.py): read the per-corruption/severity table saved by
test_robustness.py --out and print P (clean), mPC (mean over severities
1..5) and rPC = mPC / P, with 'benchmark' (first 15 corruptions — the
imagecorruptions benchmark set) or 'all' aggregation."""
import argparse
import json

import numpy as np


def summarize(table: dict, aggregate: str = "benchmark"):
    corruptions = list(table.keys())
    use = corruptions[:15] if aggregate == "benchmark" else corruptions
    clean = [v for c in corruptions
             for s, v in table[c].items() if int(s) == 0]
    P = float(np.mean(clean)) if clean else float("nan")
    per_cor = {}
    for c in use:
        sev = [v for s, v in table[c].items() if int(s) > 0]
        per_cor[c] = float(np.mean(sev)) if sev else float("nan")
    mPC = float(np.mean(list(per_cor.values()))) if per_cor else float("nan")
    rPC = mPC / P if P else float("nan")
    return P, mPC, rPC, per_cor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("filename", help="json from test_robustness.py --out")
    ap.add_argument("--aggregate", choices=["benchmark", "all"],
                    default="benchmark")
    args = ap.parse_args()
    with open(args.filename) as f:
        table = json.load(f)
    P, mPC, rPC, per_cor = summarize(table, args.aggregate)
    print(f"{'corruption':<22} {'mPC':>8}")
    for c, v in per_cor.items():
        print(f"{c:<22} {v:>8.4f}")
    print(f"\nPerformance on Clean Data [P]            = {P:0.3f}")
    print(f"Mean Performance under Corruption [mPC]  = {mPC:0.3f}")
    print(f"Relative Performance under Corr.  [rPC]  = {rPC * 100:0.1f} %")


if __name__ == "__main__":
    main()
