#!/usr/bin/env python
"""Training-log analysis: loss curves + average iter time.

Parity target: TOV_mmdetection/tools/analysis_tools/analyze_logs.py — works
on the json-lines logs written by the train engine (work_dir/log.json).
"""
import argparse
import json


def load_log(path):
    entries = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                entries.append(json.loads(line))
    return entries


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="task", required=True)
    pc = sub.add_parser("plot_curve")
    pc.add_argument("json_logs", nargs="+")
    pc.add_argument("--keys", nargs="+", default=["loss"])
    pc.add_argument("--out", default=None)
    ct = sub.add_parser("cal_train_time")
    ct.add_argument("json_logs", nargs="+")
    args = p.parse_args()

    if args.task == "cal_train_time":
        for path in args.json_logs:
            entries = [e for e in load_log(path) if "iter_time" in e]
            if not entries:
                print(f"{path}: no iter_time entries")
                continue
            times = [e["iter_time"] for e in entries]
            print(f"{path}: avg {sum(times) / len(times):.4f}s/iter "
                  f"(n={len(times)}, fastest {min(times):.4f}, "
                  f"slowest {max(times):.4f})")
    else:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        for path in args.json_logs:
            entries = load_log(path)
            for key in args.keys:
                xs = [i for i, e in enumerate(entries) if key in e]
                ys = [e[key] for e in entries if key in e]
                if ys:
                    plt.plot(xs, ys, label=f"{path}:{key}")
        plt.legend()
        plt.xlabel("log step")
        out = args.out or "curve.png"
        plt.savefig(out)
        print(f"saved {out}")


if __name__ == "__main__":
    main()
