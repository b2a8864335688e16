#!/usr/bin/env python
"""Collect the newest training log per work dir into one destination tree.

Parity target: TOV_mmdetection/exp/tools/sync_log.py (recursively find the
latest `.log` per experiment dir and sync the kept set). Copies the newest
`*.log` plus `log.json` (our JSON metrics artifact) from every work dir
under SRC into DST, preserving relative paths.

Usage: python tools/misc/sync_log.py SRC_ROOT DST_ROOT
"""
import argparse
import os
import shutil
import sys


def newest_log(d: str):
    best, best_m = None, -1.0
    for f in os.listdir(d):
        path = os.path.join(d, f)
        if os.path.isfile(path) and f.endswith(".log"):
            m = os.path.getmtime(path)
            if m > best_m:
                best, best_m = path, m
    return best


def collect(src_root: str):
    keep = []
    for d, _dirs, files in os.walk(src_root):
        log = newest_log(d)
        if log:
            keep.append(log)
        if "log.json" in files:
            keep.append(os.path.join(d, "log.json"))
    return keep


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src")
    p.add_argument("dst")
    args = p.parse_args()
    for path in collect(args.src):
        rel = os.path.relpath(path, args.src)
        out = os.path.join(args.dst, rel)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        shutil.copy2(path, out)
        print(f"{path} -> {out}")


if __name__ == "__main__":
    sys.exit(main())
