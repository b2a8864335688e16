#!/usr/bin/env python
"""Checkpoint housekeeping: keep only the newest epoch checkpoint per
work dir, delete the rest.

Parity target: TOV_mmdetection/exp/tools/clear_tmp_pth.py (walks work
dirs, keeps max-epoch `epoch_N.pth`). Here checkpoints are flax msgpack
files (`epoch_N.ckpt`) or orbax directories (`epoch_N/`), plus the
`latest.*` alias which is always kept.

Usage: python tools/misc/clear_tmp_ckpt.py WORK_DIR [WORK_DIR...] [--dry-run]
"""
import argparse
import os
import re
import shutil
import sys

EPOCH_RE = re.compile(r"^(?:epoch|iter)_(\d+)(\.ckpt)?$")


def sweep(dirs, dry_run: bool = False, keep: int = 1):
    removed = []
    dirs = list(dirs)
    while dirs:
        d = dirs.pop(0)
        found = {}
        for f in os.listdir(d):
            path = os.path.join(d, f)
            m = EPOCH_RE.match(f)
            if m:
                found[int(m.group(1))] = path
            elif os.path.isdir(path):
                dirs.append(path)
        if not found:
            continue
        kept = sorted(found)[-keep:] if keep else []
        for n, path in sorted(found.items()):
            if n in kept:
                continue
            print(f"rm {path}")
            removed.append(path)
            if dry_run:
                continue
            if os.path.isdir(path):
                shutil.rmtree(path)
            else:
                os.remove(path)
    return removed


def main():
    p = argparse.ArgumentParser()
    p.add_argument("dirs", nargs="+")
    p.add_argument("--keep", type=int, default=1,
                   help="newest epoch checkpoints to keep per dir")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args()
    sweep(args.dirs, args.dry_run, args.keep)


if __name__ == "__main__":
    sys.exit(main())
