#!/usr/bin/env python
"""Checkpoint housekeeping: keep only the newest N epoch checkpoints.

Parity target: the reference's exp/tools/clear_tmp_pth.py.
"""
import argparse
import os
import os.path as osp
import re


def main():
    p = argparse.ArgumentParser()
    p.add_argument("work_dirs", nargs="+")
    p.add_argument("--keep", type=int, default=1,
                   help="newest epoch checkpoints to keep per dir")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args()

    pat = re.compile(r"epoch_(\d+)\.ckpt$")
    for wd in args.work_dirs:
        ckpts = []
        for root, _, files in os.walk(wd):
            for f in files:
                m = pat.match(f)
                if m:
                    ckpts.append((int(m.group(1)), osp.join(root, f)))
        ckpts.sort()
        for _, path in ckpts[:-args.keep] if args.keep else ckpts:
            print(("would remove " if args.dry_run else "removing ") + path)
            if not args.dry_run:
                os.remove(path)


if __name__ == "__main__":
    main()
