#!/usr/bin/env python
"""Print the fully-resolved config (reference tools/misc/print_config.py)."""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("--cfg-options", nargs="+", default=None,
                   help="override a.b.c=v pairs")
    args = p.parse_args()
    from pointtinybenchmark_tpu.utils.config import Config, parse_cfg_option
    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        overrides = {}
        for kv in args.cfg_options:
            k, _, v = kv.partition("=")
            overrides[k] = parse_cfg_option(v)
        cfg.merge_from_dict(overrides)
    print(cfg.pretty_text())


if __name__ == "__main__":
    main()
