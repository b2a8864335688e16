#!/usr/bin/env python
"""Strip training state and stamp a content hash (reference
tools/model_converters/publish_model.py): keeps only params + batch_stats
and renames the file to <out>-<hash8>.ckpt."""
import argparse
import hashlib
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("in_file")
    p.add_argument("out_file")
    args = p.parse_args()
    from pointtinybenchmark_tpu.engine.checkpoint import (load_checkpoint,
                                                          save_checkpoint)
    raw = load_checkpoint(args.in_file)
    state = raw.get("state", raw)
    slim = {k: state[k] for k in ("params", "batch_stats") if k in state}
    meta = dict(raw.get("meta", {}))
    meta["published"] = True
    out = args.out_file
    if out.endswith(".ckpt"):
        out = out[:-5]
    save_checkpoint(out + ".ckpt", slim, meta=meta)
    with open(out + ".ckpt", "rb") as f:
        h = hashlib.sha256(f.read()).hexdigest()[:8]
    final = f"{out}-{h}.ckpt"
    import os
    os.replace(out + ".ckpt", final)
    print(f"published: {final}")


if __name__ == "__main__":
    main()
