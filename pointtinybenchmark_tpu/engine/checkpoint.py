"""Checkpoint save/load (reference CheckpointHook + resume_from/load_from
semantics, SURVEY.md §5.4) using flax msgpack serialization."""
from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, Optional

from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint"]


def save_checkpoint(path: str, state: Dict[str, Any], meta: Optional[dict] = None):
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    payload = {"state": state, "meta": meta or {}}
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    # maintain a 'latest' pointer like mmcv's latest.pth symlink
    latest = osp.join(osp.dirname(osp.abspath(path)), "latest.ckpt")
    try:
        if osp.islink(latest) or osp.exists(latest):
            os.remove(latest)
        os.symlink(osp.basename(path), latest)
    except OSError:
        pass


def load_checkpoint(path: str, target: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    with open(path, "rb") as f:
        data = f.read()
    raw = serialization.msgpack_restore(data)
    if target is not None:
        raw["state"] = serialization.from_state_dict(target, raw["state"])
    return raw


def latest_checkpoint(work_dir: str) -> Optional[str]:
    p = osp.join(work_dir, "latest.ckpt")
    return p if osp.exists(p) else None
