"""Checkpoint save/load (reference CheckpointHook + resume_from/load_from
semantics, SURVEY.md §5.4) using flax msgpack serialization."""
from __future__ import annotations

import os
import os.path as osp
from typing import Any, Dict, Optional

from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "latest_checkpoint",
           "save_checkpoint_orbax", "load_checkpoint_orbax",
           "save_checkpoint_any", "load_checkpoint_any"]


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


# ---------------------------------------------------------------- orbax path
# Production multi-host/async checkpointing (SURVEY §5.4 TPU-equiv): orbax
# writes each array sharded from its home devices (no host gather of the
# full tree) and can run asynchronously off the training loop. The msgpack
# path above stays the default for single-host CLI workflows and small
# artifacts (portable single file).

_PENDING_ASYNC = []


def save_checkpoint_orbax(path: str, state: Dict[str, Any],
                          meta: Optional[dict] = None,
                          async_save: bool = False):
    """Save with orbax (directory artifact). Async saves are tracked in
    _PENDING_ASYNC — call wait_for_pending() before relying on the file
    (train_detector does at loop end); dropping the checkpointer before
    the commit finishes would otherwise lose the write."""
    import jax
    import orbax.checkpoint as ocp

    path = osp.abspath(path)
    os.makedirs(osp.dirname(path), exist_ok=True)
    state = jax.device_get(state)
    ckptr = (ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
             if async_save else
             ocp.Checkpointer(ocp.StandardCheckpointHandler()))
    ckptr.save(path, {"state": state, "meta": dict(meta or {})}, force=True)
    if async_save:
        _PENDING_ASYNC.append(ckptr)
    return ckptr


def wait_for_pending():
    """Block until every async orbax save has committed."""
    while _PENDING_ASYNC:
        _PENDING_ASYNC.pop().wait_until_finished()


def load_checkpoint_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    return ckptr.restore(osp.abspath(path))


def save_checkpoint_any(path: str, state, meta=None, backend: str = "msgpack",
                        async_save: bool = False):
    """Dispatch on checkpoint_config.backend ('msgpack' | 'orbax')."""
    if backend == "orbax":
        return save_checkpoint_orbax(path, state, meta, async_save)
    return save_checkpoint(path, state, meta)


def _indexed(x):
    """lists/tuples -> {"0": ...} (flax state-dict list convention, which
    from_state_dict expects when rebuilding typed optax states)."""
    if isinstance(x, (list, tuple)):
        return {str(i): _indexed(v) for i, v in enumerate(x)}
    if isinstance(x, dict):
        return {k: _indexed(v) for k, v in x.items()}
    return x


def load_checkpoint_any(path: str, target=None) -> Dict[str, Any]:
    """Load either backend: orbax artifacts are directories. `target`
    rebuilds typed structure (optax NamedTuple states come back as plain
    dicts from both raw restores)."""
    if osp.isdir(path):
        raw = load_checkpoint_orbax(path)
        if target is not None:
            raw["state"] = serialization.from_state_dict(
                target, _indexed(raw["state"]))
        return raw
    return load_checkpoint(path, target)
