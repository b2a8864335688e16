"""Single-image inference API.

Parity target: mmdet apis/inference.py:16,89,212 — init_detector(config,
checkpoint) -> model handle; inference_detector(model, img) -> per-class
detections; show_result -> visualization. The test pipeline is auto-rewritten
for raw ndarray input like the reference's LoadImage shim.
"""
from __future__ import annotations

from typing import List, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..data.loader import DetCollator
from ..data.transforms import Compose
from ..models import build_detector
from ..utils.config import Config

__all__ = ["init_detector", "inference_detector",
           "inference_detector_tiled", "show_result"]


class DetectorHandle:
    """Bundles model + variables + pipeline + config."""

    def __init__(self, model, variables, pipeline, cfg, classes):
        self.model = model
        self.variables = variables
        self.pipeline = pipeline
        self.cfg = cfg
        self.classes = classes
        self._infer = jax.jit(
            lambda img, shp, sf: model.apply(
                variables, img, shp, sf, True, method=model.simple_test))


def init_detector(config: Union[str, Config],
                  checkpoint: Optional[str] = None) -> DetectorHandle:
    if isinstance(config, str):
        config = Config.fromfile(config)
    model = build_detector(dict(config.model),
                           config.get("train_cfg")
                           or config.model.get("train_cfg"),
                           config.get("test_cfg")
                           or config.model.get("test_cfg"))
    variables = None
    classes = None
    if checkpoint is not None:
        from ..engine.checkpoint import load_checkpoint_any
        ck = load_checkpoint_any(checkpoint)
        state = ck["state"]
        variables = {"params": state["params"]}
        if state.get("batch_stats"):
            variables["batch_stats"] = state["batch_stats"]
        classes = ck.get("meta", {}).get("classes")

    # strip the test pipeline down to single-view transforms
    pipe_cfg = list(config.data["test"]["pipeline"])
    flat = []
    for t in pipe_cfg:
        t = dict(t)
        if t["type"] in ("CroppedTilesFlipAug", "MultiScaleFlipAug", "NoAug"):
            flat.extend(dict(x) for x in t["transforms"])
        elif t["type"] != "LoadImageFromFile":
            flat.append(t)
    pipeline = Compose([t for t in flat
                        if t["type"] not in ("ImageToTensor",)])

    if variables is None:
        # random init so the handle is usable without a checkpoint
        loader_cfg = dict(config.get("loader", {}) or {})
        ph = tuple(loader_cfg.get("pad_shape", (512, 640)))
        img = jnp.zeros((1, ph[0], ph[1], 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), img, train=False)
    return DetectorHandle(model, variables, pipeline, config, classes)


def inference_detector(handle: DetectorHandle,
                       imgs: Union[np.ndarray, str, List]) -> List[dict]:
    """Run inference on one image (ndarray HWC RGB or path) or a list.

    Returns per-image dicts: bboxes (n, 5), labels (n,).
    """
    single = not isinstance(imgs, (list, tuple))
    if single:
        imgs = [imgs]
    loader_cfg = dict(handle.cfg.get("loader", {}) or {})
    collator = DetCollator(
        pad_shape=tuple(loader_cfg["pad_shape"])
        if loader_cfg.get("pad_shape") else None,
        size_divisor=int(loader_cfg.get("size_divisor", 32)), max_gt=1)

    results = []
    for img in imgs:
        if isinstance(img, str):
            from PIL import Image
            img = np.asarray(Image.open(img).convert("RGB"), np.float32)
        sample = dict(img=img.astype(np.float32), img_shape=img.shape,
                      ori_shape=img.shape, bbox_fields=[],
                      scale=None, _rng=np.random.RandomState(0))
        out = handle.pipeline(sample)
        batch = collator([out])
        dets, _ = handle._infer(jnp.asarray(batch["img"]),
                                jnp.asarray(batch["img_shape"]),
                                jnp.asarray(batch["scale_factor"]))
        keep = np.asarray(dets.valid[0])
        results.append(dict(bboxes=np.asarray(dets.bboxes[0])[keep],
                            labels=np.asarray(dets.labels[0])[keep]))
    return results[0] if single else results


def inference_detector_tiled(handle: DetectorHandle,
                             imgs: Union[np.ndarray, str, List],
                             tile_hw=None, tile_overlap=None) -> List[dict]:
    """Tiled protocol inference with ON-DEVICE preprocessing: the host only
    decodes; normalize + tile grid + forward + global cross-tile NMS run in
    one jitted graph (engine/test.py DeviceTiledInference). Tile shape /
    overlap / normalization default to the handle config's test pipeline
    (CroppedTilesFlipAug + Normalize). Returns per-image dicts like
    `inference_detector`, boxes in the full-frame coordinate system."""
    from ..engine.test import DeviceTiledInference

    single = not isinstance(imgs, (list, tuple))
    if single:
        imgs = [imgs]

    # pull tile + norm settings from the test pipeline config
    norm = None
    for t in handle.cfg.data["test"]["pipeline"]:
        if t["type"] == "CroppedTilesFlipAug":
            if tile_hw is None:
                tw, th = t["tile_shape"]                 # reference (w, h)
                tile_hw = (int(th), int(tw))
            if tile_overlap is None:
                tile_overlap = tuple(t.get("tile_overlap", (100, 100)))
            for s in t["transforms"]:
                if s["type"] == "Normalize":
                    norm = dict(mean=s["mean"], std=s["std"])
    if tile_hw is None:
        tile_hw = (512, 640)
    if tile_overlap is None:
        tile_overlap = (100, 100)

    engines = getattr(handle, "_tiled_engines", None)
    if engines is None:
        engines = handle._tiled_engines = {}
    results = []
    for img in imgs:
        if isinstance(img, str):
            from PIL import Image
            img = np.asarray(Image.open(img).convert("RGB"))
        hw = img.shape[:2]
        if hw not in engines:                            # one jit per shape
            engines[hw] = DeviceTiledInference(
                handle.model, handle.variables, hw, tile_hw, tile_overlap,
                img_norm=norm)
        results.extend(engines[hw](img))
    return results[0] if single else results


def show_result(img: np.ndarray, result: dict, classes=None,
                score_thr: float = 0.3, out_file: Optional[str] = None):
    """Draw detections (core/visualization parity, PIL-based)."""
    from ..visualization import imshow_det_bboxes
    return imshow_det_bboxes(img, result["bboxes"], result["labels"],
                             class_names=classes, score_thr=score_thr,
                             out_file=out_file)


async def async_inference_detector(handle: DetectorHandle, img):
    """API-parity async variant (reference mmdet/apis/inference.py:212).

    JAX dispatch is already asynchronous — the device computes while Python
    continues — so this simply wraps `inference_detector` for callers using
    the reference's awaitable interface (the CUDA-stream scheduling the
    reference manages by hand has no TPU counterpart).
    """
    return inference_detector(handle, img)
