"""Inference engine: plain and tiled (crop-and-merge) evaluation loops.

Parity targets:
- single_gpu_test (mmdet apis/test.py:16) -> `run_test`
- tiled inference (fork two_stage.py:196-259 tile_aug_test +
  rtest_time_aug.py CroppedTilesFlipAug + merge in core/bbox/transforms.py):
  per-image tile views are batched into ONE device forward (fixed tile
  shapes), boxes are shifted back by tile_offset on device, and a global
  class-aware NMS merges across tiles -> `run_tiled_test`.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.nms import batched_nms_large
from ..utils.logging import get_root_logger

__all__ = ["run_test", "run_tiled_test", "run_tta_test",
           "run_refine_test", "merge_tile_dets", "DeviceTiledInference",
           "run_device_tiled_test"]


def _to_result(bboxes: np.ndarray, labels: np.ndarray, valid: np.ndarray,
               points: Optional[np.ndarray] = None,
               mask_crops: Optional[np.ndarray] = None,
               ori_shape=None) -> Dict[str, np.ndarray]:
    keep = valid.astype(bool)
    out = dict(bboxes=bboxes[keep], labels=labels[keep])
    if points is not None:
        out["points"] = points[keep]
    if mask_crops is not None and ori_shape is not None:
        # paste the (M, s, s) probability crops into full-image binary
        # masks and RLE-encode (reference FCNMaskHead.get_seg_masks +
        # _segm2json; boxes are already in the original-image frame)
        from ..evaluation.mask_utils import paste_masks, rle_encode
        h, w = int(ori_shape[0]), int(ori_shape[1])
        full = paste_masks(np.asarray(mask_crops[keep], np.float32),
                           out["bboxes"][:, :4], h, w)
        out["masks"] = [rle_encode(m) for m in full]
    return out


def run_test(model, state, dataset, collator, batch_size: int = 1,
             rescale: bool = True) -> List[dict]:
    """Plain (untiled) eval loop; dataset pipeline must yield single views."""
    logger = get_root_logger()
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]

    @jax.jit
    def infer(img, img_shape, scale_factor):
        return model.apply(variables, img, img_shape,
                           scale_factor, rescale,
                           method=model.simple_test)

    results: List[dict] = []
    n = len(dataset)
    for start in range(0, n, batch_size):
        samples = [dataset[i] for i in range(start, min(start + batch_size, n))]
        flat = []
        for s in samples:
            flat.append(s["views"][0] if "views" in s else s)
        batch = collator(flat)
        dets, pts = infer(jnp.asarray(batch["img"]),
                          jnp.asarray(batch["img_shape"]),
                          jnp.asarray(batch["scale_factor"]))
        masks = None
        # mask roi_heads return (dets, crops); DetResult itself is a
        # NamedTuple, so detect by the missing .bboxes attribute
        if not hasattr(dets, "bboxes"):
            dets, masks = dets
            masks = np.asarray(masks)
        db = np.asarray(dets.bboxes)
        dl = np.asarray(dets.labels)
        dv = np.asarray(dets.valid)
        dp = np.asarray(pts) if pts is not None else None
        for i in range(len(flat)):
            ori = flat[i].get("img_metas", {}).get(
                "ori_shape", flat[i]["img"].shape[:2])
            results.append(_to_result(
                db[i], dl[i], dv[i], dp[i] if dp is not None else None,
                masks[i] if masks is not None else None, ori))
        if (start // batch_size) % 50 == 0:
            logger.info("test %d/%d", start + len(flat), n)
    return results


def run_tta_test(model, state, dataset, collator,
                 merge_iou_threshold: float = 0.5, max_per_img: int = 100,
                 rescale: bool = True) -> List[dict]:
    """Classic TTA merge (reference merge_aug_bboxes path,
    core/post_processing/merge_augs.py): run each (scale x flip) view, map
    boxes back to the original frame (inverse flip + inverse scale), then
    class-aware NMS across views."""
    logger = get_root_logger()
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]

    @jax.jit
    def infer(img, img_shape):
        return model.apply(variables, img, img_shape,
                           method=model.simple_test)

    results: List[dict] = []
    for idx in range(len(dataset)):
        sample = dataset[idx]
        views = sample["views"] if "views" in sample else [sample]
        batch = collator(views)
        dets, _ = infer(jnp.asarray(batch["img"]),
                        jnp.asarray(batch["img_shape"]))
        db = np.asarray(dets.bboxes)
        dl = np.asarray(dets.labels)
        dv = np.asarray(dets.valid)
        boxes_all, scores_all, labels_all, valid_all = [], [], [], []
        for vi, view in enumerate(views):
            meta = view.get("img_metas", {})
            boxes = db[vi][:, :4].copy()
            if meta.get("flip"):
                w = view["img"].shape[1]
                if meta.get("flip_direction", "horizontal") == "horizontal":
                    x1 = w - boxes[:, 2]
                    x2 = w - boxes[:, 0]
                    boxes[:, 0], boxes[:, 2] = x1, x2
                else:
                    h = view["img"].shape[0]
                    y1 = h - boxes[:, 3]
                    y2 = h - boxes[:, 1]
                    boxes[:, 1], boxes[:, 3] = y1, y2
            if rescale:
                sf = np.asarray(meta.get("scale_factor", [1, 1, 1, 1]),
                                np.float32)
                boxes = boxes / sf
            boxes_all.append(boxes)
            scores_all.append(db[vi][:, 4])
            labels_all.append(dl[vi])
            valid_all.append(dv[vi])
        mb, ms, ml = merge_tile_dets(
            np.concatenate(boxes_all), np.concatenate(scores_all),
            np.concatenate(labels_all), np.concatenate(valid_all),
            merge_iou_threshold, max_per_img)
        results.append(dict(bboxes=np.concatenate([mb, ms[:, None]], 1),
                            labels=ml))
        if idx % 50 == 0:
            logger.info("tta test %d/%d (%d views)", idx + 1, len(dataset),
                        len(views))
    return results


def run_refine_test(model, state, dataset, collator, batch_size: int = 1,
                    pseudo_wh=(16, 16), rescale: bool = True) -> List[dict]:
    """CPR annotation-refinement loop: each image's gt points are refined;
    output rows are pseudo boxes + score + ann_id (+ point), joinable back
    to annotations by tools/result2ann.py (reference eval flow SURVEY §3.2)."""
    logger = get_root_logger()
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]

    @jax.jit
    def infer(img, gt_bboxes, gt_labels, gt_valid, img_shape):
        batch = dict(gt_bboxes=gt_bboxes, gt_labels=gt_labels,
                     gt_valid=gt_valid, img_shape=img_shape)
        return model.apply(variables, img, batch, pseudo_wh,
                           method=model.refine_test)

    results: List[dict] = []
    n = len(dataset)
    for start in range(0, n, batch_size):
        samples = []
        for i in range(start, min(start + batch_size, n)):
            s = dataset[i]
            samples.append(s["views"][0] if "views" in s else s)
        batch = collator(samples)
        pts, scores, boxes, not_refine = infer(
            jnp.asarray(batch["img"]), jnp.asarray(batch["gt_bboxes"]),
            jnp.asarray(batch["gt_labels"]), jnp.asarray(batch["gt_valid"]),
            jnp.asarray(batch["img_shape"]))
        pts = np.asarray(pts)
        scores = np.asarray(scores)
        boxes = np.asarray(boxes)
        valid = np.asarray(batch["gt_valid"])
        labels = np.asarray(batch["gt_labels"])
        for bi in range(len(samples)):
            keep = valid[bi]
            sf = np.asarray(batch["scale_factor"][bi])
            bb = boxes[bi][keep]
            pp = pts[bi][keep]
            if rescale:
                bb = bb / sf
                pp = pp / sf[:2]
            res = dict(
                bboxes=np.concatenate([bb, scores[bi][keep][:, None]], 1),
                labels=labels[bi][keep],
                points=np.concatenate([pp, scores[bi][keep][:, None]], 1))
            if "gt_anns_id" in batch:
                res["anns_id"] = np.asarray(batch["gt_anns_id"][bi])[keep]
            results.append(res)
        if (start // batch_size) % 50 == 0:
            logger.info("refine test %d/%d", start + len(samples), n)
    return results


def merge_tile_dets(all_boxes: np.ndarray, all_scores: np.ndarray,
                    all_labels: np.ndarray, all_valid: np.ndarray,
                    iou_threshold: float, max_per_img: int):
    """Global class-aware NMS across tiles (fork two_stage.py:244-253)."""
    boxes = jnp.asarray(all_boxes)
    scores = jnp.asarray(all_scores)
    labels = jnp.asarray(all_labels)
    valid = jnp.asarray(all_valid)
    keep_idx, num = batched_nms_large(boxes, scores, labels, iou_threshold,
                                      max_per_img, valid_mask=valid)
    keep_idx = np.asarray(keep_idx)
    sel = keep_idx[keep_idx >= 0]
    return (np.asarray(boxes)[sel], np.asarray(scores)[sel],
            np.asarray(labels)[sel])


class DeviceTiledInference:
    """Whole-protocol inference in ONE jitted graph: uint8 frames in,
    globally-merged detections out.

    The north-star configuration (BASELINE "preprocessing runs as a
    jit-compiled per-device pipeline"): the host keeps only JPEG decode;
    normalize + static tile grid + batched forward + tile-offset shift +
    global class-aware NMS all run on device, fused by XLA. uint8 frames
    also cut host->device transfer 4x vs shipping f32 tiles.

    Matches `run_tiled_test` semantics exactly (same tile grid as
    CroppedTilesFlipAug / reference rtest_time_aug.py:43-61, same global
    merge as fork two_stage.py:244-253); tests/test_device_pipeline.py
    asserts identical detections to the host-pipeline loop.

    Args:
        model / variables: a built detector + its variables.
        frame_hw: static decoded frame (H, W).
        tile_hw: (tile_h, tile_w) protocol tile.
        tile_overlap: (overlap_w, overlap_h).
        img_norm: dict(mean=..., std=...) — host Normalize parity.
        n_images: frames per device batch (static).
    """

    def __init__(self, model, variables, frame_hw, tile_hw,
                 tile_overlap=(100, 100),
                 img_norm=None,
                 merge_iou_threshold: float = 0.5, max_per_img: int = 1000,
                 n_images: int = 1):
        from ..data.device_pipeline import DevicePreprocessor
        norm = img_norm or {}
        self.pre = DevicePreprocessor(
            frame_hw,
            mean=norm.get("mean", (123.675, 116.28, 103.53)),
            std=norm.get("std", (58.395, 57.12, 57.375)),
            tile_hw=tile_hw, tile_overlap=tile_overlap)
        self.n_images = int(n_images)
        v = self.pre.n_views
        th, tw = tile_hw
        offs = self.pre.tile_offsets                       # (V, 2)
        shift = np.concatenate([offs, offs], 1)            # (V, 4)
        shift_b = jnp.asarray(np.tile(shift, (self.n_images, 1))[:, None, :])
        img_shape = jnp.tile(jnp.asarray([[th, tw]], jnp.int32),
                             (self.n_images * v, 1))

        def _infer(frames_u8):
            tiles = self.pre.apply(frames_u8)
            out = model.apply(variables, tiles, img_shape, None, False,
                              method=model.simple_test)
            dets = out
            while not hasattr(dets, "bboxes"):
                dets = dets[0]
            boxes = dets.bboxes[..., :4] + shift_b         # global frame
            m = boxes.shape[1]
            bi = boxes.reshape(self.n_images, v * m, 4)
            si = dets.bboxes[..., 4].reshape(self.n_images, v * m)
            li = dets.labels.reshape(self.n_images, v * m)
            vi = dets.valid.reshape(self.n_images, v * m)
            # unrolled per-image global merge (ops/nms.py routing note:
            # nms_blocked transients multiply under vmap)
            outs = [batched_nms_large(bi[i], si[i], li[i],
                                      merge_iou_threshold, max_per_img,
                                      valid_mask=vi[i])
                    for i in range(self.n_images)]
            keep = jnp.stack([o[0] for o in outs])         # (N, max_per_img)
            return bi, si, li, keep

        self._infer = jax.jit(_infer)

    def __call__(self, frames) -> List[dict]:
        """frames: (n_images, H, W, 3) uint8 (or a single (H, W, 3) frame).
        Returns per-image dicts: bboxes (n, 5) in the global frame, labels."""
        frames = np.asarray(frames)
        if frames.ndim == 3:
            frames = frames[None]
        bi, si, li, keep = self._infer(frames)
        bi, si, li, keep = (np.asarray(bi), np.asarray(si), np.asarray(li),
                            np.asarray(keep))
        results = []
        for i in range(frames.shape[0]):
            sel = keep[i][keep[i] >= 0]
            results.append(dict(
                bboxes=np.concatenate([bi[i][sel], si[i][sel][:, None]], 1),
                labels=li[i][sel]))
        return results


def run_device_tiled_test(model, state, frames, frame_hw, tile_hw,
                          tile_overlap=(100, 100), img_norm=None,
                          merge_iou_threshold: float = 0.5,
                          max_per_img: int = 1000) -> List[dict]:
    """Tiled eval with the on-device preprocessing path: `frames` is an
    iterable of decoded uint8 frames (or file paths); everything after
    decode runs inside one jitted graph. Companion to `run_tiled_test`
    (which keeps the general host pipeline for scale/flip TTA variants)."""
    logger = get_root_logger()
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]
    eng = DeviceTiledInference(model, variables, frame_hw, tile_hw,
                               tile_overlap, img_norm,
                               merge_iou_threshold, max_per_img)
    results: List[dict] = []
    for idx, frame in enumerate(frames):
        if isinstance(frame, str):
            from PIL import Image
            frame = np.asarray(Image.open(frame).convert("RGB"))
        results.extend(eng(frame))
        if idx % 20 == 0:
            logger.info("device tiled test %d (%d tiles)", idx + 1,
                        eng.pre.n_views)
    return results


def run_tiled_test(model, state, dataset, collator,
                   merge_iou_threshold: float = 0.5,
                   max_per_img: int = 1000,
                   rescale: bool = True) -> List[dict]:
    """Tiled eval: each sample's views (fixed tile shape) go through one
    batched forward; results are shifted by tile_offset and globally NMS'd."""
    logger = get_root_logger()
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]

    @jax.jit
    def infer(img, img_shape, scale_factor):
        return model.apply(variables, img, img_shape, scale_factor, rescale,
                           method=model.simple_test)

    results: List[dict] = []
    for idx in range(len(dataset)):
        sample = dataset[idx]
        views = sample["views"]
        batch = collator(views)
        dets, pts = infer(jnp.asarray(batch["img"]),
                          jnp.asarray(batch["img_shape"]),
                          jnp.asarray(batch["scale_factor"]))
        db = np.asarray(dets.bboxes)      # (V, max, 5)
        dl = np.asarray(dets.labels)
        dv = np.asarray(dets.valid)
        offs = np.stack([np.asarray(v["img_metas"].get(
            "tile_offset", [0.0, 0.0]), np.float32) for v in views])  # (V, 2)
        shift = np.concatenate([offs, offs], axis=1)[:, None, :]      # (V,1,4)
        boxes = db[..., :4] + shift
        scores = db[..., 4]
        vb = boxes.reshape(-1, 4)
        vs = scores.reshape(-1)
        vl = dl.reshape(-1)
        vv = dv.reshape(-1)
        mb, ms, ml = merge_tile_dets(vb, vs, vl, vv, merge_iou_threshold,
                                     max_per_img)
        results.append(dict(
            bboxes=np.concatenate([mb, ms[:, None]], axis=1), labels=ml))
        if idx % 20 == 0:
            logger.info("tiled test %d/%d (%d tiles)", idx + 1, len(dataset),
                        len(views))
    return results
