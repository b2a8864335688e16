"""Host-side data pipeline transforms (numpy + PIL).

Parity targets (TOV_mmdetection/mmdet/datasets/pipelines/):
- LoadImageFromFile incl. the fork's corner-crop-on-load (loading.py:63-68)
- LoadAnnotations incl. fork keys gt_true_bboxes (:252), gt_anns_id (:274-275)
- Resize incl. the fork's scale_factor=[1.0] native-resolution mode
  (transforms.py:74,99-103), keep_ratio rescale semantics
- RandomFlip, Normalize, Pad(size_divisor / fixed size)
- Compose + Collect (formating.py; DataContainer machinery is replaced by
  plain dicts — the TPU collator does static-shape padding instead).

Transforms are dict-in/dict-out. Images flow as float32 RGB HWC numpy
(mmcv loads BGR and converts in Normalize(to_rgb=True); loading RGB directly
and treating to_rgb as a no-op is numerically identical).
"""
from __future__ import annotations

import os.path as osp
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from ..utils.registry import PIPELINES

__all__ = ["Compose", "LoadImageFromFile", "LoadAnnotations", "Resize",
           "RandomFlip", "Normalize", "Pad", "Collect", "DefaultFormatBundle",
           "ImageToTensor", "RandomCrop", "PhotoMetricDistortion"]


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = []
        for t in transforms:
            if isinstance(t, dict):
                self.transforms.append(PIPELINES.build(dict(t)))
            elif callable(t):
                self.transforms.append(t)
            else:
                raise TypeError(f"transform must be dict or callable: {t}")

    def __call__(self, results: Optional[dict]) -> Optional[dict]:
        for t in self.transforms:
            results = t(results)
            if results is None:
                return None
        return results

    def __repr__(self):
        return f"Compose({self.transforms})"


@PIPELINES.register_module()
class LoadImageFromFile:
    """Image decode (+ fork corner-crop on load, loading.py:63-68).

    `cache=True` keeps the decoded (and corner-cropped) uint8 tile in a
    process-wide RAM cache so PIL leaves the hot loop after the first
    epoch — the binding host constraint for fixed-tile training on a
    1-core host (VERDICT r2 weak #2). `cache_max_bytes` caps the cache
    (insertion stops when full; no eviction — epoch access is cyclic, so
    LRU would thrash)."""

    _CACHE: dict = {}
    _CACHE_BYTES = [0]

    def __init__(self, to_float32: bool = True, color_type: str = "color",
                 cache: bool = False,
                 cache_max_bytes: int = 2 * 1024**3):
        self.to_float32 = to_float32
        self.cache = cache
        self.cache_max_bytes = int(cache_max_bytes)

    def _decode(self, filename: str, info: dict) -> np.ndarray:
        img = np.asarray(Image.open(filename).convert("RGB"))
        # fork corner-crop: pre-tiled (corner) datasets carry a crop rect
        if "corner" in info:
            l, u, r, b = [int(v) for v in info["corner"]]
            img = img[u:b, l:r]
        return img

    def __call__(self, results: dict) -> dict:
        info = results["img_info"]
        if results.get("img_prefix"):
            filename = osp.join(results["img_prefix"], info["file_name"])
        else:
            filename = info["file_name"]
        if self.cache:
            key = (filename, tuple(info.get("corner", ())))
            img = self._CACHE.get(key)
            if img is None:
                img = self._decode(filename, info)
                if self._CACHE_BYTES[0] + img.nbytes <= self.cache_max_bytes:
                    self._CACHE[key] = img
                    self._CACHE_BYTES[0] += img.nbytes
        else:
            img = self._decode(filename, info)
        if self.to_float32:
            img = img.astype(np.float32)
        elif self.cache:
            img = img.copy()   # downstream transforms mutate in place
        results["filename"] = filename
        results["ori_filename"] = info["file_name"]
        results["img"] = img
        results["img_shape"] = img.shape
        results["ori_shape"] = img.shape
        results["img_fields"] = ["img"]
        return results


@PIPELINES.register_module()
class LoadAnnotations:
    def __init__(self, with_bbox: bool = True, with_label: bool = True,
                 with_mask: bool = False, with_seg: bool = False):
        self.with_bbox = with_bbox
        self.with_label = with_label
        self.with_mask = with_mask

    @staticmethod
    def _rasterize(segs, h: int, w: int) -> np.ndarray:
        """COCO polygon lists -> (G, H, W) uint8 bitmaps (PIL rasterizer)."""
        from PIL import ImageDraw
        masks = np.zeros((len(segs), h, w), np.uint8)
        for i, seg in enumerate(segs):
            if not seg:
                continue
            img = Image.new("L", (w, h), 0)
            draw = ImageDraw.Draw(img)
            polys = seg if isinstance(seg, (list, tuple)) and seg and \
                isinstance(seg[0], (list, tuple)) else [seg]
            for poly in polys:
                if poly is None or len(poly) < 6:
                    continue
                draw.polygon([float(v) for v in poly], fill=1)
            masks[i] = np.asarray(img, np.uint8)
        return masks

    def __call__(self, results: dict) -> dict:
        ann = results["ann_info"]
        if self.with_bbox:
            results["gt_bboxes"] = ann["bboxes"].copy()
            results["gt_bboxes_ignore"] = ann.get(
                "bboxes_ignore", np.zeros((0, 4), np.float32)).copy()
            # extend, not replace: LoadProposals may already have
            # registered "proposals" (reference appends per-loader too)
            results["bbox_fields"] = (
                [k for k in results.get("bbox_fields", [])
                 if k not in ("gt_bboxes", "gt_bboxes_ignore")]
                + ["gt_bboxes", "gt_bboxes_ignore"])
            # fork extras for the point pipeline
            if "true_bboxes" in ann:
                results["gt_true_bboxes"] = ann["true_bboxes"].copy()
                results["bbox_fields"].append("gt_true_bboxes")
            if "anns_id" in ann:
                results["gt_anns_id"] = ann["anns_id"].copy()
        if self.with_label:
            results["gt_labels"] = ann["labels"].copy()
        if self.with_mask and "masks" in ann:
            h, w = results["img"].shape[:2]
            results["gt_masks"] = self._rasterize(ann["masks"], h, w)
            results["mask_fields"] = ["gt_masks"]
        return results


@PIPELINES.register_module()
class LoadProposals:
    """Precomputed-proposal loader (reference pipelines/loading.py:403):
    strips scores to (n, 4), truncates to num_max_proposals, and registers
    `proposals` as a bbox field so Resize/Flip map them with the image."""

    def __init__(self, num_max_proposals: Optional[int] = None):
        self.num_max_proposals = num_max_proposals

    def __call__(self, results: dict) -> dict:
        proposals = np.asarray(results["proposals"], np.float32)
        if proposals.ndim != 2 or proposals.shape[-1] not in (4, 5):
            raise AssertionError(
                "proposals should have shapes (n, 4) or (n, 5), "
                f"but found {proposals.shape}")
        proposals = proposals[:, :4]
        if self.num_max_proposals is not None:
            proposals = proposals[:self.num_max_proposals]
        if len(proposals) == 0:
            proposals = np.zeros((0, 4), np.float32)
        results["proposals"] = proposals
        results.setdefault("bbox_fields", []).append("proposals")
        return results


def _imrescale_size(old_size: Tuple[int, int], scale, keep_ratio=True):
    """mmcv rescale_size parity: scale is (max_long, max_short) or float."""
    w, h = old_size
    if isinstance(scale, (float, int)) and not isinstance(scale, bool):
        scale_factor = float(scale)
    else:
        max_long_edge = max(scale)
        max_short_edge = min(scale)
        scale_factor = min(max_long_edge / max(h, w),
                           max_short_edge / min(h, w))
    new_w = int(w * scale_factor + 0.5)
    new_h = int(h * scale_factor + 0.5)
    return new_w, new_h


@PIPELINES.register_module()
class Resize:
    """mmdet Resize with the fork's scale_factor mode.

    Modes:
    - img_scale=(w, h) [+keep_ratio]: standard mmdet resize.
    - img_scale=None, ratio_range or scale_factor list: multiply native
      resolution (fork transforms.py:74,99-103; scale_factor=[1.0] keeps
      native resolution — the TinyPerson recipe).
    """

    def __init__(self, img_scale=None, multiscale_mode: str = "range",
                 ratio_range=None, keep_ratio: bool = True,
                 scale_factor=None, override: bool = False,
                 bbox_clip_border: bool = True):
        self.img_scale = img_scale
        self.multiscale_mode = multiscale_mode
        self.ratio_range = ratio_range
        self.keep_ratio = keep_ratio
        self.scale_factor = scale_factor
        self.bbox_clip_border = bbox_clip_border

    def _pick_scale(self, results) -> None:
        rng: np.random.RandomState = results.get(
            "_rng", np.random.RandomState())
        if self.scale_factor is not None:
            sf = self.scale_factor
            f = sf[rng.randint(len(sf))] if isinstance(sf, (list, tuple)) else sf
            results["scale"] = None
            results["_resize_ratio"] = float(f)
        elif self.ratio_range is not None:
            lo, hi = self.ratio_range
            results["scale"] = None
            results["_resize_ratio"] = float(rng.uniform(lo, hi))
        elif isinstance(self.img_scale, list):
            idx = rng.randint(len(self.img_scale))
            results["scale"] = tuple(self.img_scale[idx])
        else:
            results["scale"] = tuple(self.img_scale) if self.img_scale else None

    def __call__(self, results: dict) -> dict:
        if "scale" not in results and "_resize_ratio" not in results:
            self._pick_scale(results)
        img = results["img"]
        h, w = img.shape[:2]
        if results.get("scale") is not None:
            if self.keep_ratio:
                new_w, new_h = _imrescale_size((w, h), results["scale"])
            else:
                new_w, new_h = results["scale"]
        else:
            ratio = results.get("_resize_ratio", 1.0)
            new_w, new_h = int(w * ratio + 0.5), int(h * ratio + 0.5)

        if (new_w, new_h) != (w, h):
            pil = Image.fromarray(img.astype(np.uint8)) if img.dtype != np.uint8 \
                else Image.fromarray(img)
            img = np.asarray(pil.resize((new_w, new_h), Image.BILINEAR),
                             dtype=np.float32)
        else:
            img = img.astype(np.float32)
        w_scale = new_w / w
        h_scale = new_h / h
        results["img"] = img
        results["img_shape"] = img.shape
        results["pad_shape"] = img.shape
        results["scale_factor"] = np.asarray(
            [w_scale, h_scale, w_scale, h_scale], np.float32)
        results["keep_ratio"] = self.keep_ratio

        for key in results.get("bbox_fields", []):
            bboxes = results[key] * results["scale_factor"]
            if self.bbox_clip_border:
                bboxes[:, 0::2] = np.clip(bboxes[:, 0::2], 0, new_w)
                bboxes[:, 1::2] = np.clip(bboxes[:, 1::2], 0, new_h)
            results[key] = bboxes
        for key in results.get("mask_fields", []):
            m = results[key]
            if m.shape[1:] != (new_h, new_w) and len(m):
                out = np.zeros((len(m), new_h, new_w), m.dtype)
                for i in range(len(m)):
                    out[i] = np.asarray(Image.fromarray(m[i] * 255).resize(
                        (new_w, new_h), Image.NEAREST)) // 255
                results[key] = out
        return results


@PIPELINES.register_module()
class RandomFlip:
    def __init__(self, flip_ratio: Optional[float] = None,
                 direction: str = "horizontal"):
        self.flip_ratio = flip_ratio
        self.direction = direction

    def __call__(self, results: dict) -> dict:
        rng: np.random.RandomState = results.get(
            "_rng", np.random.RandomState())
        if "flip" not in results:
            flip = (self.flip_ratio is not None
                    and rng.rand() < self.flip_ratio)
            results["flip"] = flip
            results["flip_direction"] = self.direction
        if results["flip"]:
            img = results["img"]
            h, w = img.shape[:2]
            if results["flip_direction"] == "horizontal":
                results["img"] = img[:, ::-1].copy()
                for key in results.get("bbox_fields", []):
                    b = results[key].copy()
                    b[:, 0] = w - results[key][:, 2]
                    b[:, 2] = w - results[key][:, 0]
                    results[key] = b
                for key in results.get("mask_fields", []):
                    results[key] = results[key][:, :, ::-1].copy()
            else:
                results["img"] = img[::-1].copy()
                for key in results.get("bbox_fields", []):
                    b = results[key].copy()
                    b[:, 1] = h - results[key][:, 3]
                    b[:, 3] = h - results[key][:, 1]
                    results[key] = b
                for key in results.get("mask_fields", []):
                    results[key] = results[key][:, ::-1, :].copy()
        return results


@PIPELINES.register_module()
class Normalize:
    def __init__(self, mean, std, to_rgb: bool = True):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self._inv_std = (1.0 / self.std).astype(np.float32)
        # images are loaded RGB already; to_rgb kept for config parity

    def __call__(self, results: dict) -> dict:
        # in-place: one alloc (astype) + two fused passes instead of three
        # allocating passes — normalize was 40% of host pipeline time at
        # 512x640 (PARITY round-2 input-pipeline profile)
        img = results["img"]
        if (img.dtype != np.float32 or img.base is not None
                or not img.flags.writeable):
            # copy when not an owned writable f32 buffer (tile crops are
            # views into the parent image — in-place would corrupt overlaps)
            img = img.astype(np.float32)
        np.subtract(img, self.mean, out=img)
        np.multiply(img, self._inv_std, out=img)
        results["img"] = img
        results["img_norm_cfg"] = dict(mean=self.mean, std=self.std)
        return results


@PIPELINES.register_module()
class Pad:
    def __init__(self, size: Optional[Tuple[int, int]] = None,
                 size_divisor: Optional[int] = None, pad_val: float = 0.0):
        self.size = size            # (h, w)
        self.size_divisor = size_divisor
        self.pad_val = pad_val
        assert size is not None or size_divisor is not None

    def __call__(self, results: dict) -> dict:
        img = results["img"]
        h, w = img.shape[:2]
        if self.size is not None:
            th, tw = self.size
        else:
            d = self.size_divisor
            th = int(np.ceil(h / d)) * d
            tw = int(np.ceil(w / d)) * d
        pad_h, pad_w = th - h, tw - w
        assert pad_h >= 0 and pad_w >= 0, \
            f"image ({h},{w}) larger than pad size ({th},{tw})"
        if pad_h or pad_w:
            img = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)),
                         constant_values=self.pad_val)
            for key in results.get("mask_fields", []):
                results[key] = np.pad(
                    results[key], ((0, 0), (0, pad_h), (0, pad_w)))
        results["img"] = img
        results["pad_shape"] = img.shape
        results["pad_fixed_size"] = self.size
        results["pad_size_divisor"] = self.size_divisor
        return results


@PIPELINES.register_module()
class RandomCrop:
    def __init__(self, crop_size: Tuple[int, int],
                 allow_negative_crop: bool = False):
        self.crop_size = crop_size  # (h, w)
        self.allow_negative_crop = allow_negative_crop

    def __call__(self, results: dict) -> Optional[dict]:
        rng: np.random.RandomState = results.get(
            "_rng", np.random.RandomState())
        img = results["img"]
        h, w = img.shape[:2]
        ch = min(self.crop_size[0], h)
        cw = min(self.crop_size[1], w)
        y0 = rng.randint(0, h - ch + 1)
        x0 = rng.randint(0, w - cw + 1)
        results["img"] = img[y0:y0 + ch, x0:x0 + cw]
        results["img_shape"] = results["img"].shape
        off = np.asarray([x0, y0, x0, y0], np.float32)
        keep_main = None
        for key in results.get("bbox_fields", []):
            b = results[key] - off
            b[:, 0::2] = np.clip(b[:, 0::2], 0, cw)
            b[:, 1::2] = np.clip(b[:, 1::2], 0, ch)
            keep = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])
            results[key] = b[keep]
            if key == "gt_bboxes":
                keep_main = keep
                if "gt_labels" in results:
                    results["gt_labels"] = results["gt_labels"][keep]
                if "gt_anns_id" in results:
                    results["gt_anns_id"] = results["gt_anns_id"][keep]
        for key in results.get("mask_fields", []):
            m = results[key][:, y0:y0 + ch, x0:x0 + cw]
            results[key] = m[keep_main] if keep_main is not None else m
        if (keep_main is not None and not keep_main.any()
                and not self.allow_negative_crop):
            return None
        return results


def rgb_to_hsv_cv(img: np.ndarray) -> np.ndarray:
    """Float HSV with cv2 conventions: H degrees [0, 360), S in [0, 1],
    V = channel max (input scale preserved). Matches mmcv.bgr2hsv's math on
    the corresponding channel order."""
    img = img.astype(np.float32)
    v = img.max(axis=-1)
    mn = img.min(axis=-1)
    diff = v - mn
    s = np.where(v != 0, diff / np.where(v != 0, v, 1.0), 0.0)
    safe = np.where(diff != 0, diff, 1.0)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    h = np.where(v == r, 60.0 * (g - b) / safe,
                 np.where(v == g, 120.0 + 60.0 * (b - r) / safe,
                          240.0 + 60.0 * (r - g) / safe))
    h = np.where(diff == 0, 0.0, h)
    h = np.where(h < 0, h + 360.0, h)
    return np.stack([h, s, v], axis=-1)


def hsv_to_rgb_cv(img: np.ndarray) -> np.ndarray:
    """Inverse of rgb_to_hsv_cv (cv2 float HSV2BGR math)."""
    h, s, v = img[..., 0], img[..., 1], img[..., 2]
    h60 = (h / 60.0) % 6.0
    i = np.floor(h60)
    f = h60 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(np.int32)
    r = np.choose(i % 6, [v, q, p, p, t, v])
    g = np.choose(i % 6, [t, v, v, q, p, p])
    b = np.choose(i % 6, [p, p, t, v, v, q])
    return np.stack([r, g, b], axis=-1).astype(np.float32)


@PIPELINES.register_module()
class PhotoMetricDistortion:
    """Photometric jitter, full parity with the reference sequence
    (mmdet datasets/pipelines/transforms.py:914-1005): random brightness ->
    random contrast (mode 1) -> HSV -> random saturation (S *= u) -> random
    hue (H += u, wrap at 360, :986-990) -> back to color -> random contrast
    (mode 0) -> random channel swap. RNG draw order matches the reference
    exactly; images stay unclipped floats (Normalize follows in the
    pipeline, as in mmdet)."""

    def __init__(self, brightness_delta: int = 32,
                 contrast_range=(0.5, 1.5), saturation_range=(0.5, 1.5),
                 hue_delta: int = 18):
        self.brightness_delta = brightness_delta
        self.contrast_lower, self.contrast_upper = contrast_range
        self.saturation_lower, self.saturation_upper = saturation_range
        self.hue_delta = hue_delta

    def __call__(self, results: dict) -> dict:
        rng: np.random.RandomState = results.get(
            "_rng", np.random.RandomState())
        img = results["img"].astype(np.float32)
        if rng.randint(2):
            img = img + rng.uniform(-self.brightness_delta,
                                    self.brightness_delta)
        mode = rng.randint(2)
        if mode == 1 and rng.randint(2):
            img = img * rng.uniform(self.contrast_lower, self.contrast_upper)

        img = rgb_to_hsv_cv(img)
        if rng.randint(2):
            img[..., 1] *= rng.uniform(self.saturation_lower,
                                       self.saturation_upper)
        if rng.randint(2):
            img[..., 0] += rng.uniform(-self.hue_delta, self.hue_delta)
            img[..., 0][img[..., 0] > 360] -= 360
            img[..., 0][img[..., 0] < 0] += 360
        img = hsv_to_rgb_cv(img)

        if mode == 0 and rng.randint(2):
            img = img * rng.uniform(self.contrast_lower, self.contrast_upper)
        if rng.randint(2):
            img = img[..., rng.permutation(3)]
        results["img"] = img
        return results


@PIPELINES.register_module()
class Expand:
    """Random canvas expansion (mmdet transforms Expand — SSD recipe):
    paste the image at a random position on a mean-filled canvas up to
    `ratio_range` times larger; boxes shift by the paste offset."""

    def __init__(self, mean=(0, 0, 0), to_rgb: bool = True,
                 ratio_range=(1, 4), prob: float = 0.5):
        self.mean = mean
        self.ratio_range = ratio_range
        self.prob = prob

    def __call__(self, results: dict) -> dict:
        rng: np.random.RandomState = results.get(
            "_rng", np.random.RandomState())
        if rng.uniform() > self.prob:
            return results
        img = results["img"]
        h, w, c = img.shape
        ratio = rng.uniform(*self.ratio_range)
        eh, ew = int(h * ratio), int(w * ratio)
        y0 = rng.randint(0, eh - h + 1)
        x0 = rng.randint(0, ew - w + 1)
        canvas = np.empty((eh, ew, c), img.dtype)
        canvas[...] = np.asarray(self.mean, img.dtype)
        canvas[y0:y0 + h, x0:x0 + w] = img
        results["img"] = canvas
        results["img_shape"] = canvas.shape
        off = np.asarray([x0, y0, x0, y0], np.float32)
        for key in results.get("bbox_fields", []):
            results[key] = results[key] + off
        return results


@PIPELINES.register_module()
class MinIoURandomCrop:
    """mmdet transforms MinIoURandomCrop (SSD recipe): sample a crop whose
    IoU with every kept gt exceeds a randomly-chosen threshold; keep only
    gts whose centers fall inside the crop."""

    def __init__(self, min_ious=(0.1, 0.3, 0.5, 0.7, 0.9),
                 min_crop_size: float = 0.3, max_tries: int = 50):
        self.sample_mode = (1, *min_ious, 0)
        self.min_crop_size = min_crop_size
        self.max_tries = max_tries

    def __call__(self, results: dict) -> Optional[dict]:
        rng: np.random.RandomState = results.get(
            "_rng", np.random.RandomState())
        img = results["img"]
        h, w = img.shape[:2]
        boxes = results.get("gt_bboxes", np.zeros((0, 4), np.float32))
        while True:
            mode = self.sample_mode[rng.randint(len(self.sample_mode))]
            if mode == 1:
                return results
            for _ in range(self.max_tries):
                cw = rng.uniform(self.min_crop_size * w, w)
                ch = rng.uniform(self.min_crop_size * h, h)
                if ch / cw < 0.5 or ch / cw > 2:
                    continue
                x0 = rng.uniform(0, w - cw)
                y0 = rng.uniform(0, h - ch)
                patch = np.asarray([x0, y0, x0 + cw, y0 + ch])
                if len(boxes):
                    ix1 = np.maximum(boxes[:, 0], patch[0])
                    iy1 = np.maximum(boxes[:, 1], patch[1])
                    ix2 = np.minimum(boxes[:, 2], patch[2])
                    iy2 = np.minimum(boxes[:, 3], patch[3])
                    inter = (np.clip(ix2 - ix1, 0, None)
                             * np.clip(iy2 - iy1, 0, None))
                    ba = ((boxes[:, 2] - boxes[:, 0])
                          * (boxes[:, 3] - boxes[:, 1]))
                    pa = cw * ch
                    iou = inter / np.maximum(ba + pa - inter, 1e-12)
                    if iou.min() < mode:
                        continue
                    cx = (boxes[:, 0] + boxes[:, 2]) / 2
                    cy = (boxes[:, 1] + boxes[:, 3]) / 2
                    keep = ((cx > patch[0]) & (cx < patch[2])
                            & (cy > patch[1]) & (cy < patch[3]))
                    if not keep.any():
                        continue
                else:
                    keep = np.zeros((0,), bool)
                x0i, y0i = int(x0), int(y0)
                x1i, y1i = int(x0 + cw), int(y0 + ch)
                results["img"] = img[y0i:y1i, x0i:x1i]
                results["img_shape"] = results["img"].shape
                off = np.asarray([x0i, y0i, x0i, y0i], np.float32)
                for key in results.get("bbox_fields", []):
                    if key == "gt_bboxes" and len(boxes):
                        b = boxes[keep] - off
                    else:
                        b = results[key] - off
                    b[:, 0::2] = np.clip(b[:, 0::2], 0, x1i - x0i)
                    b[:, 1::2] = np.clip(b[:, 1::2], 0, y1i - y0i)
                    results[key] = b
                if "gt_labels" in results and len(boxes):
                    results["gt_labels"] = results["gt_labels"][keep]
                if "gt_anns_id" in results and len(boxes):
                    results["gt_anns_id"] = results["gt_anns_id"][keep]
                return results


@PIPELINES.register_module()
class CutOut:
    """mmdet transforms CutOut: zero (or fill) random rectangles."""

    def __init__(self, n_holes, cutout_shape=None, cutout_ratio=None,
                 fill_in=(0, 0, 0)):
        self.n_holes = n_holes if isinstance(n_holes, (tuple, list)) \
            else (n_holes, n_holes)
        self.cutout_shape = cutout_shape
        self.cutout_ratio = cutout_ratio
        self.fill_in = fill_in

    def __call__(self, results: dict) -> dict:
        rng: np.random.RandomState = results.get(
            "_rng", np.random.RandomState())
        img = results["img"]
        h, w = img.shape[:2]
        n = rng.randint(self.n_holes[0], self.n_holes[1] + 1)
        for _ in range(n):
            if self.cutout_shape is not None:
                shapes = self.cutout_shape if isinstance(
                    self.cutout_shape[0], (tuple, list)) \
                    else [self.cutout_shape]
                ch, cw = shapes[rng.randint(len(shapes))]
            else:
                ratios = self.cutout_ratio if isinstance(
                    self.cutout_ratio[0], (tuple, list)) \
                    else [self.cutout_ratio]
                rh, rw = ratios[rng.randint(len(ratios))]
                ch, cw = int(h * rh), int(w * rw)
            y0 = rng.randint(0, h)
            x0 = rng.randint(0, w)
            img[y0:y0 + int(ch), x0:x0 + int(cw)] = \
                np.asarray(self.fill_in, img.dtype)
        results["img"] = img
        return results


@PIPELINES.register_module()
class Translate:
    """Translate image + boxes (mmdet auto_augment.py Translate):
    offset = level/10 * max_translate_offset px along `direction`,
    applied with probability `prob`; boxes clipped, empty boxes kept
    (filtered downstream)."""

    def __init__(self, level: float = 5, prob: float = 0.5,
                 direction: str = "horizontal",
                 max_translate_offset: float = 250.0,
                 img_fill_val: float = 128.0):
        self.offset = int(level / 10 * max_translate_offset)
        self.prob = prob
        self.direction = direction
        self.img_fill_val = img_fill_val

    def __call__(self, results: dict) -> dict:
        rng: np.random.RandomState = results.get(
            "_rng", np.random.RandomState())
        if rng.uniform() > self.prob:
            return results
        off = self.offset * (1 if rng.randint(2) else -1)
        img = results["img"]
        h, w = img.shape[:2]
        lim = (w if self.direction == "horizontal" else h) - 1
        off = int(np.clip(off, -lim, lim))
        out = np.full_like(img, self.img_fill_val)
        if self.direction == "horizontal":
            if off >= 0:
                out[:, off:] = img[:, :w - off]
            else:
                out[:, :w + off] = img[:, -off:]
            delta = np.asarray([off, 0, off, 0], np.float32)
        else:
            if off >= 0:
                out[off:] = img[:h - off]
            else:
                out[:h + off] = img[-off:]
            delta = np.asarray([0, off, 0, off], np.float32)
        results["img"] = out
        for key in results.get("bbox_fields", []):
            b = results[key] + delta
            b[:, 0::2] = np.clip(b[:, 0::2], 0, w)
            b[:, 1::2] = np.clip(b[:, 1::2], 0, h)
            results[key] = b
        return results


def _warp_boxes(boxes: np.ndarray, mat: np.ndarray, w: int, h: int):
    """Affine-warp boxes by 2x3 matrix; output = axis-aligned hull."""
    if len(boxes) == 0:
        return boxes
    corners = np.stack([
        boxes[:, [0, 1]], boxes[:, [2, 1]],
        boxes[:, [0, 3]], boxes[:, [2, 3]]], 1)          # (N, 4, 2)
    ones = np.ones((*corners.shape[:2], 1), np.float32)
    pts = np.concatenate([corners, ones], -1) @ mat.T    # (N, 4, 2)
    out = np.concatenate([pts.min(1), pts.max(1)], -1)
    out[:, 0::2] = np.clip(out[:, 0::2], 0, w)
    out[:, 1::2] = np.clip(out[:, 1::2], 0, h)
    return out.astype(np.float32)


@PIPELINES.register_module()
class Rotate:
    """Rotate image + boxes about the center (mmdet auto_augment.py Rotate);
    boxes become the axis-aligned hull of their rotated corners."""

    def __init__(self, level: float = 5, prob: float = 0.5,
                 max_rotate_angle: float = 30.0,
                 img_fill_val: float = 128.0):
        self.angle = level / 10 * max_rotate_angle
        self.prob = prob
        self.img_fill_val = img_fill_val

    def __call__(self, results: dict) -> dict:
        from PIL import Image
        rng: np.random.RandomState = results.get(
            "_rng", np.random.RandomState())
        if rng.uniform() > self.prob:
            return results
        ang = self.angle * (1 if rng.randint(2) else -1)
        img = results["img"]
        h, w = img.shape[:2]
        pil = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
        pil = pil.rotate(ang, resample=Image.BILINEAR,
                         fillcolor=tuple([int(self.img_fill_val)] * 3))
        results["img"] = np.asarray(pil).astype(img.dtype)
        # PIL rotates CCW about the center; box matrix rotates the same way
        t = np.deg2rad(ang)
        cx, cy = w / 2, h / 2
        c_, s_ = np.cos(t), np.sin(t)
        # image coords: y down, so CCW visual = this matrix
        mat = np.asarray([[c_, s_, cx - c_ * cx - s_ * cy],
                          [-s_, c_, cy + s_ * cx - c_ * cy]], np.float32)
        for key in results.get("bbox_fields", []):
            results[key] = _warp_boxes(results[key], mat, w, h)
        return results


@PIPELINES.register_module()
class Shear:
    """Shear image + boxes (mmdet auto_augment.py Shear)."""

    def __init__(self, level: float = 5, prob: float = 0.5,
                 direction: str = "horizontal",
                 max_shear_magnitude: float = 0.3,
                 img_fill_val: float = 128.0):
        self.mag = level / 10 * max_shear_magnitude
        self.prob = prob
        self.direction = direction
        self.img_fill_val = img_fill_val

    def __call__(self, results: dict) -> dict:
        from PIL import Image
        rng: np.random.RandomState = results.get(
            "_rng", np.random.RandomState())
        if rng.uniform() > self.prob:
            return results
        m = self.mag * (1 if rng.randint(2) else -1)
        img = results["img"]
        h, w = img.shape[:2]
        pil = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
        if self.direction == "horizontal":
            coeffs = (1, m, 0, 0, 1, 0)   # inverse map x' = x + m*y
            mat = np.asarray([[1, -m, 0], [0, 1, 0]], np.float32)
        else:
            coeffs = (1, 0, 0, m, 1, 0)
            mat = np.asarray([[1, 0, 0], [-m, 1, 0]], np.float32)
        pil = pil.transform((w, h), Image.AFFINE, coeffs,
                            resample=Image.BILINEAR,
                            fillcolor=tuple([int(self.img_fill_val)] * 3))
        results["img"] = np.asarray(pil).astype(img.dtype)
        for key in results.get("bbox_fields", []):
            results[key] = _warp_boxes(results[key], mat, w, h)
        return results


@PIPELINES.register_module()
class AutoAugment:
    """mmdet datasets/pipelines/auto_augment.py: pick one policy
    (sub-pipeline) uniformly at random per sample and apply it."""

    def __init__(self, policies):
        assert policies and all(isinstance(p, (list, tuple))
                                for p in policies)
        self.policies = [Compose(list(p)) for p in policies]

    def __call__(self, results: dict):
        rng: np.random.RandomState = results.get(
            "_rng", np.random.RandomState())
        policy = self.policies[rng.randint(len(self.policies))]
        return policy(results)


@PIPELINES.register_module()
class DefaultFormatBundle:
    """No-op marker kept for config parity (tensors are built by the
    collator)."""

    def __call__(self, results: dict) -> dict:
        return results


@PIPELINES.register_module()
class ImageToTensor:
    def __init__(self, keys: Sequence[str] = ("img",)):
        self.keys = keys

    def __call__(self, results: dict) -> dict:
        return results


@PIPELINES.register_module()
class Collect:
    DEFAULT_META = ("filename", "ori_filename", "ori_shape", "img_shape",
                    "pad_shape", "scale_factor", "flip", "flip_direction",
                    "img_norm_cfg", "tile_offset")

    def __init__(self, keys: Sequence[str],
                 meta_keys: Sequence[str] = DEFAULT_META):
        self.keys = keys
        self.meta_keys = meta_keys

    def __call__(self, results: dict) -> dict:
        data = {}
        img_meta = {k: results[k] for k in self.meta_keys if k in results}
        data["img_metas"] = img_meta
        for k in self.keys:
            if k in results:
                data[k] = results[k]
        return data


@PIPELINES.register_module()
class Albu:
    """Albumentations bridge (mmdet pipelines/transforms.py:1297) backed by
    NATIVE reimplementations of the transforms the reference configs use
    (data/albu_native.py) — the external `albumentations` package is not
    needed. Supports the reference albu_example set (ShiftScaleRotate with
    exact box/mask warping, RandomBrightnessContrast, RGBShift,
    HueSaturationValue, JpegCompression, ChannelShuffle, Blur, MedianBlur,
    OneOf, flips); any other transform type raises an actionable error at
    build time. `bbox_params.filter_lost_elements` + `min_visibility` drop
    boxes that the geometry pushed (mostly) out of the image, matching the
    bridge's post-filter."""

    def __init__(self, transforms, bbox_params=None, keymap=None,
                 update_pad_shape=False, skip_img_without_anno=False):
        from .albu_native import NATIVE_ALBU_OPS

        self.transforms = [dict(t) for t in transforms]
        for t in self.transforms:  # validate at build time
            types = [t["type"]] if t["type"] != "OneOf" else \
                [c["type"] for c in t["transforms"]]
            for tt in types:
                if tt not in NATIVE_ALBU_OPS and tt not in (
                        "HorizontalFlip", "VerticalFlip", "OneOf"):
                    raise ValueError(
                        f"Albu transform {tt!r} has no native "
                        f"implementation (supported: "
                        f"{sorted(NATIVE_ALBU_OPS)})")
        bp = dict(bbox_params or {})
        self.min_visibility = float(bp.get("min_visibility", 0.0))
        self.filter_lost = bool(bp.get("filter_lost_elements", False))
        self.update_pad_shape = update_pad_shape
        self.skip_img_without_anno = skip_img_without_anno

    def __call__(self, results: dict):
        from .albu_native import apply_albu_transform

        rng = results.get("_rng") or np.random
        img = results["img"]
        float_input = np.issubdtype(np.asarray(img).dtype, np.floating)
        img = np.clip(np.asarray(img), 0, 255).astype(np.uint8)
        boxes = results.get("gt_bboxes")
        masks = results.get("gt_masks")
        orig_areas = None
        if boxes is not None and len(boxes):
            orig_areas = ((boxes[:, 2] - boxes[:, 0])
                          * (boxes[:, 3] - boxes[:, 1]))
        for t in self.transforms:
            img, boxes, masks = apply_albu_transform(t, img, boxes, masks,
                                                     rng)
        h, w = img.shape[:2]
        results["img"] = img.astype(np.float32) if float_input else img
        if boxes is not None and len(boxes):
            clipped = boxes.copy()
            clipped[:, 0::2] = np.clip(clipped[:, 0::2], 0, w)
            clipped[:, 1::2] = np.clip(clipped[:, 1::2], 0, h)
            if self.filter_lost:
                area = ((clipped[:, 2] - clipped[:, 0])
                        * (clipped[:, 3] - clipped[:, 1]))
                vis = area / np.maximum(orig_areas, 1e-6)
                keep = vis > self.min_visibility
                clipped = clipped[keep]
                if "gt_labels" in results:
                    results["gt_labels"] = results["gt_labels"][keep]
                if masks is not None and len(masks):
                    masks = masks[keep]
            results["gt_bboxes"] = clipped
        if masks is not None:
            results["gt_masks"] = masks
        if self.update_pad_shape:
            results["pad_shape"] = img.shape
        return results


@PIPELINES.register_module()
class InstaBoost:
    """InstaBoost instance crop-jitter-paste augmentation (mmdet
    datasets/pipelines/instaboost.py config surface), backed by the NATIVE
    reimplementation in data/instaboost_native.py instead of the external
    `instaboostfast` package. Requires masks (use LoadAnnotations
    with_mask=True before it, matching the reference's restriction to
    instance-segmentation datasets)."""

    def __init__(self, action_candidate=("normal", "horizontal", "skip"),
                 action_prob=(1, 0, 0), scale=(0.8, 1.2), dx=15, dy=15,
                 theta=(-1, 1), color_prob=0.5, hflag=False,
                 aug_ratio=0.5):
        self.action_candidate = tuple(action_candidate)
        self.action_prob = tuple(action_prob)
        self.scale = tuple(scale)
        self.dx = float(dx)
        self.dy = float(dy)
        self.theta = tuple(theta)
        self.color_prob = float(color_prob)
        self.aug_ratio = float(aug_ratio)

    def __call__(self, results: dict) -> dict:
        from .instaboost_native import instaboost_sample

        masks = results.get("gt_masks")
        boxes = results.get("gt_bboxes")
        if masks is None or boxes is None or len(boxes) == 0:
            return results
        rng: np.random.RandomState = results.get(
            "_rng", np.random.RandomState())
        if rng.rand() > self.aug_ratio:
            return results
        labels = results.get("gt_labels",
                             np.zeros(len(boxes), np.int64))
        img, boxes, masks, labels = instaboost_sample(
            results["img"], boxes, masks, labels, rng,
            self.action_candidate, self.action_prob, self.scale,
            self.dx, self.dy, self.theta, self.color_prob)
        results["img"] = img
        results["gt_bboxes"] = boxes
        results["gt_masks"] = masks
        results["gt_labels"] = labels
        return results


@PIPELINES.register_module()
class Corrupt:
    """Image-corruption transform for the robustness benchmark (reference
    datasets/pipelines/transforms.py Corrupt + the `imagecorruptions`
    package). The external package is absent; the benchmark's noise /
    blur / digital families are re-implemented in numpy+PIL with the same
    5-severity parameterization. Weather corruptions (snow/frost/fog) need
    texture assets and are not included (documented deviation).
    """

    SUPPORTED = ("gaussian_noise", "shot_noise", "impulse_noise",
                 "defocus_blur", "motion_blur", "brightness", "contrast",
                 "pixelate", "jpeg_compression")

    def __init__(self, corruption: str, severity: int = 1):
        assert corruption in self.SUPPORTED, (
            f"{corruption} not in {self.SUPPORTED}")
        assert 1 <= severity <= 5
        self.corruption = corruption
        self.severity = severity

    def _apply(self, img: np.ndarray, rng: np.random.RandomState
               ) -> np.ndarray:
        s = self.severity - 1
        x = img.astype(np.float32) / 255.0
        c = self.corruption
        if c == "gaussian_noise":
            sigma = [0.08, 0.12, 0.18, 0.26, 0.38][s]
            x = x + rng.normal(size=x.shape) * sigma
        elif c == "shot_noise":
            lam = [60, 25, 12, 5, 3][s]
            x = rng.poisson(np.clip(x, 0, 1) * lam) / float(lam)
        elif c == "impulse_noise":
            amount = [0.03, 0.06, 0.09, 0.17, 0.27][s]
            m = rng.rand(*x.shape[:2])
            x[m < amount / 2] = 0.0
            x[m > 1 - amount / 2] = 1.0
        elif c in ("defocus_blur", "motion_blur"):
            from PIL import ImageFilter
            radius = [1, 2, 3, 4, 6][s]
            im = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
            if c == "defocus_blur":
                im = im.filter(ImageFilter.GaussianBlur(radius))
                return np.asarray(im, np.float32)
            # motion blur: horizontal box streak via padded cumsum
            k = 2 * radius + 1
            arr = np.asarray(im, np.float32)
            pad = np.pad(arr, ((0, 0), (radius, radius), (0, 0)),
                         mode="edge")
            csum = np.cumsum(pad, axis=1)
            out = (csum[:, k - 1:, :] - np.concatenate(
                [np.zeros_like(csum[:, :1, :]), csum[:, :-k, :]],
                axis=1)) / k
            return out.astype(np.float32)
        elif c == "brightness":
            x = x + [0.1, 0.2, 0.3, 0.4, 0.5][s]
        elif c == "contrast":
            f = [0.4, 0.3, 0.2, 0.1, 0.05][s]
            x = (x - x.mean((0, 1), keepdims=True)) * f \
                + x.mean((0, 1), keepdims=True)
        elif c == "pixelate":
            f = [0.6, 0.5, 0.4, 0.3, 0.25][s]
            h, w = img.shape[:2]
            im = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
            im = im.resize((max(int(w * f), 1), max(int(h * f), 1)),
                           Image.BOX).resize((w, h), Image.NEAREST)
            return np.asarray(im, np.float32)
        elif c == "jpeg_compression":
            import io
            q = [25, 18, 15, 10, 7][s]
            im = Image.fromarray(np.clip(img, 0, 255).astype(np.uint8))
            buf = io.BytesIO()
            im.save(buf, format="JPEG", quality=q)
            buf.seek(0)
            return np.asarray(Image.open(buf), np.float32)
        return np.clip(x, 0, 1) * 255.0

    def __call__(self, results: dict) -> dict:
        rng = results.get("_rng") or np.random.RandomState(0)
        results["img"] = self._apply(
            np.asarray(results["img"], np.float32), rng).astype(np.float32)
        return results
