"""Test-only loader for pure-torch reference files (VERDICT r1 item 3).

Execs individual files from /root/reference/TOV_mmdetection/mmdet with the
unresolvable imports (mmcv, mmdet package-relative) stripped and replaced by
tiny stubs, so their NUMERICS can be used as golden oracles against our JAX
implementations. Nothing loaded here ships in the package — tests only.
"""
from __future__ import annotations

import os
import types
from functools import lru_cache

REF_ROOT = "/root/reference/TOV_mmdetection/mmdet"

_STRIP_PREFIXES = ("from .", "from ..", "from mmdet", "import mmcv",
                   "from mmcv", "from torchvision",
                   "from terminaltables", "from multiprocessing",
                   "from six")


class _Registry:
    """No-op stand-in for mmcv Registry: @REG.register_module() passthrough."""

    def register_module(self, *args, **kwargs):
        if args and isinstance(args[0], type):
            return args[0]

        def deco(cls):
            return cls
        return deco


def _mmcv_stub() -> types.ModuleType:
    m = types.ModuleType("mmcv")

    def jit(*args, **kwargs):
        if args and callable(args[0]):
            return args[0]

        def deco(f):
            return f
        return deco

    m.jit = jit
    m.is_tuple_of = lambda seq, typ: (isinstance(seq, tuple)
                                      and all(isinstance(x, typ)
                                              for x in seq))
    m.is_str = lambda x: isinstance(x, str)
    return m


def load_ref(relpath: str, extra: dict | None = None,
             replace: tuple = ()) -> types.SimpleNamespace:
    """Exec a reference source file with stripped imports + injected stubs.

    `replace`: ((old, new), ...) source substitutions for constructs that
    modern numpy/python reject (e.g. ragged np.array) — behavior-neutral.
    Returns a namespace holding every top-level name the file defined.
    """
    path = os.path.join(REF_ROOT, relpath)
    with open(path) as f:
        src = f.read()
    for old, new in replace:
        src = src.replace(old, new)
    lines = []
    open_parens = 0   # >0 while inside a stripped multi-line import ( ... )
    for line in src.splitlines():
        if open_parens > 0:
            open_parens += line.count("(") - line.count(")")
            lines.append("# [stripped] " + line)
        elif line.lstrip().startswith(_STRIP_PREFIXES):
            open_parens = line.count("(") - line.count(")")
            lines.append("# [stripped] " + line)
        else:
            lines.append(line)
    g: dict = {"__name__": "ref_" + relpath.replace("/", "_").rstrip(".py"),
               "__file__": path}
    g["mmcv"] = _mmcv_stub()
    # common registry names any file might reference after stripping
    for name in ("BBOX_CODERS", "IOU_CALCULATORS", "MATCH_COST", "LOSSES",
                 "PIPELINES", "BBOX_ASSIGNERS", "ANCHOR_GENERATORS",
                 "HEADS", "BBOX_SAMPLERS", "DETECTORS", "NECKS"):
        g[name] = _Registry()
    g["BaseBBoxCoder"] = object
    if extra:
        g.update(extra)
    exec(compile("\n".join(lines), path, "exec"), g)  # noqa: S102 test-only
    return types.SimpleNamespace(**{k: v for k, v in g.items()
                                    if not k.startswith("__")})


@lru_cache(maxsize=None)
def ref_transforms():
    return load_ref("core/bbox/transforms.py")


@lru_cache(maxsize=None)
def ref_iou():
    return load_ref("core/bbox/iou_calculators/iou2d_calculator.py")


@lru_cache(maxsize=None)
def ref_delta_coder():
    return load_ref("core/bbox/coder/delta_xywh_bbox_coder.py")


@lru_cache(maxsize=None)
def ref_legacy_delta_coder():
    return load_ref("core/bbox/coder/legacy_delta_xywh_bbox_coder.py")


@lru_cache(maxsize=None)
def ref_anchor_generator():
    return load_ref("core/anchor/anchor_generator.py")


@lru_cache(maxsize=None)
def ref_tblr_coder():
    return load_ref("core/bbox/coder/tblr_bbox_coder.py")


@lru_cache(maxsize=None)
def ref_bucketing_coder():
    t = ref_transforms()
    return load_ref("core/bbox/coder/bucketing_bbox_coder.py",
                    extra={"bbox_rescale": t.bbox_rescale})


@lru_cache(maxsize=None)
def ref_match_costs():
    t = ref_transforms()
    i = ref_iou()
    return load_ref("core/bbox/match_costs/match_cost.py",
                    extra={"bbox_overlaps": i.bbox_overlaps,
                           "bbox_cxcywh_to_xyxy": t.bbox_cxcywh_to_xyxy,
                           "bbox_xyxy_to_cxcywh": t.bbox_xyxy_to_cxcywh})


@lru_cache(maxsize=None)
def ref_loss_utils():
    return load_ref("models/losses/utils.py")


@lru_cache(maxsize=None)
def ref_cross_entropy():
    u = ref_loss_utils()
    return load_ref("models/losses/cross_entropy_loss.py",
                    extra={"weight_reduce_loss": u.weight_reduce_loss})


@lru_cache(maxsize=None)
def ref_accuracy():
    return load_ref("models/losses/accuracy.py")


@lru_cache(maxsize=None)
def ref_mil_loss():
    u = ref_loss_utils()
    ce = ref_cross_entropy()
    acc = ref_accuracy()
    return load_ref(
        "models/losses/multi_instance_learning_loss.py",
        extra={"weight_reduce_loss": u.weight_reduce_loss,
               "weighted_loss": u.weighted_loss,
               "accuracy": acc.accuracy,
               "_expand_onehot_labels": ce._expand_onehot_labels,
               "build_loss": lambda cfg: None,
               "FocalLoss": object})


@lru_cache(maxsize=None)
def ref_scale_match():
    return load_ref("datasets/pipelines/scale_match.py",
                    extra={"F": None, "BoxList": object, "Resize": object})


@lru_cache(maxsize=None)
def ref_losses():
    """models/losses/* golden namespace: focal/ghm/iou/varifocal/gfocal/
    balanced_l1, with utils.weight_reduce_loss/weighted_loss and
    core bbox_overlaps injected (their package-relative imports strip)."""
    utils = load_ref("models/losses/utils.py")
    iou2d = load_ref("core/bbox/iou_calculators/iou2d_calculator.py")
    extra = dict(weight_reduce_loss=utils.weight_reduce_loss,
                 weighted_loss=utils.weighted_loss,
                 bbox_overlaps=iou2d.bbox_overlaps)
    ns = {}
    for f in ("focal_loss", "ghm_loss", "iou_loss", "varifocal_loss",
              "gfocal_loss", "balanced_l1_loss"):
        mod = load_ref(f"models/losses/{f}.py", dict(extra))
        ns.update({k: v for k, v in vars(mod).items()
                   if not k.startswith("_") or k == "_sigmoid_focal_loss"})
    return types.SimpleNamespace(**ns)


@lru_cache(maxsize=None)
def ref_assigners():
    """MaxIoU/ATSS assigners with a real AssignResult and bbox_overlaps
    injected; BaseAssigner stubbed to object."""
    iou2d = load_ref("core/bbox/iou_calculators/iou2d_calculator.py")
    ar = load_ref("core/bbox/assigners/assign_result.py",
                  dict(util_mixins=types.SimpleNamespace(
                      NiceRepr=object)))
    extra = dict(
        build_iou_calculator=lambda cfg: iou2d.BboxOverlaps2D(),
        AssignResult=ar.AssignResult,
        BaseAssigner=object)
    mx = load_ref("core/bbox/assigners/max_iou_assigner.py", dict(extra))
    at = load_ref("core/bbox/assigners/atss_assigner.py", dict(extra))
    return types.SimpleNamespace(MaxIoUAssigner=mx.MaxIoUAssigner,
                                 ATSSAssigner=at.ATSSAssigner)


@lru_cache(maxsize=None)
def ref_point_assigner():
    iou2d = load_ref("core/bbox/iou_calculators/iou2d_calculator.py")
    ar = load_ref("core/bbox/assigners/assign_result.py",
                  dict(util_mixins=types.SimpleNamespace(NiceRepr=object)))
    return load_ref("core/bbox/assigners/point_assigner.py",
                    dict(AssignResult=ar.AssignResult, BaseAssigner=object,
                         build_iou_calculator=lambda c: iou2d.BboxOverlaps2D()))


@lru_cache(maxsize=None)
def ref_gaussian_target():
    return load_ref("models/utils/gaussian_target.py")


@lru_cache(maxsize=None)
def ref_mean_ap():
    """core/evaluation/mean_ap.py with Pool/terminaltables/print stubs —
    the multiprocessing Pool is replaced by an inline starmap."""
    class _FakePool:
        def __init__(self, *a):
            pass

        def starmap(self, fn, it):
            return [fn(*args) for args in it]

        def close(self):
            pass

    iou2d = load_ref("core/bbox/iou_calculators/iou2d_calculator.py")

    def np_overlaps(a, b, mode="iou"):
        import numpy as np
        import torch
        return iou2d.bbox_overlaps(torch.from_numpy(a[:, :4].copy()),
                                   torch.from_numpy(b.copy()),
                                   mode=mode).numpy()

    extra = dict(
        Pool=_FakePool,
        bbox_overlaps=np_overlaps,
        print_log=lambda *a, **k: None,
        AsciiTable=type("T", (), {"__init__": lambda self, *a: None,
                                  "table": ""}),
        get_classes=lambda d: None,
        print_map_summary=lambda *a, **k: None,
    )
    mod = load_ref("core/evaluation/mean_ap.py", extra)
    # the module defines its own print_map_summary (AsciiTable printing);
    # silence it through the live globals that eval_map closes over
    mod.eval_map.__globals__["print_map_summary"] = lambda *a, **k: None
    return mod


@lru_cache(maxsize=None)
def ref_recall():
    """core/evaluation/recall.py with numpy bbox_overlaps injected."""
    iou2d = load_ref("core/bbox/iou_calculators/iou2d_calculator.py")

    def np_overlaps(a, b):
        import numpy as np
        import torch
        if a.shape[0] == 0 or b.shape[0] == 0:
            return np.zeros((a.shape[0], b.shape[0]))
        return iou2d.bbox_overlaps(
            torch.from_numpy(np.ascontiguousarray(a[:, :4])),
            torch.from_numpy(np.ascontiguousarray(b[:, :4]))).numpy()

    return load_ref(
        "core/evaluation/recall.py",
        dict(bbox_overlaps=np_overlaps,
             print_log=lambda *a, **k: None,
             AsciiTable=type("T", (), {
                 "__init__": lambda self, *a, **k: None, "table": ""})),
        # modern numpy rejects ragged np.array(...) (legacy object array)
        replace=(("all_ious = np.array(all_ious)",
                  "all_ious = np.array(all_ious, dtype=object)"),))


# =====================================================================
# Round-3 additions: exec FULL reference dense heads / RoI bbox heads so
# detector-level forward (get_bboxes) and loss can be golden-compared on
# shared weights (VERDICT r2 "Next round" item 1). Everything below is
# torch-side test scaffolding; nothing ships in the package.
# =====================================================================

def _noop_decorator(*dargs, **dkwargs):
    """Stand-in for mmcv force_fp32/auto_fp16 decorator factories."""
    if dargs and callable(dargs[0]) and not dkwargs:
        return dargs[0]

    def deco(f):
        return f
    return deco


class _Cfg(dict):
    """mmcv.Config-lite: dict with attribute access (recursively wrapped)."""

    def __init__(self, d=None):
        super().__init__()
        for k, v in (d or {}).items():
            self[k] = _Cfg(v) if isinstance(v, dict) else v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __deepcopy__(self, memo):
        import copy
        return _Cfg({k: copy.deepcopy(v, memo) for k, v in self.items()})


def make_cfg(d):
    return _Cfg(d)


def _torch_greedy_nms(boxes, scores, iou_threshold):
    """Exact greedy NMS (mmcv `nms` semantics: score-desc order, suppress
    IoU > threshold). Returns (dets (k,5), keep idx int64)."""
    import torch
    order = torch.argsort(scores, descending=True)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    suppressed = torch.zeros(boxes.shape[0], dtype=torch.bool)
    keep = []
    for oi in order.tolist():
        if suppressed[oi]:
            continue
        keep.append(oi)
        xx1 = torch.maximum(x1[oi], x1)
        yy1 = torch.maximum(y1[oi], y1)
        xx2 = torch.minimum(x2[oi], x2)
        yy2 = torch.minimum(y2[oi], y2)
        inter = (xx2 - xx1).clamp(min=0) * (yy2 - yy1).clamp(min=0)
        iou = inter / (areas[oi] + areas - inter).clamp(min=1e-12)
        suppressed |= iou > iou_threshold
    keep = torch.as_tensor(keep, dtype=torch.long)
    dets = torch.cat([boxes[keep], scores[keep, None]], dim=1)
    return dets, keep


def ref_batched_nms(boxes, scores, idxs, nms_cfg, class_agnostic=False):
    """mmcv.ops.batched_nms semantics: offset boxes per class id, one NMS."""
    import torch
    nms_cfg_ = dict(nms_cfg)
    class_agnostic = nms_cfg_.pop("class_agnostic", class_agnostic)
    nms_cfg_.pop("type", None)
    if class_agnostic or boxes.numel() == 0:
        boxes_for_nms = boxes
    else:
        max_coordinate = boxes.max()
        offsets = idxs.to(boxes) * (max_coordinate + torch.tensor(1.).to(boxes))
        boxes_for_nms = boxes + offsets[:, None]
    iou_thr = nms_cfg_.pop("iou_threshold", nms_cfg_.pop("iou_thr", 0.5))
    dets, keep = _torch_greedy_nms(boxes_for_nms, scores, iou_thr)
    return torch.cat([boxes[keep], scores[keep, None]], -1), keep


def _torch_base_module():
    import torch.nn as tnn

    class _BaseModule(tnn.Module):
        def __init__(self, init_cfg=None):
            super().__init__()
            self.init_cfg = init_cfg

        def init_weights(self):
            pass

    return _BaseModule


def _torch_conv_module():
    """mmcv.cnn.ConvModule stand-in: conv -> (GN) -> ReLU, bias='auto'."""
    import torch.nn as tnn

    class _ConvModule(tnn.Module):
        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, bias="auto",
                     conv_cfg=None, norm_cfg=None, act_cfg="default",
                     **kwargs):
            super().__init__()
            with_norm = norm_cfg is not None
            if bias == "auto":
                bias = not with_norm
            self.conv = tnn.Conv2d(in_channels, out_channels, kernel_size,
                                   stride, padding, dilation, groups,
                                   bias=bias)
            self.with_norm = with_norm
            if with_norm:
                assert norm_cfg.get("type") == "GN", norm_cfg
                self.gn = tnn.GroupNorm(norm_cfg["num_groups"], out_channels)
            self.with_act = act_cfg is not None
            self.activate = tnn.ReLU(inplace=False)

        def forward(self, x):
            x = self.conv(x)
            if self.with_norm:
                x = self.gn(x)
            if self.with_act:
                x = self.activate(x)
            return x

    return _ConvModule


def _torch_scale():
    import torch
    import torch.nn as tnn

    class _Scale(tnn.Module):
        def __init__(self, scale=1.0):
            super().__init__()
            self.scale = tnn.Parameter(torch.tensor(scale,
                                                    dtype=torch.float))

        def forward(self, x):
            return x * self.scale

    return _Scale


@lru_cache(maxsize=None)
def ref_misc():
    """multi_apply/unmap + images_to_levels/anchor_inside_flags."""
    m = load_ref("core/utils/misc.py",
                 dict(BitmapMasks=object, PolygonMasks=object))
    a = load_ref("core/anchor/utils.py")
    return types.SimpleNamespace(
        multi_apply=m.multi_apply, unmap=m.unmap,
        images_to_levels=a.images_to_levels,
        anchor_inside_flags=a.anchor_inside_flags)


@lru_cache(maxsize=None)
def ref_samplers():
    sr = load_ref("core/bbox/samplers/sampling_result.py",
                  dict(util_mixins=types.SimpleNamespace(NiceRepr=object)))
    base = load_ref("core/bbox/samplers/base_sampler.py",
                    dict(SamplingResult=sr.SamplingResult))
    rnd = load_ref("core/bbox/samplers/random_sampler.py",
                   dict(BaseSampler=base.BaseSampler))
    pse = load_ref("core/bbox/samplers/pseudo_sampler.py",
                   dict(BaseSampler=base.BaseSampler,
                        SamplingResult=sr.SamplingResult))
    return types.SimpleNamespace(RandomSampler=rnd.RandomSampler,
                                 PseudoSampler=pse.PseudoSampler,
                                 SamplingResult=sr.SamplingResult)


@lru_cache(maxsize=None)
def ref_loss_modules():
    """Loss nn.Module classes used by the stock heads (CPU paths)."""
    u = ref_loss_utils()
    iou2d = ref_iou()
    foc = load_ref("models/losses/focal_loss.py",
                   dict(weight_reduce_loss=u.weight_reduce_loss))
    sl1 = load_ref("models/losses/smooth_l1_loss.py",
                   dict(weighted_loss=u.weighted_loss))
    ce = ref_cross_entropy()
    iou = load_ref("models/losses/iou_loss.py",
                   dict(weighted_loss=u.weighted_loss,
                        bbox_overlaps=iou2d.bbox_overlaps))
    return types.SimpleNamespace(
        FocalLoss=foc.FocalLoss, SmoothL1Loss=sl1.SmoothL1Loss,
        L1Loss=sl1.L1Loss, CrossEntropyLoss=ce.CrossEntropyLoss,
        IoULoss=iou.IoULoss, GIoULoss=iou.GIoULoss)


def build_ref_loss(cfg):
    cfg = dict(cfg)
    t = cfg.pop("type")
    return getattr(ref_loss_modules(), t)(**cfg)


@lru_cache(maxsize=None)
def ref_post_processing():
    """multiclass_nms with exact greedy batched_nms injected."""
    i = ref_iou()
    return load_ref("core/post_processing/bbox_nms.py",
                    dict(batched_nms=ref_batched_nms,
                         bbox_overlaps=i.bbox_overlaps))


def _build_anchor_generator(cfg):
    cfg = dict(cfg)
    cfg.pop("type", None)
    return ref_anchor_generator().AnchorGenerator(**cfg)


def _build_bbox_coder(cfg):
    cfg = dict(cfg)
    t = cfg.pop("type", "DeltaXYWHBBoxCoder")
    assert t == "DeltaXYWHBBoxCoder", t
    return ref_delta_coder().DeltaXYWHBBoxCoder(**cfg)


def _build_assigner(cfg):
    cfg = dict(cfg)
    t = cfg.pop("type", "MaxIoUAssigner")
    return getattr(ref_assigners(), t)(**cfg)


def _build_sampler(cfg, context=None):
    cfg = dict(cfg)
    t = cfg.pop("type", "PseudoSampler")
    return getattr(ref_samplers(), t)(**cfg)


def _get_k_for_topk(k, size):
    k = int(k)
    return k if 0 < k < size else -1


def _dense_head_extras():
    mi = ref_misc()
    post = ref_post_processing()
    return dict(
        force_fp32=_noop_decorator,
        auto_fp16=_noop_decorator,
        multi_apply=mi.multi_apply,
        unmap=mi.unmap,
        images_to_levels=mi.images_to_levels,
        anchor_inside_flags=mi.anchor_inside_flags,
        build_anchor_generator=_build_anchor_generator,
        build_bbox_coder=_build_bbox_coder,
        build_assigner=_build_assigner,
        build_sampler=_build_sampler,
        build_loss=build_ref_loss,
        multiclass_nms=post.multiclass_nms,
        batched_nms=ref_batched_nms,
        get_k_for_topk=_get_k_for_topk,
        ConvModule=_torch_conv_module(),
        Scale=_torch_scale(),
        BBoxTestMixin=object,
    )


@lru_cache(maxsize=None)
def ref_dense_heads():
    """Reference AnchorHead / RetinaHead / RPNHead classes, fully
    functional on CPU torch (anchor_head.py:440-616 inference path and the
    loss path :300-560 both live)."""
    extras = _dense_head_extras()
    bd = load_ref("models/dense_heads/base_dense_head.py",
                  dict(BaseModule=_torch_base_module()))
    extras["BaseDenseHead"] = bd.BaseDenseHead
    ah = load_ref("models/dense_heads/anchor_head.py", dict(extras))
    extras["AnchorHead"] = ah.AnchorHead
    rh = load_ref("models/dense_heads/retina_head.py", dict(extras))
    rpn = load_ref("models/dense_heads/rpn_head.py", dict(extras))
    return types.SimpleNamespace(AnchorHead=ah.AnchorHead,
                                 RetinaHead=rh.RetinaHead,
                                 RPNHead=rpn.RPNHead)


@lru_cache(maxsize=None)
def ref_fcos_head():
    """Reference FCOSHead (anchor_free_head base + Scale + GN ConvModule)."""
    extras = _dense_head_extras()
    t = ref_transforms()
    extras["distance2bbox"] = t.distance2bbox
    extras["reduce_mean"] = lambda x: x   # single-process
    bd = load_ref("models/dense_heads/base_dense_head.py",
                  dict(BaseModule=_torch_base_module()))
    extras["BaseDenseHead"] = bd.BaseDenseHead
    af = load_ref("models/dense_heads/anchor_free_head.py", dict(extras))
    extras["AnchorFreeHead"] = af.AnchorFreeHead
    fc = load_ref("models/dense_heads/fcos_head.py", dict(extras))
    return types.SimpleNamespace(FCOSHead=fc.FCOSHead)


@lru_cache(maxsize=None)
def ref_bbox_heads():
    """Reference BBoxHead / Shared2FCBBoxHead (RoI second stage)."""
    import torch.nn as tnn
    mi = ref_misc()
    post = ref_post_processing()
    acc = ref_accuracy()
    extras = dict(
        BaseModule=_torch_base_module(),
        auto_fp16=_noop_decorator,
        force_fp32=_noop_decorator,
        multi_apply=mi.multi_apply,
        build_bbox_coder=_build_bbox_coder,
        build_loss=build_ref_loss,
        multiclass_nms=post.multiclass_nms,
        accuracy=acc.accuracy,
        build_linear_layer=lambda cfg, in_features, out_features:
            tnn.Linear(in_features, out_features),
        ConvModule=_torch_conv_module(),
        HEADS=_Registry(),
    )
    bh = load_ref("models/roi_heads/bbox_heads/bbox_head.py", dict(extras))
    extras["BBoxHead"] = bh.BBoxHead
    cf = load_ref("models/roi_heads/bbox_heads/convfc_bbox_head.py",
                  dict(extras))
    return types.SimpleNamespace(BBoxHead=bh.BBoxHead,
                                 ConvFCBBoxHead=cf.ConvFCBBoxHead,
                                 Shared2FCBBoxHead=cf.Shared2FCBBoxHead)


def _roi_align_stub():
    """mmcv.ops.RoIAlign stand-in that calls OUR jax roi_align op — the op
    itself is pinned by analytic goldens in tests/test_ops.py; this stub
    makes the extraction numerics shared so the composition (level routing,
    head, NMS) is what the detector goldens compare."""
    import numpy as np
    import torch
    import torch.nn as tnn

    class _RoIAlign(tnn.Module):
        def __init__(self, output_size, spatial_scale=1.0, sampling_ratio=0,
                     aligned=True, **kwargs):
            super().__init__()
            self.output_size = ((output_size, output_size)
                                if isinstance(output_size, int)
                                else tuple(output_size))
            self.spatial_scale = spatial_scale
            self.sampling_ratio = sampling_ratio

        def forward(self, feat, rois):
            from pointtinybenchmark_tpu.ops.roi_align import roi_align
            f = feat.detach().numpy().transpose(0, 2, 3, 1)
            r = rois.detach().numpy()
            out = roi_align(f, r, self.spatial_scale, self.output_size[0],
                            self.sampling_ratio if self.sampling_ratio > 0
                            else 2)
            return torch.from_numpy(
                np.asarray(out).transpose(0, 3, 1, 2).copy())

    return _RoIAlign


@lru_cache(maxsize=None)
def ref_roi_extractor():
    """Reference SingleRoIExtractor (FPN level routing, finest_scale=56)."""
    ops_ns = types.SimpleNamespace(RoIAlign=_roi_align_stub())
    base = load_ref("models/roi_heads/roi_extractors/base_roi_extractor.py",
                    dict(BaseModule=_torch_base_module(), ops=ops_ns))
    ext = load_ref(
        "models/roi_heads/roi_extractors/single_level_roi_extractor.py",
        dict(BaseRoIExtractor=base.BaseRoIExtractor,
             force_fp32=_noop_decorator,
             ROI_EXTRACTORS=_Registry()))
    return types.SimpleNamespace(SingleRoIExtractor=ext.SingleRoIExtractor)


# =====================================================================
# Round-4 additions: exec the FULL reference point heads (CPR / P2P) so
# the flagship point stack gets detector-level goldens (VERDICT r3 #5).
# =====================================================================

@lru_cache(maxsize=None)
def ref_point_generator():
    return load_ref("core/anchor/point_generator.py")


def build_ref_match_cost(cfg):
    cfg = dict(cfg)
    t = cfg.pop("type")
    return getattr(ref_match_costs(), t)(**cfg)


@lru_cache(maxsize=None)
def ref_hungarian():
    """HungarianAssignerV2 (hungarian_assigner.py:150-271) with scipy LSA."""
    ar = load_ref("core/bbox/assigners/assign_result.py",
                  dict(util_mixins=types.SimpleNamespace(NiceRepr=object)))
    t = ref_transforms()
    return load_ref(
        "core/bbox/assigners/hungarian_assigner.py",
        dict(build_match_cost=build_ref_match_cost,
             bbox_cxcywh_to_xyxy=t.bbox_cxcywh_to_xyxy,
             AssignResult=ar.AssignResult, BaseAssigner=object))


@lru_cache(maxsize=None)
def ref_point_loss_modules():
    """MSELoss + the stock losses the point heads build."""
    u = ref_loss_utils()
    mse = load_ref("models/losses/mse_loss.py",
                   dict(weighted_loss=u.weighted_loss))
    base = ref_loss_modules()
    mil = ref_mil_loss()
    return types.SimpleNamespace(MSELoss=mse.MSELoss, MILLoss=mil.MILLoss,
                                 **{k: getattr(base, k) for k in
                                    ("FocalLoss", "SmoothL1Loss", "L1Loss",
                                     "CrossEntropyLoss", "IoULoss",
                                     "GIoULoss")})


def build_ref_point_loss(cfg):
    cfg = dict(cfg)
    t = cfg.pop("type")
    return getattr(ref_point_loss_modules(), t)(**cfg)


def _build_point_assigner(cfg):
    cfg = dict(cfg)
    t = cfg.pop("type")
    assert t == "HungarianAssignerV2", t
    return ref_hungarian().HungarianAssignerV2(**cfg)


def _point_head_extras():
    """Shared exec environment for the reference point dense heads."""
    mi = ref_misc()
    post = ref_post_processing()
    t = ref_transforms()
    pg = ref_point_generator()
    samplers = ref_samplers()

    def build_point_sampler(cfg, **kw):
        cfg = dict(cfg)
        tname = cfg.pop("type", "PseudoSampler")
        return getattr(samplers, tname)(**cfg)

    extras = dict(
        force_fp32=_noop_decorator,
        auto_fp16=_noop_decorator,
        multi_apply=mi.multi_apply,
        unmap=mi.unmap,
        images_to_levels=mi.images_to_levels,
        anchor_inside_flags=mi.anchor_inside_flags,
        build_assigner=_build_point_assigner,
        build_sampler=build_point_sampler,
        build_loss=build_ref_point_loss,
        multiclass_nms=post.multiclass_nms,
        batched_nms=ref_batched_nms,
        distance2bbox=t.distance2bbox,
        PointGenerator=pg.PointGenerator,
        ConvModule=_torch_conv_module(),
        Scale=_torch_scale(),
        DeformConv2d=object,
        BaseModule=_torch_base_module(),
        BBoxTestMixin=object,
        # local `from mmdet...` imports inside method bodies get stripped;
        # inject the two names they bind (p2p_head.py:402, cpr_head.py:1148)
        bbox_xyxy_to_cxcywh=t.bbox_xyxy_to_cxcywh,
        weight_reduce_loss=ref_loss_utils().weight_reduce_loss,
        accuracy=ref_accuracy().accuracy,
    )
    bd = load_ref("models/dense_heads/base_dense_head.py",
                  dict(BaseModule=_torch_base_module()))
    extras["BaseDenseHead"] = bd.BaseDenseHead
    af = load_ref("models/dense_heads/anchor_free_head.py", dict(extras))
    extras["AnchorFreeHead"] = af.AnchorFreeHead
    return extras


@lru_cache(maxsize=None)
def ref_fpn():
    """Reference FPN whole (models/necks/fpn.py — laterals, top-down
    nearest upsample, fpn convs, extra convs on_input/on_output) for the
    cross-framework training-parity experiment."""
    mod = load_ref("models/necks/fpn.py",
                   dict(ConvModule=_torch_conv_module(),
                        BaseModule=_torch_base_module(),
                        auto_fp16=_noop_decorator,
                        NECKS=_Registry()))
    return types.SimpleNamespace(FPN=mod.FPN)


@lru_cache(maxsize=None)
def ref_p2p_head():
    """Reference P2PHead whole (point/dense_heads/p2p_head.py:19-572)."""
    mod = load_ref("models/point/dense_heads/p2p_head.py",
                   dict(_point_head_extras()))
    return types.SimpleNamespace(P2PHead=mod.P2PHead)


@lru_cache(maxsize=None)
def ref_cpr_head():
    """Reference CPRHead whole (point/dense_heads/cpr_head.py:899-1310),
    incl. PointExtractor (:602), generators (:125-547), PointRefiner
    (:665-895)."""
    mod = load_ref("models/point/dense_heads/cpr_head.py",
                   dict(_point_head_extras()))
    return types.SimpleNamespace(
        CPRHead=mod.CPRHead, PointExtractor=mod.PointExtractor,
        PointRefiner=mod.PointRefiner,
        CirclePtFeatGenerator=mod.CirclePtFeatGenerator,
        OutCirclePtFeatGenerator=mod.OutCirclePtFeatGenerator)
