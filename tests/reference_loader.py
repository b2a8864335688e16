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
                   "from terminaltables", "from multiprocessing")


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
    for line in src.splitlines():
        if line.lstrip().startswith(_STRIP_PREFIXES):
            lines.append("# [stripped] " + line)
        else:
            lines.append(line)
    g: dict = {"__name__": "ref_" + relpath.replace("/", "_").rstrip(".py"),
               "__file__": path}
    g["mmcv"] = _mmcv_stub()
    # common registry names any file might reference after stripping
    for name in ("BBOX_CODERS", "IOU_CALCULATORS", "MATCH_COST", "LOSSES",
                 "PIPELINES", "BBOX_ASSIGNERS", "ANCHOR_GENERATORS"):
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
