"""Golden numeric parity vs the REFERENCE torch implementation
(VERDICT r1 item 3): the reference's pure-torch files are exec'd with
stubbed imports (tests/reference_loader.py) and their outputs compared
against our JAX reimplementations on randomized inputs at 1e-5 tolerance.
"""
import sys

import numpy as np
import pytest
import torch

sys.path.insert(0, "tests")
import reference_loader as R  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

RNG = np.random.RandomState(0)


def rand_boxes(n, lo=0, hi=100, min_wh=1.0):
    xy = RNG.rand(n, 2) * (hi - lo - 30) + lo
    wh = RNG.rand(n, 2) * 25 + min_wh
    return np.concatenate([xy, xy + wh], -1).astype(np.float32)


def t(x):
    return torch.from_numpy(np.asarray(x))


def close(ours, ref, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy()
                               if torch.is_tensor(ref) else ref,
                               atol=atol, rtol=rtol)


# --------------------------------------------------------------- delta coder
def test_delta_coder_golden():
    from pointtinybenchmark_tpu.core.bbox import bbox2delta, delta2bbox
    ref = R.ref_delta_coder()
    rois = rand_boxes(64)
    gts = rand_boxes(64)
    means = (0.1, -0.1, 0.0, 0.05)
    stds = (0.1, 0.1, 0.2, 0.2)
    close(bbox2delta(jnp.asarray(rois), jnp.asarray(gts), means, stds),
          ref.bbox2delta(t(rois), t(gts), means, stds))
    deltas = (RNG.rand(64, 4).astype(np.float32) - 0.5) * 4
    close(delta2bbox(jnp.asarray(rois), jnp.asarray(deltas), means, stds,
                     max_shape=(90, 110)),
          ref.delta2bbox(t(rois), t(deltas), means, stds,
                         max_shape=(90, 110)))
    # extreme deltas exercise the wh_ratio_clip
    deltas = (RNG.rand(64, 4).astype(np.float32) - 0.5) * 30
    close(delta2bbox(jnp.asarray(rois), jnp.asarray(deltas)),
          ref.delta2bbox(t(rois), t(deltas)), atol=1e-3, rtol=1e-3)


# ---------------------------------------------------------------- tblr coder
def test_tblr_coder_golden():
    from pointtinybenchmark_tpu.core.bbox import bbox2tblr, tblr2bbox
    ref = R.ref_tblr_coder()
    priors = rand_boxes(64)
    gts = rand_boxes(64)
    for norm_wh in (True, False):
        close(bbox2tblr(jnp.asarray(priors), jnp.asarray(gts), 4.0, norm_wh),
              ref.bboxes2tblr(t(priors), t(gts), normalizer=4.0,
                              normalize_by_wh=norm_wh))
        enc = RNG.rand(64, 4).astype(np.float32)
        close(tblr2bbox(jnp.asarray(priors), jnp.asarray(enc), 4.0, norm_wh),
              ref.tblr2bboxes(t(priors), t(enc), normalizer=4.0,
                              normalize_by_wh=norm_wh))


# ----------------------------------------------------------- bucketing coder
def test_bucketing_coder_golden():
    from pointtinybenchmark_tpu.core.bbox import bbox2bucket, bucket2bbox
    ref = R.ref_bucketing_coder()
    props = rand_boxes(32, min_wh=8.0)
    gts = props + (RNG.rand(32, 4).astype(np.float32) - 0.5) * 6
    num_buckets, scale = 14, 3.0
    offs, offw, labels, clsw = bbox2bucket(
        jnp.asarray(props), jnp.asarray(gts), num_buckets, scale)
    r_offs, r_offw, r_lab, r_clsw = ref.bbox2bucket(
        t(props), t(gts), num_buckets, scale)
    close(offs, r_offs, atol=1e-4, rtol=1e-4)
    close(offw, r_offw)
    close(labels, r_lab.float())
    close(clsw, r_clsw)

    side = int(np.ceil(num_buckets / 2.0))
    cls_preds = RNG.rand(32, 4 * side).astype(np.float32)
    off_preds = (RNG.rand(32, 4 * side).astype(np.float32) - 0.5)
    boxes, conf = bucket2bbox(jnp.asarray(props), jnp.asarray(cls_preds),
                              jnp.asarray(off_preds), num_buckets, scale,
                              max_shape=(100, 100))
    r_boxes, r_conf = ref.bucket2bbox(t(props), t(cls_preds), t(off_preds),
                                      num_buckets, scale,
                                      max_shape=(100, 100))
    close(boxes, r_boxes, atol=1e-4, rtol=1e-4)
    close(conf, r_conf, atol=1e-5)


# ------------------------------------------------------- transforms (tiling)
def test_bbox_transforms_golden():
    from pointtinybenchmark_tpu.core.bbox import (bbox_flip,
                                                  bbox_mapping_back_tile,
                                                  cxcywh2xyxy, xyxy2cxcywh)
    ref = R.ref_transforms()
    boxes = rand_boxes(40)
    shape = (120, 160)
    for d in ("horizontal", "vertical"):
        close(bbox_flip(jnp.asarray(boxes), shape, d),
              ref.bbox_flip(t(boxes), shape, d))
    # tile mapping back: + (dx, dy) then inverse flip/scale in the reference;
    # with flip=False, scale=1 it's the pure offset add
    off = np.array([32.0, 48.0], np.float32)
    close(bbox_mapping_back_tile(jnp.asarray(boxes), jnp.asarray(off)),
          ref.bbox_mapping_back(t(boxes), shape, 1.0, False, "horizontal",
                                (32.0, 48.0)))
    close(xyxy2cxcywh(jnp.asarray(boxes)), ref.bbox_xyxy_to_cxcywh(t(boxes)))
    cxcy = RNG.rand(40, 4).astype(np.float32) * 50 + 10
    close(cxcywh2xyxy(jnp.asarray(cxcy)), ref.bbox_cxcywh_to_xyxy(t(cxcy)))
    # distance2bbox both directions
    from pointtinybenchmark_tpu.core.bbox import bbox2distance, distance2bbox
    pts = RNG.rand(40, 2).astype(np.float32) * 100
    dist = RNG.rand(40, 4).astype(np.float32) * 20
    close(distance2bbox(jnp.asarray(pts), jnp.asarray(dist), (120, 160)),
          ref.distance2bbox(t(pts), t(dist), (120, 160)))
    close(bbox2distance(jnp.asarray(pts), jnp.asarray(boxes), 16.0),
          ref.bbox2distance(t(pts), t(boxes), 16.0))


def test_tile_mapping_roundtrip_vs_reference_forward():
    """bbox_mapping with a tile offset (fork transforms.py:45-58): subtract
    offset + clip; the reference then drops <2px boxes — ours flags them."""
    from pointtinybenchmark_tpu.core.bbox import bbox_mapping_tile
    ref = R.ref_transforms()
    boxes = rand_boxes(60)
    shape = (64, 64)  # small tile so some boxes clip away
    mapped, valid = bbox_mapping_tile(jnp.asarray(boxes),
                                      jnp.asarray([20.0, 30.0]), shape)
    r = ref.bbox_mapping(t(boxes), (64, 64, 3), 1.0, False, "horizontal",
                         (20.0, 30.0))
    ours_kept = np.asarray(mapped)[np.asarray(valid)]
    np.testing.assert_allclose(ours_kept, r.numpy(), atol=1e-5)


# ----------------------------------------------------------------------- iou
def test_bbox_overlaps_golden():
    from pointtinybenchmark_tpu.ops.iou import bbox_overlaps
    ref = R.ref_iou()
    a = rand_boxes(30)
    b = rand_boxes(20)
    for mode in ("iou", "iof", "giou"):
        close(bbox_overlaps(jnp.asarray(a), jnp.asarray(b), mode=mode),
              ref.bbox_overlaps(t(a), t(b), mode=mode), atol=1e-5)
    # aligned
    close(bbox_overlaps(jnp.asarray(a[:20]), jnp.asarray(b), mode="iou",
                        is_aligned=True)
          if "is_aligned" in bbox_overlaps.__code__.co_varnames else
          jnp.diag(bbox_overlaps(jnp.asarray(a[:20]), jnp.asarray(b))),
          ref.bbox_overlaps(t(a[:20]), t(b), mode="iou", is_aligned=True))


# --------------------------------------------------------------- match costs
def test_match_costs_golden():
    from pointtinybenchmark_tpu.core import match_costs as MC
    ref = R.ref_match_costs()
    n, g, c = 50, 7, 4
    logits = (RNG.rand(n, c).astype(np.float32) - 0.5) * 6
    labels = RNG.randint(0, c, g)
    close(MC.FocalLossCost(weight=2.0)(jnp.asarray(logits),
                                       jnp.asarray(labels)),
          ref.FocalLossCost(weight=2.0)(t(logits), t(labels)))
    close(MC.ClassificationCost(weight=1.5)(jnp.asarray(logits),
                                            jnp.asarray(labels)),
          ref.ClassificationCost(weight=1.5)(t(logits), t(labels)))
    pred_pts = RNG.rand(n, 2).astype(np.float32) * 100
    gt_pts = RNG.rand(g, 2).astype(np.float32) * 100
    meta = {"img_shape": (120, 160, 3)}
    for norm in (True, False):
        close(MC.DisCostV2(weight=0.3, norm_with_img_wh=norm)(
                  jnp.asarray(pred_pts), jnp.asarray(gt_pts), meta),
              ref.DisCostV2(weight=0.3, norm_with_img_wh=norm)(
                  t(pred_pts), t(gt_pts), meta))
    boxes_n = rand_boxes(n)
    boxes_g = rand_boxes(g)
    close(MC.IoUCost(iou_mode="giou", weight=2.0)(jnp.asarray(boxes_n),
                                                  jnp.asarray(boxes_g)),
          ref.IoUCost(iou_mode="giou", weight=2.0)(t(boxes_n), t(boxes_g)),
          atol=1e-5)
    # BBoxL1Cost operates on normalized cxcywh in the reference
    nb_n = (RNG.rand(n, 4).astype(np.float32))
    nb_g = (RNG.rand(g, 4).astype(np.float32))
    close(MC.BBoxL1Cost(weight=1.0)(jnp.asarray(nb_n), jnp.asarray(nb_g)),
          ref.BBoxL1Cost(weight=1.0)(t(nb_n), t(nb_g)))


# ------------------------------------------------------------------- MILLoss
@pytest.mark.parametrize("binary_ins", [False, True])
def test_mil_loss_golden(binary_ins):
    from pointtinybenchmark_tpu.models.losses.mil_loss import MILLoss
    ref = R.ref_mil_loss()
    B, N, C = 6, 12, 3
    k = 2 if binary_ins else 1
    cls_prob = RNG.rand(B, N, C).astype(np.float32)
    ins_outs = (RNG.rand(B, N, C * k).astype(np.float32) - 0.5) * 4
    labels = RNG.randint(0, C, B)
    valid = (RNG.rand(B, N, 1) > 0.3).astype(np.float32)
    valid[:, 0] = 1.0  # every bag keeps at least one point

    ours = MILLoss(binary_ins=binary_ins)
    loss, acc, ns = ours(jnp.asarray(cls_prob), jnp.asarray(ins_outs),
                         jnp.asarray(labels), jnp.asarray(valid))
    rloss, racc, rns = ref.MILLoss(binary_ins=binary_ins)(
        t(cls_prob), t(ins_outs), t(labels).long(), t(valid))
    np.testing.assert_allclose(float(loss), float(rloss), atol=1e-5,
                               rtol=1e-5)
    assert float(ns) == float(rns)


def test_gfocal_formula_golden():
    from pointtinybenchmark_tpu.models.losses.mil_loss import MILLoss
    ref = R.ref_mil_loss()
    p = RNG.rand(8, 5).astype(np.float32)
    q = (RNG.rand(8, 5) > 0.5).astype(np.float32)
    close(MILLoss().gfocal_loss(jnp.asarray(p), jnp.asarray(q)),
          ref.MILLoss().gfocal_loss(t(p), t(q)))


# --------------------------------------------------------------- Scale Match
def test_scale_match_distribute_golden():
    from pointtinybenchmark_tpu.data.scale_match import get_distribute
    ref = R.ref_scale_match()
    annos = [dict(bbox=[0, 0, float(w), float(h)], iscrowd=0, ignore=0)
             for w, h in (RNG.rand(500, 2) * 60 + 1)]
    for use_log in (False, True):
        c, s = get_distribute(annos, bins=40, except_rate=0.1,
                              use_log_bins=use_log)
        rc, rs = ref.ScaleMatch._get_distribute(annos, bins=40,
                                                except_rate=0.1,
                                                use_log_bins=use_log)
        np.testing.assert_allclose(c, rc, atol=1e-7)
        np.testing.assert_allclose(s, rs, atol=1e-5)
    # no outlier clipping
    c, s = get_distribute(annos, bins=25, except_rate=0)
    rc, rs = ref.ScaleMatch._get_distribute(annos, bins=25, except_rate=0)
    np.testing.assert_allclose(c, rc, atol=1e-7)
    np.testing.assert_allclose(s, rs, atol=1e-5)


# ---------------------------------------------- COCOeval oracle cross-check
def _synthetic_coco(seed, n_imgs=8, n_cats=3, crowd_rate=0.15,
                    ignore_rate=0.1):
    rng = np.random.RandomState(seed)
    images, anns = [], []
    ann_id = 1
    for i in range(n_imgs):
        images.append(dict(id=i + 1, file_name=f"i{i}.jpg", width=200,
                           height=200))
        for _ in range(rng.randint(1, 8)):
            x, y = rng.rand(2) * 150
            w, h = rng.rand(2) * 40 + 3
            anns.append(dict(id=ann_id, image_id=i + 1,
                             category_id=int(rng.randint(1, n_cats + 1)),
                             bbox=[float(x), float(y), float(w), float(h)],
                             area=float(w * h),
                             iscrowd=int(rng.rand() < crowd_rate),
                             ignore=int(rng.rand() < ignore_rate)))
            ann_id += 1
    gt = dict(images=images, annotations=anns,
              categories=[dict(id=c + 1, name=f"c{c}")
                          for c in range(n_cats)])
    dets = []
    for a in anns:  # jittered copies of gts + spurious dets
        if rng.rand() < 0.8:
            x, y, w, h = a["bbox"]
            j = (rng.rand(4) - 0.5) * 8
            dets.append(dict(image_id=a["image_id"],
                             category_id=a["category_id"],
                             bbox=[float(x + j[0]), float(y + j[1]),
                                   float(max(w + j[2], 2)),
                                   float(max(h + j[3], 2))],
                             score=float(rng.rand())))
    for _ in range(25):
        x, y = rng.rand(2) * 150
        w, h = rng.rand(2) * 30 + 3
        dets.append(dict(image_id=int(rng.randint(1, n_imgs + 1)),
                         category_id=int(rng.randint(1, n_cats + 1)),
                         bbox=[float(x), float(y), float(w), float(h)],
                         score=float(rng.rand())))
    return gt, dets


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_cocoeval_vs_pycocotools_oracle(seed):
    """Our COCOExpandEval with extensions OFF must match the canonical
    pycocotools algorithm (oracle_cocoeval.py) on randomized datasets with
    crowd + ignore anns — precision/recall arrays elementwise."""
    from oracle_cocoeval import OracleCOCOeval
    from pointtinybenchmark_tpu.data.coco import COCO
    from pointtinybenchmark_tpu.evaluation.cocoeval import COCOExpandEval

    gt_json, dets = _synthetic_coco(seed)
    coco_gt = COCO(gt_json)
    coco_dt = coco_gt.loadRes(dets)

    ours = COCOExpandEval(coco_gt, coco_dt, "bbox",
                          cocofmt_param=dict(evaluate_standard="coco"))
    ours.evaluate()
    ours.accumulate()
    ours.summarize()

    p = ours.params
    oracle = OracleCOCOeval(coco_gt, coco_dt, p.iouThrs, p.recThrs,
                            p.maxDets, p.areaRng)
    oracle.evaluate()
    oracle.accumulate()

    np.testing.assert_allclose(ours.eval["precision"], oracle.precision,
                               atol=1e-10)
    np.testing.assert_allclose(ours.eval["recall"], oracle.recall,
                               atol=1e-10)


def test_cocoeval_vs_oracle_class_agnostic():
    """useCats=0 (proposal AR path) against the oracle."""
    from oracle_cocoeval import OracleCOCOeval
    from pointtinybenchmark_tpu.data.coco import COCO
    from pointtinybenchmark_tpu.evaluation.cocoeval import COCOExpandEval

    gt_json, dets = _synthetic_coco(7)
    coco_gt = COCO(gt_json)
    coco_dt = coco_gt.loadRes(dets)
    ours = COCOExpandEval(coco_gt, coco_dt, "bbox",
                          cocofmt_param=dict(evaluate_standard="coco"))
    ours.params.useCats = 0
    ours.evaluate()
    ours.accumulate()
    p = ours.params
    oracle = OracleCOCOeval(coco_gt, coco_dt, p.iouThrs, p.recThrs,
                            p.maxDets, p.areaRng, useCats=0)
    oracle.evaluate()
    oracle.accumulate()
    np.testing.assert_allclose(ours.eval["precision"], oracle.precision,
                               atol=1e-10)
    np.testing.assert_allclose(ours.eval["recall"], oracle.recall,
                               atol=1e-10)


# ---------------------------------------------------------- legacy (v1.x)
def test_legacy_delta_coder_golden():
    """LegacyDeltaXYWHBBoxCoder numerics vs the reference file
    (core/bbox/coder/legacy_delta_xywh_bbox_coder.py)."""
    from pointtinybenchmark_tpu.core.bbox import (legacy_bbox2delta,
                                                  legacy_delta2bbox)
    ref = R.ref_legacy_delta_coder()
    rois = rand_boxes(64)
    gts = rand_boxes(64)
    means = (0.0, 0.0, 0.0, 0.0)
    stds = (0.1, 0.1, 0.2, 0.2)
    close(legacy_bbox2delta(jnp.asarray(rois), jnp.asarray(gts), means, stds),
          ref.legacy_bbox2delta(t(rois), t(gts), means, stds))
    deltas = (RNG.rand(64, 4).astype(np.float32) - 0.5) * 4
    close(legacy_delta2bbox(jnp.asarray(rois), jnp.asarray(deltas), means,
                            stds, max_shape=(90, 110)),
          ref.legacy_delta2bbox(t(rois), t(deltas), means, stds,
                                max_shape=(90, 110)))


def test_legacy_anchor_generator_golden():
    """LegacyAnchorGenerator / LegacySSDAnchorGenerator base anchors and
    grids vs the reference classes (core/anchor/anchor_generator.py:474,573)."""
    from pointtinybenchmark_tpu.core.anchors import (LegacyAnchorGenerator,
                                                     LegacySSDAnchorGenerator)
    refmod = R.ref_anchor_generator()

    ours = LegacyAnchorGenerator(strides=[16], ratios=[0.5, 1.0, 2.0],
                                 scales=[8], center_offset=0.5)
    theirs = refmod.LegacyAnchorGenerator(
        strides=[16], ratios=[0.5, 1.0, 2.0], scales=[8], center_offset=0.5)
    np.testing.assert_allclose(ours.base_anchors[0],
                               theirs.base_anchors[0].numpy(), atol=1e-4)
    grid = ours.single_level_grid_anchors((2, 3), 0)
    ref_grid = theirs.grid_anchors([(2, 3)], device="cpu")[0].numpy()
    np.testing.assert_allclose(grid, ref_grid, atol=1e-4)

    ours_ssd = LegacySSDAnchorGenerator(
        strides=[8, 16, 32, 64, 100, 300],
        ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
        basesize_ratio_range=(0.15, 0.9), input_size=300, scale_major=False)
    theirs_ssd = refmod.LegacySSDAnchorGenerator(
        strides=[8, 16, 32, 64, 100, 300],
        ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
        basesize_ratio_range=(0.15, 0.9), input_size=300, scale_major=False)
    for a, b in zip(ours_ssd.base_anchors, theirs_ssd.base_anchors):
        np.testing.assert_allclose(a, b.numpy(), atol=1e-4)


def test_ssd_anchor_generator_basesize_surface_golden():
    """SSDAnchorGenerator with the mmdet basesize_ratio_range surface vs the
    reference class (base sizes + anchors per level)."""
    from pointtinybenchmark_tpu.core.anchors import SSDAnchorGenerator
    refmod = R.ref_anchor_generator()
    kw = dict(strides=[8, 16, 32, 64, 100, 300],
              ratios=[[2], [2, 3], [2, 3], [2, 3], [2], [2]],
              basesize_ratio_range=(0.15, 0.9), input_size=300,
              scale_major=False)
    ours = SSDAnchorGenerator(**kw)
    theirs = refmod.SSDAnchorGenerator(**kw)
    for a, b in zip(ours.base_anchors, theirs.base_anchors):
        np.testing.assert_allclose(a, b.numpy(), atol=1e-4)


# ------------------------------------------------------------- losses golden
def _L():
    return R.ref_losses()


def test_focal_loss_golden():
    from pointtinybenchmark_tpu.models.losses.focal_loss import (
        FocalLoss, sigmoid_focal_loss)
    ref = _L()
    n, c = 32, 4
    pred = (RNG.rand(n, c).astype(np.float32) - 0.5) * 8
    labels = RNG.randint(0, c + 1, n)  # c = background
    onehot = np.eye(c + 1, dtype=np.float32)[labels][:, :c]
    # elementwise formula vs py_sigmoid_focal_loss
    close(sigmoid_focal_loss(jnp.asarray(pred), jnp.asarray(onehot)),
          ref.py_sigmoid_focal_loss(t(pred), t(onehot), reduction="none"))
    # class-level reduction with weight + avg_factor
    w = RNG.rand(n).astype(np.float32)
    ours = FocalLoss(gamma=1.7, alpha=0.4, loss_weight=0.9)(
        jnp.asarray(pred), jnp.asarray(labels), weight=jnp.asarray(w),
        avg_factor=11.0)
    theirs = 0.9 * ref.py_sigmoid_focal_loss(
        t(pred), t(onehot), weight=t(w).view(-1, 1), gamma=1.7, alpha=0.4,
        reduction="mean", avg_factor=11.0)
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5,
                               atol=1e-6)


def test_ghm_losses_golden():
    from pointtinybenchmark_tpu.models.losses.advanced import GHMC, GHMR
    ref = _L()
    n, c = 40, 3
    pred = (RNG.rand(n, c).astype(np.float32) - 0.5) * 6
    target = (RNG.rand(n, c) > 0.7).astype(np.float32)
    lw = (RNG.rand(n, c) > 0.2).astype(np.float32)
    ours = GHMC(bins=10, momentum=0.0)(jnp.asarray(pred),
                                       jnp.asarray(target), jnp.asarray(lw))
    theirs = ref.GHMC(bins=10, momentum=0.0)(t(pred), t(target), t(lw))
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5,
                               atol=1e-6)

    pr = (RNG.rand(n, 4).astype(np.float32) - 0.5) * 4
    tg = (RNG.rand(n, 4).astype(np.float32) - 0.5) * 4
    lwr = (RNG.rand(n, 4) > 0.2).astype(np.float32)
    ours_r = GHMR(mu=0.02, bins=10)(jnp.asarray(pr), jnp.asarray(tg),
                                    jnp.asarray(lwr))
    theirs_r = ref.GHMR(mu=0.02, bins=10)(t(pr), t(tg), t(lwr))
    np.testing.assert_allclose(float(ours_r), float(theirs_r), rtol=1e-5,
                               atol=1e-6)


def _rand_boxes(n):
    x1 = RNG.rand(n, 2).astype(np.float32) * 50
    wh = RNG.rand(n, 2).astype(np.float32) * 40 + 1
    return np.concatenate([x1, x1 + wh], -1)


def test_iou_family_losses_golden():
    from pointtinybenchmark_tpu.models.losses.iou_loss import (
        BoundedIoULoss, DIoULoss, GIoULoss, IoULoss)
    ref = _L()
    n = 24
    pred, target = _rand_boxes(n), _rand_boxes(n)
    for ours_cls, ref_fn, kw in (
            (IoULoss(), ref.iou_loss, {}),
            (IoULoss(linear=True), lambda p, q, reduction: ref.iou_loss(
                p, q, linear=True, reduction=reduction), {}),
            (GIoULoss(), ref.giou_loss, {}),
            (DIoULoss(), ref.diou_loss, {}),
            (BoundedIoULoss(beta=0.2), lambda p, q, reduction:
             ref.bounded_iou_loss(p, q, beta=0.2, reduction=reduction), {})):
        ours = ours_cls(jnp.asarray(pred), jnp.asarray(target),
                        reduction_override="sum")
        theirs = ref_fn(t(pred), t(target), reduction="sum")
        np.testing.assert_allclose(float(ours), float(theirs), rtol=2e-5,
                                   atol=1e-4)


def test_varifocal_qfl_dfl_balanced_l1_golden():
    from pointtinybenchmark_tpu.models.losses.advanced import VarifocalLoss
    from pointtinybenchmark_tpu.models.losses.gfocal_loss import (
        DistributionFocalLoss, QualityFocalLoss)
    from pointtinybenchmark_tpu.models.losses.smooth_l1_loss import (
        BalancedL1Loss)
    ref = _L()
    n, c = 30, 5
    pred = (RNG.rand(n, c).astype(np.float32) - 0.5) * 8
    # varifocal: target = iou score on the positive channel
    vf_t = np.zeros((n, c), np.float32)
    pos = RNG.rand(n) > 0.5
    vf_t[pos, RNG.randint(0, c, int(pos.sum()))] = RNG.rand(
        int(pos.sum())).astype(np.float32)
    ours = VarifocalLoss(alpha=0.75, gamma=2.0)(jnp.asarray(pred),
                                                jnp.asarray(vf_t))
    theirs = ref.varifocal_loss(t(pred), t(vf_t), alpha=0.75, gamma=2.0,
                                reduction="sum")
    np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5,
                               atol=1e-5)

    labels = RNG.randint(0, c + 1, n)
    scores = RNG.rand(n).astype(np.float32) * (labels < c)
    ours_q = QualityFocalLoss(beta=2.0)(
        jnp.asarray(pred), (jnp.asarray(labels), jnp.asarray(scores)),
        reduction_override="sum")
    theirs_q = ref.quality_focal_loss(t(pred), (t(labels).long(), t(scores)),
                                      beta=2.0, reduction="sum")
    np.testing.assert_allclose(float(ours_q), float(theirs_q), rtol=1e-5,
                               atol=1e-4)

    nb = 8
    dpred = (RNG.rand(n, nb).astype(np.float32) - 0.5) * 4
    dtarget = (RNG.rand(n).astype(np.float32)) * (nb - 1 - 1e-3)
    ours_d = DistributionFocalLoss(loss_weight=1.0)(
        jnp.asarray(dpred), jnp.asarray(dtarget), reduction_override="sum")
    theirs_d = ref.distribution_focal_loss(t(dpred), t(dtarget),
                                           reduction="sum")
    np.testing.assert_allclose(float(ours_d), float(theirs_d), rtol=1e-5,
                               atol=1e-4)

    bp = (RNG.rand(n, 4).astype(np.float32) - 0.5) * 6
    bt = (RNG.rand(n, 4).astype(np.float32) - 0.5) * 6
    ours_b = BalancedL1Loss(alpha=0.5, gamma=1.5, beta=1.0)(
        jnp.asarray(bp), jnp.asarray(bt))
    theirs_b = ref.balanced_l1_loss(t(bp), t(bt), beta=1.0, alpha=0.5,
                                    gamma=1.5, reduction="sum")
    np.testing.assert_allclose(float(ours_b), float(theirs_b), rtol=1e-5,
                               atol=1e-4)


def test_ciou_loss_golden():
    from pointtinybenchmark_tpu.models.losses.iou_loss import CIoULoss
    ref = _L()
    pred, target = _rand_boxes(20), _rand_boxes(20)
    ours = CIoULoss()(jnp.asarray(pred), jnp.asarray(target),
                      reduction_override="sum")
    theirs = ref.ciou_loss(t(pred), t(target), reduction="sum")
    np.testing.assert_allclose(float(ours), float(theirs), rtol=2e-5,
                               atol=1e-4)


# ----------------------------------------------------------- assigner golden
def test_max_iou_assigner_golden():
    from pointtinybenchmark_tpu.core.assigners import MaxIoUAssigner
    ref = R.ref_assigners()
    rng = np.random.RandomState(7)
    for trial in range(5):
        n, g = 60, 7
        anchors = np.concatenate(
            [rng.rand(n, 2) * 60, rng.rand(n, 2) * 30 + 4], -1
        ).astype(np.float32)
        anchors[:, 2:] += anchors[:, :2]
        gts = np.concatenate([rng.rand(g, 2) * 60,
                              rng.rand(g, 2) * 30 + 4], -1).astype(np.float32)
        gts[:, 2:] += gts[:, :2]
        ours = MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.3,
                              min_pos_iou=0.3).assign(
            jnp.asarray(anchors), jnp.asarray(gts),
            jnp.ones(g, bool))[0]
        theirs = ref.MaxIoUAssigner(pos_iou_thr=0.5, neg_iou_thr=0.3,
                                    min_pos_iou=0.3).assign(
            t(anchors), t(gts)).gt_inds.numpy()
        # ours: 0 bg, j+1 pos; reference: -1 unassigned? mmdet: 0 bg
        # when below neg thr, -1 ignore zone. map -1 -> our ignore code
        ours = np.asarray(ours)
        np.testing.assert_array_equal(ours, theirs), trial


def test_atss_assign_golden():
    from pointtinybenchmark_tpu.models.dense_heads.atss_head import (
        atss_assign)
    ref = R.ref_assigners()
    rng = np.random.RandomState(3)
    for trial in range(5):
        # two "levels" of jittered grid anchors (jitter avoids exact
        # center-distance ties, where torch.topk order is unspecified)
        anc = []
        for stride, hw in ((8, 8), (16, 4)):
            ys, xs = np.mgrid[:hw, :hw] * stride + stride / 2
            c = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
            c += rng.rand(*c.shape).astype(np.float32) * 2 - 1
            sz = stride * 4
            anc.append(np.concatenate([c - sz / 2, c + sz / 2], -1))
        level_sizes = [len(a) for a in anc]
        anchors = np.concatenate(anc)
        g = 5
        gts = np.concatenate([rng.rand(g, 2) * 50,
                              rng.rand(g, 2) * 25 + 6], -1).astype(np.float32)
        gts[:, 2:] += gts[:, :2]
        ours = np.asarray(atss_assign(anchors, level_sizes,
                                      jnp.asarray(gts), jnp.ones(g, bool),
                                      topk=9))
        theirs = ref.ATSSAssigner(topk=9).assign(
            t(anchors), level_sizes, t(gts)).gt_inds.numpy()
        np.testing.assert_array_equal(ours, theirs), trial


def test_point_assigner_golden():
    """point_assign (RepPoints; reference point_assigner.py:9-134):
    identical assignment on jittered multi-level point grids."""
    from pointtinybenchmark_tpu.models.dense_heads.reppoints_head import (
        point_assign)
    ref = R.ref_point_assigner()
    rng = np.random.RandomState(11)
    for trial in range(5):
        pts, strides = [], []
        for stride, hw in ((8, 8), (16, 4), (32, 2)):
            ys, xs = np.mgrid[:hw, :hw] * stride + stride / 2
            c = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
            c += rng.rand(*c.shape).astype(np.float32) * 3 - 1.5
            pts.append(c)
            strides.append(np.full(len(c), stride, np.float32))
        points = np.concatenate(pts)
        strides = np.concatenate(strides)
        g = 6
        gts = np.concatenate([rng.rand(g, 2) * 40,
                              rng.rand(g, 2) * 30 + 4], -1).astype(np.float32)
        gts[:, 2:] += gts[:, :2]
        ours = np.asarray(point_assign(jnp.asarray(points), strides,
                                       jnp.asarray(gts), jnp.ones(g, bool),
                                       scale=4.0, pos_num=3))
        pts3 = np.concatenate([points, strides[:, None]], -1)
        theirs = ref.PointAssigner(scale=4, pos_num=3).assign(
            t(pts3), t(gts)).gt_inds.numpy()
        np.testing.assert_array_equal(ours, theirs), trial


def test_standard_anchor_generator_golden():
    """AnchorGenerator grid coordinates == reference
    core/anchor/anchor_generator.py (V2 conventions) per level."""
    from pointtinybenchmark_tpu.core.anchors import AnchorGenerator
    ref_mod = R.ref_anchor_generator()
    cfg = dict(scales=[2, 4], ratios=[0.5, 1.0, 2.0], strides=[4, 8])
    ours = AnchorGenerator(**cfg)
    theirs = ref_mod.AnchorGenerator(**cfg)
    sizes = [(6, 5), (3, 3)]
    ref_all = theirs.grid_anchors([torch.Size(s) for s in sizes],
                                  device="cpu")
    got_all = ours.grid_anchors(sizes)
    for lvl in range(2):
        np.testing.assert_allclose(np.asarray(got_all[lvl]),
                                   ref_all[lvl].numpy(), atol=1e-4)


def test_cpr_circle_geometry_golden():
    """CPR circle-bag offsets (the heart of the benchmark; reference
    cpr_head.py::CirclePtFeatGenerator.get_point_neighbours :473-497):
    ring radii i*stride, base_num_point*i points per ring (or constant
    when same_num_all_radius), start_angle in degrees, center appended
    last — identical to the reference formula."""
    from pointtinybenchmark_tpu.models.dense_heads.cpr_head import (
        circle_offsets)

    def ref_circle(radius, bnp, stride, start_angle=0.0, same=False):
        chosen = []
        for i in range(radius):
            r = (i + 1) * stride
            n = bnp if same else bnp * (i + 1)
            ang = torch.arange(n).float() / n * 360 + start_angle
            ang = ang / 360 * np.pi * 2
            chosen.append(torch.stack([r * torch.cos(ang),
                                       r * torch.sin(ang)], -1))
        pts = torch.cat(chosen)
        # reference appends the gt center as the LAST bag point
        return torch.cat([pts, torch.zeros(1, 2)]).numpy()

    for radius, bnp, stride, ang, same in [(3, 8, 4.0, 0.0, False),
                                           (2, 6, 8.0, 15.0, False),
                                           (4, 8, 1.0, 0.0, True)]:
        ours = np.asarray(circle_offsets(radius, bnp, stride, ang, same))
        ours_full = np.concatenate([ours, np.zeros((1, 2), np.float32)])
        ref = ref_circle(radius, bnp, stride, ang, same)
        np.testing.assert_allclose(ours_full, ref, atol=1e-5)


def test_gaussian_radius_golden():
    """CenterNet/CornerNet radius heuristic vs reference
    models/utils/gaussian_target.py::gaussian_radius."""
    from pointtinybenchmark_tpu.models.dense_heads.centernet_head import (
        gaussian_radius)
    ref = R.ref_gaussian_target()
    rng = np.random.RandomState(5)
    for _ in range(50):
        h = float(rng.uniform(2, 120))
        w = float(rng.uniform(2, 120))
        for ov in (0.3, 0.7):
            ours = float(gaussian_radius(h, w, ov))
            theirs = float(ref.gaussian_radius(
                (torch.tensor(h), torch.tensor(w)), ov))
            np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-4)


def test_eval_map_golden():
    """VOC-style eval_map (reference core/evaluation/mean_ap.py:267-400):
    identical mAP/per-class AP on randomized multi-image multi-class
    results, with ignore boxes, both 'area' and voc07 '11points' modes,
    and scale_ranges."""
    from pointtinybenchmark_tpu.evaluation.mean_ap import eval_map
    ref = R.ref_mean_ap()
    rng = np.random.RandomState(17)
    num_imgs, num_classes = 6, 3

    def make_case():
        det_results, annotations = [], []
        for _ in range(num_imgs):
            per_cls = []
            for _c in range(num_classes):
                n = rng.randint(0, 8)
                xy = rng.rand(n, 2).astype(np.float32) * 80
                wh = rng.rand(n, 2).astype(np.float32) * 30 + 2
                sc = rng.rand(n, 1).astype(np.float32)
                per_cls.append(np.concatenate([xy, xy + wh, sc], -1))
            det_results.append(per_cls)
            g = rng.randint(1, 6)
            gxy = rng.rand(g, 2).astype(np.float32) * 80
            gwh = rng.rand(g, 2).astype(np.float32) * 30 + 2
            gi = rng.randint(0, 3)
            ixy = rng.rand(gi, 2).astype(np.float32) * 80
            iwh = rng.rand(gi, 2).astype(np.float32) * 30 + 2
            annotations.append(dict(
                bboxes=np.concatenate([gxy, gxy + gwh], -1),
                labels=rng.randint(0, num_classes, g),
                bboxes_ignore=np.concatenate([ixy, ixy + iwh], -1),
                labels_ignore=rng.randint(0, num_classes, gi)))
        return det_results, annotations

    for ds in (None, "voc07"):
        det_results, annotations = make_case()
        ours_map, ours_cls = eval_map(det_results, annotations,
                                      iou_thr=0.5, dataset=ds)
        ref_map, ref_cls = ref.eval_map(det_results, annotations,
                                        iou_thr=0.5, dataset=ds, nproc=1)
        np.testing.assert_allclose(ours_map, ref_map, atol=1e-6)
        for a, b in zip(ours_cls, ref_cls):
            np.testing.assert_allclose(a["ap"], b["ap"], atol=1e-6)

    # scale_ranges path
    det_results, annotations = make_case()
    ours_map, _ = eval_map(det_results, annotations, iou_thr=0.5,
                           scale_ranges=[(0, 16), (16, 64)])
    ref_map, _ = ref.eval_map(det_results, annotations, iou_thr=0.5,
                              scale_ranges=[(0, 16), (16, 64)], nproc=1)
    np.testing.assert_allclose(ours_map, ref_map, atol=1e-6)


def test_eval_recalls_golden():
    """eval_recalls (reference core/evaluation/recall.py::eval_recalls):
    identical recall matrix on randomized proposals incl. score-sorted
    5-column proposals and empty-gt images."""
    from pointtinybenchmark_tpu.evaluation.recall import eval_recalls
    ref = R.ref_recall()
    rng = np.random.RandomState(23)
    gts, props = [], []
    for i in range(6):
        g = rng.randint(0, 5)
        gxy = rng.rand(g, 2).astype(np.float32) * 80
        gwh = rng.rand(g, 2).astype(np.float32) * 30 + 2
        gts.append(np.concatenate([gxy, gxy + gwh], -1))
        p = rng.randint(5, 40)
        pxy = rng.rand(p, 2).astype(np.float32) * 80
        pwh = rng.rand(p, 2).astype(np.float32) * 30 + 2
        sc = rng.rand(p, 1).astype(np.float32)
        props.append(np.concatenate([pxy, pxy + pwh, sc], -1))
    nums = [5, 10, 30]
    thrs = [0.3, 0.5, 0.7]
    ours = eval_recalls(gts, props, nums, iou_thrs=thrs)
    theirs = ref.eval_recalls(gts, props, proposal_nums=nums, iou_thrs=thrs)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs),
                               atol=1e-6)


def test_bbox_rescale_golden():
    """Center box rescale (SABL bucket-region scaling; reference
    core/bbox/transforms.py:214 bbox_rescale == our
    bbox_rescale_center; our bbox_rescale is the scale_factor divide)."""
    from pointtinybenchmark_tpu.core.bbox import bbox_rescale_center
    ref = R.ref_transforms()
    boxes = rand_boxes(24)
    close(bbox_rescale_center(jnp.asarray(boxes), 1.7),
          ref.bbox_rescale(t(boxes), 1.7))
    close(bbox_rescale_center(jnp.asarray(boxes), 0.6),
          ref.bbox_rescale(t(boxes), 0.6))
