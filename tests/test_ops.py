import numpy as np
import pytest

import jax.numpy as jnp

from pointtinybenchmark_tpu.ops import (batched_nms, bbox_overlaps,
                                        bbox_overlaps_aligned, grid_sample,
                                        nms, nms_mask, point_sample_pixel,
                                        roi_align)


# ---------------------------------------------------------------- IoU
def _np_iou(b1, b2):
    m, n = len(b1), len(b2)
    out = np.zeros((m, n))
    for i in range(m):
        for j in range(n):
            xx1 = max(b1[i, 0], b2[j, 0]); yy1 = max(b1[i, 1], b2[j, 1])
            xx2 = min(b1[i, 2], b2[j, 2]); yy2 = min(b1[i, 3], b2[j, 3])
            inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
            a1 = (b1[i, 2] - b1[i, 0]) * (b1[i, 3] - b1[i, 1])
            a2 = (b2[j, 2] - b2[j, 0]) * (b2[j, 3] - b2[j, 1])
            out[i, j] = inter / max(a1 + a2 - inter, 1e-6)
    return out


def test_bbox_overlaps_matches_numpy():
    rng = np.random.RandomState(0)
    b1 = rng.rand(13, 4) * 100
    b1[:, 2:] += b1[:, :2] + 1
    b2 = rng.rand(7, 4) * 100
    b2[:, 2:] += b2[:, :2] + 1
    got = np.asarray(bbox_overlaps(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, _np_iou(b1, b2), rtol=1e-5, atol=1e-6)


def test_bbox_overlaps_iof_and_aligned():
    b1 = jnp.asarray([[0., 0., 10., 10.]])
    b2 = jnp.asarray([[0., 0., 5., 10.]])
    iof = bbox_overlaps(b1, b2, mode="iof")
    np.testing.assert_allclose(np.asarray(iof), [[0.5]], atol=1e-6)
    al = bbox_overlaps_aligned(b1, b2)
    np.testing.assert_allclose(np.asarray(al), [0.5], atol=1e-6)


def test_giou_range():
    b1 = jnp.asarray([[0., 0., 10., 10.]])
    b2 = jnp.asarray([[20., 20., 30., 30.]])
    g = np.asarray(bbox_overlaps(b1, b2, mode="giou"))
    assert g[0, 0] < 0  # disjoint boxes have negative GIoU


# ---------------------------------------------------------------- NMS
def _np_greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        ious = _np_iou(boxes[i:i + 1], boxes)[0]
        suppressed |= ious > thr
        suppressed[i] = True
    return keep


def test_nms_matches_greedy_reference():
    rng = np.random.RandomState(1)
    n = 60
    boxes = rng.rand(n, 4) * 50
    boxes[:, 2:] = boxes[:, :2] + 5 + rng.rand(n, 2) * 20
    scores = rng.rand(n).astype(np.float32)
    ref = _np_greedy_nms(boxes, scores, 0.5)
    keep_idx, num = nms(jnp.asarray(boxes, jnp.float32), jnp.asarray(scores), 0.5, max_out=n)
    got = [int(i) for i in np.asarray(keep_idx) if i >= 0]
    assert int(num) == len(ref)
    assert got == ref


def test_nms_fixpoint_matches_greedy():
    from pointtinybenchmark_tpu.ops import nms_fixpoint
    rng = np.random.RandomState(5)
    for seed in range(5):
        rng = np.random.RandomState(seed)
        n = 120
        boxes = rng.rand(n, 4) * 60
        boxes[:, 2:] = boxes[:, :2] + 4 + rng.rand(n, 2) * 25
        scores = rng.rand(n).astype(np.float32)
        ref = _np_greedy_nms(boxes, scores, 0.5)
        keep_idx, num = nms_fixpoint(jnp.asarray(boxes, jnp.float32),
                                     jnp.asarray(scores), 0.5, max_out=n)
        got = [int(i) for i in np.asarray(keep_idx) if i >= 0]
        assert int(num) == len(ref), seed
        assert got == ref, seed


def test_nms_fixpoint_valid_mask():
    from pointtinybenchmark_tpu.ops import nms_fixpoint
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]],
                        jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep, num = nms_fixpoint(boxes, scores, 0.5, max_out=3,
                             valid_mask=jnp.asarray([True, True, False]))
    assert int(num) == 1 and int(keep[0]) == 0


def test_nms_respects_valid_mask_and_max_out():
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    valid = jnp.asarray([True, True, False])
    keep, num = nms(boxes, scores, 0.5, max_out=3, valid_mask=valid)
    assert int(num) == 1 and int(keep[0]) == 0
    keep, num = nms(boxes, scores, 0.5, max_out=1)
    assert int(num) == 1 and int(keep[0]) == 0


def test_batched_nms_classes_dont_interact():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 10, 10]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8])
    same = jnp.asarray([0, 0])
    diff = jnp.asarray([0, 1])
    _, n_same = batched_nms(boxes, scores, same, 0.5, max_out=2)
    _, n_diff = batched_nms(boxes, scores, diff, 0.5, max_out=2)
    assert int(n_same) == 1 and int(n_diff) == 2


def test_nms_mask():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 10, 10], [50, 50, 60, 60]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    m = np.asarray(nms_mask(boxes, scores, 0.5, max_out=3))
    assert m.tolist() == [True, False, True]


# ---------------------------------------------------------------- grid_sample
@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(padding_mode, align_corners):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(2)
    feat = rng.rand(2, 9, 11, 3).astype(np.float32)  # NHWC
    grid = (rng.rand(2, 5, 7, 2).astype(np.float32) * 2.4 - 1.2)  # includes OOB

    want = F.grid_sample(
        torch.from_numpy(feat).permute(0, 3, 1, 2), torch.from_numpy(grid),
        mode="bilinear", padding_mode=padding_mode, align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(grid_sample(jnp.asarray(feat), jnp.asarray(grid),
                                 align_corners=align_corners, padding_mode=padding_mode))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_point_sample_pixel_exact_on_ramp():
    # bilinear interp is exact for linear functions
    h, w = 8, 8
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    feat = np.stack([xx, yy], -1)[None]  # (1, H, W, 2)
    pts = jnp.asarray([[[2.5, 3.25], [0.0, 0.0], [6.9, 1.1]]], jnp.float32)
    out = np.asarray(point_sample_pixel(jnp.asarray(feat), pts))
    np.testing.assert_allclose(out[0], np.asarray(pts[0]), atol=1e-5)


# ---------------------------------------------------------------- roi_align
def test_roi_align_constant_feature():
    feat = jnp.ones((1, 16, 16, 4), jnp.float32) * 3.0
    rois = jnp.asarray([[0, 8, 8, 40, 40]], jnp.float32)  # image coords, scale 1/4
    out = roi_align(feat, rois, spatial_scale=0.25, output_size=7, sampling_ratio=2)
    assert out.shape == (1, 7, 7, 4)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)


def test_roi_align_linear_ramp_exact():
    # On a linear ramp f(x,y)=x, each bin's average equals its center x.
    h, w = 32, 32
    xx = np.mgrid[0:h, 0:w][1].astype(np.float32)
    feat = jnp.asarray(xx[None, :, :, None])
    # roi from x1=4..28 y1=4..28 at scale 1.0
    rois = jnp.asarray([[0, 4, 4, 28, 28]], jnp.float32)
    out = np.asarray(roi_align(feat, rois, 1.0, output_size=4, sampling_ratio=2))[0, :, :, 0]
    # aligned=True: sample coords shift by -0.5; bin width=6; centers at
    # x1-0.5 + (i+0.5)*6 = 3.5 + 3,9,15,21
    want = np.asarray([6.5, 12.5, 18.5, 24.5])
    np.testing.assert_allclose(out[0], want, atol=1e-4)
    np.testing.assert_allclose(out[3], want, atol=1e-4)


def test_roi_align_batch_indexing():
    feat = jnp.stack([jnp.ones((8, 8, 1)), jnp.ones((8, 8, 1)) * 5.0])
    rois = jnp.asarray([[1, 0, 0, 8, 8], [0, 0, 0, 8, 8]], jnp.float32)
    out = np.asarray(roi_align(feat, rois, 1.0, output_size=2, sampling_ratio=1))
    np.testing.assert_allclose(out[0], 5.0, atol=1e-5)
    np.testing.assert_allclose(out[1], 1.0, atol=1e-5)


def test_pallas_suppression_matrix_interpret():
    """Pallas NMS-suppression kernel vs XLA (interpreter mode on CPU)."""
    from pointtinybenchmark_tpu.ops.pallas_kernels import (
        iou_suppression_matrix)
    rng = np.random.RandomState(0)
    n = 256
    boxes = rng.rand(n, 4).astype(np.float32) * 100
    boxes[:, 2:] = boxes[:, :2] + 5 + rng.rand(n, 2).astype(np.float32) * 30
    got = np.asarray(iou_suppression_matrix(jnp.asarray(boxes), 0.5,
                                            interpret=True))
    want = np.asarray(bbox_overlaps(jnp.asarray(boxes),
                                    jnp.asarray(boxes))) > 0.5
    assert (got == want).all()


def test_carafe_center_tap_is_nearest_upsample():
    from pointtinybenchmark_tpu.ops.carafe import carafe
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 4, 6, 8).astype(np.float32))
    k, g, s = 5, 2, 2
    masks = np.zeros((2, 8, 12, g * k * k), np.float32)
    masks[..., (k * k) // 2::k * k] = 1.0  # one-hot center tap, every group
    out = np.asarray(carafe(x, jnp.asarray(masks), k_up=k, group=g, scale=s))
    want = np.repeat(np.repeat(np.asarray(x), s, 1), s, 2)
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_carafe_uniform_masks_average_interior():
    from pointtinybenchmark_tpu.ops.carafe import carafe
    x = jnp.ones((1, 6, 6, 4), jnp.float32)
    k = 3
    masks = jnp.full((1, 12, 12, k * k), 1.0 / (k * k))
    out = np.asarray(carafe(x, masks, k_up=k, group=1, scale=2))
    # interior output pixels see a full 3x3 ones neighbourhood -> exactly 1
    np.testing.assert_allclose(out[0, 2:-2, 2:-2], 1.0, atol=1e-6)


def test_carafe_pack_shapes_and_grad():
    import jax
    from pointtinybenchmark_tpu.ops.carafe import CARAFEPack
    mod = CARAFEPack(channels=16, scale_factor=2)
    x = jnp.ones((1, 5, 7, 16), jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == (1, 10, 14, 16)
    g = jax.grad(lambda p: mod.apply(p, x).sum())(params)
    assert jnp.isfinite(
        g["params"]["content_encoder"]["kernel"]).all()


def test_fpn_carafe_output_shapes():
    import jax
    from pointtinybenchmark_tpu.models.necks.fpn_carafe import FPN_CARAFE
    neck = FPN_CARAFE(in_channels=(8, 16, 32), out_channels=8, num_outs=5)
    feats = [jnp.ones((1, 32, 32, 8)), jnp.ones((1, 16, 16, 16)),
             jnp.ones((1, 8, 8, 32))]
    params = neck.init(jax.random.PRNGKey(0), feats)
    outs = neck.apply(params, feats)
    assert [o.shape[1] for o in outs] == [32, 16, 8, 4, 2]


def test_roi_align_multilevel_matches_select_formulation():
    """roi_align_multilevel (single gather from the assigned level) must be
    numerically identical to align-on-every-level + one-hot select."""
    import jax.numpy as jnp
    import numpy as np
    from pointtinybenchmark_tpu.models.roi_heads.roi_extractor import (
        map_roi_levels)
    from pointtinybenchmark_tpu.ops.roi_align import (roi_align,
                                                      roi_align_multilevel)

    rng = np.random.RandomState(0)
    B, C = 2, 8
    strides = (4, 8, 16, 32)
    feats = tuple(jnp.asarray(rng.rand(B, 64 // s * 4, 80 // s * 4, C)
                              .astype(np.float32)) for s in strides)
    R = 40
    xy = rng.rand(R, 2) * 200
    wh = rng.rand(R, 2) * 250 + 4   # spans all pyramid levels
    rois = np.concatenate([rng.randint(0, B, (R, 1)).astype(np.float32),
                           xy, xy + wh], axis=1).astype(np.float32)
    rois = jnp.asarray(rois)
    lvls = map_roi_levels(rois, len(strides))
    got = roi_align_multilevel(feats, rois, lvls, strides, 7, 2)
    want = None
    for i, (f, s) in enumerate(zip(feats, strides)):
        r = roi_align(f, rois, 1.0 / s, 7, 2)
        sel = (lvls == i).astype(r.dtype)[:, None, None, None]
        want = r * sel if want is None else want + r * sel
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    assert len(np.unique(np.asarray(lvls))) > 1  # test spans levels


def test_roi_align_multilevel_boundary_rois():
    """RoIs hugging the bottom/right image edge: sample points clamp to the
    last row/col of the coarsest level (end of the flattened buffer) —
    exactly where a clipped 2x2 slice gather would shift its start and
    corrupt the nonzero-weight tap."""
    import jax.numpy as jnp
    import numpy as np
    from pointtinybenchmark_tpu.models.roi_heads.roi_extractor import (
        map_roi_levels)
    from pointtinybenchmark_tpu.ops.roi_align import (roi_align,
                                                      roi_align_multilevel)

    rng = np.random.RandomState(1)
    B, C = 2, 4
    strides = (4, 8, 16, 32)
    H, W = 64, 80  # image 256 x 320
    feats = tuple(jnp.asarray(
        rng.rand(B, H // (s // 4), W // (s // 4), C).astype(np.float32))
        for s in strides)
    img_h, img_w = H * 4, W * 4
    # Huge rois pinned to the bottom-right corner (coarsest level), plus
    # rois extending past the image edge, for the LAST batch index — the
    # very end of the flattened multi-level buffer.
    rois = jnp.asarray(np.array([
        [B - 1, img_w - 300, img_h - 260, img_w, img_h],
        [B - 1, img_w - 300, img_h - 260, img_w + 40, img_h + 40],
        [B - 1, img_w - 8, img_h - 8, img_w - 1, img_h - 1],
        [0, img_w - 290, img_h - 280, img_w, img_h],
    ], dtype=np.float32))
    lvls = map_roi_levels(rois, len(strides))
    got = roi_align_multilevel(feats, rois, lvls, strides, 7, 2)
    want = None
    for i, (f, s) in enumerate(zip(feats, strides)):
        r = roi_align(f, rois, 1.0 / s, 7, 2)
        sel = (lvls == i).astype(r.dtype)[:, None, None, None]
        want = r * sel if want is None else want + r * sel
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_nms_blocked_exact_vs_pick_loop():
    """nms_blocked (large-N global tile merge path) produces the EXACT
    sequential greedy keep-set: cross-block suppression from kept boxes +
    intra-block fixpoint == pick-loop, including multi-block chains and
    non-multiple-of-block sizes."""
    import numpy as np

    from pointtinybenchmark_tpu.ops.nms import nms, nms_blocked

    rng = np.random.RandomState(0)
    for n in (300, 4097, 5000):
        c = rng.rand(n, 2) * 600
        wh = rng.rand(n, 2) * 60 + 4
        boxes = np.concatenate([c, c + wh], -1).astype(np.float32)
        scores = rng.rand(n).astype(np.float32)
        valid = rng.rand(n) > 0.1
        k1, n1 = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 600,
                     jnp.asarray(valid))
        k2, n2 = nms_blocked(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                             600, jnp.asarray(valid))
        assert int(n1) == int(n2)
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    # dense overlapping cluster: long suppression chains across blocks
    n = 4500
    c = rng.rand(n, 2) * 40
    wh = rng.rand(n, 2) * 30 + 10
    boxes = np.concatenate([c, c + wh], -1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    k1, n1 = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.6, 400)
    k2, n2 = nms_blocked(jnp.asarray(boxes), jnp.asarray(scores), 0.6, 400)
    assert int(n1) == int(n2)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_batched_nms_large_classwise():
    """batched_nms_large (un-vmapped global-merge path) == batched_nms
    keep-set with class separation at large N."""
    import numpy as np

    from pointtinybenchmark_tpu.ops.nms import batched_nms, batched_nms_large

    rng = np.random.RandomState(1)
    n = 9000
    c = rng.rand(n, 2) * 500
    wh = rng.rand(n, 2) * 50 + 5
    boxes = jnp.asarray(np.concatenate([c, c + wh], -1), np.float32)
    scores = jnp.asarray(rng.rand(n), np.float32)
    labels = jnp.asarray(rng.randint(0, 3, n))
    valid = jnp.asarray(rng.rand(n) > 0.15)
    k1, n1 = batched_nms(boxes, scores, labels, 0.5, 800, valid_mask=valid)
    k2, n2 = batched_nms_large(boxes, scores, labels, 0.5, 800,
                               valid_mask=valid)
    assert int(n1) == int(n2)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_roi_align_pallas_interpret_golden():
    """Pallas window-DMA RoIAlign (ops/roi_align_pallas.py) vs the XLA
    gather formulation in interpret mode: same mmcv semantics across level
    routing, window variants, and borderline rois. (Compiled-mode parity
    was verified on the real chip: max diff 7e-7 at R=256, 4 levels.)"""
    from pointtinybenchmark_tpu.ops.roi_align import roi_align_multilevel
    from pointtinybenchmark_tpu.ops.roi_align_pallas import (
        roi_align_multilevel_pallas)

    rng = np.random.RandomState(0)
    strides = (4, 8)
    shapes = [(32, 40), (16, 20)]
    c = 8
    feats = tuple(jnp.asarray(rng.randn(2, h, w, c), jnp.float32)
                  for h, w in shapes)
    r = 8
    b = rng.randint(0, 2, r).astype(np.float32)
    x1 = rng.rand(r) * 120 - 4          # includes off-edge starts
    y1 = rng.rand(r) * 100 - 4
    w = rng.rand(r) * 80 + 2
    h = rng.rand(r) * 80 + 2
    rois = jnp.asarray(np.stack([b, x1, y1, x1 + w, y1 + h], -1), np.float32)
    lvl = np.clip(np.floor(np.log2(np.sqrt(w * h) / 56 + 1e-6)), 0, 1)
    lvls = jnp.asarray(lvl.astype(np.int32))

    ref = roi_align_multilevel(feats, rois, lvls, strides, 7, 2, True)
    got = roi_align_multilevel_pallas(feats, rois, lvls, strides, 7, 2,
                                      True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)

    import jax

    # gradients flow through the XLA VJP
    def loss(f):
        return jnp.sum(roi_align_multilevel_pallas(
            f, rois, lvls, strides, 7, 2, True, interpret=True) ** 2)

    g = jax.grad(loss)(feats)
    gref = jax.grad(lambda f: jnp.sum(roi_align_multilevel(
        f, rois, lvls, strides, 7, 2, True) ** 2))(feats)
    for a, b_ in zip(g, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_roi_align_pallas_big_windows():
    """Extreme-aspect rois whose span exceeds the 32-cell prefetch windows
    route through the single-slot BIG variants ((40, 64) wide / (64, 40)
    tall, inline DMA). Interpret-mode golden vs the XLA formulation;
    compiled-mode was verified on the real chip (0/512 divergent rois,
    max err 5e-7 — was 23/512 before the big variants existed)."""
    from pointtinybenchmark_tpu.ops.roi_align import roi_align_multilevel
    from pointtinybenchmark_tpu.ops import roi_align_pallas as rap

    rng = np.random.RandomState(1)
    strides = (4, 8)
    shapes = [(72, 80), (36, 40)]
    c = 8
    feats = tuple(jnp.asarray(rng.randn(2, h, w, c), jnp.float32)
                  for h, w in shapes)
    # wide (x-span ~40-53 cells), tall (y-span ~40-53), and one square
    rois_np = np.array([
        [0, 12.3, 40.1, 12.3 + 190.0, 40.1 + 45.0],
        [1, 30.7, 8.9, 30.7 + 205.5, 8.9 + 38.0],
        [0, 50.2, 15.4, 50.2 + 44.0, 15.4 + 198.7],
        [1, 8.1, 30.0, 8.1 + 40.0, 30.0 + 186.0],
        [0, 20.0, 20.0, 20.0 + 90.0, 20.0 + 90.0],
    ], np.float32)
    rois = jnp.asarray(rois_np)
    lvls = jnp.zeros((5,), jnp.int32)

    # the prep must route rows 0-3 to the big variants
    n_small = rap._n_small(jnp.float32)
    variants = rap._variants_for(jnp.float32)
    sc = rap._prep(rois, lvls, strides, shapes, 7, 2, True, variants,
                   n_small, shapes, 8)
    var = np.asarray(sc[1])
    assert (var[:4] >= n_small).all(), var
    assert var[4] < n_small, var

    ref = roi_align_multilevel(feats, rois, lvls, strides, 7, 2, True)
    got = rap.roi_align_multilevel_pallas(feats, rois, lvls, strides, 7, 2,
                                          True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5,
                               rtol=1e-5)


# ---------------------------------------------------------------- take_rows
def test_take_rows_matches_plain_indexing():
    """One-hot MXU gather == table[idx] exactly (float coords, int labels,
    bool masks), incl. batched and vmapped forms."""
    import jax
    from pointtinybenchmark_tpu.ops import take_rows

    rng = np.random.RandomState(0)
    g, n = 50, 4096
    table_f = jnp.asarray(rng.rand(g, 4).astype(np.float32) * 640.0)
    table_i = jnp.asarray(rng.randint(0, 80, size=(g,)), jnp.int32)
    table_b = jnp.asarray(rng.rand(g) < 0.5)
    idx = jnp.asarray(rng.randint(0, g, size=(n,)), jnp.int32)

    np.testing.assert_array_equal(np.asarray(take_rows(table_f, idx)),
                                  np.asarray(table_f[idx]))
    np.testing.assert_array_equal(np.asarray(take_rows(table_i, idx)),
                                  np.asarray(table_i[idx]))
    np.testing.assert_array_equal(np.asarray(take_rows(table_b, idx)),
                                  np.asarray(table_b[idx]))

    # batched (B, G, K) with (B, N) idx
    b = 3
    bt = jnp.asarray(rng.rand(b, g, 4).astype(np.float32) * 1e3)
    bi = jnp.asarray(rng.randint(0, g, size=(b, n)), jnp.int32)
    ref = np.stack([np.asarray(bt[k])[np.asarray(bi[k])] for k in range(b)])
    np.testing.assert_array_equal(np.asarray(take_rows(bt, bi)), ref)

    # under vmap (the assigner/target-builder call pattern)
    vm = jax.vmap(take_rows)(bt, bi)
    np.testing.assert_array_equal(np.asarray(vm), ref)

    # big-table fallback path (plain take_along_axis)
    g2 = 2048
    big_f = jnp.asarray(rng.rand(g2, 4).astype(np.float32))
    big_v = jnp.asarray(rng.rand(g2).astype(np.float32))
    idx2 = jnp.asarray(rng.randint(0, g2, size=(n,)), jnp.int32)
    np.testing.assert_array_equal(np.asarray(take_rows(big_f, idx2)),
                                  np.asarray(big_f[idx2]))
    np.testing.assert_array_equal(np.asarray(take_rows(big_v, idx2)),
                                  np.asarray(big_v[idx2]))


def test_nms_vblocked_exact_vs_pick_loop():
    """nms_vblocked (the vmapped per-tile decode path above
    FIXPOINT_MAX_N) produces the EXACT sequential greedy keep-set AND
    order: per-round top-k picks + intra-round fixpoint + pool
    suppression == pick-loop, incl. ties, valid masks, max_out overflow
    inside a round, and execution under vmap."""
    import numpy as np

    import jax

    from pointtinybenchmark_tpu.ops.nms import nms, nms_vblocked

    rng = np.random.RandomState(7)
    for n, max_out, block in ((300, 100, 128), (5000, 600, 128),
                              (4500, 400, 64)):
        c = rng.rand(n, 2) * 500
        wh = rng.rand(n, 2) * 50 + 4
        boxes = np.concatenate([c, c + wh], -1).astype(np.float32)
        # quantized scores force ties
        scores = (rng.randint(0, 200, n) / 200.0).astype(np.float32)
        valid = rng.rand(n) > 0.1
        k1, n1 = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                     max_out, jnp.asarray(valid))
        k2, n2 = nms_vblocked(jnp.asarray(boxes), jnp.asarray(scores),
                              0.5, max_out, jnp.asarray(valid),
                              block=block)
        assert int(n1) == int(n2)
        np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    # dense cluster: many keeps per round, max_out hit mid-round
    n = 5000
    c = rng.rand(n, 2) * 2000
    wh = rng.rand(n, 2) * 20 + 4
    boxes = np.concatenate([c, c + wh], -1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    k1, n1 = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 150)
    k2, n2 = nms_vblocked(jnp.asarray(boxes), jnp.asarray(scores), 0.5,
                          150)
    assert int(n1) == int(n2) == 150
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    # under vmap (the protocol per-tile call shape)
    b = 6
    bb = np.stack([boxes[i::b][:800] for i in range(b)])
    ss = np.stack([scores[i::b][:800] for i in range(b)])
    kv, nv = jax.vmap(lambda bx, sc: nms_vblocked(bx, sc, 0.5, 200))(
        jnp.asarray(bb), jnp.asarray(ss))
    for i in range(b):
        k1, n1 = nms(jnp.asarray(bb[i]), jnp.asarray(ss[i]), 0.5, 200)
        assert int(nv[i]) == int(n1)
        np.testing.assert_array_equal(np.asarray(kv[i]), np.asarray(k1))
