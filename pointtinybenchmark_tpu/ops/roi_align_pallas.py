"""Pallas TPU RoIAlign: per-roi window DMA + separable MXU interpolation.

The XLA gather formulation (ops/roi_align.py::roi_align_multilevel) fetches
4 bilinear-tap rows per sample point — R*S*S*4 random (1, C) row gathers
from HBM. Random 512-byte fetches run far below HBM bandwidth (measured
~70 GB/s effective on v5e at R=12k, S=14, C=256 — PARITY.md round-2 gather
study). This kernel replaces them with ONE contiguous window DMA per roi
plus two small matmuls, exploiting two structural facts:

1. SingleRoIExtractor's level routing (mmdet single_level_roi_extractor.py
   map_roi_levels, finest_scale=56) bounds every roi's footprint at its
   assigned level: sqrt(area)/stride < 2*finest/stride_0 ~ 28 cells, so a
   roi's whole bilinear support fits a small contiguous window (a static
   per-roi window VARIANT is picked by actual span — tiny TinyPerson rois
   copy 8x8 windows, not 64x64).
2. Bilinear interpolation + the sr x sr bin average are SEPARABLE: with
   tent-weight matrices Ay (out, WH) and Ax (out, WW) built from the roi
   coords, the RoIAlign output is Ay @ window @ Ax^T — two dense matmuls
   on the MXU instead of 4*S*S gathers. Tent weights are exactly the
   mmcv bilinear weights (incl. border clamping), and any window cell at
   distance >= 1 from every clamped sample coordinate gets weight 0, so
   garbage cells beyond the DMA'd extent contribute exactly zero — no
   masking or scratch zeroing needed.

Semantics match roi_align_multilevel (mmcv RoIAlign aligned=True/False,
static sampling_ratio) except for rois whose span exceeds the largest
window variant (64 cells long axis / 40 short): their sample coords clamp
into the window (documented approximation). With map_roi_levels routing
(sqrt(area)/stride < 28 cells at every level) that needs aspect ratio
beyond ~4.4 at the max in-level scale — absent from person/COCO-shaped
boxes; exact everywhere the golden tests and the TPU parity drive probe.

Used for the forward pass only; the backward pass falls back to the XLA
gather formulation's VJP (ops/roi_align.py) via custom_vjp.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

try:  # pltpu imports fine on CPU-only hosts; guard for safety
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from .roi_align import roi_align_multilevel

__all__ = ["roi_align_multilevel_pallas"]

# (WH, WW) window variants, preference order (smallest copy first). SMALL
# variants share a double-buffered (2, 32, 32, C) scratch (cross-iteration
# DMA prefetch); the two BIG variants (wide / tall) each own a single-slot
# scratch and are DMA'd inline at compute time — no prefetch, so
# consecutive big rois serialize, which is fine because map_roi_levels
# routing makes spans > 32 cells rare (near-square rois stay below 30).
# DMA slice extents must be sublane-tile aligned: 8 for f32, 16 for bf16
# (Mosaic tiling table), so bf16 drops the (8, 8) variant and rounds the
# big short axis up to 48. Total VMEM at C=256 f32: 2.1 MB small + 2×2.6 MB
# big ~ 7.3 MB, inside the ~16 MB budget where (2, 64, 64, C) alone blows
# it.
VARIANTS = ((8, 8), (16, 16), (16, 32), (32, 16), (32, 32))
BIG_VARIANTS = ((40, 64), (64, 40))
VARIANTS_BF16 = ((16, 16), (16, 32), (32, 16), (32, 32))
BIG_VARIANTS_BF16 = ((48, 64), (64, 48))


def _variants_for(dtype) -> tuple:
    if dtype == jnp.bfloat16:
        return VARIANTS_BF16 + BIG_VARIANTS_BF16
    return VARIANTS + BIG_VARIANTS


def _n_small(dtype) -> int:
    return len(VARIANTS_BF16 if dtype == jnp.bfloat16 else VARIANTS)


def _kernel_factory(shapes, variants, n_small, out_size, sr, c, dtype,
                    align):
    """Build the kernel body for static per-level (H, W) `shapes`.

    `variants[:n_small]` share the double-buffered prefetch scratch;
    `variants[n_small:]` are the big single-slot wide/tall windows.
    """
    n_lvl = len(shapes)
    small = variants[:n_small]
    big = variants[n_small:]

    def tent(a0_f, lo_f, hi_f, hfull, bin_f, cell):
        """(out, L) separable interp+average matrix over cell grid `cell`.

        a0_f: first-sample coordinate (roi start), bin_f: bin size,
        lo_f/hi_f: clamp range inside the window, hfull: level extent (for
        the mmcv outside-[-1, dim] zero rule). `cell` is a (1, L) float row
        of feature-cell coordinates — a plain ramp for the separable form,
        or a //-or-% iota pattern for the fused (vh*vw)-lane form. The
        sr-sample average is unrolled (sr is tiny and static) so every
        intermediate stays 2D for Mosaic.
        """
        ncols = cell.shape[-1]
        # Mosaic only supports integer iota — build float ramps via astype
        ob = lax.broadcasted_iota(
            jnp.int32, (out_size, ncols), 0).astype(jnp.float32)
        acc = jnp.zeros((out_size, ncols), jnp.float32)
        for iy in range(sr):
            raw = a0_f + (ob + (iy + 0.5) / sr) * bin_f
            ok = (raw >= -1.0) & (raw <= hfull)
            cc = jnp.clip(raw, lo_f, hi_f)
            w = jnp.maximum(0.0, 1.0 - jnp.abs(cc - cell))
            acc = acc + jnp.where(ok, w, 0.0)
        return acc * (1.0 / sr)

    # f32 features must not round through the MXU's default bf16 passes
    # (the XLA formulation computes in full f32); bf16 features keep the
    # fast single-pass (accumulation is f32 via preferred_element_type).
    prec = (lax.Precision.HIGHEST if dtype == jnp.float32
            else lax.Precision.DEFAULT)

    def body(lvl_r, var_r, b_r, y0_r, x0t_r, y1_r, x1_r, bh_r, bw_r,
             yhi_r, xhi_r, hf_r, wf_r, *refs):
        feat_refs = refs[:n_lvl]
        out_ref = refs[n_lvl]
        win_ref, sem = refs[n_lvl + 1], refs[n_lvl + 2]
        big_refs = refs[n_lvl + 3:n_lvl + 3 + len(big)]
        big_sems = refs[n_lvl + 3 + len(big):n_lvl + 3 + 2 * len(big)]
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def src_slice(idx, l, vh_e, vw_e):
            return feat_refs[l].at[b_r[idx],
                                   pl.ds(y0_r[idx], vh_e),
                                   pl.ds(x0t_r[idx] * align, vw_e),
                                   :]

        def dma_small(idx, slot, do_wait):
            l_ = lvl_r[idx]
            v_ = var_r[idx]
            for l in range(n_lvl):
                hl, wl = shapes[l]
                for v, (vh, vw) in enumerate(small):
                    vh_e, vw_e = min(vh, hl), min(vw, wl)

                    @pl.when((l_ == l) & (v_ == v))
                    def _(l=l, vh_e=vh_e, vw_e=vw_e):
                        cp = pltpu.make_async_copy(
                            src_slice(idx, l, vh_e, vw_e),
                            win_ref.at[slot, :vh_e, :vw_e, :],
                            sem.at[slot])
                        (cp.wait if do_wait else cp.start)()

        def dma_big(idx, g):
            """Synchronous copy into big single-slot scratch `g`."""
            l_ = lvl_r[idx]
            vh, vw = big[g]
            for l in range(n_lvl):
                hl, wl = shapes[l]
                vh_e, vw_e = min(vh, hl), min(vw, wl)

                @pl.when(l_ == l)
                def _(l=l, vh_e=vh_e, vw_e=vw_e):
                    cp = pltpu.make_async_copy(
                        src_slice(idx, l, vh_e, vw_e),
                        big_refs[g].at[:vh_e, :vw_e, :],
                        big_sems[g])
                    cp.start()
                    cp.wait()

        @pl.when(i == 0)
        def _():
            dma_small(i, 0, do_wait=False)

        @pl.when(i + 1 < n)
        def _():
            dma_small(i + 1, lax.rem(i + 1, 2), do_wait=False)

        slot = lax.rem(i, 2)
        dma_small(i, slot, do_wait=True)

        y0f = y0_r[i].astype(jnp.float32)
        x0f = (x0t_r[i] * align).astype(jnp.float32)
        v_ = var_r[i]

        def emit(winflat, vh, vw):
            # Mosaic rejects every lane-splitting reshape, so the
            # separable two-matmul form ((out,vh)@(vh,vw*c) then a
            # (out,vw,c) split) cannot lower. Instead flatten the window
            # to (vh*vw, C) (leading-dim merge — legal) and build FUSED
            # tent rows over the vh*vw lane axis via // and % iota
            # patterns: row oy of the y-tent times the x-tent matrix is
            # the exact separable weight kron'd over (h, w). One small
            # MXU matmul per output row (out_size is tiny and static).
            q = lax.broadcasted_iota(jnp.int32, (1, vh * vw), 1)
            cell_y = (q // vw).astype(jnp.float32) + y0f
            cell_x = (q % vw).astype(jnp.float32) + x0f
            ay = tent(y1_r[i], y0f, yhi_r[i], hf_r[i], bh_r[i], cell_y)
            ax = tent(x1_r[i], x0f, xhi_r[i], wf_r[i], bw_r[i], cell_x)
            for oy in range(out_size):
                m = (ay[oy:oy + 1, :] * ax).astype(dtype)  # (out, vh*vw)
                res = jnp.dot(m, winflat,
                              preferred_element_type=jnp.float32,
                              precision=prec)              # (ox, C)
                out_ref[0, oy] = res.astype(dtype)

        for v, (vh, vw) in enumerate(small):

            @pl.when(v_ == v)
            def _(vh=vh, vw=vw):
                emit(win_ref[slot, :vh, :vw, :].reshape(vh * vw, c), vh, vw)

        for g, (vh, vw) in enumerate(big):

            @pl.when(v_ == n_small + g)
            def _(g=g, vh=vh, vw=vw):
                dma_big(i, g)
                emit(big_refs[g][:vh, :vw, :].reshape(vh * vw, c), vh, vw)

    return body


def _prep(rois, lvls, strides, shapes, out_size, sr, aligned, variants,
          n_small, shapes_pad, align):
    """Per-roi scalars: window variant, origin, clamp bounds, coords.

    `align`: the Mosaic sublane tile for the feature dtype (8 f32 /
    16 bf16) — the dynamic x window origin must be provably divisible by
    it, so x origins round down to multiples and the variant-fit test
    budgets the alignment slack. `shapes_pad` are the W-padded extents the
    kernel actually slices (see _pallas_fwd); clamp bounds stay at the
    ORIGINAL extents so padded columns get exactly zero tent weight.
    """
    strides_f = jnp.asarray(strides, jnp.float32)[lvls]
    hs = jnp.asarray([s[0] for s in shapes], jnp.int32)[lvls]
    ws = jnp.asarray([s[1] for s in shapes], jnp.int32)[lvls]
    ws_pad = jnp.asarray([s[1] for s in shapes_pad], jnp.int32)[lvls]
    hf = hs.astype(jnp.float32)
    wf = ws.astype(jnp.float32)
    off = 0.5 if aligned else 0.0
    x1 = rois[:, 1] / strides_f - off
    y1 = rois[:, 2] / strides_f - off
    x2 = rois[:, 3] / strides_f - off
    y2 = rois[:, 4] / strides_f - off
    roi_w, roi_h = x2 - x1, y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w, bin_h = roi_w / out_size, roi_h / out_size

    frac0 = 0.5 / sr
    frac_last = (out_size - 1) + (sr - 0.5) / sr

    def axis(a1, bin_a, dimf):
        first = jnp.clip(a1 + frac0 * bin_a, 0.0, dimf - 1.0)
        last = jnp.clip(a1 + frac_last * bin_a, 0.0, dimf - 1.0)
        c0 = jnp.floor(first).astype(jnp.int32)
        ncell = jnp.floor(last).astype(jnp.int32) + 2 - c0  # cells needed
        return c0, ncell

    yc0, yn = axis(y1, bin_h, hf)
    xc0, xn = axis(x1, bin_w, wf)

    # x window origins round down to the sublane tile; budget the slack
    x0a = (xc0 // align) * align
    xslack = xc0 - x0a

    # first variant whose (clamped) extent covers the span; when nothing
    # fits (span > the largest window — the documented clamping
    # approximation), fall back to the big variant covering the longer axis
    i_wide, i_tall = n_small, n_small + 1
    var = jnp.where(xn + xslack >= yn, i_wide, i_tall).astype(jnp.int32)
    for v in range(len(variants) - 1, -1, -1):
        vh, vw = variants[v]
        vh_e = jnp.minimum(vh, hs)
        vw_e = jnp.minimum(vw, ws_pad)
        fit = (((yn <= vh_e) | (vh_e == hs))
               & ((xn + xslack <= vw_e) | (vw_e == ws_pad)))
        var = jnp.where(fit, v, var)

    vh_sel = jnp.asarray([v[0] for v in variants], jnp.int32)[var]
    vw_sel = jnp.asarray([v[1] for v in variants], jnp.int32)[var]
    vh_e = jnp.minimum(vh_sel, hs)
    vw_e = jnp.minimum(vw_sel, ws_pad)
    y0 = jnp.clip(yc0, 0, hs - vh_e)
    # ws_pad and vw_e are both multiples of `align`, so the clamp bound is
    # too; pass x0 as a TILE index (x0 // align) — the kernel rebuilds
    # x0 = x0t * align so Mosaic can PROVE the slice offset divisible
    x0 = jnp.clip(x0a, 0, ws_pad - vw_e)
    x0t = x0 // align
    yhi = (y0 + vh_e - 1).astype(jnp.float32)
    xhi = jnp.minimum((x0 + vw_e - 1).astype(jnp.float32), wf - 1.0)
    b = rois[:, 0].astype(jnp.int32)
    return (lvls.astype(jnp.int32), var, b, y0, x0t,
            y1.astype(jnp.float32), x1.astype(jnp.float32),
            bin_h.astype(jnp.float32), bin_w.astype(jnp.float32),
            yhi, xhi, hf, wf)


@partial(jax.jit, static_argnames=("strides", "output_size",
                                   "sampling_ratio", "aligned", "interpret"))
def _pallas_fwd(feats, rois, lvls, strides, output_size, sampling_ratio,
                aligned, interpret=False):
    shapes = tuple((f.shape[1], f.shape[2]) for f in feats)
    c = feats[0].shape[-1]
    dtype = feats[0].dtype
    r = rois.shape[0]
    variants = _variants_for(dtype)
    # sublane tile: dynamic x window origins must be divisible by it, and
    # each level's W must be a multiple so the aligned clamp bound is too
    align = 16 if dtype == jnp.bfloat16 else 8
    feats = tuple(
        f if f.shape[2] % align == 0 else jnp.pad(
            f, ((0, 0), (0, 0), (0, align - f.shape[2] % align), (0, 0)))
        for f in feats)
    shapes_pad = tuple((f.shape[1], f.shape[2]) for f in feats)
    n_small = _n_small(dtype)
    small, big = variants[:n_small], variants[n_small:]
    scalars = _prep(rois, lvls, strides, shapes, output_size,
                    sampling_ratio, aligned, variants, n_small,
                    shapes_pad, align)
    body = _kernel_factory(shapes_pad, variants, n_small, output_size,
                           sampling_ratio, c, dtype, align)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(r,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in feats],
        out_specs=pl.BlockSpec((1, output_size, output_size, c),
                               lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=(
            [pltpu.VMEM((2, max(v[0] for v in small),
                         max(v[1] for v in small), c), dtype),
             pltpu.SemaphoreType.DMA((2,))]
            + [pltpu.VMEM((vh, vw, c), dtype) for vh, vw in big]
            + [pltpu.SemaphoreType.DMA for _ in big]
        ),
    )
    # the scratch set (2.1 MB small + 2 big single-slots) plus Mosaic's
    # per-branch stack temporaries exceeds the default 16 MB scoped-vmem
    # budget; 24 MB compiles and runs clean on v5e (verified vs the XLA
    # formulation at R=512: max err 5e-7 incl. big-window rois)
    params = {} if interpret else {
        "compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=24 * 1024 * 1024)}
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, output_size, output_size, c),
                                       dtype),
        interpret=interpret,
        **params,
    )(*scalars, *feats)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def roi_align_multilevel_pallas(feats, rois, lvls, strides, output_size=7,
                                sampling_ratio=2, aligned=True,
                                interpret=False):
    """Drop-in for roi_align_multilevel (same args + `interpret` for CPU
    tests); forward = Pallas window-DMA kernel, backward = the XLA gather
    formulation's VJP."""
    return _pallas_fwd(tuple(feats), rois, lvls, strides, output_size,
                       sampling_ratio, aligned, interpret)


def _vjp_fwd(feats, rois, lvls, strides, output_size, sampling_ratio,
             aligned, interpret):
    out = _pallas_fwd(tuple(feats), rois, lvls, strides, output_size,
                      sampling_ratio, aligned, interpret)
    return out, (tuple(feats), rois, lvls)


def _vjp_bwd(strides, output_size, sampling_ratio, aligned, interpret,
             res, g):
    feats, rois, lvls = res
    _, vjp = jax.vjp(
        lambda f: roi_align_multilevel(f, rois, lvls, strides, output_size,
                                       sampling_ratio, aligned), feats)
    (d_feats,) = vjp(g)
    zero_i = np.zeros(lvls.shape, jax.dtypes.float0)
    return d_feats, jnp.zeros_like(rois), zero_i


roi_align_multilevel_pallas.defvjp(_vjp_fwd, _vjp_bwd)
