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
static sampling_ratio) except for rois whose per-axis span exceeds the
largest window variant (aspect ratio > ~20 after level routing): their
sample coords clamp into the window (documented approximation; such boxes
are pathological for the detection configs this serves).

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

# (WH, WW) window variants, preference order (smallest copy first). The
# kernel scratch is (64, 64, C); every variant writes its top-left corner.
VARIANTS = ((8, 8), (16, 16), (32, 32), (16, 64), (64, 16), (64, 64))


def _kernel_factory(shapes, variants, out_size, sr, c, dtype):
    """Build the kernel body for static per-level (H, W) `shapes`."""
    n_lvl = len(shapes)
    n_var = len(variants)
    s_pts = out_size * sr

    def tent(a0_f, lo_f, hi_f, hfull, bin_f, ncols, col0_f):
        """(out, ncols) separable interp+average matrix.

        a0_f: first-sample coordinate (roi start), bin_f: bin size,
        col0_f: window origin, lo_f/hi_f: clamp range inside the window,
        hfull: level extent (for the mmcv outside-[-1, dim] zero rule).
        """
        k = lax.broadcasted_iota(jnp.float32, (s_pts, ncols), 0)
        cell = lax.broadcasted_iota(jnp.float32, (s_pts, ncols), 1) + col0_f
        kb = jnp.floor(k / sr)
        frac = kb + (k - kb * sr + 0.5) / sr
        raw = a0_f + frac * bin_f
        ok = (raw >= -1.0) & (raw <= hfull)
        cc = jnp.clip(raw, lo_f, hi_f)
        w = jnp.maximum(0.0, 1.0 - jnp.abs(cc - cell))
        w = jnp.where(ok, w, 0.0)
        return w.reshape(out_size, sr, ncols).sum(axis=1) * (1.0 / sr)

    def body(lvl_r, var_r, b_r, y0_r, x0_r, y1_r, x1_r, bh_r, bw_r,
             yhi_r, xhi_r, hf_r, wf_r, *refs):
        feat_refs = refs[:n_lvl]
        out_ref = refs[n_lvl]
        win_ref, sem = refs[n_lvl + 1], refs[n_lvl + 2]
        i = pl.program_id(0)
        n = pl.num_programs(0)

        def dma(idx, slot, do_wait):
            l_ = lvl_r[idx]
            v_ = var_r[idx]
            for l in range(n_lvl):
                hl, wl = shapes[l]
                for v, (vh, vw) in enumerate(variants):
                    vh_e, vw_e = min(vh, hl), min(vw, wl)

                    @pl.when((l_ == l) & (v_ == v))
                    def _(l=l, vh_e=vh_e, vw_e=vw_e):
                        cp = pltpu.make_async_copy(
                            feat_refs[l].at[b_r[idx],
                                            pl.ds(y0_r[idx], vh_e),
                                            pl.ds(x0_r[idx], vw_e), :],
                            win_ref.at[slot, :vh_e, :vw_e, :],
                            sem.at[slot])
                        (cp.wait if do_wait else cp.start)()

        @pl.when(i == 0)
        def _():
            dma(i, 0, do_wait=False)

        @pl.when(i + 1 < n)
        def _():
            dma(i + 1, lax.rem(i + 1, 2), do_wait=False)

        slot = lax.rem(i, 2)
        dma(i, slot, do_wait=True)

        y0f = y0_r[i].astype(jnp.float32)
        x0f = x0_r[i].astype(jnp.float32)
        v_ = var_r[i]
        for v, (vh, vw) in enumerate(variants):

            @pl.when(v_ == v)
            def _(vh=vh, vw=vw):
                ay = tent(y1_r[i], y0f, yhi_r[i], hf_r[i], bh_r[i], vh, y0f)
                ax = tent(x1_r[i], x0f, xhi_r[i], wf_r[i], bw_r[i], vw, x0f)
                win = win_ref[slot, :vh, :vw, :]
                tmp = jnp.dot(ay.astype(dtype),
                              win.reshape(vh, vw * c),
                              preferred_element_type=jnp.float32)
                tmp = tmp.reshape(out_size, vw, c)
                res = lax.dot_general(
                    ax, tmp, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (ox, oy, C)
                out_ref[0] = res.transpose(1, 0, 2).astype(dtype)

    return body


def _prep(rois, lvls, strides, shapes, out_size, sr, aligned):
    """Per-roi scalars: window variant, origin, clamp bounds, coords."""
    strides_f = jnp.asarray(strides, jnp.float32)[lvls]
    hs = jnp.asarray([s[0] for s in shapes], jnp.int32)[lvls]
    ws = jnp.asarray([s[1] for s in shapes], jnp.int32)[lvls]
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

    # first variant whose (clamped) extent covers the span, else the last
    var = jnp.full(rois.shape[0], len(VARIANTS) - 1, jnp.int32)
    for v in range(len(VARIANTS) - 1, -1, -1):
        vh, vw = VARIANTS[v]
        vh_e = jnp.minimum(vh, hs)
        vw_e = jnp.minimum(vw, ws)
        fit = ((yn <= vh_e) | (vh_e == hs)) & ((xn <= vw_e) | (vw_e == ws))
        var = jnp.where(fit, v, var)

    vh_sel = jnp.asarray([v[0] for v in VARIANTS], jnp.int32)[var]
    vw_sel = jnp.asarray([v[1] for v in VARIANTS], jnp.int32)[var]
    vh_e = jnp.minimum(vh_sel, hs)
    vw_e = jnp.minimum(vw_sel, ws)
    y0 = jnp.clip(yc0, 0, hs - vh_e)
    x0 = jnp.clip(xc0, 0, ws - vw_e)
    yhi = (y0 + vh_e - 1).astype(jnp.float32)
    xhi = (x0 + vw_e - 1).astype(jnp.float32)
    b = rois[:, 0].astype(jnp.int32)
    return (lvls.astype(jnp.int32), var, b, y0, x0,
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
    scalars = _prep(rois, lvls, strides, shapes, output_size,
                    sampling_ratio, aligned)
    body = _kernel_factory(shapes, VARIANTS, output_size, sampling_ratio,
                           c, dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(r,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY) for _ in feats],
        out_specs=pl.BlockSpec((1, output_size, output_size, c),
                               lambda i, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 64, 64, c), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, output_size, output_size, c),
                                       dtype),
        interpret=interpret,
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
