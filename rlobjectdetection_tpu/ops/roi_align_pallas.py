"""Pallas RoIAlign forward: bilinear sampling as one MXU contraction.

The XLA path (ops/roi_align.py) gathers 4·A² individual pixel rows per roi
(65k gather rows at bs2/R=256) — latency-bound on TPU. Here the single-sample
bilinear (roi_align_kernel.cu:40-67) is recast as a sparse-matrix product

    out[r·A·A + py·A + px, :] = K[m, h·W + w] @ F_b[h·W + w, :]

where each K row holds the sample's 4 bilinear corner weights. Per grid step
the kernel handles GROUP rois (GROUP·A² sample rows; GROUP=4 → 256 = two full
MXU sublane tiles):

  * the image's flattened feature map [H·W, C] is DMA'd HBM→VMEM once per
    image (the grid walks rois in image order; the copy is skipped while the
    image index repeats),
  * K is built in-register from per-sample (y0, x0, weight) columns with
    broadcasted-iota comparisons — no gathers, reshapes, or transposes,
  * one [128, H·W] @ [H·W, C] bf16 matmul produces the 128 samples.

Out-of-bounds samples are zeroed through zero weights (the cells the CUDA
kernel zeroes). Backward stays the XLA gather-transpose via custom_vjp.
Weights pass through bf16, so outputs differ from the f32 XLA path by ~0.4%
relative — well inside detection tolerance (tests pin 1e-2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 4  # rois per grid step; GROUP·A² = 256 sample rows


def _sample_columns(rois, h, w, aligned, spatial_scale):
    """Host-side prep: per-sample corner indices/weights, each [R·A², 1] f32,
    plus the per-roi image index [R] i32.

    y0/fy depend only on (roi, py) and x0/fx only on (roi, px); they are
    broadcast to the full A×A sample grid so the kernel sees plain columns.
    """
    a = aligned
    x1 = rois[:, 1] * spatial_scale
    y1 = rois[:, 2] * spatial_scale
    x2 = rois[:, 3] * spatial_scale
    y2 = rois[:, 4] * spatial_scale
    bin_h = jnp.maximum(y2 - y1 + 1.0, 0.0) / (a - 1.0)
    bin_w = jnp.maximum(x2 - x1 + 1.0, 0.0) / (a - 1.0)

    grid = jnp.arange(a, dtype=jnp.float32)
    ys = grid[None, :] * bin_h[:, None] + y1[:, None]          # [R, A]
    xs = grid[None, :] * bin_w[:, None] + x1[:, None]

    def axis(coords, size):
        start = jnp.minimum(jnp.floor(coords), size - 2.0)
        frac = coords - start
        idx = jnp.clip(start, 0.0, size - 2.0)
        inside = ((coords >= 0) & (coords < size)).astype(jnp.float32)
        return idx, (1.0 - frac) * inside, frac * inside       # each [R, A]

    y0, wyl, wyh = axis(ys, h)
    x0, wxl, wxh = axis(xs, w)

    col = lambda v: v.reshape(-1, 1)
    # broadcast (roi, py) → (roi, py, px) and (roi, px) → (roi, py, px)
    along_y = lambda v: col(jnp.broadcast_to(v[:, :, None], v.shape + (a,)))
    along_x = lambda v: col(jnp.broadcast_to(v[:, None, :], (v.shape[0], a, a)))
    return (along_y(y0), along_y(wyl), along_y(wyh),
            along_x(x0), along_x(wxl), along_x(wxh),
            rois[:, 0].astype(jnp.int32))


def _make_kernel(group, a, w):
    rows = group * a * a

    def kernel(bi_ref, f_hbm, y0, wyl, wyh, x0, wxl, wxh, out_ref,
               f_vmem, sem):
        g = pl.program_id(0)
        prev = jnp.where(g > 0, bi_ref[jnp.maximum((g - 1) * group, 0)], -1)

        @pl.when(bi_ref[g * group] != prev)
        def _():
            dma = pltpu.make_async_copy(f_hbm.at[bi_ref[g * group]],
                                        f_vmem, sem)
            dma.start()
            dma.wait()

        hw = f_vmem.shape[0]
        j = lax.broadcasted_iota(jnp.int32, (rows, hw), 1).astype(jnp.float32)
        # robust integer j // w in f32: the +0.5 keeps row boundaries clear of
        # division rounding (margin 0.5/w >> f32 ulp here)
        h_idx = jnp.floor((j + 0.5) * (1.0 / w))
        w_idx = j - h_idx * w
        ky = wyl[:] * (h_idx == y0[:]) + wyh[:] * (h_idx == y0[:] + 1.0)
        kx = wxl[:] * (w_idx == x0[:]) + wxh[:] * (w_idx == x0[:] + 1.0)
        out_ref[:] = jnp.dot((ky * kx).astype(jnp.bfloat16), f_vmem[:],
                             preferred_element_type=jnp.float32)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("aligned", "spatial_scale", "rois_per_image"))
def roi_align_fwd_pallas(features, rois, aligned: int = 8,
                         spatial_scale: float = 1.0 / 16.0,
                         rois_per_image: int | None = None):
    """features [B, H, W, C] (bf16); rois [R, 5] sorted by image (col 0).
    Returns [R, A, A, C] f32.

    Grid groups of GROUP rois share one image's feature map, so groups must
    never straddle an image boundary: pass the static per-image roi count
    (`rois_per_image`) to enable grouping. Without it, multi-image inputs fall
    back to the always-correct group=1 path (single-image inputs may group
    whenever R divides)."""
    b, h, w, c = features.shape
    r = rois.shape[0]
    a = aligned
    if rois_per_image is not None:
        assert r % rois_per_image == 0, (r, rois_per_image)
        group = GROUP if rois_per_image % GROUP == 0 else 1
    elif b == 1:
        group = GROUP if r % GROUP == 0 else 1
    else:
        group = 1
    cols = _sample_columns(rois, h, w, a, spatial_scale)
    y0, wyl, wyh, x0, wxl, wxh, bi = cols

    hw = h * w
    pad = (-hw) % 8                       # sublane alignment of the DMA slice
    fflat = features.astype(jnp.bfloat16).reshape(b, hw, c)
    if pad:
        fflat = jnp.pad(fflat, ((0, 0), (0, pad), (0, 0)))

    rows = group * a * a
    col_spec = pl.BlockSpec((rows, 1), lambda g, bi: (g, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(group, a, w),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r // group,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] + [col_spec] * 6,
            out_specs=pl.BlockSpec((rows, c), lambda g, bi: (g, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((hw + pad, c), jnp.bfloat16),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((r * a * a, c), jnp.float32),
    )(bi, fflat, y0, wyl, wyh, x0, wxl, wxh)
    return out.reshape(r, a, a, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def roi_align_avg_pallas(features, rois, pooled_size: int = 7,
                         spatial_scale: float = 1.0 / 16.0,
                         rois_per_image: int | None = None):
    """RoIAlignAvg with the Pallas forward: (P+1)² align + stride-1 2×2 mean.
    Backward = the XLA path's gather-transpose (identical math)."""
    x = roi_align_fwd_pallas(features, rois, pooled_size + 1, spatial_scale,
                             rois_per_image)
    out = 0.25 * (x[:, :-1, :-1] + x[:, :-1, 1:] + x[:, 1:, :-1] + x[:, 1:, 1:])
    return out.astype(features.dtype)


def _fwd(features, rois, pooled_size, spatial_scale, rois_per_image):
    return roi_align_avg_pallas(features, rois, pooled_size, spatial_scale,
                                rois_per_image), (features, rois)


def _bwd(pooled_size, spatial_scale, rois_per_image, res, g):
    # backward through the sorted-scatter cvjp, NOT autodiff: the autodiff
    # transpose emits an unsorted scatter that costs minutes of TPU compile
    # (roi_align_vjp.py / DESIGN.md); both backwards are numerically identical
    from .roi_align_vjp import roi_align_avg_cvjp

    features, rois = res
    _, vjp = jax.vjp(
        lambda f: roi_align_avg_cvjp(f, rois, pooled_size, spatial_scale),
        features)
    return vjp(g.astype(features.dtype))[0], jnp.zeros_like(rois)


roi_align_avg_pallas.defvjp(_fwd, _bwd)
