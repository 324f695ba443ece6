"""RoIAlign (single-sample bilinear) — the hot pooling op.

Reference semantics: /root/reference/lib/model/roi_align/src/roi_align_kernel.cu:15-70.
This flavor is NOT Detectron's 4-sample align: each output cell takes ONE bilinear
sample at (ph * bin_h + y1, pw * bin_w + x1) with bin sizes divided by
(aligned_size - 1), corner start indices clamped to H-2/W-2, and cells whose sample
point falls outside [0, H) × [0, W) set to 0. `RoIAlignAvg` (the variant both
workloads use by default, roi_align/modules/roi_align.py:18-28) runs align at
(P+1)×(P+1) then a stride-1 2×2 average pool.

TPU design: features are NHWC (channels on the 128-lane axis); the four neighbor
fetches become one gather of rows from the [B*H*W, C] flattened feature map —
each gathered row is a full C-vector, so the gather is lane-efficient. The
backward pass is XLA's gather-transpose (scatter-add), matching the reference's
atomicAdd backward (roi_align_kernel.cu:94-143) without races by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def roi_align_coords(rois, h, w, ah, aw, spatial_scale):
    """Sample-point geometry shared by every ALIGN_IMPL (autodiff, cvjp,
    pallas): corner row/col, bilinear ratios, inside-image mask — the single
    source of the reference kernel's coordinate math
    (roi_align_kernel.cu:24-56)."""
    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale
    y1 = rois[:, 2] * spatial_scale
    x2 = rois[:, 3] * spatial_scale
    y2 = rois[:, 4] * spatial_scale
    roi_w = jnp.maximum(x2 - x1 + 1.0, 0.0)
    roi_h = jnp.maximum(y2 - y1 + 1.0, 0.0)
    bin_h = roi_h / (ah - 1.0)
    bin_w = roi_w / (aw - 1.0)
    ys = jnp.arange(ah, dtype=jnp.float32)[None, :] * bin_h[:, None] + y1[:, None]
    xs = jnp.arange(aw, dtype=jnp.float32)[None, :] * bin_w[:, None] + x1[:, None]
    hstart = jnp.minimum(jnp.floor(ys), h - 2.0)
    wstart = jnp.minimum(jnp.floor(xs), w - 2.0)
    h_ratio = ys - hstart                                     # [R, AH]
    w_ratio = xs - wstart                                     # [R, AW]
    inside = ((ys >= 0) & (ys < h))[:, :, None] & ((xs >= 0) & (xs < w))[:, None, :]
    hs = jnp.clip(hstart.astype(jnp.int32), 0, h - 2)         # [R, AH]
    ws_ = jnp.clip(wstart.astype(jnp.int32), 0, w - 2)        # [R, AW]
    return batch_idx, hs, ws_, h_ratio, w_ratio, inside


def roi_align_impl(features, rois, ah, aw, spatial_scale):
    """Unjitted forward core (shared verbatim with the custom-vjp path)."""
    b, h, w, c = features.shape
    r = rois.shape[0]
    batch_idx, hs, ws_, h_ratio, w_ratio, inside = roi_align_coords(
        rois, h, w, ah, aw, spatial_scale
    )
    flat = features.reshape(b * h * w, c)
    base = (batch_idx * h)[:, None] + hs                      # [R, AH] row index into B*H
    idx_ul = base[:, :, None] * w + ws_[:, None, :]           # [R, AH, AW]

    g_ul = jnp.take(flat, idx_ul.reshape(-1), axis=0).reshape(r, ah, aw, c)
    g_ur = jnp.take(flat, (idx_ul + 1).reshape(-1), axis=0).reshape(r, ah, aw, c)
    g_dl = jnp.take(flat, (idx_ul + w).reshape(-1), axis=0).reshape(r, ah, aw, c)
    g_dr = jnp.take(flat, (idx_ul + w + 1).reshape(-1), axis=0).reshape(r, ah, aw, c)

    # interpolate IN the feature dtype: the 4 corner weights are computed in
    # f32 and cast once ([R, AH, AW, 1] — tiny), instead of promoting the 4
    # gathered [R, AH, AW, C] tensors to f32, which the bs8 trace showed as
    # 4 × 630 MB convert fusions (5.8 ms of the eval step; the same class of
    # f32-cast-around-a-gather that cost the RL bench 11%). bf16 weight
    # rounding matches the opt-in Pallas align's documented tolerance.
    dt = features.dtype
    hr = h_ratio[:, :, None, None]
    wr = w_ratio[:, None, :, None]
    w_ul = ((1.0 - hr) * (1.0 - wr)).astype(dt)
    w_ur = ((1.0 - hr) * wr).astype(dt)
    w_dl = (hr * (1.0 - wr)).astype(dt)
    w_dr = (hr * wr).astype(dt)
    out = g_ul * w_ul + g_ur * w_ur + g_dl * w_dl + g_dr * w_dr
    return jnp.where(inside[..., None], out, jnp.zeros((), dt))


@functools.partial(jax.jit, static_argnames=("aligned_height", "aligned_width", "spatial_scale"))
def roi_align(features: jnp.ndarray, rois: jnp.ndarray, aligned_height: int = 7,
              aligned_width: int = 7, spatial_scale: float = 1.0 / 16.0) -> jnp.ndarray:
    """features: [B, H, W, C] (NHWC); rois: [R, 5] (batch_idx, x1, y1, x2, y2).

    Returns [R, aligned_height, aligned_width, C].
    """
    return roi_align_impl(features, rois, aligned_height, aligned_width,
                          spatial_scale)


def roi_align_avg(features: jnp.ndarray, rois: jnp.ndarray, pooled_size: int = 7,
                  spatial_scale: float = 1.0 / 16.0) -> jnp.ndarray:
    """RoIAlignAvg: (P+1)×(P+1) align then stride-1 2×2 average pool → [R, P, P, C].

    Matches roi_align/modules/roi_align.py:18-28 exactly (including the
    (P+1)-1 = P denominator in bin sizing).
    """
    x = roi_align(features, rois, pooled_size + 1, pooled_size + 1, spatial_scale)
    return 0.25 * (x[:, :-1, :-1] + x[:, :-1, 1:] + x[:, 1:, :-1] + x[:, 1:, 1:])


def roi_align_max(features: jnp.ndarray, rois: jnp.ndarray, pooled_size: int = 7,
                  spatial_scale: float = 1.0 / 16.0) -> jnp.ndarray:
    """RoIAlignMax variant (roi_align/modules/roi_align.py:31-43)."""
    x = roi_align(features, rois, pooled_size + 1, pooled_size + 1, spatial_scale)
    return jnp.maximum(
        jnp.maximum(x[:, :-1, :-1], x[:, :-1, 1:]),
        jnp.maximum(x[:, 1:, :-1], x[:, 1:, 1:]),
    )
