"""RoI crop ('crop' pooling mode): affine grid + bilinear sampling.

Reference semantics: `_affine_grid_gen` (/root/reference/lib/model/utils/net_utils.py:143-165)
builds a per-roi affine theta over the feature map (rois / 16, with W-1 / H-1
denominators) and the STN bilinear sampler
(/root/reference/lib/model/roi_crop/src/roi_crop_cuda_kernel.cu:47-110) samples it.
With align_corners-style grids this reduces to: sample a uniform grid_size × grid_size
lattice of points spanning (x1, y1) → (x2, y2) inclusive in feature coordinates,
bilinearly, with out-of-bounds corner contributions zeroed. The detector then
applies a stride-2 2×2 max pool when CROP_RESIZE_WITH_MAX_POOL (faster_rcnn.py:72-79).

TPU design: like roi_align, the four corner fetches are lane-efficient gathers
from the flattened NHWC feature map; backward is XLA's gather transpose.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def bilinear_sample(features: jnp.ndarray, batch_idx: jnp.ndarray,
                    ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with zero padding outside the image.

    features: [B, H, W, C]; batch_idx: [R] int; ys/xs: [R, ...] pixel coords.
    Returns [R, ..., C].
    """
    b, h, w, c = features.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    flat = features.reshape(b * h * w, c)
    extra = ys.ndim - 1
    bi = batch_idx.reshape((-1,) + (1,) * extra)

    def corner(dy, dx):
        yy = y0i + dy
        xx = x0i + dx
        ok = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = (bi * h + jnp.clip(yy, 0, h - 1)) * w + jnp.clip(xx, 0, w - 1)
        g = jnp.take(flat, idx.reshape(-1), axis=0).reshape(idx.shape + (c,))
        return jnp.where(ok[..., None], g, 0.0)

    out = (
        corner(0, 0) * ((1 - wy) * (1 - wx))[..., None]
        + corner(0, 1) * ((1 - wy) * wx)[..., None]
        + corner(1, 0) * (wy * (1 - wx))[..., None]
        + corner(1, 1) * (wy * wx)[..., None]
    )
    return out.astype(features.dtype)


@functools.partial(jax.jit, static_argnames=("grid_size", "spatial_scale", "max_pool"))
def roi_crop(features: jnp.ndarray, rois: jnp.ndarray, grid_size: int = 14,
             spatial_scale: float = 1.0 / 16.0, max_pool: bool = True) -> jnp.ndarray:
    """features: [B, H, W, C]; rois: [R, 5] (batch_idx, x1, y1, x2, y2).

    Returns [R, grid_size/2, grid_size/2, C] if max_pool else [R, grid_size, ... , C].
    """
    batch_idx = rois[:, 0].astype(jnp.int32)
    x1 = rois[:, 1] * spatial_scale
    y1 = rois[:, 2] * spatial_scale
    x2 = rois[:, 3] * spatial_scale
    y2 = rois[:, 4] * spatial_scale

    lin = jnp.linspace(0.0, 1.0, grid_size)
    ys = y1[:, None, None] + (y2 - y1)[:, None, None] * lin[None, :, None]
    xs = x1[:, None, None] + (x2 - x1)[:, None, None] * lin[None, None, :]
    ys = jnp.broadcast_to(ys, (rois.shape[0], grid_size, grid_size))
    xs = jnp.broadcast_to(xs, (rois.shape[0], grid_size, grid_size))

    out = bilinear_sample(features, batch_idx, ys, xs)
    if max_pool:
        g2 = grid_size // 2
        out = out.reshape(rois.shape[0], g2, 2, g2, 2, -1).max(axis=(2, 4))
    return out
