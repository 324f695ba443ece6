"""RoI max pooling (quantized-grid max, 'pool' mode).

Reference semantics: /root/reference/lib/model/roi_pooling/src/roi_pooling_kernel.cu:24-96:
roi corners rounded to ints at feature scale, forced min 1×1, cell [ph, pw] covers
rows [floor(ph·bh), ceil((ph+1)·bh)) + roi_start (clipped to [0, H]); empty cells → 0.

TPU design: the dynamic per-cell extents become masked max-reductions over the
full H (then W) axis — exact, fixed-shape. RoIs are processed in chunks with
`lax.map` to bound the [chunk, H, W, C] gather. This mode is not the default
('crop' is, POOLING_MODE config.py:283) and not the benchmark path ('align'),
so it favors exactness over peak speed; backward is XLA autodiff (the max
gradient routes to the argmax element, matching the CUDA atomicAdd backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@functools.partial(jax.jit, static_argnames=("pooled_height", "pooled_width", "spatial_scale", "chunk"))
def roi_pool(features: jnp.ndarray, rois: jnp.ndarray, pooled_height: int = 7,
             pooled_width: int = 7, spatial_scale: float = 1.0 / 16.0,
             chunk: int = 16) -> jnp.ndarray:
    """features: [B, H, W, C] (NHWC); rois: [R, 5] (batch_idx, x1, y1, x2, y2).

    Returns [R, pooled_height, pooled_width, C].
    """
    b, h, w, c = features.shape
    r = rois.shape[0]
    ph_n, pw_n = pooled_height, pooled_width

    pad = (-r) % chunk
    rois_p = jnp.pad(rois, ((0, pad), (0, 0)))

    def one_chunk(chunk_rois):
        bi = chunk_rois[:, 0].astype(jnp.int32)
        # C round() is half-away-from-zero for BOTH signs, not jnp.round's
        # half-to-even: with scale 1/16, integer coords at odd multiples of 8
        # land exactly on .5 and must quantize away from zero like the CUDA
        # kernel — sign(x)·floor(|x|+0.5) covers unclipped negative rois too.
        cround = lambda x: (jnp.sign(x * spatial_scale)
                            * jnp.floor(jnp.abs(x * spatial_scale) + 0.5)
                            ).astype(jnp.int32)
        rs_w = cround(chunk_rois[:, 1])
        rs_h = cround(chunk_rois[:, 2])
        re_w = cround(chunk_rois[:, 3])
        re_h = cround(chunk_rois[:, 4])
        roi_w = jnp.maximum(re_w - rs_w + 1, 1)
        roi_h = jnp.maximum(re_h - rs_h + 1, 1)

        # Cell bounds in exact integer arithmetic: floor(ph*roi_h/P) and
        # ceil((ph+1)*roi_h/P). This is the CUDA kernel's intended partition
        # (roi_pooling_kernel.cu:54-60) without its float32 boundary jitter.
        pidx_h = jnp.arange(ph_n, dtype=jnp.int32)
        pidx_w = jnp.arange(pw_n, dtype=jnp.int32)
        hstart = (pidx_h[None, :] * roi_h[:, None]) // ph_n + rs_h[:, None]
        hend = -((-(pidx_h[None, :] + 1) * roi_h[:, None]) // ph_n) + rs_h[:, None]
        wstart = (pidx_w[None, :] * roi_w[:, None]) // pw_n + rs_w[:, None]
        wend = -((-(pidx_w[None, :] + 1) * roi_w[:, None]) // pw_n) + rs_w[:, None]
        hstart = jnp.clip(hstart, 0, h)
        hend = jnp.clip(hend, 0, h)
        wstart = jnp.clip(wstart, 0, w)
        wend = jnp.clip(wend, 0, w)

        feat = jnp.take(features, bi, axis=0)                       # [K, H, W, C]

        hh = jnp.arange(h)[None, None, :]
        mask_h = (hh >= hstart[:, :, None]) & (hh < hend[:, :, None])   # [K, PH, H]
        ww = jnp.arange(w)[None, None, :]
        mask_w = (ww >= wstart[:, :, None]) & (ww < wend[:, :, None])   # [K, PW, W]

        # Reduce W: [K, H, W, C] + [K, PW, W] → [K, H, PW, C]
        fw = jnp.where(mask_w[:, None, :, :, None], feat[:, :, None, :, :], NEG_INF)
        red_w = jnp.max(fw, axis=3)                                  # [K, H, PW, C]
        # Reduce H: [K, H, PW, C] + [K, PH, H] → [K, PH, PW, C]
        fh = jnp.where(mask_h[:, :, :, None, None], red_w[:, None, :, :, :], NEG_INF)
        out = jnp.max(fh, axis=2)                                    # [K, PH, PW, C]

        empty = (hend <= hstart)[:, :, None, None] | (wend <= wstart)[:, None, :, None]
        return jnp.where(empty | (out <= NEG_INF / 2), 0.0, out)

    chunks = rois_p.reshape(-1, chunk, 5)
    # checkpoint: without it the lax.map (scan) backward SAVES every chunk's
    # [chunk, H, PW, W, C] masked-broadcast residual — at train shapes that is
    # a single 58.7 GB allocation (bf16[64,16,50,7,76,1024], compile-time OOM
    # on a 16 GB chip, measured round 5). Rematerializing recomputes it per
    # chunk in the backward: peak transient ~1 GB, gradients bit-identical.
    out = jax.lax.map(jax.checkpoint(one_chunk), chunks)
    return out.reshape(-1, ph_n, pw_n, c)[:r].astype(features.dtype)
