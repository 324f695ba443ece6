"""custom_vjp roi_align with an explicit single-scatter backward.

XLA's automatic transpose of the 4-corner gather in ops/roi_align.py emits a
scatter whose TPU compile time is pathological (minutes) on this toolchain.
This variant computes the same forward and hand-writes the backward as ONE
combined scatter-add over all 4·R·AH·AW contributions — numerically identical
(same additive semantics as the reference's atomicAdd backward,
roi_align_kernel.cu:94-143), but a much smaller HLO for the compiler.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .roi_align import roi_align_coords, roi_align_impl


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def roi_align_cvjp(features, rois, aligned_height=7, aligned_width=7,
                   spatial_scale=1.0 / 16.0):
    return roi_align_impl(features, rois, aligned_height, aligned_width,
                          spatial_scale)


def _fwd(features, rois, ah, aw, spatial_scale):
    out = roi_align_impl(features, rois, ah, aw, spatial_scale)
    # zero-size carrier keeps the feature shape/dtype in the residuals as a
    # valid JAX type (dtype objects are not pytree leaves)
    return out, (jnp.zeros((0,) + features.shape, features.dtype), rois)


def _bwd(ah, aw, spatial_scale, res, g):
    carrier, rois = res
    b, h, w, c = carrier.shape[1:]
    dtype = carrier.dtype
    r = rois.shape[0]
    batch_idx, hs, ws_, h_ratio, w_ratio, inside = roi_align_coords(
        rois, h, w, ah, aw, spatial_scale
    )
    g = jnp.where(inside[..., None], g.astype(jnp.float32), 0.0)  # [R, AH, AW, C]
    hr = h_ratio[:, :, None]
    wr = w_ratio[:, None, :]
    w_ul = (1.0 - hr) * (1.0 - wr)
    w_ur = (1.0 - hr) * wr
    w_dl = hr * (1.0 - wr)
    w_dr = hr * wr                                                   # [R, AH, AW]

    base = (batch_idx * h)[:, None] + hs
    idx_ul = base[:, :, None] * w + ws_[:, None, :]                  # [R, AH, AW]
    n = r * ah * aw
    idx = jnp.stack(
        [idx_ul, idx_ul + 1, idx_ul + w, idx_ul + w + 1], axis=0
    ).reshape(4 * n)
    vals = jnp.stack(
        [w_ul[..., None] * g, w_ur[..., None] * g,
         w_dl[..., None] * g, w_dr[..., None] * g], axis=0
    ).reshape(4 * n, c)

    # sort the contributions by destination: the sorted-indices scatter-add
    # avoids XLA's pathological unsorted-scatter compile path on TPU
    # (measured: 26 s compile / 5.5 ms run vs ~4 min compile unsorted)
    order = jnp.argsort(idx)
    idx = jnp.take(idx, order)
    vals = jnp.take(vals, order, axis=0)
    dflat = jnp.zeros((b * h * w, c), jnp.float32).at[idx].add(
        vals, indices_are_sorted=True, mode="promise_in_bounds"
    )
    dfeat = dflat.reshape(b, h, w, c).astype(dtype)
    return dfeat, jnp.zeros_like(rois)


roi_align_cvjp.defvjp(_fwd, _bwd)


def roi_align_avg_cvjp(features, rois, pooled_size: int = 7,
                       spatial_scale: float = 1.0 / 16.0):
    """RoIAlignAvg on the custom-vjp align (see ops/roi_align.roi_align_avg)."""
    x = roi_align_cvjp(features, rois, pooled_size + 1, pooled_size + 1,
                       spatial_scale)
    return 0.25 * (x[:, :-1, :-1] + x[:, :-1, 1:] + x[:, 1:, :-1] + x[:, 1:, 1:])
