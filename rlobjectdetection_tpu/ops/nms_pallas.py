"""Pallas TPU kernel for greedy NMS.

Same exact-greedy semantics as ops/nms.nms_sorted_mask (the TPU-native recast of
the reference CUDA bitmask kernel, nms_cuda_kernel.cu), but executed as ONE
Pallas program with all boxes resident in VMEM: the XLA scan version dispatches
~N/tile sequential device loops (each with its own overhead); here the whole
suppression — cross-tile masked IoU reductions and the within-tile Jacobi
fixpoint — runs inside a single kernel.

Memory plan (N ≤ 16384, tile T = 256):
  boxes [N, 4] f32   = 256 KB   VMEM in
  valid [N, 1] f32   =  64 KB   VMEM in
  keep  [N, 1] f32   =  64 KB   VMEM out (1.0 = kept)
  iou tile [T, N]    =  T·N·4 B computed in column chunks of T → [T, T] = 256 KB

Interpret mode is used automatically off-TPU so tests run on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iou_tile(tb, ob):
    """IoU of tile boxes [T, 4] vs other boxes [C, 4] → [T, C], +1 convention."""
    x1 = jnp.maximum(tb[:, 0:1], ob[None, :, 0].reshape(1, -1))
    y1 = jnp.maximum(tb[:, 1:2], ob[None, :, 1].reshape(1, -1))
    x2 = jnp.minimum(tb[:, 2:3], ob[None, :, 2].reshape(1, -1))
    y2 = jnp.minimum(tb[:, 3:4], ob[None, :, 3].reshape(1, -1))
    iw = jnp.maximum(x2 - x1 + 1.0, 0.0)
    ih = jnp.maximum(y2 - y1 + 1.0, 0.0)
    inter = iw * ih
    area_t = (tb[:, 2] - tb[:, 0] + 1.0) * (tb[:, 3] - tb[:, 1] + 1.0)
    area_o = (ob[:, 2] - ob[:, 0] + 1.0) * (ob[:, 3] - ob[:, 1] + 1.0)
    union = area_t[:, None] + area_o[None, :] - inter
    return inter / union


def _nms_kernel(boxes_ref, valid_ref, keep_ref, *, n: int, tile: int, thresh: float):
    num_tiles = n // tile
    keep_ref[:] = jnp.zeros((n, 1), jnp.float32)

    def tile_body(t, _):
        start = t * tile
        tb = boxes_ref[pl.ds(start, tile), :]                     # [T, 4]
        tv = valid_ref[pl.ds(start, tile), 0]                     # [T]

        # Cross-tile suppression: reduce over previously processed tiles.
        def prev_body(p, sup):
            pstart = p * tile
            ob = boxes_ref[pl.ds(pstart, tile), :]
            kept_p = keep_ref[pl.ds(pstart, tile), 0]             # [T]
            iou = _iou_tile(tb, ob)                               # [T, T]
            hit = jnp.any((iou > thresh) & (kept_p[None, :] > 0.5), axis=1)
            # only tiles strictly before t count
            return jnp.where(p < t, sup | hit, sup)

        sup_prev = jax.lax.fori_loop(
            0, num_tiles, prev_body, jnp.zeros((tile,), jnp.bool_)
        )

        # Within-tile Jacobi fixpoint on the strictly-lower-triangular
        # "suppresses" relation (exact greedy in ≤ T iterations).
        iou_tt = _iou_tile(tb, tb)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        adj = (col < row) & (iou_tt > thresh) & (tv[None, :] > 0.5)

        def cond(state):
            sup, changed, it = state
            return changed & (it < tile)

        def body(state):
            sup, _, it = state
            new = sup_prev | jnp.any(adj & ~sup[None, :], axis=1)
            return new, jnp.any(new != sup), it + 1

        sup0 = sup_prev | jnp.any(adj, axis=1)
        sup, _, _ = jax.lax.while_loop(cond, body, (sup0, True, 0))

        keep_ref[pl.ds(start, tile), :] = (
            ((tv > 0.5) & ~sup).astype(jnp.float32).reshape(tile, 1)
        )
        return 0

    jax.lax.fori_loop(0, num_tiles, tile_body, 0)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "tile_size", "interpret"))
def nms_sorted_mask_pallas(boxes: jnp.ndarray, valid: jnp.ndarray,
                           iou_threshold: float, tile_size: int = 256,
                           interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.nms.nms_sorted_mask: boxes [N, 4] sorted by descending
    score, valid [N] bool → keep [N] bool."""
    n = boxes.shape[0]
    n_pad = ((max(n, tile_size) + tile_size - 1) // tile_size) * tile_size
    if n_pad != n:
        boxes = jnp.pad(boxes, ((0, n_pad - n), (0, 0)))
        valid = jnp.pad(valid, (0, n_pad - n))

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, n=n_pad, tile=tile_size,
                          thresh=float(iou_threshold)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes.astype(jnp.float32), valid.astype(jnp.float32).reshape(-1, 1))
    return keep[:n, 0] > 0.5


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
