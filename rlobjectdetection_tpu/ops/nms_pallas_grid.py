"""Grid-based Pallas NMS: one score-tile per sequential grid step.

Compile-time-friendly restructuring of ops/nms_pallas.py: instead of one kernel
body containing a fori_loop over all tiles (quadratic jaxpr for Mosaic), the
tile loop becomes the pallas GRID — TPU grids execute sequentially, and the
`keep` output ref persists across grid steps, carrying the suppression state.
Each step:
  1. cross-suppresses its tile against all already-processed boxes with one
     [T, N] IoU + an MXU matvec against the accumulated keep column, then
  2. runs the within-tile Jacobi fixpoint (exact greedy, see ops/nms.py).

Same Mosaic-friendly layout tricks as nms_pallas.py: row-major + coordinate-
major box copies for [T, 1] × [1, N] broadcasts; masks as f32 columns.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(boxes_ref, boxes_t_ref, valid_ref, keep_ref, *,
            n: int, tile: int, thresh: float):
    t_idx = pl.program_id(0)
    start = t_idx * tile

    @pl.when(t_idx == 0)
    def _():
        keep_ref[:] = jnp.zeros((n, 1), jnp.float32)

    tv = valid_ref[pl.ds(start, tile), :]                         # [T, 1]

    # IoU of this tile vs ALL boxes: [T, N] (T=128, N≤16384 → ≤8 MB f32).
    rx1 = boxes_ref[pl.ds(start, tile), 0:1]
    ry1 = boxes_ref[pl.ds(start, tile), 1:2]
    rx2 = boxes_ref[pl.ds(start, tile), 2:3]
    ry2 = boxes_ref[pl.ds(start, tile), 3:4]
    cx1 = boxes_t_ref[0:1, :]
    cy1 = boxes_t_ref[1:2, :]
    cx2 = boxes_t_ref[2:3, :]
    cy2 = boxes_t_ref[3:4, :]
    iw = jnp.maximum(jnp.minimum(rx2, cx2) - jnp.maximum(rx1, cx1) + 1.0, 0.0)
    ih = jnp.maximum(jnp.minimum(ry2, cy2) - jnp.maximum(ry1, cy1) + 1.0, 0.0)
    inter = iw * ih
    area_r = (rx2 - rx1 + 1.0) * (ry2 - ry1 + 1.0)
    area_c = (cx2 - cx1 + 1.0) * (cy2 - cy1 + 1.0)
    iou = inter / (area_r + area_c - inter)                       # [T, N]
    over = (iou > thresh).astype(jnp.float32)

    # Cross-tile: keep_ref is nonzero only for already-processed tiles, so one
    # matvec against the whole keep column suffices (this tile's own slice and
    # all later tiles are still zero).
    sup_prev = (
        jnp.dot(over, keep_ref[:, :], preferred_element_type=jnp.float32) > 0.0
    ).astype(jnp.float32)                                         # [T, 1]

    # Within-tile Jacobi fixpoint on (j < i) & (iou > τ), validity folded into
    # the matvec operand. Exact greedy in ≤ T iterations. (Recomputed from the
    # refs — Mosaic has no dynamic_slice on values.)
    tx1 = boxes_t_ref[0:1, pl.ds(start, tile)]
    ty1 = boxes_t_ref[1:2, pl.ds(start, tile)]
    tx2 = boxes_t_ref[2:3, pl.ds(start, tile)]
    ty2 = boxes_t_ref[3:4, pl.ds(start, tile)]
    iw_t = jnp.maximum(jnp.minimum(rx2, tx2) - jnp.maximum(rx1, tx1) + 1.0, 0.0)
    ih_t = jnp.maximum(jnp.minimum(ry2, ty2) - jnp.maximum(ry1, ty1) + 1.0, 0.0)
    inter_t = iw_t * ih_t
    area_t = (tx2 - tx1 + 1.0) * (ty2 - ty1 + 1.0)
    iou_tt = inter_t / (area_r + area_t - inter_t)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    adj0 = jnp.where((col < row) & (iou_tt > thresh), 1.0, 0.0)

    def cond(state):
        sup, changed, it = state
        return changed & (it < tile)

    def body(state):
        sup, _, it = state
        active = tv * (1.0 - sup)
        hit = jnp.dot(adj0, active, preferred_element_type=jnp.float32)
        new = jnp.maximum(sup_prev, (hit > 0.0).astype(jnp.float32))
        return new, jnp.sum(jnp.abs(new - sup)) > 0.0, it + 1

    sup0 = jnp.maximum(
        sup_prev,
        (jnp.dot(adj0, tv, preferred_element_type=jnp.float32) > 0.0).astype(
            jnp.float32
        ),
    )
    sup, _, _ = jax.lax.while_loop(cond, body, (sup0, True, 0))
    keep_ref[pl.ds(start, tile), :] = tv * (1.0 - sup)


@functools.partial(jax.jit, static_argnames=("iou_threshold", "tile_size", "interpret"))
def nms_sorted_mask_pallas_grid(boxes: jnp.ndarray, valid: jnp.ndarray,
                                iou_threshold: float, tile_size: int = 128,
                                interpret: bool = False) -> jnp.ndarray:
    """boxes [N, 4] sorted by descending score, valid [N] bool → keep [N] bool."""
    n = boxes.shape[0]
    n_pad = ((max(n, tile_size) + tile_size - 1) // tile_size) * tile_size
    if n_pad != n:
        boxes = jnp.pad(boxes, ((0, n_pad - n), (0, 0)))
        valid = jnp.pad(valid, (0, n_pad - n))
    boxes = boxes.astype(jnp.float32)
    num_tiles = n_pad // tile_size

    keep = pl.pallas_call(
        functools.partial(_kernel, n=n_pad, tile=tile_size,
                          thresh=float(iou_threshold)),
        grid=(num_tiles,),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec((n_pad, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, n_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_pad, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes, boxes.T, valid.astype(jnp.float32).reshape(-1, 1))
    return keep[:n, 0] > 0.5
