"""Pallas TPU kernel for greedy NMS.

Same exact-greedy semantics as ops/nms.nms_sorted_mask (the TPU-native recast of
the reference CUDA bitmask kernel, nms_cuda_kernel.cu), but executed as ONE
Pallas program with all boxes resident in VMEM: the XLA scan version dispatches
~N/tile sequential device loops (each with its own launch overhead); here the
whole suppression runs inside a single kernel.

Mosaic-friendly formulation (no gathers, no transposes):
  * boxes are passed twice — row-major [N, 4] for [T, 1] column slices and
    coordinate-major [4, N] for [1, C] row slices — so the [T, C] IoU tile is
    pure broadcast arithmetic of static slices;
  * all suppression masks live as f32 COLUMN vectors [*, 1], and the
    "suppressed by any kept j" reductions become MXU matvecs:
        hit = (iou > τ) @ kept_col,
    both cross-tile and inside the within-tile Jacobi fixpoint (which is exact
    greedy in ≤ T iterations — see ops/nms.py for the induction argument).

Memory plan (N ≤ 16384, T = 256): boxes 2×256 KB + keep 64 KB + one [T, T]
IoU tile 256 KB — comfortably inside VMEM.

Interpret mode is used for CPU tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iou_block(boxes_ref, boxes_t_ref, rstart, cstart, t, c):
    """IoU of rows [rstart, rstart+t) vs cols [cstart, cstart+c) → [t, c] f32,
    +1 convention. Uses [T, 1] × [1, C] broadcasts of static slices."""
    rx1 = boxes_ref[pl.ds(rstart, t), 0:1]
    ry1 = boxes_ref[pl.ds(rstart, t), 1:2]
    rx2 = boxes_ref[pl.ds(rstart, t), 2:3]
    ry2 = boxes_ref[pl.ds(rstart, t), 3:4]
    cx1 = boxes_t_ref[0:1, pl.ds(cstart, c)]
    cy1 = boxes_t_ref[1:2, pl.ds(cstart, c)]
    cx2 = boxes_t_ref[2:3, pl.ds(cstart, c)]
    cy2 = boxes_t_ref[3:4, pl.ds(cstart, c)]
    iw = jnp.maximum(jnp.minimum(rx2, cx2) - jnp.maximum(rx1, cx1) + 1.0, 0.0)
    ih = jnp.maximum(jnp.minimum(ry2, cy2) - jnp.maximum(ry1, cy1) + 1.0, 0.0)
    inter = iw * ih
    area_r = (rx2 - rx1 + 1.0) * (ry2 - ry1 + 1.0)
    area_c = (cx2 - cx1 + 1.0) * (cy2 - cy1 + 1.0)
    return inter / (area_r + area_c - inter)


def _nms_kernel(boxes_ref, boxes_t_ref, valid_ref, keep_ref, *,
                n: int, tile: int, thresh: float):
    num_tiles = n // tile
    keep_ref[:] = jnp.zeros((n, 1), jnp.float32)

    def tile_body(t_idx, _):
        start = t_idx * tile
        tv = valid_ref[pl.ds(start, tile), :]                     # [T, 1] f32

        # Cross-tile: hit_i = Σ_p<t (iou[i, :] > τ) @ kept_p
        def prev_body(p, acc):
            pstart = p * tile
            iou = _iou_block(boxes_ref, boxes_t_ref, start, pstart, tile, tile)
            kept_p = keep_ref[pl.ds(pstart, tile), :]             # [T, 1]
            hit = jnp.dot((iou > thresh).astype(jnp.float32), kept_p,
                          preferred_element_type=jnp.float32)     # [T, 1]
            return acc + jnp.where(p < t_idx, hit, 0.0)

        sup_prev = jax.lax.fori_loop(
            0, num_tiles, prev_body, jnp.zeros((tile, 1), jnp.float32)
        )
        sup_prev = (sup_prev > 0.0).astype(jnp.float32)           # [T, 1]

        # Within-tile Jacobi fixpoint. adj0[i, j] = (j < i) & (iou > τ);
        # validity of j folds into the matvec operand.
        iou_tt = _iou_block(boxes_ref, boxes_t_ref, start, start, tile, tile)
        row = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
        adj0 = ((col < row) & (iou_tt > thresh)).astype(jnp.float32)

        def cond(state):
            sup, changed, it = state
            return changed & (it < tile)

        def body(state):
            sup, _, it = state
            active = tv * (1.0 - sup)                             # [T, 1]
            hit = jnp.dot(adj0, active, preferred_element_type=jnp.float32)
            new = jnp.maximum(sup_prev, (hit > 0.0).astype(jnp.float32))
            changed = jnp.sum(jnp.abs(new - sup)) > 0.0
            return new, changed, it + 1

        sup0 = jnp.maximum(
            sup_prev,
            (jnp.dot(adj0, tv, preferred_element_type=jnp.float32) > 0.0).astype(
                jnp.float32
            ),
        )
        sup, _, _ = jax.lax.while_loop(cond, body, (sup0, True, 0))

        keep_ref[pl.ds(start, tile), :] = tv * (1.0 - sup)
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
    boxes = boxes.astype(jnp.float32)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, n=n_pad, tile=tile_size,
                          thresh=float(iou_threshold)),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(boxes, boxes.T, valid.astype(jnp.float32).reshape(-1, 1))
    return keep[:n, 0] > 0.5


def pallas_available() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False
