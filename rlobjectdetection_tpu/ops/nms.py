"""Fixed-shape greedy NMS for TPU.

TPU-native redesign of the reference's CUDA bitmask NMS
(/root/reference/lib/model/nms/src/nms_cuda_kernel.cu:41-144): same greedy
suppress-by-score-order semantics (IoU with the +1 width convention,
`suppress if iou > thresh`), but instead of a 64-bit mask matrix + host-side
scan (which forces a device→host round trip per image), we run a score-sorted
tiled suppression entirely on device:

  * boxes are sorted by score (descending) once;
  * tiles of TILE boxes are processed sequentially with `lax.scan`;
  * cross-tile suppression is one [TILE, N] IoU + masked reduction per tile;
  * within-tile suppression is a Jacobi fixpoint on the strictly-lower-
    triangular "suppresses" relation — exact greedy in ≤TILE iterations,
    with early exit via `lax.while_loop`.

Everything is fixed shape: invalid/padding boxes are handled with validity
masks, and selection of the top-K survivors is a masked top_k. Exactness vs a
sequential numpy oracle is enforced in tests/test_nms.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .boxes import bbox_overlaps

NEG_INF = -1e10


def _pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def nms_small_mask(boxes: jnp.ndarray, valid: jnp.ndarray,
                   iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS keep-mask for score-sorted boxes, small-N flavor: ONE [N, N]
    IoU→adjacency pass + a Jacobi fixpoint on the strictly-lower-triangular
    "suppresses" relation (identical argument to the tiled version's
    within-tile resolution: the relation is a DAG in score order, so the
    iteration converges exactly in ≤ suppression-chain-depth steps, unique
    fixpoint = the sequential greedy result).

    vs the tiled scan at per-class test-NMS shapes (N = 300 padded to 512,
    2 tiles): no padding to a tile multiple, one adjacency materialization
    ([lanes, N, N] pred) instead of per-tile [lanes, TILE, N] float chains,
    and a single while instead of scan(tile)×while(tile) — the B×C vmapped
    per-class problem is bandwidth-bound on those intermediates (bs8 trace,
    DESIGN.md "Batched serving")."""
    n = boxes.shape[0]
    # adjacency without the IoU divide: iou > t  ⟺  inter > t·union (union is
    # always positive under the +1 convention), so the whole coordinate→bool
    # chain fuses into one elementwise kernel writing only the [N, N] pred —
    # the divide variant cost a separate f32 materialization (bs8 trace).
    x1, y1, x2, y2 = (boxes[:, k] for k in range(4))
    iw = jnp.maximum(
        jnp.minimum(x2[:, None], x2[None, :])
        - jnp.maximum(x1[:, None], x1[None, :]) + 1.0, 0.0)
    ih = jnp.maximum(
        jnp.minimum(y2[:, None], y2[None, :])
        - jnp.maximum(y1[:, None], y1[None, :]) + 1.0, 0.0)
    area = (x2 - x1 + 1.0) * (y2 - y1 + 1.0)
    inter = iw * ih
    union = area[:, None] + area[None, :] - inter
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    adj = (col < row) & (inter > iou_threshold * union) & valid[None, :]

    def jacobi(sup):
        return jnp.any(adj & ~sup[None, :], axis=1)

    # Each while iteration applies FOUR Jacobi updates: the body work is tiny
    # ([N, N] bool AND+reduce, ~75 µs at the 640-lane vmapped eval shape) but
    # per-iteration while overhead measured ~4-5× the body (bs8 trace:
    # while.53 9.6 ms vs and_reduce body 1.8 ms at ~24 iterations/step), so
    # unrolling divides the dominant cost by 4. Exactness: convergence is
    # checked on the LAST pair inside the group — any(F(s) != s) == False is
    # literally the fixpoint definition, and extra applications past the
    # fixpoint are no-ops.
    def cond(state):
        _, changed, it = state
        return changed & (it < n)

    def body(state):
        sup, _, it = state
        for _ in range(3):
            sup = jacobi(sup)
        new = jacobi(sup)
        return new, jnp.any(new != sup), it + 4

    sup0 = jnp.any(adj, axis=1)
    sup, _, _ = jax.lax.while_loop(cond, body, (sup0, jnp.array(True), 0))
    return valid & ~sup


def nms_sorted_mask(boxes: jnp.ndarray, valid: jnp.ndarray, iou_threshold: float,
                    tile_size: int = 256, max_keep: int | None = None) -> jnp.ndarray:
    """Greedy NMS keep-mask for boxes already sorted by descending score.

    boxes: [N, 4] (x1, y1, x2, y2); valid: [N] bool. Returns keep: [N] bool.
    Exact greedy: box i survives iff it is valid and no surviving valid box
    j < i has IoU(i, j) > iou_threshold.

    `max_keep`: stop scanning tiles once that many boxes are kept. Because
    boxes are score-sorted and survivors are emitted in score order, the
    first `max_keep` kept boxes are already final — a caller that consumes at
    most the top `max_keep` survivors (nms_select) gets bit-identical output
    while the scan skips the tail tiles (measured 13% of the train step at
    the 12000-box RPN shape; typically ≥half the tiles never run).
    """
    n = boxes.shape[0]
    n_pad = _pad_to_multiple(max(n, tile_size), tile_size)
    if n_pad != n:
        boxes = jnp.pad(boxes, ((0, n_pad - n), (0, 0)))
        valid = jnp.pad(valid, (0, n_pad - n))
    num_tiles = n_pad // tile_size

    def tile_step(kept, tile_idx):
        start = tile_idx * tile_size
        tb = jax.lax.dynamic_slice(boxes, (start, 0), (tile_size, 4))
        tv = jax.lax.dynamic_slice(valid, (start,), (tile_size,))

        # [TILE, N] IoU of this tile's boxes against every box.
        iou = bbox_overlaps(tb, boxes)

        # Cross-tile: suppressed by any *kept* box strictly before this tile.
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
        prev_mask = (col < start) & kept[None, :]
        sup_prev = jnp.any((iou > iou_threshold) & prev_mask, axis=1)

        # Within-tile: adj[i, j] = True iff j < i and IoU > thresh and j valid.
        iou_tt = jax.lax.dynamic_slice(iou, (0, start), (tile_size, tile_size))
        row = jax.lax.broadcasted_iota(jnp.int32, (tile_size, tile_size), 0)
        colt = jax.lax.broadcasted_iota(jnp.int32, (tile_size, tile_size), 1)
        adj = (colt < row) & (iou_tt > iou_threshold) & tv[None, :]

        def cond(state):
            sup, changed, it = state
            return changed & (it < tile_size)

        def body(state):
            sup, _, it = state
            new = sup_prev | jnp.any(adj & ~sup[None, :], axis=1)
            return new, jnp.any(new != sup), it + 1

        sup0 = sup_prev | jnp.any(adj, axis=1)
        sup, _, _ = jax.lax.while_loop(cond, body, (sup0, jnp.array(True), 0))

        return jax.lax.dynamic_update_slice(kept, tv & ~sup, (start,))

    kept0 = jnp.zeros((n_pad,), dtype=bool)
    # The while-loop costs a per-iteration condition sync that the scan does
    # not; it only pays when it can skip a meaningful number of tiles (the
    # train RPN shape: 48 tiles -> ~9). At small tile counts (per-class test
    # NMS: 2) the scan is faster — measured 11% of bs1 inference.
    if max_keep is None or num_tiles <= 4:
        kept, _ = jax.lax.scan(lambda k, i: (tile_step(k, i), None),
                               kept0, jnp.arange(num_tiles))
    else:
        def w_cond(state):
            kept, count, i = state
            return (i < num_tiles) & (count < max_keep)

        def w_body(state):
            kept, count, i = state
            new_kept = tile_step(kept, i)
            # count only the tile's slice — a [TILE] reduce, not [N]
            tile_new = jax.lax.dynamic_slice(new_kept, (i * tile_size,),
                                             (tile_size,))
            return new_kept, count + jnp.sum(tile_new), i + 1

        kept, _, _ = jax.lax.while_loop(
            w_cond, w_body, (kept0, jnp.int32(0), jnp.int32(0)))
    return kept[:n]


def nms(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
        valid: jnp.ndarray | None = None, tile_size: int = 256,
        max_keep: int | None = None):
    """Greedy NMS on unsorted boxes.

    Returns (order, keep): `order` [N] indices sorting by descending score,
    `keep` [N] bool aligned to that order. Equivalent keep *set* to the
    reference `nms(dets, thresh)` (nms_wrapper.py:11), expressed fixed-shape.
    The XLA tiled-scan suppression is the final design: two Pallas variants
    were built and measured in round 1 (single-kernel: >10 min Mosaic compile;
    grid-per-tile: 22.3 ms vs the scan's 4.0 ms at N=12288) and retired —
    exact greedy NMS is 9% of the train step and the scan already saturates
    it (DESIGN.md "NMS: sorted tiled suppression").
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    skey = jnp.where(valid, scores, NEG_INF)
    order = jnp.argsort(-skey)
    sboxes = jnp.take(boxes, order, axis=0)
    svalid = jnp.take(valid, order, axis=0)
    if n <= 2 * tile_size:
        # small problems (per-class test NMS: N=300) skip the tile machinery
        # entirely — identical keep set, ~half the materialized intermediates
        keep = nms_small_mask(sboxes, svalid, iou_threshold)
    else:
        keep = nms_sorted_mask(sboxes, svalid, iou_threshold,
                               tile_size=tile_size, max_keep=max_keep)
    return order, keep


@functools.partial(jax.jit, static_argnames=("iou_threshold", "max_out", "tile_size"))
def nms_select(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float,
               max_out: int, valid: jnp.ndarray | None = None, tile_size: int = 256):
    """NMS then keep the top `max_out` survivors (score order), zero-padded.

    Returns (sel_boxes [max_out, 4], sel_scores [max_out], sel_valid [max_out]).
    Matches proposal_layer.py:146-159 semantics: survivors in score order,
    zero padding at the end.

    Only the top `max_out` survivors are consumed, so the tile scan stops as
    soon as `max_out` boxes are kept (`max_keep` early exit) — bit-identical
    output, and at the train RPN shape (12000 boxes → top 2000) typically
    less than half the tiles run.
    """
    order, keep = nms(boxes, scores, iou_threshold, valid=valid,
                      tile_size=tile_size, max_keep=max_out)
    # Survivors are already in score order (keep is a mask over the sorted
    # array), so "top max_out survivors" is a compaction, not a sort: the
    # m-th output is the first index where cumsum(keep) reaches m+1. The
    # monotone-row argmax fuses to one compare+reduce — replacing a
    # lax.top_k whose sort network dominated the vmapped per-class eval
    # lanes (640 × top_k(300→100)) and the RPN proposal tail (bs8 trace).
    csum = jnp.cumsum(keep.astype(jnp.int32))
    m = jnp.arange(max_out, dtype=jnp.int32)
    ge = csum[None, :] >= (m[:, None] + 1)           # [max_out, N], monotone rows
    top_idx = jnp.argmax(ge, axis=1).astype(jnp.int32)
    # slots beyond the kept count (incl. inputs with fewer than max_out
    # candidates) are invalid and zero-padded, as before
    sel_valid = m < csum[-1]
    sel_in_sorted = jnp.take(order, top_idx)
    sel_boxes = jnp.take(boxes, sel_in_sorted, axis=0)
    sel_boxes = jnp.where(sel_valid[:, None], sel_boxes, 0.0)
    sel_scores = jnp.where(sel_valid, jnp.take(scores, sel_in_sorted), 0.0)
    return sel_boxes, sel_scores, sel_valid
