"""Box geometry: encode/decode transforms, clipping, IoU.

Pure jnp, fully batched, fixed-shape — these run inside the jitted train/eval steps.
Reference semantics: /root/reference/lib/model/rpn/bbox_transform.py (the Caffe
"+1 width" convention throughout). The reference's per-image Python loops become
vectorized batch ops; dynamic `nonzero` filtering becomes validity masks.
"""

from __future__ import annotations

import jax.numpy as jnp


def box_wh_ctr(boxes: jnp.ndarray):
    """widths, heights, center x, center y with the +1 convention.

    boxes: [..., 4] in (x1, y1, x2, y2).
    """
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    return w, h, cx, cy


def bbox_transform(ex_rois: jnp.ndarray, gt_rois: jnp.ndarray) -> jnp.ndarray:
    """Encode gt boxes relative to example rois → (dx, dy, dw, dh).

    Both inputs [..., 4]; broadcastable leading dims. Mirrors
    bbox_transform / bbox_transform_batch (bbox_transform.py:15,36).
    """
    ex_w, ex_h, ex_cx, ex_cy = box_wh_ctr(ex_rois)
    gt_w, gt_h, gt_cx, gt_cy = box_wh_ctr(gt_rois)
    dx = (gt_cx - ex_cx) / ex_w
    dy = (gt_cy - ex_cy) / ex_h
    dw = jnp.log(gt_w / ex_w)
    dh = jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def bbox_transform_inv(boxes: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Decode deltas on top of boxes (bbox_transform.py:77-103).

    boxes: [..., N, 4]; deltas: [..., N, 4*K] with per-class groups of 4.
    Returns [..., N, 4*K].
    """
    w, h, cx, cy = box_wh_ctr(boxes)
    n4 = deltas.shape[-1]
    k = n4 // 4
    shp = deltas.shape[:-1] + (k, 4)
    d = deltas.reshape(shp)
    pred_cx = d[..., 0] * w[..., None] + cx[..., None]
    pred_cy = d[..., 1] * h[..., None] + cy[..., None]
    pred_w = jnp.exp(d[..., 2]) * w[..., None]
    pred_h = jnp.exp(d[..., 3]) * h[..., None]
    out = jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ],
        axis=-1,
    )
    return out.reshape(deltas.shape)


def clip_boxes(boxes: jnp.ndarray, im_hw) -> jnp.ndarray:
    """Clamp boxes to [0, W-1] × [0, H-1] (bbox_transform.py:125-133).

    boxes: [B, N, 4*K]; im_hw: [B, 2] (height, width) per image, or a static tuple.
    """
    if isinstance(im_hw, (tuple, list)):
        hmax = jnp.asarray(im_hw[0], jnp.float32) - 1.0
        wmax = jnp.asarray(im_hw[1], jnp.float32) - 1.0
    else:
        hmax = im_hw[..., 0] - 1.0
        wmax = im_hw[..., 1] - 1.0
        # broadcast per-batch bounds over the (boxes, class-group) dims: the
        # clipped coords below have rank boxes.ndim (last axis split into K×4)
        extra = boxes.ndim - hmax.ndim
        for _ in range(extra):
            hmax = hmax[..., None]
            wmax = wmax[..., None]
    shp = boxes.shape[:-1] + (boxes.shape[-1] // 4, 4)
    b = boxes.reshape(shp)
    x1 = jnp.clip(b[..., 0], 0.0, wmax)
    y1 = jnp.clip(b[..., 1], 0.0, hmax)
    x2 = jnp.clip(b[..., 2], 0.0, wmax)
    y2 = jnp.clip(b[..., 3], 0.0, hmax)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(boxes.shape)


def bbox_overlaps(boxes: jnp.ndarray, query_boxes: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU with the +1 convention (bbox_transform.py:136-166).

    boxes: [..., N, 4]; query_boxes: [..., K, 4] → [..., N, K].
    """
    b = boxes[..., :, None, :]
    q = query_boxes[..., None, :, :]
    iw = jnp.minimum(b[..., 2], q[..., 2]) - jnp.maximum(b[..., 0], q[..., 0]) + 1.0
    ih = jnp.minimum(b[..., 3], q[..., 3]) - jnp.maximum(b[..., 1], q[..., 1]) + 1.0
    iw = jnp.maximum(iw, 0.0)
    ih = jnp.maximum(ih, 0.0)
    area_b = (boxes[..., 2] - boxes[..., 0] + 1.0) * (boxes[..., 3] - boxes[..., 1] + 1.0)
    area_q = (query_boxes[..., 2] - query_boxes[..., 0] + 1.0) * (
        query_boxes[..., 3] - query_boxes[..., 1] + 1.0
    )
    inter = iw * ih
    union = area_b[..., :, None] + area_q[..., None, :] - inter
    return inter / union


def bbox_overlaps_masked(anchors: jnp.ndarray, gt_boxes: jnp.ndarray) -> jnp.ndarray:
    """Batched IoU with the reference's zero-area sentinel masking
    (bbox_transform.py:168-257 `bbox_overlaps_batch`):

      * gt boxes with zero area (padding rows, all-zeros → w=h=1 under the +1
        convention) produce overlap 0,
      * anchors with zero area produce overlap -1.

    anchors: [..., N, 4]; gt_boxes: [..., K, 4+] (first 4 cols used).
    Returns [..., N, K].
    """
    gt = gt_boxes[..., :4]
    ov = bbox_overlaps(anchors, gt)
    gt_w = gt[..., 2] - gt[..., 0] + 1.0
    gt_h = gt[..., 3] - gt[..., 1] + 1.0
    an_w = anchors[..., 2] - anchors[..., 0] + 1.0
    an_h = anchors[..., 3] - anchors[..., 1] + 1.0
    gt_zero = (gt_w == 1.0) & (gt_h == 1.0)
    an_zero = (an_w == 1.0) & (an_h == 1.0)
    ov = jnp.where(gt_zero[..., None, :], 0.0, ov)
    ov = jnp.where(an_zero[..., :, None], -1.0, ov)
    return ov
