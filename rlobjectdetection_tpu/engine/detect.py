"""Test-time detection post-processing, fully on device.

Rebuild of the decode + per-class NMS path of RCNN_bases/test_net.py:247-307:
unnormalize per-class deltas by BBOX_NORMALIZE_STDS/MEANS, bbox_transform_inv,
clip to the image, rescale to original coords (÷ im_scale), per-class
threshold + NMS(TEST.NMS=0.3), cap at 100 detections/image across classes.

The reference does this with per-image, per-class python loops on dynamic
shapes; here it is one fixed-shape jitted function: vmap over classes →
masked NMS → global top-100 — so eval throughput is proposal-path bound, not
host bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_transform_inv, clip_boxes
from ..ops.nms import nms_select


@functools.partial(
    jax.jit,
    static_argnames=("num_classes", "class_agnostic", "max_per_image", "nms_thresh",
                     "score_thresh", "bbox_reg", "normalize_stds", "normalize_means"),
)
def postprocess_detections(
    rois: jnp.ndarray,           # [R, 5] (batch_idx, x1, y1, x2, y2), one image
    cls_prob: jnp.ndarray,       # [R, C]
    bbox_pred: jnp.ndarray,      # [R, 4C] or [R, 4]
    im_info: jnp.ndarray,        # [3] (h, w, scale)
    roi_valid: jnp.ndarray,      # [R]
    *,
    num_classes: int,
    class_agnostic: bool = False,
    max_per_image: int = 100,
    nms_thresh: float = 0.3,
    score_thresh: float = 0.0,
    bbox_reg: bool = True,
    normalize_stds=(0.1, 0.1, 0.2, 0.2),
    normalize_means=(0.0, 0.0, 0.0, 0.0),
):
    """Returns (boxes [max_per_image, 4] in ORIGINAL image coords,
    scores [max_per_image], classes [max_per_image] int32, valid [max_per_image]).
    """
    r = rois.shape[0]
    boxes = rois[:, 1:5]

    if bbox_reg:
        stds = jnp.tile(jnp.asarray(normalize_stds), bbox_pred.shape[-1] // 4)
        means = jnp.tile(jnp.asarray(normalize_means), bbox_pred.shape[-1] // 4)
        deltas = bbox_pred * stds + means                         # test_net.py:252-260
        pred = bbox_transform_inv(boxes[None], deltas[None])[0]   # [R, 4K]
        pred = clip_boxes(pred[None], im_info[None, :2])[0]
    else:
        pred = jnp.tile(boxes, (1, bbox_pred.shape[-1] // 4))

    pred = pred / im_info[2]                                      # back to original scale

    if class_agnostic:
        pred_per_class = jnp.broadcast_to(pred[:, None, :4], (r, num_classes, 4))
    else:
        pred_per_class = pred.reshape(r, num_classes, 4)

    def one_class(j):
        scores_j = cls_prob[:, j]
        boxes_j = pred_per_class[:, j]
        valid = roi_valid & (scores_j > score_thresh)
        sb, ss, sv = nms_select(boxes_j, scores_j, nms_thresh, max_per_image,
                                valid=valid)
        return sb, ss, sv

    cls_ids = jnp.arange(1, num_classes)  # skip background (test_net.py:277)
    sb, ss, sv = jax.vmap(
        lambda j: one_class(j)
    )(cls_ids)                                                     # [C-1, M, ...]

    flat_scores = jnp.where(sv, ss, -1.0).reshape(-1)
    top_scores, top_idx = jax.lax.top_k(flat_scores, max_per_image)
    # a non-negative threshold also drops the -1.0 invalid-lane sentinel;
    # enforce it (trace-time, free) rather than rely on callers
    assert score_thresh >= 0.0, (
        f"score_thresh must be >= 0 (the -1.0 invalid-lane sentinel relies "
        f"on it), got {score_thresh}")
    out_valid = top_scores > score_thresh
    cls_of = top_idx // max_per_image + 1
    out_boxes = sb.reshape(-1, 4)[top_idx]
    return out_boxes, top_scores, cls_of.astype(jnp.int32), out_valid


def detections_to_all_boxes(det_batches, num_classes: int):
    """Convert per-image (boxes, scores, classes, valid) into the reference's
    all_boxes[cls][img] = [N, 5] numpy structure (test_net.py:203-307)."""
    import numpy as np

    num_images = len(det_batches)
    all_boxes = [[np.empty((0, 5), dtype=np.float32) for _ in range(num_images)]
                 for _ in range(num_classes)]
    for i, (boxes, scores, classes, valid) in enumerate(det_batches):
        boxes = np.asarray(boxes)
        scores = np.asarray(scores)
        classes = np.asarray(classes)
        valid = np.asarray(valid)
        for j in range(1, num_classes):
            sel = valid & (classes == j)
            dets = np.concatenate(
                [boxes[sel], scores[sel, None]], axis=1
            ).astype(np.float32)
            all_boxes[j][i] = dets
    return all_boxes
