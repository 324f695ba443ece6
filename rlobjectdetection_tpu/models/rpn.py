"""Region Proposal Network: head convs + fixed-shape proposal generation.

Reference: /root/reference/lib/model/rpn/rpn.py (head: 3×3 conv-512 + 1×1
2A-way cls / 4A-way bbox convs) and proposal_layer.py (decode + clip + top-k +
per-image NMS + pad to [B, post_nms_topN, 5]).

TPU redesign of the proposal path: the reference's per-image python loop with a
GPU NMS call (and its internal device↔host round trip,
nms_cuda_kernel.cu:117-154) becomes a single fused on-device pipeline —
decode → clip → batched top_k(pre_nms) → vmapped tiled NMS → masked top_k(post_nms)
— all fixed shapes, jit/vmap/shard_map friendly.

Channel layout matches torch NCHW checkpoints: the cls conv's 2A channels are
[A bg, A fg] (rpn.py:67 reshape semantics) and the bbox conv's 4A channels are
A groups of (dx, dy, dw, dh).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.anchors import shifted_anchors
from ..ops.boxes import bbox_transform_inv, clip_boxes
from ..ops.nms import nms_select


class RPNHead(nn.Module):
    """rpn conv + cls/bbox conv heads (rpn.py:28-36)."""

    num_anchors: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, base_feat):
        # normal(0, 0.01) init matches _init_weights (faster_rcnn.py:116-129)
        init = nn.initializers.normal(stddev=0.01)
        x = nn.Conv(512, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    kernel_init=init, name="RPN_Conv")(base_feat)
        x = nn.relu(x)
        cls_score = nn.Conv(2 * self.num_anchors, (1, 1), dtype=self.dtype,
                            kernel_init=init, name="RPN_cls_score")(x)
        bbox_pred = nn.Conv(4 * self.num_anchors, (1, 1), dtype=self.dtype,
                            kernel_init=init, name="RPN_bbox_pred")(x)
        return cls_score, bbox_pred


def rpn_fg_probs(cls_score: jnp.ndarray, num_anchors: int) -> jnp.ndarray:
    """Per-anchor foreground probability from the 2A-channel score map.

    cls_score: [B, H, W, 2A] with [A bg, A fg] channel split — the softmax pairs
    (bg_a, fg_a), reproducing the reference's (B, 2, A·H, W) reshape-softmax
    (rpn.py:46-69). Returns [B, H, W, A] float32.
    """
    s = cls_score.astype(jnp.float32)
    bg = s[..., :num_anchors]
    fg = s[..., num_anchors:]
    return jax.nn.sigmoid(fg - bg)  # softmax of a 2-way pair == sigmoid(diff)


def proposal_layer(
    fg_probs: jnp.ndarray,          # [B, H, W, A] fg probabilities
    bbox_deltas: jnp.ndarray,       # [B, H, W, 4A]
    im_info: jnp.ndarray,           # [B, 3] (h, w, scale) of each (scaled) image
    *,
    feat_stride: int,
    anchor_scales,
    anchor_ratios,
    pre_nms_top_n: int,
    post_nms_top_n: int,
    nms_thresh: float,
    nms_tile: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fixed-shape proposal generation (proposal_layer.py:49-165).

    Returns (rois [B, post_n, 5] with batch idx in col 0 zero-padded,
             roi_scores [B, post_n], roi_valid [B, post_n]).
    """
    b, h, w, a = fg_probs.shape
    anchors = jnp.asarray(shifted_anchors(h, w, feat_stride,
                                          ratios=tuple(anchor_ratios),
                                          scales=tuple(anchor_scales)))  # [H*W*A, 4]

    scores = fg_probs.reshape(b, h * w * a)
    deltas = bbox_deltas.astype(jnp.float32).reshape(b, h * w * a, 4)

    proposals = bbox_transform_inv(anchors[None].repeat(b, axis=0), deltas)
    proposals = clip_boxes(proposals, im_info[:, :2])                    # [B, N, 4]

    k = min(pre_nms_top_n, scores.shape[1]) if pre_nms_top_n > 0 else scores.shape[1]
    top_scores, top_idx = jax.lax.top_k(scores, k)                        # [B, K]
    top_boxes = jnp.take_along_axis(proposals, top_idx[..., None], axis=1)

    def per_image(boxes_i, scores_i):
        return nms_select(boxes_i, scores_i, nms_thresh, post_nms_top_n,
                          tile_size=nms_tile)

    sel_boxes, sel_scores, sel_valid = jax.vmap(per_image)(top_boxes, top_scores)

    batch_col = jnp.broadcast_to(
        jnp.arange(b, dtype=sel_boxes.dtype)[:, None, None], (b, post_nms_top_n, 1)
    )
    rois = jnp.concatenate([batch_col, sel_boxes], axis=2)
    return rois, sel_scores, sel_valid


def anchors_for_feat(h: int, w: int, feat_stride: int, scales, ratios) -> np.ndarray:
    return shifted_anchors(h, w, feat_stride, ratios=tuple(ratios), scales=tuple(scales))
