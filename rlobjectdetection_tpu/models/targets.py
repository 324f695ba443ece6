"""Target assignment layers (train-time, no-grad) in pure jnp.

Rebuilds of:
  * _AnchorTargetLayer (/root/reference/lib/model/rpn/anchor_target_layer.py:31-218)
  * _ProposalTargetLayer (/root/reference/lib/model/rpn/proposal_target_layer_cascade.py:20-213)

The reference gathers "inside" anchors with dynamic `nonzero` and later unmaps;
here everything stays full-size with masks (outside anchors keep label −1 /
weight 0 — identical observable outputs). numpy-permutation subsampling becomes
jax.random uniform-priority top-k: the sampled *distribution* matches (uniform
without replacement); bitwise RNG parity is neither possible nor needed
(SURVEY.md §7 "RNG parity").

Known reference defects NOT replicated (SURVEY.md §2.7): the positive/negative
outside-weight normalizer is computed per image here rather than from the stale
loop variable of the last batch element (anchor_target_layer.py:154-163).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.anchors import shifted_anchors
from ..ops.boxes import bbox_overlaps_masked, bbox_transform

BIG_NEG = -1e9


def _random_keep(key, mask: jnp.ndarray, budget, k_max: int) -> jnp.ndarray:
    """Keep-mask of min(budget, mask.sum()) elements of the True set, chosen
    uniformly without replacement.

    Thresholds random priorities at their `budget`-th largest value instead of
    ranking via a full argsort: top_k(k_max) over N=H·W·A anchors is ~5× cheaper
    on TPU than the two 45k-element sorts it replaces (DESIGN.md round-2 step
    attribution). `budget` may be traced; it is clamped to the static `k_max`.
    """
    k_max = min(k_max, mask.shape[-1])   # tiny inputs: pool < k_max
    u = jax.random.uniform(key, mask.shape)
    pri = jnp.where(mask, u, BIG_NEG)
    top_vals, top_idx = jax.lax.top_k(pri, k_max)
    budget = jnp.clip(budget, 0, k_max)
    # Scatter the selected indices (distinct by construction) rather than
    # thresholding on the cutoff VALUE — float32 uniforms can tie at the
    # cutoff, and a value threshold would then keep budget+1 elements.
    sel = (jnp.arange(k_max) < budget) & (top_vals > BIG_NEG / 2)
    return jnp.zeros_like(mask).at[top_idx].set(sel, mode="drop")


class AnchorTargets(NamedTuple):
    labels: jnp.ndarray            # [B, N] in {-1, 0, 1}
    bbox_targets: jnp.ndarray      # [B, N, 4]
    bbox_inside_weights: jnp.ndarray   # [B, N, 4]
    bbox_outside_weights: jnp.ndarray  # [B, N, 4]


def anchor_target(
    key,
    feat_hw,                      # (H, W) static feature-map size
    gt_boxes: jnp.ndarray,        # [B, G, 5] (x1, y1, x2, y2, cls), zero-padded
    im_info: jnp.ndarray,         # [B, 3]
    *,
    feat_stride: int,
    anchor_scales,
    anchor_ratios,
    rpn_batch_size: int = 256,
    fg_fraction: float = 0.5,
    positive_overlap: float = 0.7,
    negative_overlap: float = 0.3,
    clobber_positives: bool = False,
    allowed_border: float = 0.0,
) -> AnchorTargets:
    """Anchor classification labels + regression targets over the full anchor grid.

    Label/bbox layout is flat [B, H·W·A] in (h, w, a) order — the same element
    order the reference's (B, A·4, H, W) tensors carry after its permutes, so the
    RPN loss consumes either identically.
    """
    h, w = feat_hw
    anchors = jnp.asarray(shifted_anchors(h, w, feat_stride,
                                          ratios=tuple(anchor_ratios),
                                          scales=tuple(anchor_scales)))
    n = anchors.shape[0]
    b = gt_boxes.shape[0]

    # Inside-image mask. Reference quirk preserved: bounds come from im_info[0]
    # for the whole batch (anchor_target_layer.py:85-88) — images in a batch are
    # padded to a common blob, so this keeps the anchor set batch-uniform.
    im_h, im_w = im_info[0, 0], im_info[0, 1]
    inside = (
        (anchors[:, 0] >= -allowed_border)
        & (anchors[:, 1] >= -allowed_border)
        & (anchors[:, 2] < im_w + allowed_border)
        & (anchors[:, 3] < im_h + allowed_border)
    )                                                               # [N]

    overlaps = bbox_overlaps_masked(
        jnp.broadcast_to(anchors[None], (b, n, 4)), gt_boxes
    )                                                               # [B, N, G]
    max_overlaps = overlaps.max(axis=2)                             # [B, N]
    argmax_overlaps = overlaps.argmax(axis=2)                       # [B, N]
    # The reference restricts the per-gt best-anchor search to INSIDE anchors
    # (it computes overlaps only over the inside subset,
    # anchor_target_layer.py:82-101): when a gt's globally-best anchor crosses
    # the border, the best *inside* anchor must still be force-labeled positive.
    overlaps_in = jnp.where(inside[None, :, None], overlaps, -1.0)
    gt_max = overlaps_in.max(axis=1)                                # [B, G]
    gt_max = jnp.where(gt_max == 0, 1e-5, gt_max)
    best_for_gt = (overlaps_in == gt_max[:, None, :]).sum(axis=2) > 0  # [B, N]

    labels = jnp.full((b, n), -1.0)
    if not clobber_positives:
        labels = jnp.where(max_overlaps < negative_overlap, 0.0, labels)
    labels = jnp.where(best_for_gt, 1.0, labels)
    labels = jnp.where(max_overlaps >= positive_overlap, 1.0, labels)
    if clobber_positives:
        labels = jnp.where(max_overlaps < negative_overlap, 0.0, labels)
    labels = jnp.where(inside[None, :], labels, -1.0)

    num_fg = int(fg_fraction * rpn_batch_size)
    kf, kb = jax.random.split(key)

    def subsample(labels_i, kf_i, kb_i):
        fg = labels_i == 1
        bg = labels_i == 0
        sum_fg = fg.sum()
        labels_i = jnp.where(fg & ~_random_keep(kf_i, fg, num_fg, num_fg),
                             -1.0, labels_i)
        # reference computes the bg budget from the PRE-subsample fg count
        # (anchor_target_layer.py:133)
        num_bg = rpn_batch_size - sum_fg
        labels_i = jnp.where(bg & ~_random_keep(kb_i, bg, num_bg, rpn_batch_size),
                             -1.0, labels_i)
        return labels_i

    labels = jax.vmap(subsample)(
        labels, jax.random.split(kf, b), jax.random.split(kb, b)
    )

    # Regression targets toward each anchor's argmax gt. Selection as a
    # one-hot contraction (exact: 0/1 weights): the equivalent
    # take_along_axis gather is a 2.1 ms/step scalar-core loop at [B, 45600]
    # on TPU, the einsum is one fused [N, G] @ [G, 4] pass.
    oh = jax.nn.one_hot(argmax_overlaps, gt_boxes.shape[1],
                        dtype=jnp.float32)                          # [B, N, G]
    matched_gt = jnp.einsum("bng,bgd->bnd", oh, gt_boxes[..., :4])  # [B, N, 4]
    bbox_targets = bbox_transform(jnp.broadcast_to(anchors[None], (b, n, 4)),
                                  matched_gt)

    inside_w = jnp.where((labels == 1)[..., None], 1.0, 0.0) * jnp.ones((4,))
    num_examples = jnp.maximum((labels >= 0).sum(axis=1), 1)        # per image
    uniform_w = (1.0 / num_examples)[:, None]
    outside_scalar = jnp.where(labels == 1, uniform_w, 0.0)
    outside_scalar = jnp.where(labels == 0, uniform_w, outside_scalar)
    outside_w = outside_scalar[..., None] * jnp.ones((4,))

    bbox_targets = jnp.where((labels != -1)[..., None] & inside[None, :, None],
                             bbox_targets, 0.0)
    return AnchorTargets(labels, bbox_targets, inside_w, outside_w)


class ProposalTargets(NamedTuple):
    rois: jnp.ndarray              # [B, R, 5] (batch_idx, x1, y1, x2, y2)
    labels: jnp.ndarray            # [B, R] int32 class labels (0 = bg)
    bbox_targets: jnp.ndarray      # [B, R, 4]
    bbox_inside_weights: jnp.ndarray   # [B, R, 4]
    bbox_outside_weights: jnp.ndarray  # [B, R, 4]


def proposal_target(
    key,
    all_rois: jnp.ndarray,         # [B, P, 5] proposals (batch idx col 0)
    gt_boxes: jnp.ndarray,         # [B, G, 5], zero-padded
    *,
    rois_per_image: int = 128,
    fg_fraction: float = 0.25,
    fg_thresh: float = 0.5,
    bg_thresh_hi: float = 0.5,
    bg_thresh_lo: float = 0.1,
    bbox_normalize_means=(0.0, 0.0, 0.0, 0.0),
    bbox_normalize_stds=(0.1, 0.1, 0.2, 0.2),
    bbox_inside_weights=(1.0, 1.0, 1.0, 1.0),
    normalize_targets: bool = True,
) -> ProposalTargets:
    """Sample rois_per_image rois/image with fg/bg balancing + regression targets.

    Mirrors proposal_target_layer_cascade.py: gt boxes are appended to the
    candidate pool (l.39-43); fg sampled without replacement (capped at
    fg_fraction·R), bg WITH replacement (l.141-205); bg labels clamped to 0;
    targets normalized by precomputed means/stds (l.96-113).
    """
    b, p, _ = all_rois.shape
    g = gt_boxes.shape[1]
    fg_rois_per_image = max(1, int(round(fg_fraction * rois_per_image)))

    gt_as_rois = jnp.concatenate(
        [jnp.zeros((b, g, 1)), gt_boxes[..., :4]], axis=2
    )
    cand = jnp.concatenate([all_rois, gt_as_rois], axis=1)          # [B, P+G, 5]
    n = p + g

    overlaps = bbox_overlaps_masked(cand[..., 1:5], gt_boxes)       # [B, N, G]
    max_overlaps = overlaps.max(axis=2)
    gt_assignment = overlaps.argmax(axis=2)
    labels_all = jnp.take_along_axis(gt_boxes[..., 4], gt_assignment, axis=1)

    fg_mask = max_overlaps >= fg_thresh
    bg_mask = (max_overlaps < bg_thresh_hi) & (max_overlaps >= bg_thresh_lo)

    def true_list(mask):
        # list[j] = index of the j-th True element (index order — the same
        # order the reference's `nonzero` pools carry); entries past
        # mask.sum() are untouched zeros. One cumsum + in-bounds scatter
        # instead of a full argsort (only with-replacement picks read it).
        rank = jnp.cumsum(mask) - 1
        dest = jnp.where(mask, rank, n)
        return jnp.zeros((n,), jnp.int32).at[dest].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop")

    def sample_one_v(ki, fg_m, bg_m, labels_i):
        # fg: first fg_this of a random-order fg list when both pools exist
        # (without replacement, proposal_target_layer_cascade.py:157-162);
        # single-pool cases and bg sample WITH replacement (l.169-196);
        # an image with neither pool (reference raises, l.201) falls back to
        # candidate 0 as background.
        k1, k3 = jax.random.split(ki, 2)
        fg_num = fg_m.sum()
        bg_num = bg_m.sum()
        # random order for without-replacement fg: top-R of random priorities
        # (only the first min(R, fg_num) slots are ever read; the pool itself
        # can be smaller than R on tiny inputs, so clamp the top_k width)
        k_rand = min(rois_per_image, n)
        fg_pri = jnp.where(fg_m, jax.random.uniform(k1, (n,)), BIG_NEG)
        fg_rand = jax.lax.top_k(fg_pri, k_rand)[1]
        fg_all = true_list(fg_m)
        bg_all = true_list(bg_m)

        both = (fg_num > 0) & (bg_num > 0)
        fg_this = jnp.where(
            both,
            jnp.minimum(fg_rois_per_image, fg_num),
            jnp.where(fg_num > 0, rois_per_image, 0),
        )
        slot = jnp.arange(rois_per_image)
        is_fg_slot = slot < fg_this
        u = jax.random.uniform(k3, (rois_per_image,))
        fg_wo = jnp.take(fg_rand, jnp.minimum(slot, jnp.maximum(
            jnp.minimum(fg_num, k_rand) - 1, 0)))
        # clamp: u*N can round UP to N in f32 when N is a power of two and u
        # is the maximal draw (1 - 2^-24) — jnp.take would then read past the
        # pool (the reference's f64 rand + np.floor cannot overflow)
        def wr_idx(u_, n_):
            return jnp.minimum((u_ * jnp.maximum(n_, 1)).astype(jnp.int32),
                               jnp.maximum(n_ - 1, 0))

        fg_wr = jnp.take(fg_all, wr_idx(u, fg_num))
        fg_pick = jnp.where(both, fg_wo, fg_wr)
        bg_pick = jnp.take(bg_all, wr_idx(u, bg_num))
        keep = jnp.where(is_fg_slot, fg_pick, bg_pick)
        keep = jnp.where((fg_num == 0) & (bg_num == 0), 0, keep)
        lab = jnp.take(labels_i, keep)
        lab = jnp.where(is_fg_slot, lab, 0.0)
        lab = jnp.where((fg_num == 0) & (bg_num == 0), 0.0, lab)
        return keep, lab, is_fg_slot

    keys = jax.random.split(key, b)
    keep_inds, labels, is_fg = jax.vmap(sample_one_v)(keys, fg_mask, bg_mask, labels_all)

    rois = jnp.take_along_axis(cand, keep_inds[..., None], axis=1)   # [B, R, 5]
    rois = rois.at[..., 0].set(jnp.arange(b, dtype=rois.dtype)[:, None])

    matched_gt = jnp.take_along_axis(
        gt_boxes, jnp.take_along_axis(gt_assignment, keep_inds, axis=1)[..., None],
        axis=1,
    )                                                                # [B, R, 5]
    targets = bbox_transform(rois[..., 1:5], matched_gt[..., :4])
    if normalize_targets:
        means = jnp.asarray(bbox_normalize_means)
        stds = jnp.asarray(bbox_normalize_stds)
        targets = (targets - means) / stds

    fg_sel = (labels > 0)[..., None]
    bbox_targets = jnp.where(fg_sel, targets, 0.0)
    inside_w = jnp.where(fg_sel, jnp.asarray(bbox_inside_weights), 0.0)
    outside_w = (inside_w > 0).astype(jnp.float32)

    return ProposalTargets(rois, labels.astype(jnp.int32), bbox_targets,
                           inside_w, outside_w)
