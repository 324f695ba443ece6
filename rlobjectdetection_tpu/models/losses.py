"""Loss functions.

Smooth-L1 mirrors _smooth_l1_loss (/root/reference/lib/model/utils/net_utils.py:73-87)
including its sigma/inside/outside-weight semantics and sum-then-mean dims;
cross entropies are masked fixed-shape equivalents of the reference's
index_select-then-F.cross_entropy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1_loss(bbox_pred, bbox_targets, bbox_inside_weights,
                   bbox_outside_weights, sigma: float = 1.0, reduce_dims=(-1,)):
    """net_utils.py:73-87. Sums over `reduce_dims`, then means the rest."""
    sigma_2 = sigma ** 2
    box_diff = bbox_pred - bbox_targets
    in_box_diff = bbox_inside_weights * box_diff
    abs_in = jnp.abs(in_box_diff)
    sign = (abs_in < 1.0 / sigma_2).astype(bbox_pred.dtype)
    in_loss = (in_box_diff ** 2) * (sigma_2 / 2.0) * sign + (abs_in - 0.5 / sigma_2) * (1.0 - sign)
    out_loss = bbox_outside_weights * in_loss
    loss = out_loss.sum(axis=tuple(reduce_dims))
    return loss.mean()


def softmax_cross_entropy(logits, labels, valid_mask=None):
    """Mean CE over valid entries.

    logits: [..., C]; labels: [...] int; valid_mask: [...] bool (None = all).
    Matches F.cross_entropy over the index_select'ed subset (rpn.py:96-99,
    faster_rcnn.py:104).
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # label-select as a one-hot reduction, not take_along_axis: the per-element
    # gather lowers to a scalar-core loop on TPU (measured 5 ms/step at
    # [8, 45600, 2] — the single most expensive non-conv op in the train step);
    # the iota-compare one-hot fuses elementwise and is exact.
    oh = jax.nn.one_hot(labels.astype(jnp.int32), logits.shape[-1], dtype=logp.dtype)
    ll = (logp * oh).sum(axis=-1)
    if valid_mask is None:
        return -ll.mean()
    valid = valid_mask.astype(jnp.float32)
    return -(ll * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def weighted_mse_loss(pred, targets, weights, denom=None, row_mask=None):
    """RL action-value loss (Reinforcement/resnet.py:195-199):
    mean((pred-t)²·w), plus the unweighted mean for logging.

    denom overrides the element count of the mean: the reference pads the
    detection axis to the EXACT batch max, so its mean divides by
    B·max_n·A. The TPU collate quantizes the axis to multiples of 16 for a
    bounded jit cache; dividing by the padded count would shrink the loss
    (and effective lr) by a per-batch factor, so callers pass the
    reference's denominator. row_mask ([rows] bool) zeroes the quantization
    padding out of the NUMERATOR too — the weighted term is already exact
    (padding weights are 0) but the unweighted logging term would otherwise
    count (pred-0)² garbage the reference never sees."""
    noweight = (pred - targets) ** 2
    if row_mask is not None:
        noweight = noweight * row_mask[:, None].astype(noweight.dtype)
    weighted = noweight * weights
    if denom is None:
        return weighted.mean(), noweight.mean()
    denom = jnp.maximum(denom.astype(jnp.float32), 1.0)
    return weighted.sum() / denom, noweight.sum() / denom
