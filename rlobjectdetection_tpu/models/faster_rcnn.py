"""Faster R-CNN detector: one flax module, one jitted step.

Rebuild of _fasterRCNN (/root/reference/lib/model/faster_rcnn/faster_rcnn.py:19-136):
backbone → RPN → proposal layer → (train: proposal-target sampling) → RoI feature
extraction (pool | align | crop, switched by cfg.POOLING_MODE, l.72-83) → head →
class scores + per-class box regression (gathered by roi label in training,
l.89-98) → CE + smooth-L1 losses (l.103-108).

Unlike the reference — where proposal generation and target sampling run as
no-grad numpy/CUDA "layers" outside autograd — everything here lives inside one
jitted function with stop_gradient at the same boundaries, so the entire train
step compiles to a single XLA program (no host sync anywhere).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import Config
from ..ops.roi_align import roi_align_avg
from ..ops.roi_align_vjp import roi_align_avg_cvjp
from ..ops.roi_crop import roi_crop
from ..ops.roi_pool import roi_pool
from .backbones.resnet import ResNetBase, ResNetHead
from .backbones.vgg import VGGBase, VGGHead
from .losses import smooth_l1_loss, softmax_cross_entropy
from .rpn import RPNHead, proposal_layer, rpn_fg_probs
from .targets import anchor_target, proposal_target


class TinyBase(nn.Module):
    """4-stage stride-16 conv stack (64 ch) — test-only backbone."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x * (1.0 / 128.0)  # tame raw pixel scale (no pretrained stats here)
        for i in range(4):
            x = nn.Conv(64, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                        dtype=self.dtype, name=f"stem{i}")(x)
            x = nn.relu(x)
        return x


class TinyHead(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pooled):
        x = pooled.mean(axis=(1, 2))
        x = nn.Dense(256, dtype=self.dtype, name="fc")(x)
        return nn.relu(x)


class FasterRCNN(nn.Module):
    """backbone ∈ {vgg16, resnet101, resnet50, ..., tiny (tests)}."""

    num_classes: int
    backbone: str = "resnet101"
    class_agnostic: bool = False
    cfg: Config = Config()

    def setup(self):
        dtype = jnp.bfloat16 if self.cfg.DTYPE == "bfloat16" else jnp.float32
        self._dtype = dtype
        num_anchors = len(self.cfg.ANCHOR_SCALES) * len(self.cfg.ANCHOR_RATIOS)
        if self.backbone == "vgg16":
            self.base = VGGBase(dtype=dtype,
                                conv1_fused=self.cfg.CONV1_FUSED,
                                stem_interpret=self.cfg.STEM_INTERPRET)
            self.head = VGGHead(dtype=dtype)
            self.dout_base = 512
        elif self.backbone == "tiny":
            # small conv backbone for tests/CI — no reference counterpart
            self.base = TinyBase(dtype=dtype)
            self.head = TinyHead(dtype=dtype)
            self.dout_base = 64
        elif self.backbone.startswith("resnet"):
            layers = int(self.backbone[len("resnet"):])
            self.base = ResNetBase(num_layers=layers, dtype=dtype, remat=self.cfg.REMAT,
                                   conv1_s2d=self.cfg.CONV1_S2D,
                                   conv1_fused=self.cfg.CONV1_FUSED,
                                   layer1_fused=self.cfg.LAYER1_FUSED,
                                   stages_fused=self.cfg.STAGE_FUSED,
                                   stem_interpret=self.cfg.STEM_INTERPRET,
                                   frozen_stages=self.cfg.RESNET.FIXED_BLOCKS)
            self.head = ResNetHead(num_layers=layers, dtype=dtype)
            self.dout_base = 1024
        else:
            raise ValueError(f"unknown backbone {self.backbone}")
        self.rpn = RPNHead(num_anchors=num_anchors, dtype=dtype)
        # normal(0, 0.01) / normal(0, 0.001) head init (faster_rcnn.py:130-131)
        self.cls_score = nn.Dense(
            self.num_classes, dtype=dtype,
            kernel_init=nn.initializers.normal(stddev=0.01), name="RCNN_cls_score",
        )
        out_box = 4 if self.class_agnostic else 4 * self.num_classes
        self.bbox_pred = nn.Dense(
            out_box, dtype=dtype,
            kernel_init=nn.initializers.normal(stddev=0.001), name="RCNN_bbox_pred",
        )

    def extract_roi_features(self, base_feat, rois_flat):
        """Pooling-mode dispatch (faster_rcnn.py:72-83). rois_flat: [B*R, 5].

        Features stay in the compute dtype (bf16 halves the gather bandwidth of
        the hot roi_align path); interpolation weights are f32 and promote.
        """
        c = self.cfg
        mode = c.POOLING_MODE
        if mode == "align":
            # autodiff: ~4% faster steps at bs2; cvjp (sorted-scatter backward,
            # ops/roi_align_vjp.py) compiles minutes faster; pallas (fused
            # MXU-matmul forward, ops/roi_align_pallas.py) measured 3.1 vs
            # 2.4 ms at bench shapes — kept opt-in, see DESIGN.md
            if c.ALIGN_IMPL == "pallas":
                from ..ops.roi_align_pallas import roi_align_avg_pallas

                rpi = rois_flat.shape[0] // base_feat.shape[0]
                pooled = roi_align_avg_pallas(base_feat, rois_flat,
                                              c.POOLING_SIZE, 1.0 / 16.0, rpi)
            else:
                align = roi_align_avg if c.ALIGN_IMPL == "autodiff" else roi_align_avg_cvjp
                pooled = align(base_feat, rois_flat, c.POOLING_SIZE, 1.0 / 16.0)
        elif mode == "pool":
            pooled = roi_pool(base_feat, rois_flat, c.POOLING_SIZE, c.POOLING_SIZE, 1.0 / 16.0)
        elif mode == "crop":
            grid = c.POOLING_SIZE * 2 if c.CROP_RESIZE_WITH_MAX_POOL else c.POOLING_SIZE
            pooled = roi_crop(base_feat, rois_flat, grid, 1.0 / 16.0,
                              max_pool=c.CROP_RESIZE_WITH_MAX_POOL)
        else:
            raise ValueError(f"unknown POOLING_MODE {mode}")
        return pooled.astype(self._dtype)

    def __call__(self, im_data, im_info, gt_boxes=None, num_boxes=None, *,
                 train: bool = False):
        """im_data: [B, H, W, 3] (BGR, pixel-mean-subtracted — blob convention);
        im_info: [B, 3] (h, w, scale); gt_boxes: [B, G, 5]; num_boxes: [B].

        Returns a dict: rois [B, R, 5], cls_prob [B, R, C], bbox_pred [B, R, 4K],
        losses (train), rois_label [B, R] (train), roi_valid [B, R].
        """
        c = self.cfg
        b = im_data.shape[0]

        # the bases own the compute-dtype cast: their fused Pallas stems fold
        # it into the kernel's flatten-pad, the plain paths cast at entry
        if isinstance(self.base, ResNetBase):
            # eval computes no gradients, so frozen-stage fusion (STAGE_FUSED)
            # applies regardless of FIXED_BLOCKS
            base_feat = self.base(im_data, fwd_only=not train)
        elif isinstance(self.base, VGGBase):
            base_feat = self.base(im_data)
        else:
            base_feat = self.base(im_data.astype(self._dtype))
        rpn_cls, rpn_delta = self.rpn(base_feat)
        num_anchors = self.rpn.num_anchors
        fg_probs = rpn_fg_probs(rpn_cls, num_anchors)

        phase = c.TRAIN if train else c.TEST
        rois, roi_scores, roi_valid = proposal_layer(
            jax.lax.stop_gradient(fg_probs),
            jax.lax.stop_gradient(rpn_delta),
            im_info,
            feat_stride=c.FEAT_STRIDE[0],
            anchor_scales=c.ANCHOR_SCALES,
            anchor_ratios=c.ANCHOR_RATIOS,
            pre_nms_top_n=phase.RPN_PRE_NMS_TOP_N,
            post_nms_top_n=phase.RPN_POST_NMS_TOP_N,
            nms_thresh=phase.RPN_NMS_THRESH,
            nms_tile=c.NMS_TILE,
        )

        out = {}
        rpn_loss_cls = rpn_loss_box = jnp.float32(0.0)
        rois_label = None

        if train:
            # TRAIN.RPN_POSITIVE_WEIGHT: only the uniform branch (< 0) exists
            # — the reference's non-uniform branch is dead/broken code
            # (anchor_target_layer.py:154-163 uses undefined variables,
            # SURVEY §2.7), so a >= 0 setting is rejected loudly rather than
            # silently ignored
            assert self.cfg.TRAIN.RPN_POSITIVE_WEIGHT < 0, (
                "RPN_POSITIVE_WEIGHT >= 0 (non-uniform anchor weighting) is "
                "not implemented — the reference branch is broken upstream")
            at_key = self.make_rng("sampling")
            pt_key = self.make_rng("sampling")
            feat_hw = (base_feat.shape[1], base_feat.shape[2])

            at = anchor_target(
                at_key, feat_hw, gt_boxes, im_info,
                feat_stride=c.FEAT_STRIDE[0],
                anchor_scales=c.ANCHOR_SCALES,
                anchor_ratios=c.ANCHOR_RATIOS,
                rpn_batch_size=c.TRAIN.RPN_BATCHSIZE,
                fg_fraction=c.TRAIN.RPN_FG_FRACTION,
                positive_overlap=c.TRAIN.RPN_POSITIVE_OVERLAP,
                negative_overlap=c.TRAIN.RPN_NEGATIVE_OVERLAP,
                clobber_positives=c.TRAIN.RPN_CLOBBER_POSITIVES,
            )
            # RPN classification loss over sampled anchors. Scores per anchor as
            # 2-way logits in the same flat (h, w, a) order as the targets.
            bg = rpn_cls[..., :num_anchors].reshape(b, -1)
            fg = rpn_cls[..., num_anchors:].reshape(b, -1)
            logits2 = jnp.stack([bg, fg], axis=-1)                  # [B, N, 2]
            valid = at.labels >= 0
            rpn_loss_cls = softmax_cross_entropy(
                logits2, jnp.maximum(at.labels, 0), valid
            )
            rpn_delta_flat = rpn_delta.astype(jnp.float32).reshape(b, -1, 4)
            rpn_loss_box = smooth_l1_loss(
                rpn_delta_flat, at.bbox_targets, at.bbox_inside_weights,
                at.bbox_outside_weights, sigma=3.0, reduce_dims=(1, 2),
            )

            pt = proposal_target(
                pt_key, jax.lax.stop_gradient(rois), gt_boxes,
                rois_per_image=c.TRAIN.BATCH_SIZE,
                fg_fraction=c.TRAIN.FG_FRACTION,
                fg_thresh=c.TRAIN.FG_THRESH,
                bg_thresh_hi=c.TRAIN.BG_THRESH_HI,
                bg_thresh_lo=c.TRAIN.BG_THRESH_LO,
                bbox_normalize_means=c.TRAIN.BBOX_NORMALIZE_MEANS,
                bbox_normalize_stds=c.TRAIN.BBOX_NORMALIZE_STDS,
                bbox_inside_weights=c.TRAIN.BBOX_INSIDE_WEIGHTS,
                normalize_targets=c.TRAIN.BBOX_NORMALIZE_TARGETS_PRECOMPUTED,
            )
            rois = pt.rois
            rois_label = pt.labels
            roi_valid = jnp.ones(rois.shape[:2], dtype=bool)

        r = rois.shape[1]
        rois_flat = jax.lax.stop_gradient(rois.reshape(-1, 5))
        pooled = self.extract_roi_features(base_feat, rois_flat)

        if self.backbone == "vgg16":
            feat = self.head(pooled, train=train)
        else:
            feat = self.head(pooled)                                 # [B*R, D]

        cls_score = self.cls_score(feat).astype(jnp.float32)         # [B*R, C]
        bbox_pred = self.bbox_pred(feat).astype(jnp.float32)         # [B*R, 4K]

        if train and not self.class_agnostic:
            # select the regression group of each roi's label (faster_rcnn.py:91-95)
            # via one-hot einsum — its backward is another einsum, avoiding the
            # gather-transpose scatter (a TPU compile-time tarpit here)
            bp = bbox_pred.reshape(-1, self.num_classes, 4)
            sel = jax.nn.one_hot(rois_label.reshape(-1), self.num_classes,
                                 dtype=bp.dtype)
            bbox_pred_sel = jnp.einsum("ncd,nc->nd", bp, sel)
        else:
            bbox_pred_sel = bbox_pred

        cls_prob = jax.nn.softmax(cls_score, axis=-1)

        loss_cls = loss_bbox = jnp.float32(0.0)
        if train:
            loss_cls = softmax_cross_entropy(cls_score, rois_label.reshape(-1))
            loss_bbox = smooth_l1_loss(
                bbox_pred_sel,
                pt.bbox_targets.reshape(-1, 4),
                pt.bbox_inside_weights.reshape(-1, 4),
                pt.bbox_outside_weights.reshape(-1, 4),
                sigma=1.0, reduce_dims=(-1,),
            )

        out.update(
            rois=rois,
            roi_valid=roi_valid,
            cls_prob=cls_prob.reshape(b, r, -1),
            bbox_pred=(bbox_pred_sel if train else bbox_pred).reshape(b, r, -1),
            rpn_loss_cls=rpn_loss_cls,
            rpn_loss_box=rpn_loss_box,
            rcnn_loss_cls=loss_cls,
            rcnn_loss_bbox=loss_bbox,
            rois_label=rois_label,
        )
        return out


def build_model(backbone: str, num_classes: int, cfg: Config,
                class_agnostic: bool = False) -> FasterRCNN:
    return FasterRCNN(num_classes=num_classes, backbone=backbone,
                      class_agnostic=class_agnostic, cfg=cfg)
