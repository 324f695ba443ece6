"""RL action-value network: ResNet-101 trunk + RoIAlignAvg + action head.

Rebuild of /root/reference/lib/model/Reinforcement/resnet.py:105-199: trunk =
conv1..layer3 (frozen in training, l.139-147); RoIAlignAvg 7×7 at 1/16 on the
proposals (l.122, 180); layer4 with STRIDE 1 (l.120 — unlike the detector) +
global mean pool; fc8 (2048→4096) + ReLU + fc (4096→num_acts) (l.124-125,
188-190); weighted-MSE loss vs ±1 targets (l.195-199).

Training warm-starts the trunk from the detector checkpoint with strict=False
(trainval_net.py:96-99) — here: copy the matching subtree of the detector's
param pytree.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ...ops.roi_align import roi_align_avg
from ..backbones.resnet import ResNetBase, ResNetHead
from ..losses import weighted_mse_loss


class RLPolicyNet(nn.Module):
    num_acts: int = 56
    num_layers: int = 101
    dtype: Any = jnp.float32
    # Pallas fused stem (ops/stem_pallas.py); safe here because conv1/bn1 are
    # frozen (forward-only contract). Single-device TPU only, like the
    # detector's CONV1_FUSED.
    conv1_fused: bool = False
    layer1_fused: bool = False
    # Pallas fused layer2/layer3 (ops/res_stage_pallas.py): always safe here
    # because the whole conv1..layer3 trunk is frozen. 0 = off, 2, or 3.
    stages_fused: int = 0
    stem_interpret: bool = False

    def setup(self):
        # conv1..layer3 are frozen (Reinforcement/resnet.py:139-147):
        # frozen_stages=3 cuts the gradient at the C4 boundary so XLA deletes
        # the entire backbone backward, as torch autograd does upstream.
        self.base = ResNetBase(num_layers=self.num_layers, dtype=self.dtype,
                               frozen_stages=3, conv1_fused=self.conv1_fused,
                               layer1_fused=self.layer1_fused,
                               stages_fused=self.stages_fused,
                               stem_interpret=self.stem_interpret)
        # stride-1 layer4 (l.120); its BN affine TRAINS upstream —
        # freeze_layer (l.139-147) covers only conv1..layer3, so layer4 BN
        # weight/bias sit in the reference optimizer's param groups. Frozen
        # running statistics (batch-stat updates not replicated — PARITY.md).
        self.head = ResNetHead(num_layers=self.num_layers, dtype=self.dtype,
                               stride=1, bn_affine_trainable=True)
        self.fc8 = nn.Dense(4096, dtype=self.dtype, name="fc8")
        self.fc = nn.Dense(self.num_acts, dtype=self.dtype, name="fc")

    def __call__(self, img, bboxes, targets=None, weights=None, num_dts=None):
        """img: [B, H, W, 3] RGB normalized; bboxes: [B, N, 5+]
        (batch_id, x1, y1, x2, y2, ...); targets/weights: [B, N, num_acts];
        num_dts: optional [B] true detection counts — when given, the loss
        mean divides by B·max(num_dts)·A, the reference's exact-batch-max
        padding denominator (the collate's 16-quantized N would otherwise
        shrink the loss by a varying per-batch factor).

        Returns (pred [B·N, num_acts], loss, noweight_loss) — loss terms 0 when
        targets is None.
        """
        rois = bboxes.reshape(-1, bboxes.shape[-1])[:, :5].astype(jnp.float32)
        # uncast: ResNetBase owns the compute-dtype cast (the fused stem folds
        # it into the kernel's flatten-pad; the plain path casts at entry)
        x = self.base(img)
        # keep the trunk dtype through the gather: bf16 halves the bandwidth
        # of the hot roi_align corner reads; interpolation ratios are f32 and
        # promote inside roi_align_impl (same measured choice as
        # faster_rcnn.extract_roi_features)
        roi_feat = roi_align_avg(x, rois, 7, 1.0 / 16.0)
        pooled = self.head(roi_feat.astype(self.dtype))            # [B·N, 2048]
        h = nn.relu(self.fc8(pooled))
        pred = self.fc(h).astype(jnp.float32)                      # [B·N, A]

        if targets is None:
            return pred, jnp.float32(0.0), jnp.float32(0.0)
        t = targets.reshape(-1, self.num_acts)
        w = weights.reshape(-1, self.num_acts)
        denom = row_mask = None
        if num_dts is not None:
            max_true = jnp.maximum(jnp.max(num_dts), 1)
            denom = img.shape[0] * self.num_acts * max_true
            # rows beyond the exact batch max exist only because of the
            # 16-quantized collate; the reference's loss terms never see them
            slot_ok = jnp.arange(bboxes.shape[1]) < max_true      # [N]
            row_mask = jnp.tile(slot_ok, img.shape[0])            # [B·N]
        loss, noweight = weighted_mse_loss(pred, t, w, denom=denom,
                                           row_mask=row_mask)
        return pred, loss, noweight


def warm_start_from_detector(rl_params, detector_params):
    """Copy the detector's base (conv1..layer3) and head (layer4) into the RL
    net where shapes match — the strict=False torch.load of trainval_net.py:96-99.
    """
    import jax

    out = jax.tree_util.tree_map(lambda x: x, rl_params)  # copy structure
    for key in ("base", "head"):
        if key in detector_params and key in out:
            src_flat = jax.tree_util.tree_flatten_with_path(detector_params[key])[0]
            dst = out[key]
            for path, val in src_flat:
                node = dst
                ok = True
                for p in path[:-1]:
                    k = p.key
                    if k not in node:
                        ok = False
                        break
                    node = node[k]
                if ok:
                    leaf_key = path[-1].key
                    if leaf_key in node and node[leaf_key].shape == val.shape:
                        node[leaf_key] = val
    return out
