"""Anchor generation.

Behavioral counterpart of /root/reference/lib/model/rpn/generate_anchors.py:
45-105 (ratio enumeration then scale enumeration around a ``base_size`` ×
``base_size`` window with the Caffe "+1 width" convention). Implemented here
in closed form with one broadcast rather than the reference's per-anchor
helper cascade; the golden 9-anchor matrix from generate_anchors.py:29-37 is
the regression oracle (see tests/test_geometry.py).

Anchors are static given the config, so they are computed in numpy at trace
time and baked into the jitted program as constants.
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def _generate_anchors_cached(base_size, ratios, scales) -> np.ndarray:
    ratios = np.asarray(ratios, dtype=np.float64)
    scales = np.asarray(scales, dtype=np.float64)
    # Ratio step: pick integer (w, h) whose area approximates base_size² at
    # each aspect ratio — w = round(sqrt(area/ratio)), h = round(w·ratio).
    # The rounding happens BEFORE scaling (so every scaled anchor of one
    # ratio shares the same aspect quantization, a property the golden
    # matrix encodes).
    area = float(base_size) ** 2
    w_r = np.round(np.sqrt(area / ratios))              # [R]
    h_r = np.round(w_r * ratios)                        # [R]
    # Scale step: multiply each ratio window by every scale; layout is
    # ratio-major, scale-minor like the reference's vstack-over-ratios.
    ws = (w_r[:, None] * scales[None, :]).reshape(-1)   # [R·S]
    hs = (h_r[:, None] * scales[None, :]).reshape(-1)
    # All windows share the base window's center under the +1 convention;
    # (x1, y1, x2, y2) = ctr ∓ (len-1)/2.
    ctr = (base_size - 1) / 2.0
    half_w = (ws - 1.0) / 2.0
    half_h = (hs - 1.0) / 2.0
    out = np.stack([ctr - half_w, ctr - half_h, ctr + half_w, ctr + half_h],
                   axis=1)
    return out.astype(np.float32)


def generate_anchors(base_size: int = 16, ratios=(0.5, 1, 2), scales=(8, 16, 32)) -> np.ndarray:
    """[A, 4] base anchor windows (x1, y1, x2, y2) around a base_size² window."""
    return _generate_anchors_cached(base_size, tuple(ratios), tuple(scales)).copy()


def shifted_anchors(feat_height: int, feat_width: int, feat_stride: int,
                    ratios=(0.5, 1, 2), scales=(8, 16, 32)) -> np.ndarray:
    """All anchors for a feature map, shape [H*W*A, 4].

    Row order matches the reference's `anchors.view(1,A,4) + shifts.view(K,1,4)`
    (proposal_layer.py:90-93): shift-major (row-major over the H×W grid), anchor-minor.
    That ordering must match the (H, W, A·4) layout of the RPN conv outputs after the
    NHWC reshape used in models/rpn.py.
    """
    base = generate_anchors(ratios=ratios, scales=scales)
    shift_x = np.arange(0, feat_width) * feat_stride
    shift_y = np.arange(0, feat_height) * feat_stride
    sx, sy = np.meshgrid(shift_x, shift_y)
    shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
    all_anchors = base[None, :, :] + shifts[:, None, :].astype(np.float32)
    return all_anchors.reshape(-1, 4).astype(np.float32)
