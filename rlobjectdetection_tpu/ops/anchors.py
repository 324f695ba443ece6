"""Anchor generation.

Reference semantics: /root/reference/lib/model/rpn/generate_anchors.py:45-105
(ratio-enum then scale-enum around a ``base_size`` × ``base_size`` window with the
Caffe "+1 width" convention). The golden 9-anchor matrix from
generate_anchors.py:29-37 is the regression oracle (see tests/test_anchors.py).

Anchors are static given the config, so they are computed in numpy at trace time
and baked into the jitted program as constants.
"""

from __future__ import annotations

import functools

import numpy as np


def _whctrs(anchor: np.ndarray):
    w = anchor[2] - anchor[0] + 1.0
    h = anchor[3] - anchor[1] + 1.0
    x_ctr = anchor[0] + 0.5 * (w - 1.0)
    y_ctr = anchor[1] + 0.5 * (h - 1.0)
    return w, h, x_ctr, y_ctr


def _mkanchors(ws: np.ndarray, hs: np.ndarray, x_ctr: float, y_ctr: float):
    ws = ws[:, None]
    hs = hs[:, None]
    return np.hstack(
        (
            x_ctr - 0.5 * (ws - 1.0),
            y_ctr - 0.5 * (hs - 1.0),
            x_ctr + 0.5 * (ws - 1.0),
            y_ctr + 0.5 * (hs - 1.0),
        )
    )


def _ratio_enum(anchor: np.ndarray, ratios: np.ndarray):
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    size = w * h
    size_ratios = size / ratios
    ws = np.round(np.sqrt(size_ratios))
    hs = np.round(ws * ratios)
    return _mkanchors(ws, hs, x_ctr, y_ctr)


def _scale_enum(anchor: np.ndarray, scales: np.ndarray):
    w, h, x_ctr, y_ctr = _whctrs(anchor)
    ws = w * scales
    hs = h * scales
    return _mkanchors(ws, hs, x_ctr, y_ctr)


@functools.lru_cache(maxsize=None)
def _generate_anchors_cached(base_size, ratios, scales) -> np.ndarray:
    ratios = np.array(ratios, dtype=np.float64)
    scales = np.array(scales, dtype=np.float64)
    base_anchor = np.array([1, 1, base_size, base_size], dtype=np.float64) - 1
    ratio_anchors = _ratio_enum(base_anchor, ratios)
    anchors = np.vstack(
        [_scale_enum(ratio_anchors[i, :], scales) for i in range(ratio_anchors.shape[0])]
    )
    return anchors.astype(np.float32)


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
