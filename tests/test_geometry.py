"""Geometry core tests: golden anchors + box transform round trips + IoU oracles."""

import numpy as np
import jax.numpy as jnp

from rlobjectdetection_tpu.ops import (
    bbox_overlaps,
    bbox_overlaps_masked,
    bbox_transform,
    bbox_transform_inv,
    clip_boxes,
    generate_anchors,
    shifted_anchors,
)

# Golden anchors: the reference python generator's actual output
# (/root/reference/lib/model/rpn/generate_anchors.py:45-105). Note the MATLAB
# matrix quoted in that file's comment (l.29-37) is 1-based — it is this matrix
# shifted by +1; the 0-based python output below is what the detector consumes.
GOLDEN_ANCHORS = np.array(
    [
        [-84., -40., 99., 55.],
        [-176., -88., 191., 103.],
        [-360., -184., 375., 199.],
        [-56., -56., 71., 71.],
        [-120., -120., 135., 135.],
        [-248., -248., 263., 263.],
        [-36., -80., 51., 95.],
        [-80., -168., 95., 183.],
        [-168., -344., 183., 359.],
    ],
    dtype=np.float32,
)


def test_golden_anchors():
    a = generate_anchors(base_size=16, ratios=(0.5, 1, 2), scales=(8, 16, 32))
    np.testing.assert_allclose(a, GOLDEN_ANCHORS, atol=1e-5)


def test_shifted_anchors_shape_and_order():
    a = shifted_anchors(2, 3, 16)
    assert a.shape == (2 * 3 * 9, 4)
    base = generate_anchors()
    # first 9 anchors are the base anchors (shift 0,0); next 9 shifted by x+16
    np.testing.assert_allclose(a[:9], base, atol=1e-5)
    np.testing.assert_allclose(a[9:18], base + np.array([16, 0, 16, 0]), atol=1e-5)
    # row-major over grid: anchor block at (y=1, x=0) starts at index 3*9
    np.testing.assert_allclose(a[27:36], base + np.array([0, 16, 0, 16]), atol=1e-5)


def _np_iou(boxes, query):
    n, k = boxes.shape[0], query.shape[0]
    out = np.zeros((n, k), dtype=np.float64)
    for i in range(n):
        for j in range(k):
            iw = min(boxes[i, 2], query[j, 2]) - max(boxes[i, 0], query[j, 0]) + 1
            ih = min(boxes[i, 3], query[j, 3]) - max(boxes[i, 1], query[j, 1]) + 1
            if iw > 0 and ih > 0:
                ab = (boxes[i, 2] - boxes[i, 0] + 1) * (boxes[i, 3] - boxes[i, 1] + 1)
                aq = (query[j, 2] - query[j, 0] + 1) * (query[j, 3] - query[j, 1] + 1)
                out[i, j] = iw * ih / (ab + aq - iw * ih)
    return out


def _rand_boxes(rng, n, size=200.0):
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * size / 2 + 1
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_bbox_overlaps_matches_numpy(rng):
    a = _rand_boxes(rng, 37)
    b = _rand_boxes(rng, 11)
    got = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, _np_iou(a, b), rtol=1e-5, atol=1e-6)


def test_bbox_overlaps_masked_sentinels(rng):
    a = _rand_boxes(rng, 5)
    a[2] = [10.0, 10.0, 10.0, 10.0]  # zero-area anchor (w=h=1 under +1)
    g = np.zeros((3, 5), dtype=np.float32)
    g[0, :4] = [0, 0, 50, 50]
    # g[1], g[2] are all-zero padding rows
    ov = np.asarray(bbox_overlaps_masked(jnp.asarray(a), jnp.asarray(g)))
    # anchor-zero mask (-1) is applied after gt-zero mask (0) and wins, matching
    # the reference's masked_fill_ order (bbox_transform.py:212-213)
    assert (ov[2, :] == -1).all()
    rows = [0, 1, 3, 4]
    assert (ov[rows, 1] == 0).all() and (ov[rows, 2] == 0).all()


def test_transform_roundtrip(rng):
    # Reference encode uses the +1 width convention but decode does not subtract
    # it back (bbox_transform.py:15-34 vs 77-103), so an exact round trip yields
    # (x1, y1, x2+1, y2+1). We reproduce that behavior bit-for-bit by spec.
    ex = _rand_boxes(rng, 64)
    gt = _rand_boxes(rng, 64)
    deltas = bbox_transform(jnp.asarray(ex), jnp.asarray(gt))
    rec = np.asarray(bbox_transform_inv(jnp.asarray(ex), deltas))
    want = gt + np.array([0.0, 0.0, 1.0, 1.0], dtype=np.float32)
    np.testing.assert_allclose(rec, want, rtol=1e-4, atol=1e-2)


def test_transform_inv_multiclass(rng):
    boxes = _rand_boxes(rng, 8)[None]  # [1, 8, 4]
    deltas = rng.randn(1, 8, 12).astype(np.float32) * 0.1
    out = np.asarray(bbox_transform_inv(jnp.asarray(boxes), jnp.asarray(deltas)))
    assert out.shape == (1, 8, 12)
    # each class group decodes independently
    one = np.asarray(bbox_transform_inv(jnp.asarray(boxes), jnp.asarray(deltas[..., 4:8])))
    np.testing.assert_allclose(out[..., 4:8], one, rtol=1e-5)


def test_clip_boxes(rng):
    boxes = (rng.rand(2, 10, 4).astype(np.float32) - 0.25) * 400
    im_hw = np.array([[100.0, 150.0], [220.0, 90.0]], dtype=np.float32)
    out = np.asarray(clip_boxes(jnp.asarray(boxes), jnp.asarray(im_hw)))
    for b in range(2):
        assert (out[b, :, 0::2] <= im_hw[b, 1] - 1).all()
        assert (out[b, :, 1::2] <= im_hw[b, 0] - 1).all()
        assert (out >= 0).all()
    # static tuple path
    out2 = np.asarray(clip_boxes(jnp.asarray(boxes[0:1]), (100, 150)))
    np.testing.assert_allclose(out2, out[0:1], rtol=1e-6)
