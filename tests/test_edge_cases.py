"""Edge-case robustness: empty/degenerate inputs through the fixed-shape ops."""

import numpy as np
import jax
import jax.numpy as jnp

from rlobjectdetection_tpu.models.targets import anchor_target, proposal_target
from rlobjectdetection_tpu.ops import nms_select, roi_align
from rlobjectdetection_tpu.engine import postprocess_detections


def test_nms_select_all_invalid():
    boxes = jnp.zeros((16, 4))
    scores = jnp.zeros((16,))
    valid = jnp.zeros((16,), dtype=bool)
    b, s, v = nms_select(boxes, scores, 0.5, max_out=8, valid=valid)
    assert not np.asarray(v).any()
    assert (np.asarray(b) == 0).all()


def test_nms_select_single_box():
    boxes = jnp.asarray([[10.0, 10.0, 50.0, 50.0]])
    scores = jnp.asarray([0.9])
    b, s, v = nms_select(boxes, scores, 0.5, max_out=4)
    assert np.asarray(v).sum() == 1
    np.testing.assert_allclose(np.asarray(b)[0], [10, 10, 50, 50])


def test_roi_align_zero_padded_rois():
    """Zero rois (the proposal layer's padding) must produce finite output."""
    feat = jnp.ones((1, 8, 8, 4))
    rois = jnp.zeros((5, 5))
    out = roi_align(feat, rois, 7, 7, 1.0)
    assert np.isfinite(np.asarray(out)).all()


def test_anchor_target_no_gt():
    """All-padding gt (boxless image after filtering edge cases) — no positives,
    only background labels, zero bbox targets."""
    key = jax.random.PRNGKey(0)
    gt = jnp.zeros((1, 4, 5))
    im_info = jnp.asarray([[160.0, 160.0, 1.0]])
    at = anchor_target(key, (10, 10), gt, im_info, feat_stride=16,
                       anchor_scales=(2, 3, 5), anchor_ratios=(0.5, 1, 2))
    labels = np.asarray(at.labels)
    assert (labels != 1).all()
    assert (labels == 0).sum() > 0        # background sampled
    assert np.isfinite(np.asarray(at.bbox_targets)).all()
    assert (np.asarray(at.bbox_inside_weights) == 0).all()


def test_proposal_target_no_gt():
    """No valid gt: the degenerate fallback labels everything background."""
    key = jax.random.PRNGKey(1)
    rois = np.zeros((1, 16, 5), dtype=np.float32)
    rois[0, :, 1:5] = np.random.RandomState(0).rand(16, 4) * 100
    rois[0, :, 3:5] += 120
    gt = jnp.zeros((1, 3, 5))
    pt = proposal_target(key, jnp.asarray(rois), gt, rois_per_image=8)
    assert (np.asarray(pt.labels) == 0).all()
    assert np.isfinite(np.asarray(pt.bbox_targets)).all()


def test_postprocess_score_threshold():
    rng = np.random.RandomState(0)
    r, c = 16, 3
    rois = np.zeros((r, 5), dtype=np.float32)
    rois[:, 1:3] = rng.rand(r, 2) * 50
    rois[:, 3:5] = rois[:, 1:3] + 20
    # class-1 scores low, class-2 high
    probs = np.zeros((r, c), dtype=np.float32)
    probs[:, 0] = 0.2
    probs[:, 1] = 0.05
    probs[:, 2] = 0.75
    boxes, scores, classes, valid = postprocess_detections(
        jnp.asarray(rois), jnp.asarray(probs),
        jnp.zeros((r, 4 * c), jnp.float32), jnp.asarray([100.0, 100.0, 1.0]),
        jnp.ones((r,), dtype=bool), num_classes=c, max_per_image=8,
        score_thresh=0.1,
    )
    cl = np.asarray(classes)[np.asarray(valid)]
    assert (cl == 2).all()  # class 1 thresholded out


def test_postprocess_all_below_threshold():
    r, c = 8, 3
    rois = np.zeros((r, 5), dtype=np.float32)
    rois[:, 3:5] = 10
    probs = np.full((r, c), 1.0 / c, dtype=np.float32)
    boxes, scores, classes, valid = postprocess_detections(
        jnp.asarray(rois), jnp.asarray(probs),
        jnp.zeros((r, 4 * c), jnp.float32), jnp.asarray([100.0, 100.0, 1.0]),
        jnp.ones((r,), dtype=bool), num_classes=c, max_per_image=8,
        score_thresh=0.9,
    )
    assert not np.asarray(valid).any()
