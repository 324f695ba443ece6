"""Target-assignment layer behavior tests (distributional, not bitwise RNG parity)."""

import numpy as np
import jax
import jax.numpy as jnp

from rlobjectdetection_tpu.models.targets import anchor_target, proposal_target


def _gt(boxes_list, num_pad=8):
    g = np.zeros((len(boxes_list), num_pad, 5), dtype=np.float32)
    for i, bl in enumerate(boxes_list):
        for j, bx in enumerate(bl):
            g[i, j] = bx
    return jnp.asarray(g)


def test_anchor_target_basic():
    key = jax.random.PRNGKey(0)
    h, w = 20, 30
    gt = _gt([[(100, 100, 260, 260, 1.0)], [(50, 60, 120, 140, 2.0)]])
    im_info = jnp.asarray([[320.0, 480.0, 1.0]] * 2)
    at = anchor_target(
        key, (h, w), gt, im_info,
        feat_stride=16, anchor_scales=(8, 16, 32), anchor_ratios=(0.5, 1, 2),
    )
    n = h * w * 9
    assert at.labels.shape == (2, n)
    labels = np.asarray(at.labels)
    # sampled batch ≤ 256 per image, some positives exist (the best anchor per gt
    # is always labeled 1)
    for i in range(2):
        assert (labels[i] >= 0).sum() <= 256
        assert (labels[i] == 1).sum() >= 1
    # fg count capped at 128
    assert (labels == 1).sum(axis=1).max() <= 128
    # inside weights nonzero only on positives
    iw = np.asarray(at.bbox_inside_weights)
    assert ((iw.sum(axis=2) > 0) == (labels == 1)).all()
    # outside weights ≈ 1/num_examples on sampled entries
    ow = np.asarray(at.bbox_outside_weights)
    for i in range(2):
        num_ex = (labels[i] >= 0).sum()
        vals = ow[i][labels[i] >= 0][:, 0]
        np.testing.assert_allclose(vals, 1.0 / num_ex, rtol=1e-5)


def test_anchor_target_positive_for_exact_anchor_match():
    # gt exactly equal to an anchor → IoU 1 → labeled positive
    key = jax.random.PRNGKey(1)
    from rlobjectdetection_tpu.ops.anchors import shifted_anchors

    h, w = 10, 10
    anchors = shifted_anchors(h, w, 16)
    # pick an anchor fully inside the 160×160 image
    inside = (anchors[:, 0] >= 0) & (anchors[:, 1] >= 0) & (anchors[:, 2] < 160) & (anchors[:, 3] < 160)
    a = anchors[np.where(inside)[0][0]]
    gt = _gt([[(*a, 1.0)]])
    im_info = jnp.asarray([[160.0, 160.0, 1.0]])
    at = anchor_target(key, (h, w), gt, im_info, feat_stride=16,
                       anchor_scales=(8, 16, 32), anchor_ratios=(0.5, 1, 2))
    labels = np.asarray(at.labels)[0]
    idx = np.where(inside)[0][0]
    assert labels[idx] == 1


def test_proposal_target_composition():
    key = jax.random.PRNGKey(2)
    b, p = 2, 64
    rng = np.random.RandomState(0)
    rois = np.zeros((b, p, 5), dtype=np.float32)
    xy = rng.rand(b, p, 2) * 300
    wh = rng.rand(b, p, 2) * 100 + 10
    rois[..., 1:3] = xy
    rois[..., 3:5] = xy + wh
    gt = _gt(
        [[(40, 40, 160, 160, 3.0), (200, 200, 300, 290, 7.0)],
         [(10, 10, 90, 120, 1.0)]],
        num_pad=4,
    )
    pt = proposal_target(key, jnp.asarray(rois), gt, rois_per_image=32)
    assert pt.rois.shape == (b, 32, 5)
    labels = np.asarray(pt.labels)
    # fg fraction ≤ 25% of 32 = 8 when both pools exist
    assert (labels > 0).sum(axis=1).max() <= 8
    # batch index column correct
    np.testing.assert_array_equal(np.asarray(pt.rois)[..., 0],
                                  np.repeat(np.arange(b)[:, None], 32, axis=1))
    # gt boxes appended to pool → at least one fg per image (gt IoU with itself = 1)
    assert (labels > 0).sum(axis=1).min() >= 1
    # fg labels come from the matched gt class set
    assert set(np.unique(labels[0])) <= {0, 3, 7}
    assert set(np.unique(labels[1])) <= {0, 1}
    # inside weights only on fg rows; bbox targets zero on bg rows
    iw = np.asarray(pt.bbox_inside_weights)
    assert ((iw.sum(axis=2) > 0) == (labels > 0)).all()
    bt = np.asarray(pt.bbox_targets)
    assert (bt[labels == 0] == 0).all()


def test_proposal_target_fg_targets_decode_to_gt():
    # an fg roi's normalized target, un-normalized and decoded, must recover its gt
    key = jax.random.PRNGKey(3)
    gt_box = (40.0, 40.0, 160.0, 160.0)
    rois = np.zeros((1, 8, 5), dtype=np.float32)
    rois[0, :, 1:5] = [45, 38, 150, 168]  # IoU > 0.5 with gt
    gt = _gt([[(*gt_box, 5.0)]], num_pad=2)
    pt = proposal_target(key, jnp.asarray(rois), gt, rois_per_image=16)
    labels = np.asarray(pt.labels)[0]
    fg = labels > 0
    assert fg.any()
    from rlobjectdetection_tpu.ops.boxes import bbox_transform_inv

    t = np.asarray(pt.bbox_targets)[0][fg]
    t = t * np.array([0.1, 0.1, 0.2, 0.2]) + 0.0
    dec = np.asarray(
        bbox_transform_inv(jnp.asarray(np.asarray(pt.rois)[0][fg][:, 1:5]), jnp.asarray(t))
    )
    want = np.array(gt_box) + np.array([0, 0, 1, 1])  # decode's +1 convention
    np.testing.assert_allclose(dec, np.tile(want, (dec.shape[0], 1)), atol=0.1)


def test_random_keep_count_and_uniformity():
    # _random_keep must select exactly min(budget, |True set|) elements, and
    # the marginal inclusion probability must be uniform over the True set
    # (the reference subsamples with npr.permutation — uniform without
    # replacement, anchor_target_layer.py:131)
    from rlobjectdetection_tpu.models.targets import _random_keep

    n, budget, trials = 64, 8, 600
    mask = np.zeros(n, dtype=bool)
    true_idx = np.arange(0, n, 2)          # 32 eligible
    mask[true_idx] = True
    m = jnp.asarray(mask)
    counts = np.zeros(n)
    for t in range(trials):
        keep = np.asarray(_random_keep(jax.random.PRNGKey(t), m, budget, budget))
        assert keep.sum() == budget
        assert not keep[~mask].any()
        counts += keep
    p = counts[true_idx] / trials          # expect budget/32 = 0.25
    assert abs(p.mean() - 0.25) < 0.01
    assert p.min() > 0.15 and p.max() < 0.35   # ~5 sigma at 600 trials

    # budget larger than the pool keeps the whole pool; zero budget keeps none
    keep = np.asarray(_random_keep(jax.random.PRNGKey(0), m, 100, 64))
    np.testing.assert_array_equal(keep, mask)
    keep = np.asarray(_random_keep(jax.random.PRNGKey(0), m, 0, 64))
    assert not keep.any()


def test_proposal_target_gt_append_and_single_pool():
    # Both-pools case (bg_thresh_lo=0 admits the IoU-0 candidates as bg):
    # image 0's only fg candidate is the gt box itself, appended to the pool
    # (proposal_target_layer_cascade.py:39-43) → exactly 1 fg; image 1 has
    # 7 fg candidates but the fg quota is round(0.25·8) = 2.
    key = jax.random.PRNGKey(5)
    rois = np.zeros((2, 6, 5), dtype=np.float32)
    rois[0, :, 1:5] = [200, 200, 240, 240]
    rois[1, :, 1:5] = [40, 40, 160, 160]
    gt = np.zeros((2, 2, 5), dtype=np.float32)
    gt[:, 0] = [40, 40, 160, 160, 3]
    pt = proposal_target(key, jnp.asarray(rois), jnp.asarray(gt),
                         rois_per_image=8, bg_thresh_lo=0.0)
    labels = np.asarray(pt.labels)
    assert (labels[0] == 3).sum() == 1 and (labels[0] == 0).sum() == 7
    # image 1: every valid candidate is fg (zero-area pad rows join neither
    # pool) → the single-pool with-replacement fg path fills all slots
    # (l.169-180 semantics)
    assert (labels[1] == 3).all()
