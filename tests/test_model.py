"""End-to-end model smoke tests on tiny shapes (CPU, 8 fake devices)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlobjectdetection_tpu.config import Config, TestConfig, TrainConfig
from rlobjectdetection_tpu.engine import (
    build_optimizer,
    create_train_state,
    make_train_step,
    postprocess_detections,
)
from rlobjectdetection_tpu.models import FasterRCNN


def tiny_cfg(**kw):
    # small proposal counts to keep CPU compile fast
    train = TrainConfig(RPN_PRE_NMS_TOP_N=256, RPN_POST_NMS_TOP_N=64, BATCH_SIZE=32)
    test = TestConfig(RPN_PRE_NMS_TOP_N=128, RPN_POST_NMS_TOP_N=32, MAX_DETS_PER_IMAGE=20)
    return Config(TRAIN=train, TEST=test, DTYPE="float32", NMS_TILE=64, **kw)


def jit_init(model, *args, train):
    # flax init un-jitted dispatches thousands of tiny eager CPU ops (~80s);
    # jitting it traces once
    key = jax.random.PRNGKey(0)
    rngs = {"params": key, "sampling": key, "dropout": key}
    return jax.jit(model.init, static_argnames="train")(rngs, *args, train=train)


def _batch(b=2, h=128, w=160, g=5):
    rng = np.random.RandomState(3)
    data = rng.randn(b, h, w, 3).astype(np.float32) * 10
    im_info = np.array([[h, w, 1.0]] * b, dtype=np.float32)
    gt = np.zeros((b, g, 5), dtype=np.float32)
    for i in range(b):
        for j in range(2):
            x1, y1 = rng.randint(0, w - 40), rng.randint(0, h - 40)
            gt[i, j] = [x1, y1, x1 + 30 + rng.randint(10), y1 + 30 + rng.randint(10),
                        1 + rng.randint(3)]
    num = np.full((b,), 2, dtype=np.int32)
    return {"data": data, "im_info": im_info, "gt_boxes": gt, "num_boxes": num}


@pytest.mark.parametrize("backbone", ["vgg16", "resnet50"])
def test_forward_inference(backbone):
    cfg = tiny_cfg()
    model = FasterRCNN(num_classes=4, backbone=backbone, cfg=cfg)
    batch = _batch()
    variables = jit_init(
        model, jnp.asarray(batch["data"]), jnp.asarray(batch["im_info"]), train=False
    )
    out = jax.jit(model.apply, static_argnames="train")(
        variables, jnp.asarray(batch["data"]), jnp.asarray(batch["im_info"]),
        train=False,
    )
    b = batch["data"].shape[0]
    r = cfg.TEST.RPN_POST_NMS_TOP_N
    assert out["rois"].shape == (b, r, 5)
    assert out["cls_prob"].shape == (b, r, 4)
    assert out["bbox_pred"].shape == (b, r, 16)
    probs = np.asarray(out["cls_prob"])
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
    # rois stay within the image — x2/y2 are the binding columns for the
    # clip (x1 <= x2 would hide an unclipped max corner)
    rois = np.asarray(out["rois"])
    w, h = batch["data"].shape[2], batch["data"].shape[1]
    assert (rois[..., 1:] >= 0).all()
    assert (rois[..., 1] <= w - 1).all() and (rois[..., 3] <= w - 1).all()
    assert (rois[..., 2] <= h - 1).all() and (rois[..., 4] <= h - 1).all()


@pytest.mark.parametrize("pooling_mode", ["align"])
def test_train_step_all_pooling_modes(pooling_mode):
    cfg = dataclasses.replace(tiny_cfg(), POOLING_MODE=pooling_mode)
    model = FasterRCNN(num_classes=4, backbone="resnet50", cfg=cfg)
    batch = _batch()
    tx, labels = build_optimizer(
        model_params := jit_init(
            model, jnp.asarray(batch["data"]), jnp.asarray(batch["im_info"]),
            jnp.asarray(batch["gt_boxes"]), jnp.asarray(batch["num_boxes"]),
            train=True,
        )["params"],
        "resnet50", base_lr=0.001,
    )
    import optax

    opt_state = tx.init(model_params)
    from rlobjectdetection_tpu.engine.train import TrainState

    state = TrainState(model_params, opt_state, jnp.int32(0))
    step = make_train_step(model, tx)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    # the step donates the state → snapshot leaves we compare against
    before_cls = jax.tree_util.tree_map(np.asarray, model_params["RCNN_cls_score"])
    before_conv1 = jax.tree_util.tree_map(np.asarray, model_params["base"]["conv1"])
    state2, metrics = step(state, jb, jax.random.PRNGKey(7))
    assert np.isfinite(float(metrics["loss"]))
    for k in ("rpn_cls", "rpn_box", "rcnn_cls", "rcnn_box"):
        assert np.isfinite(float(metrics[k])), k
    # trainable params changed, frozen did not
    def changed(a, b):
        return any(
            np.abs(np.asarray(x) - np.asarray(y)).max() > 0
            for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
        )

    assert changed(before_cls, state2.params["RCNN_cls_score"])
    # conv1 is frozen (fixed block)
    assert not changed(before_conv1, state2.params["base"]["conv1"])


def test_postprocess_detections_shapes():
    rng = np.random.RandomState(0)
    r, c, m = 32, 4, 10
    rois = np.zeros((r, 5), dtype=np.float32)
    rois[:, 1:3] = rng.rand(r, 2) * 100
    rois[:, 3:5] = rois[:, 1:3] + rng.rand(r, 2) * 60 + 5
    cls_prob = jax.nn.softmax(jnp.asarray(rng.randn(r, c).astype(np.float32)))
    bbox_pred = rng.randn(r, 4 * c).astype(np.float32) * 0.1
    im_info = jnp.asarray([200.0, 200.0, 2.0])
    valid = jnp.ones((r,), dtype=bool)
    boxes, scores, classes, v = postprocess_detections(
        jnp.asarray(rois), cls_prob, jnp.asarray(bbox_pred), im_info, valid,
        num_classes=c, max_per_image=m,
    )
    assert boxes.shape == (m, 4)
    assert scores.shape == (m,)
    cl = np.asarray(classes)[np.asarray(v)]
    assert ((cl >= 1) & (cl < c)).all()
    # detections are in original-image coords (≤ 200/2=100... boxes clipped to
    # scaled image then divided by scale)
    assert np.asarray(boxes)[np.asarray(v)].max() <= 100.0


def test_proposal_layer_unit():
    """Direct proposal-layer contract: batch column, score ordering, validity."""
    from rlobjectdetection_tpu.models.rpn import proposal_layer

    rng_np = np.random.RandomState(0)
    b, h, w, a = 2, 6, 8, 9
    fg = jnp.asarray(rng_np.rand(b, h, w, a).astype(np.float32))
    deltas = jnp.asarray(rng_np.randn(b, h, w, 4 * a).astype(np.float32) * 0.05)
    im_info = jnp.asarray([[96.0, 128.0, 1.0]] * b)
    rois, scores, valid = jax.jit(
        lambda f, d, i: proposal_layer(
            f, d, i, feat_stride=16, anchor_scales=(2, 3, 5),
            anchor_ratios=(0.5, 1, 2), pre_nms_top_n=200, post_nms_top_n=32,
            nms_thresh=0.7, nms_tile=64,
        )
    )(fg, deltas, im_info)
    assert rois.shape == (b, 32, 5)
    r = np.asarray(rois)
    v = np.asarray(valid)
    s = np.asarray(scores)
    for i in range(b):
        np.testing.assert_array_equal(r[i, :, 0], i)   # batch idx column
        sv = s[i][v[i]]
        assert (np.diff(sv) <= 1e-6).all()             # descending score order
        assert (r[i, v[i], 1:] >= 0).all()
        assert (r[i, v[i], 3] <= 127).all() and (r[i, v[i], 4] <= 95).all()


def test_frozen_prefix_gradients_are_zero():
    """frozen_stages places a stop_gradient at the frozen boundary: gradients
    w.r.t. conv1/bn1/layer1 must be structurally zero (XLA can then delete the
    whole backward through those stages — the torch requires_grad=False
    pruning, resnet.py:250-259)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rlobjectdetection_tpu.models.backbones.resnet import ResNetBase

    model = ResNetBase(num_layers=50, dtype=jnp.float32, frozen_stages=1)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)["params"]
    grads = jax.jit(jax.grad(
        lambda p, xx: model.apply({"params": p}, xx).sum()))(params, x)
    frozen = [k for k in grads if k in ("conv1", "bn1", "layer1")]
    live = [k for k in grads if k in ("layer2", "layer3")]
    assert frozen and live
    for k in frozen:
        assert all(np.all(np.asarray(l) == 0)
                   for l in jax.tree_util.tree_leaves(grads[k])), k
    assert any(np.any(np.asarray(l) != 0)
               for k in live for l in jax.tree_util.tree_leaves(grads[k]))


@pytest.mark.parametrize("pooling_mode", ["pool", "crop"])
def test_forward_pool_and_crop_modes(pooling_mode):
    # the align path runs everywhere else; this pins the POOLING_MODE dispatch
    # (faster_rcnn.py:72-83 parity) end-to-end through the model for the other
    # two kernels (op-level oracles live in tests/test_roi_ops.py)
    cfg = dataclasses.replace(tiny_cfg(), POOLING_MODE=pooling_mode)
    model = FasterRCNN(num_classes=4, backbone="tiny", cfg=cfg)
    batch = _batch()
    variables = jit_init(
        model, jnp.asarray(batch["data"]), jnp.asarray(batch["im_info"]), train=False
    )
    out = jax.jit(model.apply, static_argnames="train")(
        variables, jnp.asarray(batch["data"]), jnp.asarray(batch["im_info"]),
        train=False,
    )
    b = batch["data"].shape[0]
    r = cfg.TEST.RPN_POST_NMS_TOP_N
    assert out["cls_prob"].shape == (b, r, 4)
    probs = np.asarray(out["cls_prob"])
    assert np.isfinite(probs).all()
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
    assert np.isfinite(np.asarray(out["bbox_pred"])).all()
