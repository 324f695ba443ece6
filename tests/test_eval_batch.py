"""Bucketed batched evaluation (test_net --batch): plan coverage + equivalence
to the per-image path.

The reference evaluates strictly one image at a time (RCNN_bases/test_net.py:230);
`eval_bucket_plan` groups same-padded-shape images so eval runs at bs>1 with a
bounded compile set; its round-to-nearest shape prediction matches the bs1
path's cv2 resize, so batched outputs must match the per-image path exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from rlobjectdetection_tpu.config import Config, TestConfig, TrainConfig
from rlobjectdetection_tpu.data.loader import RoiBatchLoader, eval_bucket_plan
from rlobjectdetection_tpu.engine import postprocess_detections
from rlobjectdetection_tpu.models import FasterRCNN

SCALE = 96  # images below are sized so SCALE/min(h,w) resizes to exact integers


def _make_roidb(tmp_path, sizes):
    rng = np.random.RandomState(3)
    roidb = []
    for i, (h, w) in enumerate(sizes):
        path = str(tmp_path / f"im{i}.png")  # png: deterministic decode
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(path)
        roidb.append({
            "image": path, "width": w, "height": h, "flipped": False,
            "boxes": np.array([[4, 4, w // 2, h // 2]], dtype=np.uint16),
            "gt_classes": np.array([1], dtype=np.int32),
        })
    return roidb


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("evalbatch")
    # two buckets: 3 landscape (96x144 resized) + 2 portrait (144x96)
    sizes = [(96, 144), (96, 144), (96, 144), (144, 96), (144, 96)]
    roidb = _make_roidb(tmp, sizes)
    cfg = Config(
        TRAIN=TrainConfig(SCALES=(SCALE,)),
        TEST=TestConfig(RPN_PRE_NMS_TOP_N=128, RPN_POST_NMS_TOP_N=32,
                        SCALES=(SCALE,), MAX_DETS_PER_IMAGE=10),
        ANCHOR_SCALES=(2, 3, 5),
        DTYPE="float32",
        NMS_TILE=64,
    )
    model = FasterRCNN(num_classes=4, backbone="tiny", cfg=cfg)
    loader = RoiBatchLoader(roidb, np.ones(len(roidb)), np.arange(len(roidb)),
                            1, scales=cfg.TEST.SCALES, training=False)
    batch0 = loader._assemble([0], 1.0)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": key, "sampling": key, "dropout": key},
        jnp.asarray(batch0["data"]), jnp.asarray(batch0["im_info"]), train=False,
    )["params"]
    return roidb, cfg, model, loader, params


def test_plan_covers_all_once():
    roidb = [
        {"height": 96, "width": 144}, {"height": 96, "width": 144},
        {"height": 96, "width": 144}, {"height": 144, "width": 96},
        {"height": 480, "width": 640},
    ]
    plan = eval_bucket_plan(roidb, SCALE, batch_size=2)
    seen = [i for idxs, _ in plan for i in idxs]
    assert sorted(seen) == list(range(5))
    # 3-image bucket splits into 2+1; singletons get their own batch
    assert {tuple(sorted(idxs)) for idxs, _ in plan} == {(0, 1), (2,), (3,), (4,)}
    # same-aspect images share a shape; different aspects do not
    shapes = {i: hw for idxs, hw in plan for i in idxs}
    assert shapes[0] == shapes[2] and shapes[0] != shapes[3]


def test_plan_canvas_always_fits():
    # the cv2 round-to-nearest resize result must fit the planned canvas
    roidb = [{"height": h, "width": w}
             for h, w in [(101, 333), (97, 96), (333, 101), (1000, 1)]]
    plan = eval_bucket_plan(roidb, SCALE, batch_size=1)
    for idxs, (ph, pw) in plan:
        e = roidb[idxs[0]]
        s = SCALE / min(e["height"], e["width"])
        assert int(round(e["height"] * s)) <= ph
        assert int(round(e["width"] * s)) <= pw


def test_batched_eval_matches_per_image(setup):
    roidb, cfg, model, loader, params = setup
    forward = jax.jit(model.apply, static_argnames="train")

    def post_one(rois, cls_prob, bbox_pred, info, valid):
        return postprocess_detections(
            rois, cls_prob, bbox_pred, info, valid,
            num_classes=4, max_per_image=10, nms_thresh=cfg.TEST.NMS,
        )

    # per-image reference path
    single = []
    for i in range(len(roidb)):
        batch = loader._assemble([i], 1.0)
        out = forward({"params": params}, jnp.asarray(batch["data"]),
                      jnp.asarray(batch["im_info"]), train=False)
        res = post_one(out["rois"][0], out["cls_prob"][0], out["bbox_pred"][0],
                       jnp.asarray(batch["im_info"][0]), out["roi_valid"][0])
        single.append(tuple(np.asarray(x) for x in res))

    # bucketed path, batch 2, incl. a padded partial batch per bucket
    batched = [None] * len(roidb)
    batched_post = jax.jit(jax.vmap(post_one))
    for idxs, hw in eval_bucket_plan(roidb, SCALE, batch_size=2):
        batch = loader._assemble(idxs, 1.0, pad_hw=hw, pad_count=2)
        assert batch["data"].shape == (2, hw[0], hw[1], 3)
        out = forward({"params": params}, jnp.asarray(batch["data"]),
                      jnp.asarray(batch["im_info"]), train=False)
        res = batched_post(out["rois"], out["cls_prob"], out["bbox_pred"],
                           jnp.asarray(batch["im_info"]), out["roi_valid"])
        for j, idx in enumerate(idxs):
            batched[idx] = tuple(np.asarray(x[j]) for x in res)

    for i in range(len(roidb)):
        for a, b in zip(single[i], batched[i]):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_precast_input_bit_identical(setup):
    """tools/test_net.py ships pixels pre-cast to the compute dtype to halve
    the H2D bytes. The backbone casts its input to cfg.DTYPE on device, and
    float32→bfloat16 is round-to-nearest-even on either side of the wire, so
    a host-side pre-cast must leave every output bit unchanged."""
    import dataclasses

    import ml_dtypes

    roidb, cfg, _, loader, _ = setup
    bcfg = dataclasses.replace(cfg, DTYPE="bfloat16")
    model = FasterRCNN(num_classes=4, backbone="tiny", cfg=bcfg)
    batch = loader._assemble([0], 1.0)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": key, "sampling": key, "dropout": key},
        jnp.asarray(batch["data"]), jnp.asarray(batch["im_info"]), train=False,
    )["params"]
    forward = jax.jit(model.apply, static_argnames="train")
    out_f32 = forward({"params": params}, jnp.asarray(batch["data"]),
                      jnp.asarray(batch["im_info"]), train=False)
    pre = batch["data"].astype(np.dtype(ml_dtypes.bfloat16), copy=False)
    out_pre = forward({"params": params}, jnp.asarray(pre),
                      jnp.asarray(batch["im_info"]), train=False)
    for k in ("rois", "cls_prob", "bbox_pred", "roi_valid"):
        np.testing.assert_array_equal(np.asarray(out_f32[k]),
                                      np.asarray(out_pre[k]), err_msg=k)
