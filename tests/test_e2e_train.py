"""End-to-end slice: synthetic dataset → train steps → eval mAP improves.

This is the reference's "mAP tables as regression oracle" strategy (SURVEY.md §4)
shrunk to CI scale: solid-color rectangles on noise are learnable by the tiny
backbone in a few hundred steps.
"""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlobjectdetection_tpu.config import Config, TestConfig, TrainConfig
from rlobjectdetection_tpu.data.imdb import filter_roidb, prepare_roidb, rank_roidb_ratio
from rlobjectdetection_tpu.data.loader import RoiBatchLoader
from rlobjectdetection_tpu.data.synthetic import make_voc_devkit
from rlobjectdetection_tpu.engine import (
    build_optimizer,
    detections_to_all_boxes,
    make_train_step,
    postprocess_detections,
)
from rlobjectdetection_tpu.engine.train import TrainState
from rlobjectdetection_tpu.models import FasterRCNN


@pytest.fixture(scope="module")
def voc(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    make_voc_devkit(str(root), num_images=16, image_size=(128, 160))
    os.environ["RLOD_DATA_DIR"] = str(root)
    yield str(root)
    os.environ.pop("RLOD_DATA_DIR", None)


def _imdb(voc):
    from rlobjectdetection_tpu.data.pascal_voc import pascal_voc

    db = pascal_voc("trainval", "2007")
    db._classes = ["__background__", "widget", "gadget", "gizmo"]
    db._class_to_ind = {c: i for i, c in enumerate(db._classes)}
    return db


def test_train_improves_map(voc):
    cfg = Config(
        TRAIN=TrainConfig(
            RPN_PRE_NMS_TOP_N=512, RPN_POST_NMS_TOP_N=128, BATCH_SIZE=64,
            SCALES=(128,), USE_FLIPPED=False, LEARNING_RATE=0.02,
        ),
        TEST=TestConfig(RPN_PRE_NMS_TOP_N=256, RPN_POST_NMS_TOP_N=64,
                        SCALES=(128,), MAX_DETS_PER_IMAGE=20),
        # objects are 24-80 px; default anchors (96-512 px) would never be
        # inside a 128 px image, leaving the RPN untrained
        ANCHOR_SCALES=(2, 3, 5),
        DTYPE="float32",
        NMS_TILE=64,
    )
    db = _imdb(voc)
    prepare_roidb(db)
    roidb = filter_roidb(db.roidb)
    ratio_list, ratio_index = rank_roidb_ratio(roidb)
    loader = RoiBatchLoader(roidb, ratio_list, ratio_index, batch_size=2,
                            scales=cfg.TRAIN.SCALES, max_num_gt=cfg.MAX_NUM_GT_BOXES)

    model = FasterRCNN(num_classes=db.num_classes, backbone="tiny", cfg=cfg)
    sample = next(iter(loader))
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": key, "sampling": key, "dropout": key},
        jnp.asarray(sample["data"]), jnp.asarray(sample["im_info"]),
        jnp.asarray(sample["gt_boxes"]), jnp.asarray(sample["num_boxes"]),
        train=True,
    )["params"]
    tx, _ = build_optimizer(params, "tiny", cfg.TRAIN.LEARNING_RATE,
                            weight_decay=cfg.TRAIN.WEIGHT_DECAY)
    state = TrainState(params, tx.init(params), jnp.int32(0))
    step = make_train_step(model, tx)

    losses = []
    k = jax.random.PRNGKey(7)
    n_steps = 200
    it = iter(loader)
    for i in range(n_steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        jb = {kk: jnp.asarray(v) for kk, v in batch.items()}
        state, metrics = step(state, jb, jax.random.fold_in(k, i))
        losses.append(float(metrics["loss"]))

    assert np.isfinite(losses).all(), losses[-5:]
    # loss must drop substantially vs the very first steps (fast convergence
    # makes a wider early window self-defeating)
    assert np.mean(losses[-20:]) < 0.7 * np.mean(losses[:5]), (
        np.mean(losses[:5]), np.mean(losses[-20:])
    )

    # eval on the train set (sanity: net memorizes solid rectangles)
    eval_loader = RoiBatchLoader(roidb, ratio_list, ratio_index, batch_size=1,
                                 scales=cfg.TEST.SCALES, training=False)
    forward = jax.jit(model.apply, static_argnames="train")
    dets = []
    for batch in eval_loader:
        out = forward({"params": state.params}, jnp.asarray(batch["data"]),
                      jnp.asarray(batch["im_info"]), train=False)
        res = postprocess_detections(
            out["rois"][0], out["cls_prob"][0], out["bbox_pred"][0],
            jnp.asarray(batch["im_info"][0]), out["roi_valid"][0],
            num_classes=db.num_classes, max_per_image=20,
            nms_thresh=cfg.TEST.NMS,
        )
        dets.append(tuple(np.asarray(x) for x in res))
    all_boxes = detections_to_all_boxes(dets, db.num_classes)
    # detections must overlap gt decently: compute simple recall@0.5
    from rlobjectdetection_tpu.data.imdb import bbox_overlaps_np

    n_gt = 0
    n_hit = 0
    for i, e in enumerate(roidb):
        gt_boxes = e["boxes"].astype(float)
        gt_cls = e["gt_classes"]
        n_gt += len(gt_boxes)
        for j, c in enumerate(gt_cls):
            d = all_boxes[c][i]
            if len(d) == 0:
                continue
            ov = bbox_overlaps_np(d[:, :4].astype(float), gt_boxes[j : j + 1])
            if ov.max() > 0.5:
                n_hit += 1
    recall = n_hit / max(n_gt, 1)
    assert recall > 0.4, f"recall@0.5 too low: {recall:.2f} ({n_hit}/{n_gt})"
