"""COCO pipeline end-to-end: coco imdb → loader → detector → evaluate_detections."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rlobjectdetection_tpu.config import Config, TestConfig, TrainConfig
from rlobjectdetection_tpu.data.imdb import filter_roidb, prepare_roidb, rank_roidb_ratio
from rlobjectdetection_tpu.data.loader import RoiBatchLoader
from rlobjectdetection_tpu.data.synthetic import make_coco_dataset
from rlobjectdetection_tpu.engine import detections_to_all_boxes, postprocess_detections
from rlobjectdetection_tpu.models import FasterRCNN


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco_e2e")
    make_coco_dataset(str(root), num_images=5, split="minival", year="2014",
                      image_size=(160, 192))
    os.environ["RLOD_DATA_DIR"] = str(root)
    yield str(root)
    os.environ.pop("RLOD_DATA_DIR", None)


def test_coco_imdb_loads(coco_root):
    from rlobjectdetection_tpu.data.coco import coco

    db = coco("minival", "2014")
    assert db.num_classes == 4  # 3 synthetic classes + background
    assert db.num_images == 5
    roidb = db.gt_roidb()
    assert all(len(e["boxes"]) >= 1 for e in roidb)
    assert os.path.exists(db.image_path_at(0))


def test_coco_full_eval_path(coco_root, tmp_path):
    """Random-weight detector through the full COCO eval machinery — checks the
    plumbing (shapes, jsons, COCOeval) not accuracy."""
    from rlobjectdetection_tpu.data.coco import coco

    db = coco("minival", "2014")
    prepare_roidb(db)
    roidb = filter_roidb(db.roidb)
    ratio_list, ratio_index = rank_roidb_ratio(roidb)

    cfg = Config(
        TRAIN=TrainConfig(SCALES=(128,)),
        TEST=TestConfig(RPN_PRE_NMS_TOP_N=128, RPN_POST_NMS_TOP_N=32,
                        SCALES=(128,), MAX_DETS_PER_IMAGE=10),
        ANCHOR_SCALES=(2, 3, 5),
        DTYPE="float32",
        NMS_TILE=64,
    )
    model = FasterRCNN(num_classes=db.num_classes, backbone="tiny", cfg=cfg)
    loader = RoiBatchLoader(roidb, ratio_list, ratio_index, 1,
                            scales=cfg.TEST.SCALES, training=False)
    batch0 = next(iter(loader))
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": key, "sampling": key, "dropout": key},
        jnp.asarray(batch0["data"]), jnp.asarray(batch0["im_info"]), train=False,
    )["params"]
    forward = jax.jit(model.apply, static_argnames="train")

    dets = []
    for batch in loader:
        out = forward({"params": params}, jnp.asarray(batch["data"]),
                      jnp.asarray(batch["im_info"]), train=False)
        res = postprocess_detections(
            out["rois"][0], out["cls_prob"][0], out["bbox_pred"][0],
            jnp.asarray(batch["im_info"][0]), out["roi_valid"][0],
            num_classes=db.num_classes, max_per_image=10, nms_thresh=cfg.TEST.NMS,
        )
        dets.append(tuple(np.asarray(x) for x in res))
    all_boxes = detections_to_all_boxes(dets, db.num_classes)
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir, exist_ok=True)
    stats = db.evaluate_detections(all_boxes, out_dir)
    assert stats is not None and len(stats) == 12
    # default mode salts the results json name and scrubs it post-eval
    # (reference coco.py:31-32,303-318) — nothing json-ish survives
    assert not [f for f in os.listdir(out_dir) if f.endswith(".json")]
    # but the pickled eval does
    assert os.path.exists(os.path.join(out_dir, "detection_results.pkl"))

    # competition mode: canonical un-salted filename, kept on disk
    db.competition_mode(True)
    stats2 = db.evaluate_detections(all_boxes, out_dir)
    canonical = os.path.join(out_dir, "detections_minival2014_results.json")
    assert os.path.exists(canonical)
    assert np.allclose(stats, stats2)  # salting must not change the metrics
    db.competition_mode(False)


def test_coco_salted_results_do_not_collide(coco_root, tmp_path, monkeypatch):
    """Two evals into one output dir must not clobber each other's results
    file mid-eval: the salted names must differ (reference coco.py:306-318)."""
    from rlobjectdetection_tpu.data.coco import coco

    db = coco("minival", "2014")
    names = []
    real_remove = os.remove

    def spy_remove(path):
        if path.endswith(".json"):
            names.append(os.path.basename(path))
        real_remove(path)

    monkeypatch.setattr(os, "remove", spy_remove)
    empty = [[np.empty((0, 5), np.float32) for _ in range(db.num_images)]
             for _ in range(db.num_classes)]
    out_dir = str(tmp_path / "salted")
    os.makedirs(out_dir, exist_ok=True)
    db.evaluate_detections(empty, out_dir)
    db.evaluate_detections(empty, out_dir)
    assert len(names) == 2 and names[0] != names[1]
    assert all(n.startswith("detections_minival2014_results_") for n in names)


def test_coco_eval_with_gt_detections_is_perfect(coco_root, tmp_path):
    from rlobjectdetection_tpu.data.coco import coco

    db = coco("minival", "2014")
    roidb = db.gt_roidb()
    all_boxes = [[np.empty((0, 5), np.float32) for _ in range(db.num_images)]
                 for _ in range(db.num_classes)]
    for i, e in enumerate(roidb):
        for b, c in zip(e["boxes"], e["gt_classes"]):
            det = np.array([[b[0], b[1], b[2], b[3], 0.95]], dtype=np.float32)
            all_boxes[c][i] = np.concatenate([all_boxes[c][i], det])
    out_dir = str(tmp_path / "out2")
    os.makedirs(out_dir, exist_ok=True)
    stats = db.evaluate_detections(all_boxes, out_dir)
    assert stats[1] > 0.95  # AP@0.5 ≈ 1 with gt boxes as detections
