"""Data pipeline tests over synthetic on-disk fixtures (tiny VOC + COCO)."""

import json
import os

import numpy as np
import pytest

from rlobjectdetection_tpu.data.coco_api import COCO, iou_xywh
from rlobjectdetection_tpu.data.coco_eval import COCOeval
from rlobjectdetection_tpu.data.imdb import (
    filter_roidb,
    prepare_roidb,
    rank_roidb_ratio,
)
from rlobjectdetection_tpu.data.loader import RoiBatchLoader, compute_batch_ratios
from rlobjectdetection_tpu.data.synthetic import make_coco_dataset, make_voc_devkit


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_voc_devkit(str(root), num_images=6)
    make_coco_dataset(str(root), num_images=6)
    os.environ["RLOD_DATA_DIR"] = str(root)
    yield str(root)
    os.environ.pop("RLOD_DATA_DIR", None)


def _voc_imdb(data_root):
    from rlobjectdetection_tpu.data.pascal_voc import pascal_voc

    db = pascal_voc("trainval", "2007")
    # synthetic classes differ from VOC20 — remap
    db._classes = ["__background__", "widget", "gadget", "gizmo"]
    db._class_to_ind = {c: i for i, c in enumerate(db._classes)}
    return db


def test_voc_roidb(data_root):
    db = _voc_imdb(data_root)
    roidb = db.gt_roidb()
    assert len(roidb) == 6
    e = roidb[0]
    assert e["boxes"].shape[1] == 4
    assert (e["gt_classes"] >= 1).all()
    assert e["width"] == 320 and e["height"] == 240
    # boxes are 0-based and inside the image
    assert e["boxes"][:, 2].max() < 320
    assert e["boxes"][:, 3].max() < 240


def test_voc_flip_and_ratio(data_root):
    db = _voc_imdb(data_root)
    n = db.num_images
    db.append_flipped_images()
    assert len(db.roidb) == 2 * n
    orig, flip = db.roidb[0], db.roidb[n]
    w = orig["width"]
    np.testing.assert_array_equal(flip["boxes"][:, 0], w - orig["boxes"][:, 2] - 1)
    prepare_roidb(db)
    roidb = filter_roidb(db.roidb)
    ratio_list, ratio_index = rank_roidb_ratio(roidb)
    assert (np.diff(ratio_list) >= 0).all()


def test_loader_shapes(data_root):
    db = _voc_imdb(data_root)
    prepare_roidb(db)
    roidb = filter_roidb(db.roidb)
    ratio_list, ratio_index = rank_roidb_ratio(roidb)
    loader = RoiBatchLoader(roidb, ratio_list, ratio_index, batch_size=2,
                            scales=(120,), max_num_gt=20)
    batch = next(iter(loader))
    assert batch["data"].ndim == 4 and batch["data"].shape[3] == 3
    assert batch["data"].shape[1] % 32 == 0 and batch["data"].shape[2] % 32 == 0
    assert batch["gt_boxes"].shape == (2, 20, 5)
    assert (batch["num_boxes"] >= 1).all()
    # gt boxes lie within the scaled image
    for i in range(2):
        g = batch["gt_boxes"][i][: batch["num_boxes"][i]]
        assert (g[:, 2] <= batch["im_info"][i, 1]).all()
        assert (g[:, 3] <= batch["im_info"][i, 0]).all()


def test_batch_ratio_assignment():
    ratios = np.array([0.5, 0.6, 0.8, 1.2, 1.5, 2.0])
    # all-tall block → leftmost ratio; straddling block → 1.0; all-wide → rightmost
    # (roibatchLoader.py:44-53)
    out = compute_batch_ratios(ratios, 2)
    np.testing.assert_allclose(out, [0.5, 0.5, 1.0, 1.0, 2.0, 2.0])
    out3 = compute_batch_ratios(ratios, 3)
    np.testing.assert_allclose(out3, [0.5] * 3 + [2.0] * 3)


def test_coco_api_and_eval_perfect_detections(data_root):
    ann_file = os.path.join(data_root, "coco", "annotations", "instances_minival2014.json")
    gt = COCO(ann_file, quiet=True)
    assert len(gt.getImgIds()) == 6
    # perfect detections = gt boxes as results → AP must be 1.0
    results = []
    for ann in gt.dataset["annotations"]:
        results.append(
            {
                "image_id": ann["image_id"],
                "category_id": ann["category_id"],
                "bbox": ann["bbox"],
                "score": 0.9,
            }
        )
    dt = gt.loadRes(results)
    ev = COCOeval(gt, dt, iouType="bbox")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    assert stats[0] > 0.99  # AP@[.5:.95]
    assert stats[1] > 0.99  # AP@.5


def test_coco_eval_shifted_detections(data_root):
    ann_file = os.path.join(data_root, "coco", "annotations", "instances_minival2014.json")
    gt = COCO(ann_file, quiet=True)
    results = []
    for ann in gt.dataset["annotations"]:
        b = list(ann["bbox"])
        b[0] += b[2] * 0.4  # shift by 40% of width → IoU ≈ 0.43 < 0.5
        results.append(
            {"image_id": ann["image_id"], "category_id": ann["category_id"],
             "bbox": b, "score": 0.9}
        )
    dt = gt.loadRes(results)
    ev = COCOeval(gt, dt, iouType="bbox")
    ev.evaluate()
    ev.accumulate()
    stats = ev.summarize()
    assert stats[1] < 0.2  # AP@.5 collapses


def test_iou_xywh_crowd():
    dt = np.array([[0, 0, 10, 10]])
    gtb = np.array([[0, 0, 20, 20]])
    plain = iou_xywh(dt, gtb, [0])[0, 0]
    crowd = iou_xywh(dt, gtb, [1])[0, 0]
    assert abs(plain - 100.0 / 400.0) < 1e-9
    assert abs(crowd - 1.0) < 1e-9  # IoF: fully inside the crowd region


def test_voc_eval_end_to_end(data_root, tmp_path):
    """Perfect detections → mAP 1.0 via the full imdb.evaluate_detections path."""
    db = _voc_imdb(data_root)
    roidb = db.gt_roidb()
    num_classes = db.num_classes
    all_boxes = [[np.empty((0, 5), np.float32) for _ in range(db.num_images)]
                 for _ in range(num_classes)]
    for i, e in enumerate(roidb):
        for b, c in zip(e["boxes"], e["gt_classes"]):
            det = np.array([[b[0], b[1], b[2], b[3], 0.9]], dtype=np.float32)
            all_boxes[c][i] = np.concatenate([all_boxes[c][i], det])
    out = str(tmp_path / "out")
    mean_ap = db.evaluate_detections(all_boxes, out)
    assert mean_ap > 0.99


def test_rpn_roidb_merge(data_root, tmp_path):
    """Precomputed-proposal roidbs: rpn_roidb merges gt with a proposal pickle
    (pascal_voc.py:167-203 semantics)."""
    import pickle

    db = _voc_imdb(data_root)
    gt = db.gt_roidb()
    rng = np.random.RandomState(0)
    box_list = []
    for e in gt:
        n = 5
        x1 = rng.randint(0, 200, n)
        y1 = rng.randint(0, 150, n)
        boxes = np.stack([x1, y1, x1 + 40, y1 + 40], axis=1).astype(np.uint16)
        box_list.append(boxes)
    rpn_file = str(tmp_path / "rpn.pkl")
    with open(rpn_file, "wb") as f:
        pickle.dump(box_list, f)
    db.config["rpn_file"] = rpn_file
    roidb = db.rpn_roidb()
    for i, e in enumerate(roidb):
        # merged: gt boxes first, then 5 proposals
        assert len(e["boxes"]) == len(gt[i]["boxes"]) + 5
        # proposals carry gt_classes 0 and max-overlap info vs gt
        assert (e["gt_classes"][len(gt[i]["boxes"]):] == 0).all()
        assert e["gt_overlaps"].shape[1] == db.num_classes


def test_evaluate_recall(data_root):
    """Proposal-recall eval (imdb.py:131-219): gt boxes as candidates → AR 1.0."""
    db = _voc_imdb(data_root)
    roidb = db.gt_roidb()
    db._roidb = roidb
    candidates = [e["boxes"].astype(np.float32) for e in roidb]
    res = db.evaluate_recall(candidate_boxes=candidates)
    assert res["ar"] > 0.99
    assert (res["recalls"] > 0.99).all()
    # shifted candidates → recall collapses at high IoU thresholds
    shifted = [b + np.array([30, 30, 30, 30], dtype=np.float32) for b in candidates]
    res2 = db.evaluate_recall(candidate_boxes=shifted)
    assert res2["ar"] < res["ar"]


def test_combined_roidb_concat(data_root):
    """'+'-joined dataset names concatenate roidbs (roidb.py:88-132)."""
    from rlobjectdetection_tpu.data.imdb import combined_roidb

    # patch the factory to return our synthetic-classed imdb
    import rlobjectdetection_tpu.data.factory as factory

    orig = factory.get_imdb
    factory.get_imdb = lambda name: _voc_imdb(data_root)
    try:
        im_db, roidb, ratio_list, ratio_index = combined_roidb(
            "voc_2007_trainval+voc_2007_trainval", training=True, use_flipped=False
        )
        assert len(roidb) == 2 * 6
        assert len(ratio_list) == len(roidb)
        assert (np.diff(ratio_list) >= 0).all()
    finally:
        factory.get_imdb = orig


def test_loader_need_crop(tmp_path):
    """Extreme aspect ratios trigger the gt-aware crop (roibatchLoader.py:88-158):
    the padded canvas must match the clamped target ratio and keep gt inside."""
    from rlobjectdetection_tpu.data.synthetic import make_voc_devkit
    from rlobjectdetection_tpu.data.pascal_voc import pascal_voc

    root = tmp_path / "wide"
    make_voc_devkit(str(root), num_images=4, image_size=(100, 400))  # ratio 4 > 2
    prev = os.environ.get("RLOD_DATA_DIR")   # module-scoped data_root owns it
    os.environ["RLOD_DATA_DIR"] = str(root)
    try:
        db = pascal_voc("trainval", "2007")
        db._classes = ["__background__", "widget", "gadget", "gizmo"]
        db._class_to_ind = {c: i for i, c in enumerate(db._classes)}
        prepare_roidb(db)
        roidb = filter_roidb(db.roidb)
        ratio_list, ratio_index = rank_roidb_ratio(roidb)
        assert all(e["need_crop"] for e in roidb)
        assert (ratio_list == 2.0).all()  # clamped to ratio_large
        loader = RoiBatchLoader(roidb, ratio_list, ratio_index, batch_size=2,
                                scales=(100,), max_num_gt=20)
        batch = next(iter(loader))
        h, w = batch["data"].shape[1:3]
        # canvas aspect ≈ 2 after crop+pad (quantized to 32)
        assert 1.5 <= w / h <= 2.7, (h, w)
        for i in range(2):
            g = batch["gt_boxes"][i][: batch["num_boxes"][i]]
            assert (g[:, 2] <= batch["im_info"][i, 1]).all()
    finally:
        if prev is None:
            os.environ.pop("RLOD_DATA_DIR", None)
        else:
            os.environ["RLOD_DATA_DIR"] = prev


def test_loader_straddle_square_crop_and_canvas_im_info():
    """A ratio-1.0 straddle batch crops every image to the top-left min(h, w)
    square (roibatchLoader.py:180-186) and training im_info reports the padded
    canvas dims (l.169-186), not the image dims."""
    import os
    import numpy as np
    from PIL import Image

    root = "/tmp/straddle_fixture"
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    roidb = []
    # one tall (ratio<1) + one wide (ratio>1) image → the bs2 block straddles 1.0
    for i, (h, w) in enumerate([(200, 160), (160, 200)]):
        p = os.path.join(root, f"s{i}.jpg")
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(p)
        roidb.append({
            "image": p, "flipped": False,
            "boxes": np.array([[5, 5, w - 10, h - 10]], dtype=np.uint16),
            "gt_classes": np.array([1], dtype=np.int32),
            "width": w, "height": h, "need_crop": 0,
        })
    ratios = np.array([160 / 200, 200 / 160])
    order = np.array([0, 1])
    loader = RoiBatchLoader(roidb, ratios, order, batch_size=2,
                            scales=(160,), max_num_gt=5)
    assert loader.batch_ratios[0] == 1.0
    batch = next(iter(loader))
    # both images scale to short-side 160 then crop to a 160x160 square →
    # quantized canvas 160x160, and im_info carries the canvas
    assert batch["data"].shape[1:3] == (160, 160)
    np.testing.assert_allclose(batch["im_info"][:, :2], 160.0)
    # gt clamped inside the square (the reference clamps to [0, trim])
    g = batch["gt_boxes"]
    n = batch["num_boxes"]
    for i in range(2):
        assert (g[i][: n[i], :4] <= 160).all()

    # eval mode keeps the true image dims in im_info
    ev = RoiBatchLoader(roidb, ratios, order, batch_size=1, scales=(160,),
                        max_num_gt=5, training=False)
    b0 = next(iter(ev))
    assert b0["im_info"][0, 0] == 200 * (160 / 160)  # tall image: h=200 @ scale 1


def test_host_shard_loader_and_canvas_predictor(tmp_path):
    """Multi-host sliced input pipeline: predict_train_canvas matches the
    assembled canvas exactly (no decode), and HostShardLoader halves are
    bit-identical to the corresponding rows of the full assembly."""
    from PIL import Image

    from rlobjectdetection_tpu.data.loader import HostShardLoader

    root = tmp_path / "shard"
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(7)
    roidb = []
    # tall, wide, extreme (need_crop), square — plus flipped variants
    shapes = [(200, 160), (160, 200), (100, 400), (400, 100), (240, 240),
              (120, 300), (300, 120), (180, 220)]
    for i, (h, w) in enumerate(shapes):
        p = str(root / f"i{i}.jpg")
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(p)
        roidb.append({
            "image": p, "flipped": i % 2 == 1,
            "boxes": np.array([[5, 5, w // 2, h // 2]], dtype=np.uint16),
            "gt_classes": np.array([1], dtype=np.int32),
            "width": w, "height": h,
        })
    ratio_list, ratio_index = rank_roidb_ratio(roidb)

    def mk():
        return RoiBatchLoader(roidb, ratio_list, ratio_index, batch_size=4,
                              scales=(100, 140), max_num_gt=5, seed=11)

    # predictor exactness over several epochs (exercises the per-epoch block
    # rotation, both crop branches, the straddle square, and the scale draw)
    loader = mk()
    for _ in range(3):
        for idxs, ratio, seed in loader.batch_plan():
            full = loader._assemble(idxs, ratio, seed=seed)
            pred = loader.predict_train_canvas(idxs, ratio, seed)
            assert tuple(full["data"].shape[1:3]) == pred, (ratio, idxs)

    # slice bit-parity: rows of two half-slices == rows of the full assembly
    full_batches = list(mk())
    left = list(HostShardLoader(mk(), 0, 2))
    right = list(HostShardLoader(mk(), 2, 2))
    assert len(full_batches) == len(left) == len(right) == 2
    for fb, lb, rb in zip(full_batches, left, right):
        for k in ("data", "im_info", "gt_boxes", "num_boxes"):
            np.testing.assert_array_equal(fb[k][:2], lb[k], err_msg=k)
            np.testing.assert_array_equal(fb[k][2:], rb[k], err_msg=k)


def test_epoch_keyed_plan_resume_determinism():
    """batch_plan is a pure function of (loader seed, epoch): a FRESH loader
    pinned with set_epoch(e) reproduces epoch e's plan exactly, regardless of
    what any prior process consumed — the property trainval_net's --r resume
    relies on for bitwise-deterministic restarts (tools/resume_validate.py)."""
    from rlobjectdetection_tpu.data.imdb import rank_roidb_ratio
    from rlobjectdetection_tpu.data.loader import RoiBatchLoader

    rng = np.random.RandomState(5)
    # 17 entries / bs 4 leaves a tail -> exercises the per-epoch offset draw
    roidb = [{"width": int(rng.randint(80, 400)),
              "height": int(rng.randint(80, 400))} for _ in range(17)]
    ratio_list, ratio_index = rank_roidb_ratio(roidb)

    def mk():
        return RoiBatchLoader(roidb, ratio_list, ratio_index, batch_size=4,
                              scales=(100,), max_num_gt=5, seed=11)

    run = mk()
    plans = [run.batch_plan() for _ in range(4)]
    assert plans[1] != plans[2]  # epochs genuinely re-permute

    resumed = mk()
    resumed.set_epoch(3)
    assert resumed.batch_plan() == plans[3]
    # and the stream continues from there, as an in-process loop would
    assert resumed._epoch == 4

    # a different seed yields a different epoch-3 plan (keying uses the seed)
    other = RoiBatchLoader(roidb, ratio_list, ratio_index, batch_size=4,
                           scales=(100,), max_num_gt=5, seed=12)
    other.set_epoch(3)
    assert other.batch_plan() != plans[3]
