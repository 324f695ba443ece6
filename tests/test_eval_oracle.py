"""Executable-oracle parity: the repo's eval stack vs the REFERENCE's own
pure-python eval modules, run on shared synthetic fixtures.

The reference's regression oracle is its mAP tables; with no real VOC/COCO
data in this environment, the strongest available stand-in is to import the
reference's evaluation code itself (pure numpy, importable without its CUDA
extensions) and assert numeric equality:

  * /root/reference/lib/datasets/voc_eval.py       → data/voc_eval.py
  * /root/reference/lib/pycocotools/cocoeval.py    → data/coco_eval.py
    (bbox iouType; the reference's `mask.iou` is stubbed with an independent
    in-test numpy bbIoU — crowd semantics included — so the oracle's
    matching/accumulate logic runs untouched)
  * /root/reference/lib/model/Reinforcement/action.py → models/rl/action.py

Fixtures deliberately hit the pathological branches: difficult gt, crowd gt,
duplicate detections on one gt, detections in gt-free images, empty-detection
classes, area-range boundaries, IoU exactly at threshold.
"""

from __future__ import annotations

import copy
import importlib.util
import json
import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"


def _load_ref_module(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_voc_eval():
    return _load_ref_module("ref_voc_eval",
                            os.path.join(REF, "lib/datasets/voc_eval.py"))


@pytest.fixture(scope="module")
def ref_action():
    return _load_ref_module("ref_action",
                            os.path.join(REF, "lib/model/Reinforcement/action.py"))


def _np_bb_iou(dt, gt, iscrowd):
    """Independent xywh IoU with COCO crowd semantics (union = dt area when
    the gt is crowd) — the contract of pycocotools' bbIou (maskApi.c)."""
    dt = np.asarray(dt, dtype=np.float64).reshape(-1, 4)
    gt = np.asarray(gt, dtype=np.float64).reshape(-1, 4)
    out = np.zeros((len(dt), len(gt)))
    for j, g in enumerate(gt):
        ga = g[2] * g[3]
        for i, d in enumerate(dt):
            w = min(d[0] + d[2], g[0] + g[2]) - max(d[0], g[0])
            h = min(d[1] + d[3], g[1] + g[3]) - max(d[1], g[1])
            if w <= 0 or h <= 0:
                continue
            inter = w * h
            union = d[2] * d[3] if iscrowd[j] else d[2] * d[3] + ga - inter
            out[i, j] = inter / union
    return out


class _NpShim:
    """numpy facade for the 2015-era reference cocoeval: restores `np.float`
    and accepts the float `num` it passes to linspace. Algorithm untouched."""

    float = float

    def __getattr__(self, k):
        return getattr(np, k)

    @staticmethod
    def linspace(start, stop, num, **kw):
        return np.linspace(start, stop, int(num), **kw)

    @staticmethod
    def array(obj, *a, **kw):
        arr = np.array(obj, *a, **kw)
        # `np.array(gtind)` with an empty list is float64; old numpy allowed
        # it as an index (evaluateImg, no-gt images), modern numpy does not.
        if arr.size == 0 and arr.dtype == np.float64 and "dtype" not in kw:
            return arr.astype(np.intp)
        return arr


@pytest.fixture(scope="module")
def ref_cocoeval():
    pkg = types.ModuleType("refcocopkg")
    pkg.__path__ = [os.path.join(REF, "lib/pycocotools")]
    sys.modules["refcocopkg"] = pkg
    mask_stub = types.ModuleType("refcocopkg.mask")
    mask_stub.iou = lambda d, g, iscrowd: _np_bb_iou(d, g, iscrowd)
    sys.modules["refcocopkg.mask"] = mask_stub
    spec = importlib.util.spec_from_file_location(
        "refcocopkg.cocoeval", os.path.join(REF, "lib/pycocotools/cocoeval.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refcocopkg.cocoeval"] = mod
    spec.loader.exec_module(mod)
    mod.np = _NpShim()
    return mod


@pytest.fixture(scope="module")
def ref_coco_api(ref_cocoeval):
    """The REFERENCE's COCO container (coco.py loader + loadRes) — so the
    parity test compares our whole stack (container included) against the
    reference's, not just the evaluator over a shared container (a loadRes
    bug would otherwise cancel out)."""
    spec = importlib.util.spec_from_file_location(
        "refcocopkg.coco", os.path.join(REF, "lib/pycocotools/coco.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refcocopkg.coco"] = mod
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------- VOC fixture

VOC_CLASSES = ("cat", "dog", "bird")


def _write_voc_fixture(root):
    """5 images; per-class gt incl. difficult; detections incl. duplicates,
    gt-free images, exact-threshold IoU, and one class with zero detections."""
    ann_dir = os.path.join(root, "Annotations")
    det_dir = os.path.join(root, "dets")
    os.makedirs(ann_dir)
    os.makedirs(det_dir)

    def obj(name, box, difficult=0):
        return (name, box, difficult)

    gt = {
        "im1": [obj("cat", (10, 10, 110, 110)), obj("cat", (200, 50, 260, 120)),
                obj("dog", (30, 200, 150, 300))],
        "im2": [obj("cat", (40, 40, 140, 140), difficult=1),
                obj("dog", (5, 5, 60, 60)), obj("bird", (100, 100, 180, 160))],
        "im3": [obj("dog", (20, 20, 120, 220)), obj("bird", (300, 40, 380, 90))],
        "im4": [obj("cat", (60, 60, 160, 160))],
        "im5": [],   # no gt at all
    }
    for im, objs in gt.items():
        parts = ["<annotation>"]
        for name, (x1, y1, x2, y2), diff in objs:
            parts.append(
                f"<object><name>{name}</name><pose>Left</pose>"
                f"<truncated>0</truncated><difficult>{diff}</difficult>"
                f"<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin>"
                f"<xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox></object>")
        parts.append("</annotation>")
        with open(os.path.join(ann_dir, im + ".xml"), "w") as f:
            f.write("".join(parts))

    with open(os.path.join(root, "imageset.txt"), "w") as f:
        f.write("\n".join(gt.keys()) + "\n")

    dets = {
        "cat": [
            ("im1", 0.95, (12, 12, 108, 112)),     # tp
            ("im1", 0.90, (14, 8, 112, 108)),      # duplicate on same gt → fp
            ("im1", 0.85, (205, 55, 255, 118)),    # tp on 2nd gt
            ("im2", 0.80, (42, 42, 138, 142)),     # matches difficult → neither
            ("im3", 0.70, (10, 10, 50, 50)),       # image w/o cat gt → fp
            ("im4", 0.60, (60, 60, 160, 360)),     # IoU exactly 1/3 vs 0.5 → fp
            ("im5", 0.55, (1, 1, 30, 30)),         # gt-free image → fp
            ("im4", 0.50, (61, 60, 161, 161)),     # tp (high IoU)
        ],
        "dog": [
            ("im3", 0.99, (20, 20, 120, 219)),     # tp
            ("im1", 0.88, (33, 205, 148, 298)),    # tp
            ("im2", 0.40, (200, 200, 260, 260)),   # no-overlap fp
        ],
        "bird": [],                                 # zero detections
    }
    for cls, rows in dets.items():
        with open(os.path.join(det_dir, f"det_{cls}.txt"), "w") as f:
            for im, sc, (x1, y1, x2, y2) in rows:
                f.write(f"{im} {sc} {x1} {y1} {x2} {y2}\n")
    return (os.path.join(det_dir, "det_{}.txt"),
            os.path.join(ann_dir, "{}.xml"),
            os.path.join(root, "imageset.txt"))


@pytest.mark.parametrize("use_07", [True, False])
def test_voc_eval_matches_reference(tmp_path, ref_voc_eval, use_07):
    from rlobjectdetection_tpu.data.voc_eval import voc_eval

    detpath, annopath, imagesetfile = _write_voc_fixture(str(tmp_path))
    for cls in VOC_CLASSES:
        ours_cache = str(tmp_path / f"cache_ours_{cls}_{use_07}")
        ref_cache = str(tmp_path / f"cache_ref_{cls}_{use_07}")
        os.makedirs(ref_cache, exist_ok=True)
        rec, prec, ap = voc_eval(detpath, annopath, imagesetfile, cls,
                                 ours_cache, ovthresh=0.5, use_07_metric=use_07)
        rrec, rprec, rap = ref_voc_eval.voc_eval(
            detpath, annopath, imagesetfile, cls, ref_cache,
            ovthresh=0.5, use_07_metric=use_07)
        np.testing.assert_allclose(rec, rrec, atol=1e-12, err_msg=cls)
        np.testing.assert_allclose(prec, rprec, atol=1e-12, err_msg=cls)
        assert abs(ap - rap) < 1e-8, (cls, ap, rap)


def test_voc_ap_matches_reference(ref_voc_eval, rng):
    from rlobjectdetection_tpu.data.voc_eval import voc_ap

    for _ in range(25):
        n = rng.randint(1, 40)
        rec = np.sort(rng.rand(n))
        prec = rng.rand(n)
        # include exact threshold hits
        rec[rng.randint(n)] = 0.3
        for use_07 in (True, False):
            assert abs(voc_ap(rec, prec, use_07)
                       - ref_voc_eval.voc_ap(rec, prec, use_07)) < 1e-10


# --------------------------------------------------------------- COCO fixture

def _make_coco_fixture(tmp_path, rng):
    imgs = [{"id": i, "height": 480, "width": 640, "file_name": f"{i}.jpg"}
            for i in range(1, 6)]
    cats = [{"id": 1, "name": "cat", "supercategory": "none"},
            {"id": 2, "name": "dog", "supercategory": "none"}]
    anns = []

    def gt(img, cat, bbox, iscrowd=0):
        anns.append({"id": len(anns) + 1, "image_id": img, "category_id": cat,
                     "bbox": list(map(float, bbox)),
                     "area": float(bbox[2] * bbox[3]), "iscrowd": iscrowd})

    gt(1, 1, (10, 10, 100, 100))          # large-ish (10000 → medium/large edge)
    gt(1, 1, (200, 50, 20, 20))           # small (400)
    gt(1, 2, (30, 200, 120, 100))         # large (12000)
    gt(2, 1, (40, 40, 100, 100))
    gt(2, 1, (300, 300, 150, 100), iscrowd=1)   # crowd
    gt(3, 2, (20, 20, 30, 30))            # small (900)
    gt(4, 1, (60, 60, 96, 96))            # area exactly 96² = 9216 boundary
    # image 5: no gt

    dets = []

    def dt(img, cat, bbox, score):
        dets.append({"image_id": img, "category_id": cat,
                     "bbox": list(map(float, bbox)), "score": float(score)})

    dt(1, 1, (12, 12, 98, 98), 0.95)       # good match
    dt(1, 1, (11, 9, 101, 102), 0.90)      # duplicate → matches crowd rules
    dt(1, 1, (201, 51, 19, 19), 0.85)      # small tp
    dt(1, 2, (35, 205, 110, 95), 0.80)
    dt(2, 1, (45, 45, 95, 95), 0.75)
    dt(2, 1, (310, 310, 100, 80), 0.70)    # inside crowd
    dt(2, 1, (500, 10, 40, 40), 0.65)      # fp
    dt(3, 2, (21, 21, 29, 29), 0.60)
    dt(3, 1, (100, 100, 50, 50), 0.55)     # cat absent in img3 → fp
    dt(4, 1, (62, 62, 94, 94), 0.50)
    dt(5, 2, (10, 10, 60, 60), 0.45)       # gt-free image
    # a burst of low-score detections to exercise maxDets=1/10 cuts
    for k in range(12):
        dt(1, 1, (rng.randint(0, 500), rng.randint(0, 380),
                  rng.randint(5, 80), rng.randint(5, 80)), 0.40 - 0.01 * k)

    gt_file = tmp_path / "gt.json"
    dt_file = tmp_path / "dt.json"
    gt_file.write_text(json.dumps(
        {"images": imgs, "annotations": anns, "categories": cats}))
    dt_file.write_text(json.dumps(dets))
    return str(gt_file), str(dt_file)


def test_cocoeval_bbox_matches_reference(tmp_path, ref_cocoeval, ref_coco_api, rng):
    from rlobjectdetection_tpu.data.coco_api import COCO
    from rlobjectdetection_tpu.data.coco_eval import COCOeval

    gt_file, dt_file = _make_coco_fixture(tmp_path, rng)

    ours_gt = COCO(gt_file, quiet=True)
    ours_dt = ours_gt.loadRes(dt_file)
    ours = COCOeval(ours_gt, ours_dt, iouType="bbox")
    ours.evaluate()
    ours.accumulate()
    ours.summarize()

    # the reference side runs end-to-end on the REFERENCE's own container —
    # its json loader + loadRes + cocoeval — so a bug in OUR container
    # (areas, id assignment, ann indexing) cannot cancel out of the parity
    ref_gt = ref_coco_api.COCO(gt_file)
    ref_dt = ref_gt.loadRes(dt_file)
    ref = ref_cocoeval.COCOeval(ref_gt, ref_dt)
    ref.params.useSegm = 0
    ref.evaluate()
    ref.accumulate()
    ref.summarize()

    np.testing.assert_allclose(ours.eval["precision"], ref.eval["precision"],
                               atol=1e-10)
    np.testing.assert_allclose(ours.eval["recall"], ref.eval["recall"],
                               atol=1e-10)
    np.testing.assert_allclose(ours.stats, ref.stats, atol=1e-8)


# ------------------------------------------------------------------ RL action

def test_move_from_act_matches_reference(ref_action, rng):
    from rlobjectdetection_tpu.models.rl.action import Action

    delta = [0.02, 0.05, 0.1]
    ours = Action(delta, alpha=1.0)
    ref = ref_action.Action(delta, alpha=1.0)
    np.testing.assert_array_equal(ours.actDeltas, ref.actDeltas)

    b, n, a = 3, 7, ours.num_acts
    for maxk in (1, 3, 7, 10):
        # tie-free scores: reference tie order is unspecified (plain argsort)
        preds = rng.permutation(b * n * a).astype(np.float64).reshape(b, n, a)
        targets = (rng.rand(b, n, a) < 0.3).astype(np.float64)
        boxes = (rng.rand(b, n, 4) * 100 + 5).astype(np.float64)

        ours_boxes, ours_prec = ours.move_from_act(
            boxes.copy(), preds.copy(), targets.copy(), maxk)
        ref_boxes, ref_prec = ref.move_from_act(
            boxes.copy(), preds.copy(), targets.copy(), maxk)
        np.testing.assert_allclose(ours_boxes, ref_boxes, atol=1e-12)
        assert ours_prec == ref_prec


def test_move_from_act_tie_rule_hand_computed():
    """With ALL scores tied, our documented rule (larger flattened index
    first, for both the action choice and the box ranking) fully determines
    the outcome — pin it against a hand computation. (The reference's tie
    order is unspecified — plain unstable argsort — so this pins OUR rule,
    not reference parity, which the tie-free oracle above covers.)"""
    from rlobjectdetection_tpu.models.rl.action import Action

    act = Action([0.1])              # 8 actions; act 7 = y2 coord, -0.1
    assert act.num_acts == 8
    b, n = 1, 2
    preds = np.full((b, n, 8), 5.0)  # every (box, action) tied
    targets = np.ones((b, n, 8))     # teacher says every move helps
    boxes = np.array([[[10.0, 10.0, 20.0, 40.0],
                       [30.0, 30.0, 10.0, 16.0]]])
    # larger flat index first: box1/act7 outranks everything -> with maxk=1
    # only box1 moves, by actDeltas[7] = (0,0,0,-0.1) * (w,h,w,h)
    out, prec = act.move_from_act(boxes.copy(), preds.copy(),
                                  targets.copy(), 1)
    expect = boxes.copy()
    expect[0, 1, 3] -= 0.1 * 16.0
    np.testing.assert_allclose(out, expect, atol=1e-12)
    assert prec == 100.0
    # maxk=2: both boxes move, each by its own act-7 step
    out2, prec2 = act.move_from_act(boxes.copy(), preds.copy(),
                                    targets.copy(), 2)
    expect2 = boxes.copy()
    expect2[0, 1, 3] -= 0.1 * 16.0
    expect2[0, 0, 3] -= 0.1 * 40.0
    np.testing.assert_allclose(out2, expect2, atol=1e-12)
    assert prec2 == 100.0
    # teacher forcing gates the move: target -1 on the chosen action freezes
    # the box and costs precision
    targets3 = targets.copy()
    targets3[0, 1, 7] = -1.0
    out3, prec3 = act.move_from_act(boxes.copy(), preds.copy(), targets3, 1)
    np.testing.assert_allclose(out3, boxes, atol=1e-12)
    assert prec3 == 0.0


def test_ds_utils_behavior(rng):
    """Pin the rewritten ds_utils behaviors incl. the deliberate >=/> size
    asymmetry (reference ds_utils.py:46-47)."""
    from rlobjectdetection_tpu.data.ds_utils import (
        filter_small_boxes, unique_boxes, xywh_to_xyxy, xyxy_to_xywh)

    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [5, 5, 20, 20],
                      [0, 0, 10.4, 10.4]])
    np.testing.assert_array_equal(unique_boxes(boxes), [0, 2])       # .4 rounds
    np.testing.assert_array_equal(unique_boxes(boxes, scale=10), [0, 2, 3])

    xywh = np.array([[3.0, 4.0, 10.0, 6.0]])
    np.testing.assert_array_equal(xywh_to_xyxy(xywh), [[3, 4, 12, 9]])
    np.testing.assert_array_equal(xyxy_to_xywh(xywh_to_xyxy(xywh)), xywh)

    # w uses >=, h uses > (quirk preserved)
    b = np.array([[0, 0, 4, 4], [0, 0, 4, 5], [0, 0, 5, 4], [0, 0, 10, 10]])
    np.testing.assert_array_equal(filter_small_boxes(b, 4), [1, 3])
