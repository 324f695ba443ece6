"""Segmentation COCOeval (VERDICT r1 item 8): the native-RLE-backed segm path.

Oracles:
  * mask IoU — brute-force numpy on DECODED masks (independent of the RLE
    iou kernel), crowd semantics included;
  * COCO compressed-string codec — roundtrip + decode equivalence;
  * end-to-end segm COCOeval — against the REFERENCE cocoeval module running
    on the same fixtures with its `mask` module stubbed by ours (validating
    the reference's matching/accumulate logic consumes our IoUs identically).
"""

import copy
import json

import numpy as np
import pytest

from rlobjectdetection_tpu.data import mask as maskUtils


def _blob_mask(rng, h, w, cx, cy, r):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8)


def test_rle_string_roundtrip(rng):
    for _ in range(20):
        h, w = rng.randint(5, 40), rng.randint(5, 40)
        m = (rng.rand(h, w) < rng.rand() * 0.8).astype(np.uint8)
        enc = maskUtils.encode(m)
        assert isinstance(enc["counts"], str)
        np.testing.assert_array_equal(maskUtils.decode(enc), m)
        assert maskUtils.area(enc) == int(m.sum())


def test_rle_string_known_value():
    # runs [3, 2, 4, 7] over a 4x4 grid: delta coding kicks in from index 3
    from rlobjectdetection_tpu import native

    counts = np.array([3, 2, 4, 7], np.uint32)
    s = maskUtils.rle_to_string(counts)
    assert maskUtils.string_to_rle_counts(s) == [3, 2, 4, 7]
    rle = native.RLE(4, 4, counts)
    dec = native.decode(rle)
    np.testing.assert_array_equal(
        maskUtils.decode({"size": [4, 4], "counts": s}), dec)


def test_mask_iou_vs_bruteforce(rng):
    h, w = 48, 64
    dts, gts = [], []
    for _ in range(4):
        dts.append(_blob_mask(rng, h, w, rng.randint(10, 50), rng.randint(10, 38),
                              rng.randint(4, 14)))
        gts.append(_blob_mask(rng, h, w, rng.randint(10, 50), rng.randint(10, 38),
                              rng.randint(4, 14)))
    iscrowd = [0, 1, 0, 1]
    d_rle = [maskUtils.encode(m) for m in dts]
    g_rle = [maskUtils.encode(m) for m in gts]
    got = maskUtils.iou(d_rle, g_rle, iscrowd)
    for i, dm in enumerate(dts):
        for j, gm in enumerate(gts):
            inter = int((dm & gm).sum())
            union = int(dm.sum()) if iscrowd[j] else int((dm | gm).sum())
            want = inter / union if union else 0.0
            assert abs(got[i, j] - want) < 1e-9, (i, j, got[i, j], want)


def test_polygon_to_rle_matches_bbox():
    # an axis-aligned rectangle polygon must enclose ~the same area as frBbox
    from rlobjectdetection_tpu import native

    poly = [10, 5, 30, 5, 30, 20, 10, 20]
    r_poly = maskUtils.frPyObjects([poly], 32, 48)[0]
    r_box = native.from_bbox([10, 5, 20, 15], 32, 48)
    a_p, a_b = native.area(r_poly), native.area(r_box)
    assert abs(a_p - a_b) <= max(a_p, a_b) * 0.15   # rasterization convention slack
    i = native.iou([r_poly], [r_box])[0, 0]
    assert i > 0.8


def _segm_fixture(tmp_path, rng):
    h, w = 64, 96
    imgs = [{"id": i, "height": h, "width": w, "file_name": f"{i}.jpg"}
            for i in (1, 2)]
    cats = [{"id": 1, "name": "thing", "supercategory": "none"}]
    anns, dets = [], []

    def add_gt(img, mask, iscrowd=0):
        enc = maskUtils.encode(mask)
        anns.append({
            "id": len(anns) + 1, "image_id": img, "category_id": 1,
            "segmentation": {"size": enc["size"], "counts": enc["counts"]},
            "bbox": maskUtils.toBbox(enc).tolist(),
            "area": float(mask.sum()), "iscrowd": iscrowd,
        })

    def add_dt(img, mask, score):
        enc = maskUtils.encode(mask)
        dets.append({"image_id": img, "category_id": 1, "score": score,
                     "segmentation": {"size": enc["size"], "counts": enc["counts"]}})

    g1 = _blob_mask(rng, h, w, 30, 30, 12)
    g2 = _blob_mask(rng, h, w, 70, 20, 8)
    add_gt(1, g1)
    add_gt(1, g2)
    add_gt(2, _blob_mask(rng, h, w, 40, 40, 15), iscrowd=1)
    d1 = np.roll(g1, 2, axis=1)           # good match
    add_dt(1, d1, 0.9)
    add_dt(1, np.roll(g1, 4, axis=0), 0.8)     # duplicate
    add_dt(1, _blob_mask(rng, h, w, 85, 50, 6), 0.7)   # fp
    add_dt(2, _blob_mask(rng, h, w, 42, 41, 10), 0.6)  # inside crowd
    gt_file = tmp_path / "gt.json"
    dt_file = tmp_path / "dt.json"
    gt_file.write_text(json.dumps(
        {"images": imgs, "annotations": anns, "categories": cats}))
    dt_file.write_text(json.dumps(dets))
    return str(gt_file), str(dt_file)


def test_segm_cocoeval_end_to_end(tmp_path, rng):
    from rlobjectdetection_tpu.data.coco_api import COCO
    from rlobjectdetection_tpu.data.coco_eval import COCOeval

    gt_file, dt_file = _segm_fixture(tmp_path, rng)
    gt = COCO(gt_file, quiet=True)
    dt = gt.loadRes(dt_file)
    # loadRes derived area/bbox from the masks
    a = dt.loadAnns(dt.getAnnIds(imgIds=[1]))[0]
    assert a["area"] > 0 and len(a["bbox"]) == 4

    ev = COCOeval(gt, dt, iouType="segm")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    stats = np.asarray(ev.stats)
    assert stats.shape == (12,)
    assert 0.0 < stats[1] <= 1.0          # AP@0.5 nonzero: d1 matches g1
    # the shifted duplicate should be penalized: AP < 1 at high IoU
    assert stats[0] < 1.0


def test_segm_matches_reference_matching_logic(tmp_path, rng):
    """Reference cocoeval (matching/accumulate) fed OUR mask IoUs must agree
    with our segm COCOeval on identical fixtures."""
    pytest.importorskip("numpy")
    from tests.test_eval_oracle import _NpShim  # reuse the loader shim
    import importlib.util
    import sys
    import types

    from rlobjectdetection_tpu.data.coco_api import COCO
    from rlobjectdetection_tpu.data.coco_eval import COCOeval

    gt_file, dt_file = _segm_fixture(tmp_path, rng)

    ours_gt = COCO(gt_file, quiet=True)
    ours_dt = ours_gt.loadRes(dt_file)
    ours = COCOeval(ours_gt, ours_dt, iouType="segm")
    ours.evaluate()
    ours.accumulate()
    ours.summarize()

    pkg = types.ModuleType("refcocopkg2")
    pkg.__path__ = ["/root/reference/lib/pycocotools"]
    sys.modules["refcocopkg2"] = pkg
    mask_stub = types.ModuleType("refcocopkg2.mask")
    mask_stub.iou = maskUtils.iou
    mask_stub.frPyObjects = maskUtils.frPyObjects
    mask_stub.merge = maskUtils.merge
    sys.modules["refcocopkg2.mask"] = mask_stub
    spec = importlib.util.spec_from_file_location(
        "refcocopkg2.cocoeval", "/root/reference/lib/pycocotools/cocoeval.py")
    refmod = importlib.util.module_from_spec(spec)
    sys.modules["refcocopkg2.cocoeval"] = refmod
    spec.loader.exec_module(refmod)
    refmod.np = _NpShim()

    ref_gt = COCO(gt_file, quiet=True)
    ref_dt = ref_gt.loadRes(dt_file)
    ref = refmod.COCOeval(ref_gt, ref_dt)
    ref.params.useSegm = 1
    ref.evaluate()
    ref.accumulate()
    ref.summarize()

    np.testing.assert_allclose(ours.eval["precision"], ref.eval["precision"],
                               atol=1e-10)
    np.testing.assert_allclose(ours.stats, ref.stats, atol=1e-8)
