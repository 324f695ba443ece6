"""Native RLE mask library tests vs numpy oracles."""

import numpy as np
import pytest

native = pytest.importorskip("rlobjectdetection_tpu.native")


def _rand_mask(rng, h, w, p=0.3):
    return (rng.rand(h, w) < p).astype(np.uint8)


def test_encode_decode_roundtrip(rng):
    for h, w in [(5, 7), (16, 16), (33, 21)]:
        m = _rand_mask(rng, h, w)
        rle = native.encode(m)
        back = native.decode(rle)
        np.testing.assert_array_equal(back, m)


def test_area(rng):
    m = _rand_mask(rng, 20, 30)
    assert native.area(native.encode(m)) == int(m.sum())


def test_merge_union_intersect(rng):
    a = _rand_mask(rng, 18, 25)
    b = _rand_mask(rng, 18, 25)
    ra, rb = native.encode(a), native.encode(b)
    np.testing.assert_array_equal(
        native.decode(native.merge(ra, rb, intersect=False)), a | b
    )
    np.testing.assert_array_equal(
        native.decode(native.merge(ra, rb, intersect=True)), a & b
    )


def test_rle_iou(rng):
    a = _rand_mask(rng, 24, 24)
    b = _rand_mask(rng, 24, 24)
    got = native.iou([native.encode(a)], [native.encode(b)])[0, 0]
    inter = (a & b).sum()
    union = (a | b).sum()
    want = inter / union if union else 0.0
    assert abs(got - want) < 1e-9
    # crowd: denominator is dt area
    got_c = native.iou([native.encode(a)], [native.encode(b)], iscrowd=[1])[0, 0]
    want_c = inter / a.sum() if a.sum() else 0.0
    assert abs(got_c - want_c) < 1e-9


def test_bb_iou_matches_python():
    from rlobjectdetection_tpu.data.coco_api import iou_xywh

    rng = np.random.RandomState(5)
    dt = np.abs(rng.rand(7, 4)) * 50 + 1
    gt = np.abs(rng.rand(4, 4)) * 50 + 1
    crowd = [0, 1, 0, 1]
    got = native.iou(dt, gt, iscrowd=crowd)
    want = iou_xywh(dt, gt, crowd)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_bbox_roundtrip():
    rle = native.from_bbox([3, 4, 10, 6], 20, 25)
    m = native.decode(rle)
    assert m.sum() == 10 * 6
    assert m[4:10, 3:13].all()
    bb = native.to_bbox(rle)
    np.testing.assert_allclose(bb, [3, 4, 10, 6])


def test_from_poly_square():
    # axis-aligned square polygon → filled box
    rle = native.from_poly([2, 3, 12, 3, 12, 9, 2, 9], 16, 16)
    m = native.decode(rle)
    # interior pixels (centers inside [2,12]×[3,9])
    assert m[4:8, 3:11].all()
    assert m[:3].sum() == 0 and m[:, :2].sum() == 0


def test_from_bbox_degenerate_is_empty():
    """Zero-width/height or out-of-frame boxes must encode an EMPTY mask
    (pycocotools rleFrBbox); the unguarded column walk once emitted a
    garbage multi-thousand-pixel run."""
    from rlobjectdetection_tpu import native

    for bb in ([10, 10, 0, 5], [10, 10, 5, 0], [60, 10, 5, 5], [-9, -9, 3, 3]):
        assert native.area(native.from_bbox(bb, 50, 50)) == 0, bb


def test_mask_frpyobjects_bbox_list_dispatch():
    """A list of 4-element lists is xywh BOXES (pycocotools _mask.pyx), not a
    2-point polygon."""
    from rlobjectdetection_tpu import native
    from rlobjectdetection_tpu.data import mask

    (r,) = mask.frPyObjects([[10, 10, 20, 20]], 50, 50)
    assert native.area(r) == 400


def test_mask_iou_empty_sides():
    from rlobjectdetection_tpu.data import mask

    assert mask.iou([], [[1, 1, 2, 2]], None).shape == (0, 1)
    assert mask.iou([[1, 1, 2, 2]], [], None).shape == (1, 0)


def test_native_iou_rejects_short_iscrowd():
    import pytest

    from rlobjectdetection_tpu import native

    with pytest.raises(ValueError, match="iscrowd"):
        native.iou(np.array([[0, 0, 2, 2.0]]),
                   np.array([[0, 0, 2, 2.0], [1, 1, 2, 2.0]]), iscrowd=[1])


def test_rle_iou_matrix_matches_pairs():
    """The one-call matrix path equals per-pair rle_iou_pair results."""
    from rlobjectdetection_tpu import native

    rng = np.random.RandomState(0)
    masks = [(rng.rand(20, 30) > 0.5).astype(np.uint8) for _ in range(4)]
    rles = [native.encode(m) for m in masks]
    got = native.iou(rles[:2], rles[2:], iscrowd=[0, 1])
    lib = native.get_lib()
    import ctypes
    for i, d in enumerate(rles[:2]):
        for j, g in enumerate(rles[2:]):
            ref = lib.rle_iou_pair(
                d.counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                len(d.counts),
                g.counts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                len(g.counts), j)
            np.testing.assert_allclose(got[i, j], ref, rtol=1e-12)
