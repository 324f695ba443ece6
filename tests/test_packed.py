"""Pre-packed input pipeline (data/packed.py): bit-identity vs the live
decode path, under the full randomness surface (scale draws, gt-aware crops,
straddle squares, flips), plus store round-trip properties."""

import os

import numpy as np
import pytest
from PIL import Image

from rlobjectdetection_tpu.data.imdb import rank_roidb_ratio
from rlobjectdetection_tpu.data.loader import RoiBatchLoader
from rlobjectdetection_tpu.data.packed import (PackedImageStore,
                                               PackedRoiBatchLoader,
                                               pack_roidb)


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("packed")
    rng = np.random.RandomState(7)
    roidb = []
    # tall, wide, extreme (need_crop both ways), square — plus flips
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
            "need_crop": int(max(h, w) / min(h, w) > 2),
        })
    scales = (100, 140)
    pack_root = str(root / "pack")
    pack_roidb(roidb, scales, pack_root)
    return roidb, scales, pack_root


def _loaders(fixture, training=True, batch_size=4, seed=11):
    roidb, scales, pack_root = fixture
    ratio_list, ratio_index = rank_roidb_ratio(roidb)
    kw = dict(scales=scales, max_num_gt=5, seed=seed, training=training)
    live = RoiBatchLoader(roidb, ratio_list, ratio_index, batch_size, **kw)
    packed = PackedRoiBatchLoader(roidb, ratio_list, ratio_index, batch_size,
                                  pack_root=pack_root, **kw)
    return live, packed


def test_packed_train_batches_bit_identical(fixture):
    live, packed = _loaders(fixture, training=True)
    for _ in range(3):  # several epochs: block rotation, both crop branches
        for lb, pb in zip(live, packed):
            for k in ("data", "im_info", "gt_boxes", "num_boxes"):
                np.testing.assert_array_equal(lb[k], pb[k], err_msg=k)


def test_packed_eval_batches_bit_identical(fixture):
    live, packed = _loaders(fixture, training=False, batch_size=3)
    for lb, pb in zip(live, packed):
        for k in ("data", "im_info", "gt_boxes", "num_boxes"):
            np.testing.assert_array_equal(lb[k], pb[k], err_msg=k)


def test_store_rejects_unpacked_combination(fixture):
    roidb, scales, pack_root = fixture
    store = PackedImageStore(pack_root)
    with pytest.raises(KeyError):
        store.get(roidb[0]["image"], bool(roidb[0]["flipped"]), 999)


def test_pack_is_incremental(fixture, capsys):
    roidb, scales, pack_root = fixture
    pack_roidb(roidb, scales, pack_root)  # second run: everything cached
    assert "packed 0 new arrays" in capsys.readouterr().out


def test_store_returns_readonly_views(fixture):
    """mmap views must not be written through (the canvas copy is the only
    consumer); _assemble/_crop_to_ratio never mutate the image in place."""
    roidb, scales, pack_root = fixture
    store = PackedImageStore(pack_root)
    arr, im_scale = store.get(roidb[0]["image"], bool(roidb[0]["flipped"]),
                              scales[0])
    assert im_scale > 0
    with pytest.raises(ValueError):
        arr[0, 0, 0] = 1.0
