"""Async input pipeline tests: bit-identical batches in any completion order,
and real decode/step overlap (VERDICT r1 item 5)."""

import time

import numpy as np

from rlobjectdetection_tpu.data.prefetch import AsyncLoader, device_prefetch


def _make_loader(tmp_path, seed=3, num_images=8, batch_size=2):
    from rlobjectdetection_tpu.data import combined_roidb
    from rlobjectdetection_tpu.data.loader import RoiBatchLoader
    from rlobjectdetection_tpu.data.synthetic import make_voc_devkit
    import os

    root = str(tmp_path)
    if not os.path.isdir(os.path.join(root, "VOCdevkit2007")):
        make_voc_devkit(root, num_images=num_images, image_size=(96, 128),
                        classes=("aeroplane", "bicycle", "bird"))
    prev = os.environ.get("RLOD_DATA_DIR")
    os.environ["RLOD_DATA_DIR"] = root
    try:
        _, roidb, ratio_list, ratio_index = combined_roidb(
            "voc_2007_trainval", training=True, use_flipped=False)
    finally:
        # restore — leaking the var would redirect any later test module
        # that relies on its own fixture's value
        if prev is None:
            os.environ.pop("RLOD_DATA_DIR", None)
        else:
            os.environ["RLOD_DATA_DIR"] = prev
    return RoiBatchLoader(roidb, ratio_list, ratio_index, batch_size,
                          scales=(96,), max_num_gt=8, seed=seed)


def test_async_matches_sync(tmp_path):
    sync_batches = list(_make_loader(tmp_path))
    async_batches = list(AsyncLoader(_make_loader(tmp_path), num_workers=4))
    assert len(sync_batches) == len(async_batches) > 0
    for s, a in zip(sync_batches, async_batches):
        for k in s:
            np.testing.assert_array_equal(np.asarray(s[k]), np.asarray(a[k]),
                                          err_msg=k)


def test_async_overlaps_decode(tmp_path):
    """With a sleep-instrumented decoder, decode intervals must OVERLAP consume
    intervals (a purely serial pipeline never interleaves them). Interval
    intersection — unlike a wall-clock budget — stays deterministic when the CI
    host is loaded."""
    delay = 0.15
    # enough batches that the pool (4 workers + 2 prefetch) can't finish them
    # all in the initial burst — later decodes MUST run while batches are being
    # consumed
    loader = _make_loader(tmp_path, num_images=32)
    orig = type(loader)._assemble
    decode_spans, consume_spans = [], []

    def slow_assemble(self, indices, ratio, rng=None, **kw):
        t0 = time.perf_counter()
        time.sleep(delay)
        out = orig(self, indices, ratio, rng, **kw)
        decode_spans.append((t0, time.perf_counter()))
        return out

    type(loader)._assemble = slow_assemble
    try:
        for _ in AsyncLoader(loader, num_workers=4):
            t0 = time.perf_counter()
            time.sleep(delay)          # consumer "step"
            consume_spans.append((t0, time.perf_counter()))
    finally:
        type(loader)._assemble = orig

    # 16 batches, 4 workers + 2 prefetch: ~10 decodes must happen while batches
    # are being consumed. Requiring several distinct overlapping decodes (not
    # just one) catches a regression to near-serial behavior (e.g. effective
    # prefetch depth collapsing to 1) while staying load-robust.
    overlapping_decodes = sum(
        any(max(ds, cs) < min(de, ce) for cs, ce in consume_spans)
        for ds, de in decode_spans
    )
    assert overlapping_decodes >= 4, (overlapping_decodes, len(decode_spans))


def test_device_prefetch_order_and_depth():
    puts = []
    consumed = []

    def put(x):
        puts.append(x)
        return x * 10

    out = []
    for v in device_prefetch(range(6), put, depth=2):
        # by the time item i is yielded, item i+2 must already be put —
        # i.e. puts >= consumed + 2 (a depth-1 pipeline fails this)
        consumed.append(v)
        assert len(puts) >= min(len(consumed) + 2, 6), (len(puts), consumed)
        out.append(v)
    assert out == [0, 10, 20, 30, 40, 50]


def test_async_loader_over_host_shard_slices(tmp_path):
    """AsyncLoader(HostShardLoader(...)) — the multi-host production path —
    yields exactly the serial slice assembly in plan order."""
    import numpy as np
    from PIL import Image

    from rlobjectdetection_tpu.data.imdb import rank_roidb_ratio
    from rlobjectdetection_tpu.data.loader import HostShardLoader, RoiBatchLoader
    from rlobjectdetection_tpu.data.prefetch import AsyncLoader

    rng = np.random.RandomState(3)
    roidb = []
    for i, (h, w) in enumerate([(120, 160), (160, 120), (140, 150), (150, 140)]):
        p = str(tmp_path / f"a{i}.jpg")
        Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8)).save(p)
        roidb.append({
            "image": p, "flipped": False,
            "boxes": np.array([[4, 4, w // 2, h // 2]], dtype=np.uint16),
            "gt_classes": np.array([1], dtype=np.int32),
            "width": w, "height": h,
        })
    ratio_list, ratio_index = rank_roidb_ratio(roidb)

    def mk():
        return HostShardLoader(
            RoiBatchLoader(roidb, ratio_list, ratio_index, batch_size=4,
                           scales=(120,), max_num_gt=4, seed=9),
            start=2, size=2)

    serial = list(mk())
    asyncv = list(AsyncLoader(mk(), num_workers=2))
    assert len(serial) == len(asyncv) == 1
    for k in ("data", "im_info", "gt_boxes", "num_boxes"):
        np.testing.assert_array_equal(serial[0][k], asyncv[0][k], err_msg=k)
