"""NMS exactness vs a sequential greedy numpy oracle (the CUDA kernel's semantics:
/root/reference/lib/model/nms/src/nms_cuda_kernel.cu devIoU + host greedy scan)."""

import numpy as np
import jax.numpy as jnp

from rlobjectdetection_tpu.ops import nms, nms_select
from rlobjectdetection_tpu.ops.nms import nms_sorted_mask


def np_greedy_nms(boxes, scores, thresh):
    """Sequential greedy NMS oracle; returns kept indices in score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            iw = min(boxes[i, 2], boxes[j, 2]) - max(boxes[i, 0], boxes[j, 0]) + 1
            ih = min(boxes[i, 3], boxes[j, 3]) - max(boxes[i, 1], boxes[j, 1]) + 1
            if iw > 0 and ih > 0:
                iou = iw * ih / (areas[i] + areas[j] - iw * ih)
                if iou > thresh:
                    suppressed[j] = True
    return np.array(keep)


def _rand_dets(rng, n, size=120.0):
    xy = rng.rand(n, 2) * size
    wh = rng.rand(n, 2) * size / 3 + 4
    boxes = np.concatenate([xy, xy + wh], axis=1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    return boxes, scores


def test_nms_matches_oracle_small(rng):
    for n in [1, 7, 50, 200]:
        for thresh in [0.3, 0.5, 0.7]:
            boxes, scores = _rand_dets(rng, n)
            oracle = np_greedy_nms(boxes, scores, thresh)
            order, keep = nms(jnp.asarray(boxes), jnp.asarray(scores), thresh)
            got = np.asarray(order)[np.asarray(keep)]
            np.testing.assert_array_equal(np.sort(got), np.sort(oracle),
                                          err_msg=f"n={n} thresh={thresh}")


def test_nms_matches_oracle_dense_clusters(rng):
    # heavy-overlap clusters exercise long suppression chains
    centers = rng.rand(8, 2) * 100
    boxes, scores = [], []
    for c in centers:
        for _ in range(40):
            jitter = rng.randn(2) * 3
            wh = rng.rand(2) * 10 + 20
            xy = c + jitter
            boxes.append([xy[0], xy[1], xy[0] + wh[0], xy[1] + wh[1]])
            scores.append(rng.rand())
    boxes = np.array(boxes, dtype=np.float32)
    scores = np.array(scores, dtype=np.float32)
    oracle = np_greedy_nms(boxes, scores, 0.7)
    order, keep = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.7, tile_size=64)
    got = np.asarray(order)[np.asarray(keep)]
    np.testing.assert_array_equal(np.sort(got), np.sort(oracle))


def test_nms_cross_tile(rng):
    # > tile_size boxes so suppression must cross tile boundaries
    boxes, scores = _rand_dets(rng, 700, size=60.0)
    oracle = np_greedy_nms(boxes, scores, 0.5)
    order, keep = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, tile_size=128)
    got = np.asarray(order)[np.asarray(keep)]
    np.testing.assert_array_equal(np.sort(got), np.sort(oracle))


def test_nms_respects_valid_mask(rng):
    boxes, scores = _rand_dets(rng, 64)
    valid = rng.rand(64) > 0.5
    oracle = np_greedy_nms(boxes[valid], scores[valid], 0.5)
    oracle_global = np.where(valid)[0][oracle]
    order, keep = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, valid=jnp.asarray(valid))
    got = np.asarray(order)[np.asarray(keep)]
    np.testing.assert_array_equal(np.sort(got), np.sort(oracle_global))


def test_nms_select_padding(rng):
    boxes, scores = _rand_dets(rng, 100, size=30.0)  # dense → few survivors
    sel_boxes, sel_scores, sel_valid = nms_select(
        jnp.asarray(boxes), jnp.asarray(scores), 0.3, max_out=64
    )
    oracle = np_greedy_nms(boxes, scores, 0.3)
    k = min(len(oracle), 64)
    assert int(np.asarray(sel_valid).sum()) == k
    np.testing.assert_allclose(np.asarray(sel_boxes)[:k], boxes[oracle[:k]], rtol=1e-6)
    # padding rows are zero
    assert (np.asarray(sel_boxes)[k:] == 0).all()
    # survivors in descending score order
    s = np.asarray(sel_scores)[:k]
    assert (np.diff(s) <= 1e-6).all()


def test_nms_sorted_mask_direct(rng):
    boxes, scores = _rand_dets(rng, 300)
    order = np.argsort(-scores)
    sboxes = boxes[order]
    keep = np.asarray(
        nms_sorted_mask(jnp.asarray(sboxes), jnp.ones(300, dtype=bool), 0.4, tile_size=64)
    )
    oracle = np_greedy_nms(sboxes, scores[order], 0.4)
    np.testing.assert_array_equal(np.where(keep)[0], np.sort(oracle))


def test_nms_max_keep_early_exit_exact(rng):
    # the while-loop early exit must leave the top-max_keep survivor set (and
    # therefore nms_select's output) bit-identical to the full scan
    import jax

    boxes, scores = _rand_dets(rng, 640, size=60.0)
    order = np.argsort(-scores)
    sboxes = jnp.asarray(boxes[order])
    v = jnp.ones(640, dtype=bool)
    full = np.asarray(nms_sorted_mask(sboxes, v, 0.5, tile_size=64))
    for max_keep in (1, 7, 64, 100, 1000):
        early = np.asarray(
            nms_sorted_mask(sboxes, v, 0.5, tile_size=64, max_keep=max_keep))
        kf, ke = np.where(full)[0], np.where(early)[0]
        k = min(max_keep, len(kf))
        np.testing.assert_array_equal(ke[:k], kf[:k])
        assert len(ke) >= min(max_keep, len(kf))

    # nms_select (which wires max_keep=max_out) equals the oracle top-k
    sel_boxes, sel_scores, sel_valid = nms_select(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_out=32)
    oracle = np_greedy_nms(boxes, scores, 0.5)
    k = min(len(oracle), 32)
    assert int(np.asarray(sel_valid).sum()) == k
    np.testing.assert_allclose(np.asarray(sel_boxes)[:k], boxes[oracle[:k]],
                               rtol=1e-6)

    # vmapped early exit (the proposal-layer shape) stays exact per image
    b_boxes = np.stack([boxes, boxes[::-1].copy()])
    b_scores = np.stack([scores, scores[::-1].copy()])
    vm = jax.vmap(lambda bb, ss: nms_select(bb, ss, 0.5, max_out=32))
    vb, vs, vv = vm(jnp.asarray(b_boxes), jnp.asarray(b_scores))
    np.testing.assert_allclose(np.asarray(vb)[0], np.asarray(sel_boxes), rtol=1e-6)


def test_nms_small_mask_equals_tiled_and_oracle(rng):
    """The small-N full-matrix path (nms_small_mask — what nms() dispatches to
    for n <= 2*tile_size, e.g. the per-class test NMS) must produce the exact
    tiled/oracle keep set, including under validity masks and dense clusters."""
    from rlobjectdetection_tpu.ops.nms import nms_small_mask

    for n, size, thresh in ((300, 40.0, 0.3), (130, 15.0, 0.5), (64, 8.0, 0.7)):
        boxes, scores = _rand_dets(rng, n, size=size)
        order = np.argsort(-scores)
        sboxes = boxes[order]
        valid = rng.rand(n) > 0.2
        svalid = valid[order]
        small = np.asarray(nms_small_mask(jnp.asarray(sboxes),
                                          jnp.asarray(svalid), thresh))
        tiled = np.asarray(nms_sorted_mask(jnp.asarray(sboxes),
                                           jnp.asarray(svalid), thresh,
                                           tile_size=32))
        np.testing.assert_array_equal(small, tiled)
        oracle = np_greedy_nms(sboxes[svalid], scores[order][svalid], thresh)
        np.testing.assert_array_equal(np.where(small[svalid])[0],
                                      np.sort(oracle))
