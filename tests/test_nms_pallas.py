"""Pallas NMS kernel exactness (interpret mode on CPU) vs the XLA version and
the sequential oracle."""

import numpy as np
import jax.numpy as jnp

from rlobjectdetection_tpu.ops.nms import nms_sorted_mask
from rlobjectdetection_tpu.ops.nms_pallas import nms_sorted_mask_pallas
from test_nms import _rand_dets, np_greedy_nms


def test_pallas_matches_oracle(rng):
    for n, thresh, tile in [(100, 0.5, 64), (700, 0.5, 128), (300, 0.7, 256)]:
        boxes, scores = _rand_dets(rng, n, size=60.0)
        order = np.argsort(-scores)
        sboxes = boxes[order]
        keep = np.asarray(
            nms_sorted_mask_pallas(
                jnp.asarray(sboxes), jnp.ones(n, dtype=bool), thresh,
                tile_size=tile, interpret=True,
            )
        )
        oracle = np_greedy_nms(sboxes, scores[order], thresh)
        np.testing.assert_array_equal(np.where(keep)[0], np.sort(oracle)), (n, thresh)


def test_pallas_matches_xla_with_invalid(rng):
    n = 400
    boxes, scores = _rand_dets(rng, n, size=50.0)
    order = np.argsort(-scores)
    sboxes = jnp.asarray(boxes[order])
    valid = jnp.asarray(rng.rand(n) > 0.3)
    k_xla = np.asarray(nms_sorted_mask(sboxes, valid, 0.5, tile_size=128))
    k_pal = np.asarray(
        nms_sorted_mask_pallas(sboxes, valid, 0.5, tile_size=128, interpret=True)
    )
    np.testing.assert_array_equal(k_xla, k_pal)


def test_pallas_grid_matches_oracle(rng):
    """The grid-based Pallas kernel (ops/nms_pallas_grid.py) is also exact."""
    from rlobjectdetection_tpu.ops.nms_pallas_grid import nms_sorted_mask_pallas_grid

    boxes, scores = _rand_dets(rng, 500, size=60.0)
    order = np.argsort(-scores)
    keep = np.asarray(
        nms_sorted_mask_pallas_grid(
            jnp.asarray(boxes[order]), jnp.ones(500, dtype=bool), 0.5,
            tile_size=128, interpret=True,
        )
    )
    oracle = np_greedy_nms(boxes[order], scores[order], 0.5)
    np.testing.assert_array_equal(np.where(keep)[0], np.sort(oracle))
