"""Pallas RoIAlign forward (interpret mode on the CPU suite; the TPU
measurements live in DESIGN.md — the kernel is opt-in via ALIGN_IMPL)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental import pallas as pl


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))


def _rand_rois(rng, r, b, img_w=600, img_h=400):
    rois = np.zeros((r, 5), np.float32)
    rois[:, 0] = np.repeat(np.arange(b), r // b)
    rois[:, 1] = rng.rand(r) * img_w * 0.6
    rois[:, 2] = rng.rand(r) * img_h * 0.6
    rois[:, 3] = rois[:, 1] + rng.rand(r) * img_w * 0.4 + 16
    rois[:, 4] = rois[:, 2] + rng.rand(r) * img_h * 0.4 + 16
    return jnp.asarray(rois)


def test_pallas_align_matches_xla(rng):
    from rlobjectdetection_tpu.ops.roi_align import roi_align_avg
    from rlobjectdetection_tpu.ops.roi_align_pallas import roi_align_avg_pallas

    feats = jnp.asarray(rng.randn(2, 25, 38, 256).astype(np.float32))
    rois = _rand_rois(rng, 44, 2)          # 22/img — even, exercises group path
    want = np.asarray(roi_align_avg(feats, rois, 7, 1 / 16.0), np.float32)
    got = np.asarray(roi_align_avg_pallas(feats, rois, 7, 1 / 16.0, 22),
                     np.float32)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-2, rel                 # bf16 weight rounding bound


def test_pallas_align_grad_matches_xla(rng):
    from rlobjectdetection_tpu.ops.roi_align import roi_align_avg
    from rlobjectdetection_tpu.ops.roi_align_pallas import roi_align_avg_pallas

    feats = jnp.asarray(rng.randn(1, 20, 30, 128).astype(np.float32))
    rois = _rand_rois(rng, 8, 1, img_w=470, img_h=310)

    def loss(fn):
        return lambda f: (fn(f).astype(jnp.float32) ** 2).sum()

    g_p = jax.grad(loss(lambda f: roi_align_avg_pallas(f, rois, 7, 1 / 16.0, 8)))(feats)
    g_x = jax.grad(loss(lambda f: roi_align_avg(f, rois, 7, 1 / 16.0)))(feats)
    rel = np.abs(np.asarray(g_p) - np.asarray(g_x)).max() / np.abs(np.asarray(g_x)).max()
    assert rel < 1e-2, rel


def test_pallas_align_out_of_bounds_zeroed(rng):
    """Cells whose sample point falls outside the image are exactly 0 in both
    paths (roi_align_kernel.cu zero rule)."""
    from rlobjectdetection_tpu.ops.roi_align import roi_align
    from rlobjectdetection_tpu.ops.roi_align_pallas import roi_align_fwd_pallas

    feats = jnp.asarray(rng.randn(1, 12, 16, 128).astype(np.float32)) + 3.0
    # roi hanging off the right/bottom edge at feature scale
    rois = jnp.asarray([[0, 150.0, 100.0, 400.0, 300.0]], jnp.float32)
    a = np.asarray(roi_align_fwd_pallas(feats, rois, 8, 1 / 16.0, 1))
    b = np.asarray(roi_align(feats, rois, 8, 8, 1 / 16.0))
    np.testing.assert_array_equal(a == 0.0, b == 0.0)
    assert (a == 0).any()
