"""RoI op parity tests against numpy oracles transcribed from the reference's
CUDA/C sources (roi_align_kernel.cu, roi_pooling_kernel.cu, roi_crop semantics)."""

import numpy as np
import jax
import jax.numpy as jnp

from rlobjectdetection_tpu.ops import roi_align, roi_align_avg, roi_crop, roi_pool


def np_roi_align(feat_nchw, rois, ah, aw, scale):
    """Oracle: roi_align_kernel.cu:15-70 (single-sample bilinear)."""
    b, c, h, w = feat_nchw.shape
    r = rois.shape[0]
    out = np.zeros((r, c, ah, aw), dtype=np.float32)
    for n in range(r):
        bi = int(rois[n, 0])
        x1, y1, x2, y2 = rois[n, 1:] * scale
        roi_w = max(x2 - x1 + 1.0, 0.0)
        roi_h = max(y2 - y1 + 1.0, 0.0)
        bh = roi_h / (ah - 1.0)
        bw = roi_w / (aw - 1.0)
        for ph in range(ah):
            for pw in range(aw):
                hh = ph * bh + y1
                ww = pw * bw + x1
                if hh < 0 or hh >= h or ww < 0 or ww >= w:
                    continue
                hs = int(min(np.floor(hh), h - 2))
                ws = int(min(np.floor(ww), w - 2))
                hr = hh - hs
                wr = ww - ws
                out[n, :, ph, pw] = (
                    feat_nchw[bi, :, hs, ws] * (1 - hr) * (1 - wr)
                    + feat_nchw[bi, :, hs, ws + 1] * (1 - hr) * wr
                    + feat_nchw[bi, :, hs + 1, ws] * hr * (1 - wr)
                    + feat_nchw[bi, :, hs + 1, ws + 1] * hr * wr
                )
    return out


def np_roi_pool(feat_nchw, rois, ph_n, pw_n, scale):
    """Oracle: roi_pooling_kernel.cu:24-96."""
    b, c, h, w = feat_nchw.shape
    r = rois.shape[0]
    out = np.zeros((r, c, ph_n, pw_n), dtype=np.float32)
    for n in range(r):
        bi = int(rois[n, 0])
        rsw = int(round(rois[n, 1] * scale))
        rsh = int(round(rois[n, 2] * scale))
        rew = int(round(rois[n, 3] * scale))
        reh = int(round(rois[n, 4] * scale))
        roi_w = max(rew - rsw + 1, 1)
        roi_h = max(reh - rsh + 1, 1)
        # exact-integer cell partition — the CUDA kernel's intended semantics
        # (roi_pooling_kernel.cu:54-60) minus its float32 boundary jitter
        for ph in range(ph_n):
            for pw in range(pw_n):
                hs = min(max(ph * roi_h // ph_n + rsh, 0), h)
                he = min(max(-((-(ph + 1) * roi_h) // ph_n) + rsh, 0), h)
                ws = min(max(pw * roi_w // pw_n + rsw, 0), w)
                we = min(max(-((-(pw + 1) * roi_w) // pw_n) + rsw, 0), w)
                if he <= hs or we <= ws:
                    continue
                out[n, :, ph, pw] = feat_nchw[bi, :, hs:he, ws:we].max(axis=(1, 2))
    return out


def _fixture(rng, b=2, c=8, h=20, w=24, r=12):
    feat = rng.randn(b, c, h, w).astype(np.float32)
    rois = np.zeros((r, 5), dtype=np.float32)
    rois[:, 0] = rng.randint(0, b, size=r)
    x1 = rng.rand(r) * (w * 16 * 0.6)
    y1 = rng.rand(r) * (h * 16 * 0.6)
    rois[:, 1] = x1
    rois[:, 2] = y1
    rois[:, 3] = x1 + rng.rand(r) * (w * 16 * 0.4) + 16
    rois[:, 4] = y1 + rng.rand(r) * (h * 16 * 0.4) + 16
    return feat, rois


def _nhwc(feat_nchw):
    return jnp.asarray(np.transpose(feat_nchw, (0, 2, 3, 1)))


def test_roi_align_matches_cuda_oracle(rng):
    feat, rois = _fixture(rng)
    got = roi_align(_nhwc(feat), jnp.asarray(rois), 7, 7, 1.0 / 16.0)
    want = np_roi_align(feat, rois, 7, 7, 1.0 / 16.0)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, rtol=1e-4, atol=1e-5
    )


def test_roi_align_avg_matches_composition(rng):
    feat, rois = _fixture(rng)
    got = roi_align_avg(_nhwc(feat), jnp.asarray(rois), 7, 1.0 / 16.0)
    x8 = np_roi_align(feat, rois, 8, 8, 1.0 / 16.0)
    # stride-1 2x2 average pool (roi_align/modules/roi_align.py:28)
    want = 0.25 * (x8[..., :-1, :-1] + x8[..., :-1, 1:] + x8[..., 1:, :-1] + x8[..., 1:, 1:])
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, rtol=1e-4, atol=1e-5
    )


def test_roi_align_out_of_bounds_zero(rng):
    feat, _ = _fixture(rng, b=1)
    rois = np.array([[0, -500.0, -500.0, -400.0, -400.0]], dtype=np.float32)
    got = np.asarray(roi_align(_nhwc(feat), jnp.asarray(rois), 7, 7, 1.0 / 16.0))
    assert (got == 0).all()


def test_roi_align_grad_flows(rng):
    feat, rois = _fixture(rng, b=1, c=4, h=10, w=10, r=3)
    f = _nhwc(feat)

    def loss(x):
        return roi_align(x, jnp.asarray(rois), 7, 7, 1.0 / 16.0).sum()

    g = jax.grad(loss)(f)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_roi_pool_matches_cuda_oracle(rng):
    feat, rois = _fixture(rng)
    got = roi_pool(_nhwc(feat), jnp.asarray(rois), 7, 7, 1.0 / 16.0, chunk=4)
    want = np_roi_pool(feat, rois, 7, 7, 1.0 / 16.0)
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, rtol=1e-4, atol=1e-5
    )


def test_roi_pool_grad_routes_to_argmax(rng):
    """Max-pool backward: d(sum)/d(feat) puts exactly 1.0 on each non-empty
    cell's argmax element (roi_pooling_kernel.cu atomicAdd backward). Also
    pins that the checkpointed lax.map formulation stays differentiable —
    the un-rematted scan backward OOMs at train shapes (58.7 GB residual)."""
    feat, rois = _fixture(rng, b=2, c=4, h=12, w=12, r=6)
    f = _nhwc(feat)

    def loss(x):
        return roi_pool(x, jnp.asarray(rois), 7, 7, 1.0 / 16.0, chunk=4).sum()

    out = np.asarray(roi_pool(f, jnp.asarray(rois), 7, 7, 1.0 / 16.0, chunk=4))
    g = np.asarray(jax.grad(loss)(f))
    assert np.isfinite(g).all()
    # every unit of gradient mass is one non-empty pooled cell's contribution
    n_nonempty = int((out != 0).sum())  # continuous random feat: cell==0 <=> empty
    assert abs(g.sum() - n_nonempty) < 1e-3, (g.sum(), n_nonempty)
    assert (g >= 0).all()


def test_roi_crop_uniform_grid(rng):
    # a roi spanning exact integer feature coords samples the lattice exactly
    feat, _ = _fixture(rng, b=1, c=3, h=16, w=16)
    rois = np.array([[0, 2 * 16.0, 3 * 16.0, 8 * 16.0, 9 * 16.0]], dtype=np.float32)
    out = np.asarray(
        roi_crop(_nhwc(feat), jnp.asarray(rois), grid_size=7, spatial_scale=1 / 16.0, max_pool=False)
    )
    lin = np.linspace(0, 1, 7)
    ys = 3 + (9 - 3) * lin
    xs = 2 + (8 - 2) * lin
    for i, yy in enumerate(ys):
        for j, xx in enumerate(xs):
            y0, x0 = int(np.floor(yy)), int(np.floor(xx))
            wy, wx = yy - y0, xx - x0
            want = (
                feat[0, :, y0, x0] * (1 - wy) * (1 - wx)
                + feat[0, :, y0, min(x0 + 1, 15)] * (1 - wy) * wx
                + feat[0, :, min(y0 + 1, 15), x0] * wy * (1 - wx)
                + feat[0, :, min(y0 + 1, 15), min(x0 + 1, 15)] * wy * wx
            )
            np.testing.assert_allclose(out[0, i, j], want, rtol=1e-4, atol=1e-5)


def test_roi_crop_maxpool_shape(rng):
    feat, rois = _fixture(rng)
    out = roi_crop(_nhwc(feat), jnp.asarray(rois), grid_size=14, spatial_scale=1 / 16.0, max_pool=True)
    assert out.shape == (rois.shape[0], 7, 7, feat.shape[1])


def test_roi_align_cvjp_matches_autodiff(rng):
    """The sorted-scatter custom-vjp variant (ops/roi_align_vjp.py) must match
    the autodiff version in both forward and backward."""
    import jax

    from rlobjectdetection_tpu.ops.roi_align_vjp import roi_align_avg_cvjp

    feat, rois = _fixture(rng, b=2, c=8, h=14, w=18, r=10)
    f = _nhwc(feat)
    roisj = jnp.asarray(rois)
    f1 = np.asarray(roi_align_avg(f, roisj, 7, 1.0 / 16.0))
    f2 = np.asarray(roi_align_avg_cvjp(f, roisj, 7, 1.0 / 16.0))
    np.testing.assert_allclose(f1, f2, rtol=1e-4, atol=1e-5)

    g1 = jax.grad(lambda x: roi_align_avg(x, roisj, 7, 1.0 / 16.0).sum())(f)
    g2 = jax.grad(lambda x: roi_align_avg_cvjp(x, roisj, 7, 1.0 / 16.0).sum())(f)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_roi_crop_grad_flows(rng):
    feat, rois = _fixture(rng, b=1, c=4, h=12, w=12, r=3)
    f = _nhwc(feat)

    def loss(x):
        return roi_crop(x, jnp.asarray(rois), grid_size=14,
                        spatial_scale=1.0 / 16.0, max_pool=True).sum()

    g = jax.grad(loss)(f)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
