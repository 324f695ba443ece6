#!/usr/bin/env python
"""Attribute train-step time to components at several batch sizes.

Times independently-jitted sub-programs of the Res-101 COCO-800 train step
(the bench.py config) plus the full step, so the batch-scaling shape of each
stage is visible. Sync is a value fetch (block_until_ready is unreliable on
the tunneled axon platform — see DESIGN.md).

Run:  python tools/profile_step.py [bs ...]    (default: 2 4)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def scalarize(fn):
    """Wrap fn so the jitted program emits ONE f32 scalar — the value fetch
    (the only reliable sync on the tunneled axon platform) must not pull the
    whole output tree back over the tunnel."""
    import jax
    import jax.numpy as jnp

    def wrapped(*args):
        out = fn(*args)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(l.astype(jnp.float32).ravel()[:1].sum() for l in leaves)

    return jax.jit(wrapped)


def timeit(fn, *args, iters=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    float(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3   # ms


def main():
    import jax
    import jax.numpy as jnp

    from rlobjectdetection_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()  # host-fingerprinted dir (SIGILL-safe across host gens)

    from rlobjectdetection_tpu.config import Config
    from rlobjectdetection_tpu.models import FasterRCNN
    from rlobjectdetection_tpu.models.backbones.resnet import ResNetBase, ResNetHead
    from rlobjectdetection_tpu.models.rpn import RPNHead, proposal_layer, rpn_fg_probs
    from rlobjectdetection_tpu.models.targets import anchor_target, proposal_target
    from rlobjectdetection_tpu.ops.roi_align import roi_align_avg

    batch_sizes = [int(a) for a in sys.argv[1:] if a.isdigit()] or [2, 4]
    cfg = Config(ANCHOR_SCALES=(4, 8, 16, 32), MAX_NUM_GT_BOXES=50)
    h, w = 800, 1216
    fh, fw = h // 16, w // 16         # 50 x 76
    na = len(cfg.ANCHOR_SCALES) * len(cfg.ANCHOR_RATIOS)
    rng = np.random.RandomState(3)
    dtype = jnp.bfloat16

    base = ResNetBase(num_layers=101, dtype=dtype)
    head = ResNetHead(num_layers=101, dtype=dtype)
    rpn = RPNHead(num_anchors=na, dtype=dtype)

    key = jax.random.PRNGKey(0)
    x1 = jnp.zeros((1, h, w, 3), dtype)
    base_params = jax.jit(base.init)(key, x1)
    feat1 = jax.jit(base.apply)(base_params, x1)
    rpn_params = jax.jit(rpn.init)(key, feat1)
    pooled1 = jnp.zeros((128, 7, 7, 1024), dtype)
    head_params = jax.jit(head.init)(key, pooled1)

    rows = []
    for bs in batch_sizes:
        img = jnp.asarray(rng.randn(bs, h, w, 3).astype(np.float32) * 10, dtype)
        feat = jnp.asarray(rng.randn(bs, fh, fw, 1024).astype(np.float32), dtype)
        pooled = jnp.asarray(
            rng.randn(bs * 128, 7, 7, 1024).astype(np.float32), dtype)
        rois = jnp.asarray(
            np.concatenate(
                [np.repeat(np.arange(bs), 128)[:, None],
                 np.abs(rng.randn(bs * 128, 4)) * 300], axis=1
            ).astype(np.float32))
        gt = np.zeros((bs, 50, 5), dtype=np.float32)
        gt[:, :8, :4] = np.abs(rng.randn(bs, 8, 4)) * 250
        gt[:, :8, 2:4] += gt[:, :8, :2] + 50
        gt[:, :8, 4] = 1
        gt = jnp.asarray(gt)
        im_info = jnp.asarray(np.array([[h, w, 1.0]] * bs, np.float32))

        r = {"bs": bs}

        # backbone fwd + bwd
        bb_fwdbwd = scalarize(jax.grad(
            lambda p, x: base.apply(p, x).astype(jnp.float32).sum()))
        r["backbone_fwdbwd_ms"] = timeit(bb_fwdbwd, base_params, img)

        # rpn convs fwd+bwd on the C4 map
        rpn_fb = scalarize(jax.grad(lambda p, f: sum(
            o.astype(jnp.float32).sum() for o in rpn.apply(p, f))))
        r["rpn_convs_fwdbwd_ms"] = timeit(rpn_fb, rpn_params, feat)

        # proposal path: probs→decode→clip→topk→NMS→rois (fwd only; no grads flow)
        def prop(cls_map, bbox_map, info):
            probs = rpn_fg_probs(cls_map, na)
            return proposal_layer(
                probs, bbox_map, info, feat_stride=16,
                anchor_scales=cfg.ANCHOR_SCALES, anchor_ratios=cfg.ANCHOR_RATIOS,
                pre_nms_top_n=cfg.TRAIN.RPN_PRE_NMS_TOP_N,
                post_nms_top_n=cfg.TRAIN.RPN_POST_NMS_TOP_N,
                nms_thresh=cfg.TRAIN.RPN_NMS_THRESH, nms_tile=cfg.NMS_TILE)[0]
        cls_map = jnp.asarray(rng.randn(bs, fh, fw, 2 * na).astype(np.float32), dtype)
        bbox_map = jnp.asarray(rng.randn(bs, fh, fw, 4 * na).astype(np.float32) * 0.1, dtype)
        r["proposal_nms_ms"] = timeit(scalarize(prop), cls_map, bbox_map, im_info)

        # target layers
        at = scalarize(lambda k, g, i: anchor_target(
            k, (fh, fw), g, i, feat_stride=16, anchor_scales=cfg.ANCHOR_SCALES,
            anchor_ratios=cfg.ANCHOR_RATIOS))
        r["anchor_target_ms"] = timeit(at, key, gt, im_info)
        all_rois = jnp.asarray(
            np.concatenate([np.repeat(np.arange(bs), cfg.TRAIN.RPN_POST_NMS_TOP_N)
                            .reshape(bs, -1, 1),
                            np.abs(rng.randn(bs, cfg.TRAIN.RPN_POST_NMS_TOP_N, 4)) * 300],
                           axis=2).astype(np.float32))
        pt = scalarize(lambda k, a, g: proposal_target(k, a, g))
        r["proposal_target_ms"] = timeit(pt, key, all_rois, gt)

        # roi align fwd+bwd (128 rois/img on the real-size C4 map)
        ra_fb = scalarize(jax.grad(lambda f, rr: roi_align_avg(
            f, rr, 7, 1.0 / 16.0).astype(jnp.float32).sum()))
        r["roi_align_fwdbwd_ms"] = timeit(ra_fb, feat, rois)

        # head (layer4 + heads-equivalent reduction) fwd+bwd
        hd_fb = scalarize(jax.grad(
            lambda p, x: head.apply(p, x).astype(jnp.float32).sum()))
        r["head_fwdbwd_ms"] = timeit(hd_fb, head_params, pooled)

        rows.append(r)
        print(r, flush=True)

    print("\ncomponent attribution (ms):")
    keys = [k for k in rows[0] if k != "bs"]
    print(f"{'component':26s}" + "".join(f"bs{r['bs']:<8d}" for r in rows))
    for k in keys:
        print(f"{k:26s}" + "".join(f"{r[k]:<10.2f}" for r in rows))


if __name__ == "__main__":
    main()
