#!/usr/bin/env python
"""Detector evaluation CLI.

Rebuild of /root/reference/RCNN_bases/test_net.py: load checkpoint (restoring
POOLING_MODE from it, l.169-172), run the detector over the test set, decode +
per-class NMS + 100-det/image cap (on device — engine/detect.py), pickle
`all_boxes` ("detections.pkl", l.324) and run `imdb.evaluate_detections`.
"""

import argparse
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a TPU-native Faster R-CNN")
    p.add_argument("--dataset", default="pascal_voc")
    p.add_argument("--net", default="res101")
    p.add_argument("--cfg", dest="cfg_file", default=None)
    p.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER, default=None)
    p.add_argument("--load_dir", default="models")
    p.add_argument("--ls", dest="large_scale", action="store_true")
    p.add_argument("--cag", dest="class_agnostic", action="store_true")
    p.add_argument("--s", "--checksession", dest="session", default=1, type=int)
    p.add_argument("--checkepoch", default=1, type=int)
    p.add_argument("--weights", default=None,
                   help="evaluate a converted params dir (tools/convert_torch_weights.py output) instead of a training checkpoint")
    p.add_argument("--vis", action="store_true")
    p.add_argument("--vis_max", default=0, type=int,
                   help="cap on --vis overlays (0 = all images, like the reference)")
    p.add_argument("--batch", default=1, type=int,
                   help="eval batch size; >1 groups images by padded-shape bucket "
                        "(same compile set, no cross-aspect padding waste)")
    p.add_argument("--aot_cache", default=None,
                   help="dir for serialized eval-forward executables — repeat "
                        "evals skip the per-bucket XLA compiles (engine/aot.py)")
    p.add_argument("--packed_input", default=None,
                   help="directory of pre-packed input blobs (data/packed.py); "
                        "built on first use — eval image assembly becomes an "
                        "mmap read, so ONE host core can feed the chip")
    return p.parse_args()


DATASET_MAP = {
    "pascal_voc": "voc_2007_test",
    "pascal_voc_0712": "voc_2007_test",
    "coco": "coco_2014_minival",
    "imagenet": "imagenet_val",
    "vg": "vg_1600-400-20_val",
}


def main():
    from tools._env import enable_fused_tpu_defaults, setup_platform

    setup_platform()
    import jax
    import jax.numpy as jnp

    from rlobjectdetection_tpu.config import (
        Config, DATASET_OVERRIDES, LS_OVERRIDES, cfg_from_file, cfg_from_list, cfg_update,
    )
    from rlobjectdetection_tpu.data import RoiBatchLoader, combined_roidb
    from rlobjectdetection_tpu.data.loader import eval_bucket_plan
    from rlobjectdetection_tpu.engine import detections_to_all_boxes, postprocess_detections
    from rlobjectdetection_tpu.engine.checkpoint import load_checkpoint
    from rlobjectdetection_tpu.models import FasterRCNN

    args = parse_args()
    cfg = Config()
    if args.dataset in DATASET_OVERRIDES:
        cfg = cfg_update(cfg, DATASET_OVERRIDES[args.dataset])
    if args.large_scale:
        cfg = cfg_update(cfg, LS_OVERRIDES)
    if args.cfg_file:
        cfg = cfg_from_file(cfg, args.cfg_file)
    if args.set_cfgs:
        cfg = cfg_from_list(cfg, args.set_cfgs)
    # fused Pallas kernels on TPU: the eval forward without them runs ~15%
    # under the bench rate (measured via the exported-artifact control)
    cfg = enable_fused_tpu_defaults(cfg, args.set_cfgs)
    np.random.seed(cfg.RNG_SEED)

    imdb_name = DATASET_MAP.get(args.dataset, args.dataset)
    imdb_obj, roidb, ratio_list, ratio_index = combined_roidb(
        imdb_name, training=False, use_flipped=False
    )
    num_images = len(roidb)
    print(f"{num_images} images for evaluation")

    backbone = {"vgg16": "vgg16", "res50": "resnet50", "res101": "resnet101",
                "res152": "resnet152"}.get(args.net, args.net)
    if args.weights:
        # converted reference checkpoint (caffe .pth → convert_torch_weights):
        # graft onto a fresh init so missing heads keep their init
        from rlobjectdetection_tpu.engine.checkpoint import load_params
        from tools.convert_torch_weights import merge_pretrained

        model = FasterRCNN(
            num_classes=imdb_obj.num_classes, backbone=backbone,
            class_agnostic=args.class_agnostic, cfg=cfg,
        )
        sample_hw = 128
        key = jax.random.PRNGKey(cfg.RNG_SEED)
        init_params = jax.jit(model.init, static_argnames="train")(
            {"params": key, "sampling": key, "dropout": key},
            jnp.zeros((1, sample_hw, sample_hw, 3), jnp.float32),
            jnp.asarray([[sample_hw, sample_hw, 1.0]], jnp.float32),
            train=False,
        )["params"]
        params = merge_pretrained(init_params, load_params(args.weights))
    else:
        ckpt = os.path.join(
            args.load_dir, args.net, args.dataset,
            f"faster_rcnn_{args.session}_{args.checkepoch}",
        )

        # peek checkpoint meta to restore POOLING_MODE (test_net.py:171-172)
        tree, meta = load_checkpoint(ckpt)
        if meta and meta.get("pooling_mode"):
            cfg = cfg_update(cfg, {"POOLING_MODE": meta["pooling_mode"]})
        model = FasterRCNN(
            num_classes=imdb_obj.num_classes, backbone=backbone,
            class_agnostic=args.class_agnostic, cfg=cfg,
        )
        params = tree["params"]

    # Pin the weights on device ONCE. Jitted calls re-transfer committed host
    # arrays on EVERY call, and an orbax-restored tree arrives as host-backed
    # arrays — at res101-f32 size that is ~170 MB of silent weight re-upload
    # per batch (the tunneled backend moves ~55 MB/s, so ~3 s/batch of it).
    params = jax.device_put(params)

    loader_kw = dict(scales=cfg.TEST.SCALES, max_num_gt=cfg.MAX_NUM_GT_BOXES,
                     training=False)
    if args.packed_input:
        from rlobjectdetection_tpu.data.packed import (PackedRoiBatchLoader,
                                                       pack_roidb)

        pack_roidb(roidb, cfg.TEST.SCALES, args.packed_input)  # incremental
        loader = PackedRoiBatchLoader(
            roidb, ratio_list, ratio_index, 1,
            pack_root=args.packed_input, **loader_kw)
    else:
        loader = RoiBatchLoader(roidb, ratio_list, ratio_index, 1, **loader_kw)

    fwd = jax.jit(
        lambda p, data, info: model.apply({"params": p}, data, info,
                                          train=False))
    if args.aot_cache:
        from rlobjectdetection_tpu.engine import AotExecutableCache

        fwd = AotExecutableCache(fwd, args.aot_cache)

    def forward(variables, data, info, train=False):
        return fwd(variables["params"], data, info)

    def _post(rois, cls_prob, bbox_pred, info, valid):
        return postprocess_detections(
            rois, cls_prob, bbox_pred, info, valid,
            num_classes=imdb_obj.num_classes,
            class_agnostic=args.class_agnostic,
            max_per_image=cfg.TEST.MAX_DETS_PER_IMAGE,
            nms_thresh=cfg.TEST.NMS,
            bbox_reg=cfg.TEST.BBOX_REG,
            normalize_stds=cfg.TRAIN.BBOX_NORMALIZE_STDS,
            normalize_means=cfg.TRAIN.BBOX_NORMALIZE_MEANS,
        )

    # the postprocess programs compile per process like the forward does
    # (the persistent JAX cache does not serve tunneled-TPU compiles), so
    # --aot_cache covers them too — eval restart latency stays pinned
    postprocess_one = jax.jit(_post)
    batched_post = jax.jit(jax.vmap(_post))
    if args.aot_cache:
        postprocess_one = AotExecutableCache(postprocess_one, args.aot_cache)
        batched_post = AotExecutableCache(batched_post, args.aot_cache)

    # wire format for the image blob: the model's compute dtype. ml_dtypes
    # registers bfloat16 with numpy, so np.dtype(cfg.DTYPE) resolves it.
    import ml_dtypes  # noqa: F401  (numpy dtype registration)
    xfer_dtype = np.dtype(cfg.DTYPE)

    dets = [None] * num_images
    t_det = 0.0
    n_done = 0
    t_wall0 = time.time()
    # steady-state accounting: the first batch of each padded shape carries
    # that shape's XLA compile (unless --aot_cache pre-warmed it), so the
    # composed-throughput report also shows the rate over repeat-shape batches
    t_steady, n_steady = 0.0, 0
    shape_buckets = {}   # padded (H, W) → count: each distinct shape is one XLA compile
    if args.batch > 1:
        # bucketed batching: the reference is strictly bs1 at eval
        # (test_net.py:230); same-shape images batch with no padding waste
        if len(cfg.TEST.SCALES) != 1:
            sys.exit("--batch >1 requires a single TEST scale (shape planning)")
        plan = eval_bucket_plan(roidb, cfg.TEST.SCALES[0], args.batch)
        # three-stage pipeline: assemble(k+2) ∥ H2D-transfer(k+1) ∥ compute(k)
        # on separate single-worker pools, so the composed rate is
        # max(assembly, transfer, device) instead of their sum. The transfer
        # stage also pre-casts pixels to the model's compute dtype: the
        # backbone casts on device anyway (resnet.py "compute-dtype cast"),
        # and float32→bfloat16 is the same round-to-nearest-even either side
        # of the wire — bit-identical results, half the bytes in flight
        # (tests/test_eval_batch.py::test_precast_input_bit_identical).
        import collections
        from concurrent.futures import ThreadPoolExecutor

        asm_pool, xfer_pool = ThreadPoolExecutor(1), ThreadPoolExecutor(1)
        asm = lambda item: loader._assemble(item[0], 1.0, pad_hw=item[1],
                                            pad_count=args.batch)

        def xfer(asm_fut):
            b = asm_fut.result()
            return (b, jax.device_put(b["data"].astype(xfer_dtype, copy=False)),
                    jax.device_put(b["im_info"]))

        asm_q = collections.deque(
            asm_pool.submit(asm, item) for item in plan[:2])
        xfer_q = collections.deque(
            [xfer_pool.submit(xfer, asm_q.popleft())] if asm_q else [])
        for k, (idxs, hw) in enumerate(plan):
            t_it = time.time()
            batch, data_dev, info_dev = xfer_q.popleft().result()
            if k + 2 < len(plan):
                asm_q.append(asm_pool.submit(asm, plan[k + 2]))
            if asm_q:
                xfer_q.append(xfer_pool.submit(xfer, asm_q.popleft()))
            # record the shape actually assembled — _assemble can grow past the
            # planned canvas on a rounding under-prediction, and the compile
            # audit below must count the shape that really compiled
            real_hw = tuple(batch["data"].shape[1:3])
            warm = real_hw in shape_buckets
            shape_buckets[real_hw] = shape_buckets.get(real_hw, 0) + len(idxs)
            t0 = time.time()
            out = forward({"params": params}, data_dev, info_dev, train=False)
            res = batched_post(out["rois"], out["cls_prob"], out["bbox_pred"],
                               info_dev, out["roi_valid"])
            # ONE bulk fetch per batch: per-image np.asarray slices are a
            # blocking host round trip EACH (32/batch) — measured 8.9 s/batch
            # over the tunneled backend vs ~0.3 s for the bulk get
            res = jax.device_get(res)
            t_det += time.time() - t0
            if warm:
                t_steady += time.time() - t_it
                n_steady += len(idxs)
            for j, idx in enumerate(idxs):
                dets[idx] = tuple(x[j] for x in res)
                if args.vis and (args.vis_max <= 0 or idx < args.vis_max):
                    _write_vis(imdb_obj, roidb, idx, *dets[idx])
            prev, n_done = n_done, n_done + len(idxs)
            if n_done // 100 > prev // 100 or n_done == num_images:
                print(f"im_detect: {n_done}/{num_images} {t_det / n_done:.3f}s/img")
    else:
        from rlobjectdetection_tpu.data.prefetch import device_prefetch

        # H2D transfer of image i+1/i+2 rides under image i's device compute;
        # pixels ship pre-cast to the compute dtype (see the --batch path)
        staged = device_prefetch(
            loader,
            lambda b: (b, jax.device_put(b["data"].astype(xfer_dtype, copy=False)),
                       jax.device_put(b["im_info"])))
        t_it = time.time()
        for i, (batch, data_dev, info_dev) in enumerate(staged):
            hw = tuple(batch["data"].shape[1:3])
            warm = hw in shape_buckets
            shape_buckets[hw] = shape_buckets.get(hw, 0) + 1
            t0 = time.time()
            out = forward({"params": params}, data_dev, info_dev, train=False)
            boxes, scores, classes, valid = jax.device_get(postprocess_one(
                out["rois"][0], out["cls_prob"][0], out["bbox_pred"][0],
                info_dev[0], out["roi_valid"][0],
            ))
            t_det += time.time() - t0
            if warm:
                t_steady += time.time() - t_it
                n_steady += 1
            dets[i] = (boxes, scores, classes, valid)
            if args.vis and (args.vis_max <= 0 or i < args.vis_max):
                _write_vis(imdb_obj, roidb, i, boxes, scores, classes, valid)
            if i % 100 == 0:
                print(f"im_detect: {i + 1}/{num_images} {t_det / (i + 1):.3f}s")
            t_it = time.time()

    # composed detect-loop rate: host image assembly + device forward +
    # postprocess. "steady" drops each shape's first batch (its XLA compile);
    # with --aot_cache pre-warmed the two rates converge.
    t_wall = time.time() - t_wall0
    print(f"detect loop: {num_images / t_wall:.1f} img/s wall "
          f"({t_wall:.1f}s total; device-timed {num_images / max(t_det, 1e-9):.1f} "
          f"img/s; steady {n_steady / max(t_steady, 1e-9):.1f} img/s "
          f"over {n_steady} repeat-shape images)")

    # recompilation report: pad_multiple quantization bounds the jit cache to
    # these buckets; each row below was one compile (VERDICT r1 weak-7)
    print(f"shape buckets: {len(shape_buckets)} distinct padded shapes "
          f"over {num_images} images")
    for hw, n in sorted(shape_buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {hw[0]}x{hw[1]}: {n} images")

    all_boxes = detections_to_all_boxes(dets, imdb_obj.num_classes)
    output_dir = os.path.join("output", args.net, imdb_name)
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, "detections.pkl"), "wb") as f:
        pickle.dump(all_boxes, f, pickle.HIGHEST_PROTOCOL)

    print("Evaluating detections")
    # competition mode (reference test_net.py:143): stable un-salted result
    # files that persist after scoring, ready for submission/inspection
    if hasattr(imdb_obj, "competition_mode"):
        imdb_obj.competition_mode(on=True)
    imdb_obj.evaluate_detections(all_boxes, output_dir)


def _write_vis(imdb_obj, roidb, i, boxes, scores, classes, valid):
    """--vis: draw the detections on the original image (test_net.py:269,308-312)
    for the first images and save under output/vis."""
    import cv2
    import numpy as np

    im = cv2.imread(roidb[i]["image"])
    if im is None:
        return
    b = np.asarray(boxes)
    s = np.asarray(scores)
    c = np.asarray(classes)
    v = np.asarray(valid)
    for k in range(len(b)):
        if not v[k] or s[k] < 0.3:
            continue
        x1, y1, x2, y2 = (int(round(x)) for x in b[k])
        cv2.rectangle(im, (x1, y1), (x2, y2), (0, 204, 0), 2)
        name = imdb_obj.classes[int(c[k])] if int(c[k]) < imdb_obj.num_classes else str(c[k])
        cv2.putText(im, f"{name}: {s[k]:.2f}", (x1, y1 + 14),
                    cv2.FONT_HERSHEY_PLAIN, 1.0, (0, 0, 255), 1)
    os.makedirs(os.path.join("output", "vis"), exist_ok=True)
    cv2.imwrite(os.path.join("output", "vis", f"det_{i:04d}.jpg"), im)


if __name__ == "__main__":
    main()
