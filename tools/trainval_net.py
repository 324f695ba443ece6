#!/usr/bin/env python
"""Base detector trainer CLI.

Rebuild of /root/reference/RCNN_bases/trainval_net.py: same flags (--dataset,
--net, --bs, --lr, --epochs, --lr_decay_step, --r resume, --use_tfb, --ls,
--cag, --mGPUs → here any-number-of-chips data parallel by default), dataset
selection with per-dataset anchor overrides (l.160-181), yaml cfg + --set
overrides (l.183-188), aspect-grouped batching, per-epoch checkpointing.
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train a TPU-native Faster R-CNN")
    p.add_argument("--dataset", default="pascal_voc")
    p.add_argument("--net", default="res101",
                   choices=["vgg16", "res50", "res101", "res152", "tiny"])
    p.add_argument("--start_epoch", default=1, type=int)
    p.add_argument("--epochs", default=20, type=int)
    p.add_argument("--disp_interval", default=100, type=int)
    p.add_argument("--save_dir", default="models")
    p.add_argument("--bs", dest="batch_size", default=1, type=int)
    p.add_argument("--ls", dest="large_scale", action="store_true")
    p.add_argument("--cag", dest="class_agnostic", action="store_true")
    p.add_argument("--o", dest="optimizer", default="sgd", choices=["sgd", "adam"])
    p.add_argument("--lr", default=0.001, type=float)
    p.add_argument("--lr_decay_step", default=5, type=int)
    p.add_argument("--lr_decay_gamma", default=0.1, type=float)
    p.add_argument("--s", dest="session", default=1, type=int)
    p.add_argument("--r", dest="resume", action="store_true")
    p.add_argument("--checkepoch", default=1, type=int)
    p.add_argument("--use_tfb", action="store_true")
    p.add_argument("--cfg", dest="cfg_file", default=None)
    p.add_argument("--set", dest="set_cfgs", nargs=argparse.REMAINDER, default=None)
    p.add_argument("--pretrained", default=None, help="converted backbone checkpoint dir")
    p.add_argument("--pooling_mode", default=None)
    p.add_argument("--profile", default=None,
                   help="capture a jax.profiler trace of the first N steps into logs/trace")
    p.add_argument("--aot_cache", default=None,
                   help="dir for serialized train-step executables; a "
                        "restarted process deserializes instead of paying "
                        "the XLA compile (engine/aot.py)")
    p.add_argument("--packed_input", default=None,
                   help="directory of pre-packed input blobs (data/packed.py); "
                        "built on first use — batch assembly becomes an mmap "
                        "read, so ONE host core can feed the chip")
    p.add_argument("--nw", dest="num_workers", default=4, type=int,
                   help="decode worker threads (reference --nw, trainval_net.py:88); 0 = synchronous")
    p.add_argument("--skip_nonfinite", action="store_true",
                   help="skip optimizer updates whose gradients contain NaN/Inf")
    # multi-host (jax.distributed): pass all three, or rely on SLURM env vars
    p.add_argument("--dist_coordinator", default=None,
                   help="coordinator address host:port for jax.distributed")
    p.add_argument("--dist_nprocs", default=None, type=int)
    p.add_argument("--dist_rank", default=None, type=int)
    return p.parse_args()


DATASET_MAP = {
    "pascal_voc": ("voc_2007_trainval", "voc_2007_test"),
    "pascal_voc_0712": ("voc_2007_trainval+voc_2012_trainval", "voc_2007_test"),
    "coco": ("coco_2014_train+coco_2014_valminusminival", "coco_2014_minival"),
    "imagenet": ("imagenet_train", "imagenet_val"),
    "vg": ("vg_1600-400-20_train", "vg_1600-400-20_val"),
}


def main():
    from tools._env import enable_fused_tpu_defaults, setup_platform

    args = parse_args()
    setup_platform()

    # must run before any other jax use: joins this process into the global
    # runtime so jax.devices() spans all hosts (SURVEY.md §2.6 TPU-native
    # multi-node; DCN mesh extension of the same SPMD step)
    from rlobjectdetection_tpu.parallel import distributed

    distributed.initialize(args.dist_coordinator, args.dist_nprocs, args.dist_rank)

    import jax
    import jax.numpy as jnp

    from rlobjectdetection_tpu.config import (
        Config, DATASET_OVERRIDES, LS_OVERRIDES, cfg_from_file, cfg_from_list, cfg_update,
    )
    from rlobjectdetection_tpu.data import RoiBatchLoader, combined_roidb
    from rlobjectdetection_tpu.engine import (
        build_optimizer, make_lr_schedule, make_train_step,
    )
    from rlobjectdetection_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
    from rlobjectdetection_tpu.models import FasterRCNN
    from rlobjectdetection_tpu.parallel import make_mesh, replicate
    from rlobjectdetection_tpu.parallel.distributed import (
        fetch_scalar, host_local_batch_slice, shard_local_batch,
    )
    from rlobjectdetection_tpu.utils import AveMeter, MetricsWriter, init_log

    log = init_log("train")

    cfg = Config()
    if args.dataset in DATASET_OVERRIDES:
        cfg = cfg_update(cfg, DATASET_OVERRIDES[args.dataset])
    if args.large_scale:
        cfg = cfg_update(cfg, LS_OVERRIDES)
    if args.cfg_file:
        cfg = cfg_from_file(cfg, args.cfg_file)
    if args.set_cfgs:
        cfg = cfg_from_list(cfg, args.set_cfgs)
    if args.pooling_mode:
        cfg = cfg_update(cfg, {"POOLING_MODE": args.pooling_mode})
    np.random.seed(cfg.RNG_SEED)

    # Pallas fused stem/layer1 (ops/stem_pallas.py, ops/layer1_pallas.py):
    # auto-enable on any TPU run (tools/_env.py).
    cfg = enable_fused_tpu_defaults(cfg, args.set_cfgs)

    imdb_name, _ = DATASET_MAP.get(args.dataset, (args.dataset, None))
    imdb_obj, roidb, ratio_list, ratio_index = combined_roidb(
        imdb_name, training=True, use_flipped=cfg.TRAIN.USE_FLIPPED
    )
    log.info(f"{len(roidb)} roidb entries")

    loader_kw = dict(scales=cfg.TRAIN.SCALES, max_num_gt=cfg.MAX_NUM_GT_BOXES,
                     seed=cfg.RNG_SEED)
    if args.packed_input:
        from rlobjectdetection_tpu.data.packed import (PackedRoiBatchLoader,
                                                       pack_roidb)

        pack_roidb(roidb, cfg.TRAIN.SCALES, args.packed_input)  # incremental
        loader = PackedRoiBatchLoader(
            roidb, ratio_list, ratio_index, args.batch_size,
            pack_root=args.packed_input, **loader_kw)
    else:
        loader = RoiBatchLoader(
            roidb, ratio_list, ratio_index, args.batch_size, **loader_kw)
    iters_per_epoch = len(loader)

    backbone = {"vgg16": "vgg16", "res50": "resnet50", "res101": "resnet101",
                "res152": "resnet152"}.get(args.net, args.net)
    model = FasterRCNN(
        num_classes=imdb_obj.num_classes, backbone=backbone,
        class_agnostic=args.class_agnostic, cfg=cfg,
    )

    sample = next(iter(loader))
    sched = make_lr_schedule(args.lr, args.lr_decay_step * iters_per_epoch,
                             args.lr_decay_gamma)
    clip = 10.0 if backbone == "vgg16" else None  # trainval_net.py:331-332

    # data-parallel mesh over as many devices as evenly divide the batch
    n_host = jax.process_count()
    n_avail = len(jax.devices())
    n_dev = math.gcd(args.batch_size, n_avail)
    if n_host > 1 and n_dev != n_avail:
        raise SystemExit(
            f"multi-host run needs --bs divisible by the {n_avail} global "
            f"devices (got bs={args.batch_size})")
    if n_dev < n_avail:
        log.warning(
            f"batch size {args.batch_size} only divides {n_dev} of the "
            f"{n_avail} available devices — training on {n_dev} device(s); "
            f"raise --bs to a multiple of {n_avail} to use the whole mesh")
    if n_host > 1:
        # host-contiguous device order: the psum reduces over ICI first and
        # crosses DCN once (parallel/mesh.py::make_hybrid_mesh)
        from rlobjectdetection_tpu.parallel import make_hybrid_mesh

        mesh = make_hybrid_mesh()
    else:
        mesh = make_mesh(n_dev)
    log.info(f"data-parallel over {n_dev} device(s), {n_host} host(s)")
    with mesh:
        key = jax.random.PRNGKey(cfg.RNG_SEED)
        variables = jax.jit(model.init, static_argnames="train")(
            {"params": key, "sampling": key, "dropout": key},
            jnp.asarray(sample["data"]), jnp.asarray(sample["im_info"]),
            jnp.asarray(sample["gt_boxes"]), jnp.asarray(sample["num_boxes"]),
            train=True,
        )
        params = variables["params"]
        if args.pretrained:
            from rlobjectdetection_tpu.engine.checkpoint import load_params
            from tools.convert_torch_weights import merge_pretrained

            params = merge_pretrained(params, load_params(args.pretrained))
        tx, labels = build_optimizer(
            params, backbone, args.lr,
            weight_decay=cfg.TRAIN.WEIGHT_DECAY,
            momentum=cfg.TRAIN.MOMENTUM,
            double_bias=cfg.TRAIN.DOUBLE_BIAS,
            bias_decay=cfg.TRAIN.BIAS_DECAY,
            fixed_blocks=cfg.RESNET.FIXED_BLOCKS,
            lr_schedule=sched,
            clip_norm=clip,
        )
        from rlobjectdetection_tpu.engine.train import TrainState

        state = TrainState(params, tx.init(params), jnp.int32(0))

        ckpt_dir = os.path.join(args.save_dir, args.net, args.dataset)
        os.makedirs(ckpt_dir, exist_ok=True)
        if args.resume:
            ckpt = os.path.join(
                ckpt_dir, f"faster_rcnn_{args.session}_{args.checkepoch}"
            )
            state, meta = load_checkpoint(ckpt, state)
            args.start_epoch = int(meta.get("epoch", args.checkepoch)) + 1
            log.info(f"resumed from {ckpt}")

        state = state._replace(
            params=replicate(mesh, state.params),
            opt_state=replicate(mesh, state.opt_state),
        )
        step_fn = make_train_step(model, tx, skip_nonfinite=args.skip_nonfinite)
        if args.aot_cache:
            from rlobjectdetection_tpu.engine import AotExecutableCache

            step_fn = AotExecutableCache(step_fn, args.aot_cache)
        writer = MetricsWriter("logs") if args.use_tfb else None

        if args.profile:
            from rlobjectdetection_tpu.utils.logging import start_profiler_trace

            start_profiler_trace("logs/trace")
        step_key = jax.random.PRNGKey(cfg.RNG_SEED + 1)
        meters = {k: AveMeter() for k in
                  ("loss", "rpn_cls", "rpn_box", "rcnn_cls", "rcnn_box")}
        global_step = int(state.step)
        run_steps = 0   # steps THIS run (the --profile window must not
                        # depend on the resumed global step)
        from rlobjectdetection_tpu.data.prefetch import AsyncLoader, device_prefetch

        def put(b):
            return shard_local_batch(mesh, {k: np.asarray(v) for k, v in b.items()})

        # multi-host: each host decodes only its own rows of every batch
        # (HostShardLoader predicts the shared global canvas from roidb dims)
        if jax.process_count() > 1:
            from rlobjectdetection_tpu.data.loader import HostShardLoader

            h_start, h_size = host_local_batch_slice(args.batch_size)
            train_loader = HostShardLoader(loader, h_start, h_size)
        else:
            train_loader = loader

        for epoch in range(args.start_epoch, args.epochs + 1):
            start = time.time()
            # epoch-keyed batch plan (loader.set_epoch): a resumed process
            # replays exactly the data order the uninterrupted run would have
            # used, so resume is bitwise-deterministic (tools/resume_validate.py)
            loader.set_epoch(epoch)
            epoch_loader = (AsyncLoader(train_loader, args.num_workers)
                            if args.num_workers > 0 else train_loader)
            for it, sharded in enumerate(device_prefetch(epoch_loader, put)):
                state, metrics = step_fn(
                    state, sharded, jax.random.fold_in(step_key, global_step)
                )
                global_step += 1
                run_steps += 1
                if args.profile and run_steps == int(args.profile):
                    from rlobjectdetection_tpu.utils.logging import stop_profiler_trace

                    jax.block_until_ready(metrics["loss"])
                    stop_profiler_trace()
                    log.info("profiler trace written to logs/trace")
                if it % args.disp_interval == 0:
                    m = {k: fetch_scalar(v) for k, v in metrics.items()}
                    for k in meters:
                        meters[k].update(m[k])
                    lr_now = sched(global_step)
                    log.info(
                        f"[session {args.session}][epoch {epoch:2d}][iter {it:4d}/{iters_per_epoch}] "
                        f"loss: {meters['loss'].avg:.4f}, lr: {lr_now:.2e} "
                        f"fg/bg=({m['fg_cnt']:.0f}/{m['bg_cnt']:.0f}) "
                        f"rpn_cls {m['rpn_cls']:.4f} rpn_box {m['rpn_box']:.4f} "
                        f"rcnn_cls {m['rcnn_cls']:.4f} rcnn_box {m['rcnn_box']:.4f}"
                    )
                    if writer:
                        for k, v in m.items():
                            writer.scalar_summary(k, v, global_step)
            ckpt = os.path.join(ckpt_dir, f"faster_rcnn_{args.session}_{epoch}")
            # every process participates (orbax save synchronizes all hosts);
            # the checkpoint itself is written once from the primary replicas
            save_checkpoint(
                ckpt, state, session=args.session, epoch=epoch,
                pooling_mode=cfg.POOLING_MODE, class_agnostic=args.class_agnostic,
            )
            if jax.process_index() == 0:
                log.info(f"save model: {ckpt} (epoch time {time.time() - start:.1f}s)")


if __name__ == "__main__":
    main()
