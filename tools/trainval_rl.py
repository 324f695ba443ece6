#!/usr/bin/env python
"""RL refinement trainer/evaluator CLI.

Rebuild of /root/reference/trainval_net.py (root): train the 56-action
action-value ResNet-101 on ΔIoU labels over base-detector detections
(`Train`, l.265); evaluate by predicting actions, moving boxes, re-scoring with
COCO eval (`Evaluate`, l.175 — repaired per SURVEY.md §2.7: the committed
reference eval crashes on missing imports/undefined names).
"""

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser("RL bbox-refinement training")
    p.add_argument("-e", "--evaluate", action="store_true")
    p.add_argument("--resume", default=None)
    p.add_argument("--batch_size", default=2, type=int)
    p.add_argument("--epochs", default=None, type=int)
    p.add_argument("--maxk", default=1, type=int)
    p.add_argument("--pretrained", default=None,
                   help="detector checkpoint dir to warm-start the trunk")
    p.add_argument("--ann_file", default=None)
    p.add_argument("--dt_file", default=None)
    p.add_argument("--data_dir", default=None)
    p.add_argument("--save_dir", default=None)
    p.add_argument("--img_short", default=None, type=int,
                   help="override train/test short side (config.py train_img_short)")
    p.add_argument("--img_size", default=None, type=int,
                   help="override max size (config.py train_img_size)")
    p.add_argument("--max_stat_dets", default=5000, type=int,
                   help="subsample the pos/neg weight statistic (5000 = the "
                        "reference call site, RL_coco_dataset.py:63-66; 0 = "
                        "full exact pass)")
    p.add_argument("--stat_workers", default=8, type=int,
                   help="threads for the weight statistic (reference used 32 processes)")
    p.add_argument("--layers", default=101, type=int,
                   help="policy-net ResNet depth (reference fixes 101)")
    p.add_argument("--aot_cache", default=None,
                   help="dir for serialized step executables; restarted "
                        "processes deserialize instead of recompiling "
                        "(engine/aot.py)")
    p.add_argument("--lr", default=None, type=float,
                   help="override RLConfig.learning_rate (reference reads "
                        "config.learning_rate, trainval_net.py:107-112)")
    p.add_argument("--wire", default="bf16", choices=["bf16", "f32"],
                   help="eval image-blob wire dtype (bf16 halves the bytes "
                        "shipped to the device; the f32 net upcasts on "
                        "device — see evaluate())")
    return p.parse_args()


def main():
    from tools._env import setup_platform

    setup_platform()
    import jax
    import jax.numpy as jnp
    import optax

    from rlobjectdetection_tpu.config import RLConfig
    from rlobjectdetection_tpu.data.rl_coco import COCODataLoader, COCODataset, COCOTransform
    from rlobjectdetection_tpu.engine.checkpoint import load_checkpoint, save_checkpoint
    from rlobjectdetection_tpu.models.rl import Action, RLPolicyNet, warm_start_from_detector
    from rlobjectdetection_tpu.utils import AveMeter, init_log

    args = parse_args()
    log = init_log("rl")
    phase = "test" if args.evaluate else "train"
    cfg = RLConfig(phase=phase)
    if args.ann_file:
        object.__setattr__(cfg, f"{phase}_ann_file", args.ann_file)
    if args.dt_file:
        object.__setattr__(cfg, f"{phase}_dt_file", args.dt_file)
    if args.data_dir:
        object.__setattr__(cfg, f"{phase}_data_dir", args.data_dir)
    if args.lr is not None:
        object.__setattr__(cfg, "learning_rate", args.lr)
    save_dir = args.save_dir or cfg.save_dir
    os.makedirs(save_dir, exist_ok=True)

    action = Action(list(cfg.act_delta), alpha=1.0, iou_thres=cfg.act_iou_thres,
                    wtrans=cfg.act_wtrans)
    log.info(f"{action.num_acts} actions")

    img_short = list(cfg.train_img_short if phase == "train" else cfg.test_img_short)
    img_size = cfg.train_img_size if phase == "train" else cfg.test_img_size
    if args.img_short:
        img_short = [args.img_short]
    if args.img_size:
        img_size = args.img_size
    transform = COCOTransform(
        img_short, img_size,
        flip=cfg.train_flip if phase == "train" else cfg.test_flip,
    )
    dataset = COCODataset(
        cfg.data_dir, cfg.ann_file, cfg.dt_file, action,
        transform_fn=transform,
        normalize_mean=cfg.normalize_mean, normalize_std=cfg.normalize_std,
        max_stat_dets=args.max_stat_dets or None,   # 0 → full exact pass
        stat_workers=args.stat_workers,
    )
    loader = COCODataLoader(dataset, args.batch_size, shuffle=(phase == "train"))
    log.info(f"dataset: {len(dataset)} images")

    # Pallas fused stem on single-device TPU runs (no GSPMD partitioning
    # rule — multi-device meshes keep the XLA stem), mirroring trainval_net.
    fused = (jax.default_backend() == "tpu" and jax.process_count() == 1
             and math.gcd(args.batch_size, len(jax.devices())) == 1)
    model = RLPolicyNet(num_acts=action.num_acts, num_layers=args.layers,
                        conv1_fused=fused, layer1_fused=fused)

    sample = next(iter(loader))
    key = jax.random.PRNGKey(3)
    params = jax.jit(model.init)(
        {"params": key},
        jnp.asarray(sample["data"]), jnp.asarray(sample["bboxes"]),
        jnp.asarray(sample["labels"][..., 1]), jnp.asarray(sample["labels"][..., 2]),
    )["params"]

    if args.pretrained:
        det_tree, _ = load_checkpoint(args.pretrained)
        params = warm_start_from_detector(params, det_tree["params"])
        log.info(f"warm-started trunk from {args.pretrained}")

    # freeze conv1..layer3 (Reinforcement/resnet.py:139-147); bias lr ×2 param
    # groups + SGD (trainval_net.py:102-114)
    def label_fn(params):
        import jax as _jax

        def lab(path, _):
            keys = tuple(p.key for p in path)
            if keys[0] == "base":
                return "frozen"
            if keys[-1] in ("mean", "var"):
                return "frozen"
            # layer4 BN affine TRAINS upstream (freeze_layer stops at layer3):
            # its weight joins the weight group, its bias the lr x2 bias group
            return "bias" if keys[-1] == "bias" else "weight"

        return _jax.tree_util.tree_map_with_path(lab, params)

    def lr_sched(count):
        # multi-step decay at epochs in train_lr_decay (utils.adjust_learning_rate)
        steps_per_epoch = max(len(loader), 1)
        epoch = count // steps_per_epoch
        mult = 1.0
        for e in cfg.train_lr_decay:
            mult = jnp.where(epoch >= e, mult * 0.1, mult)
        return cfg.learning_rate * mult

    def sgd(lr_mult, wd):
        return optax.chain(
            optax.add_decayed_weights(wd),
            optax.trace(decay=cfg.momentum),
            optax.scale_by_schedule(lambda c: -lr_sched(c) * lr_mult),
        )

    tx = optax.multi_transform(
        {"weight": sgd(1.0, cfg.weight_decay), "bias": sgd(2.0, 0.0),
         "frozen": optax.set_to_zero()},
        label_fn(params),
    )
    opt_state = tx.init(params)

    start_epoch = 0
    if args.resume:
        from rlobjectdetection_tpu.engine.train import TrainState

        state = TrainState(params, opt_state, jnp.int32(0))
        state, meta = load_checkpoint(args.resume, state)
        params, opt_state = state.params, state.opt_state
        start_epoch = int(meta.get("epoch", 0))
        log.info(f"resumed from {args.resume} at epoch {start_epoch}")

    @jax.jit
    def train_step(params, opt_state, data, bboxes, targets, weights, num_dts):
        def loss_fn(p):
            # num_dts restores the reference's exact-batch-max loss
            # denominator under the 16-quantized collate padding
            _, loss, noweight = model.apply(
                {"params": p}, data, bboxes, targets, weights, num_dts
            )
            return loss, noweight

        (loss, noweight), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, opt_state2, loss, noweight

    @jax.jit
    def eval_step(params, data, bboxes):
        pred, _, _ = model.apply({"params": params}, data, bboxes)
        return pred

    if args.aot_cache:
        from rlobjectdetection_tpu.engine import AotExecutableCache

        train_step = AotExecutableCache(train_step, args.aot_cache)
        eval_step = AotExecutableCache(eval_step, args.aot_cache)

    if args.evaluate:
        # pin restored host-backed params on device once — jitted eval_step
        # would silently re-upload the full tree every batch otherwise
        evaluate(args, cfg, dataset, loader, eval_step,
                 jax.device_put(params), action, log)
        return

    max_epoch = args.epochs or cfg.train_max_epoch
    from rlobjectdetection_tpu.engine.train import TrainState

    # data-parallel mesh, like the reference's DataParallel wrap of the RL net
    # (trainval_net.py:117-118) — batch sharded, params replicated, psum by XLA
    from rlobjectdetection_tpu.parallel import make_mesh, replicate, shard_batch

    n_avail = len(jax.devices())
    n_dev = math.gcd(args.batch_size, n_avail)
    if n_dev < n_avail:
        log.warning(f"batch size {args.batch_size} only divides {n_dev} of "
                    f"{n_avail} devices — training on {n_dev}")
    mesh = make_mesh(n_dev)
    log.info(f"data-parallel over {n_dev} device(s)")
    with mesh:
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
        for epoch in range(start_epoch, max_epoch):
            # epoch-keyed batch plan + per-item transform rng: a resumed run
            # replays exactly the stream the uninterrupted run would have used
            # (deterministic resume — validated by tools/rl_resume_validate.py)
            loader.set_epoch(epoch)
            batch_time, data_time, losses = AveMeter(), AveMeter(), AveMeter()
            end = time.time()
            for it, batch in enumerate(loader):
                data_time.update(time.time() - end)
                # collate zero-fills padded rows, so labels[..., 2] already
                # carries zero weight there — no extra masking needed
                raw = {
                    "data": np.asarray(batch["data"]),
                    "bboxes": np.asarray(batch["bboxes"]),
                    "targets": np.asarray(batch["labels"][..., 1]),
                    "weights": np.asarray(batch["labels"][..., 2]),
                    "num_dts": np.asarray(batch["num_dts"]),
                }
                if raw["data"].shape[0] % n_dev == 0:
                    sb = shard_batch(mesh, raw)
                else:   # ragged final batch: replicate-free single-device put
                    sb = {k: jnp.asarray(v) for k, v in raw.items()}
                params, opt_state, loss, noweight = train_step(
                    params, opt_state,
                    sb["data"], sb["bboxes"], sb["targets"], sb["weights"],
                    sb["num_dts"],
                )
                batch_time.update(time.time() - end)
                end = time.time()
                if it % 10 == 0:
                    # value-fetch only at log time: float(loss) every step
                    # would sync the dispatch pipeline per iteration (the
                    # per-call latency is the axon bottleneck, CLAUDE.md)
                    losses.update(float(loss))
                    log.info(
                        f"[{epoch}][{it}/{len(loader)}] loss(sampled) {losses.avg:.4f} "
                        f"(noweight {float(noweight):.4f}) "
                        f"batch {batch_time.avg:.3f}s data {data_time.avg:.3f}s"
                    )
            state = TrainState(params, opt_state,
                               jnp.int32((epoch + 1) * len(loader)))
            ckpt = os.path.join(save_dir, f"rl_epoch_{epoch + 1}")
            save_checkpoint(ckpt, state, epoch=epoch + 1)
            log.info(f"saved {ckpt}")


def evaluate(args, cfg, dataset, loader, eval_step, params, action, log):
    """Predict actions, teacher-force the top-k moves, dump COCO json, rescore
    (trainval_net.py:175-263, repaired)."""
    import jax.numpy as jnp

    from rlobjectdetection_tpu.data.coco_eval import cocoval

    all_results = []
    prec_sum, prec_cnt = 0.0, 0
    # composed-eval accounting (VERDICT r4 #7): wall time split into the
    # loader (host decode/resize/collate), the device step + value fetch
    # (tunnel-transfer-inclusive), and the host post (move + json rows)
    t_total0, t_data, t_step, t_post, n_imgs = time.time(), 0.0, 0.0, 0.0, 0
    end = time.time()
    # bf16 wire precast (same trick as tools/test_net.py's transfer stage):
    # the composed rate is bound by shipping [B, 800, 1216, 3] f32 image
    # blobs over the ~50 MB/s tunnel (measured: step+fetch 23.9 s of a
    # 27.2 s 64-image eval = 31 MB/s of pure wire; device forward pencils to
    # <0.2 s). Casting host-side (ml_dtypes registers bf16 with numpy)
    # halves the bytes in flight; the f32 policy net upcasts on device.
    # Eval-only — training keeps f32 end-to-end. Unlike test_net (whose
    # backbone computes in bf16 anyway) this IS a wire quantization of an
    # f32 net's input: ±0.25 on mean-subtracted pixels, below the ±0.5
    # uint8 decode quantization already present.
    import ml_dtypes  # noqa: F401  (numpy bf16 dtype registration)
    wire = np.dtype("bfloat16" if args.wire == "bf16" else "float32")
    for batch in loader:
        t_data += time.time() - end
        s0 = time.time()
        pred = np.asarray(
            eval_step(params, jnp.asarray(batch["data"].astype(wire)),
                      jnp.asarray(batch["bboxes"]))
        ).reshape(batch["bboxes"].shape[0], batch["bboxes"].shape[1], -1)
        t_step += time.time() - s0
        s1 = time.time()
        bboxes = batch["bboxes"]
        targets = batch["labels"][..., 1]
        # move + precision over the FULL padded batch, as the reference
        # Evaluate does (trainval_net.py:211): preck's denominator is
        # batch_size*maxk including empty/padded images, AveMeter-averaged
        # per batch — per-image averaging would not be comparable
        xywh = bboxes[..., 1:5].copy()
        xywh[..., 2] -= xywh[..., 0]
        xywh[..., 3] -= xywh[..., 1]
        moved_all, prec = action.move_from_act(xywh, pred, targets, args.maxk)
        prec_sum += prec
        prec_cnt += 1
        for i in range(bboxes.shape[0]):
            n = int(batch["num_dts"][i])
            if n == 0:
                continue
            scale = float(batch["im_info"][i][2])
            moved = moved_all[i, :n] / scale
            for k in range(n):
                all_results.append(
                    {
                        "image_id": int(bboxes[i, k, 7]),
                        "category_id": int(bboxes[i, k, 6]),
                        "bbox": [float(x) for x in moved[k]],
                        "score": float(bboxes[i, k, 5]),
                    }
                )
        t_post += time.time() - s1
        n_imgs += int(bboxes.shape[0])
        end = time.time()
    t_total = time.time() - t_total0
    log.info(
        f"composed eval: {n_imgs} images in {t_total:.1f}s = "
        f"{n_imgs / max(t_total, 1e-9):.2f} img/s "
        f"(loader {t_data:.1f}s, step+fetch {t_step:.1f}s, post {t_post:.1f}s)")
    log.info(f"Preck precision@{args.maxk}: {prec_sum / max(prec_cnt, 1):.2f}%")
    res_file = os.path.join(args.save_dir or cfg.save_dir, "rl_results.json")
    with open(res_file, "w") as f:
        json.dump(all_results, f)
    log.info(f"wrote {res_file}; running COCO eval")
    cocoval(cfg.ann_file, res_file)


if __name__ == "__main__":
    main()
