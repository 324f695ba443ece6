"""Benchmark: ResNet-101 Faster R-CNN training throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline (BASELINE.md): the reference trains Res-101 COCO at scale 800 on
8× Titan X at 6.0 hr/epoch ≈ 0.68 images/sec/GPU. vs_baseline is the per-chip
multiple of that number (target ≥ 3.0).

`--infer` benchmarks the serving path instead: eval forward + on-device decode
+ per-class NMS + top-100 cap (the full test_net per-image pipeline).

`--rl` benchmarks the RL refinement workload (the repo's namesake): the
56-action action-value net — frozen conv1..layer3 trunk, RoIAlignAvg over the
detection boxes, stride-1 layer4 head, weighted-MSE train step
(Reinforcement/resnet.py:166-199 semantics) at COCO scale 800.
"""

import json
import os
import sys
import threading
import time

import numpy as np

BASELINE_IMG_PER_SEC_PER_GPU = 0.68
V5E_BF16_PEAK = 197e12   # TPU v5e: 197 TFLOP/s bf16


class _Watchdog:
    """Stall guard: the tunneled axon backend hangs occasionally (DESIGN.md
    "Composed eval throughput": a trivial dispatch probe "hung >10 min
    outright"), and round 4's driver artifact was empty because a hang left
    bench.py with nothing printed. Every stage arms a deadline; on expiry a
    daemon thread emits ONE diagnostic JSON line on stdout and exits, so the
    artifact is parseable even when the tunnel never comes back. Heartbeats
    go to stderr to keep stdout a single JSON line.
    """

    def __init__(self):
        self.metric = "bench"
        self.t0 = time.monotonic()
        self._stage = "startup"
        self._deadline = None   # disarmed until the first stage() call —
        self._thread = None     # importing bench (tests do) must be inert

    def stage(self, name, seconds):
        print(json.dumps({"status": name, "t": round(time.monotonic() - self.t0, 1)}),
              file=sys.stderr, flush=True)
        self._stage, self._deadline = name, time.monotonic() + seconds
        if self._thread is None:
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()
            # a driver-timeout SIGTERM must also leave a parseable artifact
            import signal

            def _on_term(signum, frame):
                self._emit("sigterm")
                os._exit(4)

            try:
                signal.signal(signal.SIGTERM, _on_term)
            except ValueError:
                pass  # not the main thread — watchdog alone covers hangs

    def _emit(self, status):
        print(json.dumps({
            "metric": self.metric, "value": None,
            "unit": "images/sec/chip", "vs_baseline": None,
            "status": status, "stage": self._stage,
            "elapsed_s": round(time.monotonic() - self.t0, 1),
        }), flush=True)

    def disarm(self):
        self._deadline = None

    def _run(self):
        while True:
            time.sleep(5)
            d = self._deadline
            if d is not None and time.monotonic() > d:
                self._emit("tunnel_stall")
                os._exit(3)


WD = _Watchdog()


def _aot_dir():
    """AOT executable cache dir: --aot_cache=DIR overrides, --no-aot disables.

    Default is host-fingerprinted under /tmp: the first bench invocation on a
    host pays the full ~5-7 min TPU compile and serializes the executable
    (~1.5 s); every later invocation deserializes in ~1.3 s, shrinking the
    window a tunnel hang can kill from minutes to seconds (VERDICT r4 #1).
    """
    if "--no-aot" in sys.argv:
        return None
    for a in sys.argv[1:]:
        if a.startswith("--aot_cache="):
            return a.split("=", 1)[1]
    from rlobjectdetection_tpu.utils.cache import host_fingerprint

    return f"/tmp/rlod_aot-{host_fingerprint()}"


def _fused_stages_flag():
    """--fused-stages[=N] -> digit-coded STAGE_FUSED (bare flag = 23 = both)."""
    for a in sys.argv[1:]:
        if a == "--fused-stages":
            return 23
        if a.startswith("--fused-stages="):
            return int(a.split("=", 1)[1])
    return 0


def _xla_flops_and_exec(fn, *args, key_material=None):
    """Compile-or-load the jitted fn once: (XLA FLOP count or None, callable).

    The compiled AOT executable is returned as the callable to benchmark —
    the jit dispatch cache does not share AOT compiles, so calling the jitted
    fn afterwards would pay the full-step compile a second time (~5-7 min on
    the tunneled TPU backend, CLAUDE.md). When the AOT cache is enabled
    (default), the executable round-trips through disk via
    engine/aot.py::AotExecutableCache — warm runs deserialize in ~1.3 s and
    the compile-time XLA flop count rides along in the blob's meta."""
    WD.stage("compile_or_load", 900)
    if "--jit-dispatch" in sys.argv:
        # Escape hatch for the AOT-exec hang: SOME programs (the roofline
        # backbone fwd+bwd, the eval-forward+postprocess infer program —
        # reproduced round 5; trace_step.py documented it round 4) hang when
        # executed through the lower().compile() Compiled object over the
        # tunneled backend, while the SAME program runs fine through normal
        # jit dispatch. Compile once anyway for the XLA flop count (compile
        # alone never hangs), then hand back the jitted fn; the dispatch-path
        # compile is served by the backend's compile cache.
        try:
            cost = fn.lower(*args).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0)) or None
        except Exception:
            flops = None
        WD.stage("compiled", 600)
        return flops, fn
    aot = _aot_dir()
    if aot:
        try:
            from rlobjectdetection_tpu.engine.aot import AotExecutableCache

            cache = AotExecutableCache(fn, aot, key_material=key_material)
            compiled, meta = cache.get_with_meta(args)
            WD.stage("compiled", 300)
            print(json.dumps({"status": "aot", **cache.stats}),
                  file=sys.stderr, flush=True)
            return meta.get("flops"), compiled
        except Exception as e:
            print(json.dumps({"status": "aot_fallback", "error": repr(e)[:200]}),
                  file=sys.stderr, flush=True)
    try:
        compiled = fn.lower(*args).compile()
    except Exception:
        return None, fn
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception:
        flops = None
    return flops, compiled


def _measure_and_report(metric, run_once, sync, batch_size, iters=30,
                        step_flops=None):
    """Shared warmup/time/report harness for all bench modes.

    Sync is a device-get of a loop-carried value: on the tunneled axon platform
    block_until_ready returns early, but a value fetch cannot lie — the final
    iteration's value transitively requires every prior iteration's work.

    Every phase arms the watchdog so a tunnel hang yields a diagnostic JSON
    line instead of an empty artifact (VERDICT r4 weak #1).
    """
    WD.metric = metric
    # --jit-dispatch pays its (dispatch-path) compile inside the first warmup
    # call — the compile-only pass above cannot seed the jit cache — so the
    # warmup deadline must cover a full server-side compile, not just 3 steps
    WD.stage("warmup", 900 if "--jit-dispatch" in sys.argv else 420)
    for _ in range(3):
        out = run_once()
    sync(out)
    WD.stage("timed_loop", 600)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run_once()
    WD.stage("sync_fetch", 180)
    sync(out)
    dt = time.perf_counter() - t0
    WD.disarm()
    img_per_sec = batch_size * iters / dt
    rec = {
        "metric": metric,
        "value": round(img_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC_PER_GPU, 2),
    }
    if step_flops:
        achieved = step_flops * iters / dt
        rec["tflops"] = round(achieved / 1e12, 1)
        rec["mfu"] = round(achieved / V5E_BF16_PEAK, 3)
        # basis: XLA cost-analysis flops of the compiled step (the optimized
        # HLO), NOT analytic model FLOPs — see DESIGN.md "MFU accounting"
        rec["mfu_basis"] = "xla_cost_analysis"
    print(json.dumps(rec))


def main():
    WD.stage("startup", 300)
    import jax

    # persistent compile cache: repeat driver runs skip the ~40 s first compile
    from rlobjectdetection_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()  # host-fingerprinted dir (SIGILL-safe across host gens)
    import jax.numpy as jnp

    from rlobjectdetection_tpu.config import Config
    from rlobjectdetection_tpu.engine import build_optimizer, make_train_step
    from rlobjectdetection_tpu.engine.train import TrainState
    from rlobjectdetection_tpu.models import FasterRCNN

    # COCO scale-800 config (BASELINE.md bench row): short side 800, padded to
    # 800×1216, COCO anchor scales.
    # first numeric arg is the batch size (flags like --rl/--infer may precede it)
    batch_size = next((int(a) for a in sys.argv[1:] if a.isdigit()), 8)  # 8 = measured optimum (DESIGN.md batch sweep)
    if "--check-pallas" in sys.argv:
        _check_pallas(next((int(a) for a in sys.argv[1:] if a.isdigit()), 1))
        return
    if "--check-pooling" in sys.argv:
        _check_pooling(next((int(a) for a in sys.argv[1:] if a.isdigit()), 2))
        return
    remat = "--remat" in sys.argv
    # --pooling=crop|pool|align: put the reference's other two pooling modes
    # on the chip (VERDICT r4 #5); align is the repo default (PARITY.md).
    pooling = next((a.split("=", 1)[1] for a in sys.argv
                    if a.startswith("--pooling=")), "align")
    assert pooling in ("align", "crop", "pool"), pooling
    cfg = Config(
        ANCHOR_SCALES=(4, 8, 16, 32),
        MAX_NUM_GT_BOXES=50,
        POOLING_MODE=pooling,
        REMAT=remat,
        CONV1_S2D="--s2d" in sys.argv,
        CONV1_FUSED="--no-fused-stem" not in sys.argv,  # Pallas fused stem (DESIGN.md)
        LAYER1_FUSED=("--no-fused-stem" not in sys.argv
                      and "--no-fused-layer1" not in sys.argv),
        ALIGN_IMPL=("cvjp" if "--cvjp" in sys.argv
                    else "pallas" if "--pallas-align" in sys.argv
                    else "autodiff"),
        # frozen-stage fusion: no-op for the train bench (FIXED_BLOCKS=1
        # blocks it in train mode); engages on the eval forward of --infer
        STAGE_FUSED=_fused_stages_flag(),
    )
    h, w, g = 800, 1216, 50
    if "--rl" in sys.argv:
        _bench_rl(batch_size, h, w)
        return
    # --vgg16: the reference's other model family (COCO VGG-16 bs16 anchor =
    # 4.9 hr/epoch on 8 GPUs ≈ 0.83 img/s/GPU, README.md:78)
    backbone = "vgg16" if "--vgg16" in sys.argv else "resnet101"
    model = FasterRCNN(num_classes=81, backbone=backbone, cfg=cfg)

    rng = np.random.RandomState(3)
    batch = {
        "data": jnp.asarray(rng.randn(batch_size, h, w, 3).astype(np.float32) * 10),
        "im_info": jnp.asarray(np.array([[h, w, 1.0]] * batch_size, dtype=np.float32)),
        "gt_boxes": jnp.asarray(_gt(rng, batch_size, g, h, w)),
        "num_boxes": jnp.asarray(np.full((batch_size,), 8, dtype=np.int32)),
    }

    tag = "vgg16" if backbone == "vgg16" else "res101"
    pool_tag = "" if pooling == "align" else f"_{pooling}"
    WD.metric = (f"{'infer' if '--infer' in sys.argv else 'train'}"
                 f"_images_per_sec_per_chip_{tag}_coco800{pool_tag}")

    # init ONCE, jitted (flax init dispatches op-by-op otherwise — thousands
    # of round trips over the tunneled backend), and share the params between
    # the optimizer labels and the train state
    WD.stage("init_params", 600)
    ikey = jax.random.PRNGKey(3)
    params = jax.jit(model.init, static_argnames="train")(
        {"params": ikey, "sampling": ikey, "dropout": ikey},
        batch["data"], batch["im_info"], batch["gt_boxes"], batch["num_boxes"],
        train=True,
    )["params"]
    tx, _ = build_optimizer(params, backbone, base_lr=0.01,
                            clip_norm=10.0 if backbone == "vgg16" else None)
    state = TrainState(params, tx.init(params), jnp.int32(0))
    step = make_train_step(model, tx, donate="--donate" in sys.argv)

    if "--infer" in sys.argv:
        _bench_infer(model, state.params, batch, batch_size, pool_tag=pool_tag)
        return

    # ONE compile serves both the FLOP count (→ MFU vs v5e bf16 peak) and the
    # timed loop
    key = jax.random.PRNGKey(7)
    step_flops, step_c = _xla_flops_and_exec(step, state, batch, key)

    holder = {"state": state, "i": 0}

    def run_once():
        holder["state"], metrics = step_c(
            holder["state"], batch, jax.random.fold_in(key, holder["i"]))
        holder["i"] += 1
        return metrics

    _measure_and_report(
        f"train_images_per_sec_per_chip_{tag}_coco800{pool_tag}",
        run_once, lambda m: float(m["loss"]), batch_size,
        step_flops=step_flops)


def _check_pallas(batch_size):
    """On-chip numerics assertion for the fused Pallas kernels (VERDICT r2
    item 4): interpret-mode tests pin exact parity of the kernel MATH, but
    cannot catch a Mosaic lowering miscompile on real hardware. This runs the
    fused stem and fused layer1 against the XLA compositions on the SAME
    params/input at bench shapes ON THE CHIP (bf16, the production dtype) and
    asserts closeness; max deltas are recorded in DESIGN.md.

    Run: python bench.py --check-pallas [bs]   (TPU backend required)
    """
    WD.metric = "pallas_onchip_parity"
    WD.stage("check_pallas", 1500)
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rlobjectdetection_tpu.models.backbones.resnet import (
        LAYER_SPECS, ResLayer, ResNetBase, ceil_max_pool)
    from rlobjectdetection_tpu.ops.layer1_pallas import fused_layer1
    from rlobjectdetection_tpu.ops.stem_pallas import fused_stem

    assert jax.default_backend() == "tpu", "--check-pallas needs the TPU"
    h, w = 800, 1216
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(batch_size, h, w, 3).astype(np.float32) * 10)
    plain = ResNetBase(num_layers=101, dtype=jnp.bfloat16)
    params = jax.jit(plain.init)(jax.random.PRNGKey(0), x)["params"]

    def xla_stem(p, x):
        y = lax.conv_general_dilated(
            x.astype(jnp.bfloat16), p["conv1"]["kernel"].astype(jnp.bfloat16),
            window_strides=(2, 2), padding=[(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        bn = p["bn1"]
        inv = lax.rsqrt(bn["var"] + 1e-5) * bn["scale"]
        y = y * inv + (bn["bias"] - bn["mean"] * inv)
        return ceil_max_pool(jnp.maximum(y, 0.0)).astype(jnp.bfloat16)

    def pallas_stem(p, x):
        bn = p["bn1"]
        return fused_stem(x, p["conv1"]["kernel"], bn["scale"], bn["bias"],
                          bn["mean"], bn["var"])

    def xla_l1(p, x):
        stem = xla_stem(p, x)
        return ResLayer(64, LAYER_SPECS[101][0], 1, jnp.bfloat16).apply(
            {"params": p["layer1"]}, stem)

    def pallas_l1(p, x):
        bn = p["bn1"]
        cw = fused_stem(x, p["conv1"]["kernel"], bn["scale"], bn["bias"],
                        bn["mean"], bn["var"], cw_out=True)
        return fused_layer1(cw, p["layer1"])

    def full(model):
        return lambda p, x: model.apply({"params": p}, x)

    fused_model = ResNetBase(num_layers=101, dtype=jnp.bfloat16,
                             conv1_fused=True, layer1_fused=True)

    # VGG fused block 1 (round 4): conv1_1+relu+conv1_2+relu+pool1 vs the XLA
    # composition, same on-chip bf16 bench shapes (ops/vgg_stem_pallas.py)
    from rlobjectdetection_tpu.ops.vgg_stem_pallas import fused_vgg_block1

    vk1 = jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.1)
    vb1 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)
    vk2 = jnp.asarray(rng.randn(3, 3, 64, 64).astype(np.float32) * 0.05)
    vb2 = jnp.asarray(rng.randn(64).astype(np.float32) * 0.1)

    def xla_vgg1(p, x):
        y = lax.conv_general_dilated(
            x.astype(jnp.bfloat16), vk1.astype(jnp.bfloat16), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.maximum(y + vb1.astype(jnp.bfloat16), 0.0)
        y = lax.conv_general_dilated(
            y, vk2.astype(jnp.bfloat16), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.maximum(y + vb2.astype(jnp.bfloat16), 0.0)
        return lax.reduce_window(y, jnp.asarray(-jnp.inf, jnp.bfloat16),
                                 lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    def pallas_vgg1(p, x):
        return fused_vgg_block1(x, vk1, vb1, vk2, vb2)

    report = {"metric": "pallas_onchip_parity", "batch": batch_size}
    ok = True
    for name, ref_fn, got_fn, tol in (
            ("stem", xla_stem, pallas_stem, 0.05),
            ("layer1", xla_l1, pallas_l1, 0.08),
            ("base_c4", full(plain), full(fused_model), 0.25),
            ("vgg_block1", xla_vgg1, pallas_vgg1, 0.08)):
        ref = np.asarray(jax.jit(ref_fn)(params, x), dtype=np.float32)
        got = np.asarray(jax.jit(got_fn)(params, x), dtype=np.float32)
        scale = np.abs(ref).max() + 1e-6
        max_rel = float(np.abs(got - ref).max() / scale)
        mean_rel = float(np.abs(got - ref).mean() / scale)
        report[f"{name}_max_rel"] = round(max_rel, 6)
        report[f"{name}_mean_rel"] = round(mean_rel, 6)
        ok &= max_rel < tol
    report["ok"] = ok
    print(json.dumps(report))
    assert ok, f"on-chip Pallas parity FAILED: {report}"


def _check_pooling(batch_size):
    """On-chip parity for ALL THREE pooling modes (VERDICT r4 #5): the crop
    and pool paths are CPU-parity-tested against the reference C semantics
    (tests/test_roi_ops.py) but had never run on the TPU. This executes each
    mode's production op (faster_rcnn.py extract_roi_features dispatch:
    reference lib/model/faster_rcnn/faster_rcnn.py:72-83) on the chip at
    C4-feature bench shapes and asserts closeness against the same jax code
    on the CPU backend of the same process (an independent compiler).

    Run: python bench.py --check-pooling [bs]   (TPU backend required)
    """
    WD.metric = "pooling_onchip_parity"
    WD.stage("check_pooling", 1200)
    import jax
    import jax.numpy as jnp

    from rlobjectdetection_tpu.ops.roi_align import roi_align_avg
    from rlobjectdetection_tpu.ops.roi_crop import roi_crop
    from rlobjectdetection_tpu.ops.roi_pool import roi_pool

    assert jax.default_backend() == "tpu", "--check-pooling needs the TPU"
    b, h, w, ch, r = batch_size, 50, 76, 1024, 128
    rng = np.random.RandomState(3)
    feat = jnp.asarray(rng.randn(b, h, w, ch).astype(np.float32))
    rois = np.zeros((b * r, 5), np.float32)
    rois[:, 0] = np.repeat(np.arange(b), r)
    x1 = rng.uniform(0, 16 * w - 140, b * r).astype(np.float32)
    y1 = rng.uniform(0, 16 * h - 140, b * r).astype(np.float32)
    rois[:, 1], rois[:, 2] = x1, y1
    rois[:, 3] = x1 + rng.uniform(16, 130, b * r)
    rois[:, 4] = y1 + rng.uniform(16, 130, b * r)
    rois = jnp.asarray(rois)

    fns = {
        "align": lambda f, rr: roi_align_avg(f, rr, 7, 1.0 / 16.0),
        "pool": lambda f, rr: roi_pool(f, rr, 7, 7, 1.0 / 16.0),
        "crop": lambda f, rr: roi_crop(f, rr, 14, 1.0 / 16.0, max_pool=True),
    }
    cpu = jax.devices("cpu")[0]
    report = {"metric": "pooling_onchip_parity", "batch": batch_size}
    ok = True
    for name, fn in fns.items():
        got = np.asarray(jax.jit(fn)(feat, rois), dtype=np.float32)
        with jax.default_device(cpu):
            want = np.asarray(
                jax.jit(fn)(jax.device_put(feat, cpu), jax.device_put(rois, cpu)),
                dtype=np.float32)
        scale = np.abs(want).max() + 1e-6
        max_rel = float(np.abs(got - want).max() / scale)
        report[f"{name}_max_rel"] = round(max_rel, 7)
        ok &= max_rel < 1e-3
    report["ok"] = ok
    WD.disarm()
    print(json.dumps(report))
    assert ok, f"on-chip pooling parity FAILED: {report}"


def make_rl_step(batch_size, h, w, n_boxes=64, fused_stem=True,
                 fused_layer1=True, fused_stages=0):
    """Build the RL action-value train step + inputs (shared by the bench
    and tools/trace_step.py --rl): bs images × n_boxes detection boxes each,
    trunk frozen (gradient cut at C4), weighted-MSE step.

    Returns (step, params, opt_state, inputs) with
    step(params, opt_state, *inputs) -> (params, opt_state, loss)."""
    import jax
    import jax.numpy as jnp
    import optax

    from rlobjectdetection_tpu.models.rl import RLPolicyNet

    model = RLPolicyNet(num_acts=56, num_layers=101, dtype=jnp.bfloat16,
                        conv1_fused=fused_stem,
                        layer1_fused=fused_stem and fused_layer1,
                        stages_fused=fused_stages)
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randn(batch_size, h, w, 3).astype(np.float32))
    # box spans scale with the canvas so tiny-shape smoke tests stay valid
    bw, bh = max(2, min(190, w // 4)), max(2, min(190, h // 4))
    boxes = np.zeros((batch_size, n_boxes, 8), dtype=np.float32)
    boxes[:, :, 0] = np.arange(batch_size)[:, None]
    boxes[:, :, 1] = rng.randint(0, w - bw - 1, boxes.shape[:2])
    boxes[:, :, 2] = rng.randint(0, h - bh - 1, boxes.shape[:2])
    boxes[:, :, 3] = boxes[:, :, 1] + rng.randint(
        max(1, min(30, bw // 2)), bw, boxes.shape[:2])
    boxes[:, :, 4] = boxes[:, :, 2] + rng.randint(
        max(1, min(30, bh // 2)), bh, boxes.shape[:2])
    boxes = jnp.asarray(boxes)
    targets = jnp.asarray(
        rng.choice([-1.0, 1.0], (batch_size, n_boxes, 56)).astype(np.float32))
    weights = jnp.asarray(
        rng.rand(batch_size, n_boxes, 56).astype(np.float32) + 0.5)

    params = model.init(jax.random.PRNGKey(3), img, boxes, targets, weights)["params"]
    # frozen trunk (Reinforcement/resnet.py:139-147) + momentum SGD, as trainval_rl
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: "frozen" if path[0].key == "base" else "train", params)
    tx = optax.multi_transform(
        {"train": optax.sgd(0.01, momentum=0.9), "frozen": optax.set_to_zero()},
        labels,
    )
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, img, boxes, targets, weights):
        def loss_fn(p):
            _, loss, _ = model.apply({"params": p}, img, boxes, targets, weights)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step, params, opt_state, (img, boxes, targets, weights)


def _bench_rl(batch_size, h, w, n_boxes=64):
    WD.metric = "rl_train_images_per_sec_per_chip_res101_coco800"
    WD.stage("init_params", 600)
    fused = "--no-fused-stem" not in sys.argv
    step, params, opt_state, inputs = make_rl_step(
        batch_size, h, w, n_boxes, fused_stem=fused,
        fused_layer1=fused and "--no-fused-layer1" not in sys.argv,
        fused_stages=_fused_stages_flag())

    step_flops, step_c = _xla_flops_and_exec(step, params, opt_state, *inputs)
    holder = {"p": params, "o": opt_state}

    def run_once():
        holder["p"], holder["o"], loss = step_c(holder["p"], holder["o"], *inputs)
        return loss

    _measure_and_report("rl_train_images_per_sec_per_chip_res101_coco800",
                        run_once, float, batch_size, step_flops=step_flops)


def _bench_infer(model, params, batch, batch_size, pool_tag=""):
    WD.metric = f"infer_images_per_sec_per_chip_res101_coco800{pool_tag}"
    import jax
    import jax.numpy as jnp

    from rlobjectdetection_tpu.engine import postprocess_detections

    @jax.jit
    def infer(p, data, im_info, token):
        # the token chains each iteration to the previous one's output so the
        # final value fetch transitively requires every prior execution — the
        # same cannot-lie sync train/RL get from their loop-carried state
        data = jax.lax.optimization_barrier((data, token))[0]
        out = model.apply({"params": p}, data, im_info, train=False)

        def per_image(rois, cls_prob, bbox_pred, info, valid):
            return postprocess_detections(
                rois, cls_prob, bbox_pred, info, valid,
                num_classes=81, max_per_image=100, nms_thresh=0.3,
            )

        res = jax.vmap(per_image)(out["rois"], out["cls_prob"],
                                  out["bbox_pred"], im_info, out["roi_valid"])
        return res, res[0].ravel()[0].astype(jnp.float32)

    data, info = batch["data"], batch["im_info"]
    step_flops, infer_c = _xla_flops_and_exec(infer, params, data, info,
                                              jnp.float32(0.0))
    holder = {"token": jnp.float32(0.0)}

    def run_once():
        res, holder["token"] = infer_c(params, data, info, holder["token"])
        return res

    # steps are ~10 ms at bs1 — use a wide window so one dispatch hiccup over
    # the tunneled backend cannot dominate the measurement
    _measure_and_report(f"infer_images_per_sec_per_chip_res101_coco800{pool_tag}",
                        run_once,
                        lambda r: float(jnp.asarray(r[0]).ravel()[0]),
                        batch_size, iters=300, step_flops=step_flops)


def _gt(rng, b, g, h, w):
    gt = np.zeros((b, g, 5), dtype=np.float32)
    for i in range(b):
        for j in range(8):
            x1, y1 = rng.randint(0, w - 200), rng.randint(0, h - 200)
            gt[i, j] = [x1, y1, x1 + rng.randint(40, 190), y1 + rng.randint(40, 190),
                        1 + rng.randint(80)]
    return gt


if __name__ == "__main__":
    main()
