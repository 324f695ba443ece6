"""Shared CLI bootstrap: honor RLOD_FORCE_CPU / RLOD_PLATFORM before jax use.

The axon TPU plugin preselects itself regardless of the JAX_PLATFORMS env var,
so the platform must be forced through jax.config.
"""

import os


def setup_platform():
    import jax

    want = os.environ.get("RLOD_PLATFORM")
    if os.environ.get("RLOD_FORCE_CPU") == "1":
        want = "cpu"
    if want:
        jax.config.update("jax_platforms", want)


def enable_fused_tpu_defaults(cfg, set_cfgs, on_tpu=None):
    """Auto-enable the fused Pallas kernels on TPU runs (measured wins:
    DESIGN.md "Fused Pallas stem" +3.2x stem, "Fused VGG block 1" +7.8%
    end-to-end; eval forward without them is ~15% under the bench rate).

    Multi-device meshes shard the kernels' batch dim through the GSPMD
    partitioning rule in ops/batch_partition.py, so any TPU device count
    qualifies. An explicit `--set CONV1_FUSED ...` / `--set LAYER1_FUSED ...`
    always wins. `on_tpu` overrides backend detection (export_model targets a
    platform rather than the running backend)."""
    import jax

    from rlobjectdetection_tpu.config import cfg_update

    if on_tpu is None:
        on_tpu = jax.default_backend() == "tpu"
    if (on_tpu
            and not any("CONV1_FUSED" in str(s) for s in (set_cfgs or []))):
        cfg = cfg_update(cfg, {"CONV1_FUSED": True})
    # Fused layer1 rides the same gate (it consumes the fused stem's CW
    # output and needs the FIXED_BLOCKS >= 1 frozen-layer1 contract).
    if (cfg.CONV1_FUSED and cfg.RESNET.FIXED_BLOCKS >= 1
            and not any("LAYER1_FUSED" in str(s) for s in (set_cfgs or []))):
        cfg = cfg_update(cfg, {"LAYER1_FUSED": True})
    return cfg
