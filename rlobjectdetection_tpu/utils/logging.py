"""Logging, meters, metrics writer.

Rebuild of /root/reference/lib/model/Reinforcement/utils.py (init_log with the
SLURM rank-0 filter + rk{rank} format l.7-22, sliding AveMeter l.25-42,
top-k accuracy l.45-53, multi-step LR helper l.56-65) and the TensorBoard
scalar logger (lib/model/utils/logger.py) — here backed by tensorboardX when
available, else a no-op.
"""

from __future__ import annotations

import logging
import os
from collections import deque


def _process_rank() -> int:
    if "SLURM_PROCID" in os.environ:
        return int(os.environ["SLURM_PROCID"])
    try:   # non-SLURM multi-host: the JAX process index, as documented
        import jax

        return jax.process_index()
    except Exception:
        return 0


def init_log(name: str, level=logging.INFO):
    """Process-rank-aware logger (Reinforcement/utils.py:7-22): only rank 0
    emits (SLURM_PROCID, falling back to JAX process index)."""
    rank = _process_rank()
    logger = logging.getLogger(name)
    logger.setLevel(level)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter(f"rk{rank} %(asctime)s %(levelname)s %(message)s")
        )
        logger.addHandler(handler)
    if not logger.filters:   # idempotent: repeat init_log must not stack filters
        logger.addFilter(lambda record: _process_rank() == 0)
    return logger


class AveMeter:
    """Sliding-window average (Reinforcement/utils.py:25-42)."""

    def __init__(self, window: int = 20):
        self.window = window
        self.reset()

    def reset(self):
        self.vals = deque(maxlen=self.window)
        self.val = 0.0

    def update(self, val):
        self.val = float(val)
        self.vals.append(self.val)

    @property
    def avg(self):
        return sum(self.vals) / max(len(self.vals), 1)


def accuracy(output, target, topk=(1,)):
    """Top-k accuracy (Reinforcement/utils.py:45-53), numpy."""
    import numpy as np

    maxk = max(topk)
    pred = np.argsort(-output, axis=1)[:, :maxk]
    correct = pred == target[:, None]
    res = []
    for k in topk:
        res.append(correct[:, :k].any(axis=1).mean() * 100.0)
    return res


def ensure_file(path: str):
    assert os.path.isfile(path), f"file not found: {path}"


def ensure_dir(path: str):
    os.makedirs(path, exist_ok=True)


class MetricsWriter:
    """Scalar/histogram summary writer (lib/model/utils/logger.py equivalent),
    tensorboardX-backed; silently no-ops if unavailable."""

    def __init__(self, log_dir: str):
        self._writer = None
        try:
            from tensorboardX import SummaryWriter
        except ImportError:
            return   # metrics disabled when tensorboardX is absent
        # real errors (unwritable log_dir, bad path) must surface, not
        # silently disable every training curve
        ensure_dir(log_dir)
        self._writer = SummaryWriter(log_dir)

    def scalar_summary(self, tag: str, value, step: int):
        if self._writer:
            self._writer.add_scalar(tag, float(value), step)

    def histo_summary(self, tag: str, values, step: int):
        if self._writer:
            self._writer.add_histogram(tag, values, step)

    def image_summary(self, tag: str, images, step: int):
        """[N, H, W, C] uint8/float images (reference logger.py:22-39)."""
        if self._writer:
            import numpy as np

            for i, img in enumerate(images):
                img = np.asarray(img)
                self._writer.add_image(f"{tag}/{i}", img, step,
                                       dataformats="HWC" if img.ndim == 3 else "HW")

    def close(self):
        if self._writer:
            self._writer.close()


class StepTimer:
    """jax.profiler-aware step timer — the rebuild's tracing hook
    (SURVEY.md §5: the reference has wall-clock meters only)."""

    def __init__(self):
        import time

        self._time = time.perf_counter
        self.t0 = self._time()

    def tic(self):
        self.t0 = self._time()

    def toc(self):
        return self._time() - self.t0


def start_profiler_trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)


def stop_profiler_trace():
    import jax

    jax.profiler.stop_trace()
