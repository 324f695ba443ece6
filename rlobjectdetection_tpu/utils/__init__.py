from .cache import enable_persistent_cache, host_cache_dir, host_fingerprint
from .guards import assert_finite, finite_mask, loss_is_exploding, skip_nonfinite_update
from .logging import AveMeter, MetricsWriter, StepTimer, accuracy, ensure_dir, ensure_file, init_log

__all__ = [
    "finite_mask", "skip_nonfinite_update", "assert_finite", "loss_is_exploding","init_log", "AveMeter", "accuracy", "ensure_file", "ensure_dir", "MetricsWriter", "StepTimer",
    "enable_persistent_cache", "host_cache_dir", "host_fingerprint"]
