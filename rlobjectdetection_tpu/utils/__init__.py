from .logging import AveMeter, MetricsWriter, StepTimer, accuracy, ensure_dir, ensure_file, init_log

__all__ = ["init_log", "AveMeter", "accuracy", "ensure_file", "ensure_dir", "MetricsWriter", "StepTimer"]
