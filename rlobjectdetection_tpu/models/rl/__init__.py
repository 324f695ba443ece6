from .action import Action, identify
from .policy import RLPolicyNet, warm_start_from_detector

__all__ = ["Action", "identify", "RLPolicyNet", "warm_start_from_detector"]
