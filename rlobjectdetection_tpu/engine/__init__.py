from .aot import AotExecutableCache
from .detect import detections_to_all_boxes, postprocess_detections
from .optim import build_optimizer, make_lr_schedule, param_labels
from .train import TrainState, create_train_state, make_forward_fn, make_train_step

__all__ = [
    "AotExecutableCache",
    "postprocess_detections", "detections_to_all_boxes",
    "build_optimizer", "param_labels", "make_lr_schedule",
    "TrainState", "create_train_state", "make_train_step", "make_forward_fn",
]
