from .faster_rcnn import FasterRCNN, build_model
from .rpn import RPNHead, proposal_layer, rpn_fg_probs
from .targets import AnchorTargets, ProposalTargets, anchor_target, proposal_target

__all__ = [
    "FasterRCNN", "build_model",
    "RPNHead", "proposal_layer", "rpn_fg_probs",
    "anchor_target", "proposal_target", "AnchorTargets", "ProposalTargets",
]
