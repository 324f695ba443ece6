from .coco_api import COCO, iou_xywh
from .coco_eval import COCOeval, cocoval
from .factory import get_imdb, list_imdbs
from .imdb import bbox_overlaps_np, combined_roidb, filter_roidb, imdb, prepare_roidb, rank_roidb_ratio
from .loader import RoiBatchLoader
from .minibatch import PIXEL_MEANS_BGR, get_minibatch, im_list_to_blob, pad_gt_boxes, prep_im_for_blob

__all__ = [
    "COCO", "COCOeval", "cocoval", "iou_xywh",
    "get_imdb", "list_imdbs",
    "imdb", "combined_roidb", "prepare_roidb", "rank_roidb_ratio", "filter_roidb",
    "bbox_overlaps_np",
    "RoiBatchLoader",
    "get_minibatch", "im_list_to_blob", "prep_im_for_blob", "pad_gt_boxes",
    "PIXEL_MEANS_BGR",
]
