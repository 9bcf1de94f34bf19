from .boxes import (cxcywh_to_xyxy, iou_cxcywh, pairwise_iou, xyxy_to_cxcywh,
                    xyxy_to_xywh)
from .decode import (attach_strides, concat_levels, decode_center_format,
                     decode_corner_scores, level_grid)
from .fuse import bn_stats_allreduce, fuse_batchnorm
from .losses import DetectionLosses, iou_loss, yolox_losses
from .nms import NMSResult, batched_nms, nms_single
from .postprocess import PostprocessConfig, postprocess, select_candidates
from .simota import SimOTATargets, simota_assign
