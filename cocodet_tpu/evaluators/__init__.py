from .coco_evaluator import COCOEvaluator
from .coco_metric import COCOMeanAP, box_iou_xywh, match_image
