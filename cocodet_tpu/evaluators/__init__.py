from .coco_evaluator import COCOEvaluator
from .coco_metric import COCOMeanAP, box_iou_xywh, match_image
from .voc_evaluator import VOCEvaluator, eval_class, voc_ap
