from .coco import COCO_CLASS_ID, COCO_CLASSES, COCOAnnotations, COCODataset, get_datadir
from .mosaic import MosaicDetection, adjust_box_anns
from .samplers import (DetectionLoader, DevicePrefetcher, InfiniteSampler,
                       YoloBatchSampler)
from .transforms import (TrainTransform, ValTransform, augment_hsv, letterbox,
                         mirror, random_affine, xyxy2cxcywh)
from .folder import FolderLoader, ImageFolderDataset, collate_batch
from .voc import VOC_CLASSES, VOCDetection, parse_voc_xml
