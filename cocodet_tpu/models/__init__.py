from .blocks import (
    ChannelMask,
    Conv2d,
    ConvBnAct,
    CSPLayer,
    DWConv,
    DWConvNoP,
    Focus,
    ResLayer,
    SPPBottleneck,
    get_activation,
    max_pool_same,
    space_to_depth,
    upsample2x,
)
from .darknet import BACKBONE_STAGES, CSPBackbone, Darknet
from .head import YOLOXHead
from .pafpn import PAFPN_VARIANTS, YOLOPAFPN
from .yolox import MODEL_SPECS, ModelSpec, YOLOX, build_model
from .anchor_zoo import (ANCHOR_MODELS, AnchorDetector, build_anchor_model,
                         decode_anchor_outputs)
from .distill import distill_loss_pair, distiller_loss
from .yolo_fpn import YOLOFPN
