from .magnitude import generate_magnitude_masks, inject_masks, sparsity_report
from .merge import (count_effective_params, load_slim_spec,
                    merge_for_deployment, slim_channels)
from .qat import act_scale_tree, make_qat_step, requantize
from .quantize import (build_quant_tree, calibrate, pack_int4_tree,
                       quantization_report, quantize_model, quantize_weights,
                       tree_has_int4, unpack_int4_tree)
