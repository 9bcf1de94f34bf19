"""cocodet_tpu — TPU-native lightweight COCO object-detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
aiha-lab/COCO-dataset-based-light-weight-fast-object-detection-model
(a pruned YOLOX-M-P6 detector): training (mosaic/mixup + SimOTA),
compression (channel pruning w/ distillation, SynFlow, magnitude
pruning + BN-fold), COCO evaluation, and a standalone inference
harness — all built TPU-first (NHWC, static shapes, fused jitted
postprocess, `jax.sharding` data parallelism).
"""

__version__ = "0.1.0"
