#!/bin/sh
# Fast CI tier (<5 min on the 1-core CPU) that still touches every
# subsystem, including one end-to-end training-convergence signal
# (test_loss_decreases_fast) and the mAP-metric differential oracle.
# The complete default tier is `python -m pytest tests/ -q` (~20 min);
# slow-marked full-scale tests add `-m ""`.
cd "$(dirname "$0")/.." || exit 1
exec python -m pytest -q \
    tests/test_ops.py \
    tests/test_coco_metric.py \
    tests/test_voc_eval.py \
    tests/test_exp_and_data.py \
    tests/test_fuse_compress.py \
    tests/test_multiprocess.py::test_two_process_allgather \
    tests/test_slim.py::test_slim_exact_when_offsets_zero \
    tests/test_qat.py::test_fake_quant_grid_and_ste \
    tests/test_qat.py::test_fake_quant_per_channel_broadcast \
    tests/test_overfit.py::test_loss_decreases_fast \
    -m "" "$@"
