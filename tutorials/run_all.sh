#!/bin/bash
# Run every tutorial (CPU smoke settings) — reference tutorials/run_all.sh.
set -ex
export TUTORIAL_CPU=1
export XLA_FLAGS=--xla_force_host_platform_device_count=8
cd "$(dirname "$0")/.."
python tutorials/quick_start.py
python tutorials/add_an_op.py
python tutorials/print_op_and_shapes.py
python tutorials/developer_api_guide/my_qarray_type.py
python tutorials/developer_api_guide/my_trainable_qarray.py
python tutorials/developer_api_guide/tensor_parallel.py
python tutorials/quantize_vit/run_vit_b_quant.py --cpu
for f in tutorials/calibration_flow/*.py; do python "$f"; done
