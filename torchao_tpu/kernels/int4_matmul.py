"""Fused int4 dequant-matmul Pallas kernel (placeholder probe).

Will replace the reference's tinygemm ``_weight_int4pack_mm`` path
(``csrc/cuda/tensor_core_tiled_layout/tensor_core_tiled_layout.cu``).
"""


def int4_dq_matmul_available(x, w):
    return None
