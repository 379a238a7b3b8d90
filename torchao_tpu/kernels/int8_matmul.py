"""int8 scaled matmul Pallas kernel (placeholder probe).

Will replace the reference's ``safe_int_mm`` / ``int_scaled_matmul``
(``torchao/kernel/intmm.py``, ``intmm_triton.py``).
"""


def int8_scaled_matmul_available(x_q, w):
    return None
