"""fp8 rowwise-scaled matmul Pallas kernel (placeholder probe).

Will replace the reference's ``torch._scaled_mm`` path
(``float8_layout.py:313-367``).
"""


def fp8_rowwise_matmul_available(x_q, w):
    return None
