"""Golden oracle: import the reference torchao (CPU torch) for parity tests.

The TPU framework must reproduce the reference's qparam math bit-for-bit
(SURVEY.md §7 "Exact ppl parity"). These helpers expose the reference
implementation as a test oracle; every use is guarded so the suite still
runs where the reference checkout is absent.
"""

import os
import sys

REFERENCE_PATH = os.environ.get("TORCHAO_REFERENCE_PATH", "/root/reference")

_available = None


def reference_available() -> bool:
    global _available
    if _available is None:
        try:
            if REFERENCE_PATH not in sys.path:
                sys.path.insert(0, REFERENCE_PATH)
            import torchao  # noqa: F401

            _available = True
        except Exception:
            _available = False
    return _available


def get_reference_quant_primitives():
    assert reference_available()
    from torchao.quantization import quant_primitives as qp

    return qp
