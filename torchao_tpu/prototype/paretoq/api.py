"""ParetoQ trainer API (maps ``torchao/prototype/paretoq/``).

The reference is a 2,087-LoC HF-Trainer QAT pipeline whose substance is
(a) ``QuantizeLinear`` — a linear whose weight is fake-quantized through
a LEARNED per-row step size with LSQ/StretchedElastic custom gradients
(``models/utils_quant.py``), (b) bit-width-dependent alpha init
(``train.py:44-57``), and (c) a standard LM fine-tune per bit-width to
trace the size/accuracy Pareto frontier. The TPU-native expression:

- :class:`ParetoQFakeQuantArray` — a pytree wrapper holding TWO
  trainable leaves (hp ``weight`` + per-row ``clip_val``); the qlinear
  fallback calls :meth:`dequantize`, so any model using ``ops.linear``
  trains through the custom-VJP quantizers with no module surgery.
- :class:`ParetoQConfig` + the ``quantize_`` prepare/convert steps
  (prepare wraps + inits alpha; convert materializes the final
  quantized grid as an ``IntxArray`` for deployment).
- :func:`paretoq_train` — the fine-tune loop (AdamW over weights AND
  clip_vals jointly, exactly the reference's trainer semantics).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from torchao_tpu.core.config import AOBaseConfig
from torchao_tpu.qtypes.base import (
    QuantizedArray,
    qarray_dataclass,
    static_field,
)
from torchao_tpu.quantization.transform_module import (
    register_quantize_module_handler,
)
from torchao_tpu.prototype.paretoq.quantizers import (
    init_clip_val,
    paretoq_fake_quantize,
)


@qarray_dataclass
class ParetoQFakeQuantArray(QuantizedArray):
    weight: jnp.ndarray                 # hp, trainable
    clip_val: jnp.ndarray               # learned step size, trainable
    w_bits: int = static_field(default=4)
    weight_layerwise: bool = static_field(default=False)

    @property
    def shape(self):
        return self.weight.shape

    @property
    def dtype(self):
        return self.weight.dtype

    def dequantize(self, output_dtype=None):
        w = paretoq_fake_quantize(
            self.weight, self.clip_val, self.w_bits,
            self.weight_layerwise,
        )
        return w if output_dtype is None else w.astype(output_dtype)


@dataclasses.dataclass
class ParetoQConfig(AOBaseConfig):
    """``ParetoQConfig(w_bits, step="prepare"|"convert")``. Bits follow
    the reference semantics: 0 = ternary (1.58-bit stretched grid),
    1 = binary, 2 = stretched 2-bit, 3/4 = LSQ intx."""

    w_bits: int = 4
    weight_layerwise: bool = False
    step: str = "prepare"
    version: int = 1

    def __post_init__(self):
        assert self.step in ("prepare", "convert"), self.step
        assert self.w_bits in (0, 1, 2, 3, 4, 16), self.w_bits


@register_quantize_module_handler(ParetoQConfig)
def _paretoq_transform(w, config: ParetoQConfig):
    if config.step == "prepare":
        if isinstance(w, ParetoQFakeQuantArray):
            return w
        return ParetoQFakeQuantArray(
            weight=w,
            clip_val=init_clip_val(w, config.w_bits),
            w_bits=config.w_bits,
            weight_layerwise=config.weight_layerwise,
        )
    # convert: materialize the final trained grid. The deployed weight
    # is the fake-quantized weight (the trained grid points); for 3/4
    # bits it is exactly a symmetric intx grid and real int kernels can
    # consume it via IntxWeightOnlyConfig on the materialized weight.
    if isinstance(w, ParetoQFakeQuantArray):
        return w.dequantize()
    return w


def paretoq_train(
    model,
    params: Any,
    tokens,
    *,
    w_bits: int = 2,
    steps: int = 200,
    seq_len: int = 64,
    batch: int = 16,
    lr: float = 5e-4,
    seed: int = 0,
    filter_fn=None,
):
    """Prepare + fine-tune + convert (the reference ``train.py`` flow on
    the in-repo synthetic trainer). Returns (converted_params, loss)."""
    from torchao_tpu.models.llama.model import default_linear_filter
    from torchao_tpu.quantization.quant_api import quantize_
    from torchao_tpu.testing.synthetic import train_tiny_llama

    filter_fn = filter_fn or default_linear_filter
    prepared = quantize_(
        params, ParetoQConfig(w_bits=w_bits, step="prepare"), filter_fn
    )
    trained, loss = train_tiny_llama(
        model, prepared, tokens, steps=steps, seq_len=seq_len,
        batch=batch, lr=lr, seed=seed,
    )
    converted = quantize_(
        trained, ParetoQConfig(w_bits=w_bits, step="convert"),
        lambda p, l: isinstance(l, ParetoQFakeQuantArray),
    )
    return converted, loss
