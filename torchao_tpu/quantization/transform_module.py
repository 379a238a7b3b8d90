"""Config-type → transform-handler registry.

Mirrors the reference's ``register_quantize_module_handler``
(``torchao/quantization/transform_module.py:19``). In the TPU framework a
handler maps a *weight leaf* (plus its pytree path) to its quantized
replacement, rather than mutating an nn.Module.
"""

from __future__ import annotations

from typing import Callable, Dict, Type

from torchao_tpu.core.config import AOBaseConfig

_QUANTIZE_CONFIG_HANDLER: Dict[Type[AOBaseConfig], Callable] = {}


def register_quantize_module_handler(config_type: Type[AOBaseConfig]):
    """Decorator: ``handler(weight, config) -> quantized weight``."""

    def deco(handler):
        _QUANTIZE_CONFIG_HANDLER[config_type] = handler
        return handler

    return deco


def get_quantize_handler(config: AOBaseConfig) -> Callable:
    for cls in type(config).__mro__:
        if cls in _QUANTIZE_CONFIG_HANDLER:
            return _QUANTIZE_CONFIG_HANDLER[cls]
    raise KeyError(
        f"No registered handler for config type {type(config).__name__}"
    )
