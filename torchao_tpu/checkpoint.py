"""Checkpoint save/load for (quantized) param pytrees via orbax.

The reference piggybacks on torch serialization (``__tensor_flatten__`` +
``add_safe_globals``, SURVEY.md §5). Here quantized arrays are pytrees, so
orbax handles the array leaves natively; the static metadata (block sizes,
dtypes, packing formats) is serialized alongside as a JSON *structure
spec* that rebuilds the exact pytree on load — the safe-deserialization
analog of ``weights_only=True`` (only allow-listed qarray classes are
reconstructed).
"""

from __future__ import annotations

import dataclasses
import enum
import json
import os
from typing import Any, Dict

import numpy as np

_QARRAY_CLASSES = {}


def _register_default_classes():
    from torchao_tpu.qtypes.base import KernelPreference, PackingFormat
    from torchao_tpu.qtypes.composition import (
        LinearActivationQuantizedArray,
        WeightTensorWithLinearActivationScaleMetadata,
    )
    from torchao_tpu.qtypes.float8 import Float8ActQuantSpec, Float8Array
    from torchao_tpu.qtypes.floatx import FloatxArray
    from torchao_tpu.qtypes.intx import IntxArray
    from torchao_tpu.qtypes.nf4 import NF4Array
    from torchao_tpu.quantization.quant_primitives import ZeroPointDomain

    for cls in (
        IntxArray,
        Float8Array,
        FloatxArray,
        NF4Array,
        LinearActivationQuantizedArray,
        WeightTensorWithLinearActivationScaleMetadata,
    ):
        _QARRAY_CLASSES[cls.__name__] = cls
    _QARRAY_CLASSES["_enums"] = {
        "ZeroPointDomain": ZeroPointDomain,
        "PackingFormat": PackingFormat,
        "KernelPreference": KernelPreference,
    }
    _QARRAY_CLASSES["_specs"] = {
        "Float8ActQuantSpec": Float8ActQuantSpec,
    }


def _encode_static(v):
    if isinstance(v, enum.Enum):
        return {"__enum__": type(v).__name__, "name": v.name}
    if dataclasses.is_dataclass(v) and not isinstance(v, type):
        return {
            "__spec__": type(v).__name__,
            "data": {
                f.name: _encode_static(getattr(v, f.name))
                for f in dataclasses.fields(v)
            },
        }
    if isinstance(v, tuple):
        return {"__tuple__": [_encode_static(x) for x in v]}
    return v


def _decode_static(v):
    if isinstance(v, dict) and "__enum__" in v:
        return _QARRAY_CLASSES["_enums"][v["__enum__"]][v["name"]]
    if isinstance(v, dict) and "__spec__" in v:
        cls = _QARRAY_CLASSES["_specs"][v["__spec__"]]
        return cls(**{k: _decode_static(x) for k, x in v["data"].items()})
    if isinstance(v, dict) and "__tuple__" in v:
        return tuple(_decode_static(x) for x in v["__tuple__"])
    if isinstance(v, list):
        return [_decode_static(x) for x in v]
    return v


def _spec_of(tree) -> Any:
    """Recursive structure spec: dicts stay dicts, qarrays become typed
    nodes with static metadata, array leaves become markers."""
    from torchao_tpu.qtypes.base import QuantizedArray

    if isinstance(tree, dict):
        return {k: _spec_of(v) for k, v in tree.items()}
    if isinstance(tree, QuantizedArray):
        cls = type(tree)
        return {
            "__qarray__": cls.__name__,
            "static": {
                name: _encode_static(getattr(tree, name))
                for name in cls.__qarray_meta_fields__
            },
            "data": {
                name: _spec_of(getattr(tree, name))
                for name in cls.__qarray_data_fields__
            },
        }
    if tree is None:
        return None
    return "__array__"


def _rebuild(spec, arrays, path=""):
    if spec is None:
        return None
    if spec == "__array__":
        return arrays[path]
    if isinstance(spec, dict) and "__qarray__" in spec:
        if not _QARRAY_CLASSES:
            _register_default_classes()
        cls = _QARRAY_CLASSES[spec["__qarray__"]]
        kwargs = {
            k: _decode_static(v) for k, v in spec["static"].items()
        }
        for name, sub in spec["data"].items():
            kwargs[name] = _rebuild(sub, arrays, f"{path}.{name}")
        return cls(**kwargs)
    assert isinstance(spec, dict)
    return {
        k: _rebuild(v, arrays, f"{path}.{k}" if path else k)
        for k, v in spec.items()
    }


def _flat_arrays(tree, path="") -> Dict[str, Any]:
    from torchao_tpu.qtypes.base import QuantizedArray

    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flat_arrays(v, f"{path}.{k}" if path else k))
    elif isinstance(tree, QuantizedArray):
        for name in type(tree).__qarray_data_fields__:
            v = getattr(tree, name)
            if v is not None:
                out.update(_flat_arrays(v, f"{path}.{name}"))
    elif tree is not None:
        out[path] = tree
    return out


def save_quantized(params, directory: str):
    """Save a (possibly quantized) params pytree: array leaves via orbax,
    structure+static metadata as JSON."""
    import orbax.checkpoint as ocp

    if not _QARRAY_CLASSES:
        _register_default_classes()
    directory = os.path.abspath(directory)
    spec = _spec_of(params)
    arrays = _flat_arrays(params)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(directory, "arrays"), arrays)
    with open(os.path.join(directory, "structure.json"), "w") as f:
        json.dump(spec, f)


def load_quantized(directory: str, sharding_fn=None):
    """``sharding_fn(path, arr_meta) -> jax.sharding.Sharding | None``:
    when given, each array leaf is restored directly onto its target
    devices (orbax sharded restore — no host-memory staging of the full
    pod-scale tree)."""
    import orbax.checkpoint as ocp

    if not _QARRAY_CLASSES:
        _register_default_classes()
    directory = os.path.abspath(directory)
    with open(os.path.join(directory, "structure.json")) as f:
        spec = json.load(f)
    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.join(directory, "arrays")
    if sharding_fn is None:
        arrays = ckptr.restore(path)
    else:
        import jax

        meta = ckptr.metadata(path)
        item_meta = getattr(meta, "item_metadata", None) or getattr(
            meta, "tree", meta
        )
        restore_args = {
            k: ocp.ArrayRestoreArgs(sharding=sharding_fn(k, m))
            if sharding_fn(k, m) is not None
            else ocp.RestoreArgs()
            for k, m in dict(item_meta).items()
        }
        arrays = ckptr.restore(
            path, restore_args=restore_args
        )
    return _rebuild(spec, arrays)


# ---------------------------------------------------------------------------
# async checkpointing (training-loop overlap)
# ---------------------------------------------------------------------------


class AsyncCheckpointer:
    """Non-blocking saves for the training loop: device→host transfer
    happens at ``save()`` (cheap), serialization runs on a background
    thread while the next step computes (orbax ``AsyncCheckpointer``
    design; new infrastructure — the reference defers to
    ``torch.save``). ``wait()`` joins the in-flight write;
    at most one write is in flight — a second ``save`` joins the first.
    """

    def __init__(self):
        import threading

        self._thread = None
        self._threading = threading
        self._error = None

    def save(self, params, directory: str):
        import jax

        self.wait()
        # snapshot now (device-side copy) so the training loop can
        # donate/mutate its buffers while the write is in flight
        host = jax.tree_util.tree_map(
            lambda l: jax.numpy.array(l, copy=True)
            if hasattr(l, "dtype") and hasattr(l, "ndim") else l,
            params,
        )

        def work():
            try:
                save_quantized(host, directory)
            except Exception as e:  # surfaced on wait()
                self._error = e

        self._thread = self._threading.Thread(target=work, daemon=True)
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            e, self._error = self._error, None
            raise e
