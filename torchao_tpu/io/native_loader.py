"""Raw checkpoint format + native multithreaded loader.

Format ("tqcp"): ``manifest.json`` (ordered tensor records: name, dtype,
shape, offset, nbytes) + ``data.bin`` (64-byte-aligned little-endian raw
tensors). Saving is numpy; loading goes through the C++ thread-pool
mmap/memcpy loader (``csrc/ckpt_loader.cpp``) when available — built on
demand with g++ — with a pure-numpy fallback.

This is the runtime-native analog of the reference's mmap model loading
(``generate.py:241-252``); for multi-GB quantized checkpoints the
parallel page-in dominates single-threaded ``np.fromfile``.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Dict, Optional

import numpy as np

_ALIGN = 64
_LIB = None
_LIB_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def _build_and_load():
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    src = os.path.join(_repo_root(), "csrc", "ckpt_loader.cpp")
    so = os.path.join(_repo_root(), "csrc", "libtq_ckpt.so")
    try:
        if (not os.path.exists(so)) or (
            os.path.getmtime(so) < os.path.getmtime(src)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-pthread",
                 "-o", so, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.tq_load_ranges.restype = ctypes.c_int
        lib.tq_load_ranges.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.tq_file_size.restype = ctypes.c_int64
        lib.tq_file_size.argtypes = [ctypes.c_char_p]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def native_loader_available() -> bool:
    return _build_and_load() is not None


def save_raw_checkpoint(arrays: Dict[str, np.ndarray], directory: str):
    """arrays: flat {name: ndarray}. Writes manifest.json + data.bin."""
    os.makedirs(directory, exist_ok=True)
    manifest = []
    offset = 0
    with open(os.path.join(directory, "data.bin"), "wb") as f:
        for name, arr in arrays.items():
            arr = np.ascontiguousarray(arr)
            pad = (-offset) % _ALIGN
            if pad:
                f.write(b"\0" * pad)
                offset += pad
            data = arr.tobytes()
            f.write(data)
            manifest.append(
                {
                    "name": name,
                    "dtype": arr.dtype.str,
                    "shape": list(arr.shape),
                    "offset": offset,
                    "nbytes": len(data),
                }
            )
            offset += len(data)
    with open(os.path.join(directory, "manifest.json"), "w") as f:
        json.dump(manifest, f)


def load_raw_checkpoint(
    directory: str,
    threads: Optional[int] = None,
    use_native: bool = True,
) -> Dict[str, np.ndarray]:
    with open(os.path.join(directory, "manifest.json")) as f:
        manifest = json.load(f)
    path = os.path.join(directory, "data.bin")

    out: Dict[str, np.ndarray] = {}
    bufs = []
    for rec in manifest:
        arr = np.empty(rec["shape"], np.dtype(rec["dtype"]))
        out[rec["name"]] = arr
        bufs.append(arr)

    lib = _build_and_load() if use_native else None
    if lib is not None:
        n = len(manifest)
        offsets = (ctypes.c_int64 * n)(
            *[rec["offset"] for rec in manifest]
        )
        nbytes = (ctypes.c_int64 * n)(
            *[rec["nbytes"] for rec in manifest]
        )
        dsts = (ctypes.c_void_p * n)(
            *[b.ctypes.data_as(ctypes.c_void_p).value for b in bufs]
        )
        if threads is None:
            threads = min(16, os.cpu_count() or 4)
        rc = lib.tq_load_ranges(
            path.encode(), offsets, nbytes, dsts, n, threads
        )
        if rc == 0:
            return out
        # fall through to numpy on error
    with open(path, "rb") as f:
        data = f.read()
    for rec, buf in zip(manifest, bufs):
        raw = data[rec["offset"] : rec["offset"] + rec["nbytes"]]
        buf[...] = np.frombuffer(
            raw, np.dtype(rec["dtype"])
        ).reshape(rec["shape"])
    return out
