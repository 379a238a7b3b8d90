"""Native checkpoint loader tests: build, round-trip, fallback parity,
and a bandwidth sanity comparison vs single-threaded numpy."""

import time

import numpy as np
import pytest

from torchao_tpu.io import (
    load_raw_checkpoint,
    native_loader_available,
    save_raw_checkpoint,
)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("tqcp")
    rs = np.random.RandomState(0)
    arrays = {
        "a": rs.randn(257, 129).astype(np.float32),
        "b": rs.randint(0, 255, (1000,)).astype(np.uint8),
        "c": rs.randn(64, 64).astype(np.float32).astype("bfloat16")
        if hasattr(np, "bfloat16_unused") else rs.randn(64, 64).astype(np.float16),
        "d_big": rs.randn(2048, 2048).astype(np.float32),
    }
    save_raw_checkpoint(arrays, str(d))
    return str(d), arrays


def test_native_builds():
    assert native_loader_available(), "g++ build of ckpt_loader failed"


def test_roundtrip_native(ckpt):
    d, arrays = ckpt
    out = load_raw_checkpoint(d, use_native=True)
    assert set(out) == set(arrays)
    for k in arrays:
        np.testing.assert_array_equal(out[k], arrays[k])


def test_roundtrip_fallback(ckpt):
    d, arrays = ckpt
    out = load_raw_checkpoint(d, use_native=False)
    for k in arrays:
        np.testing.assert_array_equal(out[k], arrays[k])


def test_native_not_slower_than_fallback(tmp_path):
    if not native_loader_available():
        pytest.skip("no native loader")
    rs = np.random.RandomState(1)
    arrays = {f"t{i}": rs.randn(1024, 4096).astype(np.float32)
              for i in range(16)}  # 256 MB
    save_raw_checkpoint(arrays, str(tmp_path))

    def timed(use_native):
        t0 = time.perf_counter()
        load_raw_checkpoint(str(tmp_path), use_native=use_native)
        return time.perf_counter() - t0

    timed(True)  # warm page cache
    tn = min(timed(True) for _ in range(3))
    tf = min(timed(False) for _ in range(3))
    # threaded memcpy from page cache should beat single-thread python;
    # allow generous slack for CI noise
    assert tn < tf * 1.5, (tn, tf)
