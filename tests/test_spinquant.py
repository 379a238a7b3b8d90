"""SpinQuant tests: rotation preserves float function; Hadamard props."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu.models.llama.model import Transformer
from torchao_tpu.prototype.spinquant import (
    apply_spinquant,
    hadamard_matrix,
    random_hadamard_matrix,
)
from torchao_tpu.utils import compute_error


def test_hadamard_orthogonal():
    H = hadamard_matrix(128)
    np.testing.assert_allclose(
        np.asarray(H @ H.T), np.eye(128), atol=1e-5
    )
    R = random_hadamard_matrix(128, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        np.asarray(R @ R.T), np.eye(128), atol=1e-5
    )


def test_spinquant_preserves_float_function():
    model = Transformer.from_name("tiny-debug", dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    toks = jnp.asarray(
        np.random.RandomState(0).randint(0, 512, (1, 8)), jnp.int32
    )
    ref, _ = model(params, toks)
    rotated = apply_spinquant(params, jax.random.PRNGKey(2))
    out, _ = model(rotated, toks)
    err = compute_error(ref, out)
    assert err > 35, f"rotation changed the float function: {err} dB"


def test_hadamard_paley_orders():
    """Non-pow2 orders 12/20/28 (Paley) and their pow2 multiples — the
    constructions replacing the reference's hardcoded had_12/20/28."""
    from torchao_tpu.prototype.spinquant import is_hadamard_order

    for n in (12, 20, 28, 56, 448):
        H = np.asarray(hadamard_matrix(n))
        np.testing.assert_allclose(H @ H.T, np.eye(n), atol=1e-4)
        # entries are ±1/sqrt(n) — a true Hadamard, not just orthogonal
        np.testing.assert_allclose(
            np.abs(H) * np.sqrt(n), np.ones((n, n)), atol=1e-4
        )
    assert is_hadamard_order(14336)   # Llama-3-8B FFN = 28·512
    assert not is_hadamard_order(100)


def test_apply_hadamard_matches_matmul():
    from torchao_tpu.prototype.spinquant import apply_hadamard

    rs = np.random.RandomState(0)
    for n in (64, 448):
        x = jnp.asarray(rs.randn(3, n), jnp.float32)
        ref = x @ hadamard_matrix(n)
        out = apply_hadamard(x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-4
        )


def test_spinquant_r2_preserves_float_function():
    model = Transformer.from_name("tiny-debug", dtype=jnp.float32)
    a = model.args
    params = model.init_params(jax.random.PRNGKey(0))
    toks = jnp.asarray(
        np.random.RandomState(4).randint(0, 512, (1, 8)), jnp.int32
    )
    ref, _ = model(params, toks)
    rotated = apply_spinquant(
        params, jax.random.PRNGKey(5), r2=True,
        head_dim=a.head_dim, n_head=a.n_head,
        n_local_heads=a.n_local_heads,
    )
    out, _ = model(rotated, toks)
    err = compute_error(ref, out)
    assert err > 35, f"R1+R2 changed the float function: {err} dB"


def test_spinquant_r4_preserves_float_function():
    import dataclasses

    model = Transformer.from_name("tiny-debug", dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    toks = jnp.asarray(
        np.random.RandomState(6).randint(0, 512, (1, 8)), jnp.int32
    )
    ref, _ = model(params, toks)
    rotated = apply_spinquant(params, jax.random.PRNGKey(7), r4=True)
    args_r4 = dataclasses.replace(model.args, use_r4_hadamard=True)
    model_r4 = Transformer(args_r4, dtype=jnp.float32)
    out, _ = model_r4(rotated, toks)
    err = compute_error(ref, out)
    assert err > 35, f"R1+R4 changed the float function: {err} dB"
    # sanity: running WITHOUT the online transform must NOT match
    broken, _ = model(rotated, toks)
    assert compute_error(ref, broken) < 20


def test_spinquant_spreads_outliers():
    """A weight with a single huge channel should have a much smaller
    max/mean ratio after rotation (the property that helps int4)."""
    model = Transformer.from_name("tiny-debug", dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    w = params["layers"]["feed_forward"]["w13"]
    w = w.at[:, :, 7].mul(100.0)  # channel outlier
    params["layers"]["feed_forward"]["w13"] = w
    rotated = apply_spinquant(params, jax.random.PRNGKey(3))

    def kurtosis_proxy(x):
        x = np.abs(np.asarray(x, np.float32)).reshape(-1)
        return x.max() / (x.mean() + 1e-9)

    before = kurtosis_proxy(w)
    after = kurtosis_proxy(rotated["layers"]["feed_forward"]["w13"])
    assert after < before / 2, (before, after)


class TestR3:
    """Online R3 (q/k Hadamard): score-invariant, improves KV-quant
    fidelity on outlier-heavy keys."""

    def _model(self, r3):
        from torchao_tpu.models.llama.model import ModelArgs, Transformer

        args = ModelArgs(
            block_size=64, vocab_size=256, n_layer=2, n_head=4,
            n_local_heads=2, dim=64, intermediate_size=128,
            use_r3_hadamard=r3,
        )
        return Transformer(args, dtype=jnp.float32)

    def test_float_equivalence(self):
        m0, m1 = self._model(False), self._model(True)
        params = m0.init_params(jax.random.PRNGKey(0))
        toks = jnp.asarray(
            np.random.RandomState(0).randint(0, 256, (1, 8)), jnp.int32
        )
        l0, _ = m0(params, toks)
        l1, _ = m1(params, toks)
        err = compute_error(l0, l1)
        assert err > 50, err  # orthonormal rotation: fp-exact-ish

    def test_improves_outlier_kv_quantization(self):
        """Synthetic outlier channel: R3 spreads it across Dh, so
        per-token absmax int4 quantization loses less signal."""
        from torchao_tpu.kernels.quantized_attention import unpack_int4_kv
        from torchao_tpu.models.llama.model import _quantize_kv_int4
        from torchao_tpu.prototype.spinquant.hadamard_utils import (
            apply_hadamard,
        )

        rng = np.random.RandomState(1)
        k = rng.randn(1, 2, 16, 64).astype(np.float32)
        k[..., 0] *= 50.0  # one outlier channel dominates absmax
        k = jnp.asarray(k)

        def int4_qdq_err(x):
            p, s = _quantize_kv_int4(x)
            dq = unpack_int4_kv(p, jnp.float32) * s
            return float(compute_error(x, dq))

        base = int4_qdq_err(k)
        rot = int4_qdq_err(apply_hadamard(k))
        assert rot > base + 6, (base, rot)  # ≥6 dB better under rotation
