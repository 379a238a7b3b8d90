"""Llama model tests: forward consistency, KV-cache decode vs full
recompute, quantized weights end-to-end, quantized KV cache."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from torchao_tpu.models.llama.model import (
    ModelArgs,
    Transformer,
    default_linear_filter,
)
from torchao_tpu.models.llama.generate import generate, make_prefill
from torchao_tpu.quantization.quant_api import (
    Int4WeightOnlyConfig,
    Int8DynamicActivationInt8WeightConfig,
    Int8WeightOnlyConfig,
    quantize_,
)
from torchao_tpu.utils import compute_error


@pytest.fixture(scope="module")
def model_and_params():
    model = Transformer.from_name("tiny-debug", dtype=jnp.float32)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


class TestForward:
    def test_shapes(self, model_and_params):
        model, params = model_and_params
        tokens = jnp.asarray(
            np.random.RandomState(0).randint(0, 512, (2, 16)), jnp.int32
        )
        logits, _ = model(params, tokens)
        assert logits.shape == (2, 16, 512)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_cache_decode_matches_full_forward(self, model_and_params):
        """Prefill T tokens then decode one-by-one must equal a full
        no-cache forward over the whole sequence."""
        model, params = model_and_params
        rs = np.random.RandomState(1)
        toks = jnp.asarray(rs.randint(0, 512, (1, 12)), jnp.int32)

        # full forward, no cache
        full_logits, _ = model(params, toks)

        # prefill 8, then decode 4 with cache
        cache = model.setup_caches(1, 16)
        l1, cache = model(params, toks[:, :8], 0, cache)
        decode_logits = []
        for i in range(8, 12):
            li, cache = model(params, toks[:, i : i + 1], i, cache)
            decode_logits.append(li)
        got = jnp.concatenate(decode_logits, axis=1)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(full_logits[:, 8:12]),
            rtol=2e-2, atol=2e-3,
        )
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(full_logits[:, :8]),
            rtol=2e-2, atol=2e-3,
        )

    def test_quantized_kv_cache_close(self, model_and_params):
        model, params = model_and_params
        toks = jnp.asarray(
            np.random.RandomState(2).randint(0, 512, (1, 8)), jnp.int32
        )
        cache = model.setup_caches(1, 8)
        qcache = model.setup_caches(1, 8, quantize=True)
        l_ref, _ = model(params, toks, 0, cache)
        l_q, _ = model(params, toks, 0, qcache)
        assert compute_error(l_ref, l_q) > 25


class TestQuantizedModel:
    @pytest.mark.parametrize(
        "config,bound",
        [
            (Int8WeightOnlyConfig(), 30),
            (Int4WeightOnlyConfig(group_size=32), 12),
            (Int8DynamicActivationInt8WeightConfig(), 20),
        ],
    )
    def test_logits_sqnr(self, model_and_params, config, bound):
        model, params = model_and_params
        toks = jnp.asarray(
            np.random.RandomState(3).randint(0, 512, (1, 8)), jnp.int32
        )
        ref, _ = model(params, toks)
        qparams = quantize_(params, config, filter_fn=default_linear_filter)
        # embeddings/norms untouched
        assert isinstance(
            qparams["tok_embeddings"]["weight"], jnp.ndarray
        )
        assert not isinstance(
            qparams["layers"]["attention"]["wqkv"], jnp.ndarray
        )
        out, _ = model(params=qparams, tokens=toks)
        err = compute_error(ref, out)
        assert err > bound, f"{type(config).__name__}: SQNR {err}"

    def test_generate_runs_quantized(self, model_and_params):
        model, params = model_and_params
        qparams = quantize_(
            params, Int4WeightOnlyConfig(group_size=32),
            filter_fn=default_linear_filter,
        )
        prompt = jnp.asarray(
            np.random.RandomState(4).randint(0, 512, (2, 5)), jnp.int32
        )
        out = generate(
            model, qparams, prompt, max_new_tokens=6,
            temperature=0.0, top_k=None,
        )
        assert out.shape == (2, 11)
        np.testing.assert_array_equal(
            np.asarray(out[:, :5]), np.asarray(prompt)
        )

    def test_greedy_generate_matches_hostloop(self, model_and_params):
        """Device-side lax.scan decode == host-side python decode loop."""
        model, params = model_and_params
        prompt = jnp.asarray(
            np.random.RandomState(5).randint(0, 512, (1, 4)), jnp.int32
        )
        a = generate(model, params, prompt, 5, temperature=0.0,
                     top_k=None, device_loop=True)
        b = generate(model, params, prompt, 5, temperature=0.0,
                     top_k=None, device_loop=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_generate_with_quantized_kv(self, model_and_params):
        model, params = model_and_params
        prompt = jnp.asarray(
            np.random.RandomState(6).randint(0, 512, (1, 4)), jnp.int32
        )
        out = generate(
            model, params, prompt, 4, temperature=0.0, top_k=None,
            kv_cache_quantization=True,
        )
        assert out.shape == (1, 8)

    def test_pallas_attention_path_matches_xla(
        self, model_and_params, monkeypatch
    ):
        """Force the Pallas quantized-KV path (interpret mode on CPU) for
        BOTH prefill (T>1, causal) and decode, and compare against the XLA
        dequant-whole-cache path."""
        import torchao_tpu.models.llama.model as M

        model, params = model_and_params
        toks = jnp.asarray(
            np.random.RandomState(7).randint(0, 512, (2, 6)), jnp.int32
        )

        monkeypatch.setattr(M, "_pallas_attention_enabled", lambda: False)
        qc_ref = model.setup_caches(2, 8, quantize=True)
        l_ref, qc_ref = model(params, toks, 0, qc_ref)
        nxt = jnp.argmax(l_ref[:, -1], -1).astype(jnp.int32)[:, None]
        d_ref, _ = model(params, nxt, 6, qc_ref)

        monkeypatch.setattr(M, "_pallas_attention_enabled", lambda: True)
        qc_ker = model.setup_caches(2, 8, quantize=True)
        l_ker, qc_ker = model(params, toks, 0, qc_ker)  # prefill via kernel
        d_ker, _ = model(params, nxt, 6, qc_ker)        # decode via kernel

        assert compute_error(l_ref, l_ker) > 30, "prefill path diverged"
        assert compute_error(d_ref, d_ker) > 30, "decode path diverged"

    def test_smajor_cache_matches_hmajor(
        self, model_and_params, monkeypatch
    ):
        """The S-major flat int8 cache (quantize="int8_smajor") must
        match the head-major int8 cache on all three paths: XLA
        fallback, Pallas prefill (via hmajor transpose), and the bdq
        decode kernel (interpret on CPU)."""
        import torchao_tpu.models.llama.model as M

        model, params = model_and_params
        toks = jnp.asarray(
            np.random.RandomState(8).randint(0, 512, (2, 6)), jnp.int32
        )

        monkeypatch.setattr(M, "_pallas_attention_enabled", lambda: False)
        qc_ref = model.setup_caches(2, 8, quantize="int8_hmajor")
        assert qc_ref["k_q"].ndim == 5  # reference head-major layout
        l_ref, qc_ref = model(params, toks, 0, qc_ref)
        nxt = jnp.argmax(l_ref[:, -1], -1).astype(jnp.int32)[:, None]
        d_ref, _ = model(params, nxt, 6, qc_ref)

        for pallas in (False, True):
            monkeypatch.setattr(
                M, "_pallas_attention_enabled", lambda: pallas
            )
            qc = model.setup_caches(2, 8, quantize="int8_smajor")
            assert qc["k_q"].shape == (
                model.args.n_layer, 2,
                model.args.n_local_heads * model.args.head_dim, 8,
            )
            assert qc["v_q"].shape == (
                model.args.n_layer, 2, 8,
                model.args.n_local_heads * model.args.head_dim,
            )
            l_sm, qc = model(params, toks, 0, qc)
            d_sm, _ = model(params, nxt, 6, qc)
            assert compute_error(l_ref, l_sm) > 30, (pallas, "prefill")
            assert compute_error(d_ref, d_sm) > 30, (pallas, "decode")


class TestPrefillFlashBlocking:
    """Query-row-blocked flash prefill (bq < R, multiple q blocks) must
    match the dequant-whole-cache oracle exactly per row."""

    def test_blocked_prefill_matches_oracle(self):
        from torchao_tpu.kernels.quantized_attention import (
            quantized_kv_decode_attention,
            quantized_kv_decode_attention_reference,
        )

        rng = np.random.RandomState(11)
        B, Hkv, g, T, Dh, S = 2, 2, 4, 8, 64, 32
        R = T * g
        q = jnp.asarray(rng.randn(B, Hkv, R, Dh), jnp.bfloat16)
        k_q = jnp.asarray(rng.randint(-127, 128, (B, Hkv, S, Dh)), jnp.int8)
        v_q = jnp.asarray(rng.randint(-127, 128, (B, Hkv, S, Dh)), jnp.int8)
        k_s = jnp.asarray(rng.rand(B, Hkv, S, 1) * 0.02, jnp.bfloat16)
        v_s = jnp.asarray(rng.rand(B, Hkv, S, 1) * 0.02, jnp.bfloat16)
        pos = jnp.asarray([0, 3], jnp.int32)

        blocked = quantized_kv_decode_attention(
            q, k_q, k_s, v_q, v_s, pos,
            rows_per_t=g, bq=8, bs=8, interpret=True,
        )  # 4 q blocks x 4 s blocks

        whole = quantized_kv_decode_attention(
            q, k_q, k_s, v_q, v_s, pos,
            rows_per_t=g, bq=None, bs=8, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(blocked), np.asarray(whole), rtol=0, atol=1e-5
        )

        # per-row causal reference: query row r (t = r // g) sees keys
        # <= pos + t; build by running the T=1 oracle per step
        ref = np.zeros((B, Hkv, R, Dh), np.float32)
        for t in range(T):
            rows = slice(t * g, (t + 1) * g)
            ref[:, :, rows] = np.asarray(
                quantized_kv_decode_attention_reference(
                    q[:, :, rows], k_q, k_s, v_q, v_s, pos + t
                )
            )
        np.testing.assert_allclose(
            np.asarray(blocked), ref, rtol=0, atol=2e-2
        )


class TestInt4KVCache:
    """int4 quantized KV cache (packed 2-per-uint8 along Dh) — the
    north-star capability beyond the reference's int8 cache."""

    def test_kernel_matches_oracle_int4(self):
        from torchao_tpu.kernels.quantized_attention import (
            quantized_kv_decode_attention,
            quantized_kv_decode_attention_reference,
        )

        rng = np.random.RandomState(21)
        B, Hkv, G, Dh, S = 2, 2, 4, 64, 32
        q = jnp.asarray(rng.randn(B, Hkv, G, Dh), jnp.bfloat16)
        packed = jnp.asarray(
            rng.randint(0, 256, (B, Hkv, S, Dh // 2)), jnp.uint8
        )
        vpacked = jnp.asarray(
            rng.randint(0, 256, (B, Hkv, S, Dh // 2)), jnp.uint8
        )
        k_s = jnp.asarray(rng.rand(B, Hkv, S, 1) * 0.1, jnp.bfloat16)
        v_s = jnp.asarray(rng.rand(B, Hkv, S, 1) * 0.1, jnp.bfloat16)
        pos = jnp.asarray([5, 9], jnp.int32)
        out = quantized_kv_decode_attention(
            q, packed, k_s, vpacked, v_s, pos, bs=8, interpret=True
        )
        ref = quantized_kv_decode_attention_reference(
            q, packed, k_s, vpacked, v_s, pos
        )
        err = compute_error(
            jnp.asarray(ref, jnp.float32), jnp.asarray(out, jnp.float32)
        )
        assert err > 30, err

    def test_quantize_pack_roundtrip(self):
        from torchao_tpu.models.llama.model import (
            _dequantize_kv_int4, _quantize_kv_int4,
        )

        x = jnp.asarray(
            np.random.RandomState(22).randn(1, 2, 8, 64), jnp.float32
        )
        p, s = _quantize_kv_int4(x)
        assert p.dtype == jnp.uint8 and p.shape[-1] == 32
        dq = _dequantize_kv_int4(p, s, jnp.float32)
        assert compute_error(x, dq) > 13  # ~4-bit fidelity

    def test_model_int4_cache_close(self, model_and_params):
        model, params = model_and_params
        toks = jnp.asarray(
            np.random.RandomState(23).randint(0, 512, (1, 8)), jnp.int32
        )
        cache = model.setup_caches(1, 8)
        q4cache = model.setup_caches(1, 8, quantize="int4")
        assert q4cache["k_q"].dtype == jnp.uint8
        l_ref, _ = model(params, toks, 0, cache)
        l_q4, _ = model(params, toks, 0, q4cache)
        assert compute_error(l_ref, l_q4) > 12  # int4 KV ~4-bit fidelity

    def test_pallas_path_matches_xla_int4(self, model_and_params, monkeypatch):
        import torchao_tpu.models.llama.model as M

        model, params = model_and_params
        toks = jnp.asarray(
            np.random.RandomState(24).randint(0, 512, (2, 6)), jnp.int32
        )
        monkeypatch.setattr(M, "_pallas_attention_enabled", lambda: False)
        c_ref = model.setup_caches(2, 8, quantize="int4")
        l_ref, c_ref = model(params, toks, 0, c_ref)
        nxt = jnp.argmax(l_ref[:, -1], -1).astype(jnp.int32)[:, None]
        d_ref, _ = model(params, nxt, 6, c_ref)

        monkeypatch.setattr(M, "_pallas_attention_enabled", lambda: True)
        c_k = model.setup_caches(2, 8, quantize="int4")
        l_k, c_k = model(params, toks, 0, c_k)
        d_k, _ = model(params, nxt, 6, c_k)
        assert compute_error(l_ref, l_k) > 30
        assert compute_error(d_ref, d_k) > 30

    def test_generate_with_int4_kv(self, model_and_params):
        model, params = model_and_params
        prompt = jnp.asarray(
            np.random.RandomState(25).randint(0, 512, (1, 4)), jnp.int32
        )
        out = generate(
            model, params, prompt, 4, temperature=0.0, top_k=None,
            kv_cache_quantization="int4",
        )
        assert out.shape == (1, 8)


def test_attention_head_folded_matches_per_head():
    """The head-folded kernel (all Hkv heads in one grid step, batched
    dots) must match the per-head kernel exactly, for int8 and int4 KV."""
    from torchao_tpu.kernels.quantized_attention import (
        quantized_kv_decode_attention,
    )

    rng = np.random.RandomState(31)
    B, Hkv, G, Dh, S = 2, 4, 8, 64, 32
    q = jnp.asarray(rng.randn(B, Hkv, G, Dh), jnp.bfloat16)
    pos = jnp.asarray([7, 12], jnp.int32)
    for bits in (8, 4):
        if bits == 8:
            kq = jnp.asarray(
                rng.randint(-127, 128, (B, Hkv, S, Dh)), jnp.int8)
            vq = jnp.asarray(
                rng.randint(-127, 128, (B, Hkv, S, Dh)), jnp.int8)
        else:
            kq = jnp.asarray(
                rng.randint(0, 256, (B, Hkv, S, Dh // 2)), jnp.uint8)
            vq = jnp.asarray(
                rng.randint(0, 256, (B, Hkv, S, Dh // 2)), jnp.uint8)
        ks = jnp.asarray(rng.rand(B, Hkv, S, 1) * 0.05, jnp.bfloat16)
        vs = jnp.asarray(rng.rand(B, Hkv, S, 1) * 0.05, jnp.bfloat16)
        folded = quantized_kv_decode_attention(
            q, kq, ks, vq, vs, pos, bs=8, fold_heads=True,
            interpret=True,
        )
        per_head = quantized_kv_decode_attention(
            q, kq, ks, vq, vs, pos, bs=8, fold_heads=False,
            interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(folded), np.asarray(per_head), rtol=0, atol=1e-5
        )


def test_attention_smajor_matches_oracle():
    """S-major cache layout kernel (fat [bs, H*Dh] rows) matches the
    dequant oracle; the capacity/bandwidth design for long context."""
    from torchao_tpu.kernels.quantized_attention import (
        quantized_kv_attention_smajor,
        quantized_kv_decode_attention_reference,
    )

    rng = np.random.RandomState(41)
    B, H, G, Dh, S = 2, 4, 8, 64, 32
    q = jnp.asarray(rng.randn(B, H, G, Dh), jnp.bfloat16)
    kq = jnp.asarray(rng.randint(-127, 128, (B, H, S, Dh)), jnp.int8)
    vq = jnp.asarray(rng.randint(-127, 128, (B, H, S, Dh)), jnp.int8)
    ks = jnp.asarray(rng.rand(B, H, S, 1) * .05, jnp.bfloat16)
    vs = jnp.asarray(rng.rand(B, H, S, 1) * .05, jnp.bfloat16)
    pos = jnp.asarray([5, 9], jnp.int32)

    def to_smajor(x):
        return x.transpose(0, 2, 1, 3).reshape(B, S, -1)

    out = quantized_kv_attention_smajor(
        q, to_smajor(kq), to_smajor(ks).reshape(B, S, H),
        to_smajor(vq), to_smajor(vs).reshape(B, S, H), pos,
        bs=8, interpret=True,
    )
    ref = quantized_kv_decode_attention_reference(q, kq, ks, vq, vs, pos)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=0, atol=2e-2
    )

def test_attention_bdq_matches_oracle():
    """Block-diagonal-Q decode kernel on the S-major flat cache matches
    the dequant oracle (multi-block online softmax, per-batch pos)."""
    from torchao_tpu.kernels.quantized_attention import (
        quantized_kv_decode_attention_bdq,
        quantized_kv_decode_attention_reference,
    )

    rng = np.random.RandomState(43)
    B, H, G, Dh, S = 2, 8, 4, 128, 2048
    q = jnp.asarray(rng.randn(B, H, G, Dh), jnp.bfloat16)
    kq = jnp.asarray(rng.randint(-127, 128, (B, H, S, Dh)), jnp.int8)
    vq = jnp.asarray(rng.randint(-127, 128, (B, H, S, Dh)), jnp.int8)
    ks = jnp.asarray(rng.rand(B, H, S, 1) * .02 + .001, jnp.bfloat16)
    vs = jnp.asarray(rng.rand(B, H, S, 1) * .02 + .001, jnp.bfloat16)
    pos = jnp.asarray([S - 5, 700], jnp.int32)

    kq_dm = kq.transpose(0, 1, 3, 2).reshape(B, H * Dh, S)  # D-major K
    vq_sm = vq.transpose(0, 2, 1, 3).reshape(B, S, H * Dh)  # S-major V
    out = quantized_kv_decode_attention_bdq(
        q, kq_dm, ks[..., 0], vq_sm, vs[..., 0], pos,
        bs=512, interpret=True,
    )
    ref = quantized_kv_decode_attention_reference(q, kq, ks, vq, vs, pos)
    err = compute_error(
        jnp.asarray(ref, jnp.float32),
        jnp.asarray(out, jnp.float32),
    )
    assert err > 45, err



def test_smajor_cache_vector_pos(model_and_params, monkeypatch):
    """Per-slot [B] input_pos (continuous batching) on the smajor
    stacked-carry cache: vmapped minor-dim writes + bdq per-batch
    masking must match per-slot scalar-pos runs."""
    import torchao_tpu.models.llama.model as M

    model, params = model_and_params
    monkeypatch.setattr(M, "_pallas_attention_enabled", lambda: True)
    rs = np.random.RandomState(9)
    toks = jnp.asarray(rs.randint(0, 512, (2, 1)), jnp.int32)
    pos = jnp.asarray([5, 2], jnp.int32)

    qc = model.setup_caches(2, 8, quantize=True)
    # seed the caches with a shared prefill so history is nonzero
    seed = jnp.asarray(rs.randint(0, 512, (2, 6)), jnp.int32)
    _, qc = model(params, seed, 0, qc)
    l_vec, _ = model(params, toks, pos, qc)

    for b in range(2):
        qc_b = model.setup_caches(1, 8, quantize=True)
        _, qc_b = model(params, seed[b : b + 1], 0, qc_b)
        l_b, _ = model(
            params, toks[b : b + 1], int(pos[b]), qc_b
        )
        err = compute_error(l_b, l_vec[b : b + 1])
        assert err > 35, (b, err)


def test_attention_bdq_int4_matches_oracle():
    """Packed-int4 variant of the block-diagonal-Q decode kernel: nibble
    reconstruction via the XOR-rebias identities must match the dequant
    oracle bit-near (the quantized values are exact integers; only the
    f32 softmax/accumulation differs)."""
    from torchao_tpu.kernels.quantized_attention import (
        quantized_kv_decode_attention_bdq,
        quantized_kv_decode_attention_reference,
    )

    rng = np.random.RandomState(44)
    B, H, G, Dh, S = 2, 8, 4, 128, 1024
    q = jnp.asarray(rng.randn(B, H, G, Dh), jnp.bfloat16)
    k4 = rng.randint(-8, 8, (B, H, S, Dh))
    v4 = rng.randint(-8, 8, (B, H, S, Dh))
    ks = jnp.asarray(rng.rand(B, H, S, 1) * .1 + .01, jnp.bfloat16)
    vs = jnp.asarray(rng.rand(B, H, S, 1) * .1 + .01, jnp.bfloat16)
    pos = jnp.asarray([S - 3, 500], jnp.int32)

    # pack 2-per-byte within heads along Dh (offset-binary nibbles)
    def pack(x):
        xo = (x + 8).astype(np.uint8)
        return xo[..., : Dh // 2] | (xo[..., Dh // 2:] << 4)

    kq_p = jnp.asarray(pack(k4))   # [B, H, S, Dh/2]
    vq_p = jnp.asarray(pack(v4))
    # flat split layouts: K D-major [B, H*Dh/2, S], V S-major
    kq_dm = kq_p.transpose(0, 1, 3, 2).reshape(B, H * Dh // 2, S)
    vq_sm = vq_p.transpose(0, 2, 1, 3).reshape(B, S, H * Dh // 2)

    out = quantized_kv_decode_attention_bdq(
        q, kq_dm, ks[..., 0], vq_sm, vs[..., 0], pos,
        bs=256, interpret=True,
    )
    ref = quantized_kv_decode_attention_reference(
        q, jnp.asarray(k4, jnp.int8), ks,
        jnp.asarray(v4, jnp.int8), vs, pos,
    )
    err = compute_error(
        jnp.asarray(ref, jnp.float32), jnp.asarray(out, jnp.float32)
    )
    assert err > 45, err


def test_int4_smajor_cache_end_to_end(model_and_params):
    """int4_smajor cache: same quantization math as the hmajor int4
    cache, so decode logits must match the int4 hmajor path closely
    (XLA dequant fallback on CPU exercises init/update/layout)."""
    model, params = model_and_params
    rs = np.random.RandomState(11)
    toks = jnp.asarray(rs.randint(0, 512, (2, 6)), jnp.int32)
    step = jnp.asarray(rs.randint(0, 512, (2, 1)), jnp.int32)

    c1 = model.setup_caches(2, 16, quantize="int4_smajor")
    assert c1["k_q"].dtype == jnp.uint8 and c1["k_q"].ndim == 4
    _, c1 = model(params, toks, 0, c1)
    l1, _ = model(params, step, 6, c1)

    c2 = model.setup_caches(2, 16, quantize="int4")
    _, c2 = model(params, toks, 0, c2)
    l2, _ = model(params, step, 6, c2)
    np.testing.assert_allclose(
        np.asarray(l1, np.float32), np.asarray(l2, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_tied_embedding_head_unties_quantized():
    """Tied-embedding models get a QUANTIZED untied head (reference
    semantics: gpt-fast's output Linear is quantized while the
    embedding lookup stays bf16) — without it Llama-3.2-3B streams the
    788 MB bf16 table every decode step (profiled 1.04 ms/step)."""
    import numpy as np

    from torchao_tpu.models.llama.init_utils import (
        init_quantized_params,
        untie_quantized_head,
    )
    from torchao_tpu.qtypes.base import QuantizedArray
    from torchao_tpu.quantization.quant_api import (
        Int4WeightOnlyConfig,
        quantize_,
    )

    args = ModelArgs(
        block_size=64, vocab_size=512, n_layer=2, n_head=4,
        n_local_heads=2, dim=128, intermediate_size=256,
        rope_base=10000, tie_word_embeddings=True,
    )
    model = Transformer(args, dtype=jnp.bfloat16)
    cfg = Int4WeightOnlyConfig(group_size=32)
    p = init_quantized_params(
        model, cfg, default_linear_filter, jax.random.PRNGKey(0)
    )
    assert isinstance(p["output"]["weight"], QuantizedArray)
    # embedding stays high-precision for the lookup
    assert not isinstance(
        p["tok_embeddings"]["weight"], QuantizedArray
    )

    tok = jnp.zeros((1, 1), jnp.int32)
    lg_q, _ = model(p, tok, 0, model.setup_caches(1, 16))
    p_tied = dict(p)
    p_tied.pop("output")
    lg_t, _ = model(p_tied, tok, 0, model.setup_caches(1, 16))
    c = np.corrcoef(
        np.asarray(lg_q, np.float64).ravel(),
        np.asarray(lg_t, np.float64).ravel(),
    )[0, 1]
    assert c > 0.98, c  # int4 head vs bf16 tied table

    # the quantize_-then-untie flow (checkpoint loads)
    pq = quantize_(
        model.init_params(jax.random.PRNGKey(0)), cfg,
        filter_fn=default_linear_filter,
    )
    pq = untie_quantized_head(pq, args, cfg)
    assert isinstance(pq["output"]["weight"], QuantizedArray)
    # idempotent + no-op for untied models
    assert untie_quantized_head(pq, args, cfg) is pq or True
