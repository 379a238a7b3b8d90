"""Cross-framework parity: identical weights into our JAX Llama and the
reference's torch gpt-fast Llama (imported from /root/reference, CPU) —
full-model logits must agree, in bf16/f32 and after int8 weight-only
quantization on BOTH sides. This is the end-to-end counterpart of the
bit-exact qparam oracle tests in test_quant_primitives.py: it validates
the whole L1→L5 stack (rope, GQA, rmsnorm, SwiGLU, quantized linear)
against the reference implementation itself.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.reference_oracle import reference_available

torch = pytest.importorskip("torch")

if reference_available():
    import sys

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from torchao._models.llama.model import (  # noqa: E402
        ModelArgs as RefArgs,
        Transformer as RefTransformer,
    )

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference torchao not importable"
)

_CFG = dict(
    block_size=128, vocab_size=512, n_layer=2, n_head=4,
    n_local_heads=2, dim=64, intermediate_size=128, rope_base=10000,
)


def _build_pair(seed=0):
    """Reference torch model + our params tree carrying its weights."""
    from torchao_tpu.models.llama.model import ModelArgs, Transformer

    torch.manual_seed(seed)
    ref = RefTransformer(RefArgs(**_CFG)).to(torch.float32)
    for p in ref.parameters():
        with torch.no_grad():
            p.copy_(torch.randn_like(p) * 0.05)

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    L = _CFG["n_layer"]

    def stack(fmt):
        return jnp.asarray(
            np.stack([sd[fmt.format(i)] for i in range(L)]), jnp.float32
        )

    params = {
        "tok_embeddings": {
            "weight": jnp.asarray(sd["tok_embeddings.weight"], jnp.float32)
        },
        "layers": {
            "attention": {
                "wqkv": stack("layers.{}.attention.wqkv.weight"),
                "wo": stack("layers.{}.attention.wo.weight"),
            },
            "feed_forward": {
                "w1": stack("layers.{}.feed_forward.w1.weight"),
                "w3": stack("layers.{}.feed_forward.w3.weight"),
                "w2": stack("layers.{}.feed_forward.w2.weight"),
            },
            "attention_norm": {
                "weight": stack("layers.{}.attention_norm.weight")
            },
            "ffn_norm": {"weight": stack("layers.{}.ffn_norm.weight")},
        },
        "norm": {"weight": jnp.asarray(sd["norm.weight"], jnp.float32)},
        "output": {"weight": jnp.asarray(sd["output.weight"], jnp.float32)},
    }
    ours = Transformer(ModelArgs(**_CFG), dtype=jnp.float32)
    return ref, ours, params


def _ref_logits(ref, toks_np):
    T = toks_np.shape[1]
    ref.setup_caches(1, max(T, 16))
    with torch.no_grad():
        out = ref(torch.from_numpy(toks_np), torch.arange(T))
    return out.float().numpy()


def test_bf16_model_logits_match():
    from torchao_tpu.utils import compute_error

    ref, ours, params = _build_pair()
    toks = np.random.RandomState(0).randint(0, 512, (1, 8)).astype(
        np.int64
    )
    ref_logits = _ref_logits(ref, toks)
    our_logits, _ = ours(params, jnp.asarray(toks, jnp.int32))
    sqnr = float(compute_error(
        jnp.asarray(ref_logits), our_logits.astype(jnp.float32)
    ))
    assert sqnr > 40, f"full-model divergence vs reference: {sqnr} dB"


def test_int8wo_model_logits_match():
    """Quantize BOTH implementations with their own int8 weight-only
    flow — the quantized models must still agree (same qparam math +
    same linear semantics end-to-end)."""
    from torchao.quantization import (
        int8_weight_only as ref_int8wo,
        quantize_ as ref_quantize_,
    )

    from torchao_tpu.models.llama.model import default_linear_filter
    from torchao_tpu.quantization.quant_api import (
        Int8WeightOnlyConfig,
        quantize_,
    )
    from torchao_tpu.utils import compute_error

    ref, ours, params = _build_pair(seed=1)
    toks = np.random.RandomState(1).randint(0, 512, (1, 8)).astype(
        np.int64
    )
    ref_quantize_(ref, ref_int8wo())
    ref_logits = _ref_logits(ref, toks)

    qparams = quantize_(
        params, Int8WeightOnlyConfig(), default_linear_filter
    )
    our_logits, _ = ours(qparams, jnp.asarray(toks, jnp.int32))
    sqnr = float(compute_error(
        jnp.asarray(ref_logits), our_logits.astype(jnp.float32)
    ))
    assert sqnr > 35, f"int8wo model divergence vs reference: {sqnr} dB"


def test_int8dq_model_logits_match():
    """int8 dynamic-activation × int8-weight on both sides: validates
    the per-token activation quant semantics end-to-end too."""
    from torchao.quantization import (
        int8_dynamic_activation_int8_weight as ref_int8dq,
        quantize_ as ref_quantize_,
    )

    from torchao_tpu.models.llama.model import default_linear_filter
    from torchao_tpu.quantization.quant_api import (
        Int8DynamicActivationInt8WeightConfig,
        quantize_,
    )
    from torchao_tpu.utils import compute_error

    ref, ours, params = _build_pair(seed=2)
    toks = np.random.RandomState(2).randint(0, 512, (1, 8)).astype(
        np.int64
    )
    ref_quantize_(ref, ref_int8dq())
    ref_logits = _ref_logits(ref, toks)

    qparams = quantize_(
        params, Int8DynamicActivationInt8WeightConfig(),
        default_linear_filter,
    )
    our_logits, _ = ours(qparams, jnp.asarray(toks, jnp.int32))
    sqnr = float(compute_error(
        jnp.asarray(ref_logits), our_logits.astype(jnp.float32)
    ))
    assert sqnr > 30, f"int8dq model divergence vs reference: {sqnr} dB"


def test_int4wo_model_logits_match():
    """The headline config: tinygemm-semantics int4 weight-only g=32 on
    both sides (reference uses its Int4CPULayout on CPU)."""
    from torchao.dtypes import Int4CPULayout
    from torchao.quantization import (
        Int4WeightOnlyConfig as RefInt4,
        quantize_ as ref_quantize_,
    )

    from torchao_tpu.models.llama.model import default_linear_filter
    from torchao_tpu.quantization.quant_api import (
        Int4WeightOnlyConfig,
        quantize_,
    )
    from torchao_tpu.utils import compute_error

    ref, ours, params = _build_pair(seed=3)
    toks = np.random.RandomState(3).randint(0, 512, (1, 8)).astype(
        np.int64
    )
    ref = ref.to(torch.bfloat16)
    ref_quantize_(
        ref, RefInt4(group_size=32, layout=Int4CPULayout(), version=1)
    )
    T = toks.shape[1]
    ref.setup_caches(1, 16)
    with torch.no_grad():
        ref_logits = ref(
            torch.from_numpy(toks), torch.arange(T)
        ).float().numpy()

    qparams = quantize_(
        params, Int4WeightOnlyConfig(group_size=32),
        default_linear_filter,
    )
    our_logits, _ = ours(qparams, jnp.asarray(toks, jnp.int32))
    sqnr = float(compute_error(
        jnp.asarray(ref_logits), our_logits.astype(jnp.float32)
    ))
    # both models carry identical int4 noise IF the qparam decisions
    # match; the remaining gap is bf16-vs-f32 activation precision
    assert sqnr > 25, f"int4wo model divergence vs reference: {sqnr} dB"
