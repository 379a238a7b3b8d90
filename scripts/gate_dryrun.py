"""Turn-key gate dry-run (VERDICT r4 next #10).

Exercises, on CPU, every code path a weight-egress day needs first:

  1. ``eval.py --fake-weights`` — the full wikitext-ppl plumbing on
     random weights (reference ``_models/llama/eval.py`` surface).
  2. The HF checkpoint CLI — build a SYNTHETIC HF Llama state dict
     (stories15M geometry, exact HF key names), convert it with
     ``scripts/convert_hf_checkpoint.py``, and eval from the converted
     ``.npz`` with a quantization recipe.
  3. The SAM2 checkpoint CLI + lm-eval stub protocol — via their
     pytest suites (the SAM2 suite builds a full reference
     ``SAM2Base`` state dict and asserts zero unconsumed keys; the
     lm-eval suite drives loglikelihood/rolling/generate_until).

Run via ``scripts/gate_dryrun.sh`` (or directly: ``python
scripts/gate_dryrun.py``). Exits non-zero on any gate failure.
"""

import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def gate_eval_fake_weights(tmp):
    import jax

    from torchao_tpu.models.llama import eval as eval_cli

    tokens = np.random.default_rng(0).integers(
        0, 512, size=4096, dtype=np.int32
    )
    tok_path = os.path.join(tmp, "tokens.npy")
    np.save(tok_path, tokens)
    eval_cli.main([
        "--model_name", "stories15M",
        "--tokens", tok_path,
        "--fake-weights",
        "-q", "int8wo",
        "--seq-len", "256",
        "--limit", "2",
    ])
    print("[gate 1] eval --fake-weights: OK", flush=True)
    return tok_path


def gate_hf_checkpoint_cli(tmp, tok_path):
    import torch

    from torchao_tpu.models.llama.model import ModelArgs

    args = ModelArgs.from_name("stories15M")
    rng = np.random.default_rng(1)

    def t(*shape):
        return torch.from_numpy(
            (rng.normal(size=shape) * 0.02).astype(np.float32)
        )

    d, inter, Dh = args.dim, args.intermediate_size, args.head_dim
    sd = {
        "model.embed_tokens.weight": t(args.vocab_size, d),
        "model.norm.weight": t(d),
        "lm_head.weight": t(args.vocab_size, d),
    }
    for i in range(args.n_layer):
        p = f"model.layers.{i}."
        sd[p + "self_attn.q_proj.weight"] = t(args.n_head * Dh, d)
        sd[p + "self_attn.k_proj.weight"] = t(args.n_local_heads * Dh, d)
        sd[p + "self_attn.v_proj.weight"] = t(args.n_local_heads * Dh, d)
        sd[p + "self_attn.o_proj.weight"] = t(d, d)
        sd[p + "mlp.gate_proj.weight"] = t(inter, d)
        sd[p + "mlp.up_proj.weight"] = t(inter, d)
        sd[p + "mlp.down_proj.weight"] = t(d, inter)
        sd[p + "input_layernorm.weight"] = t(d)
        sd[p + "post_attention_layernorm.weight"] = t(d)

    ckpt_dir = os.path.join(tmp, "stories15M")
    os.makedirs(ckpt_dir, exist_ok=True)
    torch.save(sd, os.path.join(ckpt_dir, "pytorch_model.bin"))

    out_npz = os.path.join(tmp, "stories15M.npz")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "convert_hf_checkpoint",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "convert_hf_checkpoint.py"),
    )
    cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cli)
    arrays = cli.convert(ckpt_dir, "stories15M")
    np.savez(out_npz, **arrays)

    from torchao_tpu.models.llama import eval as eval_cli

    eval_cli.main([
        "--model_name", "stories15M",
        "--tokens", tok_path,
        "--checkpoint", out_npz,
        "-q", "int8wo",
        "--seq-len", "256",
        "--limit", "2",
    ])
    print("[gate 2] HF checkpoint CLI -> eval: OK", flush=True)


def gate_pytest(paths, label):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", *paths],
        cwd=repo,
    )
    if r.returncode != 0:
        raise SystemExit(f"[gate] {label} FAILED")
    print(f"[gate 3] {label}: OK", flush=True)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    with tempfile.TemporaryDirectory() as tmp:
        tok_path = gate_eval_fake_weights(tmp)
        gate_hf_checkpoint_cli(tmp, tok_path)
    gate_pytest(
        ["tests/test_sam2_convert.py", "tests/test_lm_eval_protocol.py"],
        "SAM2 checkpoint CLI + lm-eval stub suites",
    )
    print("ALL GATES PASSED", flush=True)


if __name__ == "__main__":
    main()
