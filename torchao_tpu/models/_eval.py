"""lm-eval protocol adapter.

TPU-native counterpart of the reference's ``TransformerEvalWrapper``
(``torchao/_models/_eval.py:29``) and ``LMEvalInputRecorder`` (``:128``),
speaking the same interface so a future ``lm_eval`` install is a
zero-code drop-in:

- ``TransformerEvalWrapper(model, params, tokenizer, max_seq_length)``
  implements the lm-eval ``LM`` protocol (``loglikelihood``,
  ``loglikelihood_rolling``, ``generate_until``) on top of
  ``_model_call`` — the same extension point the reference uses — plus
  the harness-expected surface (``tok_encode`` / ``tok_decode`` /
  ``eot_token_id`` / ``max_length`` / ``max_gen_toks`` / ``batch_size``
  / ``device`` / ``run_eval``).
- ``LMEvalInputRecorder(tokenizer, calibration_seq_length, ...)``
  records calibration inputs while pretending to evaluate (random
  logits out), mirroring the reference's GPTQ calibration flow
  (``record_inputs`` → ``get_recorded_inputs``).

When ``lm_eval`` is importable the classes subclass
``lm_eval.api.model.LM`` and ``run_eval`` drives the real evaluator;
without it the identical protocol runs against the in-repo stub base,
which is what the tests exercise (``tests/test_lm_eval_protocol.py``).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def score_loglikelihoods(
    model,
    params,
    contexts: List[np.ndarray],
    continuations: List[np.ndarray],
) -> List[Tuple[float, bool]]:
    """For each (context, continuation) token pair: (sum log p of the
    continuation, whether it is the greedy decode)."""
    out = []
    for ctx, cont in zip(contexts, continuations):
        toks = jnp.asarray(
            np.concatenate([ctx, cont])[None, :], jnp.int32
        )
        logits, _ = model(params, toks)
        logp = jax.nn.log_softmax(
            logits[0].astype(jnp.float32), axis=-1
        )
        start = len(ctx) - 1
        span = logp[start : start + len(cont)]
        tgt = jnp.asarray(cont, jnp.int32)
        ll = float(
            jnp.sum(jnp.take_along_axis(span, tgt[:, None], axis=1))
        )
        greedy = bool(jnp.all(jnp.argmax(span, axis=-1) == tgt))
        out.append((ll, greedy))
    return out


class _StubLM:
    """Protocol stand-in for ``lm_eval.api.model.LM`` (v0.4): abstract
    ``loglikelihood`` / ``loglikelihood_rolling`` / ``generate_until``.
    Subclasses below implement all three, so swapping this base for the
    real ``LM`` changes nothing."""


try:  # pragma: no cover - lm_eval absent in this environment
    from lm_eval.api.model import LM as _eval_base  # type: ignore

    HAVE_LM_EVAL = True
except Exception:
    _eval_base = _StubLM
    HAVE_LM_EVAL = False


class _Request:
    """Minimal stand-in for an lm_eval Instance (has ``.args``)."""

    def __init__(self, *args):
        self.args = args


class TransformerEvalWrapper(_eval_base):
    """lm-eval wrapper over the JAX Llama (reference
    ``_models/_eval.py:29``). ``input_prep_func`` maps a [1, T] token
    array to the model's positional args, defaulting to ``(toks,)``."""

    def __init__(
        self,
        model,
        params,
        tokenizer,
        max_seq_length: int = 2048,
        input_prep_func: Optional[Callable] = None,
        device: str = "tpu",
    ):
        if HAVE_LM_EVAL:  # the real LM base has state to initialize
            try:
                super().__init__()
            except TypeError:  # pragma: no cover
                pass
        self._model = model
        self._params = params
        self.tokenizer = tokenizer
        self._device = device
        self._max_seq_length = int(max_seq_length)
        self.input_prep_func = (
            input_prep_func if input_prep_func is not None
            else (lambda toks: (toks,))
        )

    # -- the extension point (reference `_model_call`) ------------------
    def _model_call(self, inps) -> np.ndarray:
        """[1, T] (or [T]) int tokens → [1, T, vocab] float32 logits."""
        toks = jnp.asarray(np.asarray(inps), jnp.int32)
        if toks.ndim == 1:
            toks = toks[None]
        out = self._model(self._params, *self.input_prep_func(toks))
        logits = out[0] if isinstance(out, tuple) else out
        return np.asarray(logits, np.float32)

    # -- LM protocol ----------------------------------------------------
    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        ctxs, conts = [], []
        for req in requests:
            c, x = req.args
            ctx = (
                np.asarray(c, np.int32) if not isinstance(c, str)
                else np.asarray(self.tok_encode(c), np.int32)
            )
            cont = (
                np.asarray(x, np.int32) if not isinstance(x, str)
                else np.asarray(
                    self.tokenizer.encode(x), np.int32
                )
            )
            ctxs.append(ctx)
            conts.append(cont)
        out = []
        for ctx, cont in zip(ctxs, conts):
            toks = np.concatenate([ctx, cont])[None, :]
            toks = toks[:, -self.max_length:]
            logits = self._model_call(toks)
            logp = jax.nn.log_softmax(
                jnp.asarray(logits[0]), axis=-1
            )
            start = toks.shape[1] - len(cont) - 1
            span = logp[start : start + len(cont)]
            tgt = jnp.asarray(cont, jnp.int32)
            ll = float(
                jnp.sum(jnp.take_along_axis(span, tgt[:, None], axis=1))
            )
            greedy = bool(jnp.all(jnp.argmax(span, -1) == tgt))
            out.append((ll, greedy))
        return out

    def loglikelihood_rolling(self, requests) -> List[float]:
        outs = []
        for req in requests:
            (text,) = req.args
            toks = (
                np.asarray(text, np.int32) if not isinstance(text, str)
                else np.asarray(self.tok_encode(text), np.int32)
            )
            ll = 0.0
            for s in range(0, max(len(toks) - 1, 1), self.max_length):
                win = toks[s : s + self.max_length + 1]
                if len(win) < 2:
                    break
                logits = self._model_call(win[None, :-1])
                logp = jax.nn.log_softmax(
                    jnp.asarray(logits[0]), axis=-1
                )
                tgt = jnp.asarray(win[1:], jnp.int32)
                ll += float(
                    jnp.sum(
                        jnp.take_along_axis(logp, tgt[:, None], axis=1)
                    )
                )
            outs.append(ll)
        return outs

    def generate_until(self, requests) -> List[str]:
        from torchao_tpu.models.llama.generate import generate

        outs = []
        for req in requests:
            ctx, kwargs = req.args
            toks = jnp.asarray(
                np.asarray(self.tok_encode(ctx), np.int32)[None]
            )
            out = generate(
                self._model, self._params, toks,
                kwargs.get("max_gen_toks", self.max_gen_toks),
                temperature=kwargs.get("temperature", 0.0),
                top_k=None,
            )
            text = self.tok_decode(
                np.asarray(out[0, toks.shape[1]:]).tolist()
            )
            for stop in kwargs.get("until", []) or []:
                pos = text.find(stop)
                if pos >= 0:
                    text = text[:pos]
            outs.append(text)
        return outs

    # -- harness surface (reference :85-125) ----------------------------
    @property
    def eot_token_id(self):
        tok = self.tokenizer
        for attr in ("eos_id", "eos_token_id"):
            v = getattr(tok, attr, None)
            if callable(v):
                return v()
            if v is not None:
                return v
        return 0

    @property
    def max_length(self) -> int:
        return self._max_seq_length

    @property
    def max_gen_toks(self) -> int:
        return 50

    @property
    def batch_size(self) -> int:
        return 1

    @property
    def device(self):
        return self._device

    def tok_encode(self, string: str, **kwargs) -> List[int]:
        tokens = list(self.tokenizer.encode(string))
        bos = getattr(self.tokenizer, "bos_id", None)
        if bos is not None:
            bos = bos() if callable(bos) else bos
            tokens = [bos] + tokens
        return tokens

    def tok_decode(self, tokens, **kwargs) -> str:
        return self.tokenizer.decode(tokens, **kwargs)

    def run_eval(self, tasks, limit=None):
        """Drive the real lm-eval evaluator (requires ``lm_eval``)."""
        if not HAVE_LM_EVAL:  # pragma: no cover
            raise ImportError(
                "lm_eval is not installed in this environment; the "
                "wrapper itself is protocol-complete — install lm_eval "
                "and run_eval drives the standard tasks unchanged"
            )
        import lm_eval  # type: ignore
        from lm_eval.evaluator import evaluate  # type: ignore
        from lm_eval.tasks import get_task_dict  # type: ignore

        try:
            lm_eval.tasks.initialize_tasks()
        except Exception:
            pass
        result = evaluate(self, get_task_dict(tasks), limit=limit)
        for task, res in result["results"].items():
            print(f"{task}: {res}")
        return result


class LMEvalInputRecorder(TransformerEvalWrapper):
    """Records calibration inputs through the eval protocol (reference
    ``_models/_eval.py:128``): every ``_model_call`` stores the prepared
    input batch and returns random logits so the harness keeps going.
    Recorded inputs feed GPTQ/AWQ calibration
    (``quantization.gptq_llama.gptq_quantize_llama``)."""

    def __init__(
        self,
        tokenizer,
        calibration_seq_length: int,
        input_prep_func: Optional[Callable] = None,
        vocab_size: int = 32000,
        pad_calibration_inputs: bool = False,
        pad_token: int = 0,
        device: str = "cpu",
    ):
        super().__init__(
            model=None,
            params=None,
            tokenizer=tokenizer,
            max_seq_length=calibration_seq_length,
            input_prep_func=input_prep_func,
            device=device,
        )
        self.vocab_size = vocab_size
        self.calibration_seq_length = int(calibration_seq_length)
        self.pad_calibration_inputs = pad_calibration_inputs
        self.pad_token = pad_token
        self._recorded: List[np.ndarray] = []
        self._rng = np.random.RandomState(0)

    def _model_call(self, inps) -> np.ndarray:
        toks = np.asarray(inps, np.int64).reshape(-1)
        T = len(toks)
        usable = not (
            (T < self.calibration_seq_length
             and not self.pad_calibration_inputs)
            or (self.pad_calibration_inputs
                and self.pad_token in toks)
        )
        if usable:
            if T >= self.calibration_seq_length:
                toks = toks[: self.calibration_seq_length]
            else:
                toks = np.pad(
                    toks, (0, self.calibration_seq_length - T),
                    constant_values=self.pad_token,
                )
            self._recorded.append(toks.astype(np.int32)[None, :])
        return self._rng.randn(1, T, self.vocab_size).astype(np.float32)

    def record_inputs(self, calibration_tasks, calibration_limit):
        """Run the real evaluator purely to harvest inputs (needs
        ``lm_eval``); with the stub base, feed requests directly through
        ``loglikelihood``/``_model_call``."""
        if not HAVE_LM_EVAL:  # pragma: no cover
            raise ImportError(
                "lm_eval not installed — drive loglikelihood(...) "
                "directly to record inputs"
            )
        import lm_eval  # type: ignore
        from lm_eval.evaluator import evaluate  # type: ignore
        from lm_eval.tasks import get_task_dict  # type: ignore

        try:
            lm_eval.tasks.initialize_tasks()
        except Exception:
            pass
        evaluate(self, get_task_dict(calibration_tasks),
                 limit=calibration_limit)
        return self

    def get_recorded_inputs(self) -> List[np.ndarray]:
        return list(self._recorded)

    def get_inputs(self) -> List[np.ndarray]:  # reference BC alias
        return self.get_recorded_inputs()


def make_lm_eval_wrapper(model, params, tokenizer, max_length=2048):
    """BC constructor (round-1 API): returns the protocol wrapper."""
    return TransformerEvalWrapper(
        model, params, tokenizer, max_seq_length=max_length
    )
