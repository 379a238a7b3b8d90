"""Continuous-batching serving engine (single host).

A new capability beyond the reference (whose harness is bs=1 gpt-fast
generation): fixed decode slots over one static KV cache, slot-level
admission — a finished request's slot is refilled by prefilling the next
queued prompt into that slot while other slots keep decoding. All device
work is two jitted programs (slot-prefill, joint decode step) with static
shapes: no recompiles at steady state, cache buffers donated.

Multi-host: run the engine per data-parallel replica with TP-sharded
params (``torchao_tpu.parallel``); the decode step is a single pjit
program so XLA overlaps the TP collectives with compute.
"""

from __future__ import annotations

import dataclasses
import functools
import itertools
from collections import deque
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from torchao_tpu.models.llama.model import Transformer


@dataclasses.dataclass
class Request:
    prompt: np.ndarray                 # [T] int32
    max_new_tokens: int = 32
    eos_id: Optional[int] = None
    request_id: int = -1
    # filled by the engine:
    output: Optional[List[int]] = None


class ServingEngine:
    def __init__(
        self,
        model: Transformer,
        params,
        *,
        max_slots: int = 4,
        max_seq_len: int = 256,
        prefill_chunk: int = 64,
        kv_cache_quantization: bool = False,
        greedy: bool = True,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        seed: int = 0,
    ):
        self.model = model
        self.params = params
        self.B = max_slots
        self.S = min(max_seq_len, model.args.block_size)
        self.prefill_chunk = prefill_chunk
        # sampling: temperature 0 (or greedy=True default) = argmax;
        # otherwise the reference's exponential-race top-k multinomial,
        # keyed per (slot, position) so slots are independent streams
        self.temperature = 0.0 if greedy and temperature == 0.0 \
            else temperature
        self.top_k = top_k
        self._base_key = jax.random.PRNGKey(seed)
        self.cache = model.setup_caches(
            self.B, self.S, quantize=kv_cache_quantization
        )
        self.queue: deque[Request] = deque()
        self.active: Dict[int, Request] = {}       # slot -> request
        self.completed: List[Request] = []
        self.slot_pos = np.zeros(self.B, np.int32)  # next write position
        self.slot_remaining = np.zeros(self.B, np.int32)
        self.slot_token = np.zeros(self.B, np.int32)
        self._ids = itertools.count()
        self._build_programs()

    # ------------------------------------------------------------------
    def _build_programs(self):
        model = self.model
        temperature, top_k = self.temperature, self.top_k
        base_key = self._base_key

        def pick(logits_last, pos_vec):
            """Next token per slot: argmax (greedy) or the reference's
            exponential-race top-k multinomial, keyed per (slot, pos) so
            every slot is an independent, position-deterministic stream."""
            if temperature == 0.0:
                return jnp.argmax(logits_last, axis=-1).astype(jnp.int32)
            from torchao_tpu.models.llama.generate import logits_to_probs

            probs = logits_to_probs(logits_last, temperature, top_k)

            def one(p, slot, pos):
                k = jax.random.fold_in(
                    jax.random.fold_in(base_key, slot), pos
                )
                q = jax.random.exponential(k, p.shape, jnp.float32)
                return jnp.argmax(p / q)

            slots = jnp.arange(probs.shape[0])
            return jax.vmap(one)(probs, slots, pos_vec).astype(jnp.int32)

        @functools.partial(jax.jit, donate_argnums=(2,))
        def prefill_slot(params, tokens, cache, slot_pos_vec, lane_idx):
            """Run a chunk of prompt tokens for ALL slots — MIXED
            prefill+decode batching: admitting slots' lanes carry prompt
            chunks, active (decoding) slots' lanes carry their current
            token at lane 0 (pads after), so every admission pass is
            also a decode step for busy slots (emitting 1 token each)
            instead of a stall. ``lane_idx`` [B] selects each slot's
            next-token lane (0 for decoding slots; chunk-end for the
            final admission pass). Pad/dummy lanes only ever write cache
            at positions >= a slot's cursor, which the next real write
            covers before any query can attend to it."""
            logits, cache = model(params, tokens, slot_pos_vec, cache)
            lane_logits = jnp.take_along_axis(
                logits, lane_idx[:, None, None], axis=1
            )[:, 0]
            nxt = pick(lane_logits, slot_pos_vec + lane_idx)
            return nxt, cache

        @functools.partial(jax.jit, donate_argnums=(2,))
        def decode_step(params, tokens, cache, slot_pos_vec):
            logits, cache = model(
                params, tokens[:, None], slot_pos_vec, cache
            )
            nxt = pick(logits[:, -1], slot_pos_vec)
            return nxt, cache

        @functools.partial(
            jax.jit, donate_argnums=(2,), static_argnums=(4,)
        )
        def decode_n_steps(params, tokens, cache, slot_pos_vec, n):
            """n decode steps for ALL slots device-side (one dispatch
            emits n tokens per slot — finished slots produce ignored
            overshoot, trimmed by the host)."""

            def step(carry, _):
                tok, cache, pos = carry
                logits, cache = model(params, tok[:, None], pos, cache)
                nxt = pick(logits[:, -1], pos)
                return (nxt, cache, pos + 1), nxt

            (tok, cache, _), toks = jax.lax.scan(
                step, (tokens, cache, slot_pos_vec), None, length=n
            )
            return toks.swapaxes(0, 1), cache  # [B, n]

        self._prefill = prefill_slot
        self._decode = decode_step
        self._decode_n = decode_n_steps

    # ------------------------------------------------------------------
    def add_request(self, req: Request) -> int:
        req.request_id = next(self._ids)
        req.output = []
        self.queue.append(req)
        return req.request_id

    def _emit_active(self, nxt_np) -> Dict[int, int]:
        """Emit each active slot's current token and roll in the next
        (shared by decode steps and mixed admission passes — sampling is
        keyed per (slot, position), so emission timing never changes the
        token stream)."""
        emitted: Dict[int, int] = {}
        for slot, req in list(self.active.items()):
            tok = int(self.slot_token[slot])
            # the *current* token is emitted (it was produced by the
            # previous step/prefill); nxt becomes the next current
            req.output.append(tok)
            emitted[req.request_id] = tok
            self.slot_pos[slot] += 1
            self.slot_remaining[slot] -= 1
            self.slot_token[slot] = int(nxt_np[slot])
            done = self.slot_remaining[slot] <= 0 or (
                req.eos_id is not None and tok == req.eos_id
            )
            if done:
                self.completed.append(req)
                del self.active[slot]
        return emitted

    def _admit(self) -> Dict[int, int]:
        """Fill free slots from the queue by *batched* chunked prefill:
        every admitting slot's lane carries its own prompt chunk in the
        same pass, so K admissions cost ``ceil(max_len/chunk)+1`` passes
        instead of K separate prefills. Active slots keep DECODING
        through every pass (mixed prefill+decode batching): their lane
        carries the current token at lane 0 and they emit one token per
        pass — admission never stalls busy slots (each pass is
        weight-bound, so the extra lanes are nearly free).

        Dummy-token safety (for lane padding past a short prompt or a
        decode lane's pad tail): garbage k/v is only ever written at
        positions ≥ a slot's current write cursor; the causal mask keeps
        those positions unread until the sequential real writes (final
        prompt token, then decode steps) overwrite them.

        Returns {request_id: token} emitted by active slots during
        admission passes.
        """
        newly: Dict[int, Tuple[Request, np.ndarray]] = {}
        for slot in range(self.B):
            if slot in self.active or not self.queue:
                continue
            req = self.queue.popleft()
            prompt = np.asarray(req.prompt, np.int32)
            assert len(prompt) + req.max_new_tokens <= self.S, "too long"
            newly[slot] = (req, prompt)
        if not newly:
            return {}
        chunk = self.prefill_chunk
        cursors = {s: 0 for s in newly}
        emitted: Dict[int, int] = {}

        def remaining(s):
            return len(newly[s][1]) - cursors[s]

        # chunk passes in pow2 buckets (bounded program count). The
        # chunk containing a prompt's FINAL token also produces that
        # slot's first sampled token (lane_idx selects the lane) — no
        # separate 1-token finishing pass (saves one full model pass
        # per admission round; keyed sampling at the same (slot, pos)
        # keeps the token stream identical).
        while any(remaining(s) > 0 for s in newly):
            n_max = max(min(chunk, remaining(s)) for s in newly)
            n_max = max(n_max, 1)
            n_pad = min(1 << (n_max - 1).bit_length(), chunk)
            # cache write starts past S would be dropped — a lane whose
            # start + n_pad exceeds S would lose history. Shrink the
            # pass so every lane's write fits.
            starts = [
                min(cursors[s], len(newly[s][1]) - 1) for s in newly
            ]
            starts += [int(self.slot_pos[s]) for s in self.active]
            allowed = self.S - max(starts)
            assert allowed >= 1, (self.S, starts)
            while n_pad > allowed:
                n_pad //= 2

            toks = np.zeros((self.B, n_pad), np.int32)
            pos_vec = self.slot_pos.copy()
            lane = np.zeros(self.B, np.int32)
            finishing = []
            for s, (_, p) in newly.items():
                if s in self.active:
                    # admitted in an earlier pass of this round: it is
                    # a decode ride-along lane now (handled below)
                    continue
                n = min(n_pad, remaining(s))
                if n > 0:
                    toks[s, :n] = p[cursors[s] : cursors[s] + n]
                    pos_vec[s] = cursors[s]
                    cursors[s] += n
                    if remaining(s) == 0:  # last prompt token in chunk
                        lane[s] = n - 1
                        finishing.append(s)
                else:  # exhausted lane idles at its last position
                    pos_vec[s] = len(p) - 1
            for s in self.active:  # decode lanes ride along at lane 0
                toks[s, 0] = self.slot_token[s]
            nxt, self.cache = self._prefill(
                self.params, jnp.asarray(toks), self.cache,
                jnp.asarray(pos_vec), jnp.asarray(lane),
            )
            nxt_np = np.asarray(nxt)
            emitted.update(self._emit_active(nxt_np))
            for s in finishing:
                req, p = newly[s]
                self.slot_token[s] = int(nxt_np[s])
                self.slot_pos[s] = len(p)
                self.slot_remaining[s] = req.max_new_tokens
                self.active[s] = req
        return emitted

    def step(self) -> Dict[int, int]:
        """One engine iteration: admit (active slots keep emitting
        through admission passes), one joint decode step, emit.
        Returns {request_id: token} emitted this step."""
        emitted = dict(self._admit())
        if not self.active:
            return emitted
        tokens = jnp.asarray(self.slot_token)
        pos_vec = jnp.asarray(self.slot_pos)
        nxt, self.cache = self._decode(
            self.params, tokens, self.cache, pos_vec
        )
        for rid, tok in self._emit_active(np.asarray(nxt)).items():
            emitted[rid] = tok
        return emitted

    def step_n(self, n: int = 8) -> Dict[int, List[int]]:
        """Admit, then decode up to ``n`` tokens per slot in ONE device
        dispatch (device-side scan). Slots that hit their budget or EOS
        mid-chunk keep decoding on device; the host trims the overshoot.
        Returns {request_id: [tokens]} emitted this call."""
        emitted: Dict[int, List[int]] = {
            rid: [tok] for rid, tok in self._admit().items()
        }
        if not self.active:
            return emitted
        # NOT bounded by min(slot_remaining): a nearly-done slot would
        # collapse everyone's chunk to 1. Slots past their budget decode
        # overshoot garbage on device (host trims); their writes land at
        # positions >= their cursor, which the admission invariant already
        # treats as scratch. The S bound still applies to every lane —
        # clamped writes at S-1 only touch future (scratch) positions.
        n_eff = min(
            n,
            int(self.S - 1 - max(self.slot_pos[s] for s in self.active)),
        )
        if n_eff < 1:
            for rid, tok in self.step().items():
                emitted.setdefault(rid, []).append(tok)
            return emitted
        toks, self.cache = self._decode_n(
            self.params,
            jnp.asarray(self.slot_token),
            self.cache,
            jnp.asarray(self.slot_pos),
            n_eff,
        )
        toks_np = np.asarray(toks)
        for slot, req in list(self.active.items()):
            seq = [int(self.slot_token[slot])] + [
                int(t) for t in toks_np[slot, : n_eff - 1]
            ]
            if req.eos_id is not None and req.eos_id in seq:
                seq = seq[: seq.index(req.eos_id) + 1]
            take = min(len(seq), int(self.slot_remaining[slot]))
            seq = seq[:take]
            req.output.extend(seq)
            emitted.setdefault(req.request_id, []).extend(seq)
            self.slot_pos[slot] += len(seq)
            self.slot_remaining[slot] -= len(seq)
            self.slot_token[slot] = int(toks_np[slot, len(seq) - 1])
            done = self.slot_remaining[slot] <= 0 or (
                req.eos_id is not None and seq and seq[-1] == req.eos_id
            )
            if done:
                self.completed.append(req)
                del self.active[slot]
        return emitted

    # ------------------------------------------------------------------
    # Disaggregated prefill (prefill-replica → decode-replica handoff)
    # ------------------------------------------------------------------
    def _slot_xfer_programs(self):
        if not hasattr(self, "_slot_export"):
            @jax.jit
            def export(cache, slot):
                return jax.tree_util.tree_map(
                    lambda leaf: jax.lax.dynamic_slice_in_dim(
                        leaf, slot, 1, axis=1
                    ),
                    cache,
                )

            @functools.partial(jax.jit, donate_argnums=(0,))
            def imprt(cache, rows, slot):
                def put(leaf, row):
                    start = (0, slot) + (0,) * (leaf.ndim - 2)
                    return jax.lax.dynamic_update_slice(
                        leaf, row.astype(leaf.dtype), start
                    )

                return jax.tree_util.tree_map(put, cache, rows)

            self._slot_export = export
            self._slot_import = imprt
        return self._slot_export, self._slot_import

    def prefill_request(self, req: Request) -> Dict:
        """Disaggregated-prefill producer: chunk-prefill ``req`` into a
        free slot, sample its first token, then EXPORT the slot's KV
        rows + cursor state and free the slot (no decode step runs
        here). The returned state dict feeds
        :meth:`adopt_prefilled` on a decode replica — on a pod this is
        the KV shipment over ICI/DCN; in-process it is an array copy.

        Greedy (temperature=0) streams are bit-identical to a
        non-disaggregated run; sampled streams are deterministic per
        (replica, slot, position) keying as always."""
        assert not self.active and not self.queue, (
            "prefill_request is for DEDICATED prefill replicas "
            "(one request at a time, no resident decoders)"
        )
        req.request_id = next(self._ids)
        req.output = []
        self.queue.append(req)
        self._admit()
        slot = next(
            s for s, r in self.active.items() if r is req
        )
        export, _ = self._slot_xfer_programs()
        kv = export(self.cache, jnp.int32(slot))
        state = {
            "kv": kv,                                  # leaves [L, 1, ...]
            "token": int(self.slot_token[slot]),       # first sampled tok
            "pos": int(self.slot_pos[slot]),           # == len(prompt)
            "request": req,
        }
        del self.active[slot]
        return state

    def free_slots(self) -> List[int]:
        return [s for s in range(self.B) if s not in self.active]

    def adopt_prefilled(self, state: Dict) -> int:
        """Disaggregated-prefill consumer: install an exported KV slot
        state into a free local slot and start decoding it."""
        free = self.free_slots()
        assert free, "no free slot"
        slot = free[0]
        req = state["request"]
        _, imprt = self._slot_xfer_programs()
        self.cache = imprt(self.cache, state["kv"], jnp.int32(slot))
        self.slot_token[slot] = state["token"]
        self.slot_pos[slot] = state["pos"]
        self.slot_remaining[slot] = req.max_new_tokens
        self.active[slot] = req
        return slot

    def run_to_completion(
        self, max_steps: int = 10_000, chunk: int = 0
    ) -> List[Request]:
        """``chunk=0``: host-stepped (exact per-token control).
        ``chunk=n``: device-side n-step decode chunks (fewer dispatches;
        EOS honored with on-host trim)."""
        for _ in range(max_steps):
            if not self.queue and not self.active:
                break
            if chunk > 1:
                self.step_n(chunk)
            else:
                self.step()
        return self.completed
