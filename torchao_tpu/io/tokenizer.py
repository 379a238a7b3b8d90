"""tiktoken-compatible BPE tokenizer (native merge core + Python presplit).

Covers the reference harness's tokenizer dependency (gpt-fast loads
tiktoken for Llama-3, sentencepiece for Llama-2 —
``_models/llama/generate.py`` / ``tokenizer.py``) without external
packages: the unicode regex presplit runs in Python (``regex`` module,
Llama-3's exact pattern), and the per-piece byte-pair merge loop runs in
C++ (``csrc/bpe_tokenizer.cpp``, built on demand like the checkpoint
loader) with a pure-Python fallback implementing the identical algorithm.

Vocabulary format: tiktoken ``.model`` files — lines of
``<base64 token bytes> <rank>`` — plus a special-tokens dict (Llama-3's
defaults provided).
"""

from __future__ import annotations

import base64
import ctypes
import os
import struct
import subprocess
from typing import Dict, List, Optional, Sequence

# Llama-3's tiktoken presplit pattern (public, tiktoken model card)
LLAMA3_PATTERN = (
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|"
    r"[^\r\n\p{L}\p{N}]?\p{L}+|"
    r"\p{N}{1,3}|"
    r" ?[^\s\p{L}\p{N}]+[\r\n]*|"
    r"\s*[\r\n]+|"
    r"\s+(?!\S)|"
    r"\s+"
)

LLAMA3_SPECIAL_TOKENS = [
    "<|begin_of_text|>", "<|end_of_text|>",
    "<|reserved_special_token_0|>", "<|reserved_special_token_1|>",
    "<|finetune_right_pad_id|>", "<|step_id|>",
    "<|start_header_id|>", "<|end_header_id|>",
    "<|eom_id|>", "<|eot_id|>", "<|python_tag|>",
] + [f"<|reserved_special_token_{i}|>" for i in range(2, 247)]

_LIB = None
_LIB_TRIED = False


def _repo_root() -> str:
    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def _native_lib():
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if os.environ.get("TORCHAO_TPU_DISABLE_NATIVE_BPE") == "1":
        return None
    src = os.path.join(_repo_root(), "csrc", "bpe_tokenizer.cpp")
    so = os.path.join(_repo_root(), "csrc", "libtq_bpe.so")
    try:
        if (not os.path.exists(so)) or (
            os.path.getmtime(so) < os.path.getmtime(src)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.tq_bpe_new.restype = ctypes.c_void_p
        lib.tq_bpe_new.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.tq_bpe_free.argtypes = [ctypes.c_void_p]
        lib.tq_bpe_encode.restype = ctypes.c_int32
        lib.tq_bpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _bpe_merge_py(
    ranks: Dict[bytes, int], piece: bytes
) -> List[int]:
    """Pure-Python tiktoken byte_pair_merge — the oracle for the C++
    core and the fallback when no toolchain exists."""
    if piece in ranks:
        return [ranks[piece]]
    parts = [piece[i : i + 1] for i in range(len(piece))]
    while len(parts) > 1:
        best, best_rank = None, None
        for i in range(len(parts) - 1):
            r = ranks.get(parts[i] + parts[i + 1])
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = i, r
        if best is None:
            break
        parts[best : best + 2] = [parts[best] + parts[best + 1]]
    return [ranks[p] for p in parts]


class BpeTokenizer:
    """Byte-level BPE with tiktoken merge semantics.

    ``mergeable_ranks``: dict bytes -> rank (must contain all 256 single
    bytes for lossless coverage). ``special_tokens``: str -> id.
    """

    def __init__(
        self,
        mergeable_ranks: Dict[bytes, int],
        special_tokens: Optional[Dict[str, int]] = None,
        pattern: str = LLAMA3_PATTERN,
    ):
        import regex

        self.ranks = dict(mergeable_ranks)
        self.special_tokens = dict(special_tokens or {})
        self._pat = regex.compile(pattern)
        self._special_pat = None
        if self.special_tokens:
            self._special_pat = regex.compile(
                "|".join(
                    regex.escape(t) for t in sorted(
                        self.special_tokens, key=len, reverse=True
                    )
                )
            )
        # id -> bytes for decode
        self._id_to_bytes: Dict[int, bytes] = {
            r: b for b, r in self.ranks.items()
        }
        for t, i in self.special_tokens.items():
            self._id_to_bytes[i] = t.encode()

        self._handle = None
        lib = _native_lib()
        if lib is not None:
            ordered = sorted(self.ranks.items(), key=lambda kv: kv[1])
            # dense rank check: the C++ core indexes by record order
            if all(r == i for i, (_, r) in enumerate(ordered)):
                blob = b"".join(
                    struct.pack("<I", len(tok)) + tok for tok, _ in ordered
                )
                self._blob = blob  # keep alive
                self._handle = lib.tq_bpe_new(blob, len(blob))
                self._lib = lib

    # ------------------------------------------------------------------
    @classmethod
    def from_tiktoken_file(
        cls, path: str, special_tokens: Optional[Sequence[str]] = None,
    ) -> "BpeTokenizer":
        """Load a tiktoken ``.model`` file (``<base64> <rank>`` lines) —
        the format Llama-3 ships (reference ``_models/llama/tokenizer.py``
        TiktokenWrapper)."""
        ranks: Dict[bytes, int] = {}
        with open(path, "rb") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                tok_b64, rank = line.split()
                ranks[base64.b64decode(tok_b64)] = int(rank)
        n = len(ranks)
        names = list(special_tokens or LLAMA3_SPECIAL_TOKENS)
        specials = {t: n + i for i, t in enumerate(names)}
        return cls(ranks, specials)

    # ------------------------------------------------------------------
    def _encode_piece(self, piece: bytes) -> List[int]:
        if self._handle is not None:
            cap = max(16, 2 * len(piece))
            out = (ctypes.c_int32 * cap)()
            n = self._lib.tq_bpe_encode(
                self._handle, piece, len(piece), out, cap
            )
            if n >= 0:
                return list(out[:n])
        return _bpe_merge_py(self.ranks, piece)

    def encode(
        self, text: str, *, allow_special: bool = False
    ) -> List[int]:
        """Encode text to ids. ``allow_special=False`` (default, tiktoken
        parity): special-token strings inside the text are encoded as
        plain bytes, so prompt content can't inject control tokens; pass
        True for template strings that intentionally contain specials."""
        ids: List[int] = []
        segments = [(text, None)]
        if allow_special and self._special_pat is not None:
            segments = []
            pos = 0
            for m in self._special_pat.finditer(text):
                if m.start() > pos:
                    segments.append((text[pos : m.start()], None))
                segments.append((None, self.special_tokens[m.group()]))
                pos = m.end()
            if pos < len(text):
                segments.append((text[pos:], None))
        for seg, special_id in segments:
            if special_id is not None:
                ids.append(special_id)
                continue
            for m in self._pat.finditer(seg):
                ids.extend(self._encode_piece(m.group().encode("utf-8")))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        data = b"".join(self._id_to_bytes[int(i)] for i in ids)
        return data.decode("utf-8", errors="replace")

    @property
    def vocab_size(self) -> int:
        return len(self.ranks) + len(self.special_tokens)

    def __del__(self):  # pragma: no cover
        h = getattr(self, "_handle", None)
        if h is not None:
            try:
                self._lib.tq_bpe_free(h)
            except Exception:
                pass


def train_byte_bpe(
    corpus: Sequence[bytes], vocab_size: int
) -> Dict[bytes, int]:
    """Tiny BPE trainer (for tests/demos — builds a merge-consistent rank
    table the same way GPT-2-style vocabularies are constructed: all 256
    bytes first, then greedy most-frequent adjacent pairs)."""
    ranks: Dict[bytes, int] = {bytes([i]): i for i in range(256)}
    words = [[bytes([b]) for b in w] for w in corpus]
    while len(ranks) < vocab_size:
        counts: Dict[bytes, int] = {}
        for w in words:
            for a, b in zip(w, w[1:]):
                counts[a + b] = counts.get(a + b, 0) + 1
        counts = {p: c for p, c in counts.items() if p not in ranks}
        if not counts:
            break
        best = max(counts, key=lambda p: (counts[p], -len(p)))
        ranks[best] = len(ranks)
        new_words = []
        for w in words:
            out, i = [], 0
            while i < len(w):
                if i + 1 < len(w) and w[i] + w[i + 1] == best:
                    out.append(best)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_words.append(out)
        words = new_words
    return ranks
