"""BPE tokenizer: C++ merge core vs pure-Python oracle, roundtrips,
tiktoken-file loading, special tokens."""

import base64
import os
import random
import string

import numpy as np
import pytest

from torchao_tpu.io.tokenizer import (
    BpeTokenizer,
    LLAMA3_PATTERN,
    _bpe_merge_py,
    _native_lib,
    train_byte_bpe,
)

CORPUS = [
    w.encode()
    for w in (
        "the quick brown fox jumps over the lazy dog "
        "pack my box with five dozen liquor jugs "
        "tokenization is the first step of every language model"
    ).split()
]


@pytest.fixture(scope="module")
def ranks():
    return train_byte_bpe(CORPUS, 256 + 64)


@pytest.fixture(scope="module")
def tok(ranks):
    return BpeTokenizer(ranks, {"<|eot|>": len(ranks)})


class TestMergeCore:
    def test_native_lib_builds(self):
        assert _native_lib() is not None, "g++ build of bpe core failed"

    def test_cpp_matches_python_oracle(self, tok, ranks):
        if tok._handle is None:
            pytest.skip("native core unavailable")
        rng = random.Random(0)
        for _ in range(200):
            n = rng.randint(1, 24)
            piece = bytes(
                rng.choice(
                    string.ascii_lowercase + " "
                ).encode()[0]
                for _ in range(n)
            )
            assert tok._encode_piece(piece) == _bpe_merge_py(ranks, piece), piece

    def test_merge_prefers_lowest_rank(self, ranks):
        # "the" must tokenize via its learned merges, not byte-by-byte
        ids = _bpe_merge_py(ranks, b"the")
        assert len(ids) < 3


class TestTokenizer:
    def test_roundtrip_ascii(self, tok):
        s = "the quick brown fox, 12345 jumps!  over\nthe lazy dog"
        assert tok.decode(tok.encode(s)) == s

    def test_roundtrip_unicode(self, tok):
        s = "héllo wörld — 数理モデル 🙂"
        assert tok.decode(tok.encode(s)) == s

    def test_special_tokens(self, tok):
        ids = tok.encode("the<|eot|>dog", allow_special=True)
        assert tok.special_tokens["<|eot|>"] in ids
        assert tok.decode(ids) == "the<|eot|>dog"
        # default (tiktoken parity): specials in plain text are NOT
        # converted to control ids — no prompt injection
        plain = tok.encode("the<|eot|>dog")
        assert tok.special_tokens["<|eot|>"] not in plain
        assert tok.decode(plain) == "the<|eot|>dog"

    def test_compression(self, tok):
        s = "the the the the the"
        assert len(tok.encode(s)) < len(s.encode())

    def test_python_fallback_matches(self, ranks, monkeypatch):
        import torchao_tpu.io.tokenizer as T

        monkeypatch.setattr(T, "_native_lib", lambda: None)
        t_py = BpeTokenizer(ranks)
        t = BpeTokenizer(ranks)
        s = "tokenization is the first step 123"
        assert t_py.encode(s) == t.encode(s)

    def test_tiktoken_file_loading(self, ranks, tmp_path):
        path = tmp_path / "toy.model"
        with open(path, "wb") as f:
            for tok_bytes, rank in sorted(ranks.items(), key=lambda kv: kv[1]):
                f.write(base64.b64encode(tok_bytes) + b" %d\n" % rank)
        t = BpeTokenizer.from_tiktoken_file(str(path))
        assert t.special_tokens["<|begin_of_text|>"] == len(ranks)
        s = "the quick brown fox"
        assert t.decode(t.encode(s)) == s

    def test_llama3_pattern_presplit(self, ranks):
        import regex

        pat = regex.compile(LLAMA3_PATTERN)
        pieces = [m.group() for m in pat.finditer("I'll see 1234 dogs, ok?\n")]
        assert "".join(pieces) == "I'll see 1234 dogs, ok?\n"
        assert "'ll" in pieces       # contraction split
        assert "123" in pieces       # numbers chunked to <=3 digits
