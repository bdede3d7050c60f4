"""Deterministic tokenizers mirroring the reference's ITextTokenizer surface.

The reference ships CL100K BPE as the production tokenizer
(archived/km-v1/extensions/Tiktoken/Tiktoken/CL100KTokenizer.cs:9) and
N-char test tokenizers used by the chunker golden tests
(archived/km-v1/extensions/Chunkers/Chunkers.UnitTests/Helpers/
FourCharsTestTokenizer.cs:9-31 — token count = ceil(len/N), tokens are
N-char slices).  tiktoken is not available in this sandbox, so the default
production tokenizer is a deterministic regex word tokenizer; the N-char
tokenizers are bit-compatible with the reference test helpers.
"""

from __future__ import annotations

import math
import re
from typing import List


class Tokenizer:
    """Protocol: count_tokens(str) -> int, get_tokens(str) -> list[str]."""

    def count_tokens(self, text: str) -> int:  # pragma: no cover - interface
        raise NotImplementedError

    def get_tokens(self, text: str) -> List[str]:  # pragma: no cover
        raise NotImplementedError


class NCharTokenizer(Tokenizer):
    """Token = fixed-width slice of N chars; count = ceil(len/N).

    Bit-compatible with the reference's {One,Two,Four}CharsTestTokenizer.
    """

    def __init__(self, n: int):
        if n < 1:
            raise ValueError("n must be >= 1")
        self.n = n

    def count_tokens(self, text: str) -> int:
        return math.ceil(len(text) / self.n)

    def get_tokens(self, text: str) -> List[str]:
        n = self.n
        return [text[i : i + n] for i in range(0, len(text), n)]


def OneCharTokenizer() -> NCharTokenizer:
    return NCharTokenizer(1)


def TwoCharsTokenizer() -> NCharTokenizer:
    return NCharTokenizer(2)


def FourCharsTokenizer() -> NCharTokenizer:
    return NCharTokenizer(4)


# BPE-ish word splitter: words, numbers, single punctuation, whitespace runs.
_WORD_RE = re.compile(r"\w+|[^\w\s]|\s+", re.UNICODE)


class WordTokenizer(Tokenizer):
    """Deterministic regex tokenizer approximating BPE granularity.

    Splits into word / punctuation / whitespace runs so that
    ``"".join(get_tokens(s)) == s`` (required by the overlap copy in the
    chunker, PlainTextChunker.cs:160-164).
    """

    def count_tokens(self, text: str) -> int:
        return len(_WORD_RE.findall(text))

    def get_tokens(self, text: str) -> List[str]:
        return _WORD_RE.findall(text)


# ---------------------------------------------------------------------------
# Real BPE (the CL100KTokenizer.cs production path). tiktoken and its
# ~1.6MB cl100k_base rank table are not shipped in this sandbox and cannot
# be fetched offline, so the ENCODER is implemented from scratch here
# (standard byte-pair-merge over a rank table — public algorithm) and the
# DATA loads from any tiktoken-format rank file:
#     <base64 token bytes> <rank>\n
# pointed to by $KMS_CL100K_RANKS (or passed explicitly). Drop the MIT-
# licensed cl100k_base.tiktoken next to a deployment and the production
# tokenizer is exact CL100K; the encoder itself is exercised in tests with
# a small synthetic rank table.
# ---------------------------------------------------------------------------

# cl100k_base pre-tokenization pattern (public, from the tiktoken model
# registry); needs the `regex` module for \p classes + possessive match
_CL100K_PATTERN = (
    r"""'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}"""
    r"""| ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+"""
)


def _bpe_merge(piece: bytes, ranks) -> List[bytes]:
    """Standard greedy byte-pair merge: repeatedly fuse the adjacent pair
    with the lowest rank until no mergeable pair remains."""
    parts = [piece[i: i + 1] for i in range(len(piece))]
    while len(parts) > 1:
        best_rank, best_i = None, None
        for i in range(len(parts) - 1):
            r = ranks.get(parts[i] + parts[i + 1])
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        parts[best_i: best_i + 2] = [parts[best_i] + parts[best_i + 1]]
    return parts


def load_ranks(path: str) -> dict:
    """Parse a tiktoken-format rank file: 'base64(token) rank' per line."""
    import base64

    ranks = {}
    with open(path, "rb") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            token_b64, rank = line.split()
            ranks[base64.b64decode(token_b64)] = int(rank)
    return ranks


class BpeTokenizer(Tokenizer):
    """Byte-pair encoder over a tiktoken-format rank table, with the
    cl100k pre-split pattern. With the real cl100k_base ranks this IS
    CL100K (CL100KTokenizer.cs:9); with any other table it is that
    table's BPE. Unknown single bytes (absent from the table) count as
    one token each, so count_tokens never fails on arbitrary input."""

    def __init__(self, ranks: dict, pattern: str = _CL100K_PATTERN):
        import regex

        self._ranks = ranks
        self._re = regex.compile(pattern)

    @classmethod
    def from_file(cls, path: str) -> "BpeTokenizer":
        return cls(load_ranks(path))

    def _encode_bytes(self, text: str) -> List[bytes]:
        out: List[bytes] = []
        for piece in self._re.findall(text):
            b = piece.encode("utf-8")
            if b in self._ranks:
                out.append(b)
            else:
                out.extend(_bpe_merge(b, self._ranks))
        return out

    def encode(self, text: str) -> List[int]:
        """Token ids (unknown single bytes map to -1)."""
        return [self._ranks.get(b, -1) for b in self._encode_bytes(text)]

    def count_tokens(self, text: str) -> int:
        return len(self._encode_bytes(text))

    def get_tokens(self, text: str) -> List[str]:
        # byte-level tokens may split UTF-8 sequences; replace-decode keeps
        # the join-invariant only for ASCII — counting is the primary use
        return [b.decode("utf-8", "replace") for b in self._encode_bytes(text)]


def default_tokenizer() -> Tokenizer:
    """CL100K when the data is present (tiktoken package, else a rank file
    at $KMS_CL100K_RANKS via the from-scratch BPE), else the regex word
    tokenizer."""
    try:  # pragma: no cover - tiktoken absent in sandbox
        import tiktoken

        enc = tiktoken.get_encoding("cl100k_base")

        class _Tik(Tokenizer):
            def count_tokens(self, text: str) -> int:
                return len(enc.encode(text))

            def get_tokens(self, text: str) -> List[str]:
                return [enc.decode([t]) for t in enc.encode(text)]

        return _Tik()
    except Exception:
        pass
    import os

    ranks_path = os.environ.get("KMS_CL100K_RANKS")
    if ranks_path and os.path.exists(ranks_path):
        try:
            return BpeTokenizer.from_file(ranks_path)
        except Exception:  # pragma: no cover - malformed table
            pass
    return WordTokenizer()
