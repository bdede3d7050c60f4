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


def default_tokenizer() -> Tokenizer:
    """CL100K via tiktoken when available, else the regex word tokenizer."""
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
        return WordTokenizer()
