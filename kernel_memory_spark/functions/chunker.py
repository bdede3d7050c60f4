"""Recursive hierarchical plain-text chunker.

Re-expresses, in Python, the algorithm of the reference's PlainTextChunker
(archived/km-v1/extensions/Chunkers/Chunkers/PlainTextChunker.cs:119-449):

- 5 prioritized separator tiers (explicit sentence enders incl. Chinese
  punctuation; potential ``;})]``; weak1 ``:,``; weak2 whitespace/quotes;
  weak3 ``_-|@=``), matched longest-first with a trie
  (internals/SeparatorTrie.cs:10-67);
- greedy 4-state chunk assembly (PlainTextChunker.cs:239-378) with recursive
  descent to weaker separators for over-long sentences;
- first-chunk vs. rest sizing for overlap headroom (:144-147);
- token-level overlap copy from the previous chunk (:154-167);
- optional chunk header (:169-173); MinChunkSize=5 (:45);
- ``\\r\\n``/``\\r`` -> ``\\n`` normalization + trim
  (Abstractions/Text/StringExtensions.cs:7-66).

Golden-tested against the expectations of PlainTextChunkerTest.cs (924 LoC)
using the bit-compatible N-char tokenizers.

In the Spark pipeline this runs inside an Arrow-vectorized pandas UDF over
one document per row (operators/partition.py) — chunking is embarrassingly
parallel across documents, so the per-doc Python cost rides on Spark's task
parallelism and never shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

from kernel_memory_spark.functions.tokenizers import Tokenizer, default_tokenizer

MIN_CHUNK_SIZE = 5  # PlainTextChunker.cs:45

# Separator tiers (PlainTextChunker.cs:50-106). Order inside a tier does not
# matter (the trie matches longest), tier order does.
EXPLICIT_SEPARATORS = [
    ". ", ".\t", ".\n", "\n\n",
    "? ", "?\t", "?\n",
    "! ", "!\t", "!\n",
    "⁉ ", "⁉\t", "⁉\n",
    "⁈ ", "⁈\t", "⁈\n",
    "⁇ ", "⁇\t", "⁇\n",
    "… ", "…\t", "…\n",
    "!!!!", "????", "!!!", "???", "?!?", "!?!", "!?", "?!", "!!", "??",
    "....", "...", "..",
    ".", "?", "!", "⁉", "⁈", "⁇", "…",
    "。", "？", "！", "；", "：",
]

POTENTIAL_SEPARATORS = [
    "; ", ";\t", ";\n", ";",
    "} ", "}\t", "}\n", "}",
    ") ", ")\t", ")\n",
    "] ", "]\t", "]\n",
    ")", "]",
    "，", "、", "（", "）", "【", "】",
    "《", "》", "「", "」", "『", "』",
]

WEAK_SEPARATORS_1 = [": ", ":", ", ", ",", "：", "，"]

WEAK_SEPARATORS_2 = [
    "\n", "\t", "' ", "'", '" ', '"', " ",
    "“", "”", "‘", "’",
]

WEAK_SEPARATORS_3 = ["_", "-", "|", "@", "=", "·", "—", "～"]


class SeparatorTrie:
    """Longest-match multi-string matcher (internals/SeparatorTrie.cs)."""

    __slots__ = ("_root",)
    _END = 0  # key for terminal marker inside a node dict

    def __init__(self, separators):
        root: dict = {}
        for sep in separators:
            node = root
            for ch in sep:
                node = node.setdefault(ch, {})
            node[self._END] = sep
        self._root = root

    def match_longest(self, text: str, start: int) -> Optional[str]:
        node = self._root
        longest = None
        for i in range(start, len(text)):
            node = node.get(text[i])
            if node is None:
                break
            found = node.get(self._END)
            if found is not None:
                longest = found
        return longest


_TRIES = [
    SeparatorTrie(EXPLICIT_SEPARATORS),
    SeparatorTrie(POTENTIAL_SEPARATORS),
    SeparatorTrie(WEAK_SEPARATORS_1),
    SeparatorTrie(WEAK_SEPARATORS_2),
    SeparatorTrie(WEAK_SEPARATORS_3),
    None,  # NotASeparator: every char is a fragment
]

# Markdown separator tiers (MarkDownChunker.cs:50-124): structure first
# (headings, hr, blockquotes, lists, fences, tables/links), prose later.
MD_EXPLICIT_SEPARATORS = [
    ".\n\n", "!\n\n", "!!\n\n", "!!!\n\n", "?\n\n", "??\n\n", "???\n\n",
    "\n\n", "\n#", "\n##", "\n###", "\n####", "\n#####", "\n---",
]

MD_POTENTIAL_SEPARATORS = [
    "\n> ", "\n>- ", "\n>* ",
    "\n1. ", "\n2. ", "\n3. ", "\n4. ", "\n5. ",
    "\n6. ", "\n7. ", "\n8. ", "\n9. ", "\n10. ",
    "\n```",
]

MD_WEAK_SEPARATORS_1 = ["![", "[", "| ", " |\n", "-|\n", "\n: "]

MD_WEAK_SEPARATORS_2 = [
    ". ", ".\t", ".\n",
    "? ", "?\t", "?\n",
    "! ", "!\t", "!\n",
    "⁉ ", "⁉\t", "⁉\n",
    "⁈ ", "⁈\t", "⁈\n",
    "⁇ ", "⁇\t", "⁇\n",
    "… ", "…\t", "…\n",
    "!!!!", "????", "!!!", "???", "?!?", "!?!", "!?", "?!", "!!", "??",
    "....", "...", "..",
    ".", "?", "!", "⁉", "⁈", "⁇", "…",
]

MD_WEAK_SEPARATORS_3 = [
    "; ", ";\t", ";\n", ";",
    "} ", "}\t", "}\n", "}",
    ") ", ")\t", ")\n",
    "] ", "]\t", "]\n",
    ")", "]",
    ": ", ":",
    ", ", ",",
    "\n",
]

_MD_TRIES = [
    SeparatorTrie(MD_EXPLICIT_SEPARATORS),
    SeparatorTrie(MD_POTENTIAL_SEPARATORS),
    SeparatorTrie(MD_WEAK_SEPARATORS_1),
    SeparatorTrie(MD_WEAK_SEPARATORS_2),
    SeparatorTrie(MD_WEAK_SEPARATORS_3),
    None,
]


def normalize_newlines(text: str, trim: bool = False) -> str:
    """StringExtensions.NormalizeNewlines: \\r\\n|\\r -> \\n, optional trim."""
    if not text:
        return text
    out = text.replace("\r\n", "\n").replace("\r", "\n")
    return out.strip() if trim else out


@dataclass
class PlainTextChunkerOptions:
    """PlainTextChunkerOptions.cs:9-37 (defaults 1024 / 0 / None)."""

    max_tokens_per_chunk: int = 1024
    overlap: int = 0
    chunk_header: Optional[str] = None

    def __post_init__(self):
        if self.max_tokens_per_chunk <= 0:
            raise ValueError("max_tokens_per_chunk must be > 0")
        if self.overlap < 0:
            raise ValueError("overlap must be >= 0")


class _State:
    __slots__ = ("first_chunk_done",)

    def __init__(self):
        self.first_chunk_done = False


class PlainTextChunker:
    """Split plain text into chunks of at most N tokens (lossless concat)."""

    def __init__(self, tokenizer: Optional[Tokenizer] = None, tries=None):
        self._tokenizer = tokenizer or default_tokenizer()
        self._tries = tries or _TRIES

    # -- public API --------------------------------------------------------

    def split(self, text: str, options=None, **kwargs) -> List[str]:
        if options is None:
            options = PlainTextChunkerOptions(**kwargs)
        elif isinstance(options, int):
            options = PlainTextChunkerOptions(max_tokens_per_chunk=options)

        text = normalize_newlines(text, trim=True)

        header_size = self._count(options.chunk_header)
        max_chunk1 = max(MIN_CHUNK_SIZE, options.max_tokens_per_chunk - header_size)
        max_chunk_n = max(
            MIN_CHUNK_SIZE,
            options.max_tokens_per_chunk - header_size - options.overlap,
        )

        state = _State()
        chunks = self._recursive_split(text, max_chunk1, max_chunk_n, 0, state)

        if options.overlap > 0 and len(chunks) > 1:
            with_overlap = [chunks[0]]
            for i in range(1, len(chunks)):
                prev_tokens = self._tokenizer.get_tokens(chunks[i - 1])
                tail = prev_tokens[max(0, len(prev_tokens) - options.overlap):]
                with_overlap.append("".join(tail) + chunks[i])
            chunks = with_overlap

        if options.chunk_header:
            chunks = [options.chunk_header + c for c in chunks]

        return chunks

    # -- internals ---------------------------------------------------------

    def _count(self, text: Optional[str]) -> int:
        return 0 if not text else self._tokenizer.count_tokens(text)

    def _recursive_split(
        self, text: str, max1: int, max_n: int, tier: int, st: _State
    ) -> List[str]:
        if not text:
            return []
        max_chunk = max_n if st.first_chunk_done else max1
        if self._count(text) <= max_chunk:
            return [text]
        fragments = split_to_fragments(text, self._tries[tier])
        return self._generate_chunks(fragments, max1, max_n, tier, st)

    def _generate_chunks(
        self,
        fragments: List[Tuple[str, bool]],
        max1: int,
        max_n: int,
        tier: int,
        st: _State,
    ) -> List[str]:
        if not fragments:
            return []

        chunks: List[str] = []
        full: List[str] = []      # chunk.FullContent
        full_len = 0              # char length of FullContent
        nxt: List[str] = []       # chunk.NextSentence

        for content, is_sep in fragments:
            nxt.append(content)
            if not is_sep:
                continue

            next_sentence = "".join(nxt)
            ns_size = self._count(next_sentence)
            max_chunk = max_n if st.first_chunk_done else max1

            if full_len == 0:
                if ns_size <= max_chunk:
                    # state 1: empty chunk, sentence fits
                    full.append(next_sentence)
                    full_len += len(next_sentence)
                    nxt = []
                else:
                    # state 2: empty chunk, sentence too long -> descend
                    more = self._recursive_split(
                        next_sentence, max1, max_n, tier + 1, st
                    )
                    chunks.extend(more[:-1])
                    nxt = [more[-1]]
            else:
                if ns_size <= max_chunk:
                    # state 3: non-empty chunk, sentence fits
                    candidate = "".join(full) + next_sentence
                    if self._count(candidate) <= max_chunk:
                        full.append(next_sentence)
                        full_len += len(next_sentence)
                    else:
                        chunks.append("".join(full))
                        st.first_chunk_done = True
                        full = [next_sentence]
                        full_len = len(next_sentence)
                    nxt = []
                else:
                    # state 4: non-empty chunk, sentence too long
                    chunks.append("".join(full))
                    st.first_chunk_done = True
                    full = []
                    full_len = 0
                    more = self._recursive_split(
                        next_sentence, max1, max_n, tier + 1, st
                    )
                    chunks.extend(more[:-1])
                    nxt = [more[-1]]

        # leftover buffers (PlainTextChunker.cs:344-375)
        full_left = "".join(full)
        next_left = "".join(nxt)
        max_chunk = max_n if st.first_chunk_done else max1

        if full_left or next_left:
            if self._count(full_left + next_left) <= max_chunk:
                chunks.append(full_left + next_left)
                st.first_chunk_done = True
            else:
                if full_left:
                    chunks.append(full_left)
                    st.first_chunk_done = True
                if next_left:
                    # strict < in the reference (:364)
                    if self._count(next_left) < max_chunk:
                        chunks.append(next_left)
                        st.first_chunk_done = True
                    else:
                        chunks.extend(
                            self._recursive_split(next_left, max1, max_n, tier + 1, st)
                        )

        return chunks


def split_to_fragments(
    text: str, separators: Optional[SeparatorTrie]
) -> List[Tuple[str, bool]]:
    """Split text into (content, is_separator) fragments.

    ``separators is None`` (NotASeparator tier) makes every char a separator
    fragment (PlainTextChunker.cs:386-389).
    """
    if separators is None:
        return [(ch, True) for ch in text]
    if not text:
        return []

    fragments: List[Tuple[str, bool]] = []
    buf: List[str] = []
    i = 0
    n = len(text)
    while i < n:
        sep = separators.match_longest(text, i)
        if sep is not None:
            if buf:
                fragments.append(("".join(buf), False))
                buf = []
            fragments.append((sep, True))
            i += len(sep)
        else:
            buf.append(text[i])
            i += 1
    if buf:
        fragments.append(("".join(buf), False))
    return fragments


class MarkDownChunker(PlainTextChunker):
    """Markdown-aware chunker: identical recursion/assembly algorithm with
    markdown separator tiers (MarkDownChunker.cs:31-124 — structure first:
    headings/hr, blockquotes/lists/fences, tables/links, then prose)."""

    def __init__(self, tokenizer: Optional[Tokenizer] = None):
        super().__init__(tokenizer, tries=_MD_TRIES)
