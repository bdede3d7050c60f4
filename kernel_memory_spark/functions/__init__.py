from kernel_memory_spark.functions.tokenizers import (
    NCharTokenizer,
    OneCharTokenizer,
    TwoCharsTokenizer,
    FourCharsTokenizer,
    WordTokenizer,
    default_tokenizer,
)
from kernel_memory_spark.functions.chunker import (
    MarkDownChunker,
    PlainTextChunker,
    PlainTextChunkerOptions,
    SeparatorTrie,
)

__all__ = [
    "NCharTokenizer",
    "OneCharTokenizer",
    "TwoCharsTokenizer",
    "FourCharsTokenizer",
    "WordTokenizer",
    "default_tokenizer",
    "MarkDownChunker",
    "PlainTextChunker",
    "PlainTextChunkerOptions",
    "SeparatorTrie",
]
