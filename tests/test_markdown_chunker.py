"""Markdown chunker goldens ported from MarkDownChunkerTests.cs."""

from kernel_memory_spark.functions.chunker import MarkDownChunker
from kernel_memory_spark.functions.tokenizers import NCharTokenizer

chunker1 = MarkDownChunker(NCharTokenizer(1))
chunker2 = MarkDownChunker(NCharTokenizer(2))
chunker4 = MarkDownChunker(NCharTokenizer(4))


def test_can_split_markdown_paragraphs():  # :20-41
    text = " ".join([
        "This is a test of the emergency broadcast system. This is only a test.",
        "We repeat, this is only a test. A unit test.",
    ])
    assert chunker4.split(text, max_tokens_per_chunk=13) == [
        "This is a test of the emergency broadcast system. ",
        "This is only a test. ",
        "We repeat, this is only a test. A unit test.",
    ]


def test_can_split_markdown_lines():  # :75-88
    text = "This is a test of the emergency broadcast system. This is only a test."
    assert chunker4.split(text, max_tokens_per_chunk=15) == [
        "This is a test of the emergency broadcast system. ",
        "This is only a test.",
    ]


def test_empty_input():
    assert chunker2.split("", max_tokens_per_chunk=1) == []
    assert chunker4.split("", max_tokens_per_chunk=13) == []


def test_on_newlines_4_and_2():  # :110-150
    text = "\n".join([
        "This_is_a_test_of_the_emergency_broadcast_system\r\nThis_is_only_a_test",
        "We_repeat_this_is_only_a_test\nA_unit_test",
        "A_small_note\nAnd_another\r\nAnd_once_again\rSeriously_this_is_the_end\n"
        "We're_finished\nAll_set\nBye\n",
        "Done",
    ])
    assert chunker4.split(text, max_tokens_per_chunk=15) == [
        "This_is_a_test_of_the_emergency_broadcast_system\n",
        "This_is_only_a_test\nWe_repeat_this_is_only_a_test\n",
        "A_unit_test\nA_small_note\nAnd_another\nAnd_once_again\n",
        "Seriously_this_is_the_end\nWe're_finished\nAll_set\nBye\n\nDone",
    ]
    assert chunker2.split(text, max_tokens_per_chunk=30) == [
        "This_is_a_test_of_the_emergency_broadcast_system\n",
        "This_is_only_a_test\nWe_repeat_this_is_only_a_test\n",
        "A_unit_test\nA_small_note\nAnd_another\nAnd_once_again\n",
        "Seriously_this_is_the_end\nWe're_finished\nAll_set\nBye\n\nDone",
    ]


def test_custom_token_counter():  # :153-177
    text = "\n".join([
        "This is a test of the emergency broadcast system. This is only a test.",
        "We repeat, this is only a test. A unit test.",
    ])
    assert chunker1.split(text, max_tokens_per_chunk=52) == [
        "This is a test of the emergency broadcast system. ",
        "This is only a test.\n",
        "We repeat, this is only a test. A unit test.",
    ]


def test_overlap_and_custom_counter():  # :180-206
    text = "\n".join([
        "This is a test of the emergency broadcast system. This is only a test.",
        "We repeat, this is only a test. A unit test.",
    ])
    got = chunker1.split(text, max_tokens_per_chunk=75, overlap=40)
    assert "".join(c for c in got)  # sanity
    assert got[0] == (
        "This is a test of the emergency broadcast system. This is only a test.\n"
    )


def test_paragraphs_with_overlap():  # :46-70 CanSplitMarkdownParagraphsWithOverlap
    text = " ".join([
        "This is a test of the emergency broadcast system. This is only a test.",
        "We repeat, this is only a test. A unit test.",
    ])
    assert chunker4.split(text, max_tokens_per_chunk=15, overlap=8) == [
        "This is a test of the emergency broadcast system. ",
        "e emergency broadcast system. This is only a test. ",
        "This is only a test. We repeat, ",
        "We repeat, this is only a test. A unit ",
        "this is only a test. A unit test.",
    ]


def test_lines_with_custom_token_counter():  # :208-224
    text = "This is a test of the emergency broadcast system. This is only a test."
    assert chunker1.split(text, max_tokens_per_chunk=60) == [
        "This is a test of the emergency broadcast system. ",
        "This is only a test.",
    ]


def test_it_splits_markdown_lines():  # :229-243 ItSplitsMarkdownLines
    line = "This is a test of the emergency broadcast system. This is only a test."
    assert len(chunker4.split(line, max_tokens_per_chunk=20)) == 1
    assert len(chunker2.split(line, max_tokens_per_chunk=20)) == 2


HEADER = "DOCUMENT NAME: test.txt\n\n"


def test_paragraphs_with_header_cl100k():  # :248-271 (CL100K tokenizer)
    try:
        import tiktoken  # noqa: F401
    except ImportError:
        import pytest
        pytest.skip("tiktoken unavailable in this environment (C4 fallback)")
    from kernel_memory_spark.functions.tokenizers import default_tokenizer

    text = "\n".join([
        "This is a test of the emergency broadcast system. This is only a test.",
        "We repeat, this is only a test. A unit test.",
    ])
    got = MarkDownChunker(default_tokenizer()).split(
        text, max_tokens_per_chunk=20, chunk_header=HEADER
    )
    assert got == [
        HEADER + "This is a test of the emergency broadcast system. ",
        HEADER + "This is only a test.\n",
        HEADER + "We repeat, this is only a test. A unit test.",
    ]


def test_paragraphs_with_overlap_and_header():  # :276-302
    text = "\n".join([
        "This is a test of the emergency broadcast system. This is only a test.",
        "We repeat, this is only a test. A unit test.",
    ])
    got = chunker4.split(
        text, max_tokens_per_chunk=22, overlap=8, chunk_header=HEADER
    )
    assert got == [
        HEADER + "This is a test of the emergency broadcast system. ",
        HEADER + "e emergency broadcast system. This is only a test.\n",
        HEADER + "This is only a test.\nWe repeat, ",
        HEADER + "We repeat, this is only a test. A unit ",
        HEADER + "this is only a test. A unit test.",
    ]


def test_paragraphs_with_header_and_custom_counter():  # :307-330
    text = "\n".join([
        "This is a test of the emergency broadcast system. This is only a test.",
        "We repeat, this is only a test. A unit test.",
    ])
    got = chunker1.split(text, max_tokens_per_chunk=77, chunk_header=HEADER)
    assert got == [
        HEADER + "This is a test of the emergency broadcast system. ",
        HEADER + "This is only a test.\n",
        HEADER + "We repeat, this is only a test. A unit test.",
    ]


def test_paragraphs_with_overlap_header_and_custom_counter():  # :335-358
    text = "\n".join([
        "This is a test of the emergency broadcast system. This is only a test.",
        "We repeat, this is only a test. A unit test.",
    ])
    got = chunker1.split(
        text, max_tokens_per_chunk=100, overlap=40, chunk_header=HEADER
    )
    assert got == [
        HEADER + "This is a test of the emergency broadcast system. This is only a test.\n",
        HEADER + " broadcast system. This is only a test.\nWe repeat, this is only a test. ",
        HEADER + "We repeat, this is only a test. A unit test.",
    ]
