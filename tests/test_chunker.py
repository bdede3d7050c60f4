"""Golden tests for PlainTextChunker, ported from the reference suite
archived/km-v1/extensions/Chunkers/Chunkers.UnitTests/PlainTextChunkerTest.cs
using the bit-compatible N-char tokenizers (Helpers/*TestTokenizer.cs).
CL100K-dependent cases are excluded (tiktoken unavailable in sandbox).
"""

import pytest

from kernel_memory_spark.functions.chunker import (
    PlainTextChunker,
    PlainTextChunkerOptions,
    SeparatorTrie,
    split_to_fragments,
)
from kernel_memory_spark.functions.tokenizers import NCharTokenizer

chunker1 = PlainTextChunker(NCharTokenizer(1))
chunker2 = PlainTextChunker(NCharTokenizer(2))
chunker4 = PlainTextChunker(NCharTokenizer(4))

# Test-local trie identical to PlainTextChunkerTest.cs s_separators
TEST_SEPARATORS = SeparatorTrie([
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
    "; ", ";\t", ";\n", ";",
    "} ", "}\t", "}\n", "}",
    ") ", ")\t", ")\n",
    "] ", "]\t", "]\n",
    ")", "]",
    ":", ",", " ", "-",
])


def frags(text):
    return [c for c, _ in split_to_fragments(text, TEST_SEPARATORS)]


class TestFragments:
    def test_it_tokenizes_text(self):  # :44-63
        assert frags("Hello, world!") == ["Hello", ",", " ", "world", "!"]

    def test_consecutive_sentence_separators(self):  # :65-88
        assert frags("Hello. . . world!!!!!!!!!!!!!") == [
            "Hello", ". ", ". ", ". ", "world", "!!!!", "!!!!", "!!!!", "!",
        ]

    def test_tail_without_termination_1(self):
        assert frags("Hello") == ["Hello"]

    def test_tail_without_termination_2(self):
        assert frags("Hello!World") == ["Hello", "!", "World"]


class TestSplit:
    def test_can_split_plain_text_lines(self):  # :126-145
        text = "This is a test of the emergency broadcast system. This is only a test."
        assert chunker4.split(text, max_tokens_per_chunk=15) == [
            "This is a test of the emergency broadcast system. ",
            "This is only a test.",
        ]

    def test_custom_token_counter(self):  # :148-166
        text = "This is a test of the emergency broadcast system. This is only a test."
        assert chunker1.split(text, max_tokens_per_chunk=60) == [
            "This is a test of the emergency broadcast system. ",
            "This is only a test.",
        ]

    def test_first_chunk_not_empty_when_first_sentence_long(self):  # :167-189
        text = "This is a sentence longer than 5 tokens, as you can see."
        assert chunker4.split(text, max_tokens_per_chunk=5) == [
            "This is a sentence ",
            "longer than 5 ",
            "tokens, as you can ",
            "see.",
        ]

    def test_can_split_text_paragraphs(self):  # :191-216
        text = " ".join([
            "This is a test of the emergency broadcast system. This is only a test.",
            "We repeat, this is only a test. A unit test.",
        ])
        assert chunker4.split(text, max_tokens_per_chunk=15) == [
            "This is a test of the emergency broadcast system. ",
            "This is only a test. We repeat, this is only a test. ",
            "A unit test.",
        ]

    def test_can_split_text_paragraphs_evenly(self):  # :220-248
        text = "\n".join([
            "This is a test of the emergency broadcast system. This is only a test.",
            "We repeat, this is only a test. A unit test.",
            "A small note. And another. And once again. Seriously, this is the end."
            " We're finished. All set. Bye.",
            "Done.",
        ])
        assert chunker4.split(text, max_tokens_per_chunk=15) == [
            "This is a test of the emergency broadcast system. ",
            "This is only a test.\nWe repeat, this is only a test. ",
            "A unit test.\nA small note. And another. And once again. ",
            "Seriously, this is the end. We're finished. All set. Bye.\n",
            "Done.",
        ]

    def test_with_header(self):  # :250-277
        header = "DOCUMENT NAME: test.txt\n\n"
        text = "\n".join([
            "This is a test of the emergency broadcast system. This is only a test.",
            "We repeat, this is only a test. A unit test.",
        ])
        assert chunker4.split(
            text, max_tokens_per_chunk=20, chunk_header=header
        ) == [
            header + "This is a test of the emergency broadcast system. ",
            header + "This is only a test.\n",
            header + "We repeat, this is only a test. A unit test.",
        ]

    def test_with_custom_token_counter(self):  # :279-305
        text = "\n".join([
            "This is a test of the emergency broadcast system. This is only a test.",
            "We repeat, this is only a test. A unit test.",
        ])
        assert chunker1.split(text, max_tokens_per_chunk=52) == [
            "This is a test of the emergency broadcast system. ",
            "This is only a test.\n",
            "We repeat, this is only a test. A unit test.",
        ]

    def test_empty_input(self):
        assert chunker2.split("", max_tokens_per_chunk=1) == []
        assert chunker4.split("", max_tokens_per_chunk=13) == []

    def test_no_delimiters(self):  # :323-357
        text = "".join([
            "Thisisatestoftheemergencybroadcastsystem",
            "Thisisonlyatest",
            "WerepeatthisisonlyatestAunittest",
            "AsmallnoteAndanotherAndonceagain",
            "SeriouslythisistheendWe'refinishedAllsetByeDoneThisOneWillBeSplitToMeetTheLimit",
        ])
        assert chunker4.split(text, max_tokens_per_chunk=15) == [
            "ThisisatestoftheemergencybroadcastsystemThisisonlyatestWerep",
            "eatthisisonlyatestAunittestAsmallnoteAndanotherAndonceagainS",
            "eriouslythisistheendWe'refinishedAllsetByeDoneThisOneWillBeS",
            "plitToMeetTheLimit",
        ]

    def test_paragraphs_separated_by_newline(self):  # :359-390
        text = "\n".join([
            "Thisisatestoftheemergencybroadcastsystem",
            "Thisisonlyatest",
            "WerepeatthisisonlyatestAunittest",
            "AsmallnoteAndanotherAndonceagain",
            "SeriouslythisistheendWe'refinishedAllsetByeDoneThisOneWillBeSplitToMeetTheLimit",
        ])
        assert chunker4.split(text, max_tokens_per_chunk=15) == [
            "Thisisatestoftheemergencybroadcastsystem\nThisisonlyatest\n",
            "WerepeatthisisonlyatestAunittest\n",
            "AsmallnoteAndanotherAndonceagain\nSeriouslythisistheendWe'",
            "refinishedAllsetByeDoneThisOneWillBeSplitToMeetTheLimit",
        ]

    def test_header_and_custom_token_counter(self):  # :392-420
        header = "DOCUMENT NAME: test.txt\n\n"
        text = "\n".join([
            "This is a test of the emergency broadcast system. This is only a test.",
            "We repeat, this is only a test. A unit test.",
        ])
        assert chunker1.split(
            text, max_tokens_per_chunk=77, chunk_header=header
        ) == [
            header + "This is a test of the emergency broadcast system. ",
            header + "This is only a test.\n",
            header + "We repeat, this is only a test. A unit test.",
        ]

    def test_on_spaces_v2(self):  # :423-459
        text = "\n".join([
            "This is a test of the emergency broadcast system This is only a test",
            "We repeat this is only a test A unit test",
            "A small note And another And once again Seriously this is the end"
            " We're finished All set Bye.",
            "Done.",
        ])
        assert chunker2.split(text, max_tokens_per_chunk=15) == [
            "This is a test of the ",
            "emergency broadcast system ",
            "This is only a test\nWe repeat ",
            "this is only a test A unit ",
            "test\nA small note And another ",
            "And once again Seriously this ",
            "is the end We're finished All ",
            "set Bye.\nDone.",
        ]

    def test_on_spaces_v4(self):  # :462-494
        text = " ".join([
            "This is a test of the emergency broadcast system This is only a test",
            "We repeat this is only a test A unit test",
            "A small note And another And once again Seriously this is the end"
            " We're finished All set Bye.",
            "Done.",
        ])
        assert chunker4.split(text, max_tokens_per_chunk=15) == [
            "This is a test of the emergency broadcast system This is ",
            "only a test We repeat this is only a test A unit test A ",
            "small note And another And once again Seriously this is the ",
            "end We're finished All set Bye. Done.",
        ]

    def test_overlap_and_header(self):  # :553-583
        header = "DOCUMENT NAME: test.txt\n\n"
        text = "\n".join([
            "This is a test of the emergency broadcast system. This is only a test.",
            "We repeat, this is only a test. A unit test.",
        ])
        assert chunker4.split(
            text, max_tokens_per_chunk=22, overlap=8, chunk_header=header
        ) == [
            header + "This is a test of the emergency broadcast system. ",
            header + "e emergency broadcast system. This is only a test.\n",
            header + "This is only a test.\nWe repeat, ",
            header + "We repeat, this is only a test. A unit ",
            header + "this is only a test. A unit test.",
        ]

    def test_overlap_custom_token_counter(self):  # :585-612
        text = "\n".join([
            "This is a test of the emergency broadcast system. This is only a test.",
            "We repeat, this is only a test. A unit test.",
        ])
        assert chunker1.split(text, max_tokens_per_chunk=75, overlap=40) == [
            "This is a test of the emergency broadcast system. This is only a test.\n",
            " broadcast system. This is only a test.\nWe repeat, this is only a test. ",
            "We repeat, this is only a test. A unit test.",
        ]

    def test_overlap(self):  # :614-643
        text = "\n".join([
            "This is a test of the emergency broadcast system. This is only a test.",
            "We repeat, this is only a test. A unit test.",
        ])
        assert chunker4.split(text, max_tokens_per_chunk=15, overlap=8) == [
            "This is a test of the emergency broadcast system. ",
            "e emergency broadcast system. This is only a test.\n",
            "This is only a test.\nWe repeat, ",
            "We repeat, this is only a test. A unit ",
            "this is only a test. A unit test.",
        ]

    def test_on_newlines(self):  # :645-676 (\r\n / \r normalization)
        text = "\n".join([
            "This is a test of the emergency broadcast system\r\n\r\nThis is only a test",
            "We repeat this is only a test\nA unit test",
            "A small note\nAnd another\r\nAnd once again\rSeriously this is the end\n\n"
            "We're finished\nAll set\nBye\n",
            "Done",
        ])
        assert chunker4.split(text, max_tokens_per_chunk=15) == [
            "This is a test of the emergency broadcast system\n\n",
            "This is only a test\nWe repeat this is only a test\nA unit ",
            "test\nA small note\nAnd another\nAnd once again\nSeriously this ",
            "is the end\n\nWe're finished\nAll set\nBye\n\nDone",
        ]

    def test_on_punctuation(self):  # :679-712
        text = "\n".join([
            "This is a test of the emergency broadcast system. This is only a test",
            "We repeat, this is only a test? A unit test",
            "A small note! And another? And once again! Seriously, this is the end."
            " We're finished. All set. Bye.",
            "Done.",
        ])
        assert chunker4.split(text, max_tokens_per_chunk=15) == [
            "This is a test of the emergency broadcast system. ",
            "This is only a test\nWe repeat, this is only a test? ",
            "A unit test\nA small note! And another? And once again! ",
            "Seriously, this is the end. We're finished. All set. Bye.\n",
            "Done.",
        ]

    def test_on_semicolons(self):  # :715-747
        text = "\n".join([
            "This is a test of the emergency broadcast system; This is only a test",
            "We repeat; this is only a test; A unit test",
            "A small note; And another; And once again; Seriously, this is the end;"
            " We're finished; All set; Bye.",
            "Done.",
        ])
        assert chunker4.split(text, max_tokens_per_chunk=15) == [
            "This is a test of the emergency broadcast system; ",
            "This is only a test\nWe repeat; this is only a test; ",
            "A unit test\nA small note; And another; And once again; ",
            "Seriously, this is the end; We're finished; All set; ",
            "Bye.\nDone.",
        ]

    def test_on_colons(self):  # :750-783
        text = "\n".join([
            "This is a test of the emergency broadcast system: This is only a test",
            "We repeat: this is only a test: A unit test",
            "A small note: And another: And once again: Seriously, this is the end:"
            " We're finished: All set: Bye.",
            "Done.",
        ])
        assert chunker4.split(text, max_tokens_per_chunk=15) == [
            "This is a test of the emergency broadcast system: ",
            "This is only a test\nWe repeat: this is only a test: ",
            "A unit test\nA small note: And another: And once again: ",
            "Seriously, this is the end: We're finished: All set: ",
            "Bye.\nDone.",
        ]

    def test_on_commas(self):  # :786-819
        text = "\n".join([
            "This is a test of the emergency broadcast system, This is only a test",
            "We repeat, this is only a test, A unit test",
            "A small note, And another, And once again, Seriously, this is the end,"
            " We're finished, All set, Bye.",
            "Done.",
        ])
        assert chunker4.split(text, max_tokens_per_chunk=15) == [
            "This is a test of the emergency broadcast system, ",
            "This is only a test\nWe repeat, this is only a test, ",
            "A unit test\nA small note, And another, And once again, ",
            "Seriously, this is the end, We're finished, All set, ",
            "Bye.\nDone.",
        ]

    def test_on_closing_brackets(self):  # :822-855
        text = "\n".join([
            "This is a test of the emergency broadcast system) This is only a test",
            "We repeat) this is only a test) A unit test",
            "A small note] And another) And once again] Seriously this is the end}"
            " We're finished} All set} Bye.",
            "Done.",
        ])
        assert chunker4.split(text, max_tokens_per_chunk=15) == [
            "This is a test of the emergency broadcast system) ",
            "This is only a test\nWe repeat) this is only a test) ",
            "A unit test\nA small note] And another) And once again] ",
            "Seriously this is the end} We're finished} All set} ",
            "Bye.\nDone.",
        ]

    def test_on_hyphens(self):  # :858-889
        text = "".join([
            "This-is-a-test-of-the-emergency-broadcast-system-This-is-only-a-test",
            "We-repeat-this-is-only-a-test-A-unit-test",
            "A-small-note-And-another-And-once-again-Seriously, this-is-the-end-"
            "We're-finished-All-set-Bye.",
            "Done.",
        ])
        assert chunker4.split(text, max_tokens_per_chunk=15) == [
            "This-is-a-test-of-the-emergency-broadcast-system-This-is-",
            "only-a-testWe-repeat-this-is-only-a-test-A-unit-testA-small-",
            "note-And-another-And-once-again-Seriously, ",
            "this-is-the-end-We're-finished-All-set-Bye.Done.",
        ]

    def test_overlap_header_custom_counter(self):  # :892-920
        header = "DOCUMENT NAME: test.txt\n\n"
        text = "\n".join([
            "This is a test of the emergency broadcast system. This is only a test.",
            "We repeat, this is only a test. A unit test.",
        ])
        assert chunker1.split(
            text, max_tokens_per_chunk=100, overlap=40, chunk_header=header
        ) == [
            header + "This is a test of the emergency broadcast system. This is only a test.\n",
            header + " broadcast system. This is only a test.\nWe repeat, this is only a test. ",
            header + "We repeat, this is only a test. A unit test.",
        ]

    def test_lossless_concat(self):
        # SplitsOnSpecialSequencesAndHoldsAllChars asserts join(chunks)==input
        text = (
            "Hello!!!It's been a minute!?!Here's a list of numbers: "
            "one, two, three, four, five, six, seven, eight, nine, ten⁇"
        ) * 2
        chunks = chunker4.split(text, max_tokens_per_chunk=8)
        assert "".join(chunks) == text

    def test_options_validation(self):
        with pytest.raises(ValueError):
            PlainTextChunkerOptions(max_tokens_per_chunk=0)
        with pytest.raises(ValueError):
            PlainTextChunkerOptions(overlap=-1)
