"""From-scratch BPE encoder (the CL100KTokenizer.cs production path,
archived/km-v1/extensions/Tiktoken/Tiktoken/CL100KTokenizer.cs:9).

The real cl100k_base rank table cannot be fetched offline, so these tests
exercise the ENCODER — greedy lowest-rank byte-pair merging + the cl100k
pre-split pattern — against small synthetic rank tables with known merge
outcomes; with the genuine table dropped at $KMS_CL100K_RANKS the same
code is exact CL100K.
"""

import base64

from kernel_memory_spark.functions import tokenizers as TOK


def ranks_of(*tokens):
    """Rank table: all 256 single bytes first, then the given merges in
    priority order."""
    ranks = {bytes([i]): i for i in range(256)}
    for j, t in enumerate(tokens):
        ranks[t.encode()] = 256 + j
    return ranks


class TestBpeMerge:
    def test_single_merge(self):
        tok = TOK.BpeTokenizer(ranks_of("ab"))
        assert tok.get_tokens("abc") == ["ab", "c"]
        assert tok.count_tokens("abc") == 2

    def test_full_word_merge(self):
        tok = TOK.BpeTokenizer(ranks_of("ab", "abc"))
        assert tok.get_tokens("abc") == ["abc"]
        assert tok.count_tokens("abc") == 1

    def test_lowest_rank_merges_first(self):
        """Greedy order is by RANK, not position: with bc ranked better
        than ab, 'abc' must become [a, bc], not [ab, c]."""
        ranks = ranks_of("bc", "ab")  # bc=256 beats ab=257
        tok = TOK.BpeTokenizer(ranks)
        assert tok.get_tokens("abc") == ["a", "bc"]

    def test_encode_ids_match_table(self):
        ranks = ranks_of("ab")
        tok = TOK.BpeTokenizer(ranks)
        assert tok.encode("abc") == [256, ord("c")]

    def test_count_never_fails_on_any_text(self):
        tok = TOK.BpeTokenizer(ranks_of())
        # multi-byte UTF-8 with no merges: one token per byte
        assert tok.count_tokens("é") == 2
        assert tok.count_tokens("") == 0


class TestCl100kPresplit:
    def test_word_and_space_prefix(self):
        tok = TOK.BpeTokenizer(ranks_of())
        pieces = tok._re.findall("hello world")
        assert pieces == ["hello", " world"]

    def test_contractions(self):
        tok = TOK.BpeTokenizer(ranks_of())
        assert tok._re.findall("don't") == ["don", "'t"]

    def test_numbers_chunk_by_three(self):
        tok = TOK.BpeTokenizer(ranks_of())
        assert tok._re.findall("12345") == ["123", "45"]

    def test_punctuation_with_newlines(self):
        tok = TOK.BpeTokenizer(ranks_of())
        assert tok._re.findall("end.\n") == ["end", ".\n"]


class TestRankFileLoading:
    def test_from_file_roundtrip(self, tmp_path):
        path = tmp_path / "toy.tiktoken"
        lines = []
        for b, r in ranks_of("ab", "abc").items():
            lines.append(base64.b64encode(b).decode() + " " + str(r))
        path.write_text("\n".join(lines) + "\n")
        tok = TOK.BpeTokenizer.from_file(str(path))
        assert tok.get_tokens("abcab") == ["abc", "ab"]

    def test_default_tokenizer_picks_env_ranks(self, tmp_path, monkeypatch):
        path = tmp_path / "toy.tiktoken"
        path.write_text(
            "\n".join(
                base64.b64encode(b).decode() + " " + str(r)
                for b, r in ranks_of("ab").items()
            )
        )
        monkeypatch.setenv("KMS_CL100K_RANKS", str(path))
        tok = TOK.default_tokenizer()
        assert isinstance(tok, TOK.BpeTokenizer)
        assert tok.count_tokens("ab") == 1

    def test_default_tokenizer_falls_back_without_env(self, monkeypatch):
        monkeypatch.delenv("KMS_CL100K_RANKS", raising=False)
        assert isinstance(TOK.default_tokenizer(), TOK.WordTokenizer)
