"""Query language tests.

Tokenizer golden cases ported verbatim from the reference's unit tests
(src/engine.rs:673-691); parser cases derived from the documented operator
semantics (engine.rs:499-565).
"""

import pytest

from pixelbox_tpu.query import (
    tokenize_query,
    QueryTokenizeError,
    parse_query,
)


class TestTokenizer:
    def test_single(self):
        assert tokenize_query("abc") == ["abc"]

    def test_two_words(self):
        assert tokenize_query("abc def") == ["abc", "def"]

    def test_quoted_group(self):
        assert tokenize_query('abc "def ghi"') == ["abc", "def ghi"]

    def test_escaped_quotes(self):
        assert tokenize_query(r"abc \"def ghi\"") == ["abc", '"def', 'ghi"']

    def test_human_torch(self):
        q = r'"the human torch was denied a bank loan" "the \"human torch\""'
        assert tokenize_query(q) == [
            "the human torch was denied a bank loan",
            'the "human torch"',
        ]

    def test_empty(self):
        assert tokenize_query("") == []
        assert tokenize_query("   ") == []

    def test_trailing_open_quote_errors(self):
        with pytest.raises(QueryTokenizeError):
            tokenize_query('abc "def')

    def test_trailing_escape_errors(self):
        with pytest.raises(QueryTokenizeError):
            tokenize_query("abc\\")


class TestParser:
    def test_bare_token_is_filename(self):
        p = parse_query("sunset")
        assert p.where_sql == "images.filename LIKE ?"
        assert p.params == ["%sunset%"]
        assert p.similar_path is None

    def test_multiple_tokens_and_joined(self):
        p = parse_query("sunset beach")
        assert p.where_sql == "images.filename LIKE ? AND images.filename LIKE ?"
        assert p.params == ["%sunset%", "%beach%"]

    def test_filename_operator_uses_remainder(self):
        p = parse_query("filename:cat")
        assert p.where_sql == "images.filename LIKE ?"
        assert p.params == ["%cat%"]

    def test_tag_with_name_and_value(self):
        p = parse_query("tag:Make:Pixel")
        assert p.where_sql == "(tags.name LIKE ? AND tags.value LIKE ?)"
        assert p.params == ["%Make%", "%Pixel%"]

    def test_exif_without_value_matches_either(self):
        p = parse_query("exif:GPS")
        assert p.where_sql == "(tags.name LIKE ? OR tags.value LIKE ?)"
        assert p.params == ["%GPS%", "%GPS%"]

    def test_all_operator(self):
        p = parse_query("all:vacation")
        assert (
            p.where_sql
            == "(tags.value LIKE ? OR images.filename LIKE ? OR images.path LIKE ?)"
        )
        assert p.params == ["%vacation%"] * 3

    def test_similar_operator_sets_path_no_clause(self):
        p = parse_query("similar:/photos/cat.png")
        assert p.similar_path == "/photos/cat.png"
        assert p.where_sql == ""

    def test_similar_with_windows_drive_path(self):
        # split on FIRST ':' only: remainder keeps the drive colon.
        p = parse_query("similar:C:/photos/cat.png")
        assert p.similar_path == "C:/photos/cat.png"

    def test_unknown_prefix_ignored(self):
        p = parse_query("frobnicate:xyz sunset")
        assert p.where_sql == "images.filename LIKE ?"
        assert p.params == ["%sunset%"]

    def test_mixed_query(self):
        p = parse_query('similar:/q.png tag:Model "my file"')
        assert p.similar_path == "/q.png"
        assert p.where_sql == (
            "(tags.name LIKE ? OR tags.value LIKE ?) AND images.filename LIKE ?"
        )
        assert p.params == ["%Model%", "%Model%", "%my file%"]

    def test_prefix_case_insensitive(self):
        p = parse_query("TAG:a")
        assert p.where_sql == "(tags.name LIKE ? OR tags.value LIKE ?)"
