"""Shared DuckDB SQL fragments mirroring Spark-side expression
recipes, so every oracle spells the exact same semantics once.

The tokenizer fragment must stay in lockstep with
operators.dedup.tokens(): lowercase -> space out CJK codepoints
(unsegmented scripts tokenize per codepoint) -> split on runs of
non-letter/non-digit -> drop empties. Java regex spells Unicode
scripts \\p{IsHan}; RE2 (DuckDB) spells them \\p{Han}.
"""

from __future__ import annotations

_CJK_RE2 = r"[\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}]"


def duck_tokens(col: str) -> str:
    """DuckDB expression producing the same token list as
    operators.dedup.tokens() over `col` (a SQL expression string)."""
    return (
        "list_filter(string_split_regex("
        f"regexp_replace(lower({col}), '({_CJK_RE2})', ' \\1 ', 'g'), "
        r"'[^\p{L}\p{N}]+'), x -> x <> '')"
    )
