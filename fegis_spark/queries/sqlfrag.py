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


def duck_match_text(col: str, query: str) -> str:
    """DuckDB predicate mirroring plans.filters.match_text(): every
    analyzer token of `query` must appear among the analyzer tokens of
    `col`. Query-side tokenization happens here in Python (same
    analyzer), field-side in SQL."""
    from fegis_spark.plans.filters import analyzer_tokens

    qtoks = list(dict.fromkeys(analyzer_tokens(query)))
    if not qtoks:
        return "TRUE"
    toks = duck_tokens(col)
    return " AND ".join(f"list_contains({toks}, '{t}')" for t in qtoks)


def duck_tokens(col: str) -> str:
    """DuckDB expression producing the same token list as
    operators.dedup.tokens() over `col` (a SQL expression string)."""
    return (
        "list_filter(string_split_regex("
        f"regexp_replace(lower({col}), '({_CJK_RE2})', ' \\1 ', 'g'), "
        r"'[^\p{L}\p{N}]+'), x -> x <> '')"
    )
