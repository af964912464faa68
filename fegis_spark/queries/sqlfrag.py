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

#: Constructed hot-bucket corpus for the *_capped dedup queries:
#: every doc with doc_id % HOT_MOD == 0 gets this boilerplate text, so
#: one template cluster (>= 100 members at sf0.01, 1000 at sf0.1)
#: drives every LSH band bucket / winnow fingerprint it touches far
#: over HOT_CAP — the representative routing fires FOR REAL under the
#: oracle, not just in unit tests. Lowercase single-space words only,
#: so both tokenizers agree trivially; 12 tokens → real shingle and
#: fingerprint sets.
HOT_BOILER = (
    "lorem ipsum boilerplate navigation footer copyright "
    "terms privacy contact subscribe newsletter home"
)
HOT_MOD = 5
HOT_CAP = 32


def duck_hot_docs() -> str:
    """DuckDB CTE body: documents with the deterministic boilerplate
    injection (twin of spark_hot_docs)."""
    return (
        f"SELECT doc_id, CASE WHEN doc_id % {HOT_MOD} = 0 "
        f"THEN '{HOT_BOILER}' ELSE text END AS text FROM documents"
    )


def spark_hot_docs(docs):
    """Spark twin of duck_hot_docs over a loaded documents table."""
    from pyspark.sql import functions as F

    return docs.withColumn(
        "text",
        F.when(F.col("doc_id") % HOT_MOD == 0, F.lit(HOT_BOILER)).otherwise(
            F.col("text")
        ),
    )


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
