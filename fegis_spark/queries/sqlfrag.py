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


#: Constructed hot-bucket EMBEDDING corpus for the capped SRP query
#: (twin of the HOT_BOILER text injection): every vec_id % HOT_MOD == 0
#: row gets the same constant vector, so one exact cluster (100 rows at
#: sf0.001/0.01, 400 at sf0.1) shares ALL SRP band buckets and drives
#: them far over HOT_CAP — the representative routing fires for real
#: under the oracle at every sf.
HOT_VEC_VALUE = 0.5


def duck_hot_embeddings() -> str:
    """DuckDB CTE body: embeddings with the deterministic constant-
    vector injection (twin of spark_hot_embeddings)."""
    return (
        f"SELECT vec_id, CASE WHEN vec_id % {HOT_MOD} = 0 "
        f"THEN list_transform(range(64), d -> CAST({HOT_VEC_VALUE} AS FLOAT)) "
        f"ELSE embedding END AS embedding FROM embeddings"
    )


def spark_hot_embeddings(emb):
    """Spark twin of duck_hot_embeddings over a loaded embeddings table."""
    from pyspark.sql import functions as F

    return emb.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") % HOT_MOD == 0,
            F.expr(f"transform(sequence(0, 63), d -> CAST({HOT_VEC_VALUE} AS FLOAT))"),
        ).otherwise(F.col("embedding")),
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


def _ln_coeffs(terms: int = 19) -> list[float]:
    """atanh-series coefficients 1/(2k+1) as the doubles both engines
    parse from their shortest repr — literal on both sides so the
    Horner chain is the same IEEE DAG everywhere."""
    return [1.0 / (2 * k + 1) for k in range(terms)]


def _bind(val: str, var: str, body: str, spark: bool) -> str:
    """Let-binding via a 1-element higher-order transform — the only
    way SQL can name a subexpression inside one scalar expression.
    Both engines evaluate `val` once and substitute the VALUE, so the
    IEEE DAG is identical; only the spelling differs (Spark transform/
    element_at vs DuckDB list_transform/[1])."""
    if spark:
        return f"element_at(transform(array({val}), {var} -> {body}), 1)"
    return f"list_transform([{val}], {var} -> {body})[1]"


def portable_ln(x: str, spark: bool = False) -> str:
    """A natural-log SQL expression that is BIT-IDENTICAL on Spark and
    DuckDB by construction — unlike the engines' ln(), which disagree
    by 1 ulp on ~2.5% of inputs (java.lang.Math.log vs glibc; measured
    in evidence/ln_ulp_probe_r8.json — the root cause of the r5/r7
    .5e-6 midpoint flakes).

    Method: exact argument reduction + atanh series, using ONLY
    IEEE-correctly-rounded ops (+,-,*,/), which both engines must
    round identically:
      e  = floor(log2(x)) clamped with EXACT power-of-2 comparisons
           (power(2, e) is bit-exact in both engines for |e| <= 60,
           probed; the clamp absorbs the engines' log2 ulp noise —
           Spark's floor(log2(2^-29)) is famously -30)
      m  = x / 2^e            -- exact scaling, m in [1, 2)
      t  = (m-1)/(m+1)        -- |t| < 1/3
      ln m = 2t * P(t^2)      -- Horner, 19 literal coefficients
      ln x = e*LN2 + ln m     -- LN2 literal
    Max error vs true ln: a few ulp (~1e-16 relative) — identical on
    both engines, so decimal-transit quantization of the result can no
    longer split across engines. Domain: x > 0, x < 2^60.

    Every shared subterm is LET-BOUND via a 1-element transform
    (_bind) rather than textually substituted — a flat substitution
    duplicates the t/m/e stack under each of the 19 Horner references
    to u (~600 copies of x, a 23 KB expression whose parse/analysis
    alone cost seconds per query and whose codegen falls back to
    interpreted past 64 KB — measured on bm25/split_divergence). The
    bound form is ~1 KB, linear in the term count, at the price of a
    dialect flag: pass spark=True for Spark SQL (transform/element_at),
    default DuckDB (list_transform/[1]). The DAG — and therefore every
    bit of the result — is identical in both spellings (pinned in
    tests/test_property_portable.py)."""
    coeffs = _ln_coeffs()
    xd = f"CAST({x} AS DOUBLE)"

    def body(xv: str) -> str:
        e0 = f"CAST(floor(log2({xv})) AS DOUBLE)"

        def with_e0(e0v: str) -> str:
            e1 = (
                f"(CASE WHEN {xv} >= power(2.0e0, {e0v} + 1.0e0) THEN {e0v} + 1.0e0 "
                f"WHEN {xv} < power(2.0e0, {e0v}) THEN {e0v} - 1.0e0 "
                f"ELSE {e0v} END)"
            )

            def with_e1(e1v: str) -> str:
                m = f"({xv} / power(2.0e0, {e1v}))"

                def with_t(tv: str) -> str:
                    u = f"({tv} * {tv})"

                    def with_u(uv: str) -> str:
                        poly = f"{coeffs[-1]!r}e0"
                        for c in reversed(coeffs[:-1]):
                            poly = f"({c!r}e0 + {uv} * {poly})"
                        return f"(2.0e0 * ({tv} * {poly}))"

                    return _bind(u, "pl_u", with_u("pl_u"), spark)

                t = f"(({m} - 1.0e0) / ({m} + 1.0e0))"
                return (
                    f"(({e1v} * 6.931471805599453e-1)"
                    f" + {_bind(t, 'pl_t', with_t('pl_t'), spark)})"
                )

            return _bind(e1, "pl_e1", with_e1("pl_e1"), spark)

        return _bind(e0, "pl_e0", with_e0("pl_e0"), spark)

    return _bind(xd, "pl_x", body("pl_x"), spark)
