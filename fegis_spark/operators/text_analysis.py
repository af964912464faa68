"""Text-analysis operators for training-data pipelines ([EXT]).

Language ID, quality scoring, token counting, and document
fingerprinting — all as portable Column expressions (the same
arithmetic is restated in the DuckDB oracles, so every operator here
is hash-checkable; occurrence counts use length-difference instead of
engine-specific regex counters).

Scale: each operator is a per-row projection — no shuffle at all; they
pipeline inside one whole-stage-codegen span over the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007

#: language marker terms (space-padded word match for latin scripts,
#: raw substring for CJK). Deliberately tiny — a heuristic, not a model.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " is "],
    "fr": [" le ", " la ", " les ", " et ", " une "],
    "es": [" el ", " los ", " las ", " una ", " y "],
    "de": [" der ", " die ", " und ", " ist "],
    "zh": ["的", "是", "在"],
}

#: fixed precedence for score ties (alphabetical = deterministic)
LANG_ORDER = sorted(LANG_MARKERS)

STOPWORDS = ["the", "and", "of", "a", "to", "in", "is", "it"]


def occurrences(haystack: Column, needle: str) -> Column:
    """Substring occurrence count via length difference — identical
    semantics in Spark and DuckDB (no regex dialect involved)."""
    n = len(needle)
    return (F.length(haystack) - F.length(F.replace(haystack, F.lit(needle)))) / n


def occurrences_sql(haystack: str, needle: str) -> str:
    n = needle.replace("'", "''")
    return f"(length({haystack}) - length(replace({haystack}, '{n}', ''))) / {len(needle)}"


def padded(col: Column) -> Column:
    """' ' || collapsed-lower text || ' ' — gives word-ish boundaries
    for the space-padded markers."""
    return F.concat(
        F.lit(" "), F.lower(F.trim(F.regexp_replace(col, r"\s+", " "))), F.lit(" ")
    )


PADDED_SQL = "' ' || lower(trim(regexp_replace({c}, '\\s+', ' ', 'g'))) || ' '"


def lang_scores(col: Column) -> dict[str, Column]:
    p = padded(col)
    return {
        lang: sum(
            [occurrences(p, m) for m in markers], F.lit(0).cast("double")
        ).alias(f"score_{lang}")
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(col: Column) -> Column:
    """Predicted language = argmax marker-occurrence score; ties and
    all-zero fall back to first language in alphabetical order whose
    score equals the max ('de' before 'en' ...)."""
    scores = lang_scores(col)
    mx = F.greatest(*scores.values())
    out: Column = F.lit(LANG_ORDER[-1])
    for lang in reversed(LANG_ORDER[:-1]):
        out = F.when(scores[lang] == mx, F.lit(lang)).otherwise(out)
    return out


def lang_id_sql(c: str) -> str:
    """The exact same argmax restated for DuckDB (generated from the
    same marker table — cannot drift)."""
    p = PADDED_SQL.format(c=c)
    score = {
        lang: "(" + " + ".join(occurrences_sql(p, m) for m in markers) + ")"
        for lang, markers in LANG_MARKERS.items()
    }
    mx = "greatest(" + ", ".join(score[lang] for lang in LANG_ORDER) + ")"
    expr = f"'{LANG_ORDER[-1]}'"
    for lang in reversed(LANG_ORDER[:-1]):
        expr = f"CASE WHEN {score[lang]} = {mx} THEN '{lang}' ELSE {expr} END"
    return expr


def token_count_ws(col: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(col)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+")))


TOKEN_COUNT_WS_SQL = (
    "CASE WHEN trim({c}) = '' THEN 0 ELSE len(string_split_regex(trim({c}), '\\s+')) END"
)


def token_count_bpe_ish(col: Column) -> Column:
    """BPE-ish sub-word count: alnum runs + each non-space symbol counts
    one (the classic pre-tokenizer regex \\w+|[^\\w\\s], ASCII classes
    in both engines)."""
    return F.size(F.regexp_extract_all(col, F.lit(r"\w+|[^\w\s]"), 0))


TOKEN_COUNT_BPE_SQL = "len(regexp_extract_all({c}, '\\w+|[^\\w\\s]'))"


def quality_score(col: Column) -> Column:
    """Composite quality heuristic in [0,1]:
    0.4·length_ok + 0.3·(1-punct_ratio·5 clamped) + 0.3·stopword presence.
    Deterministic double arithmetic, mirrored in SQL by quality_score_sql."""
    n_chars = F.length(col)
    n_tok = token_count_ws(col).cast("double")
    punct = (
        F.length(col) - F.length(F.regexp_replace(col, r"[.,!?;:]", ""))
    ).cast("double")
    p = padded(col)
    stop_hits = sum(
        [occurrences(p, f" {s} ") for s in STOPWORDS], F.lit(0).cast("double")
    )
    length_ok = F.when((n_chars >= 100) & (n_chars <= 10000), 1.0).otherwise(0.0)
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    punct_term = F.greatest(F.lit(0.0), F.lit(1.0) - punct_ratio * 5)
    stop_term = F.when(n_tok > 0, F.least(F.lit(1.0), stop_hits / n_tok * 4)).otherwise(
        F.lit(0.0)
    )
    return F.round(0.4 * length_ok + 0.3 * punct_term + 0.3 * stop_term, 6)


def quality_score_sql(c: str) -> str:
    p = PADDED_SQL.format(c=c)
    stop_hits = " + ".join(occurrences_sql(p, f" {s} ") for s in STOPWORDS)
    n_tok = TOKEN_COUNT_WS_SQL.format(c=c)
    return f"""round(
      0.4 * (CASE WHEN length({c}) BETWEEN 100 AND 10000 THEN 1.0 ELSE 0.0 END)
      + 0.3 * greatest(0.0, 1.0 - (CASE WHEN length({c}) > 0
          THEN (length({c}) - length(regexp_replace({c}, '[.,!?;:]', '', 'g')))::DOUBLE / length({c})
          ELSE 0.0 END) * 5)
      + 0.3 * (CASE WHEN ({n_tok}) > 0
          THEN least(1.0, ({stop_hits})::DOUBLE / ({n_tok}) * 4)
          ELSE 0.0 END), 6)"""


def fingerprint(col: Column) -> Column:
    """Polynomial rolling hash over codepoints, mod 1e9+7 — an
    order-sensitive document fingerprint computable identically in any
    engine with a fold (unlike xxhash/md5-of-text it also supports
    windowed substring hashing at ingest)."""
    codes = F.transform(F.split(col, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + x) % MOD
    )


#: empty-string guard: Spark's ascii('') folds to 0, but DuckDB's
#: ord('') is -1 — found by tests/test_property_portable.py; no corpus
#: row is empty, but the fragments must agree on ALL inputs.
FINGERPRINT_SQL = (
    "CASE WHEN length({c}) = 0 THEN 0 ELSE "
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({c}, ''), ch -> CAST(ord(ch) AS BIGINT))), "
    f"(acc, x) -> (acc * 31 + x) % {MOD}) END"
)


#: winnowing parameters (Schleimer et al. 2003, "Winnowing: Local
#: Algorithms for Document Fingerprinting"): k-token grams hashed,
#: then the rightmost minimum of every w-hash window is selected.
#: Guarantee: any shared token run of length >= w + k - 1 tokens
#: (here 6) produces at least one shared fingerprint.
WINNOW_K = 3
WINNOW_W = 4


def winnow_fps_expr(gh: str) -> str:
    """Spark-SQL expression: winnowing fingerprint set from a
    gram-hash array expression. For every window of
    least(WINNOW_W, n) consecutive hashes, select the RIGHTMOST
    position attaining the window minimum (the paper's tie rule, which
    is what makes the selection deterministic), then project the
    distinct selected positions to their distinct hashes. The window
    min is recomputed inside the position filter (w is 4 — constant
    work); identical gram-hash subtrees are shared by codegen
    subexpression elimination."""
    w = f"least({WINNOW_W}, size({gh}))"
    sel = (
        f"array_distinct(transform(sequence(0, size({gh}) - {w}), j -> "
        f"array_max(filter(sequence(j, j + {w} - 1), p -> "
        f"element_at({gh}, p + 1) = array_min(slice({gh}, j + 1, {w}))))))"
    )
    return (
        f"CASE WHEN size({gh}) = 0 THEN CAST(array() AS ARRAY<BIGINT>) "
        f"ELSE array_distinct(transform({sel}, p -> element_at({gh}, p + 1))) END"
    )


def winnow_fp_sets(docs, text_col: str = "text", id_col: str = "doc_id"):
    """(doc_id, n_grams, fps) — the winnowing fingerprint set per
    document, shared by the per-doc summary (winnow_fingerprints) and
    the cross-doc match join (winnow_match_pairs)."""
    from pyspark.ml.feature import NGram

    from fegis_spark.operators.dedup import tokens

    # Scala NGram for the gram strings (2× the HOF slice/concat chain,
    # measured at sf0.1); only the per-gram md5 stays a HOF transform.
    base = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__tok")
    )
    base = (
        NGram(n=WINNOW_K, inputCol="__tok", outputCol="__g")
        .transform(base)
        .select(
            "doc_id",
            F.expr(
                "transform(__g, g -> "
                "CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT))"
            ).alias("__gh"),
        )
    )
    return base.select(
        "doc_id",
        F.expr("size(__gh)").alias("n_grams"),
        F.expr(winnow_fps_expr("__gh")).alias("fps"),
    )


def winnow_match_pairs(
    docs,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_shared: int = 1,
    max_bucket_size: int | None = None,
):
    """Cross-document winnowing matches — what MOSS actually reports:
    pairs of documents sharing selected fingerprints, with the shared
    count and the fingerprint-set Jaccard. Because of the winnowing
    guarantee, every pair sharing a token run of >= w + k - 1 tokens
    IS in this output (no MinHash-style false negatives for local
    matches).

    Plan: fingerprint sets → explode to (doc, h), then pairs.
    Uncapped: sets persisted MEMORY_AND_DISK (both sides of the
    self-join read it), equi-join on the hash with doc_l < doc_r.

    max_bucket_size is the same hot-bucket cap as
    banded_candidate_pairs (band = the fingerprint hash itself): a
    boilerplate fingerprint shared by m docs would emit m(m-1)/2 pairs
    out of ONE join key — the quadratic output no partitioning trick
    can shrink. Under the cap, hashes with <= cap members pair exactly
    as before; over-cap hashes emit STAR rows to their min-doc
    representative (m-1 instead of m²/2), so per-pair n_shared counts
    only the fingerprints that actually generated the candidate.
    r15: the capped branch folds pair generation into ONE groupBy(h)
    (sort_array(collect_list) + per-bucket CASE emitting all-pairs or
    star structs, multiplicity preserved — NO distinct, n_shared needs
    one row per shared h), the same rewrite as banded_candidate_pairs:
    the r12 window+self-join+union shape re-executed the
    explode/exchange/sort/window once per consumer (zero ReusedExchange
    in the executed plan). With the join gone the fingerprint subtree
    has ONE consumer, so the capped branch drops the persist too.
    Capped hashes are observable via winnow_bucket_stats (the
    no-silent-caps rule). None = exact (the oracle-checked default)."""
    from pyspark import StorageLevel

    # persisted in BOTH branches: beyond the uncapped join's two
    # consumers, the winnowing projection itself (interpreted HOF +
    # regexp chain) must materialize exactly once — without the cache
    # the collapsed plan re-evaluates the fps expression per reference
    # (n_fp + explode) inside a non-codegen stage, measured
    # catastrophically slower on the hot-docs corpus (r15)
    sets = (
        winnow_fp_sets(docs, text_col, id_col)
        .select("doc_id", F.size("fps").alias("n_fp"), "fps")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ex = sets.select("doc_id", "n_fp", F.explode("fps").alias("h"))
    if max_bucket_size is None:
        l = ex.select(
            F.col("doc_id").alias("doc_l"), F.col("n_fp").alias("n_l"), "h"
        )
        r = ex.select(
            F.col("doc_id").alias("doc_r"), F.col("n_fp").alias("n_r"), "h"
        )
        cand = l.join(r, "h").filter(F.col("doc_l") < F.col("doc_r"))
    else:
        g = ex.filter(F.col("h").isNotNull()).groupBy("h").agg(
            F.expr(
                "sort_array(collect_list(named_struct('doc', doc_id, 'n', n_fp)))"
            ).alias("ds"),
            F.count("*").alias("m"),
        )
        pairs_expr = (
            f"CASE WHEN m <= {max_bucket_size} THEN "
            "flatten(transform(ds, (x, i) -> transform(slice(ds, i + 2, m), "
            "y -> named_struct('doc_l', x.doc, 'n_l', x.n, "
            "'doc_r', y.doc, 'n_r', y.n)))) "
            "ELSE transform(filter(ds, x -> x.doc != ds[0].doc), x -> "
            "named_struct('doc_l', ds[0].doc, 'n_l', ds[0].n, "
            "'doc_r', x.doc, 'n_r', x.n)) END AS ps"
        )
        cand = (
            g.selectExpr(pairs_expr)
            .selectExpr("explode(ps) AS p")
            .selectExpr(
                "p.doc_l AS doc_l", "p.n_l AS n_l",
                "p.doc_r AS doc_r", "p.n_r AS n_r",
            )
        )
    return (
        cand.groupBy("doc_l", "doc_r", "n_l", "n_r")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select(
            "doc_l",
            "doc_r",
            "n_shared",
            F.round(
                F.col("n_shared")
                / (F.col("n_l") + F.col("n_r") - F.col("n_shared")),
                6,
            ).alias("fp_jaccard"),
        )
    )


def winnow_bucket_stats(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Audit surface for winnow_match_pairs' hot-fingerprint cap
    (no-silent-caps rule): per fingerprint hash, how many documents
    share it and the min-doc representative over-cap members were
    routed to. Filter bucket_size > cap to list exactly which
    fingerprints were star-routed and how many pairwise candidacies
    each dropped."""
    ex = winnow_fp_sets(docs, text_col, id_col).select(
        "doc_id", F.explode("fps").alias("h")
    )
    return ex.groupBy("h").agg(
        F.count("*").alias("bucket_size"), F.min("doc_id").alias("rep")
    )


def winnow_fingerprints(docs, text_col: str = "text", id_col: str = "doc_id"):
    """Winnowing document fingerprints (Schleimer et al. 2003): the
    MOSS algorithm's selection of k-gram hashes — every w-window of
    consecutive gram hashes contributes its rightmost minimum — giving
    a compact position-robust fingerprint set per document with a hard
    guarantee (shared runs >= w+k-1 tokens always collide), unlike
    MinHash's probabilistic sketch.

    Output: (doc_id, n_grams, n_fp, fp_xor, fp_density). fp_xor is the
    order-proof XOR of the distinct fingerprint hashes (same recipe as
    corpus_checksums); fp_density ~ 2/(w+1) on random text.

    Scale: a pure per-row projection — zero shuffle, whole-stage
    codegen, corpus streams map-side. winnow_match_pairs is the
    cross-doc join built on the same sets."""
    sets = winnow_fp_sets(docs, text_col, id_col)
    return sets.select(
        "doc_id",
        "n_grams",
        F.size("fps").alias("n_fp"),
        F.expr(
            "aggregate(fps, CAST(0 AS BIGINT), (acc, x) -> acc ^ x)"
        ).alias("fp_xor"),
        F.expr(
            "CASE WHEN n_grams > 0 THEN "
            "round(CAST(size(fps) AS DOUBLE) / n_grams, 6) ELSE 0.0 END"
        ).alias("fp_density"),
    )


def unigram_logprob(
    docs, text_col: str = "text", id_col: str = "doc_id",
    broadcast_vocab: bool = True,
):
    """Corpus-level unigram language-model scoring: each document gets
    the mean negative log-probability of its tokens under the corpus
    unigram distribution — the classic cheap fluency/quality proxy
    (high score = rare-token-heavy = boilerplate noise, OCR junk, or
    off-distribution text; low = stopword-heavy filler).

    Plan shape: one token explode feeding (a) a hash-agg vocab count
    and (b) a vocab join back to the token stream; the vocab (and the
    1-row corpus total) broadcast, so the scoring side never shuffles
    the corpus — only the final per-doc agg does. At 100 TB set
    broadcast_vocab=False if the distinct-token table outgrows the
    broadcast threshold (it becomes a plain shuffle equi-join), or
    pre-aggregate the vocab with a frequency cutoff.

    No OOV smoothing needed: the vocab is built from the corpus being
    scored, so every token has count >= 1. Sum goes through
    DECIMAL(38,6) (partition-order-proof); output rounded to 6 dp.

    The vocab is persisted (MEMORY_AND_DISK): it feeds both the
    broadcast join and the corpus-total aggregate, and without the
    cache each consumer would re-scan the corpus to rebuild it — at
    100 TB that third scan costs more than caching a distinct-token
    table ever can. LRU eviction reclaims it; callers scoring many
    corpora in one session can spark.catalog.clearCache().
    """
    from pyspark import StorageLevel

    from fegis_spark.operators.dedup import tokens

    tok = docs.select(
        F.col(id_col).alias("doc"), F.explode(tokens(F.col(text_col))).alias("t")
    )
    vocab = (
        tok.groupBy("t")
        .agg(F.count("*").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    total = vocab.agg(F.sum("cnt").alias("n"))
    # -ln p(t) is a function of the TOKEN TYPE alone, so it collapses
    # onto the vocab table: portable_ln (sqlfrag.py — bit-identical
    # cross-engine, unlike native ln's 1-ulp divergence) runs once per
    # distinct token, not once per occurrence, and rides the broadcast
    from fegis_spark.queries.sqlfrag import portable_ln

    nlv = (
        vocab.crossJoin(F.broadcast(total))  # bcast-ok: 1-row agg
        .select(
            "t",
            (F.col("cnt").cast("double") / F.col("n").cast("double")).alias("p"),
        )
        .select("t", (-F.expr(portable_ln("p", spark=True))).alias("nl"))
    )
    if broadcast_vocab:
        nlv = F.broadcast(nlv)  # bcast-ok: vocab table, caller-gated via broadcast_vocab (Heaps-sublinear; pass False at corpus scale)
    scored = tok.join(nlv, "t")
    return scored.groupBy("doc").agg(
        # decimal-exact SUM + count, not a rounded mean: sum/count can
        # land exactly on a .5e-6 midpoint where the engines' rounding
        # tie-breaks differ (the dsir_importance r7 incident class)
        F.sum(F.col("nl").cast("decimal(38,6)"))
        .cast("double")
        .alias("sum_neg_logprob"),
        F.count("*").alias("n_tokens"),
    )


def bigram_logprob(
    docs, text_col: str = "text", id_col: str = "doc_id",
    broadcast_vocab: bool = True,
):
    """Corpus bigram-LM scoring: each document (with ≥2 tokens) gets
    the mean -ln P(w2|w1) of its bigrams under the corpus conditional
    distribution P(w2|w1) = cnt(w1 w2) / cnt(w1 ·) — one step up the
    n-gram ladder from `unigram_logprob`, the standard repetition- and
    fluency-sensitive quality proxy (templated text scores low, token
    salad scores high). Self-trained, so no OOV smoothing is needed.

    Plan shape: one bigram explode feeds (a) the (w1, bigram) count
    table and, derived FROM that table without a second corpus scan,
    (b) the w1 context totals; both broadcast, so scoring is map-side
    and only the final per-doc agg shuffles the corpus. At 100 TB set
    broadcast_vocab=False when the distinct-bigram table outgrows the
    broadcast threshold. The bigram vocab persists (MEMORY_AND_DISK):
    it feeds both the context rollup and the scoring join.

    Determinism: per-bigram -ln goes through DECIMAL(38,6) before the
    per-doc sum (dsum rule); output rounded to 6 dp."""
    from pyspark import StorageLevel

    from fegis_spark.operators.dedup import tokens

    toks = docs.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("tok")
    ).where(F.size("tok") >= 2)
    # sequence(1, size-1) is safe here: size >= 2 keeps it ascending
    bg = toks.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tok") - 1),
                lambda i: F.struct(
                    F.element_at("tok", i).alias("w1"),
                    F.concat_ws(
                        " ", F.element_at("tok", i), F.element_at("tok", i + 1)
                    ).alias("b"),
                ),
            )
        ).alias("p"),
    ).select("doc", "p.w1", "p.b")
    vocab = (
        bg.groupBy("w1", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ctx = vocab.groupBy("w1").agg(F.sum("cnt").alias("ctx"))
    # -ln P(w2|w1) is a function of the BIGRAM TYPE alone (b encodes
    # w1), so it collapses onto the bigram vocab: portable_ln
    # (bit-identical cross-engine) runs once per distinct bigram, and
    # the corpus-side plan needs ONE broadcast join on b instead of
    # the former two (b, then w1)
    from fegis_spark.queries.sqlfrag import portable_ln

    nlv = (
        vocab.join(ctx, "w1")
        .select(
            "b",
            (F.col("cnt").cast("double") / F.col("ctx").cast("double")).alias("p"),
        )
        .select("b", (-F.expr(portable_ln("p", spark=True))).alias("nl"))
    )
    if broadcast_vocab:
        nlv = F.broadcast(nlv)  # bcast-ok: bigram vocab, caller-gated via broadcast_vocab
    scored = bg.join(nlv, "b")
    return scored.groupBy("doc").agg(
        F.sum(F.col("nl").cast("decimal(38,6)"))
        .cast("double")
        .alias("sum_neg_logprob"),
        F.count("*").alias("n_bigrams"),
    )


# ---------------------------------------------------------------------------
# F.expr fast paths: the Column builders above cross py4j once per
# operator (~150 calls, ~170 ms of driver time per lang_id plan); these
# generate the identical arithmetic as ONE Spark-SQL string from the
# same marker/stopword tables, so construction is a single call.
# Equivalence with the Column forms is pinned in tests; the DuckDB
# oracles are generated from the same tables and cannot drift.

PADDED_SPARK = r"' ' || lower(trim(regexp_replace({c}, '\\s+', ' '))) || ' '"
_TOKEN_WS_SPARK = (
    r"CASE WHEN trim({c}) = '' THEN 0 "
    r"ELSE size(split(trim({c}), '\\s+')) END"
)


def lang_id_expr(c: str) -> Column:
    """lang_id() as one generated Spark-SQL expression over column
    expression string `c` — same argmax, same tie order."""
    p = PADDED_SPARK.format(c=c)
    score = {
        lang: "(" + " + ".join(occurrences_sql(p, m) for m in markers) + ")"
        for lang, markers in LANG_MARKERS.items()
    }
    mx = "greatest(" + ", ".join(score[lang] for lang in LANG_ORDER) + ")"
    expr = f"'{LANG_ORDER[-1]}'"
    for lang in reversed(LANG_ORDER[:-1]):
        expr = f"CASE WHEN {score[lang]} = {mx} THEN '{lang}' ELSE {expr} END"
    return F.expr(expr)


def quality_score_expr(c: str) -> Column:
    """quality_score() as one generated Spark-SQL expression — same
    IEEE-double arithmetic, term for term."""
    p = PADDED_SPARK.format(c=c)
    stop_hits = " + ".join(occurrences_sql(p, f" {s} ") for s in STOPWORDS)
    n_tok = f"CAST(({_TOKEN_WS_SPARK.format(c=c)}) AS DOUBLE)"
    punct_ratio = (
        f"CASE WHEN length({c}) > 0 "
        f"THEN CAST(length({c}) - length(regexp_replace({c}, '[.,!?;:]', '')) AS DOUBLE)"
        f" / length({c}) ELSE 0.0 END"
    )
    return F.expr(
        f"round(0.4 * (CASE WHEN length({c}) BETWEEN 100 AND 10000 THEN 1.0 ELSE 0.0 END)"
        f" + 0.3 * greatest(0.0, 1.0 - ({punct_ratio}) * 5)"
        f" + 0.3 * (CASE WHEN ({n_tok}) > 0"
        f" THEN least(1.0, ({stop_hits}) / ({n_tok}) * 4)"
        f" ELSE 0.0 END), 6)"
    )


#: (pattern, replacement) pipeline for HTML → text, applied in order.
#: Regexes are RE2/Java-compatible ((?is) inline flags, no backrefs) so
#: Spark and DuckDB agree byte-for-byte. Entity unescape does &amp;
#: LAST, so "&amp;lt;" yields the literal text "&lt;" (correct double-
#: escape handling), and script/style bodies go before tag removal.
HTML_STRIP_STEPS: list[tuple[str, str]] = [
    (r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]+>", " "),
    (r"&nbsp;", " "),
    (r"&lt;", "<"),
    (r"&gt;", ">"),
    (r"&quot;", '"'),
    (r"&#39;", "'"),
    (r"&amp;", "&"),
    (r"\s+", " "),
]


def strip_html(col: Column) -> Column:
    """HTML/boilerplate → clean text: drop script/style bodies,
    comments, and tags; unescape the common entities; collapse
    whitespace. Regex-only (whole-stage codegen, zero shuffle) — the
    standard first pass over crawled corpora before quality/dedup.
    Mirrored in SQL by strip_html_sql from the same step table."""
    out = col
    for pat, rep in HTML_STRIP_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return F.trim(out)


def strip_html_sql(c: str) -> str:
    """DuckDB restatement generated from HTML_STRIP_STEPS — cannot
    drift. RE2 needs (?i) spelled inline and 'g' for global."""
    out = c
    for pat, rep in HTML_STRIP_STEPS:
        # RE2 lacks backreferences: expand the \1 closing-tag pattern
        if r"</\1" in pat:
            for tag in ("script", "style"):
                p = pat.replace(r"(script|style)", tag).replace(r"</\1", f"</{tag}")
                out = f"regexp_replace({out}, '{p}', ' ', 'g')"
            continue
        sq = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{pat}', '{sq}', 'g')"
    return f"trim({out})"


def lang_margin_expr(c: str) -> Column:
    """Language-ID confidence: top score minus runner-up score (the
    argmax margin). Ambiguous documents (margin ~ 0) are the ones a
    confidence-gated pipeline drops or routes to a real model. Same
    generated score fragments as lang_id_expr — one Spark-SQL string.
    """
    p = PADDED_SPARK.format(c=c)
    scores = [
        "(" + " + ".join(occurrences_sql(p, m) for m in LANG_MARKERS[lang]) + ")"
        for lang in LANG_ORDER
    ]
    arr = f"array_sort(array({', '.join(scores)}))"
    n = len(scores)
    return F.expr(f"element_at({arr}, {n}) - element_at({arr}, {n - 1})")


def lang_margin_sql(c: str) -> str:
    """DuckDB mirror of lang_margin_expr (list_sort + 1-based index)."""
    p = PADDED_SQL.format(c=c)
    scores = [
        "(" + " + ".join(occurrences_sql(p, m) for m in LANG_MARKERS[lang]) + ")"
        for lang in LANG_ORDER
    ]
    arr = f"list_sort([{', '.join(scores)}])"
    n = len(scores)
    return f"({arr}[{n}] - {arr}[{n - 1}])"


# ---------------------------------------------------------------------------
# Gopher-rule document filter (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", App. A1.1)
# — the standard pre-training hard-filter rule set: word-count window,
# mean-word-length window, symbol-to-word ratio (# and ellipsis),
# alphabetic-word fraction, and required-stopword presence. Document-
# level rules are generated for BOTH engines from one template
# (gopher_metrics_sql), so the catalog query and its DuckDB oracle
# cannot drift; the two line-level rules (bullet-start / ellipsis-end
# fractions) live in line_shape_metrics below because the synthetic
# corpus is single-line — they are exercised by constructed-corpus
# tests instead of a vacuous always-zero oracle column.
#
# Scale: pure per-row projection, zero shuffle, whole-stage codegen.

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MWL_LO = 3.0
GOPHER_MWL_HI = 10.0
GOPHER_MIN_ALPHA_FRAC = 0.8
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_STOPWORD_HITS = 2

#: output column order for the catalog query and its oracle
GOPHER_COLS = [
    "n_words",
    "mean_word_len",
    "frac_alpha_words",
    "symbol_ratio",
    "stopword_hits",
    "keep",
]


def gopher_metrics_sql(c: str, *, spark: bool) -> dict[str, str]:
    """SQL fragments for every Gopher document-level metric over text
    column expression `c`, in Spark-SQL (spark=True) or DuckDB
    (spark=False) dialect. Same arithmetic term for term: counts are
    integer, ratios are IEEE double rounded to 6 dp (per-row math, no
    aggregation, so the dsum rule does not apply); `keep` is emitted as
    INT 1/0 so value-hashing never depends on engine boolean repr."""
    if spark:
        words = f"regexp_extract_all({c}, '\\\\S+', 0)"
        n_words = f"size({words})"
        alpha = f"size(filter({words}, w -> w rlike '[A-Za-z]'))"
        nonws = f"length(regexp_replace({c}, '\\\\s', ''))"
        p = PADDED_SPARK.format(c=c)
    else:
        words = f"regexp_extract_all({c}, '\\S+')"
        n_words = f"len({words})"
        alpha = f"len(list_filter({words}, w -> regexp_matches(w, '[A-Za-z]')))"
        nonws = f"length(regexp_replace({c}, '\\s', '', 'g'))"
        p = PADDED_SQL.format(c=c)
    hash_cnt = f"(length({c}) - length(replace({c}, '#', '')))"
    ell_cnt = f"CAST((length({c}) - length(replace({c}, '...', ''))) / 3 AS BIGINT)"
    mwl = (
        f"(CASE WHEN {n_words} > 0 THEN "
        f"round(CAST({nonws} AS DOUBLE) / {n_words}, 6) ELSE 0.0 END)"
    )
    frac_alpha = (
        f"(CASE WHEN {n_words} > 0 THEN "
        f"round(CAST({alpha} AS DOUBLE) / {n_words}, 6) ELSE 0.0 END)"
    )
    symbol_ratio = (
        f"(CASE WHEN {n_words} > 0 THEN "
        f"round(CAST({hash_cnt} + {ell_cnt} AS DOUBLE) / {n_words}, 6) "
        f"ELSE 0.0 END)"
    )
    sw_hits = "(" + " + ".join(
        f"CASE WHEN {p} LIKE '% {s} %' THEN 1 ELSE 0 END" for s in STOPWORDS
    ) + ")"
    keep = (
        f"(CASE WHEN {n_words} BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS} "
        f"AND {mwl} BETWEEN {GOPHER_MWL_LO} AND {GOPHER_MWL_HI} "
        f"AND {frac_alpha} >= {GOPHER_MIN_ALPHA_FRAC} "
        f"AND {symbol_ratio} < {GOPHER_MAX_SYMBOL_RATIO} "
        f"AND {sw_hits} >= {GOPHER_MIN_STOPWORD_HITS} "
        f"THEN 1 ELSE 0 END)"
    )
    return {
        "n_words": f"CAST({n_words} AS BIGINT)",
        "mean_word_len": mwl,
        "frac_alpha_words": frac_alpha,
        "symbol_ratio": symbol_ratio,
        "stopword_hits": f"CAST({sw_hits} AS INT)",
        "keep": keep,
    }


# ---------------------------------------------------------------------------
# Line-level cleaning (library surface; the synthetic documents table
# is single-line, so a catalog oracle over it would be vacuous — these
# are pinned against a pure-Python reference on constructed multi-line
# corpora in tests/test_gopher.py instead).

#: substrings whose presence drops a line in C4-style cleaning
C4_BAD_SUBSTRINGS = ["lorem ipsum", "javascript", "{"]


def c4_clean_lines(col: Column, min_words: int = 5) -> Column:
    """C4-style line filter (Raffel et al. 2020 §2.2): keep lines that
    end in terminal punctuation, have >= min_words words, and contain
    none of C4_BAD_SUBSTRINGS (case-insensitive). Returns a struct
    (clean_text, n_lines_kept, n_lines_dropped). Pure array HOFs — one
    codegen span, zero shuffle, trivially map-only at 100 TB."""

    def ok(line: Column) -> Column:
        t = F.trim(line)
        w = F.size(F.regexp_extract_all(t, F.lit(r"\S+"), 0))
        low = F.lower(t)
        cond = t.rlike("[.!?\"']$") & (w >= min_words)
        for bad in C4_BAD_SUBSTRINGS:
            cond = cond & ~low.contains(bad)
        return cond

    lines = F.split(col, "\n")
    kept = F.filter(lines, ok)
    return F.struct(
        F.array_join(kept, "\n").alias("clean_text"),
        F.size(kept).alias("n_lines_kept"),
        (F.size(lines) - F.size(kept)).alias("n_lines_dropped"),
    )


def line_shape_metrics(col: Column) -> Column:
    """The two line-level Gopher rules: fraction of lines starting with
    a bullet and fraction ending with an ellipsis. Returns a struct
    (frac_bullet_lines, frac_ellipsis_lines), each rounded to 6 dp."""
    lines = F.split(col, "\n")
    n = F.size(lines)
    bullet = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike("^[-*•]"))
    )
    ell = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike("(\\.\\.\\.|…)$"))
    )
    return F.struct(
        F.when(n > 0, F.round(bullet / n, 6)).otherwise(0.0).alias("frac_bullet_lines"),
        F.when(n > 0, F.round(ell / n, 6)).otherwise(0.0).alias("frac_ellipsis_lines"),
    )


#: interpolated-KN smoothed probability over the bigram-type columns
#: (c, cv, n1v, n1w, n1tot) — ONE string valid in both SQL dialects
#: (all operands cast to DOUBLE, left-assoc division as spelled), so
#: the Spark plan and the DuckDB oracle share the exact IEEE DAG.
#: {d} is the discount spliced as an SQL snippet.
KN_P_SQL = (
    "(greatest(CAST(c AS DOUBLE) - {d}, 0.0e0) / CAST(cv AS DOUBLE))"
    " + (({d} * CAST(n1v AS DOUBLE) / CAST(cv AS DOUBLE))"
    " * (CAST(n1w AS DOUBLE) / CAST(n1tot AS DOUBLE)))"
)


def kn_bigram_logprob(
    docs, text_col: str = "text", id_col: str = "doc_id",
    broadcast_vocab: bool = True, discount: str = "CAST(0.75 AS DOUBLE)",
):
    """Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995;
    Chen & Goodman 1998 formulation) — the top rung of the repo's
    n-gram quality ladder:

        P(w2|w1) = max(c(w1,w2) - d, 0)/c(w1·)
                   + (d · N1+(w1·)/c(w1·)) · N1+(·w2)/N1+(··)

    The continuation probability N1+(·w2)/N1+(··) is what separates KN
    from naive backoff: a word seen often but only in one context
    ("Francisco") gets a LOW continuation weight. Self-trained on the
    corpus being scored, so every bigram has c >= 1 and the discount
    mass is always redistributable.

    Determinism: every term is a ratio of integer counts; the discount
    is a string LITERAL spliced identically into both engines (a
    derived 1-d constant would diverge in IEEE); the formula is
    spelled with the same association on both sides; -ln transits
    DECIMAL(38,6) before the per-doc mean.

    Plan: one bigram explode feeds the (w1, w2, bigram) count table —
    persisted; context totals, distinct-successor counts,
    distinct-predecessor counts and the 1-row N1+(··) all derive from
    it with NO second corpus scan — then scoring joins all four
    broadcast tables map-side; only the per-doc agg shuffles."""
    from pyspark import StorageLevel

    from fegis_spark.operators.dedup import tokens

    d = discount
    toks = docs.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("tok")
    ).where(F.size("tok") >= 2)
    bg = toks.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tok") - 1),
                lambda i: F.struct(
                    F.element_at("tok", i).alias("w1"),
                    F.element_at("tok", i + 1).alias("w2"),
                    F.concat_ws(
                        " ", F.element_at("tok", i), F.element_at("tok", i + 1)
                    ).alias("b"),
                ),
            )
        ).alias("p"),
    ).select("doc", "p.w1", "p.w2", "p.b")
    vocab = (
        bg.groupBy("w1", "w2", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ctx = vocab.groupBy("w1").agg(
        F.sum("c").alias("cv"), F.count("*").alias("n1v")
    )
    pred = vocab.groupBy("w2").agg(F.count("*").alias("n1w"))
    tot = vocab.agg(F.count("*").alias("n1tot"))
    if broadcast_vocab:
        ctx, pred, tot = F.broadcast(ctx), F.broadcast(pred), F.broadcast(tot)  # bcast-ok: vocab-derived stats, caller-gated via broadcast_vocab
    # the smoothed probability is a function of the BIGRAM TYPE alone
    # (b encodes w1 and w2), so the whole KN formula collapses onto
    # the vocab table: portable_ln (sqlfrag.py — bit-identical
    # cross-engine) runs once per distinct bigram, and the corpus side
    # needs ONE broadcast join on b instead of the former three
    from fegis_spark.queries.sqlfrag import portable_ln

    nlv = (
        vocab.join(ctx, "w1")
        .join(pred, "w2")
        .crossJoin(tot)  # bcast-ok: 1-row total agg
        .select("b", F.expr(KN_P_SQL.format(d=d)).alias("p"))
        .select("b", (-F.expr(portable_ln("p", spark=True))).alias("nl"))
    )
    if broadcast_vocab:
        nlv = F.broadcast(nlv)  # bcast-ok: bigram vocab, caller-gated via broadcast_vocab
    scored = bg.join(nlv, "b")
    # OUTPUT IS THE DECIMAL-EXACT SUM, NOT THE MEAN: sum/count can land
    # exactly on a .5e-6 rounding midpoint (observed once in 755k rows
    # at sf0.1), where Spark's BigDecimal HALF_UP and DuckDB's round
    # break the tie differently. The decimal sum cast to double is the
    # same nearest double on both engines — no division, no tie.
    return scored.groupBy("doc").agg(
        F.sum(F.col("nl").cast("decimal(38,6)")).cast("double").alias(
            "sum_neg_logprob_kn"
        ),
        F.count("*").alias("n_bigrams"),
    )
