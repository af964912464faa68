"""Text-analysis catalog queries ([EXT]): lang-id, quality, token
counts, fingerprints over `documents`. Every oracle is generated from
the same constant tables as the Column expressions (operators/
text_analysis.py) so the two sides cannot drift."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fegis_spark.catalog import register
from fegis_spark.model import load_table, maybe_broadcast, table_bytes
from fegis_spark.queries.sqlfrag import (
    HOT_CAP,
    duck_hot_docs,
    duck_tokens,
    portable_ln,
    spark_hot_docs,
)
from fegis_spark.operators.text_analysis import (
    FINGERPRINT_SQL,
    KN_P_SQL,
    TOKEN_COUNT_BPE_SQL,
    TOKEN_COUNT_WS_SQL,
    fingerprint,
    lang_id_expr,
    lang_id_sql,
    lang_margin_sql,
    quality_score_expr,
    quality_score_sql,
    token_count_bpe_ish,
    token_count_ws,
)


def _winnow_fp_cte(src: str, materialized: bool = False) -> str:
    """Shared base→g→fp winnowing CTE chain (tokens → 3-gram md5
    hashes → rightmost-minimum fingerprint selection over 4-windows),
    parameterized by source table so the three winnow_* oracles
    interpolate ONE recipe instead of hand-mirroring it (same pattern
    as _mh_pipeline_cte in queries/dedup.py). `materialized` marks the
    fp CTE AS MATERIALIZED for oracles that self-join it (DuckDB
    inlines plain CTEs, re-scanning parquet per reference)."""
    mat = " MATERIALIZED" if materialized else ""
    return f"""base AS (
      SELECT doc_id, {duck_tokens('text')} AS tok FROM {src}
    ), g AS (
      SELECT doc_id,
             list_transform(range(0, greatest(len(tok) - 2, 0)),
               i -> CAST(('0x' || substr(md5(array_to_string(
                      list_slice(tok, i + 1, i + 3), ' ')), 1, 15)) AS BIGINT))
               AS gh,
             least(4, greatest(len(tok) - 2, 0)) AS wlen
      FROM base
    ), fp AS{mat} (
      SELECT doc_id, len(gh) AS n_grams,
             CASE WHEN len(gh) = 0 THEN CAST([] AS BIGINT[]) ELSE
               list_distinct(list_transform(
                 list_distinct(list_transform(range(0, len(gh) - wlen + 1),
                   j -> list_max(list_filter(range(j, j + wlen),
                          p -> gh[p + 1] = list_min(
                                 list_slice(gh, j + 1, j + wlen)))))),
                 p -> gh[p + 1]))
             END AS fps
      FROM g
    )"""


@register(
    "text_lang_id",
    oracle=f"""
    SELECT doc_id, lang, {lang_id_sql('text')} AS predicted_lang
    FROM documents
    """,
    covers=("[EXT]-langid",),
    bench=True,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] n-gram/marker language ID — pure projection, zero shuffle;
    the stored lang column rides along so accuracy is inspectable."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", lang_id_expr("text").alias("predicted_lang"))


@register(
    "text_token_counts",
    oracle=f"""
    SELECT doc_id,
           {TOKEN_COUNT_WS_SQL.format(c='text')} AS n_tokens_ws,
           {TOKEN_COUNT_BPE_SQL.format(c='text')} AS n_tokens_bpe
    FROM documents
    """,
    covers=("[EXT]-tokens",),
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] whitespace + BPE-ish pre-tokenizer counts."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count_ws(F.col("text")).cast("bigint").alias("n_tokens_ws"),
        token_count_bpe_ish(F.col("text")).cast("bigint").alias("n_tokens_bpe"),
    )


@register(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id, {quality_score_sql('text')} AS quality
    FROM documents
    """,
    covers=("[EXT]-quality",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] composite quality heuristic (length window, punctuation
    density, stopword presence)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", quality_score_expr("text").alias("quality"))


@register(
    "text_fingerprint",
    oracle=f"""
    SELECT doc_id, {FINGERPRINT_SQL.format(c='text')} AS fp
    FROM documents
    """,
    covers=("[EXT]-fingerprint",),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] polynomial rolling-hash fingerprint over codepoints."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


@register(
    "winnow_fingerprints",
    oracle=f"""
    WITH {_winnow_fp_cte('documents')}
    SELECT doc_id, n_grams,
           len(fps) AS n_fp,
           COALESCE(list_aggregate(fps, 'bit_xor'), 0) AS fp_xor,
           CASE WHEN n_grams > 0
                THEN round(len(fps)::DOUBLE / n_grams, 6) ELSE 0.0 END
             AS fp_density
    FROM fp
    """,
    covers=("[EXT]-winnow", "[EXT]-fingerprint"),
)
def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] winnowing fingerprints (Schleimer et al. 2003 — the MOSS
    algorithm): rightmost-minimum selection over every 4-window of
    3-token-gram hashes, the guarantee-carrying alternative to MinHash
    for local-match detection (any shared 6-token run collides). Pure
    projection, zero shuffle; per-doc (count, XOR, density) summary is
    the hash-checkable surface, the fingerprint arrays themselves are
    the index a cross-doc match join would explode. Pinned against a
    sequential reference on constructed corpora in tests/test_winnow.py."""
    from fegis_spark.operators.text_analysis import winnow_fingerprints as wf

    return wf(load_table(spark, sf_dir, "documents"))


@register(
    "winnow_match_pairs",
    oracle=f"""
    WITH {_winnow_fp_cte('documents', materialized=True)}, ex AS (
      SELECT doc_id, len(fps) AS n_fp, unnest(fps) AS h FROM fp
    )
    SELECT l.doc_id AS doc_l, r.doc_id AS doc_r,
           COUNT(*) AS n_shared,
           round(COUNT(*)::DOUBLE
                 / (any_value(l.n_fp) + any_value(r.n_fp) - COUNT(*)), 6)
             AS fp_jaccard
    FROM ex l JOIN ex r ON l.h = r.h AND l.doc_id < r.doc_id
    GROUP BY l.doc_id, r.doc_id
    """,
    covers=("[EXT]-winnow-match", "K9-jaccard"),
)
def winnow_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] cross-document winnowing matches (what MOSS reports):
    document pairs sharing selected fingerprints with the shared count
    and fingerprint-set Jaccard. The winnowing guarantee makes this
    exhaustive for local matches — every pair sharing a >= 6-token run
    appears, with no MinHash-style false negatives. Candidate pairs
    come only from shared-fingerprint buckets (LSH-shaped equi-join);
    the fingerprint-set projection is persisted so the self-join's two
    sides don't redo the winnowing scan. winnow_match_capped is the
    100 TB form: the same join under the hot-fingerprint cap."""
    from fegis_spark.operators.text_analysis import winnow_match_pairs as wmp

    return wmp(load_table(spark, sf_dir, "documents"))


@register(
    "winnow_match_capped",
    oracle=f"""
    WITH docs2 AS ({duck_hot_docs()}),
    {_winnow_fp_cte('docs2', materialized=True)}, sized AS MATERIALIZED (
      SELECT doc_id, n_fp, h,
             COUNT(*) OVER (PARTITION BY h) AS bs,
             MIN(doc_id) OVER (PARTITION BY h) AS rep_id,
             first_value(n_fp) OVER (PARTITION BY h ORDER BY doc_id) AS rep_nfp
      FROM (SELECT doc_id, len(fps) AS n_fp, unnest(fps) AS h FROM fp)
    ), cand AS (
      SELECT l.doc_id AS doc_l, l.n_fp AS n_l,
             r.doc_id AS doc_r, r.n_fp AS n_r
      FROM sized l JOIN sized r ON l.h = r.h AND l.doc_id < r.doc_id
      WHERE l.bs <= {HOT_CAP}
      UNION ALL
      SELECT rep_id, rep_nfp, doc_id, n_fp FROM sized
      WHERE bs > {HOT_CAP} AND doc_id <> rep_id
    )
    SELECT doc_l, doc_r, COUNT(*) AS n_shared,
           round(COUNT(*)::DOUBLE
                 / (any_value(n_l) + any_value(n_r) - COUNT(*)), 6)
             AS fp_jaccard
    FROM cand GROUP BY doc_l, doc_r
    """,
    covers=("[EXT]-winnow-match", "K9-jaccard"),
)
def winnow_match_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] winnowing match join under the hot-fingerprint cap — the
    100 TB form of winnow_match_pairs, with the cap EXERCISED under
    the oracle (r5 verdict #1/#5): a deterministic boilerplate
    template injected into every 5th document makes each of its
    fingerprints a 100+-member bucket (1000+ at sf0.1), far over
    max_bucket_size=32, so over-cap hashes route through their min-doc
    representative (m-1 star candidates instead of m²/2) while small
    buckets keep exact pairwise counts. The DuckDB oracle replays the
    SAME routing (window bucket-size + min-doc rep + first_value
    rep-size, small self-join UNION star rows) value-for-value —
    per-pair n_shared counts exactly the fingerprints that generated
    each candidate on both engines. Audit surface:
    operators/text_analysis.winnow_bucket_stats."""
    from fegis_spark.operators.text_analysis import winnow_match_pairs as wmp

    return wmp(
        spark_hot_docs(load_table(spark, sf_dir, "documents")),
        max_bucket_size=HOT_CAP,
    )


@register(
    "corpus_distinct_ngrams",
    oracle=f"""
    WITH base AS (
      SELECT lang, {duck_tokens('text')} AS tok FROM documents
    ), g AS (
      SELECT lang, 1 AS n, unnest(tok) AS gram FROM base
      UNION ALL
      SELECT lang, 2 AS n,
             array_to_string(list_slice(tok, i + 1, i + 2), ' ') AS gram
      FROM base, unnest(range(0, greatest(len(tok) - 1, 0))) AS t(i)
      UNION ALL
      SELECT lang, 3 AS n,
             array_to_string(list_slice(tok, i + 1, i + 3), ' ') AS gram
      FROM base, unnest(range(0, greatest(len(tok) - 2, 0))) AS t(i)
    )
    SELECT lang, n,
           COUNT(*) AS total_grams,
           COUNT(DISTINCT gram) AS distinct_grams,
           round(COUNT(DISTINCT gram)::DOUBLE / COUNT(*), 6) AS distinct_ratio
    FROM g GROUP BY lang, n
    """,
    covers=("[EXT]-diversity", "§2.4-agg"),
)
def corpus_distinct_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] distinct-n diversity (Li et al. 2016): per-language ratio
    of distinct to total 1/2/3-grams — the standard corpus-diversity
    metric (low distinct-2/3 = templated or repetitive text; also the
    metric used to audit synthetic-data collapse). One corpus scan:
    both shingle sizes come from Scala NGram stages chained on one
    token projection (codegen'd, ~15× the HOF chain — CLAUDE.md perf
    rule), tagged by size and exploded once; exact distinct counts use
    Spark's two-level partial agg, so no (lang, n) group funnels
    through one task unsplit."""
    from pyspark.ml.feature import NGram

    from fegis_spark.operators.dedup import tokens

    base = load_table(spark, sf_dir, "documents").select(
        "lang", tokens(F.col("text")).alias("tok")
    )
    ng2 = NGram(n=2, inputCol="tok", outputCol="g2")
    ng3 = NGram(n=3, inputCol="tok", outputCol="g3")
    with_grams = ng3.transform(ng2.transform(base))
    tagged = F.concat(
        F.transform(F.col("tok"), lambda t: F.concat(F.lit("1|"), t)),
        F.transform(F.col("g2"), lambda g: F.concat(F.lit("2|"), g)),
        F.transform(F.col("g3"), lambda g: F.concat(F.lit("3|"), g)),
    )
    return (
        with_grams.select("lang", F.explode(tagged).alias("g"))
        .groupBy("lang", F.substring("g", 1, 1).cast("int").alias("n"))
        .agg(
            F.count("*").alias("total_grams"),
            F.count_distinct("g").alias("distinct_grams"),
            F.round(F.count_distinct("g") / F.count("*"), 6).alias("distinct_ratio"),
        )
    )


@register(
    "curation_pipeline",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, source, n_chars,
             {quality_score_sql('text')} AS quality,
             {lang_id_sql('text')} AS predicted_lang,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS content_hash
      FROM documents
    ), kept AS (
      SELECT * FROM scored
      WHERE quality >= 0.5 AND predicted_lang = lang
    ), deduped AS (
      SELECT content_hash,
             arg_min(lang, doc_id) AS lang,
             arg_min(n_chars, doc_id) AS n_chars,
             arg_min(quality, doc_id) AS quality
      FROM kept GROUP BY content_hash
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CAST(quality AS DECIMAL(38,6))) AS DOUBLE) AS sum_quality
    FROM deduped
    GROUP BY lang
    """,
    covers=("[EXT]-curation", "K9-exact", "[EXT]-langid", "[EXT]-quality"),
    bench=True,
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] the end-to-end training-data curation flagship: quality
    gate → lang-consistency gate → exact dedup → per-language corpus
    stats. The dedup representative is picked with min(struct(...)),
    not a groupBy+join-back — one scan and exactly two shuffles
    (content_hash, then lang) at any scale; measured 1.5× faster than
    the join-back form at sf0.1.

    The scored projection (~64 bytes/row, ~1% of corpus width) is
    persisted MEMORY_AND_DISK as a deliberate pushdown barrier: without
    it Catalyst pushes the quality/lang gates below the projection,
    which (a) evaluates both megaexpressions twice per surviving row
    and (b) makes the combined filter+project stage blow janino's 64KB
    method limit, disabling whole-stage codegen for the hottest stage.
    Split this way each stage codegens and the expressions run once —
    measured 1.6× faster at sf0.1 (3.0s → 1.9s). At warehouse scale
    you would materialize to a scratch table instead. The returned plan
    still references the cache, so the operator cannot unpersist it; it
    stays until LRU eviction or spark.catalog.clearCache() (the
    repo-wide cache-ownership policy)."""
    from pyspark import StorageLevel

    from fegis_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        quality_score_expr("text").alias("quality"),
        lang_id_expr("text").alias("predicted_lang"),
        F.md5(normalize_text(F.col("text"))).alias("content_hash"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    kept = scored.filter(
        (F.col("quality") >= 0.5) & (F.col("predicted_lang") == F.col("lang"))
    )
    deduped = kept.groupBy("content_hash").agg(
        F.min(F.struct("doc_id", "lang", "n_chars", "quality")).alias("rep")
    )
    return (
        deduped.select("rep.*")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.col("quality").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_quality"),
        )
    )


@register(
    "boilerplate_ngrams",
    oracle=f"""
    WITH base AS (
      SELECT doc_id AS doc,
             list_distinct(list_transform(range(0, len(tok)-7),
                           i -> array_to_string(list_slice(tok, i+1, i+8), ' '))) AS sh
      FROM (SELECT *, {duck_tokens('text')} AS tok
            FROM documents)
      WHERE len(tok) >= 8
    )
    SELECT g, n_docs FROM (
      SELECT g, count(*) AS n_docs
      FROM (SELECT doc, unnest(sh) AS g FROM base)
      GROUP BY g
    ) WHERE n_docs >= 3
    ORDER BY n_docs DESC, g
    LIMIT 20
    """,
    covers=("[EXT]-boilerplate", "[EXT]-text-stats"),
)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] boilerplate detection: the 8-token-grams repeated across
    the most documents (headers, footers, licence blurbs — the strings
    a curation pass strips corpus-wide). Shingles are distinct per doc
    so the count is docs-containing, not occurrences. One partial+final
    agg on the gram, then TakeOrderedAndProject for the top-20 — the
    full gram table never sorts."""
    from fegis_spark.operators.dedup import with_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = with_shingles(docs, "text", "doc_id", n=8)
    return (
        sh.select(F.explode("sh").alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 3)
        .orderBy(F.desc("n_docs"), F.asc("g"))
        .limit(20)
    )


@register(
    "doc_repetition",
    oracle=f"""
    SELECT doc_id, n_grams, n_distinct,
           1.0 - n_distinct / CAST(n_grams AS DOUBLE) AS repetition
    FROM (
      SELECT doc_id,
             len(tok) - 2 AS n_grams,
             len(list_distinct(list_transform(range(0, len(tok)-2),
                 i -> array_to_string(list_slice(tok, i+1, i+3), ' ')))) AS n_distinct
      FROM (SELECT doc_id, {duck_tokens('text')} AS tok
            FROM documents)
      WHERE len(tok) >= 3
    )
    """,
    covers=("[EXT]-repetition", "[EXT]-quality"),
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] intra-document repetition ratio (Gopher-rule style):
    1 - distinct/total token 3-grams. High values flag looping or
    boilerplate-stuffed docs that survive inter-doc dedup. Per-row
    projection through the Scala NGram transformer — no shuffle."""
    from pyspark.ml.feature import NGram

    from fegis_spark.operators.dedup import tokens

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", tokens(F.col("text")).alias("tok"))
    ng = NGram(n=3, inputCol="tok", outputCol="g")
    out = (
        ng.transform(base)
        .filter(F.size("tok") >= 3)
        .select(
            "doc_id",
            (F.size("tok") - 2).cast("bigint").alias("n_grams"),
            F.size(F.array_distinct("g")).cast("bigint").alias("n_distinct"),
        )
    )
    # UNROUNDED: exact-integer operands make the IEEE divide/subtract
    # bit-identical cross-engine; round(x, 6) would put the ratio in
    # the .5e-6 midpoint tie-break class
    return out.withColumn(
        "repetition",
        1.0 - F.col("n_distinct") / F.col("n_grams").cast("double"),
    )


@register(
    "tokenize_unicode_zh",
    oracle=f"""
    SELECT doc_id,
           len(toks) AS n_tokens,
           array_to_string(toks[1:8], '|') AS head_tokens
    FROM (
      SELECT doc_id, {duck_tokens("'语言模型训练 données Ausführung ' || text")} AS toks
      FROM documents WHERE lang = 'zh'
    )
    ORDER BY doc_id
    """,
    covers=("[EXT]-unicode-tokens",),
)
def tokenize_unicode_zh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] cross-engine Unicode tokenization proof over the zh slice:
    a mixed-script prefix (Han + accented Latin) is tokenized together
    with each document. Han codepoints must come out as single-char
    tokens (6 of them) and accented words must survive whole — the
    behaviors the old ASCII-only [^a-z0-9]+ tokenizer destroyed. Pure
    projection, zero shuffle; hash-matched against the DuckDB mirror of
    the same recipe."""
    from fegis_spark.operators.dedup import tokens

    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "zh")
    toks = tokens(F.concat(F.lit("语言模型训练 données Ausführung "), F.col("text")))
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.concat_ws("|", F.slice(toks, 1, 8)).alias("head_tokens"),
    ).orderBy("doc_id")


@register(
    "text_unigram_logprob",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({duck_tokens('text')}) AS t FROM documents
    ),
    vocab AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t),
    tot AS (SELECT sum(cnt) AS n FROM vocab),
    nlv AS (
      SELECT t, -{portable_ln('p')} AS nl FROM (
        SELECT t, CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE) AS p
        FROM vocab CROSS JOIN tot
      )
    ),
    scored AS (
      SELECT doc_id, nl FROM tok JOIN nlv USING (t)
    )
    SELECT doc_id AS doc,
           CAST(SUM(CAST(nl AS DECIMAL(38,6))) AS DOUBLE) AS sum_neg_logprob,
           COUNT(*) AS n_tokens
    FROM scored GROUP BY doc_id
    """,
    covers=("[EXT]-unigram-lm",),
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] corpus-unigram LM scoring — mean -ln p(token) per document,
    the cheap fluency/quality proxy used by e.g. CCNet-style filters
    ahead of model-based scoring. Vocab + corpus total broadcast; the
    corpus side never shuffles until the per-doc agg."""
    from fegis_spark.operators.text_analysis import unigram_logprob

    return unigram_logprob(load_table(spark, sf_dir, "documents"))


@register(
    "doc_novelty",
    oracle=f"""
    WITH base AS (
      SELECT doc_id AS doc,
             list_distinct(list_transform(range(0, len(tok)-2),
                           i -> array_to_string(list_slice(tok, i+1, i+3), ' '))) AS sh
      FROM (SELECT *, {duck_tokens('text')} AS tok FROM documents)
      WHERE len(tok) >= 3
    ), ex AS (SELECT doc, unnest(sh) AS g FROM base),
    freq AS (SELECT g, count(*) AS n_docs FROM ex GROUP BY g)
    SELECT doc,
           count(*) AS n_grams,
           CAST(SUM(CASE WHEN n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
    FROM ex JOIN freq USING (g)
    GROUP BY doc
    """,
    covers=("[EXT]-novelty",),
)
def doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] shingle novelty — fraction of a doc's distinct 3-gram
    shingles that occur in NO other document. Low novelty = boilerplate
    / near-dup material (complements dedup: a graded signal instead of
    a pair threshold). Same shuffle family as boilerplate_ngrams: one
    gram hash-agg + one equi-join back to the exploded grams; grams are
    distinct per doc so df(g) is a plain count."""
    from fegis_spark.operators.dedup import with_shingles

    sh = with_shingles(load_table(spark, sf_dir, "documents"), "text", "doc_id")
    ex = sh.select("doc", F.explode("sh").alias("g"))
    freq = ex.groupBy("g").agg(F.count("*").alias("n_docs"))
    return (
        ex.join(freq, "g")
        .groupBy("doc")
        .agg(
            F.count("*").alias("n_grams"),
            # exact integer numerator, not round(ratio, 6): a count
            # ratio can land on a .5e-6 midpoint where the engines'
            # rounding tie-breaks diverge (the r5/r7 midpoint class)
            F.sum(F.when(F.col("n_docs") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_unique"),
        )
    )


@register(
    "quality_median_gate",
    oracle=f"""
    WITH scored AS (
      SELECT lang, {quality_score_sql('text')} AS q FROM documents
    ), med AS (
      SELECT lang, quantile_cont(q, 0.5) AS med FROM scored GROUP BY lang
    )
    SELECT s.lang, COUNT(*) FILTER (WHERE s.q > m.med) AS n_above,
           COUNT(*) AS n_docs, m.med AS median_q
    FROM scored s JOIN med m USING (lang)
    GROUP BY s.lang, m.med
    """,
    covers=("[EXT]-quality", "§2.4-quantiles"),
)
def quality_median_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] per-language EXACT median quality gate — the adaptive
    cousin of fixed-threshold filtering: each stratum keeps its
    above-median half regardless of drift. Spark's exact percentile()
    and DuckDB's quantile_cont share linear interpolation, so even the
    medians hash-match. The scored projection (lang, q — ~16 B/row)
    persists: it feeds the median agg AND the gate, and re-deriving it
    would re-run the quality expression over the corpus twice. The
    cache entry outlives the call (LRU eviction or
    spark.catalog.clearCache() reclaims it — repo-wide policy)."""
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang", quality_score_expr("text").alias("q")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    med = scored.groupBy("lang").agg(F.expr("percentile(q, 0.5)").alias("med"))
    return (
        scored.join(F.broadcast(med), "lang")  # bcast-ok: one row per lang (bounded enum)
        .groupBy("lang", "med")
        .agg(
            F.sum(F.when(F.col("q") > F.col("med"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_above"),
            F.count("*").alias("n_docs"),
        )
        # UNROUNDED median: the interpolation is bitwise-identical
        # cross-engine (percentile==quantile_cont pin) — round(x, 6)
        # would reintroduce the midpoint tie-break class
        .select("lang", "n_above", "n_docs", F.col("med").alias("median_q"))
    )


@register(
    "text_lang_confidence",
    oracle=f"""
    SELECT doc_id, {lang_id_sql('text')} AS predicted_lang,
           round({lang_margin_sql('text')}, 6) AS margin
    FROM documents
    """,
    covers=("[EXT]-langid",),
)
def text_lang_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] language ID with argmax margin — the confidence signal a
    gated pipeline thresholds on (margin ~ 0 = ambiguous, route to a
    real model or drop). Pure projection, zero shuffle."""
    from fegis_spark.operators.text_analysis import lang_margin_expr

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        lang_id_expr("text").alias("predicted_lang"),
        F.round(lang_margin_expr("text"), 6).alias("margin"),
    )


_EMAIL_RE = r"[a-z0-9#._-]+@[a-z0-9.-]+\.[a-z][a-z]+"
_PHONE_RE = r"[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"


@register(
    "pii_scrub",
    oracle=f"""
    WITH synth AS (
      SELECT c_mktsegment,
             c_name || ' (' || c_mktsegment || ') contact ' ||
             CASE WHEN c_custkey % 2 = 0
                  THEN lower(replace(c_name, ' ', '.')) || '@example.com '
                  ELSE '' END ||
             CASE WHEN c_custkey % 3 > 0
                  THEN printf('%02d-%03d-%03d-%04d',
                              10 + c_nationkey % 90, c_custkey % 1000,
                              (c_custkey * 7) % 1000, (c_custkey * 31) % 10000)
                  ELSE 'no phone' END AS txt
      FROM customer
    ), det AS (
      SELECT c_mktsegment, txt,
             len(regexp_extract_all(txt, '{_EMAIL_RE}')) AS ne,
             len(regexp_extract_all(txt, '{_PHONE_RE}')) AS np,
             regexp_replace(regexp_replace(txt, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                            '{_PHONE_RE}', '[PHONE]', 'g') AS red
      FROM synth
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_rows,
           CAST(SUM(ne) AS BIGINT) AS n_emails,
           CAST(SUM(np) AS BIGINT) AS n_phones,
           CAST(SUM(length(txt) - length(red)) AS BIGINT) AS chars_redacted
    FROM det GROUP BY c_mktsegment
    """,
    covers=("[EXT]-pii",),
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] PII detection + redaction — the scrubbing pass every
    training corpus gets before packing. The documents table carries no
    real PII (TESTDATA.md), so the query synthesizes a contact blurb
    deterministically from customer keys on BOTH engines (printf phone,
    name-derived email), then detects and redacts with portable
    regexes (character classes + bounded repetition only — identical
    under Java regex and RE2). Pure codegen projection + one agg
    shuffle; at 100 TB the redaction is a map-only pass over the scan
    with no shuffle at all."""
    c = load_table(spark, sf_dir, "customer")
    phone = F.format_string(
        "%02d-%03d-%03d-%04d",
        (F.lit(10) + F.col("c_nationkey") % 90).cast("int"),
        (F.col("c_custkey") % 1000).cast("int"),
        ((F.col("c_custkey") * 7) % 1000).cast("int"),
        ((F.col("c_custkey") * 31) % 10000).cast("int"),
    )
    email = F.concat(
        F.lower(F.regexp_replace(F.col("c_name"), " ", ".")), F.lit("@example.com ")
    )
    txt = F.concat(
        F.col("c_name"),
        F.lit(" ("),
        F.col("c_mktsegment"),
        F.lit(") contact "),
        F.when(F.col("c_custkey") % 2 == 0, email).otherwise(F.lit("")),
        F.when(F.col("c_custkey") % 3 > 0, phone).otherwise(F.lit("no phone")),
    )
    red = F.regexp_replace(
        F.regexp_replace(txt, _EMAIL_RE, "[EMAIL]"), _PHONE_RE, "[PHONE]"
    )
    det = c.select(
        "c_mktsegment",
        txt.alias("txt"),
        F.regexp_count(txt, F.lit(_EMAIL_RE)).alias("ne"),
        F.regexp_count(txt, F.lit(_PHONE_RE)).alias("np"),
        red.alias("red"),
    )
    return det.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_rows"),
        F.sum("ne").cast("bigint").alias("n_emails"),
        F.sum("np").cast("bigint").alias("n_phones"),
        F.sum(F.length("txt") - F.length("red")).cast("bigint").alias("chars_redacted"),
    )


@register(
    "text_bigram_logprob",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {duck_tokens('text')} AS tok FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tok)), i -> tok[i])) AS w1,
             unnest(list_transform(range(1, len(tok)),
                                   i -> tok[i] || ' ' || tok[i+1])) AS b
      FROM base WHERE len(tok) >= 2
    ), vocab AS (
      SELECT w1, b, count(*) AS cnt FROM bg GROUP BY w1, b
    ), ctx AS (
      SELECT w1, sum(cnt) AS ctx FROM vocab GROUP BY w1
    ), nlv AS (
      SELECT b, -{portable_ln('p')} AS nl FROM (
        SELECT b, CAST(cnt AS DOUBLE) / CAST(ctx AS DOUBLE) AS p
        FROM vocab JOIN ctx USING (w1)
      )
    ), scored AS (
      SELECT bg.doc_id, nl FROM bg JOIN nlv USING (b)
    )
    SELECT doc_id AS doc,
           CAST(SUM(CAST(nl AS DECIMAL(38,6))) AS DOUBLE) AS sum_neg_logprob,
           COUNT(*) AS n_bigrams
    FROM scored GROUP BY doc_id
    """,
    covers=("[EXT]-bigram-lm",),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] corpus bigram-LM scoring — mean -ln P(w2|w1) per document,
    the next rung above `text_unigram_logprob` on the n-gram quality
    ladder (sensitive to token-order scrambling that unigram scores
    cannot see). Bigram vocab + context totals broadcast; the corpus
    side stays map-side until the per-doc agg."""
    from fegis_spark.operators.text_analysis import bigram_logprob

    return bigram_logprob(load_table(spark, sf_dir, "documents"))


@register(
    "text_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({duck_tokens('text')}) AS t FROM documents
    ), cnt AS (
      SELECT t, count(*) AS cnt FROM tok GROUP BY t
    ), tot AS (
      SELECT sum(cnt) AS n FROM cnt
    )
    SELECT t, cnt FROM cnt, tot WHERE cnt * 40 > n
    ORDER BY cnt DESC, t
    """,
    covers=("[EXT]-heavy-hitters",),
)
def text_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] exact corpus heavy hitters (tokens with count·k > total,
    k=40) through the Misra-Gries sketch-then-verify pipeline: bounded
    per-partition summaries propose candidates, an exact broadcast
    recount confirms — so the output equals the brute-force GROUP BY
    answer (which is precisely what the oracle runs) while the Spark
    plan never materializes the full vocabulary on one node."""
    from fegis_spark.operators.dedup import tokens
    from fegis_spark.operators.sketches import heavy_hitters

    docs = load_table(spark, sf_dir, "documents")
    stream = docs.select(F.explode(tokens(F.col("text"))).alias("t"))
    return heavy_hitters(stream, "t", k=40)


@register(
    "text_keywords_tfidf",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({duck_tokens('text')}) AS t FROM documents
    ), tf AS (
      SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t
    ), df AS (
      SELECT t, count(*) AS df FROM tf GROUP BY t
    ), nd AS (
      SELECT count(DISTINCT doc_id) AS n_docs FROM tf
    ), idf AS (
      SELECT t, {portable_ln('arg')} + 1.0e0 AS idf FROM (
        SELECT t, (n_docs + 1.0e0) / (df + 1.0e0) AS arg
        FROM df CROSS JOIN nd
      )
    ), scored AS (
      SELECT tf.doc_id AS doc, tf.t, tf.tf, tf.tf * idf AS score
      FROM tf JOIN idf USING (t)
    ), ranked AS (
      SELECT doc, t, tf, score,
             row_number() OVER (PARTITION BY doc ORDER BY score DESC, t) AS rank
      FROM scored
    )
    SELECT doc, t, tf, score, rank FROM ranked WHERE rank <= 3
    """,
    covers=("[EXT]-keywords",),
)
def text_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] per-document keyword extraction: top-3 terms by smoothed
    TF-IDF (sklearn-style idf = ln((N+1)/(df+1)) + 1). One token
    explode feeds the (doc, term) tf table, which persists and feeds
    BOTH the document-frequency rollup and the scoring join — the
    corpus is scanned once. idf collapses onto the df table via
    portable_ln (bit-identical cross-engine), so scores ship UNROUNDED
    and the (score DESC, t) rank order is cross-engine total; ranking
    is a per-doc window over ≤ distinct-terms-per-doc rows."""
    from pyspark import StorageLevel
    from pyspark.sql import Window

    from fegis_spark.operators.dedup import tokens

    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select(F.col("doc_id").alias("doc"), F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("doc", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    df_tbl = tf.groupBy("t").agg(F.count(F.lit(1)).alias("df"))
    nd = tf.agg(F.countDistinct("doc").alias("n_docs"))
    # idf is a function of the TERM alone, so it collapses onto the df
    # table (portable_ln — bit-identical cross-engine — runs per
    # distinct term); tf·idf of identical operands is then an exact
    # IEEE multiply, so the score ships UNROUNDED (midpoint class)
    idf = (
        df_tbl.crossJoin(F.broadcast(nd))  # bcast-ok: 1-row agg
        .select(
            "t",
            ((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)).alias("arg"),
        )
        .select("t", (F.expr(portable_ln("arg", spark=True)) + 1.0).alias("idf"))
    )
    # idf table is vocab-sized (Heaps-sublinear but unbounded):
    # size-gate on the corpus bytes — AQE decides over the gate
    scored = tf.join(
        maybe_broadcast(idf, table_bytes(sf_dir, "documents")), "t"
    ).select(
        "doc", "t", "tf", (F.col("tf") * F.col("idf")).alias("score")
    )
    # grpwin-ok: doc cardinality scales with input
    w = Window.partitionBy("doc").orderBy(F.desc("score"), F.asc("t"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("doc", "t", "tf", "score", "rank")
    )


from fegis_spark.operators.text_analysis import GOPHER_COLS, gopher_metrics_sql

_GOPHER_SPARK = gopher_metrics_sql("text", spark=True)
_GOPHER_DUCK = gopher_metrics_sql("text", spark=False)


@register(
    "gopher_quality_filter",
    oracle="SELECT doc_id, "
    + ", ".join(f"{_GOPHER_DUCK[k]} AS {k}" for k in GOPHER_COLS)
    + " FROM documents",
    covers=("[EXT]-gopher",),
)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Gopher hard-filter rule set (Rae et al. 2021 App. A1.1):
    word-count window, mean-word-length window, symbol-to-word ratio,
    alphabetic-word fraction, required-stopword presence, and the
    conjunctive keep flag — per-document metrics a curation pipeline
    gates on before dedup. Spark side and DuckDB oracle are generated
    from ONE fragment template (gopher_metrics_sql), so they cannot
    drift; pure projection, zero shuffle, whole-stage codegen. The two
    line-level Gopher rules are library-only (single-line corpus —
    see operators/text_analysis.py line_shape_metrics + tests)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", *[F.expr(_GOPHER_SPARK[k]).alias(k) for k in GOPHER_COLS]
    )


@register(
    "langid_confusion",
    oracle=f"""
    WITH pred AS (
      SELECT lang, {lang_id_sql('text')} AS predicted_lang FROM documents
    ), cells AS (
      SELECT lang, predicted_lang, COUNT(*) AS n
      FROM pred GROUP BY lang, predicted_lang
    ), tot AS (
      SELECT lang, CAST(SUM(n) AS BIGINT) AS lang_n FROM cells GROUP BY lang
    )
    SELECT c.lang, c.predicted_lang, c.n,
           c.n / CAST(t.lang_n AS DOUBLE) AS frac
    FROM cells c JOIN tot t USING (lang)
    """,
    covers=("[EXT]-langid",),
)
def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] lang-id confusion matrix: stored label × predicted label
    with per-label row fractions — the evaluation artifact that turns
    the heuristic's accuracy into an inspectable table (which languages
    leak into which). One pure-codegen prediction projection into a
    |langs|² hash agg; row totals derive from the persisted cells (no
    second scan); integer-ratio fractions."""
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    cells = (
        docs.select("lang", lang_id_expr("text").alias("predicted_lang"))
        .groupBy("lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = cells.groupBy("lang").agg(F.sum("n").cast("bigint").alias("lang_n"))
    # UNROUNDED exact-integer ratio (bit-identical IEEE divide); see
    # CLAUDE.md on the round(k/n, 6) midpoint class
    return cells.join(F.broadcast(tot), "lang").select(  # bcast-ok: one row per lang
        "lang",
        "predicted_lang",
        "n",
        (F.col("n") / F.col("lang_n").cast("double")).alias("frac"),
    )


@register(
    "quality_percent_rank",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, {quality_score_sql('text')} AS quality FROM documents
    )
    SELECT doc_id, source, quality,
           PERCENT_RANK() OVER (
             PARTITION BY source ORDER BY quality, doc_id
           ) AS q_rank
    FROM scored
    """,
    covers=("[EXT]-quality", "§2.5-window"),
)
def quality_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] per-source quality calibration: percent_rank of each
    document's quality WITHIN its source — the normalization that makes
    a single keep-threshold comparable across sources whose raw score
    distributions differ (web crawl vs curated). Window is partitioned
    by source with a (quality, doc_id) total order, so ranks are
    deterministic and the partition never exceeds one source's rows."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", quality_score_expr("text").alias("quality")
    )
    # grpwin-ok: source (domain) cardinality scales with the corpus
    w = Window.partitionBy("source").orderBy("quality", "doc_id")
    # UNROUNDED: percent_rank is (rank-1)/(n-1) on exact integers —
    # bit-identical IEEE divide on both engines (midpoint class)
    return scored.withColumn("q_rank", F.percent_rank().over(w))


#: BPE merge application as a list_reduce string fold — valid because
#: the merged symbol is literally a||b, so merging appends b WITHOUT a
#: separator, and the guard `acc = a OR ends_with(acc, ' ' || a)` only
#: fires when the LAST symbol is exactly `a` (symbols never contain
#: spaces), reproducing the leftmost-non-overlapping scan: once a
#: merge fires, the new last symbol a||b cannot match `a` again (b is
#: non-empty). `{m}` is the 1-row merge CTE carrying columns a, b.
_BPE_FOLD = (
    "CASE WHEN len(syms) < 2 THEN syms ELSE "
    "string_split(list_reduce(syms, (acc, x) -> "
    "CASE WHEN x = {m}.b AND (acc = {m}.a OR ends_with(acc, ' ' || {m}.a)) "
    "THEN acc || x ELSE acc || ' ' || x END), ' ') END"
)

#: winner selection: adjacent-pair histogram under the (n DESC, a, b)
#: total order — the exact rule operators/bpe._merge_round applies.
_BPE_PICK = """
    SELECT p[1] AS a, p[2] AS b, COUNT(*) AS n FROM (
      SELECT unnest(list_transform(range(1, len(syms)),
                    i -> [syms[i], syms[i+1]])) AS p
      FROM {src} WHERE len(syms) >= 2
    ) GROUP BY p[1], p[2]
    ORDER BY n DESC, a, b LIMIT 1"""

#: (doc?, chars) -> symbol lists with EOW on the last char
_BPE_SYMS = """list_transform(cs, (c, i) ->
               CASE WHEN i = len(cs) THEN c || '</w>' ELSE c END)"""


def _bpe_audit_oracle(k: int = 3) -> str:
    """DuckDB replay of the first k BPE merge rounds, unrolled (the
    MMR pattern: step CTEs, MATERIALIZED so DuckDB never inlines a
    step chain into exponential rescans)."""
    ctes = [
        f"""s0 AS MATERIALIZED (
      SELECT {_BPE_SYMS} AS syms
      FROM (SELECT regexp_extract_all(w, '.') AS cs
            FROM (SELECT unnest({duck_tokens('text')}) AS w FROM documents))
    )"""
    ]
    for j in range(1, k + 1):
        ctes.append(f"m{j} AS MATERIALIZED ({_BPE_PICK.format(src=f's{j-1}')})")
        if j < k:
            ctes.append(
                f"s{j} AS MATERIALIZED (SELECT {_BPE_FOLD.format(m=f'm{j}')} AS syms "
                f"FROM s{j-1}, m{j})"
            )
    unions = "\n    UNION ALL ".join(
        f"SELECT {j} AS step, a, b, n FROM m{j}" for j in range(1, k + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + "\n    " + unions


def _bpe_train_encode_oracle(k: int = 10) -> str:
    """Full DuckDB replay of bpe_train_encode: k unrolled training
    rounds over the md5-bucket 20% sample, then the learned merges
    applied IN RANK ORDER over the full corpus (k more fold steps) and
    counted per doc. Sequential rank-order application replays the
    operator's priority-greedy encode exactly because the learned
    table is well-formed — every merge's operand symbols are products
    of strictly earlier merges, so by the time merge j is applied
    exhaustively, no later merge can create a new (a_j, b_j) adjacency
    out of symbols that exist at step j; the equivalence is
    additionally pinned by tests/test_bpe.py::test_sequential_equals
    _priority_encode on the real corpus + adversarial words."""
    bucket = (
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
    )
    ctes = [
        f"""t0 AS MATERIALIZED (
      SELECT {_BPE_SYMS} AS syms
      FROM (SELECT regexp_extract_all(w, '.') AS cs
            FROM (SELECT unnest({duck_tokens('text')}) AS w FROM documents
                  WHERE {bucket} < 20))
    )"""
    ]
    for j in range(1, k + 1):
        ctes.append(f"tm{j} AS MATERIALIZED ({_BPE_PICK.format(src=f't{j-1}')})")
        if j < k:
            ctes.append(
                f"t{j} AS MATERIALIZED (SELECT {_BPE_FOLD.format(m=f'tm{j}')} AS syms "
                f"FROM t{j-1}, tm{j})"
            )
    ctes.append(
        f"""e0 AS MATERIALIZED (
      SELECT doc, {_BPE_SYMS} AS syms
      FROM (SELECT doc, regexp_extract_all(w, '.') AS cs
            FROM (SELECT doc_id AS doc, unnest({duck_tokens('text')}) AS w
                  FROM documents))
    )"""
    )
    for j in range(1, k + 1):
        ctes.append(
            f"e{j} AS MATERIALIZED (SELECT doc, {_BPE_FOLD.format(m=f'tm{j}')} AS syms "
            f"FROM e{j-1}, tm{j})"
        )
    return (
        "WITH " + ",\n    ".join(ctes) + f"""
    SELECT d.doc_id AS doc,
           CAST(COALESCE(t.n, 0) AS INTEGER) AS n_tokens,
           {k} AS n_merges
    FROM documents d LEFT JOIN (
      SELECT doc, SUM(len(syms)) AS n FROM e{k} GROUP BY doc
    ) t ON d.doc_id = t.doc"""
    )


@register(
    "bpe_train_encode",
    oracle=_bpe_train_encode_oracle(10),
    covers=("[EXT]-bpe",),
)
def bpe_train_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] BPE tokenizer training + corpus encode (Sennrich et al.
    2016): learn 10 merges on a deterministic md5-bucket 20% sample
    (production guidance: merge quality saturates long before 100 TB
    is counted — train on a sample, encode everywhere), then encode
    the FULL corpus with the learned table. Each merge round is one
    pair-count aggregation + a map-only re-encode; the final encode is
    a single Arrow-batched map. Output: per-doc token count under the
    learned tokenizer plus the corpus-level merge count.

    ORACLE-CHECKED since r7 (was rows-only under the iterative-
    algorithm clause): the 10 training rounds unroll as MATERIALIZED
    CTEs (_bpe_train_encode_oracle) and the encode replays as
    sequential rank-order merge folds — equivalent to the operator's
    priority-greedy encode for well-formed merge tables; also pinned
    against the pure-Python reference in tests/test_bpe.py."""
    from fegis_spark.operators.bpe import encode_with_merges, train_bpe

    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    sample = docs.filter(bucket < 20)
    merges = train_bpe(sample, "text", "doc_id", num_merges=10)
    enc = encode_with_merges(docs, "text", "doc_id", merges)
    return enc.select(
        "doc", "n_tokens", F.lit(len(merges)).alias("n_merges")
    )


@register(
    "bpe_merge_audit",
    oracle=_bpe_audit_oracle(3),
    covers=("[EXT]-bpe",),
)
def bpe_merge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] oracle-checked BPE training audit (the hll_error_audit /
    ann_ivf_recall_audit pattern applied to the last rows-only family):
    the first 3 merge rounds' winning pairs AND their counts,
    value-matched cross-engine. This certifies the two rules the long
    train_bpe run (bpe_train_encode, rows-only by the iterative
    contract) depends on — the (count DESC, a, b) winner total order
    and the leftmost-non-overlapping merge application (replayed in
    SQL as a string fold; operators/bpe.merge_rounds_audit). Driver
    cost is one 1-row argmax per round, same boundedness contract as
    train_bpe; reference semantics Sennrich et al. 2016 learn_bpe."""
    from fegis_spark.operators.bpe import merge_rounds_audit

    docs = load_table(spark, sf_dir, "documents")
    rows = merge_rounds_audit(docs, "text", "doc_id", k=3)
    return spark.createDataFrame(rows, "step int, a string, b string, n bigint")


DROPOUT_PCT = 15  #: of the md5 hash space per (doc, pos, token)


@register(
    "augment_token_dropout",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {duck_tokens('text')} AS tok FROM documents
    ), kept AS (
      SELECT doc_id, tok,
             list_filter(list_transform(tok, (x, i) ->
               CASE WHEN CAST(('0x' || substr(md5(
                        CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR) || ':' || x
                      ), 1, 8)) AS BIGINT) % 100 >= {DROPOUT_PCT}
                    THEN x ELSE NULL END),
               x -> x IS NOT NULL) AS kept_tok
      FROM base
    )
    SELECT doc_id,
           len(tok) AS n_tokens,
           len(kept_tok) AS n_kept,
           array_to_string(kept_tok, ' ') AS augmented
    FROM kept
    """,
    covers=("[EXT]-augment",),
)
def augment_token_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] deterministic token-dropout augmentation: drop each token
    iff md5(doc_id:pos:token) lands in the bottom {DROPOUT_PCT}% of
    hash space — the regularization/noising augmentation (word dropout)
    with NONE of rand()'s problems: the augmented corpus is a pure
    function of the input, so retries, engines, and epochs reproduce
    byte-for-byte (vary an epoch seed by concatenating it into the
    hash input). Pure array-HOF projection — zero shuffle, map-only at
    any scale. Index convention: Spark's transform lambda index is
    0-based, DuckDB's list_transform index is 1-based — the Spark side
    hashes i+1 so both engines hash identical (doc:pos:token) keys."""
    from fegis_spark.operators.dedup import tokens

    docs = load_table(spark, sf_dir, "documents")
    def keep(x, i):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("doc_id").cast("string"), (i + F.lit(1)).cast("string"), x
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint") % 100
        return F.when(h >= DROPOUT_PCT, x)

    base = docs.select("doc_id", tokens(F.col("text")).alias("tok"))
    kept = F.filter(
        F.transform("tok", keep), lambda x: x.isNotNull()
    )
    return base.select(
        "doc_id",
        F.size("tok").alias("n_tokens"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, " ").alias("augmented"),
    )


#: span-corruption plan constants: a position starts a span when its
#: md5 bucket lands in the bottom START_PCT% of hash space; each span
#: masks SPAN_LEN consecutive tokens. Expected mask rate
#: 1 - (1 - 0.05)^3 ~ 14.3% — the T5 ~15% objective.
SPAN_START_PCT = 5
SPAN_LEN = 3

_SPAN_START_SPARK = (
    "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':', "
    "CAST({j} AS STRING))), 1, 8), 16, 10) AS BIGINT) % 100 < "
    f"{SPAN_START_PCT}"
)
_SPAN_START_DUCK = (
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || "
    "CAST({j} AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < "
    f"{SPAN_START_PCT}"
)


def _span_masked(start_tpl: str) -> str:
    """Position i is masked iff a span starts at i, i-1, or i-2 (with
    boundary guards) — the union of overlapping spans, shared template
    for both dialects."""
    return (
        f"({start_tpl.format(j='i')}"
        f" OR (i >= 2 AND {start_tpl.format(j='(i - 1)')})"
        f" OR (i >= 3 AND {start_tpl.format(j='(i - 2)')}))"
    )


@register(
    "span_corruption_plan",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, source, {duck_tokens('text')} AS tok FROM documents
    ), per_doc AS (
      -- range() is exclusive-end and yields [] when len = 0 (safe)
      SELECT source,
             len(tok) AS n_tokens,
             len(list_filter(range(1, len(tok) + 1),
                 j -> {_SPAN_START_DUCK.format(j='j')})) AS n_spans,
             len(list_filter(range(1, len(tok) + 1),
                 i -> {_span_masked(_SPAN_START_DUCK)})) AS n_masked
      FROM base
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_spans) AS BIGINT) AS total_spans,
           CAST(SUM(n_masked) AS BIGINT) AS total_masked,
           CAST(SUM(n_masked) AS DOUBLE)
             / nullif(CAST(SUM(n_tokens) AS DOUBLE), 0) AS mask_frac
    FROM per_doc GROUP BY source
    """,
    covers=("[EXT]-span-corruption", "[EXT]-augment"),
)
def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] deterministic T5-style span-corruption planning: position
    i starts a {SPAN_LEN}-token mask span iff md5(doc_id:i) lands in
    the bottom {SPAN_START_PCT}% of hash space — the denoising-
    objective mask layout as a pure function of the corpus (retries /
    engines / epochs reproduce byte-for-byte; vary an epoch seed by
    concatenating it into the hash input, the augment_token_dropout
    convention). Emits the per-source masking budget an objective
    planner needs: span and masked-token mass plus the realized mask
    fraction (expected ~= 1 - 0.95^{SPAN_LEN} ~ 14.3%). Overlapping
    spans union in n_masked; n_spans counts raw starts.

    Determinism: md5 recipe both engines; integer sums exact
    (HUGEINT cast per the r7 rule); mask_frac is the unrounded
    quotient of exact BIGINTs (correctly-rounded '/', bit-identical).
    Spark's sequence(1, 0) DESCENDS (fabricates [1, 0]) — the size
    guard routes empty token arrays to an empty INT array instead.

    Scale: pure array-HOF projection (3 md5 gates per position) into a
    |sources|-row agg — zero joins, zero windows, map-side combined."""
    docs = load_table(spark, sf_dir, "documents")
    from fegis_spark.operators.dedup import tokens_sql

    seq = "CASE WHEN size(tok) >= 1 THEN sequence(1, size(tok)) ELSE CAST(array() AS ARRAY<INT>) END"
    per_doc = docs.selectExpr(
        "source",
        f"{tokens_sql('text')} AS tok",
        "doc_id",
    ).selectExpr(
        "source",
        "size(tok) AS n_tokens",
        f"size(filter({seq}, j -> {_SPAN_START_SPARK.format(j='j')})) AS n_spans",
        f"size(filter({seq}, i -> {_span_masked(_SPAN_START_SPARK)})) AS n_masked",
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_spans").cast("bigint").alias("total_spans"),
        F.sum("n_masked").cast("bigint").alias("total_masked"),
        (
            F.sum("n_masked").cast("double")
            / F.nullif(F.sum("n_tokens").cast("double"), F.lit(0.0))
        ).alias("mask_frac"),
    )


@register(
    "corpus_report",
    oracle=f"""
    WITH base AS MATERIALIZED (
      SELECT doc_id, lang, n_chars,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS h,
             {_GOPHER_DUCK['keep']} AS keep,
             {quality_score_sql('text')} AS q,
             {TOKEN_COUNT_WS_SQL.format(c='text')} AS n_tok,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS bucket
      FROM documents
    ), overall AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
             CAST(COUNT(DISTINCT h) AS DOUBLE) AS n_distinct,
             CAST(SUM(keep) AS DOUBLE) AS n_keep,
             CAST(SUM(CAST(q AS DECIMAL(38,6))) AS DOUBLE) AS q_sum,
             CAST(SUM(n_tok) AS DOUBLE) AS tok_sum
      FROM base
    ), lang_e AS (
      SELECT round(CAST(SUM(CAST(
               (-(p)) * ({portable_ln('p')}) AS DECIMAL(38,6))) AS DOUBLE), 6)
               AS entropy
      FROM (
        SELECT n / CAST(t AS DOUBLE) AS p
        FROM (SELECT lang, COUNT(*) AS n FROM base GROUP BY lang),
             (SELECT COUNT(*) AS t FROM base)
      )
    ), splits AS (
      SELECT 'split_' || CASE WHEN bucket < 80 THEN 'train'
                              WHEN bucket < 90 THEN 'val'
                              ELSE 'test' END || '_frac' AS metric,
             COUNT(*) / (SELECT CAST(COUNT(*) AS DOUBLE) FROM base) AS value
      FROM base GROUP BY 1
    )
    SELECT metric, value FROM (
      SELECT 'n_docs' AS metric, n_docs AS value FROM overall
      UNION ALL SELECT 'exact_dup_rate', 1.0 - n_distinct / n_docs FROM overall
      UNION ALL SELECT 'gopher_keep_rate', n_keep / n_docs FROM overall
      UNION ALL SELECT 'mean_quality', q_sum / n_docs FROM overall
      UNION ALL SELECT 'total_tokens_ws', tok_sum FROM overall
      UNION ALL SELECT 'mean_doc_tokens', tok_sum / n_docs FROM overall
      UNION ALL SELECT 'lang_entropy_nats', entropy FROM lang_e
      UNION ALL SELECT metric, value FROM splits
    )
    """,
    covers=("[EXT]-report", "[EXT]-curation"),
)
def corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] corpus report card: the one-query health dashboard a
    pipeline owner tracks per snapshot — doc count, exact-dup rate,
    Gopher keep rate, mean quality, token totals, language-mix Shannon
    entropy, and split fractions, as (metric, value) rows.

    Plan: ONE projection scan computes every per-doc signal (content
    hash, keep flag, quality, token count, split bucket) and persists
    (MEMORY_AND_DISK — three consumers: the overall agg, the language
    rollup, the split rollup; without the cache each would re-scan and
    re-derive the text signals). Everything downstream aggregates over
    that narrow projection; all sums/means ride DECIMAL(38,6); entropy
    terms follow the _js_sum convention (per-term double, decimal
    transit, 6-dp output)."""
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    base = docs.select(
        "doc_id",
        "lang",
        F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " ")))).alias("h"),
        F.expr(_GOPHER_SPARK["keep"]).alias("keep"),
        quality_score_expr("text").alias("q"),
        token_count_ws(F.col("text")).alias("n_tok"),
        bucket.alias("bucket"),
    ).persist(StorageLevel.MEMORY_AND_DISK)

    overall = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.countDistinct("h").cast("double").alias("n_distinct"),
        F.sum("keep").cast("double").alias("n_keep"),
        F.sum(F.col("q").cast("decimal(38,6)")).cast("double").alias("q_sum"),
        F.sum("n_tok").cast("double").alias("tok_sum"),
    )
    # ratio metrics are UNROUNDED: every operand is an exact integer
    # or decimal-exact sum cast to an identical double, so the IEEE
    # divides are bit-identical cross-engine; round(x, 6) would put
    # each back in the .5e-6 midpoint tie-break class
    rows = overall.selectExpr(
        "stack(6, "
        "'n_docs', n_docs, "
        "'exact_dup_rate', 1.0 - n_distinct / n_docs, "
        "'gopher_keep_rate', n_keep / n_docs, "
        "'mean_quality', q_sum / n_docs, "
        "'total_tokens_ws', tok_sum, "
        "'mean_doc_tokens', tok_sum / n_docs"
        ") AS (metric, value)"
    )
    lang_counts = base.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    total = base.agg(F.count(F.lit(1)).alias("t"))
    entropy = (
        lang_counts.crossJoin(F.broadcast(total))  # bcast-ok: 1-row agg
        .select((F.col("n") / F.col("t").cast("double")).alias("p"))
        .select(
            # portable_ln: bit-identical cross-engine (native ln is
            # 1 ulp off on ~2.5% of inputs — the midpoint flake class)
            ((-F.col("p")) * F.expr(portable_ln("p", spark=True)))
            .cast("decimal(38,6)")
            .alias("term")
        )
        .agg(F.round(F.sum("term").cast("double"), 6).alias("value"))
        .select(F.lit("lang_entropy_nats").alias("metric"), "value")
    )
    split = F.when(F.col("bucket") < 80, "train").when(
        F.col("bucket") < 90, "val"
    ).otherwise("test")
    splits = (
        base.select(split.alias("s"))
        .groupBy("s")
        .agg(F.count(F.lit(1)).alias("n"))
        .crossJoin(F.broadcast(total))  # bcast-ok: 1-row agg
        .select(
            F.concat(F.lit("split_"), F.col("s"), F.lit("_frac")).alias("metric"),
            (F.col("n") / F.col("t").cast("double")).alias("value"),
        )
    )
    return rows.unionAll(entropy).unionAll(splits)


@register(
    "text_kn_logprob",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {duck_tokens('text')} AS tok FROM documents
    ), t2 AS (SELECT doc_id, tok FROM t WHERE len(tok) >= 2),
    bg AS (
      SELECT doc_id, tok[i] AS w1, tok[i+1] AS w2,
             tok[i] || ' ' || tok[i+1] AS b
      FROM t2, unnest(range(1, len(tok))) AS r(i)
    ),
    vocab AS MATERIALIZED (
      SELECT w1, w2, b, COUNT(*) AS c FROM bg GROUP BY w1, w2, b
    ),
    ctx AS (SELECT w1, SUM(c) AS cv, COUNT(*) AS n1v FROM vocab GROUP BY w1),
    pred AS (SELECT w2, COUNT(*) AS n1w FROM vocab GROUP BY w2),
    tot AS (SELECT COUNT(*) AS n1tot FROM vocab),
    rates AS (
      SELECT v.b, v.c AS c, x.cv AS cv, x.n1v AS n1v, p.n1w AS n1w,
             t3.n1tot AS n1tot
      FROM vocab v
      JOIN ctx x ON x.w1 = v.w1
      JOIN pred p ON p.w2 = v.w2
      CROSS JOIN tot t3
    ),
    nlv AS (
      SELECT b, -{portable_ln('p')} AS nl FROM (
        SELECT b, {KN_P_SQL.format(d='CAST(0.75 AS DOUBLE)')} AS p FROM rates
      )
    ),
    scored AS (
      SELECT bg.doc_id, nl FROM bg JOIN nlv ON nlv.b = bg.b
    )
    SELECT doc_id AS doc,
           CAST(SUM(CAST(nl AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_neg_logprob_kn,
           COUNT(*) AS n_bigrams
    FROM scored GROUP BY doc_id
    """,
    covers=("[EXT]-kn-lm",),
)
def text_kn_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] interpolated Kneser-Ney bigram scoring — the top rung of
    the n-gram quality ladder (unigram → bigram → KN): absolute
    discounting plus the continuation-probability backoff that demotes
    words frequent only in a single context. All terms are integer
    ratios with a literal discount on both sides, so the whole
    smoothed model hash-matches the oracle; see
    operators/text_analysis.kn_bigram_logprob for the plan shape (one
    explode, four derived broadcast tables, no second corpus scan)."""
    from fegis_spark.operators.text_analysis import kn_bigram_logprob

    return kn_bigram_logprob(load_table(spark, sf_dir, "documents"))


@register(
    "quality_length_regression",
    oracle=f"""
    WITH pts AS (
      SELECT lang, CAST(n_chars AS DOUBLE) AS x,
             {quality_score_sql('text')} AS y
      FROM documents
    ), s AS (
      SELECT lang, COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS syy
      FROM pts GROUP BY lang
    )
    SELECT lang, n,
           round((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0), 12) AS slope,
           round((sy - ((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0)) * sx)
                 / n, 6) AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0), 6) AS r2
    FROM s
    """,
    covers=("[EXT]-regression", "§2.4-stats"),
)
def quality_length_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] per-language OLS regression of quality on document length
    — closed-form from the five decimal-exact moment sums (n, Σx, Σy,
    Σxy, Σx², Σy²), the same order-independent-moments recipe as
    stats_moments extended to two variables: slope, intercept and r²
    drop out of sums, so a full regression costs ONE partial+final
    aggregate at any corpus size (no iterative solver, no second
    pass). Per-row products stay IEEE; every sum rides the decimal
    lattice; the derived ratios are spelled with identical association
    on both engines; degenerate groups (single doc / constant x or y
    → zero variance denominator) emit NULL via an identical nullif on
    both sides rather than tripping Spark's ANSI DIVIDE_BY_ZERO. The
    answer to 'is my quality score just a length proxy?' — a
    calibration audit every score should pass."""
    docs = load_table(spark, sf_dir, "documents")
    pts = docs.select(
        "lang",
        F.col("n_chars").cast("double").alias("x"),
        quality_score_expr("text").alias("y"),
    )
    dd = lambda c: F.sum(c.cast("decimal(38,6)")).cast("double")  # noqa: E731
    x, y = F.col("x"), F.col("y")
    s = pts.groupBy("lang").agg(
        F.count("*").alias("n"),
        dd(x).alias("sx"),
        dd(y).alias("sy"),
        dd(x * y).alias("sxy"),
        dd(x * x).alias("sxx"),
        dd(y * y).alias("syy"),
    )
    n, sx, sy, sxy, sxx, syy = (
        F.col("n"), F.col("sx"), F.col("sy"),
        F.col("sxy"), F.col("sxx"), F.col("syy"),
    )
    slope = (n * sxy - sx * sy) / F.nullif(n * sxx - sx * sx, F.lit(0.0))
    return s.select(
        "lang",
        "n",
        F.round(slope, 12).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / F.nullif(
                (n * sxx - sx * sx) * (n * syy - sy * sy), F.lit(0.0)
            ),
            6,
        ).alias("r2"),
    )


@register(
    "lang_source_chisq",
    oracle="""
    WITH cells AS MATERIALIZED (
      SELECT lang, source, COUNT(*) AS o FROM documents GROUP BY lang, source
    ),
    rt AS (SELECT lang, SUM(o) AS r FROM cells GROUP BY lang),
    ct AS (SELECT source, SUM(o) AS c FROM cells GROUP BY source),
    tot AS (SELECT SUM(o) AS t FROM cells),
    contrib AS (
      SELECT (cells.o - (rt.r * ct.c / CAST(tot.t AS DOUBLE)))
             * (cells.o - (rt.r * ct.c / CAST(tot.t AS DOUBLE)))
             / (rt.r * ct.c / CAST(tot.t AS DOUBLE)) AS v
      FROM cells JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN tot
    )
    SELECT round(CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE), 6) AS chi2,
           (SELECT (COUNT(*) - 1) FROM rt)
             * (SELECT (COUNT(*) - 1) FROM ct) AS dof,
           (SELECT COUNT(*) FROM cells) AS n_cells
    FROM contrib
    """,
    covers=("[EXT]-chisq", "§2.4-stats"),
)
def lang_source_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] chi-square independence test between language and source
    — the audit for 'does every source contribute the same language
    mix?' (a skewed cell means one source dominates a language, which
    stratified sampling must know about). Observed/expected cells come
    from ONE count aggregate; row totals, column totals and the grand
    total all derive from the persisted |langs|×|sources| cell table
    (constant-size at any corpus scale — the corpus is scanned once);
    per-cell contributions are identical IEEE expressions and their
    sum rides the decimal lattice."""
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    cells = (
        docs.groupBy("lang", "source")
        .agg(F.count("*").alias("o"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rt = cells.groupBy("lang").agg(F.sum("o").alias("r"))
    ct = cells.groupBy("source").agg(F.sum("o").alias("c"))
    tot = cells.agg(F.sum("o").alias("t"))
    e = F.col("r") * F.col("c") / F.col("t").cast("double")
    contrib = (
        cells.join(F.broadcast(rt), "lang")  # bcast-ok: one row per lang
        .join(F.broadcast(ct), "source")  # bcast-ok: one row per source
        .crossJoin(F.broadcast(tot))  # bcast-ok: 1-row agg
        .select(((F.col("o") - e) * (F.col("o") - e) / e).alias("v"))
    )
    stats = contrib.agg(
        F.round(
            F.sum(F.col("v").cast("decimal(38,6)")).cast("double"), 6
        ).alias("chi2")
    )
    dof = (
        rt.agg((F.count("*") - 1).alias("nr"))
        .crossJoin(ct.agg((F.count("*") - 1).alias("nc")))  # bcast-ok: 1-row agg
        .select((F.col("nr") * F.col("nc")).alias("dof"))
    )
    ncells = cells.agg(F.count("*").alias("n_cells"))
    return stats.crossJoin(F.broadcast(dof)).crossJoin(F.broadcast(ncells))  # bcast-ok: 1-row aggs


@register(
    "quality_ks_drift",
    oracle=f"""
    WITH scored AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS grp,
             {quality_score_sql('text')} AS q
      FROM documents
    ),
    counts AS MATERIALIZED (
      SELECT q,
             SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS a,
             SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS b
      FROM scored GROUP BY q
    ),
    tot AS (SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb FROM counts),
    cdf AS (
      SELECT q,
             SUM(a) OVER w / nullif(CAST(t.na AS DOUBLE), 0) AS fa,
             SUM(b) OVER w / nullif(CAST(t.nb AS DOUBLE), 0) AS fb
      FROM counts CROSS JOIN tot t
      WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW)
    )
    SELECT round(MAX(abs(fa - fb)), 6) AS ks_stat,
           (SELECT na FROM tot) AS n_en,
           (SELECT nb FROM tot) AS n_rest,
           (SELECT COUNT(*) FROM counts) AS n_distinct_q
    FROM cdf
    """,
    covers=("[EXT]-ks-drift", "§2.4-stats"),
)
def quality_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] two-sample Kolmogorov-Smirnov statistic between the
    quality distributions of the English slice and the rest — the
    standard distribution-drift test (run it between snapshots, splits
    or sources before a score threshold silently means different
    things for different cohorts). The corpus collapses to per-value
    counts in ONE aggregate; the CDF window runs over the DISTINCT
    quality values only (quality is a discrete 6dp formula — hundreds
    of values at any corpus size, so the unpartitioned window is
    bounded by the value grid, not the corpus). Integer counts /
    integer totals per step — IEEE-identical; max is order-free."""
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        (F.col("lang") == "en").cast("int").alias("grp"),
        quality_score_expr("text").alias("q"),
    )
    counts = (
        scored.groupBy("q")
        .agg(
            F.sum(F.col("grp")).alias("a"),
            F.sum(1 - F.col("grp")).alias("b"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = counts.agg(F.sum("a").alias("na"), F.sum("b").alias("nb"))
    w = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)  # window-ok: distinct-quantile table (derived, bounded)
    # nullif: an empty cohort (na or nb = 0) yields NULL ks_stat on
    # both engines instead of Spark's ANSI DIVIDE_BY_ZERO throw.
    cdf = counts.crossJoin(F.broadcast(tot)).select(  # bcast-ok: 1-row agg
        (F.sum("a").over(w) / F.nullif(F.col("na").cast("double"), F.lit(0.0)))
        .alias("fa"),
        (F.sum("b").over(w) / F.nullif(F.col("nb").cast("double"), F.lit(0.0)))
        .alias("fb"),
    )
    stats = cdf.agg(
        F.round(F.max(F.abs(F.col("fa") - F.col("fb"))), 6).alias("ks_stat")
    )
    return (
        stats.crossJoin(
            F.broadcast(  # bcast-ok: 1-row agg
                tot.select(
                    F.col("na").alias("n_en"), F.col("nb").alias("n_rest")
                )
            )
        )
        .crossJoin(F.broadcast(counts.agg(F.count("*").alias("n_distinct_q"))))  # bcast-ok: 1-row agg
    )


@register(
    "source_concentration",
    oracle="""
    WITH s AS MATERIALIZED (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n) AS t, COUNT(*) AS k FROM s),
    ranked AS (
      SELECT n, row_number() OVER (ORDER BY n, source) AS i
      FROM s
    )
    SELECT round((2.0 * SUM(r.i * r.n) - (t.t * (t.k + 1)))
                 / CAST(t.k * t.t AS DOUBLE), 6) AS gini,
           -- lint: allow R3 (decimal-transit inside; regex can't see across the break)
           round(CAST(SUM(CAST((r.n / CAST(t.t AS DOUBLE))
                              * (r.n / CAST(t.t AS DOUBLE)) AS DECIMAL(38,18)))
                      AS DOUBLE), 6) AS hhi,
           round(MAX(r.n) / CAST(t.t AS DOUBLE), 6) AS top_share,
           t.k AS n_sources
    FROM ranked r CROSS JOIN tot t
    GROUP BY t.t, t.k
    """,
    covers=("[EXT]-concentration", "§2.4-stats"),
)
def source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] source-concentration audit: Gini coefficient (rank
    formula G = (2·Σ i·nᵢ − t(k+1)) / (k·t) over sources sorted
    ascending), Herfindahl-Hirschman index, and the top source's
    share — the 'is one domain eating the corpus?' dashboard numbers
    that decide whether source caps (source_cap_sample) need to bind.
    The corpus collapses to one count per source; everything else runs
    on the constant-size source table (rank window bounded by
    |sources|). Integer-derived ratios, identical association, 6dp."""
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    s = (
        docs.groupBy("source")
        .agg(F.count("*").alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = s.agg(F.sum("n").alias("t"), F.count("*").alias("k"))
    ranked = s.select(
        "n", F.row_number().over(Window.orderBy("n", "source")).alias("i")  # window-ok: one row per source (bounded enum)
    )
    t, k = F.col("t"), F.col("k")
    share = F.col("n") / t.cast("double")
    return (
        ranked.crossJoin(F.broadcast(tot))  # bcast-ok: 1-row agg
        .groupBy("t", "k")
        .agg(
            F.round(
                (2.0 * F.sum(F.col("i") * F.col("n")) - (t * (k + 1)))
                / (k * t).cast("double"),
                6,
            ).alias("gini"),
            F.round(
                F.sum((share * share).cast("decimal(38,18)")).cast("double"), 6
            ).alias("hhi"),
            F.round(F.max("n") / t.cast("double"), 6).alias("top_share"),
        )
        .select("gini", "hhi", "top_share", F.col("k").alias("n_sources"))
    )


from fegis_spark.operators.classifier import perceptron_train, perceptron_train_oracle


@register(
    "quality_classifier_train",
    oracle=perceptron_train_oracle(),
    covers=("[EXT]-quality-classifier", "[EXT]-gopher", "[EXT]-quality"),
)
def quality_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] trained quality classifier: distributed batch-perceptron
    training on Gopher keep/drop labels with scaled
    (n_words, mean_word_len, stopword_hits) features — the
    fastText-style quality-model move of production LLM data
    pipelines, here with the whole training trajectory (per-iteration
    error count + weights) value-checked against a DuckDB oracle. The
    perceptron's update rule is comparisons + rational arithmetic
    (no exp/log), which is what makes iterative model TRAINING
    oracle-checkable at all — see operators/classifier.py for the
    full determinism story and the 100 TB shape (per iteration: one
    filtered map-side partial agg over the persisted feature
    projection + a 1-row broadcast). Converges to 98-99% train
    accuracy by iteration 12 at every sf (errors 5000 -> 99 at
    sf0.1)."""
    return perceptron_train(load_table(spark, sf_dir, "documents"))


@register(
    "vocab_growth_curve",
    oracle=f"""
    WITH m AS (SELECT MAX(doc_id) + 1 AS m FROM documents),
    dd AS (
      SELECT doc_id,
             LEAST(9, CAST(floor(doc_id * 10.0 / m) AS BIGINT)) AS decile,
             tok
      FROM (SELECT doc_id, {{tok}} AS tok FROM documents), m
    ),
    tokc AS (
      SELECT decile, CAST(SUM(len(tok)) AS BIGINT) AS new_tokens
      FROM dd GROUP BY decile
    ),
    firsts AS (
      SELECT w, MIN(decile) AS decile
      FROM (SELECT decile, unnest(tok) AS w FROM dd)
      GROUP BY w
    ),
    newt AS (SELECT decile, COUNT(*) AS new_types FROM firsts GROUP BY decile)
    SELECT t.decile,
           CAST(SUM(t.new_tokens) OVER w AS BIGINT) AS n_tokens_cum,
           CAST(SUM(COALESCE(n.new_types, 0)) OVER w AS BIGINT) AS n_types_cum,
           round(COALESCE(n.new_types, 0) * 1000.0 / nullif(t.new_tokens, 0), 6)
             AS new_types_per_1k
    FROM tokc t LEFT JOIN newt n ON t.decile = n.decile
    WINDOW w AS (ORDER BY t.decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """.format(tok=duck_tokens("text")),
    covers=("[EXT]-vocab-growth", "§2.4-cumulative-distinct"),
)
def vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Heaps'-law vocabulary-growth curve: stream the corpus in
    deterministic doc_id order, checkpoint at 10 equal doc_id deciles,
    and report cumulative token mass, cumulative distinct vocabulary,
    and the marginal new-types-per-1k-tokens rate per decile — the
    corpus-health audit that distinguishes naturally-growing text
    (sublinear, declining marginal rate per Heaps' law) from template
    spam (rate collapses) or synthetic noise (rate stays flat).

    100 TB posture: the windowed-COUNT-DISTINCT trap is avoided the
    same way as cumulative_unique_users — first-seen decomposition:
    each word reduces to MIN(decile) in one vocab-sized hash-agg
    (decile is monotone in doc_id, so MIN(decile) == decile of
    MIN(doc_id) without carrying doc ids), token mass partial-aggs to
    10 rows map-side, and the only window runs over the 10-row decile
    table. The tokenized projection is persisted once and feeds both
    the token-mass agg and the vocabulary explode (one corpus scan).
    All outputs are exact integers except one integer-ratio rate,
    nullif-guarded on both sides."""
    from pyspark import StorageLevel
    from fegis_spark.operators.dedup import tokens

    docs = load_table(spark, sf_dir, "documents")
    m = docs.agg((F.max("doc_id") + 1).alias("m"))
    dd = (
        docs.crossJoin(F.broadcast(m))  # bcast-ok: 1-row agg
        .select(
            F.least(
                F.lit(9),
                F.floor(F.col("doc_id") * 10.0 / F.col("m")).cast("bigint"),
            ).alias("decile"),
            tokens(F.col("text")).alias("tok"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tokc = dd.groupBy("decile").agg(
        F.sum(F.size("tok")).cast("bigint").alias("new_tokens")
    )
    firsts = (
        dd.select("decile", F.explode("tok").alias("w"))
        .groupBy("w")
        .agg(F.min("decile").alias("decile"))
    )
    newt = firsts.groupBy("decile").agg(F.count("*").alias("new_types"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)  # window-ok: 10-row decile table
    joined = tokc.join(newt, "decile", "left").select(
        "decile",
        "new_tokens",
        F.coalesce("new_types", F.lit(0)).alias("new_types"),
    )
    return joined.select(
        "decile",
        F.sum("new_tokens").over(w).cast("bigint").alias("n_tokens_cum"),
        F.sum("new_types").over(w).cast("bigint").alias("n_types_cum"),
        F.round(
            F.col("new_types") * 1000.0 / F.nullif(F.col("new_tokens"), F.lit(0)), 6
        ).alias("new_types_per_1k"),
    )


from fegis_spark.operators.classifier import (  # noqa: E402
    perceptron_calibration,
    perceptron_calibration_oracle,
)


@register(
    "classifier_calibration",
    oracle=perceptron_calibration_oracle(),
    covers=("[EXT]-quality-classifier", "[EXT]-quality"),
)
def classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] reliability diagram for the trained quality classifier:
    score every document with quality_classifier_train's final
    weights, bin scores into fixed literal micro-unit edges, report
    per-bin doc count / actual Gopher-keep count / keep rate / exact
    score mass. A calibrated filter reads monotone keep_rate across
    bins — the audit that turns 'the classifier trains' into 'the
    classifier's score is a usable keep-probability proxy'.

    100 TB posture: fixed LITERAL bin edges keep the binning a pure
    map-side CASE (no global rank window); the scoring pass reuses
    the feature projection the training loop already persisted, so
    calibration adds one projection + one |bins|-row agg to the
    training cost. Oracle replays training AND scoring end-to-end
    (operators/classifier.py)."""
    return perceptron_calibration(load_table(spark, sf_dir, "documents"))


from fegis_spark.operators.classifier import (  # noqa: E402
    perceptron_hard_examples,
    perceptron_hard_examples_oracle,
)


@register(
    "pruning_hard_examples",
    oracle=perceptron_hard_examples_oracle(),
    covers=("[EXT]-quality-classifier", "O1-topk"),
)
def pruning_hard_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] margin-based data pruning (keep-hard-examples rule,
    Sorscher et al. 2022): the 50 documents nearest the trained
    quality classifier's decision boundary under the exact integer
    (|score_micro|, doc_id) total order — the examples that carry the
    most training signal, and the selection a pruning pipeline feeds
    back into the mixture. Training + scoring + selection are all
    replayed by the DuckDB oracle.

    100 TB posture: the global bottom-k fuses to
    TakeOrderedAndProject (per-partition heaps, k-row driver merge —
    no global sort); rank is re-derived on the k-row result only."""
    return perceptron_hard_examples(load_table(spark, sf_dir, "documents"))


@register(
    "tokenizer_fertility",
    oracle=f"""
    SELECT lang, n_docs, tok_ws, tok_bpe,
           tok_bpe / CAST(nullif(tok_ws, 0) AS DOUBLE) AS fertility
    FROM (
      SELECT lang, COUNT(*) AS n_docs,
             CAST(SUM({TOKEN_COUNT_WS_SQL.format(c='text')}) AS BIGINT) AS tok_ws,
             CAST(SUM({TOKEN_COUNT_BPE_SQL.format(c='text')}) AS BIGINT) AS tok_bpe
      FROM documents GROUP BY lang
    )
    """,
    covers=("[EXT]-fertility", "[EXT]-tokens"),
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] tokenizer fertility by language: BPE-ish sub-word tokens
    per whitespace word — the standard multilingual-tokenizer budget
    metric (a fertility of 2 means the context window holds half as
    many words). Scripts the ASCII \\w pre-tokenizer can't segment
    (zh) surface as high fertility — exactly the signal that drives
    per-language token budgeting and vocab allocation in a training
    mix. Exact integer sums (CAST to BIGINT — DuckDB widens integer
    SUM to HUGEINT); fertility is the unrounded bit-identical IEEE
    quotient, nullif-guarded like every ratio denominator.

    Scale: pure map-side projection into a |langs|-row partial+final
    agg — one shuffle of a few grouped rows, zero joins."""
    docs = load_table(spark, sf_dir, "documents")
    agg = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count_ws(F.col("text"))).cast("bigint").alias("tok_ws"),
        F.sum(token_count_bpe_ish(F.col("text"))).cast("bigint").alias("tok_bpe"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "tok_ws",
        "tok_bpe",
        (
            F.col("tok_bpe")
            / F.nullif(F.col("tok_ws"), F.lit(0)).cast("double")
        ).alias("fertility"),
    )


#: constructed encoding corruption for the mojibake scanner: the
#: testdata corpus is clean ASCII, so corruption is injected
#: deterministically on both engines (the constructed-corpus pattern,
#: same as json_quarantine_parse). Every 7th doc gets UTF-8-as-Latin-1
#: mojibake ('Ã©' = é double-encoded, 'â€”' = em-dash double-encoded);
#: every 13th (not also 7th) gets a U+FFFD replacement char — the two
#: corruption classes an encoding-triage pass separates.
#: U+FFFD is embedded as a LITERAL character, never via chr(65533):
#: Spark's chr() is mod-256 (chr(65533) yields U+00FD 'ý') while
#: DuckDB's yields the real replacement char — a dialect divergence
#: that made the r8 scanner inject/detect the wrong character on the
#: Spark side (r8 ADVICE, verified live). A string literal is
#: dialect-independent.
_REPL_CHAR = "�"
_MOJIBAKE_CORRUPT = (
    "CASE WHEN doc_id % 7 = 0"
    " THEN text || ' cafÃ© naÃ¯ve â€” rÃ©sumÃ©'"
    f" WHEN doc_id % 13 = 0 THEN text || ' seg{_REPL_CHAR}ment'"
    " ELSE text END"
)


@register(
    "text_mojibake_scan",
    oracle=f"""
    WITH raw AS (
      SELECT source, {_MOJIBAKE_CORRUPT} AS t FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN contains(t, 'Ã') OR contains(t, 'â€')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_mojibake_docs,
           CAST(SUM(length(t) - length(replace(t, 'Ã', ''))) AS BIGINT)
             AS mojibake_hits,
           CAST(SUM(CASE WHEN contains(t, '{_REPL_CHAR}') THEN 1 ELSE 0 END)
                AS BIGINT) AS n_replacement_docs
    FROM raw GROUP BY source
    """,
    covers=("[EXT]-mojibake", "[EXT]-quality"),
)
def text_mojibake_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] encoding-corruption triage (ftfy-style detection, scan
    side): per source, count documents carrying UTF-8-as-Latin-1
    mojibake markers ('Ã' + continuation, 'â€' sequences) and U+FFFD
    replacement characters — the two classes a crawl-ingest pass
    routes to re-decode vs drop. The corpus text is clean, so
    corruption is injected deterministically on both engines (see
    _MOJIBAKE_CORRUPT; the json_quarantine_parse pattern), making the
    detector non-vacuous at every sf. Marker counting is the
    1-char-marker length-replace recipe; both engines count length()
    in characters.

    Scale: pure projection + |sources|-row agg, map-side combined —
    zero joins, zero windows."""
    docs = load_table(spark, sf_dir, "documents")
    t = F.expr(_MOJIBAKE_CORRUPT)
    has_moji = F.expr(
        f"contains({_MOJIBAKE_CORRUPT}, 'Ã') OR contains({_MOJIBAKE_CORRUPT}, 'â€')"
    )
    return (
        docs.select(
            "source",
            F.when(has_moji, 1).otherwise(0).alias("moji"),
            (F.length(t) - F.length(F.replace(t, F.lit("Ã"), F.lit("")))).alias(
                "hits"
            ),
            F.when(t.contains(F.lit(_REPL_CHAR)), 1).otherwise(0).alias("repl"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("moji").cast("bigint").alias("n_mojibake_docs"),
            F.sum("hits").cast("bigint").alias("mojibake_hits"),
            F.sum("repl").cast("bigint").alias("n_replacement_docs"),
        )
    )


from fegis_spark.operators.sketches import (  # noqa: E402
    CMS_D,
    CMS_W,
    cms_bucket_sql,
    cms_build,
    cms_estimate,
)

_CMS_ROWS_SQL = "(SELECT * FROM (VALUES (0), (1), (2), (3)) v(r))"


@register(
    "cms_heavy_hitters_audit",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({duck_tokens('text')}) AS t FROM documents
    ), cnt AS (
      SELECT t, count(*) AS c FROM tok GROUP BY t
    ), top AS (
      SELECT t, c FROM cnt ORDER BY c DESC, t LIMIT 20
    ), cms AS (
      SELECT r, {cms_bucket_sql('t', 'r')} AS bucket, count(*) AS cnt
      FROM tok CROSS JOIN {_CMS_ROWS_SQL} GROUP BY 1, 2
    ), probe AS (
      SELECT top.t, top.c, v.r, {cms_bucket_sql('top.t', 'v.r')} AS bucket
      FROM top CROSS JOIN {_CMS_ROWS_SQL} v
    ), est AS (
      SELECT p.t, MIN(COALESCE(cms.cnt, 0)) AS est_n
      FROM probe p LEFT JOIN cms ON cms.r = p.r AND cms.bucket = p.bucket
      GROUP BY p.t
    )
    SELECT top.t, CAST(top.c AS BIGINT) AS true_n,
           CAST(est.est_n AS BIGINT) AS est_n,
           est.est_n >= top.c AS overestimate_ok,
           CAST(est.est_n - top.c AS BIGINT) AS overcount
    FROM top JOIN est USING (t)
    """,
    covers=("[EXT]-cms", "[EXT]-heavy-hitters"),
)
def cms_heavy_hitters_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Count-Min Sketch audit (Cormode & Muthukrishnan 2005):
    build a {CMS_D}x{CMS_W} CMS over the corpus token stream, point-
    query it for the exact top-20 tokens, and emit estimate vs truth
    with the one-sided-error invariant (a CMS can only OVERcount) as
    an oracle-asserted boolean per row — the trust-but-verify audit
    you run on a sample before relying on sketch counts fleet-wide,
    exactly like hll_error_audit does for distinct counts. md5
    sub-stream hashing makes the sketch deterministic and therefore
    value-checkable cross-engine — no seeded RNG.

    Scale: the token stream fans out x{CMS_D} map-side but partial
    aggregation caps the CMS shuffle at partitions*d*w rows; the
    probe/estimate side is broadcast-only. Corpus-size input,
    constant-size state — the CMS contract. (The exact top-20 side
    reuses the vocabulary hash-agg; at 100 TB you'd feed the sketch's
    own candidates or text_heavy_hitters' Misra-Gries instead.)"""
    from fegis_spark.operators.dedup import tokens
    from fegis_spark.operators.topk import ranked_topk
    from pyspark import StorageLevel

    docs = load_table(spark, sf_dir, "documents")
    # r14: ONE vocabulary hash-agg feeds the exact top-20 AND the
    # sketch build (cms_build weight_col path — the bucket is a pure
    # function of the token, so summing vocab counts into buckets is
    # bit-identical to counting stream instances while hashing 27k
    # distinct tokens x4 instead of ~500k instances x4); persist the
    # vocab (two consumers), not the corpus-size token stream
    stream = docs.select(F.explode(tokens(F.col("text"))).alias("t"))
    cnt = stream.groupBy("t").agg(F.count(F.lit(1)).alias("c")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    top = ranked_topk(cnt, "c", "t", 20, "rk").drop("rk")
    cms = cms_build(cnt, "t", weight_col="c")
    est = cms_estimate(cms, top, "t")
    return (
        top.join(F.broadcast(est), "t")  # bcast-ok: top-20 rows
        .select(
            "t",
            F.col("c").cast("bigint").alias("true_n"),
            "est_n",
            (F.col("est_n") >= F.col("c")).alias("overestimate_ok"),
            (F.col("est_n") - F.col("c")).cast("bigint").alias("overcount"),
        )
    )


_DRIFT_HALF_SQL = (
    "CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)"
    " % 100 < 50 THEN 1 ELSE 0 END"
)


@register(
    "vocab_drift_topk",
    oracle=f"""
    WITH tok AS (
      SELECT {_DRIFT_HALF_SQL} AS half, unnest({duck_tokens('text')}) AS t
      FROM documents
    ), counts AS (
      SELECT t,
             CAST(SUM(half) AS BIGINT) AS ca,
             CAST(SUM(1 - half) AS BIGINT) AS cb
      FROM tok GROUP BY t
    ), tot AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
             COUNT(*) AS v
      FROM counts
    ), scored AS (
      -- product of two double quotients, NOT a quotient of BIGINT
      -- cross-products: each operand stays exact in a double up to
      -- 2^53 tokens PER HALF (~9e15, past the 100 TB design point),
      -- whereas (ca+1)*(nb+V) blows through 2^53 at ~1e13 tokens
      -- (r8 ADVICE). Both /'s and the * are IEEE correctly-rounded
      -- in both engines, so the value stays bit-identical.
      SELECT t, ca, cb,
             (CAST(ca + 1 AS DOUBLE) / CAST(cb + 1 AS DOUBLE))
               * (CAST(nb + v AS DOUBLE) / CAST(na + v AS DOUBLE))
               AS odds_ratio
      FROM counts CROSS JOIN tot
    )
    SELECT t, ca, cb, odds_ratio FROM scored
    ORDER BY odds_ratio DESC, t LIMIT 15
    """,
    covers=("[EXT]-vocab-drift", "[EXT]-heavy-hitters"),
)
def vocab_drift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] vocabulary drift report: the 15 terms whose add-1-smoothed
    frequency odds shift most between two deterministic md5 halves of
    the corpus — the snapshot-over-snapshot monitoring query that
    surfaces topic/source shift as named terms (new boilerplate, a
    crawler picking up a new domain) rather than as an opaque
    distribution statistic (quality_ks_drift's job). In production the
    halves are two corpus snapshots; the md5 split makes the query
    self-contained and non-vacuous at every sf.

    Portability: the smoothed odds ratio is the UNROUNDED product of
    two double quotients ((ca+1)/(cb+1)) * ((nb+V)/(na+V)) — each
    operand is an exact integer that stays double-exact up to 2^53
    tokens PER HALF (~9e15, beyond the 100 TB design point), and /,*
    are IEEE correctly-rounded in both engines, so the score is
    bit-identical cross-engine with no ln() involved and the top-k
    order is total ((ratio, t) tiebreak). (The r8 BIGINT cross-product
    form was exact only to ~1e13 tokens — r8 ADVICE.)

    Scale: one token hash-agg (map-side combined to the vocab), a
    1-row totals broadcast, TakeOrderedAndProject for the top-k — the
    vocabulary never sorts globally."""
    from fegis_spark.operators.dedup import tokens

    docs = load_table(spark, sf_dir, "documents")
    # Spark spelling of _DRIFT_HALF_SQL's md5 bucket (the repo recipe)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    half = F.when(bucket < 50, 1).otherwise(0)
    tok = docs.select(
        half.alias("half"), F.explode(tokens(F.col("text"))).alias("t")
    )
    counts = tok.groupBy("t").agg(
        F.sum("half").cast("bigint").alias("ca"),
        F.sum(1 - F.col("half")).cast("bigint").alias("cb"),
    )
    tot = counts.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.count(F.lit(1)).alias("v"),
    )
    scored = counts.crossJoin(F.broadcast(tot)).select(  # bcast-ok: 1-row agg
        "t",
        "ca",
        "cb",
        (
            (
                (F.col("ca") + 1).cast("double")
                / (F.col("cb") + 1).cast("double")
            )
            * (
                (F.col("nb") + F.col("v")).cast("double")
                / (F.col("na") + F.col("v")).cast("double")
            )
        ).alias("odds_ratio"),
    )
    # orderBy+limit fuses to TakeOrderedAndProject (per-partition
    # heaps) and keeps the count columns — no rank window needed
    return scored.orderBy(F.desc("odds_ratio"), "t").limit(15).select(
        "t", "ca", "cb", "odds_ratio"
    )


#: Zipf-fit sample: top-K terms by exact corpus frequency
ZIPF_K = 100


def _zipf_oracle() -> str:
    from fegis_spark.queries.sqlfrag import portable_ln

    k = ZIPF_K
    return f"""
    WITH cnt AS (
      SELECT t, COUNT(*) AS c FROM (
        SELECT unnest({duck_tokens('text')}) AS t FROM documents
      ) GROUP BY t
    ), top AS MATERIALIZED (
      SELECT t, c, row_number() OVER (ORDER BY c DESC, t) AS rk
      FROM cnt
      QUALIFY rk <= {k}
    ), pts AS MATERIALIZED (
      SELECT rk,
             {portable_ln('CAST(rk AS DOUBLE)')} AS x,
             {portable_ln('CAST(c AS DOUBLE)')} AS y
      FROM top
    ), sums AS (
      SELECT COUNT(*) AS n,
             list_aggregate(list(x ORDER BY rk), 'sum') AS sx,
             list_aggregate(list(y ORDER BY rk), 'sum') AS sy,
             list_aggregate(list(x * y ORDER BY rk), 'sum') AS sxy,
             list_aggregate(list(x * x ORDER BY rk), 'sum') AS sxx
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS k,
           (n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0) AS zipf_slope,
           (sy - ((n * sxy - sx * sy) / nullif(n * sxx - sx * sx, 0.0)) * sx) / n
             AS zipf_intercept
    FROM sums
    """


@register(
    "vocab_zipf_slope",
    oracle=_zipf_oracle(),
    covers=("§2.4-agg", "[EXT]-vocab-growth"),
)
def vocab_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Zipf rank-frequency fit over the top-{ZIPF_K} vocabulary:
    OLS slope/intercept of ln(freq) on ln(rank) — the corpus-health
    statistic that flags template-heavy or deduplication-damaged data
    (natural text sits near slope ≈ -1; boilerplate floods flatten the
    head, aggressive near-dup removal steepens it).

    Plan: one token-explode count agg, a no-window top-k
    (operators/topk.ranked_topk), then the regression runs entirely on
    the K-row table. Determinism: ranks/counts are exact ints;
    portable_ln (bit-identical cross-engine) runs once per top-k term;
    the four regression sums are RANK-ORDERED sequential folds (the
    _cos_pair convention — decimal transit is unsafe at these
    magnitudes, see CLAUDE.md r10); slope/intercept are single IEEE
    quotients over identical operands, shipped unrounded, with an
    identical nullif degenerate-corpus guard on both engines."""
    from fegis_spark.operators.dedup import tokens
    from fegis_spark.operators.topk import ranked_topk
    from fegis_spark.queries.sqlfrag import portable_ln

    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = ranked_topk(cnt, "c", "t", ZIPF_K, "rk")
    pts = top.select(
        "rk",
        F.col("rk").cast("double").alias("rk_d"),
        F.col("c").cast("double").alias("c_d"),
    ).select(
        "rk",
        F.expr(portable_ln("rk_d", spark=True)).alias("x"),
        F.expr(portable_ln("c_d", spark=True)).alias("y"),
    )

    def fold(expr: str) -> F.Column:
        # rank-ordered sequential fold over the K-row point set
        return F.expr(
            f"aggregate(transform(sort_array(collect_list(struct(rk, {expr}"
            f" AS v))), s -> s.v), 0.0D, (acc, q) -> acc + q)"
        )

    sums = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        fold("x").alias("sx"),
        fold("y").alias("sy"),
        fold("x * y").alias("sxy"),
        fold("x * x").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"), F.lit(0.0)
    )
    return sums.select(
        F.col("n").alias("k"),
        slope.alias("zipf_slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("zipf_intercept"),
    )
