"""Training-data pipeline catalog queries ([EXT]): deterministic
splits, token-budget packing, stratified sampling over `documents`.

These are the corpus-management ops a 100 TB pretraining pipeline runs
after curation (see curation_pipeline in textstats_q.py). All are
hash- or window-deterministic so the DuckDB oracle hash-matches:

* splits use an md5-derived bucket, NOT Spark's `hash()`/`rand()`
  (engine-specific / nondeterministic) — the same document lands in
  the same split on any engine, any cluster size, forever;
* packing uses a per-language running token total, so the assignment
  is a narrow window over (lang, doc_id) — no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fegis_spark.catalog import register
from fegis_spark.model import load_table, maybe_broadcast, table_bytes
from fegis_spark.queries.sqlfrag import duck_tokens

#: Spark-side md5 bucket in [0, 100): deterministic, uniform-ish, and
#: reproducible in any engine with md5 (DuckDB form below).
def _hash_bucket(col: F.Column, buckets: int = 100) -> F.Column:
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("bigint")
        % buckets
    )


def _hash_bucket_sql(col: str, buckets: int = 100) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 8)) AS BIGINT)"
        f" % {buckets}"
    )


def _split_case(bucket_col: str = "bucket") -> str:
    """80/10/10 split CASE over a named bucket column (parameterized —
    textual .replace on the shared constant silently breaks if the
    template ever gains another 'bucket' substring; r11 ADVICE)."""
    return (
        f"CASE WHEN {bucket_col} < 80 THEN 'train' "
        f"WHEN {bucket_col} < 90 THEN 'val' ELSE 'test' END"
    )


_SPLIT_CASE = _split_case()


def _split_case_sql(col: str) -> str:
    """DuckDB split assignment straight from a column (md5 bucket
    inlined) — the oracle twin of _split_of(_hash_bucket(col))."""
    b = _hash_bucket_sql(col)
    return f"CASE WHEN {b} < 80 THEN 'train' WHEN {b} < 90 THEN 'val' ELSE 'test' END"


def _split_of(bucket: F.Column) -> F.Column:
    """80/10/10 split from an md5 bucket in [0, 100)."""
    return F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")


@register(
    "train_test_split",
    oracle=f"""
    WITH bucketed AS (
      SELECT doc_id, lang, n_chars,
             {_hash_bucket_sql('doc_id')} AS bucket
      FROM documents
    )
    SELECT {_SPLIT_CASE} AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM bucketed
    GROUP BY 1, 2
    """,
    covers=("[EXT]-split",),
    bench=True,
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] deterministic 80/10/10 train/val/test split by md5 hash
    bucket of doc_id. A pure projection + one aggregation shuffle; the
    per-row split assignment is stable across engines and cluster
    sizes (no rand(), no row ordering dependence), which is what makes
    incremental re-runs and cross-system audits possible at 100 TB."""
    docs = load_table(spark, sf_dir, "documents")
    bucketed = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        _hash_bucket(F.col("doc_id")).alias("bucket"),
    )
    split = F.when(F.col("bucket") < 80, "train").when(
        F.col("bucket") < 90, "val"
    ).otherwise("test")
    return (
        bucketed.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "group_split_leakage",
    oracle=f"""
    WITH assigned AS (
      SELECT source,
             {_SPLIT_CASE} AS doc_split,
             {_split_case('gbucket')} AS grp_split
      FROM (
        SELECT source,
               {_hash_bucket_sql('doc_id')} AS bucket,
               {_hash_bucket_sql('source')} AS gbucket
        FROM documents
      )
    ), per_source AS (
      SELECT source,
             (MIN(doc_split) <> MAX(doc_split)) AS doc_leaks,
             (MIN(grp_split) <> MAX(grp_split)) AS grp_leaks,
             MIN(grp_split) AS grp_split,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN doc_split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS d_train,
             CAST(SUM(CASE WHEN doc_split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS d_val,
             CAST(SUM(CASE WHEN doc_split = 'test' THEN 1 ELSE 0 END) AS BIGINT) AS d_test
      FROM assigned
      GROUP BY source
    ), wide AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(CASE WHEN doc_leaks THEN 1 ELSE 0 END) AS BIGINT) AS doc_leaky,
             CAST(SUM(CASE WHEN grp_leaks THEN 1 ELSE 0 END) AS BIGINT) AS grp_leaky,
             CAST(SUM(d_train) AS BIGINT) AS doc_train,
             CAST(SUM(d_val) AS BIGINT) AS doc_val,
             CAST(SUM(d_test) AS BIGINT) AS doc_test,
             CAST(SUM(CASE WHEN grp_split = 'train' THEN n_docs ELSE 0 END) AS BIGINT) AS grp_train,
             CAST(SUM(CASE WHEN grp_split = 'val' THEN n_docs ELSE 0 END) AS BIGINT) AS grp_val,
             CAST(SUM(CASE WHEN grp_split = 'test' THEN n_docs ELSE 0 END) AS BIGINT) AS grp_test
      FROM per_source
    )
    SELECT 'doc_hash' AS strategy, doc_leaky AS leaky_groups, n_groups,
           doc_train AS train_docs, doc_val AS val_docs, doc_test AS test_docs
    FROM wide
    UNION ALL
    SELECT 'group_hash' AS strategy, grp_leaky AS leaky_groups, n_groups,
           grp_train AS train_docs, grp_val AS val_docs, grp_test AS test_docs
    FROM wide
    """,
    covers=("[EXT]-group-split",),
)
def group_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] group-aware (leakage-free) splitting vs the per-document
    hash split, measured side by side. Splitting by md5(doc_id) puts
    near-identical documents from the same provenance group (source /
    domain / author) on BOTH sides of the train/eval boundary — the
    classic eval-leakage failure; splitting by md5(GROUP KEY) keeps
    every group whole. The query assigns both strategies in one
    corpus pass and reports, per strategy, the number of groups whose
    documents straddle >1 split (leaky_groups — computed, not
    asserted: ~all groups leak under doc_hash, structurally 0 under
    group_hash) plus the achieved split sizes, which is the honest
    cost of group splitting: coarse groups quantize the 80/10/10
    target.

    Plan shape for 100 TB: one scan → one hash-agg shuffle on the
    group key (domains are ~10^7 at web scale — well-distributed) →
    a |groups|-row second agg; the two output strategy rows come from
    ONE wide row via explode, so the corpus is never rescanned."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    assigned = docs.select(
        "source",
        _split_of(_hash_bucket(F.col("doc_id"))).alias("doc_split"),
        _split_of(_hash_bucket(F.col("source"))).alias("grp_split"),
    )
    # "straddles >1 split" == min != max (3 split values) — avoids the
    # countDistinct Expand (3x map-side rows + an extra exchange)
    per_source = assigned.groupBy("source").agg(
        (F.min("doc_split") != F.max("doc_split")).alias("doc_leaks"),
        (F.min("grp_split") != F.max("grp_split")).alias("grp_leaks"),
        F.min("grp_split").alias("grp_split"),
        F.count("*").alias("n_docs"),
        F.sum((F.col("doc_split") == "train").cast("int")).alias("d_train"),
        F.sum((F.col("doc_split") == "val").cast("int")).alias("d_val"),
        F.sum((F.col("doc_split") == "test").cast("int")).alias("d_test"),
    )
    wide = per_source.agg(
        F.count("*").alias("n_groups"),
        F.sum(F.col("doc_leaks").cast("int")).alias("doc_leaky"),
        F.sum(F.col("grp_leaks").cast("int")).alias("grp_leaky"),
        F.sum("d_train").alias("doc_train"),
        F.sum("d_val").alias("doc_val"),
        F.sum("d_test").alias("doc_test"),
        F.sum(
            F.when(F.col("grp_split") == "train", F.col("n_docs")).otherwise(0)
        ).alias("grp_train"),
        F.sum(
            F.when(F.col("grp_split") == "val", F.col("n_docs")).otherwise(0)
        ).alias("grp_val"),
        F.sum(
            F.when(F.col("grp_split") == "test", F.col("n_docs")).otherwise(0)
        ).alias("grp_test"),
    )
    rows = F.array(
        F.struct(
            F.lit("doc_hash").alias("strategy"),
            F.col("doc_leaky").alias("leaky_groups"),
            F.col("n_groups").alias("n_groups"),
            F.col("doc_train").alias("train_docs"),
            F.col("doc_val").alias("val_docs"),
            F.col("doc_test").alias("test_docs"),
        ),
        F.struct(
            F.lit("group_hash").alias("strategy"),
            F.col("grp_leaky").alias("leaky_groups"),
            F.col("n_groups").alias("n_groups"),
            F.col("grp_train").alias("train_docs"),
            F.col("grp_val").alias("val_docs"),
            F.col("grp_test").alias("test_docs"),
        ),
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


@register(
    "split_leakage_neardup",
    oracle=f"""
    WITH base AS (
      SELECT doc_id AS doc, lang, source,
             list_distinct(list_transform(range(0, len(tok)-2),
                           i -> array_to_string(list_slice(tok, i+1, i+3), ' '))) AS sh
      FROM (SELECT *, {duck_tokens('text')} AS tok FROM documents)
      WHERE len(tok) >= 3
    ), ex AS (
      SELECT doc, lang, source, len(sh) AS n_sh, unnest(sh) AS g FROM base
    ), pairs AS (
      SELECT a, b, a_source, b_source FROM (
        SELECT l.doc AS a, r.doc AS b,
               l.source AS a_source, r.source AS b_source,
               count(*)::DOUBLE / (l.n_sh + r.n_sh - count(*)) AS jaccard
        FROM ex l JOIN ex r
          ON l.g = r.g AND l.doc < r.doc AND l.lang = r.lang
        GROUP BY l.doc, r.doc, l.n_sh, r.n_sh, l.source, r.source
      ) WHERE jaccard >= 0.5
    ), tagged AS (
      SELECT ({_split_case_sql('a')} <> {_split_case_sql('b')}) AS doc_cross,
             ({_split_case_sql('a_source')} <> {_split_case_sql('b_source')}) AS grp_cross
      FROM pairs
    ), wide AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(COALESCE(SUM(CASE WHEN doc_cross THEN 1 ELSE 0 END), 0) AS BIGINT) AS doc_cross,
             CAST(COALESCE(SUM(CASE WHEN grp_cross THEN 1 ELSE 0 END), 0) AS BIGINT) AS grp_cross
      FROM tagged
    )
    SELECT 'doc_hash' AS strategy, doc_cross AS cross_pairs,
           n_pairs - doc_cross AS within_pairs
    FROM wide
    UNION ALL
    SELECT 'group_hash' AS strategy, grp_cross AS cross_pairs,
           n_pairs - grp_cross AS within_pairs
    FROM wide
    """,
    covers=("[EXT]-split-leakage",),
)
def split_leakage_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] how much near-duplicate content LEAKS across the
    train/eval boundary, per split strategy. Near-dup pairs (exact
    3-gram Jaccard >= 0.5 within language blocks — the oracle-checked
    verifier tier of the dedup family) are tagged with each side's
    split under (a) the per-document md5 split and (b) the group-aware
    source split, then counted as cross-split (leaking) vs within.
    Group splitting kills all WITHIN-source leakage structurally, but
    the measurement is honest about the residual: near-dup pairs that
    span two sources (syndicated/boilerplate text) can still straddle
    a group split — both numbers are computed from the same pair set,
    not asserted.

    Plan shape for 100 TB: the pair generator is the blocked gram
    equi-join (distinct-gram collapse bounds boilerplate; AQE
    skew-split covers hot grams — same story as dedup_ngram_jaccard);
    split tags are pure md5 projections of the pair's OWN columns
    (payload_cols carries source through the generator), so no join
    back to the corpus. At production scale the exact-Jaccard pair
    source swaps for the capped MinHash tier (dedup_minhash_capped)
    with this same tagging aggregation on top."""
    from fegis_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    # band-ok: unbounded shingle keyspace; AQE skew-split covers hot grams
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", ["lang"],
        ngram=3, threshold=0.5, payload_cols=("source",),
    )
    doc_cross = _split_of(_hash_bucket(F.col("a"))) != _split_of(
        _hash_bucket(F.col("b"))
    )
    grp_cross = _split_of(_hash_bucket(F.col("a_source"))) != _split_of(
        _hash_bucket(F.col("b_source"))
    )
    wide = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.coalesce(F.sum(doc_cross.cast("int")), F.lit(0)).alias("doc_cross"),
        F.coalesce(F.sum(grp_cross.cast("int")), F.lit(0)).alias("grp_cross"),
    )
    rows = F.array(
        F.struct(
            F.lit("doc_hash").alias("strategy"),
            F.col("doc_cross").alias("cross_pairs"),
            (F.col("n_pairs") - F.col("doc_cross")).alias("within_pairs"),
        ),
        F.struct(
            F.lit("group_hash").alias("strategy"),
            F.col("grp_cross").alias("cross_pairs"),
            (F.col("n_pairs") - F.col("grp_cross")).alias("within_pairs"),
        ),
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


#: chars per pack — stand-in for a token budget (documents carry
#: n_chars; swap in a token-count column for real corpora).
PACK_BUDGET = 16_384


@register(
    "pack_sequences",
    oracle=f"""
    WITH packed AS (
      SELECT lang, doc_id, n_chars,
             CAST(floor(
               COALESCE(SUM(n_chars) OVER (
                 PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {PACK_BUDGET}.0
             ) AS BIGINT) AS pack_id
      FROM documents
    )
    SELECT lang, pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS pack_chars
    FROM packed
    GROUP BY lang, pack_id
    """,
    covers=("[EXT]-packing",),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] token-budget sequence packing: documents are streamed in
    (lang, doc_id) order and assigned to the pack their running char
    total lands in — the standard greedy pre-tokenization packing for
    context-window filling. One window shuffle partitioned by lang
    (narrow per-language state, no global sort), one agg shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        # panel-ok: per-lang running total is the demo form; scale path is pack_greedy_sharded (operators/scale.py)
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = docs.select(
        "lang",
        "doc_id",
        "n_chars",
        F.floor(
            F.coalesce(F.sum("n_chars").over(w), F.lit(0)) / float(PACK_BUDGET)
        ).alias("pack_id"),
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("pack_chars"),
    )


#: per-language keep-rate (percent of hash space), e.g. downsample the
#: dominant language, keep the rest whole — the usual corpus-balancing
#: move before training.
SAMPLE_RATES = {"en": 25, "zh": 50, "de": 100, "fr": 100, "es": 100}


@register(
    "stratified_sample",
    oracle=f"""
    WITH bucketed AS (
      SELECT doc_id, lang,
             {_hash_bucket_sql('doc_id')} AS bucket
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_kept
    FROM bucketed
    WHERE bucket < CASE lang
      WHEN 'en' THEN 25 WHEN 'zh' THEN 50 ELSE 100 END
    GROUP BY lang
    """,
    covers=("[EXT]-sample",),
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] deterministic stratified sampling by language: keep a doc
    iff its md5 bucket falls under the language's keep-rate. Unlike
    df.sampleBy (seeded RNG, partition-order dependent), the kept set
    is a pure function of doc_id — re-runs, retries, and other engines
    agree row-for-row. Filter + one agg shuffle; the filter prunes
    before any shuffle so the downsampled language never moves."""
    docs = load_table(spark, sf_dir, "documents")
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in SAMPLE_RATES.items()],
        F.lit(100),
    )
    kept = docs.select("doc_id", "lang", _hash_bucket(F.col("doc_id")).alias("bucket")).filter(
        F.col("bucket") < rate
    )
    return kept.groupBy("lang").agg(F.count("*").alias("n_kept"))


#: chunking geometry: 500-char windows every 400 chars (100 overlap).
CHUNK_SIZE, CHUNK_STRIDE = 500, 400


@register(
    "chunk_documents",
    oracle=f"""
    SELECT doc_id,
           (off - 1) // {CHUNK_STRIDE} AS chunk_idx,
           length(substr(text, CAST(off AS INT), {CHUNK_SIZE})) AS chunk_chars,
           md5(substr(text, CAST(off AS INT), {CHUNK_SIZE})) AS chunk_hash
    FROM (
      SELECT doc_id, text,
             unnest(generate_series(1, CAST(n_chars AS INT), {CHUNK_STRIDE})) AS off
      FROM documents
    )
    """,
    covers=("[EXT]-chunking", "§2.8-explode"),
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] overlapping-window document chunking (500-char windows,
    100-char overlap) — the pre-embedding step for RAG / context-window
    prep. explode(sequence(...)) is a narrow per-row fan-out: no
    shuffle at all, and the chunk count per task stays proportional to
    its input bytes. Chunks are reported as (len, md5) so the result
    stays small while still value-checking the exact chunk bytes."""
    docs = load_table(spark, sf_dir, "documents")
    ex = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.col("n_chars").cast("int"), F.lit(CHUNK_STRIDE))
        ).alias("off"),
    )
    chunk = F.expr(f"substring(text, off, {CHUNK_SIZE})")
    return ex.select(
        "doc_id",
        F.floor((F.col("off") - 1) / CHUNK_STRIDE).alias("chunk_idx"),
        F.length(chunk).cast("bigint").alias("chunk_chars"),
        F.md5(chunk).alias("chunk_hash"),
    )


#: content-defined chunking geometry: boundary where the md5 bucket of
#: the trailing CDC_WINDOW-token window hits 0 mod CDC_DIVISOR →
#: expected chunk length = CDC_DIVISOR tokens.
CDC_WINDOW, CDC_DIVISOR = 4, 16


#: DuckDB twin of cdc_chunks as a reusable SELECT body (shared by the
#: chunking query and the chunk-level dedup-mass query so the chunk
#: geometry cannot drift between them).
_CDC_CHUNKS_SQL = f"""
    WITH base AS (
      SELECT doc_id, {duck_tokens('text')} AS tok FROM documents
    ), b AS (
      SELECT doc_id, tok,
             list_concat(list_concat(
               [CAST(0 AS BIGINT)],
               CASE WHEN len(tok) >= {CDC_WINDOW} THEN
                 list_filter(list_transform(range({CDC_WINDOW}, len(tok) + 1),
                   i -> CASE WHEN CAST(('0x' || substr(md5(array_to_string(
                            list_slice(tok, i - {CDC_WINDOW} + 1, i), ' ')),
                            1, 8)) AS BIGINT) % {CDC_DIVISOR} = 0
                          AND i < len(tok)
                        THEN i ELSE CAST(-1 AS BIGINT) END),
                   p -> p >= 0)
               ELSE [] END),
               [len(tok)]) AS bounds
      FROM base WHERE len(tok) > 0
    )
    SELECT doc_id, j AS chunk_idx,
           bounds[j + 2] - bounds[j + 1] AS n_tok,
           md5(array_to_string(
             list_slice(tok, bounds[j + 1] + 1, bounds[j + 2]), ' '))
             AS chunk_hash
    FROM b, unnest(range(0, len(bounds) - 1)) AS t(j)
"""


@register(
    "cdc_chunk_documents",
    oracle=_CDC_CHUNKS_SQL,
    covers=("[EXT]-cdc-chunking", "§2.8-explode"),
)
def cdc_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] content-defined chunking (LBFS, Muthitacharoen et al.
    2001 — the FastCDC family's basic form) at token granularity: a
    chunk boundary falls AFTER token i wherever the md5 bucket of the
    trailing 4-token window is 0 mod 16, giving ~16-token chunks whose
    boundaries are functions of CONTENT, not position — insert a
    sentence and only the chunks touching it change hash, which is
    what makes chunk-level dedup robust to edits (fixed-stride
    chunk_documents shifts every downstream chunk). Emits (doc_id,
    chunk_idx, n_tok, chunk_hash); equal chunk_hash across docs =
    shared content block. Pure per-row HOF projection + one explode —
    zero shuffle; min/max clamps (full FastCDC) are a knob on the
    boundary predicate, not a redesign. Edit-robustness is pinned in
    tests/test_pipeline.py::test_cdc_chunks_realign_after_edit."""
    return cdc_chunks(load_table(spark, sf_dir, "documents"))


def cdc_chunks(docs: DataFrame) -> DataFrame:
    """Core content-defined chunking over a (doc_id, text) frame —
    separated from the catalog builder so constructed-corpus tests can
    pin the boundary-realignment property."""
    from fegis_spark.operators.dedup import tokens

    B, D = CDC_WINDOW, CDC_DIVISOR
    base = docs.select("doc_id", tokens(F.col("text")).alias("tok")).filter(
        F.size("tok") > 0
    )
    gram = f"concat_ws(' ', slice(tok, i - {B} + 1, {B}))"
    bucket = f"CAST(conv(substring(md5({gram}), 1, 8), 16, 10) AS BIGINT) % {D}"
    bounds = (
        f"concat(array(CAST(0 AS BIGINT)), "
        f"CASE WHEN size(tok) >= {B} THEN "
        f"filter(transform(sequence({B}, size(tok)), "
        f"i -> IF({bucket} = 0 AND i < size(tok), CAST(i AS BIGINT), -1L)), "
        f"p -> p >= 0) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END, "
        f"array(CAST(size(tok) AS BIGINT)))"
    )
    withb = base.select("doc_id", "tok", F.expr(bounds).alias("bounds"))
    return (
        withb.select(
            "doc_id",
            "tok",
            "bounds",
            F.explode(F.expr("sequence(0, size(bounds) - 2)")).alias("j"),
        )
        .select(
            "doc_id",
            F.col("j").cast("bigint").alias("chunk_idx"),
            F.expr("element_at(bounds, j + 2) - element_at(bounds, j + 1)").alias(
                "n_tok"
            ),
            F.expr(
                "md5(concat_ws(' ', slice(tok, "
                "CAST(element_at(bounds, j + 1) + 1 AS INT), "
                "CAST(element_at(bounds, j + 2) - element_at(bounds, j + 1) AS INT))))"
            ).alias("chunk_hash"),
        )
    )


#: contamination geometry: 8-token grams, report eval docs with >= 20%
#: of their grams present in a train doc.
CONTAM_NGRAM, CONTAM_THRESHOLD = 8, 0.2
#: deterministic eval holdout: every 53rd doc plays the benchmark set.
EVAL_MOD = 53


@register(
    "contamination_check",
    oracle=f"""
    WITH base AS (
      SELECT doc_id AS doc,
             list_distinct(list_transform(range(0, len(tok)-{CONTAM_NGRAM - 1}),
                           i -> array_to_string(list_slice(tok, i+1, i+{CONTAM_NGRAM}), ' '))) AS sh
      FROM (SELECT *, {duck_tokens('text')} AS tok
            FROM documents)
      WHERE len(tok) >= {CONTAM_NGRAM}
    ),
    ev AS (SELECT doc, len(sh) AS n_grams, unnest(sh) AS g FROM base WHERE doc % {EVAL_MOD} = 0),
    tr AS (SELECT doc, unnest(sh) AS g FROM base WHERE doc % {EVAL_MOD} <> 0)
    SELECT train_doc, eval_doc, n_shared, contamination FROM (
      SELECT tr.doc AS train_doc, ev.doc AS eval_doc,
             count(*) AS n_shared,
             round(count(*)::DOUBLE / ev.n_grams, 6) AS contamination
      FROM tr JOIN ev ON tr.g = ev.g
      GROUP BY tr.doc, ev.doc, ev.n_grams
    ) WHERE contamination >= {CONTAM_THRESHOLD}
    """,
    covers=("[EXT]-contamination",),
    bench=True,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] benchmark-contamination detection: which training docs
    contain >=20% of an eval doc's 8-token-grams. The eval side (a
    deterministic 1-in-{EVAL_MOD} holdout standing in for a benchmark
    suite) is tiny, so its exploded gram table is broadcast — the
    train corpus streams through map-side, no corpus shuffle; the only
    exchange is the per-(train,eval) count aggregation, bounded by
    matching pairs, not corpus size."""
    from pyspark import StorageLevel

    from fegis_spark.operators.dedup import with_shingles

    docs = load_table(spark, sf_dir, "documents")
    # persisted (r14 opt): the 8-gram shingle table feeds BOTH the
    # eval (broadcast) and train sides — without the cache each
    # consumer redoes the tokenize+NGram corpus pass (~0.8 s of the
    # 1.3 s sf0.1 wall; same multi-consumer persist convention as
    # minhash_lsh_pairs' shingle base)
    sh = with_shingles(docs, "text", "doc_id", n=CONTAM_NGRAM).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ev = (
        sh.filter(F.col("doc") % EVAL_MOD == 0)
        .select("doc", F.size("sh").alias("n_grams"), F.explode("sh").alias("g"))
    )
    tr = sh.filter(F.col("doc") % EVAL_MOD != 0).select(
        "doc", F.explode("sh").alias("g")
    )
    joined = tr.alias("tr").join(
        # bcast-ok: eval-suite gram table — a held-out benchmark is
        # bounded by design (thousands of docs), not corpus-scaled;
        # this synthetic stand-in samples 1/EVAL_MOD of docs only so
        # the check fires at every sf
        F.broadcast(ev.alias("ev")), F.col("tr.g") == F.col("ev.g")
    )
    return (
        joined.groupBy(
            F.col("tr.doc").alias("train_doc"),
            F.col("ev.doc").alias("eval_doc"),
            F.col("ev.n_grams").alias("n_grams"),
        )
        .agg(F.count("*").alias("n_shared"))
        .withColumn(
            "contamination", F.round(F.col("n_shared") / F.col("n_grams"), 6)
        )
        .filter(F.col("contamination") >= CONTAM_THRESHOLD)
        .select("train_doc", "eval_doc", "n_shared", "contamination")
    )


#: epoch size for the mixture plan (docs drawn per training epoch).
EPOCH_DOCS = 10_000


@register(
    "mixture_plan",
    oracle=f"""
    WITH cells AS (
      SELECT lang, source, COUNT(*) AS n_docs,
             CAST(round(sqrt(COUNT(*)), 6) AS DECIMAL(38,6)) AS w
      FROM documents GROUP BY lang, source
    ), tot AS (
      SELECT CAST(SUM(w) AS DOUBLE) AS total_w FROM cells
    )
    SELECT lang, source, n_docs,
           round(CAST(w AS DOUBLE) / total_w, 6) AS target_frac,
           CAST(floor(CAST(w AS DOUBLE) / total_w * {EPOCH_DOCS}) AS BIGINT) AS docs_per_epoch
    FROM cells, tot
    """,
    covers=("[EXT]-mixture", "§2.4-agg"),
)
def mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] corpus-mixture planning: per (lang, source) domain, the
    epoch sampling quota under sqrt (temperature-2) re-weighting — the
    standard move that keeps dominant domains from drowning the mix.
    One agg shuffle down to |domains| rows; the grand total rides a
    broadcast cross join of a 1-row aggregate. Weights are rounded
    then decimal-summed so the total (and every floor() boundary) is
    identical on any engine and any partition order."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.sqrt(F.count("*")), 6).cast("decimal(38,6)").alias("w"),
    )
    tot = cells.agg(F.sum("w").cast("double").alias("total_w"))
    frac = F.col("w").cast("double") / F.col("total_w")
    return cells.crossJoin(F.broadcast(tot)).select(  # bcast-ok: 1-row agg
        "lang",
        "source",
        "n_docs",
        F.round(frac, 6).alias("target_frac"),
        F.floor(frac * EPOCH_DOCS).cast("bigint").alias("docs_per_epoch"),
    )


@register(
    "pack_sequences_sharded",
    oracle=f"""
    WITH s AS (
      SELECT lang, doc_id, n_chars,
             {_hash_bucket_sql('doc_id', 4)} AS shard
      FROM documents
    ), l AS (
      SELECT *, CAST(floor(
               COALESCE(SUM(n_chars) OVER (
                 PARTITION BY lang, shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {PACK_BUDGET}.0
             ) AS BIGINT) AS local_pack
      FROM s
    ), c AS (
      SELECT lang, shard, max(local_pack) + 1 AS n_packs FROM l GROUP BY lang, shard
    ), o AS (
      SELECT lang, shard,
             COALESCE(SUM(n_packs) OVER (
               PARTITION BY lang ORDER BY shard
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS pack_base
      FROM c
    )
    SELECT l.lang, CAST(o.pack_base + l.local_pack AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(l.n_chars) AS BIGINT) AS pack_chars
    FROM l JOIN o ON l.lang = o.lang AND l.shard = o.shard
    GROUP BY 1, 2
    """,
    covers=("[EXT]-packing", "[EXT]-packing-sharded"),
)
def pack_sequences_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] the parallel form of pack_sequences: greedy packing runs
    independently per (lang, md5-shard) sub-stream — 4 shards here,
    hundreds at 100 TB — and a broadcast prefix-sum over per-shard
    pack counts renumbers local packs into contiguous global ids.
    This is the skew fix promised in SCALE.md, oracle-checked
    end-to-end because the shard assignment uses the portable md5
    bucket rather than an engine hash."""
    from fegis_spark.operators.scale import pack_greedy_sharded

    docs = load_table(spark, sf_dir, "documents").select("lang", "doc_id", "n_chars")
    packed = pack_greedy_sharded(
        docs, ["lang"], "doc_id", "n_chars", budget=PACK_BUDGET, shards=4
    )
    return packed.groupBy("lang", "pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("pack_chars"),
    )


@register(
    "pack_shard_probe",
    oracle=f"""
    SELECT {_hash_bucket_sql('doc_id', 4)} AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM documents
    GROUP BY 1
    """,
    covers=("[EXT]-packing-sharded",),
)
def pack_shard_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] diagnostic companion to pack_sequences_sharded: emits the
    md5-bucket shard assignment (operators/scale.py recipe, 4 shards)
    in aggregate form — per-shard count plus doc_id sum/min/max — so a
    cross-engine CORRECTNESS run localizes any divergence to either
    the shard recipe (this query mismatches) or the pack arithmetic
    (this passes, pack_sequences_sharded fails). Pure integer outputs:
    no float formatting anywhere."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % 4
    )
    return docs.select("doc_id", shard.alias("shard")).groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


@register(
    "stratified_fixed_k",
    oracle="""
    SELECT doc_id, lang, rk FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= 5
    """,
    covers=("[EXT]-sample",),
)
def stratified_fixed_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] exact-k-per-stratum sampling (the reservoir-sample
    complement of the rate-based stratified_sample): exactly 5 docs per
    language, chosen by md5 order — a pure function of doc_id, so
    re-runs and other engines agree row-for-row. The window partitions
    by lang (parallel across strata, never a single-partition window);
    at 100 TB the md5 rank-and-filter pushes k rows per stratum out of
    each partition before the final per-stratum merge."""
    docs = load_table(spark, sf_dir, "documents")
    # panel-ok: WindowGroupLimit(Partial) — md5 rank + filter pushes k per partition (docstring)
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
    )


from fegis_spark.operators.text_analysis import quality_score_sql  # noqa: E402


@register(
    "quality_weighted_sample",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {quality_score_sql('text')} AS quality,
             {_hash_bucket_sql('doc_id')} AS bucket
      FROM documents
    )
    SELECT lang, COUNT(*) AS n_kept,
           CAST(SUM(CAST(quality AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_kept_quality
    FROM scored
    WHERE bucket < CAST(floor(quality * 100) AS BIGINT)
    GROUP BY lang
    """,
    covers=("[EXT]-sample",),
)
def quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] quality-weighted deterministic sampling: keep a document
    with probability equal to its quality score — high-quality docs
    survive, low-quality docs thin out — with the md5 bucket as the
    deterministic coin (same doc always gets the same draw; re-runs and
    other engines agree row-for-row). The importance-sampling step of
    a curation pipeline, zero RNG. One scan; the keep filter prunes
    before the only shuffle (the reporting agg)."""
    from fegis_spark.operators.text_analysis import quality_score_expr

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        quality_score_expr("text").alias("quality"),
        _hash_bucket(F.col("doc_id")).alias("bucket"),
    )
    kept = scored.filter(
        F.col("bucket") < F.floor(F.col("quality") * 100).cast("bigint")
    )
    return kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"),
        # decimal-exact SUM + count, not round(mean, 6): when n_kept
        # divides the 6dp grid the mean can land exactly on a .5e-6
        # midpoint where the engines' tie-breaks diverge (r5/r7 class)
        F.sum(F.col("quality").cast("decimal(38,6)"))
        .cast("double")
        .alias("sum_kept_quality"),
    )


@register(
    "temperature_sample",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_orig FROM documents GROUP BY source
    ), lo AS (SELECT MIN(n_orig) AS n_min FROM counts),
    rates AS (
      SELECT source, n_orig,
             sqrt(CAST(n_min AS DOUBLE) / n_orig) AS rate
      FROM counts CROSS JOIN lo
    )
    SELECT d.source, r.n_orig,
           COUNT(*) FILTER (
             WHERE {_hash_bucket_sql('d.doc_id', 10000)} < rate * 10000
           ) AS n_kept,
           r.rate AS rate
    FROM documents d JOIN rates r USING (source)
    GROUP BY d.source, r.n_orig, r.rate
    """,
    covers=("[EXT]-mixture", "[EXT]-sample"),
)
def temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] temperature (α=0.5) domain rebalancing — post-sample
    counts ∝ n_d^α, the standard fix for head-domain dominance in
    multilingual/multi-source corpora: the rarest source keeps 100%,
    a source 4× larger keeps 50%. α=0.5 makes the keep-rate a sqrt —
    IEEE-correctly-rounded in every engine, so even the rate compare
    is portable. The md5 coin makes the kept set a pure function of
    doc_id. Plan: tiny counts agg broadcast back; the corpus-side
    filter is a projection."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_orig"))
    n_min = counts.agg(F.min("n_orig").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(  # bcast-ok: 1-row agg
        "source",
        "n_orig",
        F.sqrt(F.col("n_min").cast("double") / F.col("n_orig")).alias("rate"),
    )
    return (
        docs.join(F.broadcast(rates), "source")  # bcast-ok: one row per source (bounded enum)
        .groupBy("source", "n_orig", "rate")
        .agg(
            F.sum(
                F.when(
                    _hash_bucket(F.col("doc_id"), 10000) < F.col("rate") * 10000, 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_kept")
        )
        # rate emitted UNROUNDED: sqrt is IEEE-correctly-rounded in
        # both engines over the identical exact-integer ratio, so the
        # double is bit-identical; round(x, 6) would reintroduce the
        # midpoint tie-break class
        .select("source", "n_orig", "n_kept", "rate")
    )


@register(
    "curriculum_shards",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, round({quality_score_sql('text')}, 6) AS q FROM documents
    ), cuts AS (
      SELECT quantile_cont(q, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS c
      FROM scored
    ), assigned AS (
      SELECT doc_id, q,
             len(list_filter(c, x -> q > x)) AS shard
      FROM scored, cuts
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           round(MIN(q), 6) AS min_q,
           round(MAX(q), 6) AS max_q,
           CAST(SUM(CAST(q AS DECIMAL(38,6))) AS DOUBLE) AS sum_q
    FROM assigned GROUP BY shard
    """,
    covers=("[EXT]-export", "§2.4-quantiles", "[EXT]-quality"),
)
def curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] the curriculum-export shard plan, value-checked: docs are
    range-assigned to 10 contiguous quality shards via EXACT decile
    cutpoints — the same boundary-comparison math
    sources/export.write_sorted_shards' repartitionByRange applies at
    write time, expressed as a query so the driver can verify it.
    Spark's exact percentile() and DuckDB's quantile_cont share linear
    interpolation (parity pinned by quality_median_gate), and the
    strict q > cutpoint comparison is identical IEEE on both engines.

    Plan: one agg for the 9 cutpoints (1-row broadcast), then a
    map-side shard assignment + one agg shuffle on shard — no window,
    no global sort; exactly how a range-partitioned writer scales. The
    scored projection (doc_id, q — ~16 bytes/row) is persisted
    MEMORY_AND_DISK because both the cutpoint agg and the assignment
    consume it — without the cache the quality megaexpression runs
    twice over the full corpus. The returned plan references the cache
    (repo-wide cache-ownership policy: stays until LRU eviction or
    spark.catalog.clearCache())."""
    from pyspark import StorageLevel

    from fegis_spark.operators.text_analysis import quality_score_expr

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", F.round(quality_score_expr("text"), 6).alias("q")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cuts = scored.agg(
        F.percentile("q", F.lit([i / 10.0 for i in range(1, 10)])).alias("c")
    )
    assigned = scored.crossJoin(F.broadcast(cuts)).select(  # bcast-ok: 1-row decile cutpoints
        "doc_id",
        "q",
        F.size(F.filter(F.col("c"), lambda x: F.col("q") > x)).alias("shard"),
    )
    return assigned.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.round(F.min("q"), 6).alias("min_q"),
        F.round(F.max("q"), 6).alias("max_q"),
        F.sum(F.col("q").cast("decimal(38,6)")).cast("double").alias("sum_q"),
    )


def _js_sum(cp: str, cq: str, n_p: str, n_q: str, spark: bool = False) -> str:
    """Summed Jensen-Shannon term over per-token count columns cp/cq
    with total-count columns n_p/n_q — ONE SQL fragment valid in both
    Spark SQL and DuckDB (int/int division is double division in
    both), so the two sides cannot drift. The log goes through
    portable_ln (sqlfrag.py), which is bit-identical across engines —
    native ln() is 1 ulp off on ~2.5% of inputs (the midpoint flake
    class, evidence/ln_ulp_probe_r8.json). Zero counts contribute only
    through the other distribution's term (0·ln0 := 0, the JS
    convention — no smoothing needed). Per-token term is IEEE double,
    cast to DECIMAL(38,6) before the sum (dsum rule: associative,
    partition-order-proof), output rounded to 6 dp.
    """
    from fegis_spark.queries.sqlfrag import portable_ln

    p = f"({cp} / {n_p})"
    q = f"({cq} / {n_q})"
    lp = portable_ln(f"(2.0e0 * {p} / ({p} + {q}))", spark=spark)
    lq = portable_ln(f"(2.0e0 * {q} / ({p} + {q}))", spark=spark)
    term = (
        f"0.5 * ((CASE WHEN {cp} > 0 THEN {p} * {lp} ELSE 0.0 END)"
        f" + (CASE WHEN {cq} > 0 THEN {q} * {lq} ELSE 0.0 END))"
    )
    return f"round(CAST(SUM(CAST({term} AS DECIMAL(38,6))) AS DOUBLE), 6)"


@register(
    "split_divergence",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, text, {_hash_bucket_sql('doc_id')} AS bucket FROM documents
    ), tok AS (
      SELECT {_SPLIT_CASE} AS split, unnest({duck_tokens('text')}) AS t FROM b
    ), cnt AS (
      SELECT t,
             SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS c_train,
             SUM(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS c_val,
             SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS c_test
      FROM tok GROUP BY t
    ), tot AS (
      SELECT CAST(SUM(c_train) AS BIGINT) AS n_train,
             CAST(SUM(c_val) AS BIGINT) AS n_val,
             CAST(SUM(c_test) AS BIGINT) AS n_test
      FROM cnt
    )
    SELECT
           -- per-term DECIMAL(38,6) transit happens inside _js_sum
           -- lint: allow R3
           {_js_sum('c_train', 'c_val', 'n_train', 'n_val')} AS js_train_val,
           -- lint: allow R3
           {_js_sum('c_train', 'c_test', 'n_train', 'n_test')} AS js_train_test,
           MIN(n_train) AS n_tokens_train,
           MIN(n_val) AS n_tokens_val,
           MIN(n_test) AS n_tokens_test,
           CAST(SUM(CASE WHEN c_train > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_train,
           CAST(SUM(CASE WHEN c_val > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_val,
           CAST(SUM(CASE WHEN c_test > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_test,
           CAST(SUM(CASE WHEN c_train > 0 AND c_val > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_shared_train_val,
           CAST(SUM(CASE WHEN c_train > 0 AND c_test > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vocab_shared_train_test
    FROM cnt, tot
    """,
    covers=("[EXT]-split-divergence",),
)
def split_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] mixture-balance diagnostic: Jensen-Shannon divergence
    between the unigram distributions of the train split and each
    held-out split (same md5-bucket assignment as train_test_split) —
    the standard drift check that a deterministic split didn't land a
    skewed token mix, run before committing a 100 TB mixture plan.

    Plan shape: one token explode into one (token)-keyed conditional
    hash-agg (the only corpus shuffle); the per-token split-count table
    persists (MEMORY_AND_DISK) because it feeds BOTH the 1-row totals
    agg and the final divergence agg — without the cache each consumer
    would re-scan and re-tokenize the corpus. Totals broadcast via a
    1-row crossJoin; the final agg is a map-side partial over the vocab
    table. JS terms use the shared _js_sum fragment on both sides
    (precondition: every split non-empty — holds at every sf)."""
    from pyspark import StorageLevel

    from fegis_spark.operators.dedup import tokens

    docs = load_table(spark, sf_dir, "documents")
    split = (
        F.when(_hash_bucket(F.col("doc_id")) < 80, "train")
        .when(_hash_bucket(F.col("doc_id")) < 90, "val")
        .otherwise("test")
    )
    tok = docs.select(split.alias("split"), F.explode(tokens(F.col("text"))).alias("t"))
    cnt = (
        tok.groupBy("t")
        .agg(
            F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("c_train"),
            F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("c_val"),
            F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias("c_test"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    tot = cnt.agg(
        F.sum("c_train").cast("bigint").alias("n_train"),
        F.sum("c_val").cast("bigint").alias("n_val"),
        F.sum("c_test").cast("bigint").alias("n_test"),
    )
    flag = lambda c: F.sum((F.col(c) > 0).cast("int")).cast("bigint")  # noqa: E731
    return cnt.crossJoin(F.broadcast(tot)).agg(  # bcast-ok: 1-row agg
        F.expr(_js_sum("c_train", "c_val", "n_train", "n_val", spark=True)).alias("js_train_val"),
        F.expr(_js_sum("c_train", "c_test", "n_train", "n_test", spark=True)).alias("js_train_test"),
        F.min("n_train").alias("n_tokens_train"),
        F.min("n_val").alias("n_tokens_val"),
        F.min("n_test").alias("n_tokens_test"),
        flag("c_train").alias("vocab_train"),
        flag("c_val").alias("vocab_val"),
        flag("c_test").alias("vocab_test"),
        F.sum(((F.col("c_train") > 0) & (F.col("c_val") > 0)).cast("int"))
        .cast("bigint")
        .alias("vocab_shared_train_val"),
        F.sum(((F.col("c_train") > 0) & (F.col("c_test") > 0)).cast("int"))
        .cast("bigint")
        .alias("vocab_shared_train_test"),
    )


def _manifest_sql(src: str) -> str:
    """DuckDB bucket-XOR manifest over `src` — the ONE recipe string
    both corpus_checksums and checksum_drift_detect interpolate (the
    shared-fragment anti-drift rule)."""
    return f"""SELECT {_hash_bucket_sql('doc_id')} AS bucket,
           COUNT(*) AS n_docs,
           bit_xor(CAST(('0x' || substr(md5(
             CAST(doc_id AS VARCHAR) || ':' ||
             lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))
           ), 1, 15)) AS BIGINT)) AS xor_hash
    FROM {src}
    GROUP BY 1"""


def _manifest(docs: DataFrame) -> DataFrame:
    """Spark twin of _manifest_sql: (bucket, n_docs, xor_hash)."""
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("doc_id").cast("string"),
                    F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return (
        docs.select(_hash_bucket(F.col("doc_id")).alias("bucket"), h.alias("h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.bit_xor("h").alias("xor_hash"),
        )
    )


@register(
    "corpus_checksums",
    oracle=_manifest_sql("documents"),
    covers=("[EXT]-checksums",),
)
def corpus_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] order-independent corpus integrity manifest: per md5
    bucket, the XOR of each document's (id || normalized-content) hash
    — XOR is commutative/associative, so the checksum is identical for
    any partitioning, engine, or visit order, and any single changed /
    dropped / duplicated document flips its bucket's value. The
    cheap cross-system answer to 'did the export/copy/migration
    preserve the corpus byte-for-byte' (compare 100 rows, not 100 TB).
    One hash-agg shuffle over 100 bucket keys, map-side combined."""
    return _manifest(load_table(spark, sf_dir, "documents"))


#: constructed corruption for the drift detector: every 97th doc gets
#: one appended token (content flip), every 101st disappears (loss) —
#: deterministic on both engines, ~5+5 docs at sf0.01 so a handful of
#: buckets drift while most stay clean at every sf.
_DRIFT_CURR_SQL = """SELECT doc_id,
           CASE WHEN doc_id % 97 = 0 THEN text || ' x' ELSE text END AS text
    FROM documents WHERE doc_id % 101 <> 0"""


@register(
    "checksum_drift_detect",
    oracle=f"""
    WITH curr AS ({_DRIFT_CURR_SQL}),
    mb AS ({_manifest_sql('documents')}),
    mc AS ({_manifest_sql('curr')})
    SELECT COALESCE(mb.bucket, mc.bucket) AS bucket,
           COALESCE(mb.n_docs, 0) AS n_base,
           COALESCE(mc.n_docs, 0) AS n_curr,
           COALESCE(mb.n_docs, 0) - COALESCE(mc.n_docs, 0) AS n_delta
    FROM mb FULL OUTER JOIN mc ON mb.bucket = mc.bucket
    WHERE mb.xor_hash IS DISTINCT FROM mc.xor_hash
       OR mb.n_docs IS DISTINCT FROM mc.n_docs
    """,
    covers=("[EXT]-checksums", "§2.9-setops"),
)
def checksum_drift_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] manifest-diff corruption detector: build the bucket-XOR
    manifest of the corpus and of a deterministically corrupted twin
    (every 97th doc modified, every 101st dropped — the constructed-
    corpus pattern), full-outer join the two 100-row manifests, and
    emit ONLY the drifted buckets with their doc-count delta — the
    repair scope. This is the operational use of corpus_checksums:
    after a copy/migration/compaction, compare manifests (100 rows)
    and re-scan only the buckets that disagree, never the 100 TB.

    Scale: two manifest aggs (each one 100-key hash-agg, map-side
    combined) + a 100-row join; the corrupted side here is derived
    in-plan, in production it is the other system's manifest."""
    docs = load_table(spark, sf_dir, "documents")
    curr = docs.filter(F.col("doc_id") % 101 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 97 == 0, F.concat(F.col("text"), F.lit(" x"))
        ).otherwise(F.col("text")),
    )
    mb = _manifest(docs)
    mc = _manifest(curr)
    j = mb.alias("b").join(mc.alias("c"), "bucket", "full")
    return (
        j.filter(
            F.expr("b.xor_hash IS DISTINCT FROM c.xor_hash")
            | F.expr("b.n_docs IS DISTINCT FROM c.n_docs")
        )
        .select(
            "bucket",
            F.coalesce(F.col("b.n_docs"), F.lit(0)).alias("n_base"),
            F.coalesce(F.col("c.n_docs"), F.lit(0)).alias("n_curr"),
            (
                F.coalesce(F.col("b.n_docs"), F.lit(0))
                - F.coalesce(F.col("c.n_docs"), F.lit(0))
            ).alias("n_delta"),
        )
    )


@register(
    "expectations_report",
    oracle="""
    WITH agg AS (
      SELECT COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_empty,
             CAST(SUM(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT) AS v_nchars,
             CAST(SUM(CASE WHEN lang NOT IN ('en','fr','es','de','zh') THEN 1 ELSE 0 END) AS BIGINT)
               AS v_lang,
             CAST(SUM(CASE WHEN NOT regexp_full_match(source, 'src[0-9]+') THEN 1 ELSE 0 END) AS BIGINT)
               AS v_source,
             CAST(SUM(CASE WHEN n_chars <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_pos,
             COUNT(*) - COUNT(DISTINCT doc_id) AS v_unique
      FROM documents
    )
    SELECT rule, n_rows, n_violations, n_violations = 0 AS passed FROM (
      SELECT 'doc_id_unique' AS rule, n_rows, v_unique AS n_violations FROM agg
      UNION ALL SELECT 'lang_known', n_rows, v_lang FROM agg
      UNION ALL SELECT 'n_chars_matches_text', n_rows, v_nchars FROM agg
      UNION ALL SELECT 'n_chars_positive', n_rows, v_pos FROM agg
      UNION ALL SELECT 'source_format', n_rows, v_source FROM agg
      UNION ALL SELECT 'text_nonempty', n_rows, v_empty FROM agg
    )
    """,
    covers=("[EXT]-expectations", "§2.4-agg"),
)
def expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] data-contract validation (the Great-Expectations-style
    gate a corpus passes before training): row-level constraints
    (non-empty text, n_chars consistency/positivity, lang enum, source
    format) and the table-level doc_id uniqueness check, all computed
    in ONE scan — a single aggregate emits every violation counter
    (count-distinct rides the same two-level partial agg), then a
    6-row literal unpivot shapes (rule, n_rows, n_violations, passed).
    Complements fk_integrity_audit (cross-table FK edges) with
    in-table contract checks; at 100 TB this is one pass, no joins,
    output constant-size."""
    docs = load_table(spark, sf_dir, "documents")
    flag = lambda c: F.sum(c.cast("int")).cast("bigint")  # noqa: E731
    agg = docs.agg(
        F.count("*").alias("n_rows"),
        flag(F.length("text") == 0).alias("v_empty"),
        flag(F.col("n_chars") != F.length("text")).alias("v_nchars"),
        flag(~F.col("lang").isin("en", "fr", "es", "de", "zh")).alias("v_lang"),
        flag(~F.col("source").rlike("^src[0-9]+$")).alias("v_source"),
        flag(F.col("n_chars") <= 0).alias("v_pos"),
        (F.count("*") - F.count_distinct("doc_id")).alias("v_unique"),
    )
    rules = F.array(
        *[
            F.struct(F.lit(name).alias("rule"), F.col(col).alias("n_violations"))
            for name, col in [
                ("doc_id_unique", "v_unique"),
                ("lang_known", "v_lang"),
                ("n_chars_matches_text", "v_nchars"),
                ("n_chars_positive", "v_pos"),
                ("source_format", "v_source"),
                ("text_nonempty", "v_empty"),
            ]
        ]
    )
    return (
        agg.select("n_rows", F.explode(rules).alias("r"))
        .select(
            "r.rule",
            "n_rows",
            "r.n_violations",
            (F.col("r.n_violations") == 0).alias("passed"),
        )
    )


# ---------------------------------------------------------------------------
# End-to-end curation flagship ([EXT]-curation, r6 verdict #5): the
# already-green stages chained as ONE measured pipeline.

from fegis_spark.operators.text_analysis import gopher_metrics_sql  # noqa: E402
from fegis_spark.queries.dedup import _MH_VERIFY_CTE, _mh_pipeline_cte  # noqa: E402
from fegis_spark.queries.sqlfrag import HOT_CAP  # noqa: E402

_FS_GOPHER_KEEP_SPARK = gopher_metrics_sql("text", spark=True)["keep"]
_FS_GOPHER_KEEP_DUCK = gopher_metrics_sql("text", spark=False)["keep"]
#: curriculum decile cutpoint fractions (shared literal list)
_FS_DECILES = [i / 10.0 for i in range(1, 10)]


@register(
    "curation_flagship",
    oracle=f"""
    WITH keptdocs AS MATERIALIZED (
      SELECT doc_id, n_chars, text, q FROM (
        SELECT doc_id, n_chars, text,
               round({quality_score_sql('text')}, 6) AS q,
               {_FS_GOPHER_KEEP_DUCK} AS gk
        FROM documents
      ) WHERE gk = 1 AND q >= 0.5
    ),
    {_mh_pipeline_cte('keptdocs')}, sized AS MATERIALIZED (
      SELECT doc, b, bh,
             COUNT(*) OVER (PARTITION BY b, bh) AS bs,
             MIN(doc) OVER (PARTITION BY b, bh) AS rep
      FROM banded
    ), cand AS (
      SELECT DISTINCT a, b FROM (
        SELECT l.doc AS a, r.doc AS b
        FROM sized l JOIN sized r
          ON l.b = r.b AND l.bh = r.bh AND l.doc < r.doc
        WHERE l.bs <= {HOT_CAP}
        UNION ALL
        SELECT rep AS a, doc AS b FROM sized
        WHERE bs > {HOT_CAP} AND doc <> rep
      )
    ), {_MH_VERIFY_CTE}, surv AS MATERIALIZED (
      SELECT k.doc_id, k.n_chars, k.q
      FROM keptdocs k
      WHERE k.doc_id NOT IN (SELECT b FROM ver WHERE jaccard >= 0.5)
    ), cuts AS (
      SELECT quantile_cont(q, {_FS_DECILES}) AS c FROM surv
    ), assigned AS (
      SELECT doc_id, n_chars, q,
             len(list_filter(c, x -> q > x)) AS shard,
             {_hash_bucket_sql('doc_id', 4)} AS sub
      FROM surv, cuts
    ), lp AS (
      SELECT *, CAST(floor(
               COALESCE(SUM(n_chars) OVER (
                 PARTITION BY shard, sub ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {PACK_BUDGET}.0
             ) AS BIGINT) AS local_pack
      FROM assigned
    ), cnt AS (
      SELECT shard, sub, max(local_pack) + 1 AS n_packs FROM lp GROUP BY shard, sub
    ), o AS (
      SELECT shard, sub,
             COALESCE(SUM(n_packs) OVER (
               PARTITION BY shard ORDER BY sub
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS pack_base
      FROM cnt
    )
    SELECT lp.shard, CAST(o.pack_base + lp.local_pack AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(lp.n_chars) AS BIGINT) AS pack_chars,
           CAST(SUM(CAST(lp.q AS DECIMAL(38,6))) AS DOUBLE) AS sum_q
    FROM lp JOIN o ON lp.shard = o.shard AND lp.sub = o.sub
    GROUP BY 1, 2
    """,
    covers=(
        "[EXT]-curation",
        "[EXT]-gopher",
        "K9-minhash",
        "[EXT]-packing-sharded",
        "[EXT]-export",
    ),
)
def curation_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] the 100 TB curation story told END-TO-END instead of
    per-operator (r6 verdict #5): gopher keep + quality gate →
    capped-minhash near-dup removal → curriculum decile assignment →
    hierarchical sharded packing, one plan, oracle-checked at the
    final shard output. Every stage reuses the exact shared fragment
    its standalone query certifies (gopher_metrics_sql,
    _mh_pipeline_cte + cap routing + _MH_VERIFY_CTE,
    quantile/percentile cutpoints, the md5 sub-shard pack recipe), so
    a pass here certifies the COMPOSITION — including the survivor
    anti-join seams between stages — not just the stages.

    Persist hand-offs (the seams the per-query bench can't see):
    `kept` (gated narrow projection, doc_id/n_chars/q + text for
    shingling) feeds both the minhash candidate machinery and the
    survivor anti-join — persisted MEMORY_AND_DISK or the gate
    megaexpressions re-run per consumer; `surv` feeds the decile agg
    AND the pack assignment — persisted for the same reason. Drop
    policy is pairwise keep-min: any doc appearing as the greater id
    of a verified >= 0.5-Jaccard pair is removed (the SQL-expressible
    policy; component-based keep-best is dedup_components' variant).

    Scale shape: two corpus-narrow shuffles (band equi-join under the
    hot-bucket cap, pack windows over (shard, sub)), a SIZE-GATED
    drop-set anti-join (duplicate mass is not bounded, so the
    broadcast hint only applies under the gate), 1-row broadcast
    decile cutpoints, per-(shard,sub) prefix sums renumbered by a broadcast
    offset table — no global sort, no all-pairs work anywhere.
    Wall-time + plan facts: evidence/flagship_sf0.1_r7.json."""
    from pyspark import StorageLevel

    from fegis_spark.operators.dedup import minhash_lsh_pairs_portable
    from fegis_spark.operators.scale import pack_greedy_sharded
    from fegis_spark.operators.text_analysis import quality_score_expr

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "n_chars",
        "text",
        F.round(quality_score_expr("text"), 6).alias("q"),
        F.expr(_FS_GOPHER_KEEP_SPARK).alias("gk"),
    )
    kept = (
        scored.filter((F.col("gk") == 1) & (F.col("q") >= 0.5))
        .drop("gk")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pairs = minhash_lsh_pairs_portable(
        kept,
        "text",
        "doc_id",
        num_hashes=16,
        bands=4,
        ngram=3,
        jaccard_threshold=0.5,
        max_bucket_size=HOT_CAP,
        # kept docs subset documents; 32x covers the seeds projection
        # expansion (operator docstring)
        seed_bcast_bound=32 * table_bytes(sf_dir, "documents"),
        # sh_bcast_bound deliberately NOT set here: measured 6.97 ->
        # 7.54 s solo at sf0.1 WITH it (the broadcast build adds
        # latency while the pair table here is tiny and single-
        # consumer); the standalone minhash queries, whose verify tail
        # dominates, keep it (1.5-1.8x there)
    )
    drops = pairs.select(F.col("b").alias("doc_id")).distinct()
    surv = (
        # drop-set size is duplicate-mass-proportional, NOT bounded:
        # size-gate the hint (under the gate: same broadcast anti-join;
        # over it AQE picks from the drop set's real runtime size)
        kept.join(
            maybe_broadcast(drops, table_bytes(sf_dir, "documents")),
            "doc_id",
            "left_anti",
        )
        .select("doc_id", "n_chars", "q")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    cuts = surv.agg(F.percentile("q", F.lit(_FS_DECILES)).alias("c"))
    # curriculum shard is named cshard here because pack_greedy_sharded
    # emits its own `shard` column (the md5 sub-stream id) and would
    # clobber the key otherwise
    assigned = surv.crossJoin(F.broadcast(cuts)).select(  # bcast-ok: 1-row decile cutpoints
        "doc_id",
        "n_chars",
        "q",
        F.size(F.filter(F.col("c"), lambda x: F.col("q") > x)).alias("cshard"),
    )
    packed = pack_greedy_sharded(
        assigned, ["cshard"], "doc_id", "n_chars", budget=PACK_BUDGET, shards=4
    )
    return packed.groupBy(F.col("cshard").alias("shard"), F.col("pack_id")).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("pack_chars"),
        F.sum(F.col("q").cast("decimal(38,6)")).cast("double").alias("sum_q"),
    )


from fegis_spark.queries.vector_q import _cos_pair  # noqa: E402

#: semantic-contamination decision threshold (corpus max pairwise
#: cosine is ~0.51, so 0.35 fires on real rows at every sf)
SEMCONTAM_TAU = 0.35
#: eval panel = the first 8 vectors (the IVF-audit panel convention)
SEMCONTAM_PANEL = 8


@register(
    "contamination_semantic",
    oracle=f"""
    WITH p AS MATERIALIZED (
      SELECT vec_id AS eval_id, embedding FROM embeddings
      WHERE vec_id < {SEMCONTAM_PANEL}
    ), c AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id >= {SEMCONTAM_PANEL}
    ), scored AS (
      SELECT c.vec_id, p.eval_id,
             {_cos_pair('c.embedding', 'p.embedding')} AS s
      FROM c CROSS JOIN p
    ), best AS (
      SELECT vec_id, eval_id, s,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY s DESC, eval_id) AS rn
      FROM scored
    )
    SELECT vec_id, CAST(eval_id AS BIGINT) AS best_eval_id,
           round(s, 6) AS best_score,
           CASE WHEN s >= {SEMCONTAM_TAU} THEN 1 ELSE 0 END AS contaminated
    FROM best WHERE rn = 1
    """,
    covers=("[EXT]-contamination-semantic", "K1"),
)
def contamination_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] semantic decontamination: the embedding-space companion
    to the n-gram contamination_check — paraphrased eval leakage that
    shares no 8-gram still lands next to the benchmark in embedding
    space (the modern eval-dedup practice alongside lexical overlap).
    Every corpus vector is scored against the broadcast eval panel
    (first {SEMCONTAM_PANEL} vectors, the IVF-audit convention); the
    output is the per-vector verdict table: nearest eval doc
    ((cosine DESC, eval_id) total order), its score, contaminated
    flag as INT.

    100 TB posture: panel is benchmark-sized (thousands of rows at
    most) -> broadcast; the corpus streams map-side through the
    crossJoin and collapses via ONE partial-aggregating
    max(struct(score, -eval_id)) per vector — no window sort, no
    corpus shuffle beyond the final per-vector agg (house rule:
    min/max(struct) over groupBy+join-back)."""
    from fegis_spark.functions.vector import (
        cosine_from_parts_sql,
        dot_sql,
        norm_sql,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # norms once per side of the corpus x panel fanout (bit-identical
    # to cosine(), 1.8x less CPU per pair — r14)
    panel = emb.filter(F.col("vec_id") < SEMCONTAM_PANEL).select(
        F.col("vec_id").alias("eval_id"),
        F.col("embedding").alias("__pv"),
        F.expr(norm_sql("embedding")).alias("__pn"),
    )
    corpus = emb.filter(F.col("vec_id") >= SEMCONTAM_PANEL).select(
        "vec_id",
        F.col("embedding").alias("__cv"),
        F.expr(norm_sql("embedding")).alias("__cn"),
    )
    scored = corpus.crossJoin(F.broadcast(panel)).withColumn(  # bcast-ok: k-row query panel
        "s",
        F.expr(cosine_from_parts_sql(dot_sql("__cv", "__pv"), "__cn", "__pn")),
    )
    st = F.max(
        F.struct(F.col("s").alias("s"), (-F.col("eval_id")).alias("nid"))
    ).alias("st")
    return (
        scored.groupBy("vec_id")
        .agg(st)
        .select(
            "vec_id",
            (-F.col("st.nid")).cast("bigint").alias("best_eval_id"),
            F.round("st.s", 6).alias("best_score"),
            (F.col("st.s") >= SEMCONTAM_TAU).cast("int").alias("contaminated"),
        )
    )


#: source-overlap geometry: 3-token grams (phrase-level overlap; the
#: 8-gram contamination geometry is near-vacuous ACROSS synthetic
#: sources, while vocabulary-adjacent 3-grams give a non-degenerate
#: matrix at every sf — 190 pairs, shared counts 50-150 at sf0.01).
OVERLAP_NGRAM = 3


@register(
    "source_overlap_matrix",
    oracle=f"""
    WITH base AS (
      SELECT source,
             list_distinct(list_transform(range(0, len(tok)-{OVERLAP_NGRAM - 1}),
                           i -> array_to_string(list_slice(tok, i+1, i+{OVERLAP_NGRAM}), ' '))) AS sh
      FROM (SELECT source, {duck_tokens('text')} AS tok FROM documents)
      WHERE len(tok) >= {OVERLAP_NGRAM}
    ), g AS (
      SELECT DISTINCT source, md5(g) AS h
      FROM (SELECT source, unnest(sh) AS g FROM base)
    ), counts AS (
      SELECT source, COUNT(*) AS n FROM g GROUP BY source
    ), pairs AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_shared
      FROM g a JOIN g b ON a.h = b.h AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT p.src_a, p.src_b, ca.n AS n_a, cb.n AS n_b, p.n_shared,
           p.n_shared / CAST(ca.n + cb.n - p.n_shared AS DOUBLE) AS jaccard,
           p.n_shared / CAST(ca.n AS DOUBLE) AS cont_a_in_b,
           p.n_shared / CAST(cb.n AS DOUBLE) AS cont_b_in_a
    FROM pairs p
    JOIN counts ca ON p.src_a = ca.source
    JOIN counts cb ON p.src_b = cb.source
    """,
    covers=("[EXT]-source-overlap", "K9-jaccard"),
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] pairwise cross-source corpus-overlap matrix: for every
    source pair, EXACT distinct-{OVERLAP_NGRAM}-gram Jaccard plus both
    directed containments ("how much of A is inside B") — the corpus-
    curation tool that decides which web dumps are redundant
    subsets/supersets of each other before mixing (the CCNet /
    RefinedWeb source-triage step).

    100 TB posture: the corpus collapses FIRST to distinct
    (source, md5(gram)) — one hash-agg shuffle, after which every
    gram key carries at most |sources| rows, so the self-join fan-out
    is bounded by sources² per key (never doc-pair quadratic); the
    per-source totals are a |sources|-row broadcast. The gram string
    itself never shuffles twice — join keys are fixed-width md5. The
    distinct projection is persisted once and feeds all three
    consumers (counts + both join sides)."""
    from pyspark import StorageLevel
    from fegis_spark.operators.dedup import with_shingles

    docs = load_table(spark, sf_dir, "documents")
    sh = with_shingles(docs, "text", "source", n=OVERLAP_NGRAM)
    g = (
        sh.select(F.col("doc").alias("source"), F.explode("sh").alias("g"))
        .select("source", F.md5("g").alias("h"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = g.groupBy("source").agg(F.count("*").alias("n"))
    pairs = (
        g.alias("a")
        .join(
            g.alias("b"),
            (F.col("a.h") == F.col("b.h")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b"))
        .agg(F.count("*").alias("n_shared"))
    )
    ca = F.broadcast(counts.select(F.col("source").alias("src_a"), F.col("n").alias("n_a")))  # bcast-ok: one row per source
    cb = F.broadcast(counts.select(F.col("source").alias("src_b"), F.col("n").alias("n_b")))  # bcast-ok: one row per source
    return (
        pairs.join(ca, "src_a")
        .join(cb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            "n_shared",
            # UNROUNDED exact-integer ratios (bit-identical IEEE
            # divide); see CLAUDE.md on the round(k/n, 6) midpoint class
            (
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double")
            ).alias("jaccard"),
            (F.col("n_shared") / F.col("n_a").cast("double")).alias("cont_a_in_b"),
            (F.col("n_shared") / F.col("n_b").cast("double")).alias("cont_b_in_a"),
        )
    )


#: length-bucket ladder for padded-batch training; the last boundary
#: is the model context cap — longer docs TRUNCATE to it (non-vacuous
#: at every sf: documents.n_chars tops out a bit above 512).
PAD_BUCKETS = (64, 128, 256, 512)


def _pad_bucket_sql(col: str) -> str:
    """Shared CASE ladder (both engines) mapping a length to the
    smallest bucket boundary >= it, capped at the last boundary."""
    arms = " ".join(
        f"WHEN {col} <= {b} THEN {b}" for b in PAD_BUCKETS[:-1]
    )
    return f"CASE {arms} ELSE {PAD_BUCKETS[-1]} END"


@register(
    "pack_padding_audit",
    oracle=f"""
    WITH b AS (
      SELECT {_pad_bucket_sql('n_chars')} AS bucket_len,
             LEAST(n_chars, {PAD_BUCKETS[-1]}) AS eff_len,
             n_chars
      FROM documents
    )
    SELECT bucket_len,
           COUNT(*) AS n_docs,
           CAST(SUM(eff_len) AS BIGINT) AS real_chars,
           CAST(SUM(bucket_len - eff_len) AS BIGINT) AS pad_chars,
           CAST(SUM(n_chars - eff_len) AS BIGINT) AS trunc_chars,
           round(SUM(bucket_len - eff_len) / CAST(COUNT(*) * bucket_len AS DOUBLE), 6) AS pad_frac
    FROM b GROUP BY bucket_len
    """,
    covers=("[EXT]-packing-audit", "[EXT]-packing"),
)
def pack_padding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] padded-batch efficiency audit: bucket every document into
    the smallest power-of-two length boundary {PAD_BUCKETS} (cap =
    context length; longer docs truncate) and report, per bucket, the
    real/padding/truncated character mass and the padding fraction —
    the number that tells you whether bucketed batching wastes 5% or
    40% of your accelerator FLOPs, and what a boundary change buys.
    Companion to pack_sequences (packing ELIMINATES padding; this
    audit prices the simpler padded-batch regime against it).

    100 TB posture: pure map-side CASE projection + ONE partial
    aggregate down to |buckets| rows — no join, no window, nothing
    leaves the scan until the 4-row final agg. All masses are exact
    integer sums; the single ratio divides two exact integers."""
    docs = load_table(spark, sf_dir, "documents")
    cap = PAD_BUCKETS[-1]
    b = docs.select(
        F.expr(_pad_bucket_sql("n_chars")).alias("bucket_len"),
        F.least(F.col("n_chars"), F.lit(cap)).alias("eff_len"),
        "n_chars",
    )
    return b.groupBy("bucket_len").agg(
        F.count("*").alias("n_docs"),
        F.sum("eff_len").cast("bigint").alias("real_chars"),
        F.sum(F.col("bucket_len") - F.col("eff_len")).cast("bigint").alias("pad_chars"),
        F.sum(F.col("n_chars") - F.col("eff_len")).cast("bigint").alias("trunc_chars"),
        F.round(
            F.sum(F.col("bucket_len") - F.col("eff_len"))
            / (F.count("*") * F.first("bucket_len")).cast("double"),
            6,
        ).alias("pad_frac"),
    )


@register(
    "packing_vs_padding_savings",
    oracle=f"""
    WITH pads AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS real_chars,
             CAST(SUM(LEAST(n_chars, {PAD_BUCKETS[-1]})) AS BIGINT) AS real_capped,
             CAST(SUM({_pad_bucket_sql('n_chars')}) AS BIGINT) AS padded
      FROM documents
    ), packs AS (
      SELECT CAST(SUM(mx + 1) * {PACK_BUDGET} AS BIGINT) AS packed FROM (
        SELECT lang,
               MAX(CAST(floor(run / {PACK_BUDGET}.0) AS BIGINT)) AS mx
        FROM (
          SELECT lang,
                 COALESCE(SUM(n_chars) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run
          FROM documents
        ) GROUP BY lang
      )
    )
    SELECT n_docs, real_chars,
           padded AS padded_slot_chars,
           packed AS packed_slot_chars,
           real_capped / CAST(padded AS DOUBLE) AS util_padded,
           real_chars / CAST(packed AS DOUBLE) AS util_packed,
           (padded - packed) / CAST(padded AS DOUBLE) AS savings_frac
    FROM pads, packs
    """,
    covers=("[EXT]-packing", "[EXT]-packing-audit"),
)
def packing_vs_padding_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] the one-row 'so what' of the packing family: total slot
    characters a padded-batch regime consumes (bucket ladder, cap
    truncates) vs what greedy packing consumes (packs x budget), their
    utilizations, and the accelerator-time savings fraction packing
    buys. Interpolates the SAME bucket ladder as pack_padding_audit
    and the same running-sum recipe as pack_sequences, so the summary
    cannot drift from the audits it summarizes.

    Scale: one map-side agg (padded side) + the per-lang packing
    window collapsed to |langs| maxima; the final join is 1 row x
    1 row. Exact integer masses; the three ratios are unrounded
    bit-identical IEEE divides."""
    docs = load_table(spark, sf_dir, "documents")
    cap = PAD_BUCKETS[-1]
    pads = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("real_chars"),
        F.sum(F.least(F.col("n_chars"), F.lit(cap))).cast("bigint").alias(
            "real_capped"
        ),
        F.sum(F.expr(_pad_bucket_sql("n_chars"))).cast("bigint").alias("padded"),
    )
    w = (
        # panel-ok: per-lang running total — sharded twin is the scale path (operators/scale.py)
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packs = (
        docs.select(
            "lang",
            F.floor(
                F.coalesce(F.sum("n_chars").over(w), F.lit(0))
                / float(PACK_BUDGET)
            ).alias("pk"),
        )
        .groupBy("lang")
        .agg(F.max("pk").alias("mx"))
        .agg((F.sum(F.col("mx") + 1) * PACK_BUDGET).cast("bigint").alias("packed"))
    )
    return pads.crossJoin(F.broadcast(packs)).select(  # bcast-ok: 1-row agg
        "n_docs",
        "real_chars",
        F.col("padded").alias("padded_slot_chars"),
        F.col("packed").alias("packed_slot_chars"),
        # UNROUNDED exact-integer ratios (bit-identical IEEE divide);
        # see CLAUDE.md on the round(k/n, 6) midpoint class
        (F.col("real_capped") / F.col("padded").cast("double")).alias("util_padded"),
        (F.col("real_chars") / F.col("packed").cast("double")).alias("util_packed"),
        (
            (F.col("padded") - F.col("packed")) / F.col("padded").cast("double")
        ).alias("savings_frac"),
    )


@register(
    "dedup_chunk_mass",
    oracle=f"""
    WITH chunks AS ({_CDC_CHUNKS_SQL}),
    freq AS (
      SELECT chunk_hash, COUNT(DISTINCT doc_id) AS nd
      FROM chunks GROUP BY chunk_hash
    )
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(c.n_tok) AS BIGINT) AS n_tok,
           CAST(SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           CAST(SUM(CASE WHEN f.nd >= 2 THEN c.n_tok ELSE 0 END) AS BIGINT)
             AS dup_tok
    FROM chunks c JOIN freq f USING (chunk_hash)
    GROUP BY c.doc_id
    HAVING SUM(CASE WHEN f.nd >= 2 THEN 1 ELSE 0 END) > 0
    """,
    covers=("[EXT]-chunk-dedup", "[EXT]-cdc-chunking", "K9-exact"),
)
def dedup_chunk_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] chunk-level cross-document duplication mass (the
    paragraph-dedup shape of Dolma / RefinedWeb, re-expressed over
    content-defined chunks since the corpus is single-line): for every
    document carrying at least one chunk that also appears in ANOTHER
    document, its total and duplicated chunk/token mass — the
    sub-document complement of whole-doc dedup that catches shared
    boilerplate blocks inside otherwise-distinct pages. Content-
    defined boundaries make the chunk hashes edit-robust, so inserted
    sentences don't hide the shared block (see cdc_chunk_documents).

    Scale: the chunk table (md5 keys, uniform) persists and feeds both
    the cross-doc frequency hash-agg and the join-back — the same
    gram-join family as doc_novelty/boilerplate (16x probe band
    <=7.4); output is bounded by docs-with-shared-chunks. Cross-doc
    frequency uses COUNT(DISTINCT doc_id), so within-doc repetition
    (doc_repetition's job) never inflates it."""
    from pyspark import StorageLevel

    chunks = cdc_chunks(load_table(spark, sf_dir, "documents")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    freq = chunks.groupBy("chunk_hash").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    dup = F.when(F.col("nd") >= 2, 1).otherwise(0)
    return (
        chunks.join(freq, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum("n_tok").cast("bigint").alias("n_tok"),
            F.sum(dup).cast("bigint").alias("n_dup_chunks"),
            F.sum(F.when(F.col("nd") >= 2, F.col("n_tok")).otherwise(0))
            .cast("bigint")
            .alias("dup_tok"),
        )
        .filter(F.col("n_dup_chunks") > 0)
    )


#: rendezvous-sharding audit: base shard count and the expanded count
HRW_SHARDS = 8


def _hrw_weight_sql(key: str, shard: int, spark: bool = False) -> str:
    """md5-derived rendezvous weight of (key, shard) — the first 8 hex
    digits as a BIGINT. Same value on both engines, engine-specific
    spelling (the CLAUDE.md md5-bucket recipe: Spark has no hex-string
    cast, DuckDB has no conv)."""
    if spark:
        return (
            f"CAST(conv(substring(md5(CAST({key} AS STRING) || ':{shard}'),"
            f" 1, 8), 16, 10) AS BIGINT)"
        )
    return (
        f"CAST(('0x' || substr(md5(CAST({key} AS VARCHAR) || ':{shard}'),"
        f" 1, 8)) AS BIGINT)"
    )


def _hrw_oracle() -> str:
    n = HRW_SHARDS
    w = [_hrw_weight_sql("doc_id", s) for s in range(n + 1)]
    greatest_n = "greatest(" + ", ".join(w[:n]) + ")"
    # argmax by weight with shard-index tiebreak (lowest shard wins on
    # equal weights — ties are astronomically unlikely but must be
    # totally ordered on both engines)
    case_n = "CASE " + " ".join(
        f"WHEN {w[s]} = {greatest_n} THEN {s}" for s in range(n)
    ) + " END"
    return f"""
    WITH assigned AS (
      SELECT {case_n} AS shard,
             ({w[n]} > {greatest_n}) AS moves
      FROM documents
    )
    SELECT shard,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN moves THEN 1 ELSE 0 END) AS BIGINT) AS n_moving,
           SUM(CASE WHEN moves THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE)
             AS moving_frac
    FROM assigned GROUP BY shard
    """


@register(
    "hrw_sharding_audit",
    oracle=_hrw_oracle(),
    covers=("[EXT]-packing-sharded", "§2.4-agg"),
)
def hrw_sharding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] rendezvous (highest-random-weight) sharding audit: per
    HRW shard its document count AND how many of its documents would
    move when a 9th shard joins. HRW is the shard-assignment law an
    incremental 100 TB corpus wants instead of `hash % N`: on a
    resize, mod-N reassigns ~ (N-1)/N of ALL documents (every bucket
    renumbers) while HRW moves exactly the docs whose new-shard weight
    wins — E[moved] = 1/(N+1), and they ALL move to the new shard, so
    no existing shard ever exchanges data with another. The audit
    value-checks both properties: per-shard balance (uniform md5
    weights) and the ~1/9 moving fraction.

    Plan: one corpus projection computing N+1 md5 weights per row +
    one hash agg — zero joins, zero windows. Determinism: weights are
    exact integers; the argmax CASE carries a lowest-shard tiebreak;
    moving_frac is an exact-integer IEEE quotient, unrounded."""
    n = HRW_SHARDS
    w = [_hrw_weight_sql("doc_id", s, spark=True) for s in range(n + 1)]
    greatest_n = "greatest(" + ", ".join(w[:n]) + ")"
    case_n = "CASE " + " ".join(
        f"WHEN {w[s]} = {greatest_n} THEN {s}" for s in range(n)
    ) + " END"
    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.selectExpr(
        f"{case_n} AS shard", f"({w[n]} > {greatest_n}) AS moves"
    )
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("moves").cast("int")).cast("bigint").alias("n_moving"),
        (
            F.sum(F.col("moves").cast("int")) / F.count(F.lit(1)).cast("double")
        ).alias("moving_frac"),
    )
