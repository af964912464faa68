"""Batch-perceptron quality classifier (operators/classifier.py):
update-rule parity against a hand-computed reference, convergence on
the real corpus, and the empty-misclassified-set edge."""

from __future__ import annotations

from pyspark.sql import functions as F

from fegis_spark.operators.classifier import (
    PERC_ITERS,
    perceptron_features,
    perceptron_train,
)


def _mk_doc(n_words: int, word: str, stopwords: int) -> str:
    """n_words total: `stopwords` distinct required stopwords plus
    copies of `word` (no punctuation/digits, single line — matches the
    corpus shape the Gopher fragments assume)."""
    sw = ["the", "and", "that", "with"][:stopwords]
    return " ".join(sw + [word] * (n_words - len(sw)))


def test_perceptron_matches_hand_computed_first_rounds(spark):
    """Two docs — one Gopher-keep (60 words, 2 stopword hits), one
    drop (10 words) — trained 2 iterations; every emitted value is
    recomputed from first principles (own quantization, own update
    arithmetic, same IEEE ops)."""
    docs = spark.createDataFrame(
        [(1, _mk_doc(60, "word", 2)), (2, _mk_doc(10, "word", 0))],
        "doc_id long, text string",
    )
    got = perceptron_train(docs, iters=2).collect()

    # independent reference: quantized features + the update rule
    def feats(n_words, mwl, swh):
        raw = [1.0, n_words / 100.0, round(mwl, 6) / 10.0, swh / 2.0]
        q = [round(r * 1e6) for r in raw]
        return q, [v / 1e6 for v in q]

    # doc1: 2 stopwords (3+3 chars) + 58 x "word" -> mwl = (6+232)/60
    q1, x1 = feats(60, (3 + 3 + 58 * 4) / 60, 2)
    q2, x2 = feats(10, 4.0, 0)
    y = {1: 1.0, 2: -1.0}
    yi = {1: 1, 2: -1}
    w = [0.0] * 4
    for t, row in zip((1, 2), got):
        mis = [
            d
            for d, x in ((1, x1), (2, x2))
            if y[d] * (((w[0] * x[0] + w[1] * x[1]) + w[2] * x[2]) + w[3] * x[3])
            <= 0.0
        ]
        g = [
            sum(yi[d] * (q1 if d == 1 else q2)[j] for d in mis)
            for j in range(4)
        ]
        w = [w[j] + (0.01 / t) * ((g[j] / 1e6) / 2.0) for j in range(4)]
        assert row.iter == t and row.n_errors == len(mis)
        assert [row.w1, row.w2, row.w3, row.w4] == w  # bit-identical

    # iteration 1 starts at w=0: every margin is exactly 0 -> all mis
    assert got[0].n_errors == 2


def test_perceptron_converges_on_corpus(spark):
    """The catalog configuration (scaled features, 1/t decay, 12
    iterations) must actually learn the keep rule: <5% train error on
    the sf0.001 corpus, strictly better than the all-misclassified
    start."""
    from fegis_spark.model import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = {r.iter: r.n_errors for r in perceptron_train(docs).collect()}
    assert rows[1] == 500  # w=0 start: margin 0 everywhere
    assert rows[PERC_ITERS] < 25  # 95%+ train accuracy (measured: 2)


def test_perceptron_zero_misclassified_round_emits_row(spark):
    """A linearly-separated 2-doc corpus reaches err=0 quickly; later
    iterations must still emit rows with a zero gradient (the global
    agg-over-empty contract the oracle's COUNT CTE has), never
    truncate."""
    docs = spark.createDataFrame(
        [(1, _mk_doc(99, "verylongword", 4)), (2, _mk_doc(10, "ab", 0))],
        "doc_id long, text string",
    )
    out = perceptron_train(docs, iters=6).collect()
    assert [r.iter for r in out] == [1, 2, 3, 4, 5, 6]
    errs = [r.n_errors for r in out]
    assert errs[0] == 2 and errs[-1] == 0
    last_zero = [r for r in out if r.n_errors == 0]
    # once err hits 0 the weights freeze (zero gradient)
    if len(last_zero) >= 2:
        a, b = last_zero[-2], last_zero[-1]
        assert (a.w1, a.w2, a.w3, a.w4) == (b.w1, b.w2, b.w3, b.w4)


def test_feature_fragments_cross_engine(spark):
    """Spark and DuckDB dialects of the feature template agree value
    for value on the sf0.001 corpus (the per-row half of the oracle
    guarantee, isolated from the training loop)."""
    import duckdb

    cols_s = perceptron_features("text", spark=True)
    cols_d = perceptron_features("text", spark=False)
    from fegis_spark.model import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = (
        docs.select(
            "doc_id", *[F.expr(v).alias(k) for k, v in cols_s.items()]
        )
        .orderBy("doc_id")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        "SELECT * FROM '/root/testdata/sf0.001/documents.parquet'"
    )
    sel = ", ".join(f"{v} AS {k}" for k, v in cols_d.items())
    want = con.execute(
        f"SELECT doc_id, {sel} FROM documents ORDER BY doc_id"
    ).fetchall()
    assert len(got) == len(want) == 500
    for g, w in zip(got, want):
        assert tuple(g) == tuple(w)
