"""Mojibake scanner semantics on constructed corruption.

The catalog query `text_mojibake_scan` is gate-checked end-to-end, but
the sf corpora are clean ASCII, so the detector branches are pinned
here on documents built to trip each class — including the r8 ADVICE
bug: Spark's chr() is mod-256, so chr(65533) yields U+00FD 'ý', NOT
U+FFFD. The scanner must use the literal replacement character (see
textstats_q._REPL_CHAR) so a real U+FFFD is detected and a stray 'ý'
is not."""

from __future__ import annotations

from pyspark.sql import functions as F

from fegis_spark.queries.textstats_q import _MOJIBAKE_CORRUPT, _REPL_CHAR


def test_repl_char_is_real_uFFFD():
    assert _REPL_CHAR == "�"
    assert "chr(65533)" not in _MOJIBAKE_CORRUPT


def test_spark_chr_is_mod_256(spark):
    # The documented engine divergence that motivated the literal form.
    row = spark.range(1).select(F.chr(F.lit(65533)).alias("c")).first()
    assert row["c"] == "ý"  # NOT U+FFFD


def test_detector_hits_real_replacement_char_not_latin_yacute(spark):
    df = spark.createDataFrame(
        [
            (1, "clean ascii text"),
            (2, "broken seg�ment text"),
            (3, "resumý with latin small y acute"),  # must NOT match
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["repl"]
        for r in df.select(
            "doc_id",
            F.when(F.col("text").contains(F.lit(_REPL_CHAR)), 1)
            .otherwise(0)
            .alias("repl"),
        ).collect()
    }
    assert got == {1: 0, 2: 1, 3: 0}


def test_corruption_injects_real_uFFFD_on_spark(spark):
    # doc_id = 13 takes the %13 branch (13 % 7 != 0): the injected
    # character must be the genuine replacement char on the Spark side.
    df = spark.createDataFrame([(13, "abc")], "doc_id bigint, text string")
    out = df.select(F.expr(_MOJIBAKE_CORRUPT).alias("t")).first()["t"]
    assert "�" in out
    assert "ý" not in out
