"""Sketch-then-verify operators: the Misra-Gries heavy-hitter pipeline
must equal the brute-force GROUP BY answer on adversarial inputs (skew,
ties at the threshold, many partitions), because the exact-recount
stage is supposed to erase all sketch approximation. Also pins the
per-partition mergeable-summary guarantee directly (undercount
≤ n_p/(k+1) ⇒ every above-threshold item survives) and hand-checks
`bigram_logprob` on a constructed corpus."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from fegis_spark.operators.sketches import _mg_partition, heavy_hitters


def _exact_hh(rows: list[str], k: int) -> list[tuple[str, int]]:
    n = len(rows)
    cnt: dict[str, int] = {}
    for t in rows:
        cnt[t] = cnt.get(t, 0) + 1
    out = [(t, c) for t, c in cnt.items() if c * k > n]
    return sorted(out, key=lambda tc: (-tc[1], tc[0]))


def test_heavy_hitters_equals_bruteforce_on_skew(spark):
    # 3 genuine heavy hitters, a boundary item at EXACTLY n/k (must be
    # excluded by the strict filter), and a long tail of near-distinct
    # noise that overflows any k-counter summary.
    k = 10
    rows = (
        ["hot"] * 400
        + ["warm"] * 250
        + ["tepid"] * 151
        + [f"noise{i}" for i in range(99)]
    )
    # pad so n is a multiple of k, then add a boundary item with exactly n/k
    n_target = 1000
    rows += [f"pad{i}" for i in range(n_target - len(rows) - 100)] + ["edge"] * 100
    assert len(rows) == n_target and n_target % k == 0
    df = spark.createDataFrame([(t,) for t in rows], "t string").repartition(16)
    got = [(r.t, r.cnt) for r in heavy_hitters(df, "t", k=k).collect()]
    want = _exact_hh(rows, k)
    assert got == want
    assert ("edge", 100) not in got  # 100 * 10 == 1000, not strictly greater


def test_heavy_hitters_single_partition_and_all_distinct(spark):
    df = spark.createDataFrame([(f"t{i}",) for i in range(200)], "t string").coalesce(1)
    assert heavy_hitters(df, "t", k=5).collect() == []  # no item exceeds n/5
    df2 = spark.createDataFrame([("only",)] * 7, "t string").coalesce(1)
    assert [(r.t, r.cnt) for r in heavy_hitters(df2, "t", k=3).collect()] == [("only", 7)]


def test_mg_partition_mergeable_guarantee():
    # Feed one logical partition as several batches; every item with
    # true count > n_p/(k+1) must survive in the summary (that is the
    # bound the distributed averaging argument relies on).
    k = 8
    part = ["a"] * 50 + ["b"] * 30 + [f"z{i}" for i in range(120)] + ["a"] * 10
    batches = [
        pd.DataFrame({"t": part[i : i + 37]}) for i in range(0, len(part), 37)
    ]
    (out,) = list(_mg_partition(k)(iter(batches)))
    survivors = set(out["t"].dropna())
    n_p = len(part)
    sentinel = out[out["t"].isna()]["wt"].iloc[0]
    assert sentinel == n_p
    true_cnt: dict[str, int] = {}
    for t in part:
        true_cnt[t] = true_cnt.get(t, 0) + 1
    for t, c in true_cnt.items():
        if c > n_p / (k + 1):
            assert t in survivors, f"{t} (count {c}) dropped by the summary"
    assert len(survivors) <= k


def test_bigram_logprob_hand_computed(spark):
    # corpus: d0 = "a b a b", d1 = "a b c", d2 = "x" (dropped: <2 tokens)
    # bigrams: d0 -> (a b), (b a), (a b); d1 -> (a b), (b c)
    # counts: (a,b)=3 ctx(a)=3 -> P=1; (b,a)=1 ctx(b)=2 -> P=.5; (b,c)=1 ctx(b)=2 -> P=.5
    from fegis_spark.operators.text_analysis import bigram_logprob

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b c"), (2, "x")], "doc_id long, text string"
    )
    from decimal import ROUND_HALF_UP, Decimal

    def r6(x: float) -> float:  # Spark round(): HALF_UP, not banker's
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))

    got = {r.doc: (r.sum_neg_logprob, r.n_bigrams) for r in bigram_logprob(docs).collect()}
    ln2 = r6(-math.log(0.5))  # per-bigram nl after the DECIMAL(38,6) cast
    # d0: sum(-ln 1, -ln .5, -ln 1); d1: sum(-ln 1, -ln .5)
    # (decimal-exact SUM + count since r7 — the mean's /count could land
    # on a .5e-6 rounding midpoint, the dsir_importance incident class)
    assert got[0] == (ln2, 3)
    assert got[1] == (ln2, 2)
    assert 2 not in got


def test_cms_overestimates_and_is_exact_when_wide(spark):
    """CMS invariants on constructed data: (1) est >= true count for
    every queried item (one-sided error); (2) with w far above the
    vocabulary size and no collisions the estimate is EXACT for items
    whose 4 buckets are collision-free — checked by asserting the est
    of every item equals truth OR overestimates, and at least one item
    is exact (vocab 26 << w 512 makes all-collisions vanishingly
    unlikely and deterministic given md5)."""
    import string

    from fegis_spark.operators.sketches import cms_build, cms_estimate

    rows = [(c,) for i, c in enumerate(string.ascii_lowercase) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "t string")
    truth = {c: i + 1 for i, c in enumerate(string.ascii_lowercase)}
    cms = cms_build(df, "t")
    est = {
        r["t"]: r["est_n"]
        for r in cms_estimate(cms, df.select("t").distinct(), "t").collect()
    }
    assert set(est) == set(truth)
    assert all(est[t] >= truth[t] for t in truth)
    assert any(est[t] == truth[t] for t in truth)
    # total mass conservation per hash row: every row of the sketch
    # sums to the stream length
    per_row = {
        r["r"]: r["s"]
        for r in cms.groupBy("r").agg(F.sum("cnt").alias("s")).collect()
    }
    assert all(v == len(rows) for v in per_row.values())
