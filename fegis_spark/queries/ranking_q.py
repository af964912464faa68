"""Pairwise-preference strength ranking ([EXT]: RLHF/eval data prep).

Preference datasets (RLHF reward modeling, eval leaderboards,
response-source curation) aggregate pairwise win/loss outcomes into
per-item strengths. The canonical model is Bradley-Terry:
P(i beats j) = p_i / (p_i + p_j), fit by the Zermelo/MM iteration

    p_i  <-  w_i / SUM_j games_ij / (p_i + p_j)       (then normalize)

(Hunter 2004, "MM algorithms for generalized Bradley-Terry models").
Here the duels come from the events table: consecutive events of the
same user form a duel decided by the higher `value` (ties and
self-pairs skipped) — the same per-user (ts, event_id) lag window the
lineage/Markov family uses, so the pair extraction is already a
value-checked shape.

Scale: ONE corpus window pass extracts duels; everything after the
(winner, loser) count agg is |event_types|^2-bounded, and the fixed
MM_ITERS rounds run over that constant-size table — iteration cost is
independent of corpus size (same posture as copurchase_pagerank).

Determinism (cross-engine): each round's per-i denominator and the
normalizer are sums over at most |event_types| doubles — summed as
SEQUENTIAL FOLDS over a key-ordered list (Spark aggregate() over
sort_array(collect_list(...)), DuckDB list_aggregate over
list(... ORDER BY ...) — the proven _cos_pair fold convention), so
the addition order is pinned and bit-identical. Decimal transit is
NOT usable here: DuckDB's double→DECIMAL(38,18) cast goes through a
scaled double and is INEXACT for magnitudes beyond ~1e3
(1922.5 → 1922.4999999999998689…), while Spark's BigDecimal
conversion expands the binary value exactly — found by this query's
first gate run. The division and the games/(p_i+p_j) terms are
single IEEE ops over identical operands. Scores ship UNROUNDED.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fegis_spark.catalog import register
from fegis_spark.model import load_table

#: fixed MM rounds — enough for a stable ranking on a 5-type duel
#: graph; a FIXED count (not a convergence test) keeps both engines'
#: arithmetic step-identical
MM_ITERS = 8

_DUELS_CTE = """duels AS (
      SELECT CASE WHEN value > pv THEN event_type ELSE pt END AS winner,
             CASE WHEN value > pv THEN pt ELSE event_type END AS loser
      FROM (
        SELECT event_type, value,
               lag(event_type) OVER (
                 PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
               ) AS pt,
               lag(value) OVER (
                 PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
               ) AS pv
        FROM events
      )
      WHERE pt IS NOT NULL AND pt <> event_type AND value <> pv
    ), wins AS (
      SELECT winner, loser, COUNT(*) AS n FROM duels GROUP BY winner, loser
    ), games AS (
      SELECT i, j, CAST(SUM(n) AS BIGINT) AS g FROM (
        SELECT winner AS i, loser AS j, n FROM wins
        UNION ALL
        SELECT loser AS i, winner AS j, n FROM wins
      ) GROUP BY i, j
    ), teams AS (
      SELECT winner AS i, CAST(SUM(n) AS BIGINT) AS w
      FROM wins GROUP BY winner
    )"""


def _bt_oracle() -> str:
    """Unrolled MM rounds as chained materialized CTEs (the MMR/
    pagerank oracle pattern — DuckDB inlines plain CTEs exponentially)."""
    k = "(SELECT COUNT(*) FROM teams)"
    steps = [
        f"r0 AS MATERIALIZED (SELECT i, 1.0 / {k} AS p FROM teams)"
    ]
    for t in range(1, MM_ITERS + 1):
        prev = f"r{t - 1}"
        steps.append(f"""d{t} AS MATERIALIZED (
      SELECT i, list_aggregate(list(t ORDER BY j), 'sum') AS den FROM (
        SELECT g.i, g.j, g.g / (pi.p + pj.p) AS t
        FROM games g
        JOIN {prev} pi ON pi.i = g.i
        JOIN {prev} pj ON pj.i = g.j
      ) GROUP BY i
    ), u{t} AS MATERIALIZED (
      SELECT t.i, t.w / d.den AS praw
      FROM teams t JOIN d{t} d ON d.i = t.i
    ), r{t} AS MATERIALIZED (
      SELECT i, praw / (
        SELECT list_aggregate(list(praw ORDER BY i), 'sum') FROM u{t}
      ) AS p FROM u{t}
    )""")
    return f"""
    WITH {_DUELS_CTE},
    {", ".join(steps)}
    SELECT t.i AS event_type, t.w AS wins,
           CAST(SUM(g.g) AS BIGINT) AS games, r.p AS bt_score
    FROM teams t
    JOIN r{MM_ITERS} r ON r.i = t.i
    JOIN games g ON g.i = t.i
    GROUP BY t.i, t.w, r.p
    """


@register(
    "preference_bt_ranking",
    oracle=_bt_oracle(),
    covers=("[EXT]-transitions", "§2.4-agg"),
)
def preference_bt_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] Bradley-Terry strength ranking over pairwise duels (module
    doc): per event_type its win count, game count, and the normalized
    BT strength after MM_ITERS Zermelo/MM rounds. One corpus window
    pass; the iteration runs on the |types|^2-bounded games table."""
    from pyspark import StorageLevel

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(  # grpwin-ok: user_id cardinality scales with input
        F.col("ts").cast("timestamp"), F.col("event_id")
    )
    seq = e.select(
        "event_type",
        "value",
        F.lag("event_type").over(w).alias("pt"),
        F.lag("value").over(w).alias("pv"),
    ).where(
        F.col("pt").isNotNull()
        & (F.col("pt") != F.col("event_type"))
        & (F.col("value") != F.col("pv"))
    )
    duels = seq.select(
        F.when(F.col("value") > F.col("pv"), F.col("event_type"))
        .otherwise(F.col("pt"))
        .alias("winner"),
        F.when(F.col("value") > F.col("pv"), F.col("pt"))
        .otherwise(F.col("event_type"))
        .alias("loser"),
    )
    # |types|^2-bounded; persisted — it feeds games, teams, AND the
    # per-round joins, each of which would otherwise re-run the corpus
    # window
    wins = (
        duels.groupBy("winner", "loser")
        .agg(F.count(F.lit(1)).alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    games = (
        wins.select(F.col("winner").alias("i"), F.col("loser").alias("j"), "n")
        .unionAll(
            wins.select(F.col("loser").alias("i"), F.col("winner").alias("j"), "n")
        )
        .groupBy("i", "j")
        .agg(F.sum("n").cast("bigint").alias("g"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    teams = wins.groupBy(F.col("winner").alias("i")).agg(
        F.sum("n").cast("bigint").alias("w")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    k = teams.count()  # bounded driver round-trip: |event_types|
    p = teams.select("i", (F.lit(1.0) / F.lit(float(k))).alias("p"))
    for _ in range(MM_ITERS):
        # materialize the |types|-row strength table through a bounded
        # driver round-trip each round: the lazy chain references p
        # TWICE per round (pi and pj), so an unmaterialized loop
        # doubles the plan per iteration — 2^MM_ITERS analysis blowup
        # (the train_bpe StackOverflow class, driver-side flavor).
        # py4j re-enters doubles bit-exactly (shortest-repr +
        # correctly-rounded parse — the bm25/classifier precedent), so
        # the oracle is unaffected.
        p = spark.createDataFrame(
            [(r["i"], float(r["p"])) for r in p.collect()], "i string, p double"
        )
        pi = p.select(F.col("i"), F.col("p").alias("p_i"))
        pj = p.select(F.col("i").alias("j"), F.col("p").alias("p_j"))
        den = (
            games.join(F.broadcast(pi), "i")  # bcast-ok: one row per event_type
            .join(F.broadcast(pj), "j")  # bcast-ok: one row per event_type
            .select(
                "i", "j", (F.col("g") / (F.col("p_i") + F.col("p_j"))).alias("t")
            )
            .groupBy("i")
            # j-ordered sequential fold — pinned addition order (module doc)
            .agg(
                F.expr(
                    "aggregate(transform(sort_array(collect_list(struct(j, t))),"
                    " s -> s.t), 0.0D, (acc, x) -> acc + x)"
                ).alias("den")
            )
        )
        praw = teams.join(F.broadcast(den), "i").select(  # bcast-ok: one row per event_type
            "i", (F.col("w") / F.col("den")).alias("praw")
        )
        s = praw.agg(
            # i-ordered sequential fold — pinned addition order
            F.expr(
                "aggregate(transform(sort_array(collect_list(struct(i, praw))),"
                " s -> s.praw), 0.0D, (acc, x) -> acc + x)"
            ).alias("s")
        )
        p = praw.crossJoin(F.broadcast(s)).select(  # bcast-ok: 1-row agg
            "i", (F.col("praw") / F.col("s")).alias("p")
        )
    total_games = games.groupBy("i").agg(F.sum("g").cast("bigint").alias("games"))
    return (
        teams.join(F.broadcast(p), "i")  # bcast-ok: one row per event_type
        .join(F.broadcast(total_games), "i")  # bcast-ok: one row per event_type
        .select(
            F.col("i").alias("event_type"),
            F.col("w").alias("wins"),
            "games",
            F.col("p").alias("bt_score"),
        )
    )


#: interleave-manifest budget: total positions to allocate
MIX_BUDGET = 10_000
#: mixture temperature (alpha=0.5 — sqrt weights, the multilingual
#: rebalancing standard; sqrt is IEEE-exact cross-engine)
MIX_ALPHA_SQRT = True


def _mix_oracle() -> str:
    n = MIX_BUDGET
    return f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_orig FROM documents GROUP BY source
    ), sq AS (
      SELECT source, n_orig, sqrt(CAST(n_orig AS DOUBLE)) AS s FROM counts
    ), tot AS (
      SELECT list_aggregate(list(s ORDER BY source), 'sum') AS t FROM sq
    ), alloc AS (
      SELECT source, n_orig,
             s / t AS w,
             CAST(floor({n} * (s / t)) AS BIGINT) AS base,
             {n} * (s / t) - floor({n} * (s / t)) AS frac
      FROM sq CROSS JOIN tot
    ), ranked AS (
      SELECT source, n_orig, w, base, frac,
             row_number() OVER (ORDER BY frac DESC, source) AS rk,
             (SELECT {n} - CAST(SUM(base) AS BIGINT) FROM alloc) AS leftover
      FROM alloc
    )
    SELECT source, n_orig, w,
           CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
             AS quota
    FROM ranked
    """


@register(
    "mixture_quota_plan",
    oracle=_mix_oracle(),
    covers=("§2.4-agg", "[EXT]-temperature"),
)
def mixture_quota_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] exact mixture-quota allocation for an interleaved training
    manifest: alpha=0.5-tempered weights (w_s ∝ sqrt(n_s) — the same
    rebalancing law temperature_sample applies as a KEEP RATE) turned
    into INTEGER per-source quotas summing exactly to MIX_BUDGET via
    largest-remainder apportionment (floor(N·w) base + leftovers to
    the largest fractional parts, source-name tiebreak). This is the
    batch-construction side of the mixture story: a dataloader
    manifest needs exact counts, not Bernoulli rates.

    Scale: one count agg over the corpus; everything after is
    |sources|-bounded. Determinism: sqrt and the divisions are
    IEEE-correctly-rounded over identical operands; the weight
    normalizer is a source-ordered sequential fold (the _cos_pair
    convention — NOT decimal transit, see module doc); quotas are
    exact integers; w ships unrounded."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_orig"))
    sq = counts.select(
        "source", "n_orig", F.sqrt(F.col("n_orig").cast("double")).alias("s")
    )
    tot = sq.agg(
        F.expr(
            "aggregate(transform(sort_array(collect_list(struct(source, s))),"
            " x -> x.s), 0.0D, (acc, v) -> acc + v)"
        ).alias("t")
    )
    n = float(MIX_BUDGET)
    alloc = (
        sq.crossJoin(F.broadcast(tot))  # bcast-ok: 1-row agg
        .select(
            "source",
            "n_orig",
            (F.col("s") / F.col("t")).alias("w"),
            F.floor(F.lit(n) * (F.col("s") / F.col("t")))
            .cast("bigint")
            .alias("base"),
            (
                F.lit(n) * (F.col("s") / F.col("t"))
                - F.floor(F.lit(n) * (F.col("s") / F.col("t")))
            ).alias("frac"),
        )
    )
    from pyspark import StorageLevel

    # |sources|-bounded; feeds the leftover agg AND the ranked output
    alloc = alloc.persist(StorageLevel.MEMORY_AND_DISK)
    leftover = alloc.agg(
        (F.lit(MIX_BUDGET) - F.sum("base")).cast("bigint").alias("leftover")
    )
    wrk = Window.orderBy(F.desc("frac"), F.col("source"))  # window-ok: one row per source (bounded enum)
    return (
        alloc.withColumn("rk", F.row_number().over(wrk))
        .crossJoin(F.broadcast(leftover))  # bcast-ok: 1-row agg
        .select(
            "source",
            "n_orig",
            "w",
            (F.col("base") + (F.col("rk") <= F.col("leftover")).cast("bigint"))
            .cast("bigint")
            .alias("quota"),
        )
    )


# ---------------------------------------------------------------------------
# Token-budget water-filling across sources ([EXT]-temperature family)

#: budget as a ratio of the total corpus weight, exact integer math:
#: B = (total_w * WF_BUDGET_NUM) DIV WF_BUDGET_DEN — 1.6x the corpus,
#: so single-epoch (E=1) sources cap out while E>=2 sources take water
WF_BUDGET_NUM, WF_BUDGET_DEN = 8, 5


def _waterfill_oracle() -> str:
    return f"""
    WITH src AS MATERIALIZED (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS w
      FROM documents GROUP BY source
    ), caps AS MATERIALIZED (
      SELECT source, w,
             CAST(1 + (row_number() OVER (ORDER BY source) % 3) AS BIGINT) AS max_epochs,
             CAST((1 + (row_number() OVER (ORDER BY source) % 3)) * w AS BIGINT) AS cap
      FROM src
    ), tot AS (
      SELECT CAST((SUM(w) * {WF_BUDGET_NUM}) // {WF_BUDGET_DEN} AS BIGINT) AS budget
      FROM caps
    ), lam AS (
      SELECT source, max_epochs,
             (budget - COALESCE(SUM(cap) OVER (
                ORDER BY max_epochs, source
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::DOUBLE
             / (SUM(w) OVER (
                ORDER BY max_epochs, source
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))::DOUBLE
             AS lam_k
      FROM caps, tot
    ), lamstar AS (
      SELECT lam_k AS lam FROM lam
      WHERE lam_k <= max_epochs::DOUBLE
      ORDER BY max_epochs, source LIMIT 1
    )
    SELECT c.source, c.w, c.max_epochs,
           least(c.cap::DOUBLE, COALESCE(ls.lam, 1e18) * c.w::DOUBLE) AS alloc,
           COALESCE(ls.lam, 1e18) * c.w::DOUBLE >= c.cap::DOUBLE AS capped
    FROM caps c LEFT JOIN lamstar ls ON TRUE
    """


@register(
    "budget_waterfill",
    oracle=_waterfill_oracle(),
    covers=("§2.4-agg", "[EXT]-temperature"),
)
def budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """[EXT] token-budget WATER-FILLING across sources (the
    data-constrained allocation move: every source may be repeated at
    most max_epochs times, and a global token budget B is spread
    proportionally to source size until each source either hits its
    repeat cap or the shared water level λ):

        alloc_s = min(cap_s, λ·w_s)  with  Σ alloc_s = B

    λ has a closed breakpoint form: sort sources by cap ratio
    (max_epochs, here deterministically 1+rank%3 so all three cap
    classes appear at every sf), take integer prefix sums of caps and
    suffix sums of weights, and λ is the first candidate
    (B − Σ_{{capped}} cap) / Σ_{{uncapped}} w that lands at or below its
    row's ratio — one |sources|-bounded window pass, no iteration.
    This is the planning step a 100 TB pipeline runs before sampling:
    one groupBy(source) agg shuffle over the corpus; everything after
    is |sources|-bounded.

    Determinism: all sums are exact BIGINTs; λ is ONE double division
    of identical integer operands, and per-row alloc is one multiply +
    one min on identical doubles — IEEE-identical cross-engine, so
    outputs ship UNROUNDED (CLAUDE.md round rule). The budget ratio is
    exact integer arithmetic (w*8 DIV 5), never a float multiply."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(F.sum("n_chars").cast("bigint").alias("w"))
    wsrc = Window.orderBy("source")  # window-ok: one row per source (bounded enum)
    caps = src.select(
        "source",
        "w",
        (1 + F.row_number().over(wsrc) % 3).cast("bigint").alias("max_epochs"),
    ).withColumn("cap", (F.col("max_epochs") * F.col("w")).cast("bigint"))
    from pyspark import StorageLevel

    # |sources|-bounded; feeds the budget agg, the λ scan and the output
    caps = caps.persist(StorageLevel.MEMORY_AND_DISK)
    tot = caps.agg(
        F.expr(
            f"CAST((sum(w) * {WF_BUDGET_NUM}) DIV {WF_BUDGET_DEN} AS BIGINT)"
        ).alias("budget")
    )
    word = Window.orderBy("max_epochs", "source")  # window-ok: one row per source (bounded enum)
    lam = (
        caps.crossJoin(F.broadcast(tot))  # bcast-ok: 1-row agg
        .withColumn(
            "cap_before",
            F.coalesce(
                F.sum("cap").over(word.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ),
        )
        .withColumn(
            "w_from",
            F.sum("w").over(word.rowsBetween(0, Window.unboundedFollowing)),
        )
        .withColumn(
            "lam_k",
            (F.col("budget") - F.col("cap_before")).cast("double")
            / F.col("w_from").cast("double"),
        )
    )
    lamstar = (
        lam.filter(F.col("lam_k") <= F.col("max_epochs").cast("double"))
        .orderBy("max_epochs", "source")
        .limit(1)
        .select(F.col("lam_k").alias("lam"))
    )
    # LEFT join (not crossJoin): λ* is empty when B exceeds total cap,
    # and the oracle's LEFT JOIN ON TRUE keeps every source row then too
    return caps.join(
        F.broadcast(lamstar), F.lit(True), "left"  # bcast-ok: <=1-row λ* selection
    ).select(
        "source",
        "w",
        "max_epochs",
        F.least(
            F.col("cap").cast("double"),
            F.coalesce(F.col("lam"), F.lit(1e18)) * F.col("w").cast("double"),
        ).alias("alloc"),
        (
            F.coalesce(F.col("lam"), F.lit(1e18)) * F.col("w").cast("double")
            >= F.col("cap").cast("double")
        ).alias("capped"),
    )
