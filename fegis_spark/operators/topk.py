"""Window-free global top-k with ranks.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY plans a
single-partition WindowExec — the whole input funnels through one task,
which is the canonical scale-killer for "rank the corpus" shapes. When
only the top k ranked rows are needed, the same result is available
with nothing single-partition at corpus size:

    TakeOrderedAndProject (per-partition top-k heaps, no global sort)
      -> collect the k survivors into ONE bounded array
      -> sort_array -> posexplode; rank = position + 1.

Only k rows ever leave the TakeOrdered, so the array/posexplode stage
is O(k) regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ranked_topk(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int,
    rank_name: str = "rank",
) -> DataFrame:
    """Top-k rows by (value desc, id asc) with 1-based ranks — exactly
    ``row_number() OVER (ORDER BY value DESC, id)`` filtered to rank<=k,
    but with no WindowExec anywhere in the plan.

    ``value_col``/``id_col`` must be non-null; ``id_col`` is the
    tiebreak and must be unique. Output columns: (id_col, value_col,
    rank_name).
    """
    s = F.struct((-F.col(value_col)).alias("neg"), F.col(id_col).alias("id"))
    top = df.select(s.alias("s")).orderBy(F.col("s.neg"), F.col("s.id")).limit(k)
    arr = top.agg(F.sort_array(F.collect_list("s")).alias("a"))
    return arr.select(F.posexplode("a").alias("pos", "e")).select(
        F.col("e.id").alias(id_col),
        (-F.col("e.neg")).alias(value_col),
        (F.col("pos") + 1).cast("bigint").alias(rank_name),
    )
