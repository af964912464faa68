"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``fegis_spark`` (see fegis_spark/catalog.py
for the registry; every entry cites the SURVEY.md §2 operator ids it
covers).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from fegis_spark import catalog as _catalog  # noqa: E402
from fegis_spark.session import configure_for_oracle  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: latest memory per
    session (the argmax the reference runs on every ingest,
    reference fegis/storage.py:113-143), over the events table."""
    configure_for_oracle(spark)
    return _catalog.queries()["latest_event_per_user"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_for_oracle(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in _catalog.queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted entries get a
    rows-only check)."""
    return _catalog.oracle_sql()
