"""Dump .explain('formatted') for named catalog queries to files.

Usage: python tools/dump_plans.py <outdir> <suffix> <query> [<query>...]
Writes <outdir>/<query>_<suffix>.txt for each. sf dir defaults to
/root/testdata/sf0.001 (plan shape only; override SPARK_GRAFT_SF_DIR).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fegis_spark.catalog import catalog  # noqa: E402
from fegis_spark.session import configure_for_oracle, get_spark  # noqa: E402


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(outdir, exist_ok=True)
    spark = configure_for_oracle(get_spark("fegis_spark_plandump"))
    cat = catalog()
    for name in names:
        df = cat[name].builder(spark, sf_dir)
        p = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(p)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
