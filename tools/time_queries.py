"""Time named catalog queries with the bench methodology (page-cache
priming, noop sink, warmup + min-of-3) at $SPARK_GRAFT_SF_DIR (default
sf0.1). Prints one JSON line {name: sec}.

Usage: python tools/time_queries.py <query> [<query>...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import force, prime_page_cache, sentinel_sec  # noqa: E402
from fegis_spark.catalog import catalog  # noqa: E402
from fegis_spark.session import configure_for_oracle, get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = configure_for_oracle(get_spark("fegis_spark_time"))
    cat = catalog()
    prime_page_cache(sf_dir)
    out: dict[str, float] = {"__sentinel_pre": sentinel_sec(spark)}
    for name in names:
        spark.sparkContext.setJobDescription(name)
        force(cat[name].builder(spark, sf_dir))
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            force(cat[name].builder(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        out[name] = round(min(samples), 4)
        spark.sparkContext.setJobDescription(None)
    out["__sentinel_post"] = sentinel_sec(spark)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
