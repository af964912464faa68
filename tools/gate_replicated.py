"""Beyond-bench-scale correctness gate (r12): replicate the sf0.1
documents/embeddings tables Nx, flatten to single splittable parquet
files, symlink the other tables, and run the FULL DuckDB-oracle gate
over the mixed corpus — the large-scale complement of the sf0.001
degenerate-corpus sweeps (catches scale-dependent midpoint/tie/
overflow classes the bench scale masks; evidence/gate4x_r12.json).

Usage: python tools/gate_replicated.py [N] [query ...]   (default N=4)

Implementation notes (each learned the hard way, CLAUDE.md r12):
* DuckDB views in check_correctness need FILE paths, so the replicate
  part-dirs are flattened via DuckDB COPY with ROW_GROUP_SIZE 700;
* a few-MB single file is ONE Spark partition at the 128 MB
  maxPartitionBytes default — every map stage pins to one core and
  heavy queries run 30+ min; the gate subprocess therefore runs with
  SPARK_GRAFT_MAX_PARTITION_BYTES=262144.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def build(out_dir: str, factor: int) -> None:
    import duckdb

    from fegis_spark.model import TABLES
    from fegis_spark.session import configure_for_oracle, get_spark
    from scale_probe import SF_DIR, replicate

    spark = configure_for_oracle(get_spark("gate_replicated_build"))
    with tempfile.TemporaryDirectory(prefix="gate_rep_build_") as tmp:
        replicate(spark, tmp, factor)
        os.makedirs(out_dir, exist_ok=True)
        con = duckdb.connect()
        for t in ("documents", "embeddings"):
            con.sql(
                f"COPY (SELECT * FROM '{tmp}/{t}.parquet/*.parquet') "
                f"TO '{out_dir}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 700)"
            )
        for t in TABLES:
            if t in ("documents", "embeddings"):
                continue
            dst = f"{out_dir}/{t}.parquet"
            if not os.path.exists(dst):
                os.symlink(f"{SF_DIR}/{t}.parquet", dst)
    spark.stop()


def main() -> int:
    args = sys.argv[1:]
    factor = int(args[0]) if args and args[0].isdigit() else 4
    names = args[1:] if args and args[0].isdigit() else args
    out_dir = f"/tmp/gate_rep_x{factor}"
    shutil.rmtree(out_dir, ignore_errors=True)
    build(out_dir, factor)
    env = dict(os.environ, SPARK_GRAFT_MAX_PARTITION_BYTES="262144")
    cmd = [
        sys.executable,
        str(Path(__file__).parent / "check_correctness.py"),
        "--sf",
        out_dir,
        *names,
    ]
    print(f"gate_replicated: corpus x{factor} at {out_dir}; running gate")
    return subprocess.call(cmd, env=env)


if __name__ == "__main__":
    sys.exit(main())
