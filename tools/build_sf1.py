"""Build an sf1-equivalent dataset (factor x sf0.1, default 10) under
``<repo>/.sf1/`` for the full-registry scale run (r6 verdict task 4).

Differences from tools/scale_check.build_scaled (which feeds the
Spark-only 10x timing rows): every table is written through
``load_table`` so timestamp columns land as TIMESTAMP(MICROS) —
readable identically by Spark AND the DuckDB oracle. The driver's raw
testdata stores TIMESTAMP(NANOS), which Spark only reads via the
nanosAsLong shim; a scaled copy written as raw BIGINT nanos would break
every timestamp-typed oracle query, so the copy must be engine-neutral.

Fact tables duplicate ``factor`` times with the primary id shifted per
copy; dimension tables copy unchanged — every fact row still joins
exactly one dimension row (no join fan-out), and text/embedding
payloads repeat, which is exactly the duplicate load the dedup /
curation operators must absorb at scale.

Usage:
    python tools/build_sf1.py [sf_dir] [factor] [out_dir]
"""

from __future__ import annotations

import os
import shutil
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from uni_mannheim_masters_thesis_spark.session import get_session  # noqa: E402
from uni_mannheim_masters_thesis_spark.sources.testdata import load_table  # noqa: E402

from scale_check import _DIMS, _FACT_IDS  # noqa: E402


def build_sf1(spark, sf_dir: str, out_dir: str, factor: int = 10) -> None:
    if os.path.isdir(out_dir):
        # a table dir merely existing is not enough — an interrupted
        # Spark write leaves a present-but-partial directory; require
        # the per-table _SUCCESS marker before reusing the build
        if all(
            os.path.isfile(os.path.join(out_dir, f"{t}.parquet", "_SUCCESS"))
            for t in list(_FACT_IDS) + list(_DIMS)
        ):
            return  # complete build already present
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    for name in _DIMS:
        load_table(spark, sf_dir, name).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    for name, id_col in _FACT_IDS.items():
        base = load_table(spark, sf_dir, name)
        offset = (base.agg(F.max(id_col)).first()[0] or 0) + 1
        out = base
        for i in range(1, factor):
            out = out.unionByName(
                base.withColumn(id_col, F.col(id_col) + F.lit(int(i * offset)))
            )
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out_dir = sys.argv[3] if len(sys.argv) > 3 else os.path.join(_REPO, ".sf1")
    spark = get_session("build_sf1")
    build_sf1(spark, sf_dir, out_dir, factor)
    print(f"built {out_dir} = {factor}x {sf_dir}")


if __name__ == "__main__":
    main()
