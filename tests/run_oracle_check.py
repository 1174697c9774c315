"""Iterate all registry queries against the DuckDB oracle. Usage:

    python tests/run_oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from uni_mannheim_masters_thesis_spark.plans.registry import REGISTRY
from uni_mannheim_masters_thesis_spark.session import get_session
from oracle_harness import duckdb_connection, run_query


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_session("oracle_check")
    con = duckdb_connection(sf_dir)
    failures = 0
    for name, spec in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf, odf, problems = run_query(spark, con, name, spec, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: EXCEPTION {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        mode = "oracle" if spec.sql else "rows-only"
        if problems:
            print(f"FAIL {name} [{mode}] ({dt:.1f}s): {problems}")
            failures += 1
        else:
            print(f"ok   {name} [{mode}] ({dt:.1f}s, {len(sdf)} rows)")
    print(f"\n{len(REGISTRY) - failures}/{len(REGISTRY)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
