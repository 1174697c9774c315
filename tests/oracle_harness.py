"""Local replica of the driver's DuckDB-oracle differential check.

Runs each registry query through Spark AND its oracle SQL through DuckDB
on the same parquet tables, then compares row count, column names, and
order-insensitive values EXACTLY (floats included — the engine rounds
deterministically on both sides, so any mismatch is a real parity bug,
not noise).
"""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            # Spark-written table (e.g. the scaled sf1 dataset): a
            # DIRECTORY of part files — DuckDB needs the glob form
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS FROM read_parquet('{path}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
    # sort on RAW values first — this replicates the driver's
    # canonicalizer, which sorts before any stringification and raises
    # `unhashable type` on list/dict cells (round-2 regression: array
    # outputs passed locally because we stringified first, then broke
    # under the driver). Keeping the order identical keeps this harness
    # an honest local replica.
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df


def container_cols(pdf: pd.DataFrame) -> list[str]:
    """Columns holding list/dict/ndarray cells — these crash the
    driver's canonicalizer (`unhashable type: 'list'`); every registry
    query must serialize them to strings before returning."""
    out = []
    for c in pdf.columns:
        if pdf[c].dtype == object and any(
            isinstance(v, (list, dict, set, tuple)) or hasattr(v, "tolist")
            for v in pdf[c].head(20)
        ):
            out.append(c)
    return out


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    cc = container_cols(spark_pdf)
    if cc:
        problems.append(
            f"container-typed output columns (driver canonicalizer breaks): {cc}"
        )
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols = sorted(c.lower() for c in spark_pdf.columns)
    o_cols = sorted(c.lower() for c in oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns: spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    s = _canon(spark_pdf)
    o = _canon(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        n_bad = 0
        first = None
        for i, (a, b) in enumerate(zip(sv, ov)):
            if isinstance(a, float) and isinstance(b, float):
                # repr-strict: the driver hashes value REPRESENTATIONS,
                # so -0.0 != 0.0 there even though == says equal (this
                # exact blindness let user_value_trend's sign-of-zero
                # bug pass locally while failing the driver in r4).
                # repr also handles nan/nan equality.
                equal = repr(float(a)) == repr(float(b))
            else:
                equal = (a is None and b is None) or a == b
            if not equal:
                n_bad += 1
                if first is None:
                    first = (i, a, b)
        if n_bad:
            problems.append(f"col {c}: {n_bad} mismatched values, first={first}")
    return problems


def run_query(spark, con, name, spec, sf_dir: str):
    # clean SQL-execution thread-locals (see streaming.runtime.drain):
    # a stale execution.id from an engine thread breaks nested
    # Dataset.rdd materializations with NumberFormatException
    sc = spark.sparkContext
    sc.setLocalProperty("spark.sql.execution.id", None)
    sc.setLocalProperty("spark.sql.execution.root.id", None)
    sdf = spec.fn(spark, sf_dir).toPandas()
    if spec.sql is None:
        problems = ["(rows-only)"] if len(sdf) == 0 else []
        cc = container_cols(sdf)
        if cc:
            problems.append(f"container-typed output columns: {cc}")
        # ok_* columns are hard in-row invariants a rows-only query
        # stamps on itself (SURVEY §5.2-3); any False/missing fails it
        for c in [c for c in sdf.columns if c.startswith("ok_")]:
            col = sdf[c]
            if col.isna().any() or not col.astype(bool).all():
                bad = sdf.loc[~col.fillna(False).astype(bool)].head(2)
                problems.append(
                    f"invariant {c} violated on {int((~col.fillna(False).astype(bool)).sum())} rows: "
                    f"{bad.to_dict(orient='records')[:2]}"
                )
        return sdf, None, problems
    odf = con.sql(spec.sql).df()
    return sdf, odf, compare(sdf, odf)
