"""Copy-on-write versioned parquet table with a JSON bucket manifest.

The round-7 lakehouse queries (``cdc_merge_upsert``,
``scd2_state_intervals``) compute MERGE/history *semantics* as
DataFrames but never materialize an ACID table. This module is the
missing half: a minimal Delta/Iceberg-shaped table format built from
parts Spark ships with — partitioned parquet snapshots + an atomic
JSON manifest — so MERGE output survives as a versioned, time-travel-
readable, manifest-prunable table.

Layout (everything under one ``table_dir``)::

    manifest_v1.json       # immutable, one per committed version
    manifest_v2.json
    _LATEST                # text version number, flipped via os.replace
    data/v1/__bucket=0/part-*.parquet
    data/v2/__bucket=3/...          # merge rewrote ONLY bucket 3

Design points (each mirrors the public Delta/Iceberg design):

- **Copy-on-write at bucket granularity.** A MERGE rewrites only the
  hash buckets its CDC keys touch; every untouched bucket is carried
  into the new manifest *by reference* to the older snapshot's
  directory. At 100 TB with date+bucket partitioning this is the
  difference between rewriting a table and rewriting a few files.
- **Atomic commits.** A version is born as data files (invisible — no
  manifest references them), then ``manifest_v{N}.json`` via
  write-tmp + ``os.replace``, then ``_LATEST`` the same way. A crash
  at any point leaves the previous version fully readable; orphaned
  data files are garbage, never corruption.
- **Manifest-level data skipping.** The manifest records per-bucket
  row counts and min/max key stats; point-lookup reads route keys to
  their buckets and scan only those directories (the file-skipping
  that makes lakehouse point queries feasible — verified by an
  ``inputFiles()`` plan test).
- **Time travel.** Every manifest is immutable; ``read_table`` takes
  a version number and reconstructs exactly that snapshot.

The table carries no Spark-session state: any session can read any
version from the directory alone.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

N_BUCKETS = 16


def _bucket_expr(key_col: str, n_buckets: int = N_BUCKETS) -> F.Column:
    """Bucket id for a numeric key: identity-mod layout.

    Production tables would hash first (``pmod(conv(md5(...)),n)``) to
    spread adversarial key ranges; identity-mod keeps point-lookup
    routing trivially checkable in tests while exercising the same
    bucket-pruning machinery.
    """
    return F.pmod(F.col(key_col).cast("long"), F.lit(n_buckets)).cast("int")


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"manifest_v{version}.json")


def _atomic_write(path: str, text: str) -> None:
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path), prefix=".tmp_")
    with os.fdopen(fd, "w") as f:
        f.write(text)
    os.replace(tmp, path)


def latest_version(table_dir: str) -> int:
    with open(os.path.join(table_dir, "_LATEST")) as f:
        return int(f.read().strip())


def last_committed_note(table_dir: str) -> dict:
    """The latest commit's metadata note ({} for tables that never set
    one) — the exactly-once watermark readers like the streaming sink
    consult before applying a possibly-replayed batch."""
    if not os.path.exists(os.path.join(table_dir, "_LATEST")):
        return {}
    return _load_manifest(table_dir, latest_version(table_dir)).get(
        "note", {}
    )


def _load_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version)) as f:
        m = json.load(f)
    # manifests written before partition evolution carry no layout
    # field; the layout was the module constant then
    m.setdefault("n_buckets", N_BUCKETS)
    return m


def _bucket_stats(
    df: DataFrame, key_col: str
) -> dict[str, dict[str, int]]:
    """Per-bucket (n_rows, min/max key) — ≤ N_BUCKETS rows collected."""
    rows = (
        df.groupBy("__bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(key_col).alias("lo"),
            F.max(key_col).alias("hi"),
        )
        .collect()
    )
    return {
        str(r["__bucket"]): {
            "n_rows": int(r["n"]),
            "min_key": int(r["lo"]),
            "max_key": int(r["hi"]),
        }
        for r in rows
    }


def _write_snapshot(
    df: DataFrame, table_dir: str, version: int, key_col: str,
    compact: bool = False, n_buckets: int = N_BUCKETS,
) -> dict[str, dict]:
    """Write ``df`` bucket-partitioned under data/v{version}; return the
    manifest bucket entries (path + stats) for the buckets written.
    ``compact`` shuffles rows bucket-aligned first so each bucket lands
    as ONE file (the OPTIMIZE small-file collapse)."""
    with_b = df.withColumn("__bucket", _bucket_expr(key_col, n_buckets))
    if compact:
        with_b = with_b.repartition(n_buckets, "__bucket")
    rel = os.path.join("data", f"v{version}")
    with_b.write.partitionBy("__bucket").mode("overwrite").parquet(
        os.path.join(table_dir, rel)
    )
    stats = _bucket_stats(with_b, key_col)
    return {
        b: {"path": os.path.join(rel, f"__bucket={b}"), **st}
        for b, st in stats.items()
    }


def _commit(
    table_dir: str,
    version: int,
    op: str,
    parent: int | None,
    buckets: dict,
    schema: StructType,
    n_buckets: int = N_BUCKETS,
    note: dict | None = None,
) -> int:
    manifest = {
        "version": version,
        "op": op,
        "parent": parent,
        "schema": schema.json(),
        "n_buckets": n_buckets,
        "n_rows": sum(e["n_rows"] for e in buckets.values()),
        "buckets": buckets,
        # free-form commit metadata (e.g. the streaming sink's batch_id
        # exactly-once watermark) — rides the atomic manifest write, so
        # it is transactional with the data it describes
        "note": note or {},
    }
    _atomic_write(
        _manifest_path(table_dir, version),
        json.dumps(manifest, sort_keys=True),
    )
    # flipping _LATEST is the commit point — the manifest above fully
    # exists before any reader can observe the new version number
    _atomic_write(os.path.join(table_dir, "_LATEST"), str(version))
    return version


def create_table(
    df: DataFrame, table_dir: str, key_col: str,
    note: dict | None = None,
) -> int:
    """Materialize ``df`` (one row per key) as version 1."""
    os.makedirs(table_dir, exist_ok=True)
    buckets = _write_snapshot(df, table_dir, 1, key_col)
    return _commit(
        table_dir, 1, "create", None, buckets, df.schema, N_BUCKETS, note
    )


def merge_table(
    spark: SparkSession,
    table_dir: str,
    cdc: DataFrame,
    key_col: str,
    delete_col: str,
    note: dict | None = None,
) -> int:
    """MERGE a CDC batch (one row per key; ``delete_col`` boolean marks
    tombstones) into the latest version, copy-on-write per bucket.

    WHEN MATCHED AND delete → row leaves the table; WHEN MATCHED →
    UPDATE (CDC row wins); WHEN NOT MATCHED AND NOT delete → INSERT.
    Only buckets containing CDC keys are rewritten; all others carry
    forward by manifest reference.
    """
    parent = latest_version(table_dir)
    manifest = _load_manifest(table_dir, parent)
    schema = StructType.fromJson(json.loads(manifest["schema"]))

    # pin the CDC batch: it feeds three jobs (changed-bucket discovery,
    # the anti-join, the upsert union) and is the small side by design
    n_buckets = manifest["n_buckets"]
    cdcb = cdc.withColumn(
        "__bucket", _bucket_expr(key_col, n_buckets)
    ).localCheckpoint(eager=True)
    # one bounded job (≤ N_BUCKETS rows) serves two purposes: discover
    # the changed buckets, and enforce the one-row-per-key CDC contract
    # the whole table stack (time travel, change feed, quality gate
    # uniqueness) assumes — a duplicate key would anti-join away the
    # base row and then insert BOTH cdc rows, silently corrupting the
    # snapshot. Per-bucket distincts sum to the global distinct because
    # a key maps to exactly one bucket.
    stats = cdcb.groupBy("__bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(key_col).alias("nk"),
    ).collect()
    n_rows = sum(r["n"] for r in stats)
    n_keys = sum(r["nk"] for r in stats)
    if n_rows != n_keys:
        raise ValueError(
            f"merge_table: CDC batch violates the one-row-per-key "
            f"contract ({n_rows} rows, {n_keys} distinct "
            f"{key_col!r}); dedup to last-writer-wins upstream"
        )
    changed = sorted(r["__bucket"] for r in stats)
    base_paths = [
        os.path.join(table_dir, manifest["buckets"][str(b)]["path"])
        for b in changed
        if str(b) in manifest["buckets"]
    ]
    base = (
        spark.read.schema(schema).parquet(*base_paths)
        if base_paths
        else spark.createDataFrame([], schema)
    )
    survivors = base.join(
        cdcb.select(key_col).distinct(), key_col, "left_anti"
    )
    upserts = cdcb.filter(~F.col(delete_col)).drop(delete_col, "__bucket")
    merged = survivors.unionByName(upserts)

    version = parent + 1
    written = _write_snapshot(
        merged, table_dir, version, key_col, n_buckets=n_buckets
    )
    buckets = {
        b: e for b, e in manifest["buckets"].items() if int(b) not in set(changed)
    }
    buckets.update(written)  # a bucket emptied by deletes simply drops out
    return _commit(
        table_dir, version, "merge", parent, buckets, schema, n_buckets,
        note,
    )


def upsert_combine(
    spark: SparkSession,
    table_dir: str,
    delta: DataFrame,
    key_col: str,
    sum_cols: list[str],
) -> int:
    """Incremental-view-maintenance refresh: fold a batch of PARTIAL
    aggregates into the stored aggregate state, per key, rewriting only
    the buckets the delta touches.

    ``delta`` has one row per key with sum-combinable partials
    (counts, decimal sums — any commutative monoid column). The state
    read is bucket-pruned to the delta's bucket set (≤ N_BUCKETS ids,
    a bounded driver list — the same discipline as ``merge_table``'s
    changed-bucket discovery), so a refresh's cost scales with the
    DELTA, not the accumulated table: the incremental-MV contract that
    replaces full recomputes at 100 TB."""
    n_buckets = _load_manifest(table_dir, latest_version(table_dir))[
        "n_buckets"
    ]
    dbuckets = sorted(
        r[0]
        for r in delta.select(
            _bucket_expr(key_col, n_buckets)
        ).distinct().collect()
    )
    state = read_table(spark, table_dir, buckets=dbuckets)
    combined = (
        delta.alias("d")
        .join(state.alias("s"), key_col, "left")
        .select(
            key_col,
            *[
                (F.col(f"d.{c}") + F.coalesce(F.col(f"s.{c}"), F.lit(0)))
                # widen-then-narrow: decimal addition grows precision by
                # one; the stored schema must stay fixed across commits
                .cast(delta.schema[c].dataType)
                .alias(c)
                for c in sum_cols
            ],
        )
        .withColumn("__delete", F.lit(False))
    )
    return merge_table(spark, table_dir, combined, key_col, "__delete")


def add_column(table_dir: str, col_name: str, col_type: str) -> int:
    """ALTER TABLE ADD COLUMN as a METADATA-ONLY commit — the Delta
    schema-evolution shape: no data file is touched or rewritten. The
    new manifest carries every bucket of the parent version by
    reference and a WIDENED schema; ``read_table`` supplies that schema
    to the parquet reader, which null-fills the column for files
    written before the evolution. Subsequent MERGEs may then populate
    the column for the keys they touch. At 100 TB this is the entire
    value proposition: adding a column to a petabyte table costs one
    KB manifest write, not a table rewrite."""
    parent = latest_version(table_dir)
    manifest = _load_manifest(table_dir, parent)
    schema = StructType.fromJson(json.loads(manifest["schema"]))
    if col_name in schema.fieldNames():
        raise ValueError(f"column {col_name!r} already exists")
    widened = schema.add(col_name, col_type, True)
    return _commit(
        table_dir, parent + 1, "add_column", parent,
        manifest["buckets"], widened, manifest["n_buckets"],
    )


def restore_table(table_dir: str, to_version: int) -> int:
    """RESTORE TABLE ... VERSION AS OF: roll the table back to an
    earlier committed state as a NEW commit (metadata-only — the new
    manifest re-references the target version's buckets and schema).
    History is preserved: every intermediate version stays time-travel
    readable, and the rollback itself appears in DESCRIBE HISTORY with
    its parent pointer — the Delta RESTORE contract, not a destructive
    reset."""
    parent = latest_version(table_dir)
    target = _load_manifest(table_dir, to_version)
    return _commit(
        table_dir, parent + 1, "restore", parent,
        target["buckets"],
        StructType.fromJson(json.loads(target["schema"])),
        target["n_buckets"],
    )


def optimize_table(spark: SparkSession, table_dir: str, key_col: str) -> int:
    """OPTIMIZE (compaction): rewrite the latest snapshot fully into one
    new self-contained version — every bucket lands under the new
    version's directory as a single file (``repartition("__bucket")``
    before the partitioned write), and the new manifest references no
    older snapshot. This is the Delta ``OPTIMIZE`` shape: it collapses
    the small files a long MERGE history accretes and cuts the
    reference chain so old versions become vacuum-able. At 100 TB the
    same operation runs per date-partition/bucket subset; rewriting
    everything at once is the degenerate whole-table case."""
    parent = latest_version(table_dir)
    manifest = _load_manifest(table_dir, parent)
    schema = StructType.fromJson(json.loads(manifest["schema"]))
    full = read_table(spark, table_dir, version=parent)
    version = parent + 1
    written = _write_snapshot(
        full, table_dir, version, key_col, compact=True,
        n_buckets=manifest["n_buckets"],
    )
    return _commit(
        table_dir, version, "optimize", parent, written, schema,
        manifest["n_buckets"],
    )


def clone_table(src_dir: str, dst_dir: str) -> int:
    """SHALLOW CLONE: a new table whose v1 manifest references the
    source's CURRENT data files by absolute path — zero data copied,
    O(KB) metadata. Writes to the clone copy-on-write on top (its new
    buckets land under its OWN data/ dir), so the source never sees
    them; the clone's VACUUM walks only the clone's data/ directory,
    so it can never delete source files. This is the Delta SHALLOW
    CLONE contract: instant dev/test/experiment copies of a 100 TB
    table. (As in Delta, vacuuming the SOURCE can invalidate a shallow
    clone — the production pairing is clone + source retention
    policy.)"""
    src_latest = latest_version(src_dir)
    m = _load_manifest(src_dir, src_latest)
    os.makedirs(dst_dir, exist_ok=True)
    buckets = {
        b: {**e, "path": os.path.join(os.path.abspath(src_dir), e["path"])}
        for b, e in m["buckets"].items()
    }
    return _commit(
        dst_dir, 1, "clone", None, buckets,
        StructType.fromJson(json.loads(m["schema"])), m["n_buckets"],
    )


def rebucket_table(
    spark: SparkSession, table_dir: str, key_col: str, n_new: int
) -> int:
    """Partition evolution (the Iceberg bucket-spec change): rewrite
    the latest snapshot under a NEW bucket count as one self-contained
    version. Every version keeps ITS OWN layout in its manifest, so
    time travel to a pre-evolution version routes point lookups with
    the old modulus while new commits (merges, point reads) route with
    the new one — layouts evolve, history stays readable. The rewrite
    cost is one compacted pass (the OPTIMIZE shape); at 100 TB the
    same operation runs per date-partition as the partition's volume
    outgrows its bucket width."""
    parent = latest_version(table_dir)
    manifest = _load_manifest(table_dir, parent)
    schema = StructType.fromJson(json.loads(manifest["schema"]))
    full = read_table(spark, table_dir, version=parent)
    version = parent + 1
    written = _write_snapshot(
        full, table_dir, version, key_col, compact=True, n_buckets=n_new
    )
    return _commit(
        table_dir, version, "rebucket", parent, written, schema, n_new
    )


def vacuum_table(table_dir: str, retain_versions: int = 1) -> dict[str, int]:
    """VACUUM: delete bucket directories referenced by NONE of the
    newest ``retain_versions`` manifests. Manifests themselves stay (KB
    commit-log audit survives), but time travel to a vacuumed version
    fails at read — exactly Delta's retention contract. Driver-side
    O(dirs) filesystem walk; data files are never read."""
    import shutil

    latest = latest_version(table_dir)
    keep_from = max(1, latest - retain_versions + 1)
    referenced = set()
    for v in range(keep_from, latest + 1):
        m = _load_manifest(table_dir, v)
        referenced |= {e["path"] for e in m["buckets"].values()}
    removed = live = 0
    data_dir = os.path.join(table_dir, "data")
    for vdir in sorted(os.listdir(data_dir)):
        vpath = os.path.join(data_dir, vdir)
        if not os.path.isdir(vpath):
            continue
        for bdir in sorted(os.listdir(vpath)):
            if not bdir.startswith("__bucket="):
                continue
            rel = os.path.join("data", vdir, bdir)
            if rel in referenced:
                live += 1
            else:
                shutil.rmtree(os.path.join(table_dir, rel))
                removed += 1
    return {"removed_dirs": removed, "live_dirs": live,
            "retained_from": keep_from}


def read_table(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    point_keys: list[int] | None = None,
    buckets: list[int] | None = None,
) -> DataFrame:
    """Read a snapshot (latest by default; any version for time
    travel). ``point_keys`` prunes the scan to the buckets that could
    hold those keys — manifest-level data skipping; callers still apply
    the exact key predicate on the survivors. ``buckets`` prunes to an
    explicit bucket-id set (the incremental-refresh read path: a delta
    batch touches ≤ N_BUCKETS buckets, so state reads scan only
    those)."""
    if version is None:
        version = latest_version(table_dir)
    manifest = _load_manifest(table_dir, version)
    schema = StructType.fromJson(json.loads(manifest["schema"]))
    buckets_man = manifest["buckets"]
    if buckets is not None:
        want = set(buckets)
        buckets_man = {
            b: e for b, e in buckets_man.items() if int(b) in want
        }
    buckets = buckets_man
    if point_keys is not None:
        by_bucket: dict[int, list[int]] = {}
        for k in point_keys:
            by_bucket.setdefault(k % manifest["n_buckets"], []).append(k)
        buckets = {
            b: e
            for b, e in buckets.items()
            if int(b) in by_bucket
            and any(
                e["min_key"] <= k <= e["max_key"] for k in by_bucket[int(b)]
            )
        }
    paths = [os.path.join(table_dir, e["path"]) for e in buckets.values()]
    if not paths:
        return spark.createDataFrame([], schema)
    gone = [p for p in paths if not os.path.isdir(p)]
    if gone:
        raise FileNotFoundError(
            f"version {version} of {table_dir} references vacuumed data "
            f"({len(gone)} bucket dirs gone) — time travel past the "
            f"retention window"
        )
    return spark.read.schema(schema).parquet(*paths)


Z_BITS = 16  # per-dimension quantization for the Morton code
Z_FILES = 16  # clustered files per table (a per-partition knob at scale)


def _morton_expr(qx: F.Column, qy: F.Column) -> F.Column:
    """Interleave the low Z_BITS bits of two quantized ranks into one
    Morton code — locality in EITHER dimension maps to locality on the
    code, which is what makes one sort order skippable on both
    columns."""
    code = F.lit(0).cast("long")
    for b in range(Z_BITS):
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(qx, b).bitwiseAND(F.lit(1)), 2 * b + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(qy, b).bitwiseAND(F.lit(1)), 2 * b)
        )
    return code


def create_zordered_table(
    df: DataFrame,
    table_dir: str,
    zcols: tuple[str, str],
    n_files: int = Z_FILES,
) -> int:
    """Materialize ``df`` Z-ORDER-clustered on two numeric columns with
    file-level zone maps — the OPTIMIZE ZORDER BY layout:

    1. quantize each clustering column to a Z_BITS-bit rank by min/max
       scaling (two scalar aggregates folded into the plan);
    2. interleave the bits into a Morton code and range-partition +
       sort the write on it, so each output file covers a tight
       z-range — i.e. a small rectangle in (c1, c2) space;
    3. record per-FILE min/max of BOTH raw columns in the manifest
       (zone maps — one bounded stats scan of ≤ n_files groups).

    A predicate on EITHER column (or both) then prunes at file
    granularity before the scan plans (`read_zordered`) — the
    multi-dimensional skipping a single-column sort cannot give. At
    100 TB this runs per date-partition with n_files sized to the
    partition; the zone-map read is KB of manifest, never data."""
    c1, c2 = zcols
    os.makedirs(table_dir, exist_ok=True)
    bounds = df.agg(
        F.min(c1).alias("lo1"), F.max(c1).alias("hi1"),
        F.min(c2).alias("lo2"), F.max(c2).alias("hi2"),
    ).first()
    scale = (1 << Z_BITS) - 1

    def _q(col: str, lo, hi) -> F.Column:
        if hi == lo:
            return F.lit(0).cast("long")
        return F.least(
            F.lit(scale).cast("long"),
            F.floor(
                (F.col(col).cast("double") - F.lit(float(lo)))
                / F.lit(float(hi) - float(lo))
                * scale
            ).cast("long"),
        )

    z = _morton_expr(
        _q(c1, bounds["lo1"], bounds["hi1"]),
        _q(c2, bounds["lo2"], bounds["hi2"]),
    )
    rel = os.path.join("data", "z1")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(os.path.join(table_dir, rel))
    )
    # zone maps: per-file min/max of both clustering columns (≤ n_files
    # result rows — bounded driver data)
    spark_read = df.sparkSession.read.parquet(
        os.path.join(table_dir, rel)
    )
    stats = (
        spark_read.withColumn("__f", F.input_file_name())
        .groupBy("__f")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(c1).alias("min1"), F.max(c1).alias("max1"),
            F.min(c2).alias("min2"), F.max(c2).alias("max2"),
        )
        .collect()
    )
    manifest = {
        "version": 1,
        "op": "zorder",
        "zcols": [c1, c2],
        "schema": df.schema.json(),
        "n_rows": sum(int(r["n"]) for r in stats),
        "files": [
            {
                "path": os.path.join(rel, os.path.basename(r["__f"])),
                "n_rows": int(r["n"]),
                "min": [r["min1"], r["min2"]],
                "max": [r["max1"], r["max2"]],
            }
            for r in sorted(stats, key=lambda r: r["__f"])
        ],
    }
    _atomic_write(
        os.path.join(table_dir, "zmanifest_v1.json"),
        json.dumps(manifest, sort_keys=True),
    )
    return 1


def read_zordered(
    spark: SparkSession,
    table_dir: str,
    ranges: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Read the clustered table, pruning to the files whose zone maps
    intersect every supplied ``col -> (lo, hi)`` range. Pruning is an
    optimization only — callers still apply the exact predicate; any
    over-pruning shows up as missing rows against the oracle."""
    with open(os.path.join(table_dir, "zmanifest_v1.json")) as f:
        manifest = json.load(f)
    schema = StructType.fromJson(json.loads(manifest["schema"]))
    zcols = manifest["zcols"]
    files = manifest["files"]
    if ranges:
        for col, (lo, hi) in ranges.items():
            i = zcols.index(col)
            files = [
                e for e in files
                if not (e["max"][i] < lo or e["min"][i] > hi)
            ]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(
        *[os.path.join(table_dir, e["path"]) for e in files]
    )


def table_changes(
    spark: SparkSession,
    table_dir: str,
    v_from: int,
    v_to: int,
    key_col: str,
) -> DataFrame:
    """Change data feed between two committed versions: one row per key
    whose state differs, tagged ``insert`` / ``update`` / ``delete``,
    carrying the before/after payload structs.

    Reconstructed as a full-outer key join of the two immutable
    snapshots — both sides are bucket-partitioned on the SAME key
    layout, so the join shuffles nothing at rest on a cluster that
    reports the bucketing (and is one key exchange here). A production
    table additionally gets per-commit change batches for free — every
    MERGE's CDC input IS that commit's change feed; the snapshot diff
    is the reconstruction path for version ranges whose batches have
    been vacuumed."""
    older = read_table(spark, table_dir, version=v_from)
    newer = read_table(spark, table_dir, version=v_to)
    payload = [c for c in older.columns if c != key_col]
    o = older.select(
        key_col, F.struct(*payload).alias("before"), F.lit(1).alias("__o")
    )
    n = newer.select(
        key_col, F.struct(*payload).alias("after"), F.lit(1).alias("__n")
    )
    j = o.join(n, key_col, "full")
    return (
        j.withColumn(
            "change_op",
            F.when(F.col("__o").isNull(), F.lit("insert"))
            .when(F.col("__n").isNull(), F.lit("delete"))
            .otherwise(F.lit("update")),
        )
        .filter(
            F.col("__o").isNull()
            | F.col("__n").isNull()
            | (F.col("before") != F.col("after"))
        )
        .select(key_col, "change_op", "before", "after")
    )


def table_history(spark: SparkSession, table_dir: str) -> DataFrame:
    """DESCRIBE HISTORY: one row per committed version (driver-side
    O(versions) manifest reads — manifests are KB-sized)."""
    rows = []
    for v in range(1, latest_version(table_dir) + 1):
        m = _load_manifest(table_dir, v)
        rows.append(
            (
                m["version"],
                m["op"],
                m["parent"] if m["parent"] is not None else 0,
                len(m["buckets"]),
                m["n_rows"],
            )
        )
    return spark.createDataFrame(
        rows,
        "version int, op string, parent int, n_buckets int, n_rows long",
    )
