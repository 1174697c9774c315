"""Semantic property tests for the round-5 operators — invariants the
oracle hash can't express (cross-query consistency, boundary shapes),
at sf0.001."""

from __future__ import annotations

from conftest import SF_DIR
from uni_mannheim_masters_thesis_spark.plans.registry import REGISTRY


def test_attribution_consistent_with_sessionization(spark):
    """Sessions attributed = sessions counted; every converting session
    has at least one purchase; total attributed value is the corpus
    purchase total."""
    import duckdb

    attr = {
        r["entry_type"]: r
        for r in REGISTRY["session_attribution"].fn(spark, SF_DIR).collect()
    }
    sess = REGISTRY["events_sessionization"].fn(spark, SF_DIR).collect()
    assert sum(r["n_sessions"] for r in attr.values()) == sum(
        r["n_sessions"] for r in sess
    )
    for r in attr.values():
        assert 0 <= r["n_converting"] <= r["n_sessions"]
        assert r["n_purchases"] >= r["n_converting"]
    con = duckdb.connect()
    total = con.execute(
        f"SELECT ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) "
        f"FROM '{SF_DIR}/events.parquet' WHERE event_type = 'purchase'"
    ).fetchone()[0]
    assert round(sum(r["attributed_value"] for r in attr.values()), 2) == total


def test_rolling_features_frame_bounds(spark):
    rows = REGISTRY["rolling_user_features"].fn(spark, SF_DIR).collect()
    assert rows
    # roll_max <= roll_sum only holds for non-negative values; assert
    # that precondition explicitly so generator drift fails loudly here
    # rather than as a spurious frame-bound violation below.
    import duckdb

    min_value = duckdb.connect().execute(
        f"SELECT MIN(value) FROM '{SF_DIR}/events.parquet'"
    ).fetchone()[0]
    assert min_value >= 0, (
        "testdata events.value went negative; the roll_max<=roll_sum "
        "invariant below no longer applies"
    )
    per_user_min = {}
    for r in rows:
        assert 1 <= r["roll_n"] <= 5
        assert r["roll_max"] <= r["roll_sum"] + 1e-9  # values are positive
        per_user_min.setdefault(r["user_id"], []).append(r["roll_n"])
    # every user has exactly one frame of each size 1..min(5, n_events)
    for user, ns in per_user_min.items():
        expect = min(5, len(ns))
        for size in range(1, expect + 1):
            assert size in ns, f"user {user} missing frame size {size}"


def test_column_profile_invariants(spark):
    rows = REGISTRY["column_profile"].fn(spark, SF_DIR).collect()
    assert {r["column_name"] for r in rows} == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax"
    }
    n_rows = {r["n_rows"] for r in rows}
    assert len(n_rows) == 1  # same scan, same row count for every column
    for r in rows:
        assert r["n_null"] == 0
        assert 0 < r["n_distinct"] <= r["n_rows"]
        assert r["min_val"] <= r["max_val"]


def test_decile_bucketing_is_equi_depth_and_ordered(spark):
    rows = sorted(
        REGISTRY["decile_bucketing"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == list(range(1, 11))
    sizes = [r["n_rows"] for r in rows]
    assert max(sizes) - min(sizes) <= 1  # NTILE equi-depth
    # remainder goes to the FIRST buckets (NTILE contract)
    assert sizes == sorted(sizes, reverse=True)
    # buckets partition the value range: non-overlapping, ascending
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_price"] <= hi["min_price"]


def test_pagerank_floor_and_node_set(spark):
    from uni_mannheim_masters_thesis_spark.ml.shared import (
        shared_neardup_pairs,
    )

    ranks = REGISTRY["neardup_pagerank"].fn(spark, SF_DIR).collect()
    pairs = shared_neardup_pairs(spark, SF_DIR).collect()
    nodes = {p["id_a"] for p in pairs} | {p["id_b"] for p in pairs}
    assert {r["vec_id"] for r in ranks} == nodes
    n = len(nodes)
    base = 150_000_000_000 // n
    total = 1_000_000_000_000
    for r in ranks:
        # every node keeps at least the teleport mass, floor-rounded
        assert r["rank_e12"] >= base
        assert r["rank_e12"] < total
    # floor division only ever loses mass: total rank must not exceed
    # the initial unit mass
    assert sum(r["rank_e12"] for r in ranks) <= total


def test_triangles_handshake_and_coeff_bounds(spark):
    rows = REGISTRY["neardup_triangles"].fn(spark, SF_DIR).collect()
    assert rows
    # per-node participation counts each triangle exactly 3 times
    assert sum(r["n_triangles"] for r in rows) % 3 == 0
    for r in rows:
        assert 0.0 <= r["clustering_coeff"] <= 1.0
        # a node can be in at most C(degree, 2) triangles
        d = r["degree"]
        assert r["n_triangles"] <= d * (d - 1) // 2


def test_iqr_fences_sane(spark):
    rows = REGISTRY["iqr_outlier_fences"].fn(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["lo_fence"] < r["hi_fence"]
        assert 0 <= r["n_outliers"] < r["n_rows"]


def test_blocked_linkage_bounds(spark):
    rows = REGISTRY["blocked_jw_linkage"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_matches"] <= r["n_pairs"]
        assert 0.0 <= r["top_sim"] <= 1.0


def test_streaming_attribution_matches_batch(spark):
    """No gap in the testdata is exactly 30:00.000000, so the >= / >
    boundary difference is unobservable — the streaming session_window
    attribution must equal the batch lag-formulation row for row."""
    batch = {
        r["entry_type"]: (r["n_sessions"], r["n_converting"],
                          r["n_purchases"], r["attributed_value"])
        for r in REGISTRY["session_attribution"].fn(spark, SF_DIR).collect()
    }
    stream = {
        r["entry_type"]: (r["n_sessions"], r["n_converting"],
                          r["n_purchases"], r["attributed_value"])
        for r in REGISTRY["streaming_session_attribution"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert batch == stream


def test_ntile_formula_matches_duckdb_property():
    """The q/r integer bucket-boundary formula used by decile_bucketing
    must equal SQL NTILE for arbitrary (n, k) — property-checked
    against DuckDB's NTILE (no Spark needed: the formula is pure
    integer arithmetic shared by both engines)."""
    import duckdb
    from hypothesis import given, settings, strategies as st

    con = duckdb.connect()

    @settings(max_examples=40, deadline=None)
    @given(st.integers(min_value=1, max_value=997),
           st.integers(min_value=1, max_value=23))
    def check(n, k):
        q, r = divmod(n, k)
        bad = con.execute(f"""
        WITH t AS (SELECT i AS rn, NTILE({k}) OVER (ORDER BY i) AS nt
                   FROM range(1, {n} + 1) s(i))
        SELECT COUNT(*) FROM t WHERE nt != CASE
            WHEN rn <= {r} * ({q} + 1) THEN (rn - 1) // ({q} + 1) + 1
            ELSE {r} + (rn - 1 - {r} * ({q} + 1)) // (CASE WHEN {q} = 0
                 THEN 1 ELSE {q} END) + 1 END
        """).fetchone()[0]
        assert bad == 0, f"NTILE mismatch at n={n}, k={k}"

    check()


def test_value_histogram_partitions_rows(spark):
    import duckdb

    rows = sorted(
        REGISTRY["value_histogram"].fn(spark, SF_DIR).collect(),
        key=lambda r: r["bin"],
    )
    assert rows[0]["bin"] == 0 and rows[-1]["bin"] == 19
    con = duckdb.connect()
    total = con.execute(
        f"SELECT COUNT(*) FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchone()[0]
    # bins partition all rows, and observed ranges are ordered and
    # non-overlapping
    assert sum(r["n_rows"] for r in rows) == total
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_price"] <= hi["min_price"]
