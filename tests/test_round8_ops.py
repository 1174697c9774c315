"""Round-8 operator tests: the copy-on-write lakehouse table
(sources/lakehouse.py) — commit atomicity, bucket-level CoW reuse,
manifest pruning — plus the windowless bounded ranker's integration
into hybrid retrieval."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
    N_BUCKETS,
    create_table,
    latest_version,
    merge_table,
    read_table,
    table_history,
)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, state string, val double"
    )


def _cdc(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, state string, val double, __delete boolean"
    )


@pytest.fixture()
def table(spark, tmp_path):
    tdir = str(tmp_path / "tbl")
    base = _mk(
        spark,
        [(i, f"s{i % 3}", float(i)) for i in range(40)],  # buckets 0..15
    )
    create_table(base, tdir, "user_id")
    return tdir


def test_create_then_read_roundtrip(spark, table):
    got = {r["user_id"]: r["val"] for r in read_table(spark, table).collect()}
    assert got == {i: float(i) for i in range(40)}
    assert latest_version(table) == 1


def test_merge_is_copy_on_write_per_bucket(spark, table):
    # CDC touches keys 3 and 19 — both bucket 3 — so v2 must rewrite
    # ONLY bucket 3 and carry the other 15 buckets by reference to v1
    cdc = _cdc(
        spark, [(3, "upd", 99.0, False), (19, "gone", 0.0, True)]
    )
    merge_table(spark, table, cdc, "user_id", "__delete")
    man = json.load(open(os.path.join(table, "manifest_v2.json")))
    paths = {b: e["path"] for b, e in man["buckets"].items()}
    assert paths["3"].startswith(os.path.join("data", "v2"))
    for b, p in paths.items():
        if b != "3":
            assert p.startswith(os.path.join("data", "v1")), (b, p)
    got = {r["user_id"]: (r["state"], r["val"])
           for r in read_table(spark, table).collect()}
    assert got[3] == ("upd", 99.0)
    assert 19 not in got  # tombstone applied
    assert len(got) == 39


def test_delete_empties_bucket_drops_manifest_entry(spark, table):
    # delete every key of bucket 5 (5, 21, 37) — the bucket must
    # vanish from the v2 manifest, and reads must not see ghosts
    cdc = _cdc(
        spark,
        [(5, "x", 0.0, True), (21, "x", 0.0, True), (37, "x", 0.0, True)],
    )
    merge_table(spark, table, cdc, "user_id", "__delete")
    man = json.load(open(os.path.join(table, "manifest_v2.json")))
    assert "5" not in man["buckets"]
    users = {r["user_id"] for r in read_table(spark, table).collect()}
    assert users.isdisjoint({5, 21, 37}) and len(users) == 37


def test_time_travel_reads_pre_merge_state(spark, table):
    cdc = _cdc(spark, [(0, "upd", -1.0, False)])
    merge_table(spark, table, cdc, "user_id", "__delete")
    v1 = {r["user_id"]: r["val"]
          for r in read_table(spark, table, version=1).collect()}
    v2 = {r["user_id"]: r["val"]
          for r in read_table(spark, table, version=2).collect()}
    assert v1[0] == 0.0 and v2[0] == -1.0
    assert {k: v for k, v in v2.items() if k != 0} == {
        k: v for k, v in v1.items() if k != 0
    }


def test_point_key_read_prunes_scanned_files(spark, table):
    full = read_table(spark, table)
    pruned = read_table(spark, table, point_keys=[3, 19])
    assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
    # same rows as a full scan + filter — pruning is an optimization,
    # never a semantics change
    want = {
        r["user_id"]
        for r in full.filter(F.col("user_id").isin(3, 19)).collect()
    }
    got = {
        r["user_id"]
        for r in pruned.filter(F.col("user_id").isin(3, 19)).collect()
    }
    assert got == want == {3, 19}


def test_min_max_stats_prune_out_of_range_keys(spark, tmp_path):
    tdir = str(tmp_path / "tbl2")
    create_table(
        _mk(spark, [(0, "a", 0.0), (16, "a", 1.0)]), tdir, "user_id"
    )  # bucket 0 holds keys {0, 16}
    # key 32 routes to bucket 0 but exceeds its max_key stat → no scan
    assert read_table(spark, tdir, point_keys=[32]).count() == 0


def test_commit_point_is_atomic_latest_flip(spark, table):
    # simulate a crash AFTER v2's data+manifest land but BEFORE the
    # _LATEST flip: readers must still see v1, and the stray manifest
    # must not corrupt anything
    cdc = _cdc(spark, [(1, "upd", 5.0, False)])
    merge_table(spark, table, cdc, "user_id", "__delete")
    with open(os.path.join(table, "_LATEST"), "w") as f:
        f.write("1")  # roll the commit pointer back = pre-flip state
    assert latest_version(table) == 1
    got = {r["user_id"]: r["val"] for r in read_table(spark, table).collect()}
    assert got[1] == 1.0  # v1 state, not the half-committed merge


def test_history_tracks_ops_and_counts(spark, table):
    merge_table(
        spark, table, _cdc(spark, [(2, "u", 0.0, False)]),
        "user_id", "__delete",
    )
    merge_table(
        spark, table, _cdc(spark, [(2, "x", 0.0, True)]),
        "user_id", "__delete",
    )
    hist = {r["version"]: r for r in table_history(spark, table).collect()}
    assert [hist[v]["op"] for v in (1, 2, 3)] == ["create", "merge", "merge"]
    assert hist[2]["parent"] == 1 and hist[3]["parent"] == 2
    assert hist[1]["n_rows"] == 40 and hist[3]["n_rows"] == 39


def test_insert_into_brand_new_bucket(spark, tmp_path):
    # create covers only buckets 0/1; a merge inserting bucket 7 keys
    # must add a manifest entry without disturbing the others
    tdir = str(tmp_path / "tbl3")
    create_table(_mk(spark, [(0, "a", 0.0), (1, "a", 1.0)]), tdir, "user_id")
    merge_table(
        spark, tdir, _cdc(spark, [(7, "new", 7.0, False)]),
        "user_id", "__delete",
    )
    got = {r["user_id"] for r in read_table(spark, tdir).collect()}
    assert got == {0, 1, 7}


def test_bucket_count_constant(spark):
    assert N_BUCKETS == 16  # manifest layout contract (docs + oracle)


def test_optimize_is_self_contained_and_content_preserving(spark, table):
    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        optimize_table,
    )

    merge_table(
        spark, table, _cdc(spark, [(3, "upd", 99.0, False)]),
        "user_id", "__delete",
    )
    before = {
        (r["user_id"], r["state"], r["val"])
        for r in read_table(spark, table).collect()
    }
    v = optimize_table(spark, table, "user_id")
    assert v == 3 and latest_version(table) == 3
    man = json.load(open(os.path.join(table, "manifest_v3.json")))
    # self-contained: every bucket reference points at v3's own dir
    assert all(e["path"].startswith(os.path.join("data", "v3"))
               for e in man["buckets"].values())
    # compacted: one data file per bucket dir
    for e in man["buckets"].values():
        files = [f for f in os.listdir(os.path.join(table, e["path"]))
                 if f.endswith(".parquet")]
        assert len(files) == 1
    after = {
        (r["user_id"], r["state"], r["val"])
        for r in read_table(spark, table).collect()
    }
    assert after == before


def test_vacuum_removes_only_unreferenced_dirs(spark, table):
    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        optimize_table,
        vacuum_table,
    )

    merge_table(
        spark, table, _cdc(spark, [(3, "upd", 99.0, False)]),
        "user_id", "__delete",
    )
    optimize_table(spark, table, "user_id")
    stats = vacuum_table(table, retain_versions=1)
    # v1 wrote 16 buckets, the merge rewrote bucket 3 (1 dir); the
    # optimized v3 keeps its own 16
    assert stats == {"removed_dirs": 17, "live_dirs": 16,
                     "retained_from": 3}
    # latest still fully readable; vacuumed versions fail explicitly
    assert read_table(spark, table).count() == 40
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        read_table(spark, table, version=1)
    # history (manifest audit log) survives vacuum
    assert [r["op"] for r in table_history(spark, table).collect()] == [
        "create", "merge", "optimize",
    ]


def test_vacuum_with_full_retention_removes_nothing(spark, table):
    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        vacuum_table,
    )

    merge_table(
        spark, table, _cdc(spark, [(3, "upd", 99.0, False)]),
        "user_id", "__delete",
    )
    stats = vacuum_table(table, retain_versions=2)
    assert stats["removed_dirs"] == 0
    # v2 carries 15 buckets by reference to v1 + rewrote 1: every
    # physical dir is still referenced by the retained window
    assert read_table(spark, table, version=1).count() == 40


def test_upsert_combine_folds_partials_and_reuses_buckets(spark, tmp_path):
    from decimal import Decimal

    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        create_table,
        read_table,
        upsert_combine,
    )

    tdir = str(tmp_path / "mv")
    agg = spark.createDataFrame(
        [(0, 2, Decimal("1.50")), (1, 1, Decimal("2.00")),
         (17, 3, Decimal("0.25"))],
        "user_id long, n long, s decimal(18,2)",
    )
    create_table(agg, tdir, "user_id")
    # delta touches keys 1 (bucket 1) and 33 (bucket 1, new key) only
    delta = spark.createDataFrame(
        [(1, 4, Decimal("0.50")), (33, 1, Decimal("9.00"))],
        "user_id long, n long, s decimal(18,2)",
    )
    upsert_combine(spark, tdir, delta, "user_id", ["n", "s"])
    got = {
        r["user_id"]: (r["n"], r["s"])
        for r in read_table(spark, tdir).collect()
    }
    assert got == {
        0: (2, Decimal("1.50")),          # untouched, carried by reference
        1: (5, Decimal("2.50")),          # existing + delta combined
        17: (3, Decimal("0.25")),         # bucket 1 resident, no delta row
        33: (1, Decimal("9.00")),         # brand-new key inserted
    }
    man = json.load(
        open(os.path.join(tdir, "manifest_v2.json"))
    )
    # only bucket 1 was rewritten; buckets 0 and 17%16=1... key 17 IS
    # bucket 1, so it was rewritten together; bucket 0 must still point
    # at v1
    assert man["buckets"]["0"]["path"].startswith(
        os.path.join("data", "v1")
    )
    assert man["buckets"]["1"]["path"].startswith(
        os.path.join("data", "v2")
    )
    # stored schema is stable across commits (widen-then-narrow cast)
    assert dict(read_table(spark, tdir).dtypes)["s"] == "decimal(18,2)"


def test_bpe_train_known_trajectory(spark):
    from uni_mannheim_masters_thesis_spark.ml.bpe import bpe_train

    # classic Sennrich-style toy dict; hand-computed trajectory
    words = spark.createDataFrame(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)],
        "word string, freq long",
    )
    got = [
        (r["step"], r["lhs"], r["rhs"], r["pair_count"], r["merged"])
        for r in bpe_train(spark, words, 4).collect()
    ]
    # step 1: (e,s) 9 vs (s,t) 9 vs (t,</w>) 9 — lexicographic tie-break
    #   picks ('e','s'); step 2: ('es','t') 9; step 3: ('est','</w>') 9;
    #   step 4: ('l','o') 7
    assert got == [
        (1, "e", "s", 9, "es"),
        (2, "es", "t", 9, "est"),
        (3, "est", "</w>", 9, "est</w>"),
        (4, "l", "o", 7, "lo"),
    ]


def test_bpe_overlapping_pairs_merge_greedy_left_to_right(spark):
    from uni_mannheim_masters_thesis_spark.ml.bpe import bpe_train

    # 'aaaa' has 3 overlapping (a,a) pairs but greedy merging yields
    # 'aa aa' — so step 2's pairs are (aa,aa) and (aa,</w>), tie broken
    # lexicographically to (aa,</w>), and step 3 sees 'aa aa</w>'.
    # (The buggy string-replace merge produced 'aa a a' instead, whose
    # step-2 winner is (a,</w>) — this trajectory discriminates.)
    words = spark.createDataFrame([("aaaa", 1)], "word string, freq long")
    got = [
        (r["step"], r["lhs"], r["rhs"], r["pair_count"])
        for r in bpe_train(spark, words, 3).collect()
    ]
    assert got == [
        (1, "a", "a", 3),
        (2, "aa", "</w>", 1),
        (3, "aa", "aa</w>", 1),
    ]


def test_bpe_stops_early_when_fully_merged(spark):
    from uni_mannheim_masters_thesis_spark.ml.bpe import bpe_train

    # 'ab' exhausts after 2 merges: (a,b) then (ab,</w>) — further
    # requested merges must stop cleanly, not error
    words = spark.createDataFrame([("ab", 1)], "word string, freq long")
    out = bpe_train(spark, words, 10).collect()
    assert [r["merged"] for r in out] == ["ab", "ab</w>"]



def test_bpe_oracle_gaps_and_islands_matches_greedy():
    # the DuckDB twin uses a different merge-application algorithm
    # (relational gaps-and-islands); pin it on the same discriminating
    # input the Spark fold is pinned on
    import duckdb

    from uni_mannheim_masters_thesis_spark.plans.registry import (
        _bpe_oracle_sql,
    )

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT 'aaaa' AS text")
    got = con.execute(
        _bpe_oracle_sql(3) + " ORDER BY step"
    ).fetchall()
    assert got == [
        (1, "a", "a", 3, "aa"),
        (2, "aa", "</w>", 1, "aa</w>"),
        (3, "aa", "aa</w>", 1, "aaaa</w>"),
    ]


def test_table_changes_tags_insert_update_delete(spark, table):
    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        table_changes,
    )

    cdc = _cdc(
        spark,
        [(0, "upd", -1.0, False),     # update
         (19, "x", 0.0, True),        # delete
         (99, "new", 9.0, False)],    # insert
    )
    merge_table(spark, table, cdc, "user_id", "__delete")
    got = {
        r["user_id"]: (r["change_op"], r["before"], r["after"])
        for r in table_changes(spark, table, 1, 2, "user_id").collect()
    }
    assert set(got) == {0, 19, 99}  # unchanged keys never leak in
    assert got[0][0] == "update" and got[0][2]["val"] == -1.0
    assert got[19][0] == "delete" and got[19][2] is None
    assert got[99][0] == "insert" and got[99][1] is None


def test_zorder_zone_maps_prune_files_on_both_dims(spark, tmp_path):
    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        create_zordered_table,
        read_zordered,
    )

    tdir = str(tmp_path / "z")
    # a 64x64 grid: clustering must let a small rectangle touch only
    # a few of the 16 files, on either dimension alone or both
    df = spark.createDataFrame(
        [(x, float(y), x * 64 + y) for x in range(64) for y in range(64)],
        "a long, b double, payload long",
    )
    create_zordered_table(df, tdir, ("a", "b"))
    full = read_zordered(spark, tdir)
    assert full.count() == 64 * 64
    n_all = len(full.inputFiles())
    assert n_all > 1
    for ranges in (
        {"a": (0, 7), "b": (0.0, 7.0)},     # both dims
        {"a": (0, 7)},                      # leading dim alone
        {"b": (0.0, 7.0)},                  # NON-leading dim alone —
                                            # impossible for a plain sort
    ):
        pruned = read_zordered(spark, tdir, ranges=ranges)
        assert 0 < len(pruned.inputFiles()) < n_all, ranges
        # pruning is an optimization, never a semantics change
        cond = None
        for c, (lo, hi) in ranges.items():
            e = F.col(c).between(lo, hi)
            cond = e if cond is None else (cond & e)
        assert (
            sorted(r["payload"] for r in pruned.filter(cond).collect())
            == sorted(r["payload"] for r in full.filter(cond).collect())
        )


def test_zorder_constant_column_degenerates_safely(spark, tmp_path):
    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        create_zordered_table,
        read_zordered,
    )

    tdir = str(tmp_path / "zc")
    df = spark.createDataFrame(
        [(1, float(y)) for y in range(32)], "a long, b double"
    )
    create_zordered_table(df, tdir, ("a", "b"))  # a is constant
    got = read_zordered(spark, tdir, ranges={"a": (1, 1), "b": (0.0, 3.0)})
    assert got.filter(F.col("b") <= 3.0).count() == 4
    # a range missing the constant prunes everything
    assert read_zordered(spark, tdir, ranges={"a": (5, 9)}).count() == 0


def test_read_table_buckets_arg_prunes_scan(spark, table):
    full = read_table(spark, table)
    b3 = read_table(spark, table, buckets=[3])
    assert 0 < len(b3.inputFiles()) < len(full.inputFiles())
    # bucket 3 holds exactly keys {3, 19, 35} of 0..39
    assert {r["user_id"] for r in b3.collect()} == {3, 19, 35}


# -- schema evolution + restore (session-3) -------------------------------

def test_add_column_is_metadata_only(spark, table):
    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        add_column,
    )

    before = set(os.listdir(os.path.join(table, "data")))
    v = add_column(table, "tier", "string")
    assert v == 2 and latest_version(table) == 2
    # no data directory was written — the commit is a KB manifest
    assert set(os.listdir(os.path.join(table, "data"))) == before
    man = json.load(open(os.path.join(table, "manifest_v2.json")))
    v1 = json.load(open(os.path.join(table, "manifest_v1.json")))
    assert man["buckets"] == v1["buckets"]  # carried by reference
    # old files read back null-filled under the widened schema
    got = read_table(spark, table)
    assert got.columns == ["user_id", "state", "val", "tier"]
    assert got.filter(F.col("tier").isNotNull()).count() == 0


def test_add_column_rejects_duplicate(table):
    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        add_column,
    )

    with pytest.raises(ValueError):
        add_column(table, "state", "string")


def test_merge_after_evolution_populates_only_touched_keys(spark, table):
    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        add_column,
    )

    add_column(table, "tier", "string")
    cdc = spark.createDataFrame(
        [(3, "upd", 99.0, "gold", False)],
        "user_id long, state string, val double, tier string, "
        "__delete boolean",
    )
    merge_table(spark, table, cdc, "user_id", "__delete")
    rows = {r["user_id"]: r["tier"] for r in read_table(spark, table).collect()}
    assert rows[3] == "gold"
    assert all(v is None for k, v in rows.items() if k != 3)
    assert len(rows) == 40


def test_restore_is_metadata_only_and_preserves_history(spark, table):
    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        restore_table,
    )

    cdc = _cdc(spark, [(3, "upd", 99.0, False), (19, "gone", 0.0, True)])
    merge_table(spark, table, cdc, "user_id", "__delete")  # v2
    before = set(os.listdir(os.path.join(table, "data")))
    v = restore_table(table, 1)  # v3 rolls back to v1
    assert v == 3 and latest_version(table) == 3
    assert set(os.listdir(os.path.join(table, "data"))) == before
    man3 = json.load(open(os.path.join(table, "manifest_v3.json")))
    man1 = json.load(open(os.path.join(table, "manifest_v1.json")))
    assert man3["buckets"] == man1["buckets"] and man3["parent"] == 2
    # latest content == v1; the rolled-back v2 stays readable
    got = {r["user_id"]: r["val"] for r in read_table(spark, table).collect()}
    assert got == {i: float(i) for i in range(40)}
    v2 = {r["user_id"]: r["val"] for r in
          read_table(spark, table, version=2).collect()}
    assert v2[3] == 99.0 and 19 not in v2
    ops = [r["op"] for r in table_history(spark, table).collect()]
    assert ops == ["create", "merge", "restore"]


def test_restore_resets_schema_after_evolution(spark, table):
    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        add_column, restore_table,
    )

    add_column(table, "tier", "string")  # v2 widens
    restore_table(table, 1)              # v3 rolls back pre-evolution
    assert read_table(spark, table).columns == ["user_id", "state", "val"]


# -- data-quality expectations (session-3) ---------------------------------

def test_expectations_flag_known_violations(spark):
    from uni_mannheim_masters_thesis_spark.operators.expectations import (
        completeness, compliance, run_checks, uniqueness,
    )

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, -1.0), (2, "c", 3.0), (4, "d", 0.5)],
        "id long, name string, score double",
    )
    out = {
        r["constraint_name"]: (r["metric"], r["passed"])
        for r in run_checks(
            df,
            [
                completeness("name_complete", "name"),
                uniqueness("id_unique", "id"),
                compliance("score_positive", F.col("score") > 0),
                compliance("score_mostly_positive", F.col("score") > 0,
                           threshold=0.7),
            ],
        ).collect()
    }
    assert out["name_complete"] == (0.75, False)
    assert out["id_unique"] == (0.75, False)      # 3 distinct / 4 rows
    assert out["score_positive"] == (0.75, False)
    assert out["score_mostly_positive"] == (0.75, True)


def test_expectations_null_predicate_counts_noncompliant(spark):
    from uni_mannheim_masters_thesis_spark.operators.expectations import (
        compliance, run_checks,
    )

    df = spark.createDataFrame([(1.0,), (None,)], "v double")
    (r,) = run_checks(df, [compliance("v_pos", F.col("v") > 0)]).collect()
    assert r["metric"] == 0.5 and not r["passed"]


def test_referential_integrity_detects_orphans(spark):
    from uni_mannheim_masters_thesis_spark.operators.expectations import (
        referential_integrity,
    )

    fact = spark.createDataFrame([(1,), (2,), (9,), (9,)], "fk long")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    (r,) = referential_integrity(fact, dim, "fk", "pk", "ri").collect()
    assert r["metric"] == 0.5 and not r["passed"]
    # plan must broadcast the dim side (no key exchange of the fact)
    plan = referential_integrity(
        fact, dim, "fk", "pk", "ri"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_expectations_suite_is_single_pass(spark):
    from uni_mannheim_masters_thesis_spark.operators.expectations import (
        completeness, compliance, run_checks,
    )

    df = spark.createDataFrame([(i, float(i)) for i in range(10)],
                               "id long, v double")
    out = run_checks(df, [completeness("c", "v"),
                          compliance("p", F.col("v") >= 0)])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # no count-distinct in this suite -> one partial+final aggregate
    # pair over ONE scan; the explode of the metric array sits above it
    assert plan.count("Scan ExistingRDD") == 1
    assert "Generate explode" in plan


# -- bloom filter semi-join (session-3) -------------------------------------

def test_bloom_has_no_false_negatives(spark):
    from uni_mannheim_masters_thesis_spark.operators.sketches import (
        bloom_build, bloom_might_contain,
    )

    build = spark.range(0, 500).withColumnRenamed("id", "k")
    words = bloom_build(build, "k")
    # every build key must probe true — a false negative is corruption
    assert build.filter(bloom_might_contain(F.col("k"), words)).count() == 500


def test_bloom_prunes_disjoint_probe_keys(spark):
    from uni_mannheim_masters_thesis_spark.operators.sketches import (
        BLOOM_WORDS, bloom_build, bloom_might_contain,
    )

    build = spark.range(0, 200).withColumnRenamed("id", "k")
    words = bloom_build(build, "k")
    assert len(words) == BLOOM_WORDS
    probe = spark.range(10_000, 20_000).withColumnRenamed("id", "k")
    fp = probe.filter(bloom_might_contain(F.col("k"), words)).count()
    # k=5, m=65536, n=200 -> FPR ~ (1-e^(-5*200/65536))^5 ~ 1e-9;
    # allow generous slack for hash clustering
    assert fp < 50


def test_bloom_probe_is_a_plan_local_filter(spark):
    from uni_mannheim_masters_thesis_spark.operators.sketches import (
        bloom_build, bloom_might_contain,
    )

    build = spark.range(0, 10).withColumnRenamed("id", "k")
    words = bloom_build(build, "k")
    probe = spark.range(0, 100).withColumnRenamed("id", "k")
    plan = (
        probe.filter(bloom_might_contain(F.col("k"), words))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # a pure row-local predicate: Filter over the scan, no join/exchange
    assert "Filter" in plan
    assert "Exchange" not in plan and "Join" not in plan


# -- rendezvous sharding (session-3) ----------------------------------------

def test_hrw_minimal_movement_and_balance(spark):
    from uni_mannheim_masters_thesis_spark.plans.registry import _hrw_shard

    d = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    a = d.select(
        _hrw_shard(F.col("doc_id"), 8).alias("s8"),
        _hrw_shard(F.col("doc_id"), 9).alias("s9"),
    )
    r = a.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("s9") != F.col("s8")).cast("long")).alias("moved"),
        F.sum(
            ((F.col("s9") != F.col("s8")) & (F.col("s9") != 8)).cast("long")
        ).alias("bad_moves"),
        F.countDistinct("s8").alias("shards_used"),
    ).first()
    assert r["bad_moves"] == 0            # moves land ONLY on the new shard
    assert r["shards_used"] == 8          # no empty shard at n=2000
    frac = r["moved"] / r["n"]
    assert 0.05 < frac < 0.20             # ~1/9 of keys relocate


# -- partition evolution / rebucketing (session-3) --------------------------

def test_rebucket_changes_layout_and_preserves_content(spark, table):
    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        rebucket_table,
    )

    v = rebucket_table(spark, table, "user_id", 32)
    assert v == 2
    man = json.load(open(os.path.join(table, "manifest_v2.json")))
    assert man["n_buckets"] == 32 and man["op"] == "rebucket"
    assert all(e["path"].startswith(os.path.join("data", "v2"))
               for e in man["buckets"].values())  # self-contained rewrite
    got = {r["user_id"]: r["val"] for r in read_table(spark, table).collect()}
    assert got == {i: float(i) for i in range(40)}
    # point lookups route with the NEW modulus and still prune
    pruned = read_table(spark, table, point_keys=[35])
    assert 0 < len(pruned.inputFiles()) < len(
        read_table(spark, table).inputFiles()
    )
    assert {r["user_id"] for r in
            pruned.filter(F.col("user_id") == 35).collect()} == {35}


def test_merge_after_rebucket_cow_at_new_granularity(spark, table):
    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        rebucket_table,
    )

    rebucket_table(spark, table, "user_id", 32)
    cdc = _cdc(spark, [(3, "upd", 99.0, False)])  # bucket 3 of 32
    merge_table(spark, table, cdc, "user_id", "__delete")
    man = json.load(open(os.path.join(table, "manifest_v3.json")))
    assert man["n_buckets"] == 32
    rewritten = [b for b, e in man["buckets"].items()
                 if e["path"].startswith(os.path.join("data", "v3"))]
    assert rewritten == ["3"]  # CoW at the NEW granularity
    got = {r["user_id"]: r["val"] for r in read_table(spark, table).collect()}
    assert got[3] == 99.0 and len(got) == 40


def test_time_travel_across_rebucket_routes_old_modulus(spark, table):
    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        rebucket_table,
    )

    rebucket_table(spark, table, "user_id", 32)
    # v1 still routes 19 -> bucket 3 of 16 and prunes correctly
    old = read_table(spark, table, version=1, point_keys=[19])
    assert {r["user_id"] for r in
            old.filter(F.col("user_id") == 19).collect()} == {19}
    assert 0 < len(old.inputFiles()) < len(
        read_table(spark, table, version=1).inputFiles()
    )


def test_restore_past_rebucket_restores_old_layout(spark, table):
    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        rebucket_table, restore_table,
    )

    rebucket_table(spark, table, "user_id", 32)
    restore_table(table, 1)
    man = json.load(open(os.path.join(table, "manifest_v3.json")))
    assert man["n_buckets"] == 16  # rollback restores the old routing


# -- asof join directions + tolerance (session-3) ----------------------------

def _asof_case(spark):
    quotes = spark.createDataFrame(
        [(1, 10, 101, "a"), (1, 20, 102, "b"), (1, 40, 103, "c")],
        "k long, ts long, sid long, v string",
    )
    probes = spark.createDataFrame(
        [(1, 5, 201), (1, 15, 202), (1, 25, 203), (1, 40, 204),
         (1, 100, 205)],
        "k long, ts long, sid long",
    )
    return probes, quotes


def _run_asof(spark, **kw):
    from uni_mannheim_masters_thesis_spark.operators.relational import (
        asof_join,
    )

    probes, quotes = _asof_case(spark)
    out = asof_join(probes, quotes, on="k", ts_col="ts",
                    value_cols=["v"], seq_col="sid", **kw)
    return {r["ts"]: r["asof_v"] for r in out.collect()}


def test_asof_backward_default(spark):
    assert _run_asof(spark) == {5: None, 15: "a", 25: "b", 40: "c",
                                100: "c"}


def test_asof_forward(spark):
    assert _run_asof(spark, direction="forward") == {
        5: "a", 15: "b", 25: "c", 40: "c", 100: None}


def test_asof_nearest_ties_break_backward(spark):
    # ts=15 is equidistant (10 vs 20) -> backward wins (pandas rule)
    assert _run_asof(spark, direction="nearest") == {
        5: "a", 15: "a", 25: "b", 40: "c", 100: "c"}


def test_asof_nearest_tolerance_nulls_far_matches(spark):
    assert _run_asof(spark, direction="nearest", tolerance=10) == {
        5: "a", 15: "a", 25: "b", 40: "c", 100: None}


def test_asof_rejects_bad_direction(spark):
    with pytest.raises(ValueError):
        _run_asof(spark, direction="sideways")


def test_asof_nearest_single_exchange(spark):
    from uni_mannheim_masters_thesis_spark.operators.relational import (
        asof_join,
    )

    probes, quotes = _asof_case(spark)
    out = asof_join(probes, quotes, on="k", ts_col="ts",
                    value_cols=["v"], seq_col="sid", direction="nearest")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # both direction windows ride ONE hashpartitioning exchange on k
    assert plan.count("Exchange hashpartitioning") == 1


# -- shallow clone (session-3) -----------------------------------------------

def test_shallow_clone_is_zero_copy_and_isolated(spark, table, tmp_path):
    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        clone_table, vacuum_table,
    )

    dst = str(tmp_path / "clone")
    v = clone_table(table, dst)
    assert v == 1
    # zero data copied: the clone has no data/ dir at all yet
    assert not os.path.isdir(os.path.join(dst, "data"))
    got = {r["user_id"]: r["val"] for r in read_table(spark, dst).collect()}
    assert got == {i: float(i) for i in range(40)}
    # a merge into the clone lands under the CLONE's data dir and the
    # source never sees it
    cdc = _cdc(spark, [(3, "upd", 99.0, False)])
    merge_table(spark, dst, cdc, "user_id", "__delete")
    assert os.path.isdir(os.path.join(dst, "data", "v2"))
    src = {r["user_id"]: r["val"] for r in read_table(spark, table).collect()}
    assert src[3] == 3.0                      # source untouched
    cl = {r["user_id"]: r["val"] for r in read_table(spark, dst).collect()}
    assert cl[3] == 99.0                      # clone diverged
    # vacuuming the clone walks only the clone's data/ — source files
    # stay live even when unreferenced by the clone's latest version
    stats = vacuum_table(dst, retain_versions=1)
    assert stats["removed_dirs"] == 0
    assert src == {r["user_id"]: r["val"]
                   for r in read_table(spark, table).collect()}


# -- exactly-once streaming sink (session-3) ---------------------------------

def test_sink_replayed_batch_is_transactionally_skipped(spark, tmp_path):
    from uni_mannheim_masters_thesis_spark.streaming.lakehouse_sink import (
        apply_cdc_batch,
    )

    tdir = str(tmp_path / "sink_tbl")

    def _batch(rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, "
                  "value double, ts timestamp",
        ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))

    b0 = _batch([(1, 10, "view", 1.0, None)])
    b1 = _batch([(2, 10, "purchase", 5.0, None), (3, 11, "view", 2.0, None)])

    assert apply_cdc_batch(spark, tdir, b0, 0) is True   # create
    assert apply_cdc_batch(spark, tdir, b1, 1) is True   # merge
    v_after = latest_version(tdir)
    state = sorted(read_table(spark, tdir).collect())
    # crash-replay of BOTH already-committed batches: no content change,
    # no phantom versions
    assert apply_cdc_batch(spark, tdir, b0, 0) is False
    assert apply_cdc_batch(spark, tdir, b1, 1) is False
    assert latest_version(tdir) == v_after
    assert sorted(read_table(spark, tdir).collect()) == state
    # the next NEW batch still applies
    b2 = _batch([(4, 11, "error", 0.0, None)])           # tombstone 11
    assert apply_cdc_batch(spark, tdir, b2, 2) is True
    assert {r["user_id"] for r in read_table(spark, tdir).collect()} == {10}


# -- commit crash-consistency (session-3) ------------------------------------

def test_crash_between_commit_steps_never_corrupts_readers(spark, table):
    """Simulate a writer dying at each stage of the commit protocol
    (data written / manifest written / _LATEST flipped) and assert
    readers always see a fully consistent version, and that a retry
    completes the interrupted commit."""
    from uni_mannheim_masters_thesis_spark.sources import lakehouse as lh

    base = {r["user_id"]: r["val"] for r in read_table(spark, table).collect()}

    # stage 1: crash AFTER data files, BEFORE manifest — orphan data,
    # no reader impact
    merged = read_table(spark, table).withColumn(
        "val", F.col("val") + 1000.0
    )
    lh._write_snapshot(merged, table, 2, "user_id")
    assert latest_version(table) == 1
    got = {r["user_id"]: r["val"] for r in read_table(spark, table).collect()}
    assert got == base

    # stage 2: crash AFTER manifest, BEFORE _LATEST — version invisible
    man = lh._load_manifest(table, 1)
    lh._atomic_write(
        os.path.join(table, "manifest_v2.json"),
        json.dumps({**man, "version": 2, "op": "merge", "parent": 1}),
    )
    assert latest_version(table) == 1
    assert {r["user_id"]: r["val"]
            for r in read_table(spark, table).collect()} == base

    # stage 3: the writer retries the SAME merge — overwrite-by-version
    # makes the interrupted commit idempotent and it completes cleanly
    cdc = _cdc(spark, [(3, "upd", 99.0, False)])
    merge_table(spark, table, cdc, "user_id", "__delete")
    assert latest_version(table) == 2
    got = {r["user_id"]: r["val"] for r in read_table(spark, table).collect()}
    assert got[3] == 99.0 and len(got) == 40


# -- empty-input hardening (session-3) ---------------------------------------

def test_bloom_empty_build_side_rejects_everything(spark):
    from uni_mannheim_masters_thesis_spark.operators.sketches import (
        bloom_build, bloom_might_contain,
    )

    empty = spark.range(0, 0).withColumnRenamed("id", "k")
    words = bloom_build(empty, "k")
    assert all(w == 0 for w in words)
    probe = spark.range(0, 100).withColumnRenamed("id", "k")
    assert probe.filter(bloom_might_contain(F.col("k"), words)).count() == 0


def test_expectations_on_empty_frame_return_null_metrics(spark):
    from uni_mannheim_masters_thesis_spark.operators.expectations import (
        completeness, run_checks,
    )

    df = spark.createDataFrame([], "v double")
    (r,) = run_checks(df, [completeness("c", "v")]).collect()
    # 0/0 -> null metric; the check FAILS explicitly, never silently
    assert r["metric"] is None and r["passed"] is False


def test_asof_with_no_quotes_yields_all_null_matches(spark):
    from uni_mannheim_masters_thesis_spark.operators.relational import (
        asof_join,
    )

    probes = spark.createDataFrame(
        [(1, 5, 201), (1, 15, 202)], "k long, ts long, sid long"
    )
    quotes = spark.createDataFrame([], "k long, ts long, sid long, v string")
    for direction in ("backward", "forward", "nearest"):
        out = asof_join(probes, quotes, on="k", ts_col="ts",
                        value_cols=["v"], seq_col="sid",
                        direction=direction).collect()
        assert len(out) == 2
        assert all(r["asof_v"] is None for r in out)


def test_hrw_single_shard_never_moves(spark):
    from uni_mannheim_masters_thesis_spark.plans.registry import _hrw_shard

    d = spark.range(0, 50).select(F.col("id").alias("doc_id"))
    got = d.select(_hrw_shard(F.col("doc_id"), 1).alias("s")).distinct()
    assert [r["s"] for r in got.collect()] == [0]
