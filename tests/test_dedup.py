"""Dedup operator tests: exact, MinHash LSH, SimHash."""

from __future__ import annotations

from pyspark.sql import functions as F

from uni_mannheim_masters_thesis_spark.operators.dedup import (
    add_simhash,
    dedup_stats,
    exact_dedup,
    hamming64,
    minhash_lsh_pairs,
)


def _docs(spark):
    rows = [
        (1, ["spark", "query", "engine", "fast", "scale"]),
        (2, ["spark", "query", "engine", "fast", "scale"]),          # exact dup of 1
        (3, ["spark", "query", "engine", "fast", "scalable"]),       # near dup of 1
        (4, ["completely", "different", "topic", "entirely", "here"]),
    ]
    return spark.createDataFrame(rows, ["doc_id", "tokens"])


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], ["id", "text"]
    )
    assert exact_dedup(df, ["text"]).count() == 2


def test_dedup_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", "g"), (2, "a", "g"), (3, "b", "g")], ["id", "text", "grp"]
    )
    row = dedup_stats(df, "text", ["grp"]).first()
    assert (row.n_rows, row.n_distinct, row.n_duplicates) == (3, 2, 1)


def test_minhash_finds_exact_and_near_dups(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard_dist
        for r in minhash_lsh_pairs(_docs(spark), threshold=0.7).collect()
    }
    assert pairs.get((1, 2)) == 0.0          # exact dup: jaccard distance 0
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup found
    assert all(k != (1, 4) for k in pairs)   # disjoint docs not paired


def test_simhash_deterministic_and_near(spark):
    out = add_simhash(_docs(spark), "tokens")
    vals = {r.doc_id: r.simhash for r in out.collect()}
    assert vals[1] == vals[2]  # identical token sets → identical simhash
    # near-dup hamming distance < disjoint hamming distance
    d = (
        out.alias("a")
        .join(out.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("ia"),
            F.col("b.doc_id").alias("ib"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("h"),
        )
    )
    dist = {(r.ia, r.ib): r.h for r in d.collect()}
    assert dist[(1, 2)] == 0
    assert dist[(1, 3)] < dist[(1, 4)]


def test_connected_components_known_graph(spark):
    from uni_mannheim_masters_thesis_spark.operators.dedup import (
        connected_components,
    )

    # path 1-2-3-4, separate pair 10-11, triangle 20-21-22
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {r["node"]: r["cluster"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_minhash_banded_pairs_exact_jaccard(spark):
    from uni_mannheim_masters_thesis_spark.operators.dedup import (
        minhash_banded_pairs,
    )

    pairs = {
        (r.id_a, r.id_b): r.jaccard_dist
        for r in minhash_banded_pairs(_docs(spark), threshold=0.7).collect()
    }
    # emitted distances are EXACT Jaccard, not minhash estimates
    assert pairs.get((1, 2)) == 0.0
    # docs 1 and 3 share 4 of 6 distinct tokens: dist = 1 - 4/6
    if (1, 3) in pairs:
        assert abs(pairs[(1, 3)] - (1 - 4 / 6)) < 1e-6
    assert all(k != (1, 4) for k in pairs)  # disjoint docs never verified in


def test_minhash_banded_pairs_deterministic(spark):
    from uni_mannheim_masters_thesis_spark.operators.dedup import (
        minhash_banded_pairs,
    )

    a = sorted(map(tuple, minhash_banded_pairs(_docs(spark)).collect()))
    b = sorted(map(tuple, minhash_banded_pairs(_docs(spark)).collect()))
    assert a == b  # md5 hash family: no seed, no run-to-run variance


def test_portable_simhash_matches_reference_computation(spark):
    import hashlib

    from uni_mannheim_masters_thesis_spark.operators.dedup import (
        add_simhash,
        portable_hash60,
    )

    tokens = ["spark", "query", "engine"]
    df = spark.createDataFrame([(1, tokens)], ["doc_id", "tokens"])
    got = add_simhash(df, "tokens", hash_fn=portable_hash60, n_bits=60).first()[
        "simhash"
    ]
    # independent re-computation of the same spec in plain python
    hs = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in tokens]
    expect = 0
    for i in range(60):
        votes = sum(1 if (h >> i) & 1 else -1 for h in hs)
        if votes > 0:
            expect |= 1 << i
    assert got == expect


def test_paragraph_dedup_known_corpus(spark, tmp_path):
    """Two docs sharing an identical 20-token block: the later occurrence
    is dropped, unique blocks survive, reassembly preserves block order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from uni_mannheim_masters_thesis_spark.plans.registry import REGISTRY

    shared = " ".join(f"w{i}" for i in range(20))          # one full block
    uniq_a = " ".join(f"a{i}" for i in range(20))
    uniq_b = " ".join(f"b{i}" for i in range(20))
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": [shared + " " + uniq_a, shared + " " + uniq_b],
            "lang": ["en", "en"],
            "source": ["s1", "s1"],
            "n_chars": pa.array([0, 0], type=pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r
        for r in REGISTRY["paragraph_dedup"].fn(spark, str(tmp_path)).collect()
    }
    assert out[1]["blocks_total"] == 2 and out[1]["blocks_kept"] == 2
    # doc 2's first block is a corpus-level dup of doc 1's first block
    assert out[2]["blocks_total"] == 2 and out[2]["blocks_kept"] == 1
    import hashlib

    assert out[1]["dedup_fingerprint"] == hashlib.md5(
        (shared + " " + uniq_a).encode()
    ).hexdigest()
    assert out[2]["dedup_fingerprint"] == hashlib.md5(uniq_b.encode()).hexdigest()


def test_heavy_hitters_cms_contracts(spark):
    """CMS invariants hold on real testdata: estimates never undercount
    and stay inside the 1%-of-mass bound; ranks are 1..10 by count."""
    from uni_mannheim_masters_thesis_spark.plans.registry import REGISTRY

    rows = (
        REGISTRY["heavy_hitters_sketch"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert len(rows) == 10
    assert [r["rank"] for r in rows] == list(range(1, 11))
    counts = [r["n_events"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["ok_cms_ge_exact"] for r in rows)
    assert all(r["ok_cms_within_eps"] for r in rows)
