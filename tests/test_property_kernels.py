"""Property tests for the round-10 exact kernels: Hamilton
apportionment (hypothesis) and the CDC chunker on arbitrary BINARY
payloads (seeded random bytes, full 0-255 range — the existing golden
only exercises ASCII document text)."""

from __future__ import annotations

import hashlib
import random

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from uni_mannheim_masters_thesis_spark.functions.apportion import (
    hamilton_apportion,
)


@settings(max_examples=300, deadline=None)
@given(
    weights=st.dictionaries(
        st.text(alphabet="abcdefgh", min_size=1, max_size=4),
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=30,
    ),
    budget=st.integers(min_value=0, max_value=100_000),
)
def test_hamilton_sums_exactly_and_stays_within_one_of_exact_share(
    weights, budget
):
    sw = sum(weights.values())
    if sw == 0:
        return
    out = hamilton_apportion(weights, budget)
    assert sum(out.values()) == budget          # the whole point
    for k, w in weights.items():
        base = (budget * w) // sw
        assert out[k] in (base, base + 1), (k, w, budget, sw)
    # deterministic
    assert out == hamilton_apportion(dict(reversed(list(weights.items()))), budget)


def test_hamilton_zero_weight_parties_only_topped_up_never_floored():
    out = hamilton_apportion({"a": 0, "b": 1}, 5)
    assert out == {"a": 0, "b": 5}


# -- CDC chunker on arbitrary bytes -------------------------------------------


def _py_chunks(payload: bytes, window: int = 6, divisor: int = 19):
    """Same reference loop as tests/test_round9_ops.py."""
    n = len(payload)
    bpos = [
        i
        for i in range(window, n + 1)
        if int.from_bytes(payload[i - window:i], "big") % divisor == 0
    ]
    ends = bpos if (bpos and bpos[-1] == n) else bpos + [n]
    starts = [1] + [e + 1 for e in ends[:-1]]
    return [
        hashlib.md5(payload[s - 1:e]).hexdigest()
        for s, e in zip(starts, ends)
    ]


def test_cdc_engine_matches_reference_on_random_binary(spark):
    """cdc_chunk_digests on 150 seeded random payloads covering the
    FULL byte range (zeros, high bytes, window-length edge cases) —
    one Spark job, element-wise equality with the hashlib loop."""
    from uni_mannheim_masters_thesis_spark.operators.binary_dedup import (
        cdc_chunk_digests,
    )

    rng = random.Random(1234)
    payloads = []
    for i in range(150):
        n = rng.choice([1, 2, 5, 6, 7, 8, 19, 37] + [rng.randint(9, 400)])
        payloads.append((i, bytes(rng.randrange(256) for _ in range(n))))
    # edge: runs of identical bytes (every window in the run hashes
    # identically -> all-or-nothing boundaries), and a zero payload
    payloads.append((150, b"\x00" * 64))
    payloads.append((151, b"\xabZ" * 40))
    df = spark.createDataFrame(payloads, "pid int, payload binary")
    rows = df.select(
        "pid", cdc_chunk_digests(F.col("payload")).alias("chunks")
    ).collect()
    got = {r["pid"]: r["chunks"] for r in rows}
    by_pid = dict(payloads)
    assert len(got) == len(payloads)
    for pid, payload in payloads:
        assert got[pid] == _py_chunks(payload), (pid, payload[:20])


def test_cdc_chunks_partition_the_payload():
    """Reference-loop invariant on random bytes: chunk boundaries are
    strictly increasing and chunks exactly tile the payload."""
    rng = random.Random(99)
    for _ in range(300):
        n = rng.randint(0, 200)
        payload = bytes(rng.randrange(256) for _ in range(n))
        if not payload:
            continue
        W, D = 6, 19
        bpos = [
            i
            for i in range(W, n + 1)
            if int.from_bytes(payload[i - W:i], "big") % D == 0
        ]
        ends = bpos if (bpos and bpos[-1] == n) else bpos + [n]
        assert all(a < b for a, b in zip(ends, ends[1:]))
        assert ends[-1] == n
        starts = [1] + [e + 1 for e in ends[:-1]]
        rebuilt = b"".join(payload[s - 1:e] for s, e in zip(starts, ends))
        assert rebuilt == payload


def test_ordered_prefix_sum_matches_sequential_reference(spark):
    """Randomized differential: ordered_prefix_sum (two-phase range
    partition + per-partition window + driver-cumulated offsets) must
    EQUAL the sequential exclusive prefix sum for every key, including
    hostile shapes: duplicate values, zeros, negatives, single rows,
    and key counts straddling the partition count (so some range
    partitions are empty or hold one row)."""
    import random

    from uni_mannheim_masters_thesis_spark.operators.indexing import (
        ordered_prefix_sum,
    )

    rng = random.Random(7)
    for n, n_parts in [(1, 8), (5, 8), (37, 8), (200, 8), (64, 64)]:
        keys = rng.sample(range(10_000), n)
        rows = [
            (k, rng.randint(-50, 50), rng.randint(0, 9)) for k in keys
        ]
        df = spark.createDataFrame(rows, "k long, a long, b long")
        out = {
            r["k"]: (r["ps_a"], r["ps_b"])
            for r in ordered_prefix_sum(
                df, "k", ["a", "b"], n_parts=n_parts
            ).collect()
        }
        acc_a = acc_b = 0
        for k, a, b in sorted(rows):
            assert out[k] == (acc_a, acc_b), (n, n_parts, k)
            acc_a += a
            acc_b += b


def test_ordered_prefix_sum_rejects_null_and_duplicate_keys(spark):
    """The kernel's contract (unique non-null total order) is enforced,
    not advisory: duplicate keys make the row-based window disagree
    with strictly-smaller-key semantics, NULL keys range-partition
    unpredictably — both must raise before a wrong prefix escapes."""
    import pytest

    from uni_mannheim_masters_thesis_spark.operators.indexing import (
        ordered_prefix_sum,
    )

    dup = spark.createDataFrame(
        [(1, 10), (2, 20), (2, 30)], "k long, a long"
    )
    with pytest.raises(ValueError, match="duplicate"):
        ordered_prefix_sum(dup, "k", ["a"], n_parts=4)
    nul = spark.createDataFrame(
        [(1, 10), (None, 20), (3, 30)], "k long, a long"
    )
    with pytest.raises(ValueError, match="NULL"):
        ordered_prefix_sum(nul, "k", ["a"], n_parts=4)


def test_cusum_reflection_identity_matches_recursion():
    """The identity cusum_changepoint relies on: for any real sequence
    d_i, the recursion S_i = max(0, S_{i-1} + d_i) equals
    P_i - min(0, min_{j<=i} P_j) where P is the prefix sum of d. The
    query distributes the right-hand side (two stacked windows); this
    pins the algebra on random sequences including all-negative,
    all-positive, and alternating-sign shapes."""
    import random

    rng = random.Random(1234)
    cases = [[rng.uniform(-5, 5) for _ in range(rng.randint(1, 200))]
             for _ in range(200)]
    cases += [[-1.0] * 50, [1.0] * 50, [(-1.0) ** i * 3 for i in range(99)]]
    for ds in cases:
        s = 0.0
        p = 0.0
        min_p = 0.0  # min over an EMPTY prefix is capped at 0 by min(0, .)
        for d in ds:
            s = max(0.0, s + d)
            p += d
            min_p = min(min_p, p)
            rhs = p - min(0.0, min_p)
            assert abs(s - rhs) < 1e-9, (ds[:5], s, rhs)
