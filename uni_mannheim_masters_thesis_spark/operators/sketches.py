"""Count-min sketch as plain DataFrame aggregations (SURVEY §2.11
sketches; no reference analogue — the reference never needs
approximate counting at its scale, this is the 100 TB path).

A CMS is depth hash rows x width buckets of commutative counter sums,
so it is expressible as ``explode(bucket coordinates) -> groupBy ->
count`` with nothing custom: the counter table is partition-order
invariant (sums commute), mergeable (map-side combine), bounded at
``depth * width`` rows regardless of input size, and works identically
over a batch DataFrame and a Structured Streaming one (a streaming
groupBy over bucket coordinates keeps state bounded at depth*width —
input-volume- AND key-cardinality-independent).

Estimates come from joining candidate keys' bucket coordinates back
against the counter table and taking ``min`` over the depth rows —
never collecting the sketch to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 5
CMS_WIDTH = 2048


def cms_buckets(col: Column, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> Column:
    """Array of (hash_index, bucket) coordinates for one key value —
    ``depth`` independent seeded xxhash64 functions mod ``width``."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("hi"),
                F.pmod(F.xxhash64(col, F.lit(i)), F.lit(width)).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cms_counter_table(
    df: DataFrame, key: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """The CMS counter relation [hi, bucket, c] for ``df[key]`` —
    works unchanged on batch and streaming DataFrames."""
    return (
        df.select(F.explode(cms_buckets(F.col(key), depth, width)).alias("s"))
        .select("s.hi", "s.bucket")
        .groupBy("hi", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimates(
    candidates: DataFrame,
    counters: DataFrame,
    key: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query the sketch for each candidate key: join the
    candidates' bucket coordinates against the counter table, estimate
    = min counter over the depth rows. Returns [<key>, est]."""
    return (
        candidates.select(key, F.explode(cms_buckets(F.col(key), depth, width)).alias("s"))
        .select(key, "s.hi", "s.bucket")
        .join(counters, ["hi", "bucket"])
        .groupBy(key)
        .agg(F.min("c").alias("est"))
    )


# -- Bloom filter (semi-join pruning) ---------------------------------------

BLOOM_BITS = 1 << 16   # m: filter size in bits — 8 KB, cardinality-free
BLOOM_WORDS = BLOOM_BITS // 64
BLOOM_K = 5            # probes per key


def _bloom_positions(col: Column, k: int, m: int) -> list[Column]:
    """k independent bit positions for one key — seeded xxhash64 mod m
    (the same seeding discipline as ``cms_buckets``)."""
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m)) for i in range(k)
    ]


BLOOM_BITS_PER_KEY = 16  # auto-sizing target: fpr ≈ 0.1% at k=5


def bloom_size_bits(n_keys: int, bits_per_key: int = BLOOM_BITS_PER_KEY) -> int:
    """Filter size for ``n_keys`` build-side keys: the next power of
    two ≥ ``bits_per_key * n_keys`` (floor BLOOM_BITS). A fixed m
    saturates — above ~m/bits_per_key keys the fill factor approaches
    1 and the probe passes everything, silently erasing the pruning —
    so the size must track build cardinality."""
    m = BLOOM_BITS
    target = max(1, int(n_keys)) * bits_per_key
    while m < target:
        m <<= 1
    return m


def bloom_build(
    df: DataFrame, key: str, k: int = BLOOM_K, m: int | None = None
) -> list[int]:
    """Build the filter DISTRIBUTED: every key maps to k bit positions,
    positions fold to packed 64-bit words via a bit_or aggregate (a
    commutative monoid — map-side combined, any partitioning), and only
    the ≤ m/64 word rows reach the driver. With ``m=None`` the filter
    is auto-sized from ``approx_count_distinct`` of the build side
    (~16 bits/key, next power of two), so a 100M-key build side that
    could never broadcast as a hash relation still yields a ~200 MB
    plan-constant filter with a useful false-positive rate — a fixed m
    would saturate (fill → 1) and prune nothing at that scale."""
    if m is None:
        n = df.agg(
            F.approx_count_distinct(key).alias("n")
        ).first()["n"]
        m = bloom_size_bits(n)
    rows = (
        df.select(
            F.explode(
                F.array(*_bloom_positions(F.col(key), k, m))
            ).alias("p")
        )
        .select(
            F.floor(F.col("p") / 64).cast("int").alias("w"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.pmod(F.col("p"), F.lit(64)).cast("int"),
            ).alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    words = [0] * (m // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_fill_factor(words: list[int]) -> float:
    """Fraction of set bits — the saturation gauge. Near 1.0 the probe
    passes everything and the pruning has silently vanished; logged by
    callers so saturation shows up in scale evidence, not just in a
    mysteriously large shuffle."""
    m = len(words) * 64
    return sum(bin(w & 0xFFFFFFFFFFFFFFFF).count("1") for w in words) / m


def bloom_might_contain(
    col: Column, words: list[int], k: int = BLOOM_K, m: int | None = None
) -> Column:
    """Probe predicate: true iff all k bits for ``col`` are set
    (``m`` defaults to the size the word list implies). The
    filter rides the plan as an array literal (words are plan
    constants, shipped once per task with the serialized plan), so the
    probe is a pure JVM row-local expression — no join, no exchange,
    whole-stage-codegen friendly. False positives possible (the exact
    join behind it removes them), false negatives impossible."""
    if m is None:
        m = len(words) * 64
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    cond = F.lit(True)
    for p in _bloom_positions(col, k, m):
        word = F.element_at(arr, (F.floor(p / 64) + 1).cast("int"))
        bit = F.pmod(p, F.lit(64)).cast("int")
        cond = cond & (
            F.call_function("shiftright", word, bit)
            .bitwiseAND(F.lit(1)) == 1
        )
    return cond
