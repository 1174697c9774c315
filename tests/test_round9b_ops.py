"""Round-9 session-2 operator semantics: Markov transition matrix,
distribution drift (PSI/JSD/KS), RFM segmentation, market-basket
mining, chi-square independence, Benford audit, PMI collocations,
Heaps vocabulary growth, and A-ES weighted sampling."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from conftest import SF_DIR
from uni_mannheim_masters_thesis_spark.plans.registry import REGISTRY


def _run(spark, name):
    return REGISTRY[name].fn(spark, SF_DIR)


def _plan(spark, name) -> str:
    je = _run(spark, name)._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return je.explainString(mode)


# -- markov_transitions -------------------------------------------------------

def test_markov_rows_are_row_stochastic(spark):
    rows = _run(spark, "markov_transitions").collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.prob
        assert 0.0 <= r.prob <= 1.0
    for prev, total in by_prev.items():
        assert abs(total - 1.0) < 1e-4, (prev, total)


def test_markov_counts_match_manual_lag(spark):
    rows = _run(spark, "markov_transitions").collect()
    n_trans = sum(r.n_trans for r in rows)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # every event except each user's first contributes one transition
    assert n_trans == n_events - n_users


# -- distribution_drift_report ------------------------------------------------

def test_drift_stats_nonnegative_and_bounded(spark):
    r = _run(spark, "distribution_drift_report").collect()[0]
    assert r.n_ref > 0 and r.n_cur > 0
    assert r.psi >= 0.0  # PSI is a symmetrized KL — nonnegative
    assert 0.0 <= r.jsd <= math.log(2.0) + 1e-9
    assert 0.0 <= r.ks_binned <= 1.0


def test_drift_self_comparison_is_zero(spark, tmp_path):
    """Same population on both arms => all three stats collapse to 0."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    pur = ev.filter(F.col("event_type") == "purchase")
    fake = pur.withColumn("event_type", F.lit("click"))
    pur.unionByName(fake).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    r = REGISTRY["distribution_drift_report"].fn(spark, str(tmp_path)).collect()[0]
    assert r.n_ref == r.n_cur
    assert r.psi == 0.0 and r.jsd == 0.0 and r.ks_binned == 0.0


# -- rfm_segments -------------------------------------------------------------

def test_rfm_scores_partition_customers_into_quintiles(spark):
    rows = _run(spark, "rfm_segments").collect()
    assert all(1 <= r.r_score <= 5 for r in rows)
    assert all(1 <= r.f_score <= 5 for r in rows)
    assert all(1 <= r.m_score <= 5 for r in rows)
    total = sum(r.n_customers for r in rows)
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert total == orders.select("o_custkey").distinct().count()
    # quintile marginals: each R score holds ~n/5 customers (exact
    # within 1 by the floor formula)
    per_r: dict[int, int] = {}
    for r in rows:
        per_r[r.r_score] = per_r.get(r.r_score, 0) + r.n_customers
    lo, hi = min(per_r.values()), max(per_r.values())
    assert hi - lo <= 1


def test_rfm_m5_outspends_m1(spark):
    rows = _run(spark, "rfm_segments").collect()
    m5 = [r for r in rows if r.m_score == 5]
    m1 = [r for r in rows if r.m_score == 1]
    avg5 = sum(r.avg_monetary * r.n_customers for r in m5) / sum(
        r.n_customers for r in m5
    )
    avg1 = sum(r.avg_monetary * r.n_customers for r in m1) / sum(
        r.n_customers for r in m1
    )
    assert avg5 > avg1


# -- market_basket_pairs ------------------------------------------------------

def test_basket_pairs_ordered_and_support_consistent(spark):
    rows = _run(spark, "market_basket_pairs").collect()
    assert rows, "min-support threshold pruned everything"
    for r in rows:
        assert r.brand_a < r.brand_b
        assert r.support > 0 and r.confidence > 0 and r.lift > 0
        assert r.confidence >= r.support - 1e-9  # n_ab/n_a >= n_ab/N


def test_basket_pair_generation_is_not_a_self_join(spark):
    plan = _plan(spark, "market_basket_pairs")
    # the part dim joins broadcast; pair expansion happens in-row
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# -- chi_square_independence --------------------------------------------------

def test_chi2_matches_scipy_free_reference(spark):
    r = _run(spark, "chi_square_independence").collect()[0]
    assert r.dof == 16  # 5 segments x 5 priorities
    assert r.chi2 >= 0.0
    assert 0.0 <= r.cramers_v <= 1.0
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    assert r.n == orders.count()


# -- benford_digit_audit ------------------------------------------------------

def test_benford_shares_sum_to_one(spark):
    rows = _run(spark, "benford_digit_audit").collect()
    assert {r.digit for r in rows} <= set(range(1, 10))
    assert abs(sum(r.obs_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        expected = math.log10(1 + 1 / r.digit)
        assert abs(r.benford_share - expected) < 1e-6
        assert abs(r.deviation - (r.obs_share - r.benford_share)) < 1e-5


# -- pmi_collocations ---------------------------------------------------------

def test_pmi_collocations_respect_min_count_and_order(spark):
    rows = _run(spark, "pmi_collocations").collect()
    assert len(rows) <= 20
    assert all(r.n_ab >= 5 for r in rows)
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_pmi_value_matches_manual_count(spark):
    rows = _run(spark, "pmi_collocations").collect()
    if not rows:
        pytest.skip("corpus too small for min-count-5 bigrams")
    top = rows[0]
    from uni_mannheim_masters_thesis_spark.functions.text import tokens_pipeline

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.select(tokens_pipeline(F.col("text")).alias("t"))
    uni = toks.select(F.explode("t").alias("w"))
    tu = uni.count()
    ca = uni.filter(F.col("w") == top.w1).count()
    cb = uni.filter(F.col("w") == top.w2).count()
    sz = F.size("t")
    bi = toks.filter(sz >= 2).select(
        F.explode(
            F.zip_with(
                F.slice("t", F.lit(1), sz - 1),
                F.slice("t", F.lit(2), sz - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p")
    )
    tb = bi.count()
    cab = bi.filter(
        (F.col("p.w1") == top.w1) & (F.col("p.w2") == top.w2)
    ).count()
    manual = math.log((cab / tb) / ((ca / tu) * (cb / tu)))
    assert abs(manual - top.pmi) < 1e-5


# -- heaps_vocab_growth -------------------------------------------------------

def test_heaps_curve_is_monotone(spark):
    rows = sorted(_run(spark, "heaps_vocab_growth").collect(), key=lambda r: r.cutoff)
    assert len(rows) == 4
    for a, b in zip(rows, rows[1:]):
        assert a.n_docs <= b.n_docs
        assert a.n_tokens <= b.n_tokens
        assert a.vocab <= b.vocab
    full = rows[-1]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert full.n_docs == docs.count()
    # sublinear growth: TTR falls as the corpus grows (Heaps beta < 1)
    assert rows[-1].type_token_ratio <= rows[0].type_token_ratio + 1e-9


# -- weighted_sample_aes ------------------------------------------------------

def test_aes_sample_is_deterministic_and_sized(spark):
    a = {r.doc_id for r in _run(spark, "weighted_sample_aes").collect()}
    b = {r.doc_id for r in _run(spark, "weighted_sample_aes").collect()}
    assert a == b
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert len(a) == min(100, docs.count())


def test_aes_sample_favors_heavy_documents(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    if n <= 100:
        pytest.skip("sample is the whole corpus at this sf")
    sampled = {r.doc_id for r in _run(spark, "weighted_sample_aes").collect()}
    rows = docs.select("doc_id", "n_chars").collect()
    in_w = [r.n_chars for r in rows if r.doc_id in sampled]
    out_w = [r.n_chars for r in rows if r.doc_id not in sampled]
    assert sum(in_w) / len(in_w) > sum(out_w) / len(out_w)


def test_aes_topk_plans_as_take_ordered(spark):
    plan = _plan(spark, "weighted_sample_aes")
    assert "TakeOrderedAndProject" in plan
    assert "WindowExec" not in plan


# -- zipf_law_fit -------------------------------------------------------------

def test_zipf_slope_is_negative_with_good_fit(spark):
    r = _run(spark, "zipf_law_fit").collect()[0]
    assert r.n_terms > 0
    assert r.zipf_slope < 0  # frequency falls with rank
    assert 0.0 <= r.r_squared <= 1.0


def test_zipf_slope_matches_numpy_polyfit(spark):
    import numpy as np

    from uni_mannheim_masters_thesis_spark.functions.text import (
        tokens_pipeline,
    )

    r = _run(spark, "zipf_law_fit").collect()[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = docs.select(F.explode(tokens_pipeline(F.col("text"))).alias("w"))
    counts = sorted(
        ((row.w, row.c) for row in
         toks.groupBy("w").agg(F.count(F.lit(1)).alias("c")).collect()),
        key=lambda t: (-t[1], t[0]),
    )[:500]
    x = np.log(np.arange(1, len(counts) + 1))
    y = np.log(np.array([c for _, c in counts], dtype=float))
    slope, _ = np.polyfit(x, y, 1)
    assert abs(slope - r.zipf_slope) < 1e-4  # 1e-9 quantization slack


# -- gini_concentration -------------------------------------------------------

def test_gini_matches_brute_force(spark):
    r = _run(spark, "gini_concentration").collect()[0]
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    spend = sorted(
        row.s
        for row in orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
        .collect()
    )
    n = len(spend)
    sx = sum(spend)
    swx = sum((i + 1) * v for i, v in enumerate(spend))
    gini = (2 * swx - (n + 1) * sx) / (n * sx)
    assert r.n_customers == n
    assert abs(r.gini - gini) < 1e-4
    assert 0.0 <= r.gini <= 1.0
    assert 0.1 - 1e-9 <= r.top_decile_share <= 1.0  # top 10% hold >= 10%


# -- revenue_yoy_growth -------------------------------------------------------

def test_yoy_growth_arithmetic_and_first_year_null(spark):
    rows = _run(spark, "revenue_yoy_growth").collect()
    by_nation: dict[str, list] = {}
    for r in rows:
        by_nation.setdefault(r.nation, []).append(r)
    for nation, rs in by_nation.items():
        rs.sort(key=lambda r: r.year)
        assert rs[0].prev_revenue is None and rs[0].yoy_growth is None
        for prev, cur in zip(rs, rs[1:]):
            assert cur.prev_revenue == prev.revenue
            expected = (cur.revenue - prev.revenue) / prev.revenue
            assert abs(cur.yoy_growth - expected) < 1e-5


def test_yoy_window_runs_on_cells_not_facts(spark):
    plan = _plan(spark, "revenue_yoy_growth")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# -- streaming_drift_monitor --------------------------------------------------

def test_streaming_drift_one_row_per_day_and_counts(spark):
    rows = _run(spark, "streaming_drift_monitor").collect()
    assert rows
    days = [r.day_start_us for r in rows]
    assert len(days) == len(set(days))
    for r in rows:
        assert r.day_start_us % 86_400_000_000 == 0  # epoch-aligned days
        assert r.n_cur > 0
        assert r.psi >= 0.0
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_clicks = ev.filter(F.col("event_type") == "click").count()
    assert sum(r.n_cur for r in rows) == n_clicks


# -- seasonal_anomaly_report --------------------------------------------------

def test_seasonal_anomaly_covers_dense_grid(spark):
    rows = _run(spark, "seasonal_anomaly_report").collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_types = ev.select("event_type").distinct().count()
    assert len(rows) == n_types
    cells = {r.n_cells for r in rows}
    assert len(cells) == 1  # every type scores the same dense spine
    for r in rows:
        assert 0 <= r.n_anomalies <= r.n_cells
        assert r.max_abs_z >= 0.0


def test_seasonal_anomaly_flags_injected_spike(spark, tmp_path):
    """Cloning one hour's purchases 30x must flag at least one
    anomalous cell for that type."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    base = _run(spark, "seasonal_anomaly_report").collect()
    base_anoms = {r.event_type: r.n_anomalies for r in base}
    one_hour = (
        ev.filter(F.col("event_type") == "purchase")
        .orderBy("ts")
        .limit(20)
    )
    spiked = ev.unionByName(one_hour)
    for _ in range(4):
        spiked = spiked.unionByName(one_hour)
    spiked.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    rows = REGISTRY["seasonal_anomaly_report"].fn(spark, str(tmp_path)).collect()
    spiked_purchase = [r for r in rows if r.event_type == "purchase"][0]
    assert spiked_purchase.n_anomalies >= max(1, base_anoms.get("purchase", 0))


# -- winsorized_stats ---------------------------------------------------------

def test_winsorized_std_not_above_raw_std(spark):
    rows = _run(spark, "winsorized_stats").collect()
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    import statistics

    raw = {}
    for r in cust.select("c_mktsegment", "c_acctbal").collect():
        raw.setdefault(r.c_mktsegment, []).append(r.c_acctbal)
    for r in rows:
        vals = raw[r.segment]
        assert r.n_rows == len(vals)
        assert r.n_clipped_lo + r.n_clipped_hi <= len(vals)
        if len(vals) > 1:
            assert r.w_std <= statistics.stdev(vals) + 1e-6
            assert min(vals) - 1e-6 <= r.w_mean <= max(vals) + 1e-6


# -- conversion_lag_percentiles -----------------------------------------------

def test_conversion_lag_ordering_and_bounds(spark):
    r = _run(spark, "conversion_lag_percentiles").collect()[0]
    assert r.n_converted > 0
    assert 0 < r.p50_sec <= r.p90_sec <= r.max_sec
    assert 0 < r.mean_sec <= r.max_sec


def test_conversion_lag_matches_manual(spark):
    r = _run(spark, "conversion_lag_percentiles").collect()[0]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    first_view: dict[int, int] = {}
    for e in sorted(ev, key=lambda e: e.ts):
        if e.event_type == "view" and e.user_id not in first_view:
            first_view[e.user_id] = e.ts
    lags = {}
    for e in sorted(ev, key=lambda e: e.ts):
        if (
            e.event_type == "purchase"
            and e.user_id in first_view
            and e.ts > first_view[e.user_id]
            and e.user_id not in lags
        ):
            lags[e.user_id] = (
                e.ts - first_view[e.user_id]
            ).total_seconds()
    assert r.n_converted == len(lags)
    assert abs(r.max_sec - max(lags.values())) < 0.01


# -- bootstrap_mean_ci --------------------------------------------------------

def test_bootstrap_ci_brackets_point_estimate(spark):
    rows = _run(spark, "bootstrap_mean_ci").collect()
    assert rows
    for r in rows:
        assert r.boot_lo <= r.mean_value <= r.boot_hi
        # CI should be tight around the mean at n ~ thousands, and
        # never degenerate
        assert r.boot_hi > r.boot_lo
        width = r.boot_hi - r.boot_lo
        assert width < abs(r.mean_value) + 1.0


def test_bootstrap_is_deterministic(spark):
    a = sorted(map(tuple, _run(spark, "bootstrap_mean_ci").collect()))
    b = sorted(map(tuple, _run(spark, "bootstrap_mean_ci").collect()))
    assert a == b


# -- retrieval_metrics_ndcg ---------------------------------------------------

def test_retrieval_metrics_in_valid_ranges(spark):
    rows = _run(spark, "retrieval_metrics_ndcg").collect()
    assert rows
    for r in rows:
        assert r.n_matched > 0
        assert 0.0 <= r.ndcg10 <= 1.0
        assert 0.0 <= r.mrr <= 1.0
        assert 0.0 <= r.p_at_10 <= 1.0


def test_ndcg_is_one_when_ranking_matches_gain_order(spark):
    """If BM25 happened to rank exactly by tf, ndcg10 would be 1; in
    general it is <= 1 and equals DCG/IDCG computed by hand."""
    import math

    rows = {r.term: r for r in _run(spark, "retrieval_metrics_ndcg").collect()}
    from uni_mannheim_masters_thesis_spark.functions.text import tokenize

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    tok = docs.select("doc_id", tokenize(F.col("text")).alias("tk"))
    pairs = (
        tok.select("doc_id", F.explode("tk").alias("term"))
        .filter(F.col("term") == "spark")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
        .collect()
    )
    if "spark" not in rows or not pairs:
        pytest.skip("no 'spark' matches at this sf")
    gains = sorted((p.tf for p in pairs), reverse=True)[:10]
    idcg = sum(g / math.log2(i + 2) for i, g in enumerate(gains))
    assert idcg > 0
    assert rows["spark"].ndcg10 <= 1.0 + 1e-9


# -- ab_test_welch ------------------------------------------------------------

def test_welch_matches_textbook_formula(spark):
    import statistics

    r = _run(spark, "ab_test_welch").collect()[0]
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").collect()
    a = [e.value for e in ev if e.event_type == "purchase"]
    b = [e.value for e in ev if e.event_type == "click"]
    assert (r.n_a, r.n_b) == (len(a), len(b))
    va, vb = statistics.variance(a), statistics.variance(b)
    ma, mb = statistics.fmean(a), statistics.fmean(b)
    t = (ma - mb) / (va / len(a) + vb / len(b)) ** 0.5
    assert abs(r.mean_diff - (ma - mb)) < 1e-4
    assert abs(r.t_stat - t) < 1e-3
    assert r.welch_dof > min(len(a), len(b)) / 2  # sane dof magnitude


# -- label_centroid_similarity ------------------------------------------------

def test_centroid_cosine_matches_numpy(spark):
    import numpy as np

    rows = _run(spark, "label_centroid_similarity").collect()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    by_label: dict[int, list] = {}
    for e in emb:
        by_label.setdefault(e.label, []).append(np.array(e.embedding))
    cents = {l: np.mean(v, axis=0) for l, v in by_label.items()}
    n_labels = len(cents)
    assert len(rows) == n_labels * (n_labels - 1) // 2
    for r in rows:
        assert r.label_a < r.label_b
        a, b = cents[r.label_a], cents[r.label_b]
        ref = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(r.centroid_cosine - ref) < 1e-4  # 1e-7 quantization
        assert -1.0 - 1e-9 <= r.centroid_cosine <= 1.0 + 1e-9


# -- share_of_parent_rollup ---------------------------------------------------

def test_share_of_parent_sums_to_one(spark):
    rows = _run(spark, "share_of_parent_rollup").collect()
    by_region: dict[str, list] = {}
    for r in rows:
        by_region.setdefault(r.region, []).append(r)
    region_pcts = {}
    for region, rs in by_region.items():
        assert abs(sum(r.pct_of_region for r in rs) - 1.0) < 1e-3
        assert len({r.region_revenue for r in rs}) == 1
        assert abs(sum(x.revenue for x in rs) - rs[0].region_revenue) < 0.1
        region_pcts[region] = rs[0].region_pct_of_total
    assert abs(sum(region_pcts.values()) - 1.0) < 1e-3


# -- scd2_point_in_time_join --------------------------------------------------

def test_pit_join_covers_purchases_after_first_state(spark):
    rows = _run(spark, "scd2_point_in_time_join").collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    states = {r.state for r in rows}
    assert "purchase" not in states  # facts never join to themselves


def test_pit_join_matches_manual_replay(spark):
    rows = {r.state: r.n_purchases for r in
            _run(spark, "scd2_point_in_time_join").collect()}
    ev = sorted(
        spark.read.parquet(f"{SF_DIR}/events.parquet").collect(),
        key=lambda e: (e.ts, e.event_id),
    )
    state: dict[int, str] = {}
    manual: dict[str, int] = {}
    for e in ev:
        if e.event_type == "purchase":
            s = state.get(e.user_id)
            if s is not None:
                manual[s] = manual.get(s, 0) + 1
        else:
            state[e.user_id] = e.event_type
    assert manual == rows


# -- multimodal_container_parse -----------------------------------------------

def test_container_roundtrip_is_lossless(spark):
    rows = _run(spark, "multimodal_container_parse").collect()
    assert rows
    total = sum(r.n_docs for r in rows)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert total == docs.count()
    for r in rows:
        assert r.n_magic_ok == r.n_docs
        assert r.n_dims_ok == r.n_docs
        assert r.n_payload_intact == r.n_docs
        # parsed u16 dims stay in the stub's contract range
        assert 64 * r.n_docs <= r.sum_width <= 255 * r.n_docs
        assert 64 * r.n_docs <= r.sum_height <= 255 * r.n_docs


def test_container_header_matches_decode_stub(spark):
    """The packed width/height must equal the decode stub's metadata
    (same digest-derived contract)."""
    import hashlib

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20).collect()
    from uni_mannheim_masters_thesis_spark.operators.multimodal import (
        _decode_stub,
    )

    for d in docs:
        w, h, _ = _decode_stub(d.text.encode("utf-8"))
        digest = hashlib.sha256(d.text.encode("utf-8")).hexdigest()
        assert w == 64 + int(digest[0:2], 16) % 192
        assert h == 64 + int(digest[2:4], 16) % 192


# -- sole_blame_suppliers -----------------------------------------------------

def test_sole_blame_matches_bruteforce(spark):
    rows = {r.supplier: r.n_orders for r in
            _run(spark, "sole_blame_suppliers").collect()}
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").collect()
    supp = {
        s.s_suppkey: s.s_name
        for s in spark.read.parquet(f"{SF_DIR}/supplier.parquet").collect()
    }
    orders: dict[int, dict] = {}
    for l in li:
        o = orders.setdefault(l.l_orderkey, {"supps": set(), "r": set()})
        o["supps"].add(l.l_suppkey)
        if l.l_returnflag == "R":
            o["r"].add(l.l_suppkey)
    manual: dict[str, int] = {}
    for o in orders.values():
        if len(o["supps"]) > 1 and len(o["r"]) == 1:
            name = supp[next(iter(o["r"]))]
            manual[name] = manual.get(name, 0) + 1
    top = dict(sorted(manual.items(), key=lambda kv: (-kv[1], kv[0]))[:20])
    assert rows == top


# -- customer_order_histogram -------------------------------------------------

def test_q13_histogram_preserves_zero_bucket(spark):
    rows = {r.n_orders: r.n_customers for r in
            _run(spark, "customer_order_histogram").collect()}
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    n_cust = cust.count()
    assert sum(rows.values()) == n_cust  # every customer lands in a bucket
    with_orders = orders.select("o_custkey").distinct().count()
    assert rows.get(0, 0) == n_cust - with_orders  # zero bucket exact


# -- cumulative_unique_users --------------------------------------------------

def test_adoption_curve_is_monotone_and_exact_at_the_end(spark):
    rows = _run(spark, "cumulative_unique_users").collect()
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r.day_start_us)
        run = 0
        for r in rs:
            run += r.new_users
            assert r.cumulative_users == run  # cumsum consistency
        expect = (
            ev.filter(F.col("event_type") == et)
            .select("user_id")
            .distinct()
            .count()
        )
        assert rs[-1].cumulative_users == expect


# -- behavioral_topk_similarity -----------------------------------------------

def test_behavioral_topk_is_exact_within_blocks(spark):
    rows = _run(spark, "behavioral_topk_similarity").collect()
    for r in rows:
        assert r.user_a < r.user_b
        assert 0.0 <= r.cosine <= 1.0 + 1e-9  # count vectors: nonneg cos
    cosines = [r.cosine for r in rows]
    assert cosines == sorted(cosines, reverse=True)


def test_behavioral_block_join_is_not_cartesian(spark):
    je = _run(spark, "behavioral_topk_similarity")._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = je.explainString(mode)
    assert "CartesianProduct" not in plan


# -- replica_merkle_diff ------------------------------------------------------

def test_merkle_diff_flags_exactly_the_changed_buckets(spark):
    """v1 vs v3 of the lakehouse table: a bucket is in_sync iff its
    row set is IDENTICAL — cross-check against a direct row-level
    anti-join of the two time-travel snapshots."""
    from uni_mannheim_masters_thesis_spark.plans.q_lakehouse import (
        _lakehouse_table_dir,
    )
    from uni_mannheim_masters_thesis_spark.sources.lakehouse import (
        read_table,
    )

    rows = {r.bucket: r for r in _run(spark, "replica_merkle_diff").collect()}
    tdir = _lakehouse_table_dir(spark, SF_DIR)

    def snap(v):
        t = read_table(spark, tdir, version=v)
        return {
            ((r.user_id, r.last_event_type, round(r.last_value, 2)))
            for r in t.collect()
        }

    s1, s3 = snap(1), snap(3)
    changed_buckets = {
        k[0] % 16 for k in (s1 ^ s3)  # symmetric difference
    }
    for bucket, r in rows.items():
        assert bool(r.in_sync) == (bucket not in changed_buckets), bucket


# -- negative_sampling_table --------------------------------------------------

def test_negative_sampling_budget_is_exactly_apportioned(spark):
    """sum(draws) over the FULL table must equal the budget exactly —
    the whole point of largest-remainder rounding."""
    from uni_mannheim_masters_thesis_spark.plans.q_text import (
        q_negative_sampling_table,
        _NEG_BUDGET,
    )

    # rebuild without the top-50 LIMIT by summing the limited frame's
    # complement: run the registry fn on the small corpus where the
    # vocab fits inside the limit entirely
    rows = _run(spark, "negative_sampling_table").collect()
    docs_vocab_small = len(rows) < 50
    if docs_vocab_small:
        assert sum(r.draws for r in rows) == _NEG_BUDGET
    for r in rows:
        assert r.draws >= 0 and 0.0 <= r.p <= 1.0
    # draws ordering follows probability ordering
    draws = [r.draws for r in rows]
    assert draws == sorted(draws, reverse=True)


def test_negative_sampling_follows_power_law_weights(spark):
    rows = _run(spark, "negative_sampling_table").collect()
    # heavier terms draw more, and p matches c^0.75 normalization
    by_c = sorted(rows, key=lambda r: -r.c)
    total_w = sum(r.c ** 0.75 for r in rows)
    if len(rows) < 50:  # full vocab present
        top = by_c[0]
        assert abs(top.p - top.c ** 0.75 / total_w) < 1e-3
