"""Plan-doctor diagnostics: each anti-pattern triggers its code, and
the curated headline queries come back clean."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestors_spark.doctor import diagnose
from data_ingestors_spark.io.readers import load_table

SF = "/root/testdata/sf0.001"


def _codes(findings):
    return {f.split(" ")[0] for f in findings}


def test_cartesian_flagged_and_limit_clears_it(spark):
    a = spark.range(100)
    b = spark.range(100).select(F.col("id").alias("jd"))
    assert "D1" in _codes(diagnose(a.crossJoin(b)))
    assert "D1" not in _codes(diagnose(a.crossJoin(b).limit(10)))


def test_single_partition_exchange_flagged(spark):
    from pyspark.sql import Window

    # an UNPARTITIONED window funnels every row through one task;
    # a global orderBy does NOT (range partitioning stays parallel)
    w = Window.orderBy("o_totalprice")
    df = load_table(spark, SF, "orders").withColumn("rn", F.row_number().over(w))
    assert "D2" in _codes(diagnose(df))
    assert "D2" not in _codes(diagnose(load_table(spark, SF, "orders").orderBy("o_totalprice")))


def test_unpushed_filter_flagged(spark):
    ord_ = load_table(spark, SF, "orders")
    # cast wraps the column -> predicate cannot push to the scan
    wrapped = ord_.filter(F.col("o_orderkey").cast("string") == "1")
    assert "D3" in _codes(diagnose(wrapped))
    # raw comparison pushes -> clean
    clean = ord_.filter(F.col("o_orderkey") == 1)
    assert "D3" not in _codes(diagnose(clean))


def test_wide_scan_flagged(spark):
    li = load_table(spark, SF, "lineitem")
    wide = li.filter(F.col("l_quantity") > 0)  # no projection: all 16 cols read
    assert "D4" in _codes(diagnose(wide))
    narrow = li.select("l_orderkey", "l_quantity").filter(F.col("l_quantity") > 0)
    assert "D4" not in _codes(diagnose(narrow))


def test_headline_queries_clean(spark):
    from data_ingestors_spark.queries import all_queries

    q = all_queries()
    for name in ("pricing_summary", "revenue_by_nation", "topk_per_group", "asof_join"):
        findings = [f for f in diagnose(q[name](spark, SF)) if not f.startswith("D5")]
        assert not findings, (name, findings)


# Queries whose plan legitimately trips a doctor rule — each with the
# reason the hazard is bounded (doctor is a heuristic for USER queries;
# the library's own deliberate exceptions are documented here).
# r10: the D2 probe is now bounded to its own exchange's detail block,
# which resolved every documented "conjunction false-positive" (a
# benign 1-row scalar-agg SinglePartition elsewhere in the plan no
# longer satisfies a hash-partitioned window's match) — those twelve
# D2 exemptions and four stale D1s were removed after a full-registry
# re-audit; what remains below is measured, not historical.
_DOCTOR_EXEMPT: dict[str, tuple[str, ...]] = {
    # deliberate bounded cartesians: broadcast 1-row scalar frames /
    # broadcast-sized dims / fixed tiny query sets
    "cross_join": ("D1",),          # the cross-join operator itself (dim x dim)
    "scalar_subquery": ("D1",),     # 1-row aggregate cross join
    "funnel_analysis": ("D1",),     # 1x1 stage-count joins
    "range_join": ("D2",),          # r9 order-statistics band join: the
    #                                 cumulative window rides the acctbal
    #                                 VALUE-COUNT frame (2-decimal currency
    #                                 domain, NDV-bounded at any corpus size
    #                                 — the roc_auc pattern), plus supplier
    #                                 bound rows; never the fact table
    "embedding_topk": ("D1",),      # broadcast fixed query set
    "embedding_contamination": ("D1",),  # broadcast heldout split vs
    #                                 streamed train corpus (the test
    #                                 side is the SMALL benchmark
    #                                 suite at any corpus size —
    #                                 embedding_topk shape)
    "unigram_logprob": ("D1",),     # 1-row (n_tokens, n_vocab) scalar cross join
    "bigram_logprob": ("D1",),      # 1-row vocab-size scalar cross join
    "bm25_relevance": ("D1",),      # 1-row (n_docs, avgdl) scalar cross join
    "temperature_mix": ("D1",),     # 1-row scalar agg cross join
    "tfidf_topk": ("D1",),          # 1-row corpus-count scalar cross join
    "copurchase_pairs": ("D1",),  # 1-row n_orders scalar cross join onto top-20
    "assoc_rules": ("D1",),    # 1-row n_orders scalar cross join (same shape)
    "degree_assortativity": ("D1",),  # 1-row stats x 1-row node-count cross join
    "freshness_audit": ("D1",),  # 1-row anchor-ts scalar cross join
    "prefix_filter_join": ("D2",),  # the wid-dictionary window rides the VOCAB
    #                                 frame, bounded <= mask_vocab_limit (4096)
    #                                 by the stats gate — never the corpus
    "snm_linkage": ("D2",),         # the global sort rank IS the SNM algorithm;
    #                                 range-partition the sort at scale (docstring)
    # r8 additions — all deliberate bounded cross joins:
    "vocab_growth": ("D1",),        # broadcast 10-row checkpoint grid cross join
    "basket_size_distribution": ("D1",),  # 1-row order-total scalar cross join
    "kendall_tau": ("D1",),         # deliberate bounded sampled self-join
    #                                 (modulo-97 sample, O(m^2) by design) +
    #                                 1-row sample-size scalar cross join
    "levene_test": ("D1",),         # 1-row grand-totals scalar cross join
    "info_gain_screen": ("D1",),    # 1-row label-entropy / n scalar cross joins
    "customer_churn_flags": ("D1",),  # 1-row anchor-date scalar cross join
    "label_balance_audit": ("D1",),   # 1-row (total, max) scalar cross join
    "ngram_coverage_curve": ("D1", "D2"),  # 1-row total cross join; the global
    #                                 rank window rides the AGGREGATED bigram
    #                                 frame (<= |vocab|^2 rows), never the corpus
    "order_backlog_curve": ("D2",),  # the cumsum window rides the |weeks|-row
    #                                 weekly frame; range-partition at scale
    "stratified_sample_plan": ("D1",),  # 1-row allocation-total scalar cross join
    "mix_residuals": ("D1",),       # 1-row corpus-count scalar cross join
    "weekly_volatility": ("D1",),  # 1-row week-bounds cross join builds the
    #                                 gap-free spine
    "mann_whitney": ("D1",),        # 1-row midpoint cross join
    "wilson_ci": ("D1",),           # 1-row midpoint scalar cross join
    "rate_outlier_users": ("D1",),  # 1-row global-rate scalar cross join
    "segment_revenue_profile": ("D1",),  # 1-row revenue-total scalar cross join
    "token_length_histogram": ("D1",),   # 1-row token-total scalar cross join
    "embedding_dim_variance": ("D2",),   # the rank window rides exactly 64 rows
    "tax_rate_audit": ("D1",),           # 1-row line-total scalar cross join
    "part_adoption_curve": ("D2",),      # the cumsum window rides the |months|-row
    #                                      monthly frame; range-partition at scale
    "supplier_breadth": ("D1",),         # 1-row catalog-count scalar cross join
    "lsh_tuning_curve": ("D1",),  # 19-row grid x 4-row literal config cross
    #                               join — pure math table, no corpus scan
    "profile_drift": ("D1",),       # 1-row time-midpoint scalar cross join
    "psi_drift": ("D1",),           # 1-row (midpoint, min, max) scalar cross join
    "coldstart_coverage": ("D1",),  # 1-row time-midpoint scalar cross joins (x4:
    #                                 two tables x two halves)
    "woe_iv": ("D1",),              # 1-row totals + 1-row IV scalar cross joins
    "power_analysis": ("D1",),      # literal grid cross joins — pure math table
    "activity_heatmap": ("D1",),    # 1-row total scalar cross join onto <=168 cells
    "brand_share_shift": ("D1",),   # 1-row midpoint + 1-row half-totals cross joins
    "mixture_plan": ("D1",),        # 1-row total + 1-row kept-total scalar cross joins
    "cumulative_users": ("D2",),    # the running sum rides the |days| frame, not
    #                                 events (range-partition the day sort at scale)
    "retrieval_eval": ("D1",),      # broadcast fixed query set (embedding_topk shape)
    "binary_embedding_audit": ("D1",),  # broadcast modulo stratum pair join
    "rrf_fusion": ("D1",),          # broadcast fixed query set (embedding_topk shape)
    # late-r6 statistics/graph wave — same two bounded patterns:
    "ks_test": ("D1", "D2"),        # 1-row (na, nb) scalar cross join; CDF window
    #                                 rides the DISTINCT-VALUE frame (value
    #                                 cardinality, not rows)
    "chi_square": ("D1",),          # margin grid (|segs|x|nations| rows) + 1-row total
    "heavy_hitters": ("D1",),       # 1-row corpus-total scalar cross join
    "collocations": ("D1",),        # 1-row (n_bigrams, n_words) scalar cross joins
    "triangle_count": ("D1",),      # 1-row (n_edges, n_nodes) stats cross join
    "pareto_frontier": ("D2",),     # prefix-min window rides the DISTINCT-PRICE
    #                                 aggregate frame, not raw parts
    "seasonal_decompose": ("D2",),  # ONE global daily series by construction;
    #                                 partitions by series key in the general case
    "budget_select": ("D2",),       # global quality-ordered cumsum is the query's
    #                                 semantics (range-partition the sort at scale)
    "ccnet_buckets": ("D1",),  # inherits bigram_logprob's 1-row vocab scalar cross join
    "kl_drift": ("D1",),            # 1-row corpus-total scalar cross join
    "benford_digits": ("D1",),      # 1-row row-count scalar cross join onto the
    #                                 9-digit frame
    "survival_km": ("D1", "D2"),    # 1-row horizon/total scalar cross joins; the
    #                                 KM ordered window rides the DISTINCT-DURATION
    #                                 frame (date-span-bounded, not customers)
    # r6 LLM-pipeline/event wave — same bounded patterns:
    "dsir_weights": ("D1",),        # 1-row hashed-unigram model LUT (B=512
    #                                 buckets) rides a broadcast scalar cross join
    "hard_negatives": ("D1",),      # broadcast fixed query set (the
    #                                 embedding_topk pattern, label-filtered)
    "decile_lift": ("D1",),         # 1-row corpus-total scalar cross joins onto
    #                                 the 10-row decile frame
    "mutual_information": ("D1",),  # margin/total scalar cross joins on the
    #                                 |langs|x|sources| cell frame
    "stl_anomaly": ("D1", "D2"),    # ONE global daily series by construction
    #                                 (like seasonal_decompose) + 1-row residual-
    #                                 scale scalar cross join
    # late-r6 planning/statistics wave — same bounded patterns:
    "cbo_stats": ("D1", "D2"),      # 4x 1-row per-column stat frames cross-join
    #                                 onto the boundary agg; the cum window rides
    #                                 the VALUE-COUNT frame (NDV-bounded, per
    #                                 docstring — the column you'd sample anyway)
    "file_binpack": ("D2",),        # the fill window runs over the FILE INVENTORY
    #                                 (1 row per input file, ~10^6 at 100 TB), by
    #                                 construction a single ordered pass
    "theil_sen": ("D1", "D2"),      # 1-row slope/intercept median frames cross-
    #                                 join; cum windows ride month-bounded
    #                                 value-count frames (~84 rows at any scale)
    "mape_backtest": ("D2",),       # lag features over the calendar-month frame
    #                                 (~84 rows regardless of data size)
    "quantile_normalize": ("D1", "D2"),  # 1-row corpus-total scalar cross join;
    #                                 the cum window rides the VALUE-COUNT frame
    #                                 (NDV-bounded, the cbo_stats pattern)
    "matryoshka_audit": ("D1",),    # broadcast fixed query set x2 (the
    #                                 embedding_topk pattern, both resolutions)
    "cohens_kappa": ("D1",),        # 1-row total/expected-agreement scalar
    #                                 cross joins
    "bloom_prefilter_join": ("D1",),  # the 1-ROW broadcast Bloom-mask frame rides
    #                                 a scalar cross join by design (bloom_semi_join:
    #                                 ~16 KB mask map, bounded regardless of key-set
    #                                 size); flagged only on some runs (AQE may or
    #                                 may not fold the BNLJ away)
    "blocking_audit": ("D1",),      # the all-pairs edit-distance GROUND TRUTH is
    #                                 the audit's definition (docstring: run on a
    #                                 bounded sample at scale) + 1-row metric
    #                                 scalar cross joins
    "rfm_segments": ("D2",),        # quartile ntiles ride the per-CUSTOMER
    #                                 aggregate frame (one row per customer); at
    #                                 extreme scale compute quartile boundaries
    #                                 via approx quantiles + join instead
    # late-r6 batch 5/6 — same bounded patterns:
    "roc_auc": ("D2",),             # the cumulative-rank window rides the
    #                                 DISTINCT-SCORE frame (NDV-bounded, the
    #                                 quantile_normalize pattern)
    "calibration_bins": ("D1",),    # 1-row min/max scalar cross join
    "orphan_audit": ("D1",),        # 7x (1-row totals x 1-row orphan counts)
    #                                 scalar cross joins — one per FK edge
    "decayed_trends": ("D1",),      # 1-row anchor-date + 1-row total-mass
    #                                 scalar cross joins
    "multi_test_fdr": ("D1", "D2"),  # 1-row pooled-rate scalar cross join; the
    #                                 BH rank/backwards-min windows ride the
    #                                 |sources|-row aggregate frame
}


def test_full_registry_no_unexplained_hazards(spark):
    """Doctor self-audit: every registered query's FINAL plan is free
    of scale hazards (D1 cartesian / D2 single-partition window),
    except the documented bounded exceptions above. Keeps new queries
    honest by default: an undocumented cartesian fails this test."""
    from data_ingestors_spark.queries import all_queries

    bad = {}
    for name, fn in all_queries().items():
        try:
            findings = diagnose(fn(spark, SF))
        except Exception:
            continue  # iterative/python-stage queries may need actions
        exempt = _DOCTOR_EXEMPT.get(name, ())
        hard = [
            f for f in findings
            if (f.startswith("D1") or f.startswith("D2"))
            and not any(f.startswith(p) for p in exempt)
        ]
        if hard:
            bad[name] = hard
    assert not bad, bad


def test_broadcastable_side_flagged(spark):
    """A sort-merge join against a tiny scanned file should suggest
    broadcasting; with broadcast applied the suggestion disappears."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        li = load_table(spark, SF, "lineitem")
        nat = load_table(spark, SF, "nation")
        # nation is a few KB: joining it sort-merge is the anti-pattern.
        # threshold stays -1 through diagnose (explain re-plans lazily,
        # restoring it would turn the join back into a broadcast) — the
        # doctor falls back to the default 10 MB advisory budget.
        smj = li.join(nat, li.l_suppkey % 25 == nat.n_nationkey)
        codes = _codes(diagnose(smj))
        assert "D6" in codes
        bc = li.join(F.broadcast(nat), li.l_suppkey % 25 == nat.n_nationkey)
        assert "D6" not in _codes(diagnose(bc))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
