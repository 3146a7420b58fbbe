#!/usr/bin/env python
"""Headline benchmark: run the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count + a bounded collect of the
result) so the timing covers the full plan, not just planning.

r6: every query is timed $SPARK_GRAFT_BENCH_REPS times (default 3) in
round-robin order (rep 1 of every query, then rep 2, ...) so external
load spreads across queries instead of poisoning one; the reported
per-query number and every total is the MEDIAN, with min/median/max
recorded under "queries_stats" — the r5 artifact carried 2-3x
run-to-run jitter that single-shot timing could not distinguish from
regressions. "tpch22_total" aggregates the full 22-query TPC-H shape
suite regardless of which timed group each query lives in (the
headline composition is kept stable for round-over-round comparison).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestors_spark.session import get_spark
from data_ingestors_spark.queries import all_queries

# Headline set: one per operator family, weighted toward the
# shuffle/join/window-heavy plans that dominate at scale.
HEADLINE = [
    "pricing_summary",
    "revenue_by_nation",
    "customer_order_counts",
    "range_join",
    "topk_per_group",
    "running_sum",
    "range_frame",
    "asof_join",
    "cube",
    "tumbling_window",
    "session_window",
    "dedup_exact",
    "minhash_neardup",
    "simhash_neardup",
    "embedding_topk",
    "text_stats",
    "validation_agg",
    # r3 additions: the new heavy analytics/LLM-pipeline plans
    "dedup_clusters",
    "contamination_check",
    "tfidf_topk",
    "gap_fill",
    "attribution_join",
    # r4 additions: as-of direction variants + TPC-H Q18 shape
    "asof_join_forward",
    "asof_join_nearest",
    "large_orders",
    # r5 additions: the heavy text/LLM-pipeline ops landed since r3 —
    # without them here, a regression on any of these plans is
    # invisible to the per-round bench artifact
    "chunk_documents",
    "winnowing",
    "winnowing_overlap",
    "temperature_mix",
    "unigram_logprob",
    "semantic_dedup",
    "embedding_neardup",
    # late-r5 additions: new corpus ops join the headline on arrival
    "dup_span_stats",
    "fuzzy_match",
    # r6 additions: maximal duplicated spans (variable-length merge)
    # and the boilerplate-scrub rewrite built on them
    "dup_span_merge",
    "strip_dup_spans",
    "gopher_quality",
    "dup_line_stats",
    "c4_filter",
    "winsorized_stats",
    "copurchase_pairs",
    "source_entropy",
    "bigram_logprob",
    # late-r6 additions: statistics / graph / linkage / digest ops —
    # same rule as r5: new heavy plans join the headline on arrival so
    # regressions stay visible in the per-round artifact
    "heavy_hitters",
    "zipf_fit",
    "ks_test",
    "chi_square",
    "pareto_frontier",
    "ewma",
    "linear_interpolate",
    "acf",
    "seasonal_decompose",
    "quantile_digest",
    "dedup_canonical",
    "cluster_canonical",
    "snapshot_diff",
    "record_linkage",
    "triangle_count",
    "pagerank",
    "collocations",
    "lexical_diversity",
    "budget_select",
    "containment_join",
    "asof_join_tolerance",
    "grouped_quantiles",
    "ccnet_buckets",
    "histogram2d",
    "funnel_windowed",
    "attribution_models",
    "rfm_segments",
    "kl_drift",
    "benford_digits",
    "cusum_changepoint",
    "survival_km",
    "gini_concentration",
    "item_cosine",
    "spearman_corr",
    "vocab_overlap",
    # late-r6 batch 2: shuffle-reduction/planner diagnostics, DSIR,
    # novelty, embedding audits, sequence/graph mining, eval harnesses
    "bloom_prefilter_join",
    "key_skew_audit",
    "join_cardinality_estimate",
    "sequence_mining",
    "period_over_period",
    "mutual_information",
    "ab_test_proportions",
    "dsir_weights",
    "doc_novelty",
    "embedding_outliers",
    "embedding_dim_corr",
    "hard_negatives",
    "link_prediction",
    "langid_confusion",
    "decile_lift",
    "byte_stats",
    "holt_linear",
    "burstiness",
    "moments_stats",
    "ship_latency",
    "char_ngram_profile",
    "stl_anomaly",
    "weighted_median",
    # late-r6 batch 3: planner stats, warehouse/forecast primitives,
    # embedding compression audits, blocking/tokenizer eval
    "cbo_stats",
    "file_binpack",
    "theil_sen",
    "mape_backtest",
    "lateral_join",
    "scd2_build",
    "matryoshka_audit",
    "int8_quant_audit",
    "token_fertility",
    "dedup_family_stats",
    "cohens_kappa",
    "blocking_audit",
    # late-r6 batch 4: ssjoin, engagement, cadence, rank-normalize
    "prefix_filter_join",
    "activity_streaks",
    "inter_event_gaps",
    "quantile_normalize",
    # late-r6 batch 5: separability/calibration stats, FK audit,
    # cohort LTV, decayed trending, kNN label noise
    "roc_auc",
    "calibration_bins",
    "orphan_audit",
    "cohort_ltv",
    "decayed_trends",
    "knn_label_noise",
    # late-r6 batch 6: Markov transitions, sessionization stats,
    # growth accounting, FDR correction, 3-itemsets, entropy filter
    "event_transitions",
    "session_stats",
    "new_vs_returning",
    "multi_test_fdr",
    "copurchase_triples",
    "char_entropy_filter",
    # r7 batch 1: association rules, sliding distinct actives,
    # freshness + profile-drift audits
    "assoc_rules",
    "rolling_distinct",
    "freshness_audit",
    "profile_drift",
    # r7 batch 2: retrieval metrics, 1-bit quantization audit,
    # graph assortativity, point-in-time feature join
    "retrieval_eval",
    "binary_embedding_audit",
    "degree_assortativity",
    "point_in_time_features",
    # r7 batch 3: PSI drift, tokenizer OOV coverage, char-class mix,
    # local clustering coefficient
    "psi_drift",
    "oov_rate",
    "unicode_class_mix",
    "clustering_coefficient",
    # r7 batch 4: sorted-neighborhood blocking, reciprocal-rank
    # fusion, LSH banding tuning table
    "snm_linkage",
    "rrf_fusion",
    "lsh_tuning_curve",
    # r7 batch 5: cross-source dup matrix, FD/privacy audits,
    # watermark-sizing lateness audit
    "cross_source_dups",
    "fd_audit",
    "k_anonymity",
    "lateness_audit",
    # r7 batch 6: WOE/IV encoding, seasonality ANOVA, cold-start
    # coverage, A/B power table
    "woe_iv",
    "seasonality_strength",
    "coldstart_coverage",
    "power_analysis",
    # r7 batch 7: session entry paths, repeat-purchase cadence
    "session_paths",
    "repeat_purchase_gaps",
    # r7 batch 8: dedup budget allocation, norm hygiene, funnel speed
    "dedup_impact_report",
    "embedding_norm_audit",
    "conversion_latency",
    # r7 batch 9: mixture waterfill plan, activity heatmap,
    # cumulative user growth
    "mixture_plan",
    "activity_heatmap",
    "cumulative_users",
    # r8 batch 1: incremental batch-vs-corpus dedup pre-flight
    "incremental_dedup",
    # r8 batch 2: corpus growth/chunking/prefix audits
    "vocab_growth",
    "duplicate_prefix_audit",
    "chunk_overlap_audit",
    # r8 batch 3: basket shape, invoice dedup, supplier pricing
    "basket_size_distribution",
    "duplicate_invoice_detection",
    "supplier_price_outliers",
    # r8 batch 4: concordance, variance homogeneity, feature screen
    "kendall_tau",
    "levene_test",
    "info_gain_screen",
    # r8 batch 5: trade matrix, discount response
    "nation_trade_balance",
    "price_elasticity",
    # r8 batch 6: event hygiene, audience overlap, lifecycle, risk
    "rapid_repeat_events",
    "user_overlap_matrix",
    "customer_churn_flags",
    "supplier_dependency",
    # r8 batch 7: label balance, int8 clip calibration
    "label_balance_audit",
    "embedding_quantile_clip",
    # r8 batch 8: bigram head coverage, source profile cosine,
    # rolling-z anomaly summary, weekly backlog curve
    "ngram_coverage_curve",
    "source_similarity_matrix",
    "rolling_zscore_anomalies",
    "order_backlog_curve",
    # r8 batch 9: Neyman sampling plan, dedup-by-length slicing,
    # composition residuals, label-cluster compactness
    "stratified_sample_plan",
    "length_bucket_dedup_rate",
    "mix_residuals",
    "cluster_compactness",
    # r8 batch 10: weekly growth volatility, discount-vs-returns,
    # 80/20 revenue concentration headcount
    "weekly_volatility",
    "discount_return_rate",
    "revenue_concentration_8020",
    # r8 batch 11: lang contamination, survivor quality, rank tests,
    # proportion CI, bot-rate screen, segment P&L
    "cross_lang_contamination",
    "dedup_survivor_quality",
    "mann_whitney",
    "wilson_ci",
    "rate_outlier_users",
    "segment_revenue_profile",
    # r8 batch 12: JSON props profile, latency trend, loyalty, dead
    # stock, exact per-lang quantiles, first-order LTV signal
    "props_value_profile",
    "latency_trend",
    "brand_loyalty",
    "parts_never_sold",
    "lang_length_quantiles",
    "first_order_ltv_corr",
    # r8 batch 13: day-mix control, size-latency coupling, credit
    # risk, priority composition drift, token lengths, sign balance
    "weekend_effect",
    "order_size_vs_latency",
    "balance_vs_spend",
    "priority_mix_trend",
    "token_length_histogram",
    "embedding_sign_balance",
    # r8 batch 14: stopword head coverage, dim variance triage,
    # tax-rate vocabulary audit
    "stopword_coverage",
    "embedding_dim_variance",
    "tax_rate_audit",
    # r8 batch 15: cross-lang dup families, per-type volume Gini
    "cross_lang_dup_families",
    "events_user_gini",
    # r8 batch 16: SKU adoption curve, supply-base breadth, whale
    # value concentration
    "part_adoption_curve",
    "supplier_breadth",
    "value_concentration_topk",
    # r11: embedding-space train/test contamination (exact top-1 vs
    # the train split — new heavy-ish plan joins the headline on
    # arrival, same rule as every batch above)
    "embedding_contamination",
    # r12: the refresh loop's novelty reports through the REAL
    # refresh_corpus path (two batches into a temp store) — the
    # operating loop's numbers, timed and oracle-checked like
    # everything else
    "refresh_report",
]

# Secondary suite (separate totals, NOT in the headline metric so the
# 32-query round-over-round comparison stays stable): the r5 TPC-H
# shapes and the new text measures.
TPCH_SUITE = [
    "min_cost_supplier",
    "late_order_priority",
    "local_supplier_volume",
    "forecast_revenue",
    "volume_shipping",
    "market_share",
    "product_profit",
    "important_parts",
    "late_line_priority",
    "promo_revenue",
    "top_supplier",
    "parts_supplier_cnt",
    "discounted_revenue",
    "potential_promotion",
    "global_sales_opportunity",
    "bm25_relevance",
    "dup_ngram_chars",
    "interval_join",
    "weighted_sample",
    # r6 additions: robust dispersion + portable mode + listagg
    "mad_stats",
    "mode_per_group",
    "group_concat",
]

# TPC-H shapes that live in neither list above (timed only so
# tpch22_total covers the full 22-query suite).
TPCH_EXTRA = [
    "shipping_priority",       # Q3
    "returned_items",          # Q10
    "small_qty_revenue",       # Q17
    "bottleneck_supplier",     # Q21
]

# The full 22-query TPC-H shape suite; names resolve to whichever
# timed group ran them. Headline members: Q1 pricing_summary,
# Q13 customer_order_counts, Q18 large_orders.
TPCH22 = [
    "pricing_summary",            # Q1
    "min_cost_supplier",          # Q2
    "shipping_priority",          # Q3
    "late_order_priority",        # Q4
    "local_supplier_volume",      # Q5
    "forecast_revenue",           # Q6
    "volume_shipping",            # Q7
    "market_share",               # Q8
    "product_profit",             # Q9
    "returned_items",             # Q10
    "important_parts",            # Q11
    "late_line_priority",         # Q12
    "customer_order_counts",      # Q13
    "promo_revenue",              # Q14
    "top_supplier",               # Q15
    "parts_supplier_cnt",         # Q16
    "small_qty_revenue",          # Q17
    "large_orders",               # Q18
    "discounted_revenue",         # Q19
    "potential_promotion",        # Q20
    "bottleneck_supplier",        # Q21
    "global_sales_opportunity",   # Q22
]


def _median(xs: list[float]) -> float:
    ys = sorted(xs)
    n = len(ys)
    return ys[n // 2] if n % 2 else (ys[n // 2 - 1] + ys[n // 2]) / 2


# --- automated bench-drift A/B (r11) -----------------------------------
#
# Round-over-round wall-time movement on this box is dominated by
# session drift (identical code measured 1.4x apart across sessions —
# BASELINE.md §r10). r10 adjudicated its graph-family scare by HAND
# with an interleaved same-JVM A/B (commit b72517c); this automates
# that protocol so BENCH_r{N} artifacts carry the verdict directly:
#
#   1. The previous round's full payload is read from git (`git show
#      HEAD:BENCH_full_latest.json` — the working copy is overwritten
#      by the current run), including the `git_head` it was built at.
#   2. Queries whose MIN moved >15% vs that artifact are flagged.
#   3. For each flagged query, the old checkout's package is
#      extracted (`git archive`) and its query callable is run
#      INTERLEAVED with the current one inside THIS SparkSession —
#      both variants share identical JVM/GC/box state, so a persistent
#      old-vs-new gap is a code regression and a vanishing one is
#      session drift.
#
# Caveat (same as the manual protocol): Python-worker-side UDF bodies
# resolve by module NAME on the workers, so a flagged query whose hot
# path is a pandas UDF exercises old PLAN construction but current
# worker bytecode. All current headline hot paths are JVM-side
# DataFrame plans; the verdict records the variant mins so a human
# can spot-check.

_DRIFT_THRESHOLD = 1.15
_DRIFT_MAX_FLAGGED = 8
_DRIFT_AB_REPS = 3
_DRIFT_CONFIRM_RATIO = 1.10
# Absolute floor for a code-regression verdict: on sub-second queries
# 3 interleaved reps carry ~0.1 s of jitter, so a ratio alone
# misfires (measured r11: attribution_models read ab_ratio 1.17 with
# a PROVABLY identical plan and module — git diff empty between the
# two checkouts). A genuine regression must also move the min by
# more than this many seconds; smaller deltas report `noise-floor`.
_DRIFT_MIN_ABS_S = 0.2


def _ab_verdict(old_min: float, new_min: float) -> str:
    """Pure verdict rule for one interleaved A/B result (unit-tested):
    ratio gate, then the absolute noise floor for sub-second queries."""
    if new_min / old_min <= _DRIFT_CONFIRM_RATIO:
        return "session-drift"
    if new_min - old_min > _DRIFT_MIN_ABS_S:
        return "code-regression"
    return "noise-floor"


def _drift_flags(
    prev_stats: dict, cur_stats: dict, threshold: float = _DRIFT_THRESHOLD
) -> list[tuple[str, float]]:
    """Names whose current min exceeds the previous round's min by more
    than `threshold`, worst first. Pure so it is unit-testable."""
    flags = []
    for name, cur in cur_stats.items():
        prev = prev_stats.get(name)
        if not prev or not prev.get("min") or not cur.get("min"):
            continue
        ratio = cur["min"] / prev["min"]
        if ratio > threshold:
            flags.append((name, round(ratio, 3)))
    flags.sort(key=lambda kv: -kv[1])
    return flags


def _git(args: list[str]) -> str:
    import subprocess

    return subprocess.run(
        ["git", "-C", os.path.dirname(os.path.abspath(__file__))] + args,
        capture_output=True, text=True, timeout=120, check=True,
    ).stdout


def _old_queries_at(head: str):
    """Extract the package as of `head` into a temp dir and import its
    query registry under this process (same JVM). The current package's
    modules are restored afterwards; the returned callables keep their
    own (old) module objects alive by reference."""
    import importlib
    import subprocess
    import tarfile
    import tempfile

    tmp = tempfile.mkdtemp(prefix="bench_ab_")
    repo = os.path.dirname(os.path.abspath(__file__))
    tar = subprocess.run(
        ["git", "-C", repo, "archive", head, "data_ingestors_spark"],
        capture_output=True, timeout=300, check=True,
    ).stdout
    import io

    with tarfile.open(fileobj=io.BytesIO(tar)) as tf:
        tf.extractall(tmp)  # noqa: S202 — our own git archive

    pkg_mods = lambda: [  # noqa: E731
        m for m in sys.modules
        if m == "data_ingestors_spark" or m.startswith("data_ingestors_spark.")
    ]
    saved = {m: sys.modules.pop(m) for m in pkg_mods()}
    sys.path.insert(0, tmp)
    importlib.invalidate_caches()
    try:
        mod = importlib.import_module("data_ingestors_spark.queries")
        return mod.all_queries(), tmp
    finally:
        sys.path.remove(tmp)
        for m in pkg_mods():
            sys.modules.pop(m)
        sys.modules.update(saved)
        importlib.invalidate_caches()


def _drift_ab(spark, sf_dir: str, flagged: list[tuple[str, float]], cur_stats: dict) -> dict:
    """Interleaved same-JVM A/B for each flagged query; returns the
    `drift` section for the bench payload."""
    section: dict = {"threshold": _DRIFT_THRESHOLD, "flagged": {}}
    try:
        prev_head = json.loads(_git(["show", "HEAD:BENCH_full_latest.json"])).get("git_head")
    except Exception:
        prev_head = None
    if not prev_head:
        for name, ratio in flagged:
            section["flagged"][name] = {"ratio": ratio, "verdict": "no-baseline-head"}
        return section
    try:
        old_queries, tmp = _old_queries_at(prev_head)
    except Exception as e:
        for name, ratio in flagged:
            section["flagged"][name] = {"ratio": ratio, "verdict": f"ab-setup-failed: {str(e)[:60]}"}
        return section
    section["baseline_head"] = prev_head
    cur_queries = all_queries()
    import shutil

    try:
        for name, ratio in flagged:
            entry: dict = {"ratio": ratio, "cur_min": cur_stats[name]["min"]}
            old_fn = old_queries.get(name)
            if old_fn is None:
                entry["verdict"] = "new-query"
                section["flagged"][name] = entry
                continue
            olds, news = [], []
            try:
                for _ in range(_DRIFT_AB_REPS):
                    for fn, sink in ((old_fn, olds), (cur_queries[name], news)):
                        t0 = time.perf_counter()
                        fn(spark, sf_dir).count()
                        sink.append(time.perf_counter() - t0)
                        spark.catalog.clearCache()
            except Exception as e:
                entry["verdict"] = f"ab-run-failed: {str(e)[:60]}"
                section["flagged"][name] = entry
                continue
            entry["ab_old_min"] = round(min(olds), 3)
            entry["ab_new_min"] = round(min(news), 3)
            ab_ratio = min(news) / min(olds)
            entry["ab_ratio"] = round(ab_ratio, 3)
            entry["verdict"] = _ab_verdict(min(olds), min(news))
            section["flagged"][name] = entry
            print(f"# drift A/B {name}: {entry}", file=sys.stderr)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return section


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    queries = all_queries()

    # Warm-up: JVM JIT + whole-stage-codegen cache. The first execution
    # of an interpreted-HOF-heavy plan pays ~2-3 s of one-time JIT that
    # has nothing to do with the query (measured: identical plan, 2.9 s
    # first run at sf0.01 then 0.7 s at sf0.1). Run every headline
    # query once UNTIMED at sf0.001 — a different data path, so no
    # DataFrame/persist cache can leak into the timed section; only the
    # process-level code caches (JIT, codegen) warm, which is what any
    # steady-state latency benchmark does.
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).count()
    all_names = HEADLINE + TPCH_SUITE + TPCH_EXTRA
    warm_dir = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if os.path.isdir(warm_dir):
        for name in all_names:
            try:
                all_queries()[name](spark, warm_dir).count()
            except Exception as e:
                print(f"# warmup {name} skipped: {e}", file=sys.stderr)
            finally:
                spark.catalog.clearCache()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    samples: dict[str, list[float]] = {name: [] for name in all_names}
    for rep in range(reps):
        for name in all_names:
            fn = queries[name]
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples[name].append(time.perf_counter() - t0)
            # drop frames the query persisted (minhash shingles,
            # union-find rounds): 60+ back-to-back executions otherwise
            # accumulate storage-memory residue that degrades later
            # queries' timings (measured: 2-3x jitter before this)
            spark.catalog.clearCache()
        print(f"# rep {rep + 1}/{reps} done", file=sys.stderr)

    # r10: the heaviest queries dominate the headline AND carry the
    # most absolute jitter (box drift measured at up to 1.4x on
    # IDENTICAL code across sessions — BASELINE.md §r10), so the
    # top-20 by median get extra reps (default total 5) to stabilize
    # their min/median before round-over-round comparison.
    top_reps = max(reps, int(os.environ.get("SPARK_GRAFT_BENCH_TOP_REPS", "5")))
    if top_reps > reps:
        top20_names = [
            n for n, _ in sorted(
                samples.items(), key=lambda kv: -_median(kv[1])
            )[:20]
        ]
        for rep in range(top_reps - reps):
            for name in top20_names:
                fn = queries[name]
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                samples[name].append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            print(
                f"# top20 extra rep {rep + 1}/{top_reps - reps} done",
                file=sys.stderr,
            )

    stats = {
        name: {
            "min": round(min(ts), 3),
            "med": round(_median(ts), 3),
            "max": round(max(ts), 3),
        }
        for name, ts in samples.items()
    }
    for name in all_names:
        s = stats[name]
        print(f"# {name}: med {s['med']}s (min {s['min']} max {s['max']})", file=sys.stderr)

    timings = {name: stats[name]["med"] for name in HEADLINE}
    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]

    extra = {name: stats[name]["med"] for name in TPCH_SUITE}
    extra_total = round(sum(extra.values()), 3)
    tpch22_total = round(sum(stats[name]["med"] for name in TPCH22), 3)

    # ingest throughput: the reference's core function (CSV -> validate
    # -> conform -> upsert). Measured over an orders-derived CSV at the
    # bench scale so rounds are comparable.
    ingest_rows_per_sec = None
    try:
        import shutil
        import tempfile

        tmp = tempfile.mkdtemp(prefix="bench_ingest_")
        try:
            csv_dir = os.path.join(tmp, "src")
            orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
            (
                orders.selectExpr(
                    "CAST(o_orderkey AS STRING) AS okey",
                    "CAST(o_custkey AS STRING) AS ckey",
                    "o_orderstatus AS ostatus",
                    "CAST(o_totalprice AS STRING) AS total",
                )
                .coalesce(4)
                .write.option("header", True).mode("overwrite").csv(csv_dir)
            )
            csv_file = next(
                os.path.join(csv_dir, f) for f in os.listdir(csv_dir) if f.endswith(".csv")
            )
            n_file = spark.read.option("header", True).csv(csv_file).count()

            from data_ingestors_spark.ingest.config import ResolvedConfig
            from data_ingestors_spark.ingest.pipeline import Ingestor

            cfg = ResolvedConfig(
                table_name="bench_ingest",
                schema={"okey": "BIGINT", "ckey": "BIGINT", "ostatus": "VARCHAR(4)", "total": "DOUBLE"},
                label_column="ostatus",
                data_id_strategy="column",
                data_id_column="okey",
            )
            # untimed mini-ingest: JIT-warm the CSV-parse / window /
            # parquet-write code paths (same rationale as the query
            # warmup above; a separate tiny source + target, nothing
            # the timed run can reuse)
            warm_csv = os.path.join(tmp, "warm.csv")
            with open(csv_file) as src, open(warm_csv, "w") as dst:
                for i, line in enumerate(src):
                    if i > 1000:
                        break
                    dst.write(line)
            Ingestor(spark, cfg, target_path=os.path.join(tmp, "wh", "warm")).ingest(warm_csv)

            ing_samples = []
            for rep in range(reps):
                t0 = time.perf_counter()
                Ingestor(
                    spark, cfg,
                    target_path=os.path.join(tmp, "wh", f"bench_ingest_{rep}"),
                ).ingest(csv_file)
                ing_samples.append(n_file / (time.perf_counter() - t0))
            ingest_rows_per_sec = round(_median(ing_samples), 1)
            ingest_stats = {
                "min": round(min(ing_samples), 1),
                "med": ingest_rows_per_sec,
                "max": round(max(ing_samples), 1),
            }
            print(f"# ingest: {n_file} rows -> {ingest_stats} rows/s", file=sys.stderr)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    except Exception as e:  # never let the throughput probe break the bench line
        print(f"# ingest bench skipped: {e}", file=sys.stderr)

    # r13 (VERDICT r12 #6): embedding-fold timer. The embedding near-dup
    # fold (the refresh loop's third dedup modality) had NO timer, so
    # its optimizations were unmeasurable — the text fold's numbers ride
    # in refresh_report but the embedding fold is only exercised when a
    # caller passes embedding_batch_path. Two vec_id-parity batches from
    # the embeddings table run through the REAL embedding_neardup_fold_batch
    # into a fresh temp store per rep; reported as median wall seconds
    # for the two folds. Additions-only: a new payload field, no change
    # to any existing timing.
    emb_fold_sec = None
    try:
        import shutil
        import tempfile

        from data_ingestors_spark.streaming.neardup import (
            embedding_neardup_fold_batch,
        )

        emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
        b0 = emb.where("vec_id % 2 = 0")
        b1 = emb.where("vec_id % 2 = 1")
        if os.path.isdir(warm_dir):  # untimed JIT warm, different data path
            wtmp = tempfile.mkdtemp(prefix="bench_embfold_warm_")
            try:
                wemb = spark.read.parquet(os.path.join(warm_dir, "embeddings.parquet"))
                embedding_neardup_fold_batch(
                    spark, wemb, 0,
                    os.path.join(wtmp, "index"), os.path.join(wtmp, "pairs"),
                )
            finally:
                shutil.rmtree(wtmp, ignore_errors=True)
            spark.catalog.clearCache()
        ef_samples = []
        for rep in range(reps):
            tmp = tempfile.mkdtemp(prefix=f"bench_embfold_{rep}_")
            try:
                t0 = time.perf_counter()
                for bi, bdf in enumerate((b0, b1)):
                    embedding_neardup_fold_batch(
                        spark, bdf, bi,
                        os.path.join(tmp, "index"), os.path.join(tmp, "pairs"),
                    )
                ef_samples.append(time.perf_counter() - t0)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
            spark.catalog.clearCache()
        emb_fold_sec = round(_median(ef_samples), 3)
        emb_fold_stats = {
            "min": round(min(ef_samples), 3),
            "med": emb_fold_sec,
            "max": round(max(ef_samples), 3),
        }
        print(f"# embedding fold (2 batches): {emb_fold_stats} s", file=sys.stderr)
    except Exception as e:  # never let the probe break the bench line
        print(f"# embedding fold bench skipped: {e}", file=sys.stderr)

    # r10: per-round PLAN artifact — wall-time regressions are drowned
    # by box noise (BASELINE.md §r10), but plan stats (shuffles, join
    # kinds, cartesians, pushdown) are deterministic. Fingerprint EVERY
    # registry query at sf0.001 (plan shape is scale-invariant) so a
    # plan regression diffs per-round even when timings cannot.
    # tools/plans_check.py diffs this file against the committed
    # SCALE.md table. r13: SPARK_GRAFT_BENCH_PLANS=0 skips this block
    # (process-level A/B arms re-time the same committed code, so the
    # deterministic fingerprints add nothing per arm); default unchanged.
    try:
        if os.environ.get("SPARK_GRAFT_BENCH_PLANS", "1") == "0":
            raise RuntimeError("disabled via SPARK_GRAFT_BENCH_PLANS=0")
        from data_ingestors_spark.doctor import plan_stats

        plan_dir = warm_dir if os.path.isdir(warm_dir) else sf_dir
        plans: dict[str, dict] = {}
        for name, fn in sorted(all_queries().items()):
            try:
                plans[name] = plan_stats(fn(spark, plan_dir))
            except Exception as e:
                plans[name] = {"err": str(e)[:80]}
        plans_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "PLANS_latest.json"
        )
        with open(plans_path, "w") as fh:
            json.dump(plans, fh, indent=0, sort_keys=True)
        print(f"# plan fingerprints -> {plans_path}", file=sys.stderr)
    except Exception as e:  # never let the plan probe break the bench line
        print(f"# plan fingerprints skipped: {e}", file=sys.stderr)

    # r11: automated drift adjudication (see helpers above). Read the
    # PREVIOUS round's payload from git BEFORE overwriting the working
    # BENCH_full_latest.json below; A/B only queries whose min moved
    # >15% vs it. Never allowed to break the bench line.
    drift_section = None
    if os.environ.get("SPARK_GRAFT_BENCH_DRIFT", "1") != "0":
        try:
            prev = json.loads(_git(["show", "HEAD:BENCH_full_latest.json"]))
            flagged = _drift_flags(prev.get("queries_stats", {}), stats)[:_DRIFT_MAX_FLAGGED]
            if flagged:
                drift_section = _drift_ab(spark, sf_dir, flagged, stats)
            else:
                drift_section = {"threshold": _DRIFT_THRESHOLD, "flagged": {}}
        except Exception as e:
            print(f"# drift check skipped: {e}", file=sys.stderr)

    try:
        git_head = _git(["rev-parse", "HEAD"]).strip()
    except Exception:
        git_head = None

    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf_dir,
    }
    out["reps"] = reps
    out["top_reps"] = top_reps
    # r13 (VERDICT r12 item 2): carry the session's actual core count and
    # master in the payload so the driver's low-core heuristic can see
    # that SPARK_GRAFT_CPUS was honored instead of inferring from
    # per-query ratios (which are overhead-bound at sf0.1).
    try:
        out["cpus"] = spark.sparkContext.defaultParallelism
        out["master"] = spark.sparkContext.master
    except Exception:
        pass
    if git_head:
        out["git_head"] = git_head
    if drift_section is not None:
        out["drift"] = drift_section
    out["tpch_suite_total"] = extra_total
    out["tpch_suite"] = extra
    out["tpch22_total"] = tpch22_total
    out["tpch22"] = {name: stats[name]["med"] for name in TPCH22}
    out["queries_stats"] = stats
    if ingest_rows_per_sec is not None:
        out["ingest_rows_per_sec"] = ingest_rows_per_sec
        out["ingest_stats"] = ingest_stats
    if emb_fold_sec is not None:
        out["emb_fold_sec"] = emb_fold_sec
        out["emb_fold_stats"] = emb_fold_stats

    # The driver captures only a bounded tail of stdout (BENCH_r06/r07
    # recorded `parsed: null` because the full 160-query line blew past
    # it). Contract since r8: the FULL payload (queries_stats, tpch22,
    # ingest stats) is written to BENCH_full_latest.json next to this
    # script, and stdout carries ONE compact JSON line that always fits —
    # the stable original-17 headline subset plus every total.
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_full_latest.json"
    )
    # commit-discipline guard (r12, VERDICT r11 nit #2): the drift A/B
    # above reads `git show HEAD:BENCH_full_latest.json`, so an
    # UNCOMMITTED payload silently never becomes the next round's
    # baseline. Warn when this run is about to overwrite one, and
    # remind to commit the new payload (tests/test_packaging.py
    # asserts the committed artifact's git_head stays valid).
    try:
        if _git(["status", "--porcelain", "--", full_path]).strip():
            print(
                "# WARNING: overwriting an UNCOMMITTED BENCH_full_latest.json"
                " — the previous run's payload was never committed and has"
                " not been (and now never will be) a drift-A/B baseline",
                file=sys.stderr,
            )
    except Exception:
        pass
    try:
        with open(full_path, "w") as fh:
            json.dump(out, fh)
        print(f"# full bench payload -> {full_path}", file=sys.stderr)
        print(
            "# commit BENCH_full_latest.json (git_head="
            f"{(git_head or 'none')[:12]}) so the next round's drift A/B"
            " baselines on THIS run",
            file=sys.stderr,
        )
    except OSError as e:  # read-only checkout: compact line still stands alone
        full_path = None
        print(f"# full bench payload not written: {e}", file=sys.stderr)

    orig17 = HEADLINE[:17]  # the round-2 headline set, stable across rounds
    compact = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": {name: stats[name]["med"] for name in orig17},
        "sf": out["sf"],
        "reps": reps,
        "top_reps": top_reps,
        "headline_n": len(HEADLINE),
        "orig17_total": round(sum(stats[n]["med"] for n in orig17), 3),
        "tpch22_total": tpch22_total,
        "full_results": full_path,
    }
    for k in ("cpus", "master"):
        if k in out:
            compact[k] = out[k]
    if ingest_rows_per_sec is not None:
        compact["ingest_rows_per_sec"] = ingest_rows_per_sec
    if emb_fold_sec is not None:
        compact["emb_fold_sec"] = emb_fold_sec
    if git_head:
        compact["git_head"] = git_head[:12]
    if drift_section is not None:
        # compact form: per-flagged verdict (+min-vs-min ratio and the
        # same-JVM A/B ratio when one ran); full detail in full_path
        compact["drift"] = {
            name: {
                k: v for k, v in e.items() if k in ("ratio", "ab_ratio", "verdict")
            }
            for name, e in drift_section["flagged"].items()
        }
    # self-contained driver artifact: the 20 most expensive queries by
    # median ride along inline (full per-query stats stay in full_path).
    # r10: min rides along too — the regression rule is MIN-vs-MIN
    # (BASELINE.md), because session-to-session box drift moves medians
    # of identical code by up to 1.4x while mins stay comparable.
    compact["top20"] = {
        n: [round(s["min"], 3), round(s["med"], 3)]
        for n, s in sorted(stats.items(), key=lambda kv: -kv[1]["med"])[:20]
    }
    line = json.dumps(compact)
    # the driver captures only a ~2000-char stdout tail; degrade by
    # dropping detail maps rather than assert (stripped under -O, and
    # firing after all measurements would lose the line entirely)
    for drop in ("top20", "queries"):
        if len(line) < 1900:
            break
        compact.pop(drop, None)
        line = json.dumps(compact)
    print(line)


if __name__ == "__main__":
    main()
