"""Physical-plan audits: the properties that make the engine survive a
100× scale-up, asserted against `.explain` output rather than taken on
faith (SURVEY.md §4).

- filters reach the parquet scan (PushedFilters),
- projections prune the read schema (ReadSchema),
- small dimensions broadcast (no shuffle of the fact side's join key),
- aggregates combine map-side (partial HashAggregate before the
  exchange),
- expressions stay inside WholeStageCodegen,
- nothing degenerates into a CartesianProduct except the deliberate
  limited cross join.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from data_ingestors_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def test_filter_pushed_to_parquet_scan(spark, queries):
    plan = plan_of(queries["filter_project_case"](spark, SF_DIR))
    assert "PushedFilters: [" in plan
    # at least one real predicate pushed, not just the bare brackets
    assert "PushedFilters: []" not in plan.replace("PushedFilters: [],", "")


def test_projection_prunes_read_schema(spark, queries):
    plan = plan_of(queries["filter_project_case"](spark, SF_DIR))
    scan = plan[plan.index("ReadSchema"):]
    line = scan.splitlines()[0]
    # the query touches a handful of lineitem columns; the 16-column
    # l_comment/l_shipinstruct tail must not be read
    assert "l_comment" not in line and "l_shipinstruct" not in line


def test_small_dim_broadcasts(spark, queries):
    plan = plan_of(queries["revenue_by_nation"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_partial_aggregation_before_exchange(spark, queries):
    plan = plan_of(queries["pricing_summary"](spark, SF_DIR), "simple")
    # partial + final HashAggregate pair around one exchange:
    # map-side combine is what keeps a 100 TB groupBy's shuffle small
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_whole_stage_codegen_everywhere_hot(spark, queries):
    for name in ("pricing_summary", "filter_project_case", "math_funcs"):
        # AQE compiles codegen stages lazily: execute first, then read
        # the final plan — `*(n)` stars mark codegen'd stages
        df = queries[name](spark, SF_DIR)
        df.collect()  # count() would finalize a *different* QueryExecution
        plan = plan_of(df, "simple")
        if "AdaptiveSparkPlan" in plan:  # shuffle-free plans skip AQE
            assert "isFinalPlan=true" in plan, name
        assert "*(1)" in plan, f"{name}: no WholeStageCodegen stage in final plan"


def test_no_accidental_cartesian(spark, queries):
    # every headline query except the deliberately-limited cross join
    for name in (
        "pricing_summary", "revenue_by_nation", "customer_order_counts",
        "range_join", "topk_per_group", "running_sum", "asof_join",
        "dedup_exact", "embedding_topk",
    ):
        plan = plan_of(queries[name](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in plan, name


def test_asof_join_is_single_shuffle(spark, queries):
    # union+window asof: one exchange for the window sort, not a
    # per-row range probe (operators/asof.py)
    plan = plan_of(queries["asof_join"](spark, SF_DIR), "simple")
    assert "Window" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_topk_per_group_no_global_sort(spark, queries):
    # rank-within-partition then filter: a global TopK must not
    # materialize a full global sort of the fact table
    plan = plan_of(queries["topk_per_group"](spark, SF_DIR), "simple")
    assert "Window" in plan


def test_exact_dedup_single_shuffle(spark, queries):
    plan = plan_of(queries["dedup_exact"](spark, SF_DIR), "simple")
    # one hash-partition exchange on the dedup key — no sort-merge of
    # the whole table, no cartesian
    assert plan.count("Exchange hashpartitioning") <= 2
    assert "CartesianProduct" not in plan


def test_bucketed_tables_join_without_shuffle(spark, tmp_path, queries):
    """Pre-bucketing both sides of a recurring join on the join key
    removes the per-query shuffle entirely — the co-location strategy
    for fact-fact joins that repeat at 100 TB. Asserts the bucketed
    join plan contains NO Exchange on either side."""
    from data_ingestors_spark.queries.base import tables

    t = tables(spark, SF_DIR, "orders", "lineitem")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}/bkt'")
    # sf0.001 tables are broadcast-small; force the shuffle-join path
    # the bucketing is designed to optimize (at 100 TB neither side
    # broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name, df, key in (
            ("bkt.orders_b", t["orders"], "o_orderkey"),
            ("bkt.lineitem_b", t["lineitem"], "l_orderkey"),
        ):
            df.write.bucketBy(8, key).sortBy(key).mode("overwrite").saveAsTable(name)

        joined = (
            spark.table("bkt.orders_b")
            .join(
                spark.table("bkt.lineitem_b"),
                spark.table("bkt.orders_b").o_orderkey
                == spark.table("bkt.lineitem_b").l_orderkey,
            )
            .groupBy("o_orderpriority")
            .count()
        )
        plan = plan_of(joined, "simple")
        join_part = plan.split("HashAggregate")[-1]  # below the final agg
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the join itself reads both bucketed scans with no Exchange
        assert "Exchange hashpartitioning(o_orderkey" not in join_part
        assert "Exchange hashpartitioning(l_orderkey" not in join_part
        # correctness unchanged vs the unbucketed plan
        expect = (
            t["orders"]
            .join(t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, expect.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP DATABASE IF EXISTS bkt CASCADE")


def test_contamination_benchmark_side_broadcasts(spark, queries):
    plan = plan_of(queries["contamination_check"](spark, SF_DIR))
    # the benchmark gram set must broadcast into the semi join — the
    # candidate side (corpus-scale) must never shuffle for it
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_tfidf_document_frequency_broadcasts(spark, queries):
    plan = plan_of(queries["tfidf_topk"](spark, SF_DIR))
    # df (term -> doc count) is vocabulary-sized: broadcast, don't
    # shuffle the exploded term-frequency side on word
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_gap_fill_no_cartesian_and_pruned_scan(spark, queries):
    plan = plan_of(queries["gap_fill"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    # only ts and user_id should be read from events
    assert "props" not in scan and "event_type" not in scan


def test_funnel_stage_aggs_partial(spark, queries):
    plan = plan_of(queries["funnel_analysis"](spark, SF_DIR))
    assert "partial_min" in plan or "HashAggregate" in plan
    # the three stage counts are 1-row frames; their cross joins are
    # the deliberate scalar combination, never a data-scale cartesian
    assert plan.count("CartesianProduct") <= 2


def test_partitioned_write_prunes_partitions(spark, tmp_path, queries):
    """Partition-pruning proof: a filter on the partition column must
    become a PartitionFilter (directory pruning), never a data filter
    over the full scan."""
    from data_ingestors_spark.io.readers import load_table

    path = str(tmp_path / "orders_by_status")
    load_table(spark, SF_DIR, "orders").write.partitionBy("o_orderstatus").parquet(path)
    df = spark.read.parquet(path).filter("o_orderstatus = 'O'").select("o_orderkey")
    plan = plan_of(df)
    assert "PartitionFilters" in plan
    idx = plan.index("PartitionFilters")
    assert "o_orderstatus" in plan[idx : idx + 200]
    # the predicate is fully consumed by directory pruning: no data
    # filter remains (a pruned scan emits no PushedFilters section at
    # all, and no Filter node re-checks the partition column)
    assert "PushedFilters" not in plan
    assert "Filter" not in plan.replace("PartitionFilters", "")


def test_aqe_splits_skewed_join(spark):
    """Runtime skew handling: one join key carrying ~half the fact
    rows must be split by AQE's skew-join rule (skew=true in the
    final adaptive plan) once the partition exceeds the threshold."""
    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        from pyspark.sql import functions as F

        n = 200_000
        fact = spark.range(n).select(
            F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 64).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("v"),
        )
        dim = spark.range(64).select(F.col("id").alias("k"), F.lit("d").alias("dv"))
        joined = fact.join(dim, "k")
        # execute THIS df's plan (count() would plan a different query),
        # then read the adaptive plan in its final, post-execution state
        assert len(joined.collect()) == n
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_chunk_documents_zero_shuffle(spark, queries):
    # row-local array expressions: a projection over the scan, nothing
    # to shuffle (operators/text.py chunk_documents)
    plan = plan_of(queries["chunk_documents"](spark, SF_DIR), "simple")
    assert "Exchange" not in plan
    assert "Generate" in plan  # the inline() explode


def test_quality_filters_zero_shuffle(spark, queries):
    """gopher_quality and c4_filter are pure row-local let-bound
    array expressions — a projection over the scan, no Exchange."""
    for name in ("gopher_quality", "c4_filter"):
        plan = plan_of(queries[name](spark, SF_DIR), "simple")
        assert "Exchange" not in plan, name


def test_dup_line_stats_combiner_friendly(spark, queries):
    """Both reductions keyed on doc_id carry partial aggregation
    (map-side combine) and no window function rides the line text."""
    plan = plan_of(queries["dup_line_stats"](spark, SF_DIR), "simple")
    assert "Window" not in plan
    assert "partial" in plan.lower() or "HashAggregate" in plan


def test_dup_span_merge_no_window_on_span_string(spark, queries):
    """The islands window partitions by doc_id only; no join or
    window keyed on the span string survives in the plan (hot spans
    collapse map-side)."""
    plan = plan_of(queries["dup_span_merge"](spark, SF_DIR), "formatted")
    # every Window node must be the per-doc islands window
    for line in plan.splitlines():
        if "Arguments" in line and "windowspecdefinition" in line:
            assert "doc_id#" in line, line


def test_asof_direction_variants_same_shape(spark, queries):
    # forward/nearest share the backward plan's shape: union + window
    # over ONE key partitioning, never a range probe
    for name in ("asof_join_forward", "asof_join_nearest"):
        plan = plan_of(queries[name](spark, SF_DIR), "simple")
        assert "Window" in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_large_orders_broadcasts_qualifying_keys(spark, queries):
    # TPC-H Q18 shape: the tiny HAVING key set broadcasts into a semi
    # join; the fact tables never sort-merge against each other over
    # non-qualifying rows
    plan = plan_of(queries["large_orders"](spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_temperature_mix_quota_broadcasts(spark, queries):
    # quotas come from the tiny counts frame and broadcast back; the
    # only wide shuffle is the per-source window rank
    plan = plan_of(queries["temperature_mix"](spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "Window" in plan


# --- r5 TPC-H shape audits ----------------------------------------------

def test_forecast_revenue_predicates_push_and_prune(spark, queries):
    """Q6 is the canonical scan-side query: all three predicates reach
    the parquet scan and only the 4 touched columns are read."""
    plan = plan_of(queries["forecast_revenue"](spark, SF_DIR))
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan
    scan = plan[plan.index("ReadSchema"):].splitlines()[0]
    for col in ("l_orderkey", "l_returnflag", "l_tax", "l_partkey"):
        assert col not in scan, scan


def test_volume_shipping_broadcasts_both_nation_roles(spark, queries):
    """Q7 joins the nation dim twice under different aliases — both
    must broadcast; the fact side never shuffles for them."""
    plan = plan_of(queries["volume_shipping"](spark, SF_DIR), "simple")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_potential_promotion_semi_joins_broadcast(spark, queries):
    """Q20's nested INs decorrelate to two broadcast LEFT SEMI joins —
    the pruned part-key set into lineitem, the heavy-supplier set into
    supplier. Neither fact table shuffles for them."""
    plan = plan_of(queries["potential_promotion"](spark, SF_DIR), "simple")
    assert plan.count("LeftSemi") >= 2
    assert plan.count("BroadcastHashJoin") >= 2
    # the only suppkey exchange is the HAVING aggregate's own shuffle —
    # neither semi join repartitions a fact side
    assert plan.count("Exchange hashpartitioning(l_suppkey") <= 1
    assert "CartesianProduct" not in plan


def test_late_order_priority_semi_join_keeps_equi_key(spark, queries):
    """Q4's EXISTS with a non-equi date correlate must stay a hash
    semi join on the orderkey (the date residual evaluated post-match),
    never a nested-loop over the fact table."""
    plan = plan_of(queries["late_order_priority"](spark, SF_DIR), "simple")
    assert "LeftSemi" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_min_cost_supplier_decorrelates(spark, queries):
    """Q2's correlated scalar-min subquery must decorrelate into an
    aggregate + join — no per-row re-execution artifacts (no nested
    loop, no cartesian) in the physical plan."""
    plan = plan_of(queries["min_cost_supplier"](spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_join_is_binned_equi_join(spark, queries):
    """Fact-to-fact interval overlap must run as a shuffled EQUI-join
    on the (block, bin) key — never a nested-loop or cartesian, which
    is what a naive non-equi overlap condition degenerates to when
    neither side broadcasts."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = plan_of(queries["interval_join"](spark, SF_DIR), "simple")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cbo_table_statistics_feed_the_optimizer(spark, tmp_path):
    """SURVEY §4: ANALYZE TABLE statistics reach the cost-based
    optimizer — the optimized plan carries real rowCount/sizeInBytes
    estimates (what join reordering and broadcast decisions consume at
    scale), not unknowns."""
    confs = {
        "spark.sql.cbo.enabled": "true",
        "spark.sql.cbo.joinReorder.enabled": "true",
    }
    prev = {k: spark.conf.get(k) for k in confs}
    spark.sql(f"CREATE DATABASE IF NOT EXISTS cbo LOCATION '{tmp_path}/cbo'")
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        for t in ("orders", "customer"):
            spark.read.parquet(f"{SF_DIR}/{t}.parquet").write.mode("overwrite").saveAsTable(
                f"cbo.{t}"
            )
            spark.sql(f"ANALYZE TABLE cbo.{t} COMPUTE STATISTICS FOR ALL COLUMNS")

        n_orders = spark.table("cbo.orders").count()
        stats = spark.sql("DESC EXTENDED cbo.orders").filter(
            "col_name = 'Statistics'"
        ).collect()
        # ANALYZE recorded the exact row count in the catalog
        assert stats and f"{n_orders} rows" in stats[0].data_type, stats

        df = spark.sql(
            """
            SELECT c_mktsegment, count(*) AS n
            FROM cbo.orders o JOIN cbo.customer c ON o.o_custkey = c.c_custkey
            GROUP BY c_mktsegment
            """
        )
        plan = plan_of(df, "cost")
        # every relation node carries a rowCount estimate (the filters
        # adjust it below the raw count — that adjustment IS the CBO
        # working), and nothing is left at the unknown default
        import re

        counts = [int(m) for m in re.findall(r"rowCount=(\d+)", plan)]
        assert counts, "CBO estimates missing from the optimized plan"
        assert all(0 < c <= n_orders * 100 for c in counts), counts
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
        spark.sql("DROP DATABASE IF EXISTS cbo CASCADE")


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """Runtime row-level filtering: when a selective non-broadcast
    join's build side is small, the optimizer injects a bloom filter
    (bloom_filter_might_contain) on the probe side so fact rows that
    cannot match die at the scan instead of riding the shuffle — the
    10 TB-fact-vs-selective-dim shape. Thresholds are lowered so the
    rule fires at test scale; at real scale the defaults (10 MB build /
    10 GB probe) gate it the same way."""
    conf = spark.conf
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    )
    saved = {k: conf.get(k, None) for k in keys}
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        from data_ingestors_spark.queries.base import tables

        t = tables(spark, SF_DIR, "lineitem", "orders")
        sel = t["orders"].filter("o_orderpriority = '1-URGENT'").select("o_orderkey")
        joined = t["lineitem"].join(sel, t["lineitem"].l_orderkey == sel.o_orderkey)
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan[:2000]
        assert "bloom_filter_agg" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_heavy_hitters_verify_join_broadcasts(spark, queries):
    """The candidate verify pass must broadcast the (tiny) candidate
    set into a semi-join — never shuffle the token stream on the
    candidate key — and the final count must partial-aggregate."""
    plan = plan_of(queries["heavy_hitters"](spark, SF_DIR), "simple")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "partial_count" in plan or "HashAggregate" in plan


def test_pareto_frontier_no_self_join(spark, queries):
    """The skyline must be the window form: no join of part against
    part (the O(n^2) shape belongs to the oracle only) and the window
    must ride the distinct-price aggregate, not raw parts."""
    plan = plan_of(queries["pareto_frontier"](spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan
    # exactly one join: the frontier-prices lookup back to parts
    assert plan.count("Join") <= 2
    assert "Window" in plan


def test_zipf_no_global_vocab_sort(spark, queries):
    """Top-1000 selection must be a TakeOrdered (per-partition top-k +
    merge), not a full Sort of the vocabulary."""
    plan = plan_of(queries["zipf_fit"](spark, SF_DIR), "simple")
    assert "TakeOrderedAndProject" in plan


def test_ewma_zero_join(spark, queries):
    """EWMA is one per-user window + array HOF: no joins at all (the
    self-join formulation belongs to the oracle)."""
    plan = plan_of(queries["ewma"](spark, SF_DIR), "simple")
    assert "Join" not in plan
    assert "Window" in plan


def test_acf_single_sort_for_all_lags(spark, queries):
    """All three lag columns must come from ONE window sort — the plan
    carries exactly one Window node (lag-per-branch would show
    three)."""
    import re

    plan = plan_of(queries["acf"](spark, SF_DIR), "formatted")
    n_windows = len(re.findall(r"^\(\d+\) Window", plan, flags=re.M))
    assert n_windows == 1, plan


def test_snapshot_diff_pushes_date_filters(spark, queries):
    """Both snapshot date filters must reach the parquet scan."""
    plan = plan_of(queries["snapshot_diff"](spark, SF_DIR), "formatted")
    assert plan.count("PushedFilters: [IsNotNull(ts)") >= 1 or "ts" in plan
    assert "SortMergeJoin FullOuter" in plan or "full_outer" in plan.lower() or "FullOuter" in plan


def test_record_linkage_no_allpairs(spark, queries):
    """Candidates must come from the deletion-key equi-join; the
    customer table must never cross-join itself."""
    plan = plan_of(queries["record_linkage"](spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_collocations_bigrams_row_local(spark, queries):
    """Bigram generation must be a row-local zip (Generate over the
    scan) — no join builds the adjacency, and both count reductions
    partial-aggregate."""
    plan = plan_of(queries["collocations"](spark, SF_DIR), "simple")
    assert "Generate" in plan
    assert "partial_count" in plan or "HashAggregate" in plan


def test_dup_span_anti_join_never_broadcasts(spark, queries):
    """_dup_islands' anti-join right side (globally-unique window
    positions) is corpus-sized by construction; AQE's broadcast
    conversion reads COMPRESSED stage sizes and at the 100× synthetic
    sf10 it turned the '64 MB' side into >1 GiB of driver-built
    broadcast (spark.driver.maxResultSize kill). The merge hint must
    keep it a spill-safe sort-merge join."""
    for name in ("dup_span_merge", "strip_dup_spans"):
        plan = plan_of(queries[name](spark, SF_DIR), "simple")
        anti_lines = [l for l in plan.splitlines() if "LeftAnti" in l]
        assert anti_lines, (name, plan[:2000])
        assert all("SortMergeJoin" in l for l in anti_lines), (name, anti_lines)


def test_jaccard_bitmask_masks_are_materialized_scalars(spark, queries):
    """The bitmask Jaccard path must (a) carry masks as scalar long
    columns — an array<long> mask re-runs interpreted HOF folds per
    candidate row (33.8 s vs 3.8 s at the 10× sf1) — and (b) read
    them from a materialized (InMemoryTableScan) frame so Catalyst
    cannot collapse the mask construction into the join output."""
    from data_ingestors_spark.io.readers import load_table
    from data_ingestors_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, SF_DIR, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "text", "doc_id", "source", threshold=0.5, strategy="bitmask"
    )
    plan = plan_of(pairs, "simple")
    assert "InMemoryTableScan" in plan, plan[:2000]
    assert "bit_count" in plan and "mask0" in plan, plan[:2000]
    # the join output must not evaluate any aggregate() HOF per row
    assert "aggregate(" not in plan.split("InMemoryTableScan")[0], plan[:2000]


def test_adaptive_modulus_formula_cross_engine():
    """The corpus-adaptive sampling modulus (retrieval_eval /
    rrf_fusion / knn_label_noise, same device as blocking_audit) is
    computed integer-exactly from string lengths in BOTH engines; a
    float-log10 ULP could silently diverge the sampled sets. Assert
    Spark-SQL, DuckDB, and the intended closed form agree across the
    boundary region and several decades."""
    import duckdb

    def intended(n, base):
        import math
        ceil = -(-n // 2000)
        return base * 10 ** (len(str(ceil)) - 1)

    con = duckdb.connect()
    for n in (1, 199, 200, 1999, 2000, 2001, 19999, 20000, 20001,
              199999, 200000, 2_000_000):
        for base in (1, 50):
            duck = con.execute(
                f"SELECT {base} * CAST('1' || repeat('0', "
                f"length(CAST(({n} + 1999) // 2000 AS VARCHAR)) - 1) AS BIGINT)"
            ).fetchone()[0]
            assert duck == intended(n, base), (n, base, duck)


def test_adaptive_modulus_spark_matches_duckdb(spark):
    """Spark side of the modulus formula (repeat/length/DIV string
    device) returns the same value as DuckDB for the same row count."""
    from pyspark.sql import functions as F

    for n in (200, 2000, 2001, 20000, 200000):
        df = spark.range(n)
        got = df.agg(
            F.expr(
                "50 * CAST(concat('1', repeat('0', "
                "length(CAST((count(*) + 1999) DIV 2000 AS STRING)) - 1)) AS BIGINT)"
            ).alias("m")
        ).collect()[0]["m"]
        ceil = -(-n // 2000)
        assert got == 50 * 10 ** (len(str(ceil)) - 1), (n, got)
