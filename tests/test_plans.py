"""Physical-plan regression tests: the plan properties that make these
operators survive 100 TB must hold, not just be hoped for — column pruning
reaches the parquet scan, filters push down, dimension joins broadcast,
top-k never global-sorts, aggregations have a map-side partial phase.
"""

from __future__ import annotations

from toy_map_reduce_spark.plans import explain_str, plan_properties
from toy_map_reduce_spark.registry import get_spec


def plan_of(spark, sf_dir, name: str, mode: str = "formatted") -> str:
    return explain_str(get_spec(name).builder(spark, sf_dir), mode)


def test_no_accidental_cartesian_products(spark, sf_dir):
    # join_cross is the one intentional cross join; everything else must
    # plan a keyed join
    from toy_map_reduce_spark.registry import all_specs

    for name, spec in all_specs().items():
        if spec.tier == "S" or name == "join_cross":
            continue
        props = plan_properties(spec.builder(spark, sf_dir))
        assert not props["has_cartesian"], f"{name} plans CartesianProduct"


def test_scan_project_prunes_columns(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "scan_project")
    assert "ReadSchema" in plan
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    # only the 6 referenced columns may be read — never the full 11-column row
    for col in ("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax", "l_quantity"):
        assert col in read_schema
    for col in ("l_returnflag", "l_shipdate", "l_suppkey"):
        assert col not in read_schema, f"unpruned column {col} in {read_schema}"


def test_filter_pred_pushes_down(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "filter_pred")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, "no PushedFilters in scan"
    assert "GreaterThanOrEqual" in pushed[0] or "In(l_returnflag" in pushed[0], pushed[0]


def test_join_broadcast_is_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_broadcast")
    assert "BroadcastHashJoin" in plan


def test_small_dim_joins_broadcast_via_aqe_or_stats(spark, sf_dir):
    # part/customer are far below the broadcast threshold: no sort-merge
    plan = plan_of(spark, sf_dir, "join_semi")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan


def test_sort_limit_is_topk_not_global_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sort_limit")
    assert "TakeOrderedAndProject" in plan, "ORDER BY+LIMIT must plan per-partition top-k"


def test_wordcount_has_partial_aggregation(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "wordcount")
    # partial (map-side) + final HashAggregate — the combiner the reference
    # lacked (reference ships every pair through the shuffle)
    assert plan.count("HashAggregate") >= 2


def test_wordcount_codegen(spark, sf_dir):
    # formatted mode hides codegen spans pre-AQE; codegen mode reports them
    plan = plan_of(spark, sf_dir, "wordcount", mode="codegen")
    assert "WholeStageCodegen" in plan


def test_agg_basic_partial_final(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "agg_basic")
    assert plan.count("HashAggregate") >= 2


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # the whole point of the bucketed layout: join + same-key groupBy with
    # ZERO Exchange in the plan
    df = get_spec("join_bucketed").builder(spark, sf_dir)
    props = plan_properties(df)
    assert props["exchanges"] == 0, f"bucketed join must not shuffle: {props}"
    assert props["sort_merge_join"]


def test_sim_topk_broadcasts_queries(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "sim_topk")
    assert "Broadcast" in plan, "query side must broadcast — data side must never shuffle"


def test_dedup_near_is_bucket_keyed_not_allpairs(spark, sf_dir):
    # the LSH formulation must stay a keyed join on (band_id, band_hash);
    # a regression to all-pairs would show up as a cartesian/nested-loop
    plan = plan_of(spark, sf_dir, "dedup_near")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "band_hash" in plan, "join must key on the LSH bucket hash"


def test_dedup_simhash_pairs_is_block_keyed(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "dedup_simhash_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "block_val" in plan, "join must key on the pigeonhole block value"


def test_partitioned_sink_read_prunes_partitions(spark, sf_dir):
    # a filtered read over the Hive-partitioned sink must push the partition
    # predicate into PartitionFilters (skipping directories), not scan-all
    from pyspark.sql import functions as F

    from toy_map_reduce_spark.registry import get_spec

    get_spec("sink_partitioned_parquet").builder(spark, sf_dir)  # materialize sink
    from toy_map_reduce_spark.sources.io_ops import _scratch

    path = _scratch(sf_dir, "part_parquet")
    df = spark.read.parquet(path).where(F.col("o_orderstatus") == "F")
    plan = explain_str(df)
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf, "no PartitionFilters in scan"
    assert "o_orderstatus" in pf[0], pf[0]


def test_no_complex_typed_output_columns(spark, sf_dir):
    # the driver's canonicalizer hashes cells and cannot hash list/map/struct
    # values (round-1 CORRECTNESS errors) — every query surface must emit
    # only scalar columns. Streaming builders execute a full query lifecycle
    # per call, so S-tier is covered by the parity suite instead.
    from pyspark.sql.types import ArrayType, MapType, StructType

    from toy_map_reduce_spark.registry import all_specs

    offenders = []
    for name, spec in all_specs().items():
        if spec.tier == "S":
            continue
        for f in spec.builder(spark, sf_dir).schema.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, f.name, f.dataType.simpleString()))
    assert not offenders, offenders


def test_jaccard_df_cap_is_aggregate_not_window(spark, sf_dir):
    # the posting-list df count must be a partial+final aggregate feeding a
    # broadcast hot-shingle anti-join — a Window.partitionBy("shingle")
    # count would funnel the hottest shingle's entire posting list into one
    # task before counting, the exact skew the cap exists to defuse
    for name in ("dedup_ngram_jaccard", "dedup_near_verified"):
        plan = plan_of(spark, sf_dir, name)
        assert "Window" not in plan, f"{name}: df cap regressed to a Window"
        assert "HashAggregate" in plan, f"{name}: df count must be an aggregate"
        assert "LeftAnti" in plan and "Broadcast" in plan, (
            f"{name}: hot-shingle filter must be a broadcast anti-join"
        )


def test_dedup_incremental_first_wins_is_aggregate_not_window(spark, sf_dir):
    # within-batch first-wins must be a partial-aggregated argmin
    # (groupBy(h).agg(min_by)) — a row_number window partitioned by the
    # content hash would funnel every replica of a hot hash into one task,
    # the same skew the jaccard df cap defuses
    plan = plan_of(spark, sf_dir, "dedup_incremental")
    assert "Window" not in plan, "first-wins regressed to a Window"
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan, (
        "first-wins must be an aggregate"
    )
    assert "LeftAnti" in plan, "corpus screen must stay an anti-join"


def test_dpp_join_prunes_partitions_dynamically(spark, sf_dir):
    # the fact scan must carry a runtime dynamicpruning subquery on the
    # partition column — without it the join reads every partition and DPP
    # (the biggest I/O lever on a partitioned fact) is silently lost
    plan = plan_of(spark, sf_dir, "join_dpp_partitioned")
    assert "dynamicpruning" in plan.lower(), "no dynamic partition pruning in plan"


def test_tpch_q5_broadcasts_dimensions(spark, sf_dir):
    # the 6-way join must broadcast the small dims (nation/region/supplier
    # at minimum), never shuffle-hash-join them against the fact chain
    plan = plan_of(spark, sf_dir, "sql_tpch_q5")
    assert "BroadcastHashJoin" in plan, "no broadcast join in Q5 plan"
    assert "PushedFilters" in plan or "Filter" in plan


def test_tpch_q6_filters_reach_scan_and_prune(spark, sf_dir):
    # Q6 is the pushdown showcase: no join, so the whole cost is the scan
    # — the shipdate/discount/quantity filters must appear as
    # PushedFilters and only the 4 referenced columns may be read
    plan = plan_of(spark, sf_dir, "sql_tpch_q6")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, "Q6 scan has no PushedFilters"
    assert "l_shipdate" in pushed[0] and "l_discount" in pushed[0], pushed[0]
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("l_returnflag", "l_orderkey", "l_tax"):
        assert col not in read_schema, f"unpruned column {col} in Q6 scan"


def test_tpch_q19_or_of_ands_stays_hash_join(spark, sf_dir):
    # Catalyst must extract the common p_partkey = l_partkey equi-key from
    # the OR arms: a nested-loop plan here is quadratic at 100 TB
    plan = plan_of(spark, sf_dir, "sql_tpch_q19")
    assert "BroadcastNestedLoopJoin" not in plan, "Q19 degraded to nested-loop"
    assert "HashJoin" in plan, "Q19 lost its equi-join"


def test_tpch_q17_decorrelated_agg_has_partials(spark, sf_dir):
    # the per-part avg-quantity aggregate must run partial+final so the
    # hot-part key never concentrates raw rows in one task
    plan = plan_of(spark, sf_dir, "sql_tpch_q17")
    assert "partial_" in plan or "HashAggregate" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_theta_tier_is_broadcast_nested_loop(spark, sf_dir):
    # a pure non-equi join must broadcast the tiny literal side and stream
    # the fact — never shuffle (no key to shuffle on) and never cartesian
    plan = plan_of(spark, sf_dir, "join_theta_tier")
    assert "BroadcastNestedLoopJoin" in plan, "theta join must broadcast the tier table"
    assert "CartesianProduct" not in plan


def test_cooccurrence_topn_is_topk(spark, sf_dir):
    # the corpus-wide top-100 must plan per-partition top-k + merge,
    # never a global sort of the full pair table
    plan = plan_of(spark, sf_dir, "text_cooccurrence")
    assert "TakeOrderedAndProject" in plan


def test_sample_weighted_broadcasts_weights(spark, sf_dir):
    # the k-row per-language weight table must broadcast onto the corpus
    plan = plan_of(spark, sf_dir, "sample_weighted")
    assert "BroadcastHashJoin" in plan


def test_bitmap_distinct_has_partial_aggregation(spark, sf_dir):
    # both aggregate levels must show map-side partials (the whole point
    # of the bitmap formulation is mergeable partial state)
    plan = plan_of(spark, sf_dir, "agg_bitmap_distinct")
    assert plan.count("HashAggregate") >= 4  # 2 levels × (partial + final)


def test_tpch_q9_broadcasts_dims(spark, sf_dir):
    # part/supplier/nation are dimension-sized: the fact side must join
    # them via broadcast, keeping lineitem's only shuffle for orders
    plan = plan_of(spark, sf_dir, "sql_tpch_q9")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_sorted_clustered_scan_pushes_date_filter(spark, sf_dir):
    # the whole point of the sorted layout: the range predicate must reach
    # the parquet reader as PushedFilters so row-group stats can skip
    plan = plan_of(spark, sf_dir, "sink_sorted_clustered")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed and "l_shipdate" in pushed[-1], pushed


def test_feature_scale_broadcasts_fit_stats(spark, sf_dir):
    # fit = tiny per-group stats; transform must broadcast them over the
    # fact scan — the fact side never shuffles
    plan = plan_of(spark, sf_dir, "feature_scale")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ngram_novelty_first_seen_is_aggregate_not_window(spark, sf_dir):
    # first-occurrence must be a partial+final aggregate on the trigram
    # key, never a Window over it (hot boilerplate trigram = straggler) —
    # same rule as capped_shingles
    plan = plan_of(spark, sf_dir, "text_ngram_novelty")
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2


def test_sketch_count_min_no_window_no_cartesian(spark, sf_dir):
    # the counter build is pure keyed aggregation; estimation joins the
    # 4-cells-per-word rows against the broadcast counter table
    plan = plan_of(spark, sf_dir, "sketch_count_min")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_scd2_lookup_plans_keyed_join(spark, sf_dir):
    # the validity-interval predicate must ride on the custkey equi join,
    # not degrade the plan to a nested-loop over both sides
    plan = plan_of(spark, sf_dir, "join_scd2_lookup")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_remove_boilerplate_plans_aggregate_broadcast(spark, sf_dir):
    # chunk df must be a partial+final aggregate on the chunk key (never a
    # Window — a hot boilerplate chunk would straggle one task), and the
    # top-K list must come back as a broadcast join over the chunk rows
    plan = plan_of(spark, sf_dir, "text_remove_boilerplate")
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_drift_fit_stats_broadcast_not_window(spark, sf_dir):
    # PSI totals and the target-encoder fit are one-row / segment-row
    # aggregates broadcast over the fact scan — the fact rows never feed
    # a whole-partition window
    for name in ("stat_psi", "feature_target_encode"):
        plan = plan_of(spark, sf_dir, name)
        assert "Window" not in plan, name
        assert "HashAggregate" in plan, name


def test_ks_windows_over_distinct_values_only(spark, sf_dir):
    # the cumulative ECDF window must run over the groupBy(value)
    # aggregate (one row per distinct value), so an aggregate appears
    # below the window in the plan
    plan = plan_of(spark, sf_dir, "stat_ks_test")
    assert "Window" in plan
    assert plan.count("HashAggregate") >= 2


def test_asof_nearest_single_window_pass(spark, sf_dir):
    # both directional carries share one partition+ordering, so the plan
    # must contain exactly one Window operator (one sort, one pass) and
    # no join at all on the fact rows
    plan = plan_of(spark, sf_dir, "join_asof_nearest", mode="simple")
    assert plan.count("Window") == 1
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_monitoring_thresholds_broadcast_not_window(spark, sf_dir):
    # anomaly mean/std must come from a one-row aggregate broadcast over
    # the daily rollup, never a whole-partition window over it
    plan = plan_of(spark, sf_dir, "events_anomaly_days")
    assert "Window" not in plan
    assert "HashAggregate" in plan


def test_blocked_joins_no_cross_product(spark, sf_dir):
    # fuzzy and geo joins must plan keyed candidate joins (the whole
    # point of blocking) with the small exploded side broadcast
    for name in ("join_fuzzy_block", "join_geo_radius"):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "BroadcastHashJoin" in plan, name


def test_runtime_bloom_filter_is_injected(spark, sf_dir):
    # under production-scale thresholds (the app-side size floor lowered,
    # since fixture scans are tiny) the optimized plan must carry the
    # might_contain runtime filter on the lineitem side — the injected
    # Bloom semi-join filter that makes shuffle volume track selectivity
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        df = get_spec("join_runtime_bloom").builder(spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "runtime Bloom filter not injected"
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_coalesces_small_shuffle_partitions(spark, sf_dir):
    # the session enables AQE + partition coalescing; a tiny groupBy must
    # not execute 32 near-empty reducers — after execution the final plan
    # carries AQEShuffleRead with fewer partitions than configured
    from pyspark.sql import functions as F

    from toy_map_reduce_spark.tables import load

    df = (
        load(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    df.collect()  # execute THIS DataFrame's QueryExecution so AQE finalizes it
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in final, "AQE partition coalescing not active"


def test_substring_df_check_is_aggregate_not_hash_window(spark, sf_dir):
    # the cross-doc df>=2 check must be a partial+final aggregate keyed on
    # the window hash (uniform key, combiner-collapsed) — a Window over the
    # hash would funnel a boilerplate span's full posting list into one
    # task; the only Window allowed is the per-doc longest-run scan
    plan = plan_of(spark, sf_dir, "dedup_substring")
    assert "windowspecdefinition(h#" not in plan, (
        "substring df check regressed to a Window over the span hash"
    )
    assert "Keys [1]: [h#" in plan, "df>=2 must be an aggregate keyed on the hash"
    assert "CartesianProduct" not in plan


def test_zorder_buckets_are_bounded_boxes(spark, sf_dir):
    # the point of a z-layout: fixing the z-value's top 8 bits fixes the
    # high nibble of BOTH dimensions, so every 256-wide z-bucket must be a
    # 16×16 box — if either span exceeds 15 the bit interleave is broken
    # and two-dimensional file pruning silently degrades to one dimension
    from toy_map_reduce_spark.registry import get_spec

    rows = get_spec("sink_zorder").builder(spark, sf_dir).collect()
    assert rows, "z-order report is empty"
    for r in rows:
        assert 0 <= r.span_x <= 15 and 0 <= r.span_y <= 15, (
            f"bucket {r.z_bucket}: spans ({r.span_x}, {r.span_y}) exceed the 16×16 box"
        )


def test_token_budget_doc_window_is_bucket_partitioned(spark, sf_dir):
    # the per-document running sum must be partitioned by the score bucket
    # (bounded state); only the ~20-row bucket-offset window may be global.
    # A corpus-wide unpartitioned doc window here would funnel every row
    # through one task — the exact pattern this operator exists to avoid
    plan = plan_of(spark, sf_dir, "pipeline_token_budget")
    assert "windowspecdefinition(bkt#" in plan, (
        "per-doc budget window lost its bucket partitioning"
    )


def test_meta_plan_report_invariants(spark, sf_dir):
    # the self-audit surface must agree with what the plan tests pin:
    # no cartesian products anywhere, no Python UDFs on relational paths,
    # broadcast present where small dims join, partial aggs on wordcount
    from toy_map_reduce_spark.registry import get_spec

    rows = {r.query: r for r in get_spec("meta_plan_report").builder(spark, sf_dir).collect()}
    assert set(rows) == {
        "wordcount", "sql_tpch_q5", "dedup_exact", "join_broadcast",
        "sim_topk", "dedup_ngram_jaccard", "agg_basic", "filter_pred",
    }
    assert not any(r.has_cartesian for r in rows.values())
    assert rows["join_broadcast"].broadcast_join
    assert rows["wordcount"].n_hash_aggregates >= 2  # partial + final
    assert not rows["sql_tpch_q5"].python_udf
    assert not rows["dedup_exact"].python_udf


def test_meta_registry_report_matches_registry(spark, sf_dir):
    from toy_map_reduce_spark.registry import all_specs, get_spec

    rows = {r.tier: r for r in get_spec("meta_registry_report").builder(spark, sf_dir).collect()}
    specs = all_specs().values()
    for tier in {s.tier for s in specs}:
        subset = [s for s in specs if s.tier == tier]
        assert rows[tier].n_queries == len(subset)
        assert rows[tier].n_oracle_backed == sum(1 for s in subset if s.oracle)
        assert rows[tier].n_bench_eligible == sum(1 for s in subset if s.bench)
    assert sum(r.n_queries for r in rows.values()) == len(list(specs))


def test_ntile_family_has_no_global_window(spark, sf_dir):
    # r4 verdict item 3: no fact scan may feed a Window with an empty
    # partition spec (the single-task global sort). The two equi-depth
    # histograms need no Window at all (pure order statistics); the
    # calibration bins may keep one Window but ONLY hash-partitioned by
    # the score tie class.
    for name in ("feature_quantile_bucket", "agg_histogram_equidepth"):
        plan = plan_of(spark, sf_dir, name)
        assert "Window" not in plan, f"{name}: regressed to a Window plan"
        assert "HashAggregate" in plan or "ObjectHashAggregate" in plan, (
            f"{name}: boundaries must come from partial aggregates"
        )
    plan = plan_of(spark, sf_dir, "stat_calibration_bins", mode="simple")
    for line in plan.splitlines():
        if "Window [" in line:
            assert "score" in line, (
                "stat_calibration_bins: Window must be partitioned by the "
                f"score tie class, got: {line.strip()}"
            )


def test_percentile_family_joins_stay_hash_not_nested_loop(spark, sf_dir):
    # the bracketed-window core attaches its one-row bounds via a
    # constant-key BroadcastHashJoin; a plain crossJoin(broadcast(...))
    # regresses to a BroadcastNestedLoopJoin whose projections run
    # interpreted outside whole-stage codegen (measured 4x slower at 20
    # targets) — pin the join strategy
    for name in (
        "agg_percentile",
        "agg_trimmed_mean",
        "feature_quantile_bucket",
        "agg_histogram_equidepth",
        "stat_calibration_bins",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastHashJoin" in plan, f"{name}: bounds join lost hash form"
        # COUNT, don't just spot-check (r5 advisor: a foldable lit(1) key
        # degenerated one join to BNLJ while this test passed because a
        # BroadcastHashJoin existed deeper in the plan): since the fused
        # scaffold every bounds attachment is a non-foldable constant-key
        # hash join, so NO BroadcastNestedLoopJoin may appear at all.
        assert plan.count("BroadcastNestedLoopJoin") == 0, (
            f"{name}: {plan.count('BroadcastNestedLoopJoin')} nested-loop "
            "join(s) — a bounds join key folded to a literal"
        )


def test_cc_loop_checkpoint_bounds_lineage(spark):
    """min_label_propagation must localCheckpoint every CC_CHECKPOINT_EVERY
    rounds so the label frame's plan depth stays bounded by the checkpoint
    interval instead of growing one join per round (r5 verdict item 4):
    drive a path graph of diameter 11 (needs ~11 propagation rounds, i.e.
    2+ checkpoints) and assert both the clustering answer and that the
    FINAL plan contains at most one checkpoint-window's worth of joins."""
    from pyspark.sql import functions as F

    from toy_map_reduce_spark.operators.pipeline import (
        CC_CHECKPOINT_EVERY,
        min_label_propagation,
    )

    n = 12  # path 0-1-2-...-11: min-label needs ~diameter rounds
    docs = spark.range(n).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)] + [(100, 101)], ["doc_a", "doc_b"]
    )
    docs = docs.union(spark.createDataFrame([(100,), (101,), (200,)], ["doc_id"]))

    out = min_label_propagation(docs, pairs)
    got = {r.doc_id: r.label for r in out.collect()}
    assert all(got[i] == 0 for i in range(n)), got  # whole path collapses
    assert got[100] == 100 and got[101] == 100
    assert got[200] == 200  # singleton keeps its own label

    # lineage bound: >= 11 rounds ran, but the returned frame's plan must
    # start from the last checkpoint. Each un-truncated round REFERENCES
    # the prior labels frame twice (the left join and inside
    # neighbor_min), so join count grows as J(k) = 2 + 2*J(k-1) — i.e.
    # EXPONENTIALLY (2^(k+1) - 2) in rounds since the last checkpoint,
    # which is precisely why persist() alone cannot stand in for
    # checkpointing. Worst case CC_CHECKPOINT_EVERY-1 = 4 un-truncated
    # rounds -> J(4) = 30; without checkpoints 12+ rounds would exceed
    # 8000 joins.
    bound = 2 ** CC_CHECKPOINT_EVERY - 2
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    n_joins = plan.count("Join")
    assert n_joins <= bound, (
        f"label lineage holds {n_joins} joins (> {bound}) — checkpoint "
        "not truncating"
    )
    assert "LogicalRDD" in plan or "ExistingRDD" in plan or "Scan" in plan


def _empty_partition_window_specs(plan: str) -> list[str]:
    """windowspecdefinition(...) occurrences whose PARTITION list is empty.

    In explain output the spec's arguments are partition columns (bare
    expressions) followed by order columns (carrying ASC/DESC), then the
    frame. An empty partition spec therefore shows an ASC/DESC marker (or
    the frame itself) in the FIRST argument — the single-task global-sort
    shape."""
    specs = []
    rest = plan
    while "windowspecdefinition(" in rest:
        rest = rest.split("windowspecdefinition(", 1)[1]
        first_arg = rest.split(",", 1)[0]
        if " ASC" in first_arg or " DESC" in first_arg or "specifiedwindowframe" in first_arg:
            specs.append(first_arg.strip())
    return specs


def test_global_order_queries_are_range_partitioned(spark, sf_dir):
    """The global-order family (Pareto/ABC, Gini, RFM ntiles, shard
    assignment, sequence packing, curriculum bands, weighted median) must
    rank via the distributed range-partitioned shape (functions/ranks.py):
    a RangePartitioning exchange over the data, ranks computed within
    pids, and the ONLY empty-partition window ordering by the per-pid
    offsets table's _pid — never a single-task sort of the corpus."""
    for name in (
        "orders_pareto_abc",
        "orders_gini",
        "orders_rfm",
        "shard_assign",
        "pack_sequences",
        "pipeline_curriculum_order",
        "agg_weighted",
    ):
        plan = plan_of(spark, sf_dir, name, mode="simple")
        assert "rangepartitioning" in plan.lower(), (
            f"{name}: no RangePartitioning exchange — global order lost "
            "its distributed-sort shape"
        )
        for spec in _empty_partition_window_specs(plan):
            assert "_pid" in spec, (
                f"{name}: empty-partition window over {spec!r} — a "
                "single-task global sort regressed into the plan"
            )


def test_bfs_levels_builds_from_frontier_side(spark, sf_dir):
    """Iterative-join broadcast discipline (r7 BFS fix, graph.py): every
    frontier-expansion join and visited anti-join must hash-build from
    the bounded frontier/visited side. Spark has no stats on the tiny
    loop-carried frames and was planning BuildLeft over the CACHED EDGE
    RELATION — hash-building the corpus side, plus SortMergeJoin for the
    anti-join (two exchanges + sorts per level). The explicit F.broadcast
    hints flip every level to BuildRight / broadcast anti-join; this pin
    fails if a future change reverts the build side."""
    plan = plan_of(spark, sf_dir, "graph_bfs_levels", mode="simple")
    assert "BuildLeft" not in plan, (
        "graph_bfs_levels: a join hash-builds its LEFT (edge/corpus) "
        "side — the frontier broadcast hint regressed"
    )
    assert "SortMergeJoin" not in plan, (
        "graph_bfs_levels: a sort-merge join appeared — the visited "
        "anti-join lost its zero-shuffle broadcast shape"
    )
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_recursive_cte_hints_broadcast_frontier():
    """sql_recursive_cte's recursive step must carry the BROADCAST(r)
    hint (same build-side discipline as graph_bfs_levels — UnionLoop
    replans the body per iteration with no stats on the recursion ref;
    measured ~2x at sf0.1). The hint is a standard block comment, so the
    DuckDB twin runs the byte-identical text; parity stays the equality
    check, this pins the plan intent."""
    from toy_map_reduce_spark.operators.graph import _RECURSIVE_CTE_SQL

    assert "/*+ BROADCAST(r) */" in _RECURSIVE_CTE_SQL


def test_agg_weighted_ranks_distinct_value_aggregate(spark, sf_dir):
    """The exact weighted median must rank the (flag, price) -> sum(qty)
    aggregate, never the raw fact feed (r7 verdict task 1): the range
    shuffle is then bounded by |distinct prices| instead of |lineitem|.
    Distinguishing signature: the r7 fact-feed form carried the
    l_orderkey/l_linenumber tiebreak columns through the rank — the
    aggregate form has no business mentioning either — and the rank
    input must be the (l_returnflag, l_extendedprice)-keyed aggregate."""
    plan = plan_of(spark, sf_dir, "agg_weighted", mode="simple")
    assert "l_orderkey" not in plan and "l_linenumber" not in plan, (
        "agg_weighted: fact-grain tiebreak columns reappeared in the "
        "plan — the rank input regressed from the distinct-value "
        "aggregate back to the raw lineitem feed"
    )
    import re

    assert re.search(
        r"HashAggregate\(keys=\[l_returnflag#\d+, (?:knownfloatingpointnormalized\()?"
        r"(?:normalizenanandzero\()?l_extendedprice", plan
    ), (
        "agg_weighted: no (l_returnflag, l_extendedprice)-keyed "
        "aggregate in the plan — the distinct-value table feeding the "
        "rank is gone"
    )


def test_zipf_topk_is_take_ordered_not_global_rank(spark, sf_dir):
    # the top-200 vocabulary slice must plan as distributed top-k; a
    # row_number window over the whole vocabulary would single-task it
    plan = plan_of(spark, sf_dir, "text_zipf_slope", mode="simple")
    # the rank window that remains runs over the 200-row TakeOrdered
    # output, which is what makes its empty partition spec acceptable
    assert "TakeOrderedAndProject" in plan


def test_no_single_partition_exchange_feeds_from_raw_scan(spark, sf_dir):
    # The registry-wide generalization of the exact-rank rewrites
    # (functions/ranks.py): an Exchange SinglePartition whose subtree
    # contains a file scan with NO aggregate in between funnels raw
    # corpus rows through ONE task — the canonical 100 TB bottleneck.
    # scripts/plan_audit.py triaged all non-streaming plans (r6): 100
    # queries carry SinglePartition exchanges, every one fed by a
    # cardinality-bounding aggregate (bounds tables, per-pid offsets,
    # final summaries). This pin keeps the risky set empty.
    from toy_map_reduce_spark.plans import (
        build_side_risk,
        missed_broadcast,
        single_partition_sites,
    )
    from toy_map_reduce_spark.registry import all_specs

    risky: list[str] = []
    grain_risky: list[tuple[str, list]] = []
    build_risky: list[tuple[str, list]] = []
    shuffle_risky: list[tuple[str, list]] = []
    for name, spec in all_specs().items():
        if spec.tier == "S":
            continue
        plan = explain_str(spec.builder(spark, sf_dir), "simple")
        sites = single_partition_sites(plan)
        if any(x["raw_corpus_risk"] for x in sites):
            risky.append(name)
        # r7: the advisor's false-negative class — an aggregate whose
        # group keys are corpus-grain (word, doc_id, custkey, ...) bounds
        # nothing, so a single-partition exchange above it is the same
        # 100 TB funnel with one hop of camouflage. Audited r7: zero
        # sites registry-wide; this keeps the set empty. r9: the
        # classifier walks the parsed plan tree, so the list can also
        # carry "<unbounded-branch>" — a join branch whose raw scan
        # reaches the funnel with no bound of its own.
        hits = [x["corpus_grain_keys"] for x in sites if x["corpus_grain_keys"]]
        if hits:
            grain_risky.append((name, hits))
        # r9 (r8 verdict task 2): the r7 BFS bug class registry-wide — a
        # broadcast join must never hash-build from a persisted corpus
        # relation while streaming a stats-less literal past it. Audited
        # r9: zero sites; this keeps the set empty.
        brisk = build_side_risk(plan)
        if brisk:
            build_risky.append((name, brisk))
        # r10 (r9 verdict task 4): the INVERSE of build_side_risk — a
        # SortMergeJoin/ShuffledHashJoin whose one side only scans a
        # constant-cardinality dim (region 5 rows, nation 25 at every
        # SF) shuffles the fact table to meet a table a broadcast would
        # have met at the scan. Audited r10: zero sites registry-wide;
        # this keeps the set empty.
        mb = missed_broadcast(plan)
        if mb:
            shuffle_risky.append((name, mb))
    assert not risky, (
        f"single-partition exchange over an unaggregated scan in: {risky} "
        "— rewrite with functions/ranks.py or aggregate before the funnel"
    )
    assert not grain_risky, (
        f"single-partition exchange fed by a CORPUS-GRAIN-keyed aggregate "
        f"in: {grain_risky} — the aggregate bounds nothing; rewrite with "
        "functions/ranks.py, top-k, or a genuinely bounding aggregate"
    )
    assert not build_risky, (
        f"broadcast join hash-builds from a persisted corpus relation in: "
        f"{build_risky} — hint F.broadcast on the bounded side "
        "(graph.py:246-254 is the canonical fix)"
    )
    assert not shuffle_risky, (
        f"shuffle join over an always-small dimension table in: "
        f"{shuffle_risky} — F.broadcast the dim side instead of shuffling "
        "the fact table to meet a constant-cardinality table"
    )


def test_multimodal_features_single_python_boundary(spark, sf_dir):
    # r14 fusion (guide §4.2/§4.5): synth + decode run in ONE mapInPandas
    # pass, so the payload blob never crosses the Arrow boundary — the r13
    # shape chained two MapInPandas nodes and serialized every blob
    # Python -> JVM -> Python with no JVM work in between. This pins the
    # fused shape: exactly one Python eval node, and no shuffle.
    plan = plan_of(spark, sf_dir, "multimodal_features", mode="simple")
    assert plan.count("MapInPandas") == 1, plan
    assert "Exchange" not in plan, "decode pass must stay narrow"


def test_no_row_python_udf_outside_udf_surface(spark, sf_dir):
    # "Python only off the hot path": row-at-a-time Python UDFs
    # (BatchEvalPython — each row round-trips pickled through a Python
    # worker) exist ONLY in operators/udf_surface.py, where demonstrating
    # the reference's UDF surface IS the deliverable. Everything else is
    # JVM column expressions or Arrow-batched pandas exchange
    # (ArrowEvalPython / MapInPandas / MapInArrow — the sanctioned slow
    # path). This sweep pins the claim registry-wide.
    from toy_map_reduce_spark.registry import all_specs

    allowed = {"udf_surface", "udtf_surface", "udf_grouped_map", "udtf_table_arg"}
    offenders: list[str] = []
    for name, spec in all_specs().items():
        if spec.tier == "S" or name in allowed:
            continue
        plan = explain_str(spec.builder(spark, sf_dir), "simple")
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert not offenders, (
        f"row-at-a-time Python UDF (BatchEvalPython) leaked into: {offenders}"
    )


def test_dedup_clusters_reliable_checkpoint_mode(spark, tmp_path):
    """min_label_propagation's reliable-checkpoint option (r6 verdict item
    5): with reliable_checkpoint_dir set the loop must (a) actually write
    RDD checkpoints into the given dir — the executor-loss-tolerant mode a
    real cluster wants — and (b) converge to the identical clustering the
    default localCheckpoint mode produces, with the same bounded lineage."""
    import os

    from pyspark.sql import functions as F

    from toy_map_reduce_spark.operators.pipeline import (
        CC_CHECKPOINT_EVERY,
        min_label_propagation,
    )

    n = 12  # path graph: needs > CC_CHECKPOINT_EVERY rounds => 2+ checkpoints
    docs = spark.range(n).select(F.col("id").alias("doc_id")).union(
        spark.createDataFrame([(100,), (101,), (200,)], ["doc_id"])
    )
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)] + [(100, 101)], ["doc_a", "doc_b"]
    )

    ckpt_dir = str(tmp_path / "cc_ckpt")
    local = {r.doc_id: r.label for r in min_label_propagation(docs, pairs).collect()}
    reliable_df = min_label_propagation(
        docs, pairs, reliable_checkpoint_dir=ckpt_dir
    )
    reliable = {r.doc_id: r.label for r in reliable_df.collect()}

    assert reliable == local
    assert all(reliable[i] == 0 for i in range(n))
    assert reliable[100] == 100 and reliable[101] == 100 and reliable[200] == 200

    # the reliable mode must have materialized checkpoint data on disk
    ckpt_files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(ckpt_dir)
        for f in fs
    ]
    assert ckpt_files, "reliable mode wrote no checkpoint files"

    # lineage stays bounded in reliable mode too
    bound = 2 ** CC_CHECKPOINT_EVERY - 2
    plan = reliable_df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") <= bound


def test_corpus_grain_classifier_parsing():
    """Pure-string behavior of the corpus-grain classifier (no Spark):
    group keys parse out of the bounding aggregate, expr-id suffixes
    strip, bounded keys don't flag, and a TakeOrderedAndProject above
    the aggregate exempts the site (top-k bounds rows regardless of key
    grain)."""
    from toy_map_reduce_spark.plans.explain import (
        _corpus_grain_keys,
        single_partition_sites,
    )

    # corpus-grain keyed aggregate feeding the funnel -> flagged
    plan = "\n".join([
        "Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]",
        "+- HashAggregate(keys=[word#12, lang#3], functions=[count(1)])",
        "   +- FileScan parquet [text#1]",
    ])
    sites = single_partition_sites(plan)
    assert len(sites) == 1
    assert sites[0]["aggregated_below"] and sites[0]["feeds_from_scan"]
    assert sites[0]["corpus_grain_keys"] == ["word"]

    # top-k between the aggregate and the exchange -> exempt
    plan_topk = "\n".join([
        "Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]",
        "+- TakeOrderedAndProject(limit=200, ...)",
        "   +- HashAggregate(keys=[word#12], functions=[count(1)])",
        "      +- FileScan parquet [text#1]",
    ])
    assert single_partition_sites(plan_topk)[0]["corpus_grain_keys"] == []

    # bounded group keys -> clean
    assert _corpus_grain_keys([
        "+- HashAggregate(keys=[l_returnflag#5, _pid#9], functions=[sum(x#2)])",
        "   +- FileScan parquet [x#2]",
    ]) == []

    # multiple corpus-grain keys, sorted, deduped by name
    assert _corpus_grain_keys([
        "+- ObjectHashAggregate(keys=[doc_id#1L, shingle#2], functions=[...])",
    ]) == ["doc_id", "shingle"]

    # ALIASED corpus-grain key (r7 verdict task 6): `custkey AS ck` must
    # resolve through the expr-id rename chain and still flag
    assert _corpus_grain_keys([
        "+- HashAggregate(keys=[ck#50L], functions=[count(1)])",
        "   +- Project [o_custkey#3L AS ck#50L]",
        "      +- FileScan parquet [o_custkey#3L]",
    ]) == ["o_custkey"]

    # two-hop alias chain: custkey -> ck -> k
    assert _corpus_grain_keys([
        "+- HashAggregate(keys=[k#60L], functions=[count(1)])",
        "   +- Project [ck#50L AS k#60L]",
        "      +- Project [o_custkey#3L AS ck#50L]",
        "         +- FileScan parquet [o_custkey#3L]",
    ]) == ["o_custkey"]

    # self-alias (normalize wrappers) must not loop or mis-resolve
    assert _corpus_grain_keys([
        "+- HashAggregate(keys=[knownfloatingpointnormalized("
        "normalizenanandzero(price#5)) AS price#5], functions=[sum(w#2)])",
    ]) == []

    # TakeOrderedAndProject in a SIBLING join branch does NOT exempt
    # (r7 advisor): it bounds that branch, not the exchange's input —
    # the corpus-grain aggregate in the other branch still flags
    assert _corpus_grain_keys([
        "+- BroadcastHashJoin [id#1L], [id#9L], Inner, BuildRight",
        "   :- TakeOrderedAndProject(limit=10, ...)",
        "   :  +- FileScan parquet [id#1L]",
        "   +- HashAggregate(keys=[doc_id#9L], functions=[count(1)])",
        "      +- FileScan parquet [doc_id#9L]",
    ]) == ["doc_id"]

    # ...but a top-k ON the direct chain still exempts even when a
    # branching join sits below it
    assert _corpus_grain_keys([
        "+- TakeOrderedAndProject(limit=200, ...)",
        "   +- BroadcastHashJoin [a#1L], [doc_id#9L], Inner, BuildRight",
        "      :- FileScan parquet [a#1L]",
        "      +- HashAggregate(keys=[doc_id#9L], functions=[count(1)])",
        "         +- FileScan parquet [doc_id#9L]",
    ]) == []

    # r9 (the r8 verdict's fixture): a join whose SIBLING branch contains
    # the only aggregate must not let that aggregate pass as the bound —
    # the other branch's raw scan reaches the funnel unbounded. The old
    # flat pre-order fallback returned [] here (bounded keys, benign);
    # the tree walk flags the raw branch.
    assert _corpus_grain_keys([
        "+- BroadcastHashJoin [id#1L], [id#9L], Inner, BuildRight",
        "   :- FileScan parquet [id#1L]",
        "   +- HashAggregate(keys=[n#9L], functions=[count(1)])",
        "      +- FileScan parquet [doc_id#9L]",
    ]) == ["<unbounded-branch>"]

    # semi/anti join output is a subset of the LEFT input: a bounded left
    # branch bounds the site even though the right branch scans raw
    assert _corpus_grain_keys([
        "+- BroadcastHashJoin [id#1L], [id#9L], LeftAnti, BuildRight",
        "   :- HashAggregate(keys=[n#1L], functions=[count(1)])",
        "   :  +- FileScan parquet [id#1L]",
        "   +- FileScan parquet [id#9L]",
    ]) == []

    # ...and an inner join with BOTH branches bounded unions the grain
    # keys across branches (either corpus-grain key defeats the bound)
    assert _corpus_grain_keys([
        "+- SortMergeJoin [a#1L], [b#9L], Inner",
        "   :- HashAggregate(keys=[doc_id#1L], functions=[count(1)])",
        "   :  +- FileScan parquet [doc_id#1L]",
        "   +- HashAggregate(keys=[word#9], functions=[count(1)])",
        "      +- FileScan parquet [word#9]",
    ]) == ["doc_id", "word"]


def test_build_side_risk_classifier_parsing():
    """Pure-string behavior of the broadcast build-side audit (r8 verdict
    task 2 — the r7 graph_bfs_levels bug class, generalized): a broadcast
    join that hash-builds from a persisted corpus relation while the
    probe side touches no file scan is flagged; the GOOD patterns —
    probe side scanning the corpus (broadcast-dim / BFS frontier shape)
    or an aggregate bounding the cached side before the build — are
    exempt."""
    from toy_map_reduce_spark.plans.explain import build_side_risk

    # THE BUG: build side = cached edge corpus, probe = loop-carried
    # literal frontier (no stats). This is what Spark planned for BFS
    # before the F.broadcast hints.
    bug = "\n".join([
        "AdaptiveSparkPlan isFinalPlan=false",
        "+- BroadcastHashJoin [src#3L], [f_node#9L], Inner, BuildLeft, false",
        "   :- BroadcastExchange HashedRelationBroadcastMode(...), [plan_id=7]",
        "   :  +- InMemoryTableScan [src#3L, dst#4L]",
        "   :        +- InMemoryRelation [src#3L, dst#4L], StorageLevel(memory)",
        "   :              +- FileScan parquet [o_orderkey#1L,o_custkey#2L]",
        "   +- LocalTableScan [f_node#9L]",
    ])
    risks = build_side_risk(bug)
    assert len(risks) == 1 and "BuildLeft" in risks[0]["join"]

    # GOOD BFS: build side = persisted frontier (cached, and its cached
    # plan reaches the edge scan), probe side = the cached edge corpus
    # whose InMemoryRelation prints a FileScan below -> probe scans the
    # corpus -> exempt
    good = "\n".join([
        "AdaptiveSparkPlan isFinalPlan=false",
        "+- BroadcastHashJoin [src#3L], [f_node#9L], Inner, BuildRight, false",
        "   :- InMemoryTableScan [src#3L, dst#4L]",
        "   :     +- InMemoryRelation [src#3L, dst#4L], StorageLevel(memory)",
        "   :           +- FileScan parquet [o_orderkey#1L,o_custkey#2L]",
        "   +- BroadcastExchange HashedRelationBroadcastMode(...), [plan_id=7]",
        "      +- InMemoryTableScan [f_node#9L]",
        "            +- InMemoryRelation [f_node#9L], StorageLevel(memory)",
        "                  +- HashAggregate(keys=[node#5L], functions=[])",
        "                     +- FileScan parquet [o_orderkey#1L]",
    ])
    assert build_side_risk(good) == []

    # bounded cached build: an aggregate between the join and the cached
    # corpus bounds the build side -> exempt even with a scan-free probe
    bounded = "\n".join([
        "+- BroadcastHashJoin [k#3L], [k#9L], Inner, BuildLeft, false",
        "   :- BroadcastExchange HashedRelationBroadcastMode(...), [plan_id=3]",
        "   :  +- HashAggregate(keys=[k#3L], functions=[count(1)])",
        "   :     +- InMemoryTableScan [k#3L]",
        "   :           +- InMemoryRelation [k#3L], StorageLevel(memory)",
        "   :                 +- FileScan parquet [k#3L]",
        "   +- LocalTableScan [k#9L]",
    ])
    assert build_side_risk(bounded) == []

    # aggregate INSIDE the cached plan (r9 advisor): a persisted
    # aggregated frame (InMemoryRelation -> HashAggregate -> FileScan) is
    # bounded-by-construction — broadcasting it over a scan-free
    # loop-carried probe is exactly the GOOD pattern, and the bounding
    # check must keep applying below the cache boundary
    agg_in_cache = "\n".join([
        "+- BroadcastHashJoin [k#3L], [k#9L], Inner, BuildLeft, false",
        "   :- BroadcastExchange HashedRelationBroadcastMode(...), [plan_id=3]",
        "   :  +- InMemoryTableScan [k#3L]",
        "   :        +- InMemoryRelation [k#3L], StorageLevel(memory)",
        "   :              +- HashAggregate(keys=[k#3L], functions=[count(1)])",
        "   :                 +- FileScan parquet [k#3L]",
        "   +- LocalTableScan [k#9L]",
    ])
    assert build_side_risk(agg_in_cache) == []

    # ...but an UN-cached plain file scan on the build side is not the
    # flagged class either (Spark has real stats for it); only a cached
    # corpus with no bounding node in between is the bug signature
    plain_scan_build = "\n".join([
        "+- BroadcastHashJoin [k#3L], [k#9L], Inner, BuildLeft, false",
        "   :- BroadcastExchange HashedRelationBroadcastMode(...), [plan_id=3]",
        "   :  +- FileScan parquet [k#3L]",
        "   +- LocalTableScan [k#9L]",
    ])
    assert build_side_risk(plain_scan_build) == []

    # no build-side marker (BroadcastNestedLoopJoin Cross without
    # BuildLeft/Right text) or non-broadcast joins -> no record
    assert build_side_risk("+- SortMergeJoin [a#1], [b#2], Inner") == []


def test_missed_broadcast_classifier_parsing():
    """Pure-string behavior of the missed-broadcast audit (r9 verdict
    task 4): a shuffle join whose one side only scans an always-small
    dim (region/nation) is flagged; big-big shuffle joins (the bucketed
    lineitem ⋈ orders merge join), broadcast joins, and dim branches
    that ALSO reach a scaling table are exempt."""
    from toy_map_reduce_spark.plans.explain import missed_broadcast

    # THE MISS: fact table shuffled on n_nationkey to sort-merge against
    # a 25-row nation scan that should have been broadcast
    miss = "\n".join([
        "AdaptiveSparkPlan isFinalPlan=false",
        "+- SortMergeJoin [c_nationkey#3L], [n_nationkey#9L], Inner",
        "   :- Sort [c_nationkey#3L ASC NULLS FIRST], false, 0",
        "   :  +- Exchange hashpartitioning(c_nationkey#3L, 4)",
        "   :     +- FileScan parquet [c_custkey#1L,c_nationkey#3L] Location: InMemoryFileIndex[file:/root/testdata/sf0.001/customer.parquet]",
        "   +- Sort [n_nationkey#9L ASC NULLS FIRST], false, 0",
        "      +- Exchange hashpartitioning(n_nationkey#9L, 4)",
        "         +- FileScan parquet [n_nationkey#9L,n_name#10] Location: InMemoryFileIndex[file:/root/testdata/sf0.001/nation.parquet]",
    ])
    risks = missed_broadcast(miss)
    assert len(risks) == 1 and risks[0]["tables"] == ["nation"] and risks[0]["side"] == "right"

    # the layout-cache path form ({table}_{size}_{mtime}_{k}.parquet)
    # must resolve to the same table name
    cached = miss.replace(
        "file:/root/testdata/sf0.001/nation.parquet",
        "file:/root/repo/.layout_cache/_root_testdata_sf0_001/nation_8192_1755200000_4.parquet",
    )
    assert [r["tables"] for r in missed_broadcast(cached)] == [["nation"]]

    # big-big shuffle join: both sides scan scaling tables -> exempt
    bigbig = "\n".join([
        "+- SortMergeJoin [l_orderkey#1L], [o_orderkey#9L], Inner",
        "   :- Sort [l_orderkey#1L ASC NULLS FIRST], false, 0",
        "   :  +- FileScan parquet [l_orderkey#1L] Location: InMemoryFileIndex[file:/root/testdata/sf0.001/lineitem.parquet]",
        "   +- Sort [o_orderkey#9L ASC NULLS FIRST], false, 0",
        "      +- FileScan parquet [o_orderkey#9L] Location: InMemoryFileIndex[file:/root/testdata/sf0.001/orders.parquet]",
    ])
    assert missed_broadcast(bigbig) == []

    # dim branch that also reaches a scaling table (nation pre-joined to
    # customer before the shuffle join) -> that side is fact-sized, exempt
    mixed = "\n".join([
        "+- SortMergeJoin [k#1L], [k#9L], Inner",
        "   :- FileScan parquet [k#1L] Location: InMemoryFileIndex[file:/root/testdata/sf0.001/orders.parquet]",
        "   +- BroadcastHashJoin [n#2L], [n#3L], Inner, BuildRight, false",
        "      :- FileScan parquet [n#2L] Location: InMemoryFileIndex[file:/root/testdata/sf0.001/customer.parquet]",
        "      +- FileScan parquet [n#3L] Location: InMemoryFileIndex[file:/root/testdata/sf0.001/nation.parquet]",
    ])
    assert missed_broadcast(mixed) == []

    # broadcast join over the dim -> the GOOD plan, no record
    good = "\n".join([
        "+- BroadcastHashJoin [c_nationkey#3L], [n_nationkey#9L], Inner, BuildRight, false",
        "   :- FileScan parquet [c_nationkey#3L] Location: InMemoryFileIndex[file:/root/testdata/sf0.001/customer.parquet]",
        "   +- BroadcastExchange HashedRelationBroadcastMode(...), [plan_id=3]",
        "      +- FileScan parquet [n_nationkey#9L] Location: InMemoryFileIndex[file:/root/testdata/sf0.001/nation.parquet]",
    ])
    assert missed_broadcast(good) == []


def test_corpus_grain_classifier_catches_live_alias(spark, sf_dir):
    """End-to-end alias robustness: a REAL plan where the corpus-grain
    key is renamed before the aggregate (doc_id AS ck) and the aggregate
    feeds a single-partition window must still classify as a
    corpus-grain funnel — the shape the registry-wide pin would have to
    catch if an operator regressed into it."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from toy_map_reduce_spark.plans import single_partition_sites
    from toy_map_reduce_spark.plans.explain import explain_str
    from toy_map_reduce_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    bad = (
        docs.select(F.col("doc_id").alias("ck"))
        .groupBy("ck")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("rn", F.row_number().over(Window.orderBy("cnt", "ck")))
    )
    sites = single_partition_sites(explain_str(bad, "simple"))
    assert any(
        "doc_id" in s["corpus_grain_keys"] for s in sites
    ), f"aliased corpus-grain funnel escaped the classifier: {sites}"


def test_prewarm_staging_plans_match_query_staging(spark, sf_dir):
    """prewarm_staging (bench attribution, r7 verdict task 2) only works
    if the plans it materializes are the ONES the dedup queries build —
    the CacheManager substitutes a cached relation on analyzed-plan
    equality, so any drift in shingle/simhash staging construction
    silently turns the prewarm into dead weight and re-smears the
    staging cost over the first timed query. Pin: after prewarm, the
    shingle- and simhash-family query plans read InMemoryTableScan (the
    cache hit), and the caches land as expected."""
    from toy_map_reduce_spark.operators.dedup import prewarm_staging
    from toy_map_reduce_spark.plans.explain import explain_str
    from toy_map_reduce_spark.registry import get_spec

    staging = prewarm_staging(spark, sf_dir)
    assert set(staging) == {
        "shingle_stage", "capped_shingles", "simhash_blocks", "minhash_sig",
    }
    try:
        for name in ("dedup_containment", "dedup_near", "dedup_near_verified",
                     "dedup_simhash_pairs"):
            plan = explain_str(get_spec(name).builder(spark, sf_dir), "simple")
            assert "InMemoryTableScan" in plan, (
                f"{name}: no cache hit after prewarm_staging — the "
                "staging plan drifted from what the query builds"
            )
    finally:
        # drop the staged caches so later tests in the session measure
        # their own shapes, not this test's leftovers
        spark.catalog.clearCache()


def test_parse_plan_tree_on_real_cached_plan_output():
    """Pin parse_plan_tree against a verbatim Spark 4 explain capture with
    the awkward constructs the depth heuristic must survive: ':' rails,
    an InMemoryRelation whose embedded cached plan indents +6 and drops
    the rails, bare (marker-free) '== Final Plan ==' / 'ResultQueryStage'
    lines, and '*(n)' codegen prefixes. A regression here silently blinds
    both the corpus-grain classifier and the build-side audit."""
    from toy_map_reduce_spark.plans import build_side_risk, parse_plan_tree

    plan = """== Physical Plan ==
AdaptiveSparkPlan isFinalPlan=false
+- Project [k#1L, count#2L]
   +- BroadcastHashJoin [k#1L], [k#74L], Inner, BuildRight, false
      :- Filter isnotnull(k#1L)
      :  +- InMemoryTableScan [k#1L, count#2L], [isnotnull(k#1L)]
      :        +- InMemoryRelation [k#1L, count#2L], StorageLevel(disk, memory, deserialized, 1 replicas)
      :              +- AdaptiveSparkPlan isFinalPlan=true
                        +- == Final Plan ==
                           ResultQueryStage 1
                           +- *(2) HashAggregate(keys=[k#1L], functions=[count(1)])
                              +- ShuffleQueryStage 0
                                 +- Exchange hashpartitioning(k#1L, 4), ENSURE_REQUIREMENTS, [plan_id=46]
                                    +- *(1) HashAggregate(keys=[k#1L], functions=[partial_count(1)])
                                       +- *(1) Project [(id#0L % 7) AS k#1L]
                                          +- *(1) Range (0, 100, step=1, splits=4)
                        +- == Initial Plan ==
                           HashAggregate(keys=[k#1L], functions=[count(1)])
                           +- Exchange hashpartitioning(k#1L, 4), ENSURE_REQUIREMENTS, [plan_id=15]
                              +- HashAggregate(keys=[k#1L], functions=[partial_count(1)])
                                 +- Project [(id#0L % 7) AS k#1L]
                                    +- Range (0, 100, step=1, splits=4)
      +- BroadcastExchange HashedRelationBroadcastMode(List(input[0, bigint, false]),false), [plan_id=105]
         +- Filter isnotnull(k#74L)
            +- Scan ExistingRDD[k#74L]"""

    roots = parse_plan_tree(plan)
    # "== Physical Plan ==" header and the AdaptiveSparkPlan are separate
    # depth-0 roots; the tree hangs off the latter
    adaptive = [r for r in roots if r.text.startswith("AdaptiveSparkPlan")][0]
    (project,) = adaptive.children
    (join,) = project.children
    assert "BroadcastHashJoin" in join.text
    assert len(join.children) == 2  # ':-' probe branch + '+-' build branch
    probe, build = join.children
    assert "Filter" in probe.text and "BroadcastExchange" in build.text
    # the cached plan's contents nest somewhere under the probe's
    # InMemoryRelation — the marker-free section lines must not have
    # escaped to the root level
    probe_texts = [n.text for n in probe.walk()]
    assert any("InMemoryRelation" in t for t in probe_texts)
    assert any("Range (0, 100" in t for t in probe_texts)
    assert sum(1 for r in roots for n in r.walk() if "Range (0, 100" in n.text) == 2
    # and the build-side audit reads this plan as benign: the build side
    # is a literal RDD scan, not a cached corpus
    assert build_side_risk(plan) == []
