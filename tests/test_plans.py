"""Physical-plan quality gates (SURVEY.md §4.2/§4.3, BASELINE.md 100 TB
posture).

Correctness says an operator works at sf0.01; these assertions say the
*plan* would still be the right plan at 1000 executors — filters reach the
parquet scan, projections prune columns, joins never degenerate to
nested-loop cross products (except the two intentionally brute-force
similarity baselines), top-k avoids a global sort, and partitioned tables
prune partitions on key equality.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from forgottenlandapp_etl_spark.plans import QUERIES
from forgottenlandapp_etl_spark.sources import sinks


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# intentionally quadratic brute-force baselines (the scale path for each is
# the bucketed variant: sim_ivf_topk / dedup_minhash_lsh), plus plans whose
# only nested-loop is a deliberate broadcast of a tiny relation: a 1-row
# max-date/bounds scalar (j3/j4/e3 — the scalar-subquery pattern), the
# 7-row skill-constants table (c1), the 8-row centroid table (sim_ivf),
# and q22's 1-row decimal-average scalar subquery
CROSS_JOIN_OK = {
    "tpch_q22_sales_opportunity",
    "sim_bruteforce_topk",
    "emb_near_dup_pairs",
    "j3_accumulating_merge",
    "j4_period_rollup",
    "e3_period_online_time",
    "c1_skill_points",
    "sim_ivf_topk",
    "emb_near_dup_bucketed",  # same 8-row centroid broadcast as sim_ivf
    "f3_min_level_online",  # 1-row max-date bounds broadcast (same as j3/j4)
    "sim_ivf_kmeans_topk",  # 8-row learned-centroid broadcast
    "emb_near_dup_kmeans",  # 8-row learned-centroid broadcast
    "text_bm25_topk",  # 1-row corpus-size scalar broadcast (N for the idf)
    "mix_temperature_sample",  # 1-row Σ√n/N totals broadcast into the rate table
    "sim_quantized_topk",  # deliberate query-set broadcast (same as sim_bruteforce_topk)
    "pipeline_training_ready",  # 1-row mixture-totals broadcast (same as mix_temperature_sample)
    "quality_bigram_lm",  # 1-row vocabulary-size scalar broadcast (Laplace V)
    "tpch_q11_important_stock",  # 1-row national-total broadcast (HAVING fraction)
    "pipeline_curriculum_phases",  # 1-row quantile-thresholds broadcast (SCALE.md rule 10)
    "decontaminate_bloom",  # 1-row 8 KB bitset-map broadcast (SCALE.md rule 10)
    "sketch_cms_daily_merge",  # 1-row day-count scalar broadcast
    "mix_domain_weights",  # 1-row (total, n_domains) scalar broadcast
    "sim_ivf_rerank",  # 8-row centroid broadcast (same as sim_ivf_topk)
    "mix_epoch_upsample",  # 1-row (total, n_domains) scalar broadcast (same as mix_domain_weights)
    "pairs_contrastive_mining",  # 1-row corpus-count scalar broadcast (negative-id modulus)
    "layout_zorder",  # 1-row key-min/max stats broadcast (the rank-space scaling bounds)
    "sim_ann_recall_eval",  # query-set broadcast ×2 (composes sim_bruteforce_topk + sim_quantized_topk)
    "sim_matryoshka_recall",  # query-set broadcast ×2 (brute-force at two dimension budgets)
    "dq_event_freshness",  # 1-row high-water-mark scalar broadcast
    "tok_coverage_curve",  # 7-row checkpoint relation joined by rank inequality over the ≤16K candidate vocab (model-sized × model-sized)
    "j12_bloom_pruned_join",  # 1-row 8 KB bloom-bitmap-map broadcast (same class as decontaminate_bloom)
}


def test_no_accidental_cross_joins(spark, sf_dir):
    bad = []
    for name, fn in QUERIES.items():
        plan = plan_of(fn(spark, sf_dir))
        if name in CROSS_JOIN_OK:
            continue
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            bad.append(name)
    assert not bad, f"nested-loop/cartesian joins in: {bad}"


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(QUERIES["s1_scan_pushdown"](spark, sf_dir))
    assert "PushedFilters" in plan
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "l_quantity" in m.group(1), plan[:2000]


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = plan_of(QUERIES["s1_scan_pushdown"](spark, sf_dir))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan[:2000]
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols == {"l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"}


def test_orc_scan_pushes_filters_and_prunes_columns(spark, sf_dir, tmp_path):
    """Format-independence of the scan discipline: the same pushdown /
    pruning assertions the parquet entries gate (PushedFilters reaching the
    scan, ReadSchema limited to the projection) hold for Spark's native ORC
    reader — the plan shape src_orc_roundtrip's docstring claims."""
    from forgottenlandapp_etl_spark import catalog

    path = str(tmp_path / "documents.orc")
    catalog.table(spark, sf_dir, "documents").write.option(
        "compression", "zstd"
    ).orc(path)
    df = (
        spark.read.orc(path)
        .where((F.col("lang") == "en") & (F.col("n_chars") >= 120))
        .select("doc_id", "lang", "n_chars")
    )
    plan = plan_of(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "n_chars" in m.group(1) and "lang" in m.group(1), plan[:2000]
    s = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert s, plan[:2000]
    cols = {c.split(":")[0] for c in s.group(1).split(",") if c}
    assert cols == {"doc_id", "lang", "n_chars"}


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = plan_of(QUERIES["s4_topk_scan"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_dimension_joins_broadcast(spark, sf_dir):
    """TPC-H Q5's nation/region joins must be broadcast-hash, not shuffle."""
    plan = plan_of(QUERIES["tpch_q5_local_supplier_volume"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_aggregates_are_partial_final(spark, sf_dir):
    """Q1's hash aggregate must have a map-side partial stage (two
    HashAggregate nodes around the exchange), not a single post-shuffle agg."""
    df = QUERIES["tpch_q1_pricing_summary"](spark, sf_dir)
    plan = plan_of(df)
    assert "partial_sum" in plan, plan[:2000]
    assert len(re.findall(r"HashAggregate", plan)) >= 2
    # codegen stages appear as *(n) markers only once AQE finalizes the
    # plan; collect() executes THIS QueryExecution (count() would spawn a
    # new one and leave df's plan un-finalized)
    df.collect()
    final = plan_of(df)
    assert re.search(r"\*\(\d+\)", final), final[:2000]


def test_asof_join_is_single_key_shuffle(spark, sf_dir):
    """The as-of join must stay the union+window form: no join node at all,
    and at most the key shuffle + small-input spreads — never a range join."""
    plan = plan_of(QUERIES["j7_asof_join"](spark, sf_dir))
    assert "Join" not in plan, plan[:2000]
    assert "RunningWindowFunction" in plan or "Window" in plan


def test_range_join_keeps_equi_component(spark, sf_dir):
    """The interval join must hash/merge on user_id with the time band as a
    residual condition — not a nested-loop over all pairs."""
    plan = plan_of(QUERIES["j8_range_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan) or (
        "ShuffledHashJoin" in plan
    )


def test_lsh_never_contains_allpairs_shingle_join(spark, sf_dir):
    """The LSH tier's only self-join keys must be the band signature and the
    candidate pair ids — a join keyed on the raw shingle would mean the
    quadratic verification path leaked back in."""
    # the exact tier joins on shingle (expected); LSH must join shingle only
    # together with a candidate id (the common-count join), never alone
    plan = plan_of(QUERIES["dedup_minhash_lsh"](spark, sf_dir))
    for m in re.finditer(r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)[^\n]*", plan):
        line = m.group(0)
        if "shingle" in line:
            assert "id_a" in line or "id_b" in line, line


def test_partition_pruning_on_partitioned_table(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("a", 1, "2024-01-01"), ("b", 2, "2024-01-02")], "k string, v int, date string"
    )
    sinks.insert_snapshot(df, p)
    scan = spark.read.parquet(p).where(F.col("date") == "2024-01-01")
    plan = plan_of(scan)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "date" in m.group(1), plan[:2000]
    assert scan.count() == 1


def test_smoke_entry_schema_stable(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert df.columns == sorted(set(df.columns)) or len(set(df.columns)) == len(
        df.columns
    )


def test_bucketed_join_has_no_exchange(spark, tmp_path, sf_dir):
    """Two tables bucketed on the join key must join with zero shuffles —
    the write-once pre-shuffle that makes repeated big-big joins viable at
    100 TB (sources/bucketing.py)."""
    from forgottenlandapp_etl_spark import catalog
    from forgottenlandapp_etl_spark.sources import bucketing

    orders = catalog.table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = catalog.table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    bucketing.write_bucketed(
        orders, "b_orders", "o_orderkey", n_buckets=8,
        path=str(tmp_path / "b_orders"),
    )
    bucketing.write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey",
        8, path=str(tmp_path / "b_lineitem"),
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at this tiny SF the planner would broadcast (and rightly ignore
        # buckets); disable broadcast to exercise the big-big shape the
        # buckets exist for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketing.read_table(spark, "b_orders").join(
            bucketing.read_table(spark, "b_lineitem"), "o_orderkey"
        )
        plan = plan_of(j)
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert "Bucketed: true" in plan, plan[:2000]
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must not change join results — only the key distribution."""
    from forgottenlandapp_etl_spark import catalog
    from forgottenlandapp_etl_spark.operators import joins as J

    ev = catalog.table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    dim = (
        catalog.table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_user_events"))
    )
    plain = ev.join(dim, "user_id")
    salted = J.salted_join(ev, dim, "user_id", salt_buckets=8)
    assert salted.count() == plain.count()
    a = sorted(map(tuple, plain.select("event_id", "n_user_events").collect()))
    b = sorted(map(tuple, salted.select("event_id", "n_user_events").collect()))
    assert a == b


def test_spread_is_noop_on_well_split_input(spark, sf_dir):
    """spread() must add NO shuffle when the scan already has >= session
    parallelism splits (the 100 TB case), and must fan out a single-split
    scan (the local-fixture case)."""
    from forgottenlandapp_etl_spark import catalog

    single = catalog.table(spark, sf_dir, "documents")
    assert single.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    assert (
        catalog.spread(single).rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    wide = single.repartition(spark.sparkContext.defaultParallelism * 2)
    assert catalog.spread(wide) is wide  # untouched, no extra exchange


def test_missing_sf_dir_raises_analysis_exception(spark):
    """A query against a nonexistent data dir must fail with Spark's
    AnalysisException (clean, actionable), not an opaque Py4J error."""
    from pyspark.errors.exceptions.captured import AnalysisException

    with pytest.raises(AnalysisException):
        QUERIES["j1_snapshot_diff"](spark, "/root/testdata/sf-nope").collect()


def test_rerun_determinism(spark, sf_dir):
    """Two runs of the same query must produce identical canonical results —
    the repartitions, distincts, and window specs are all pinned."""
    from tests.oracle import canonicalize

    for name in ("j1_snapshot_diff", "dedup_minhash_lsh", "agg_session_windows"):
        a = canonicalize(QUERIES[name](spark, sf_dir).toPandas())
        b = canonicalize(QUERIES[name](spark, sf_dir).toPandas())
        assert a == b, name


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Star-schema join on the partition key with a selective dim filter
    must inject a dynamic-partition-pruning subquery: at 100 TB the fact
    scan reads only the partitions the filtered dimension names, instead
    of the whole table. (Static pruning is the sibling gate above; this is
    the runtime form Catalyst uses when the partition set is only known
    after filtering the dim.)"""
    fact = spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 50).cast("string").alias("part_key")
    )
    fact.write.partitionBy("part_key").mode("overwrite").parquet(
        str(tmp_path / "fact")
    )
    spark.range(0, 50).select(
        F.col("id").cast("string").alias("part_key"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
    ).write.mode("overwrite").parquet(str(tmp_path / "dim"))

    f = spark.read.parquet(str(tmp_path / "fact"))
    d = spark.read.parquet(str(tmp_path / "dim")).where(F.col("name") == "n7")
    j = f.join(d, "part_key")
    assert "dynamicpruning" in plan_of(j).lower(), plan_of(j)[:2000]
    assert j.count() == 200


def test_runtime_bloom_filter_join(spark, tmp_path):
    """With broadcast off (the 100 TB big-big shape), a selective dim
    filter must inject a runtime bloom filter on the fact side so shuffle
    input shrinks before the exchange. Thresholds are lowered to make the
    toy fixture eligible — production keeps Spark's defaults (app side
    > 10 GB), which a real 100 TB fact table clears."""
    spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 50).alias("k")
    ).write.mode("overwrite").parquet(str(tmp_path / "fact"))
    spark.range(0, 50).select(
        F.col("id").alias("k2"), F.concat(F.lit("n"), F.col("id")).alias("name")
    ).write.mode("overwrite").parquet(str(tmp_path / "dim"))

    old_thresh = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    old_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "1KB",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        f = spark.read.parquet(str(tmp_path / "fact"))
        d = spark.read.parquet(str(tmp_path / "dim")).where(F.col("name") == "n7")
        j = f.join(d, f["k"] == d["k2"])
        opt = j._jdf.queryExecution().optimizedPlan().toString().lower()
        assert "might_contain" in opt or "bloomfilter" in opt, opt[:2000]
        assert j.count() == 200
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_thresh,
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bcast)


def test_q8_pushdown_and_broadcasts(spark, sf_dir):
    """Q8's region/part/date predicates must reach their scans, every
    dimension join must broadcast, and exactly one hash-partition exchange
    (the final year group-by) may remain at unit-test scale."""
    plan = plan_of(QUERIES["tpch_q8_market_share"](spark, sf_dir))
    pushed = " ".join(re.findall(r"PushedFilters: \[([^\]]*)\]", plan))
    assert "EqualTo(r_name,AMERICA)" in pushed
    assert "EqualTo(p_type,STANDARD)" in pushed
    assert "o_orderdate" in pushed
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # lineitem scan must not read money columns it doesn't use
    m = re.search(r"ReadSchema: struct<(l_[^>]*)>", plan)
    assert m and "l_tax" not in m.group(1) and "l_quantity" not in m.group(1)


def test_chunk_overlap_is_shuffle_free(spark, sf_dir):
    """The sliding-window chunker is a pure 1→N narrow fan-out: tokenize,
    explode start offsets, slice. The ONLY exchange allowed is the explicit
    small-input spread (REPARTITION_BY_NUM — catalog.spread's guard for
    tiny local fixtures, a no-op on well-split 100 TB inputs per
    test_spread_is_noop_on_well_split_input); a demanded shuffle would mean
    the chunker repartitions the corpus for per-row work."""
    plan = plan_of(QUERIES["text_chunk_overlap"](spark, sf_dir))
    exchanges = re.findall(r"Exchange [^\n]*", plan)
    assert all("REPARTITION_BY_NUM" in e for e in exchanges), exchanges
    assert len(exchanges) <= 1, exchanges
    assert "CartesianProduct" not in plan and "SortMergeJoin" not in plan


def test_no_unjustified_global_exchange_anywhere(spark, sf_dir):
    """SCALE rule 10 as a UNIVERSAL gate (r5 verdict item 7): every
    registry entry's physical plan is walked structurally; a single-
    partition or range exchange is benign only when its consumer is a
    global scalar reduction (empty grouping keys — partial agg upstream,
    one row out) or a limit. Anything else — a true global sort or global
    window — must carry a named bounded-size justification in
    tools/gen_scale_report.GLOBAL_SORT_ALLOWLIST, and stale justifications
    fail too, so the allowlist can never outlive the shapes it excuses.
    ~90 s for all plans: the whole-registry scale audit, priced in."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "gen_scale_report",
        os.path.join(os.path.dirname(__file__), "..", "tools", "gen_scale_report.py"),
    )
    gsr = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gsr)

    detail, violations = gsr.check_global_exchanges(spark, sf_dir, QUERIES)
    assert violations == [], violations
    # and the benign classification is doing real work: the fixture plans
    # DO contain scalar-reduction singles that the walk must not flag
    assert set(detail) == set(gsr.GLOBAL_SORT_ALLOWLIST)


def test_ivf_exact_plan_shape(spark, sf_dir):
    """sim_ivf_exact_topk's candidate stage must be a BROADCAST equi-join
    on bucket (the query side is small by construction) with no cartesian
    product anywhere; the only wide exchange is the per-query rank window
    over candidates."""
    plan = plan_of(QUERIES["sim_ivf_exact_topk"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    import re

    wide = [
        e
        for e in re.findall(r"Exchange [^\n]*", plan)
        if "SinglePartition" in e or "rangepartitioning" in e
    ]
    assert wide == [], wide


def test_ivfpq_plan_shape(spark, sf_dir):
    """sim_ivfpq_topk serves the same candidate shape as the exact IVF —
    broadcast equi-join on the coarse bucket, no cartesian — and its ADC
    stage must stay row-local: no extra exchange beyond the per-query rank
    window (the distance tables travel INSIDE the broadcast rows as
    arrays, never as a joined relation)."""
    plan = plan_of(QUERIES["sim_ivfpq_topk"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    import re

    wide = [
        e
        for e in re.findall(r"Exchange [^\n]*", plan)
        if "SinglePartition" in e or "rangepartitioning" in e
    ]
    assert wide == [], wide


def test_semantic_dedup_plan_shape(spark, sf_dir):
    """dedup_semantic's served plan: no cartesian product, no join of the
    corpus against itself on the k cluster keys (the pair stage is one
    Arrow group per cluster), no single-partition exchange — the closure
    ran eagerly at build into a checkpointed relation."""
    plan = plan_of(QUERIES["dedup_semantic"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan  # final keeper join broadcasts
    assert "Exchange SinglePartition" not in plan
    assert "rangepartitioning" not in plan


def test_sketch_family_plan_shapes(spark, sf_dir):
    """SCALE rule 12's structural claims, asserted on plans. The HLL and
    KMV ENTRIES return checkpointed relations (their plans are scans), so
    the real pipelines are rebuilt here through the operators and gated
    pre-checkpoint: register/summary builds are hash-aggregate fan-in on
    one scan branch with NO single-partition or range exchange (the KMV
    per-group top-k windows partition by their group keys); the
    histogram's cumulative walk plans as a BROADCAST range self-join on
    the constant-size summary, never a global window."""
    import re

    from pyspark.sql import functions as F

    from forgottenlandapp_etl_spark import catalog
    from forgottenlandapp_etl_spark.operators import sketches

    def no_wide(plan, name):
        assert "CartesianProduct" not in plan, name
        wide = [
            e
            for e in re.findall(r"Exchange [^\n]*", plan)
            if "SinglePartition" in e or "rangepartitioning" in e
        ]
        assert wide == [], (name, wide)

    ev = catalog.table(spark, sf_dir, "events").select(
        F.to_date("ts").cast("string").alias("day"),
        "event_type",
        F.col("user_id").cast("string").alias("uk"),
        F.expr("CAST(floor(value * 100) AS BIGINT)").alias("v_fp"),
    )
    regs = sketches.build_hll_registers(ev, "uk", ["day"])
    no_wide(plan_of(sketches.hll_estimate(regs, ["day"])), "hll build+estimate")
    # merge gated in the entries' own shape (the 'ALL' label group); a
    # groupless merge is a 1-row scalar reduction whose SinglePartition
    # fan-in the universal gate already classifies benign
    no_wide(
        plan_of(
            sketches.hll_estimate(
                sketches.merge_hll_registers(
                    regs.select(F.lit("ALL").alias("day"), "bucket", "rho"),
                    ["day"],
                ),
                ["day"],
            )
        ),
        "hll merge",
    )
    kmv = sketches.build_kmv(ev, "uk", ["event_type"])
    no_wide(plan_of(sketches.kmv_estimate(kmv, ["event_type"])), "kmv")
    hist = sketches.build_histogram(ev, "v_fp", ["event_type"])
    hq = sketches.histogram_quantiles(hist, [("p50", 1, 2)], ["event_type"])
    hist_plan = plan_of(hq)
    no_wide(hist_plan, "histogram quantiles")
    assert (
        "BroadcastHashJoin" in hist_plan or "BroadcastNestedLoopJoin" in hist_plan
    )
    # the full histogram ENTRY is not checkpointed — gate it whole too
    no_wide(
        plan_of(QUERIES["sketch_quantile_histogram"](spark, sf_dir)),
        "sketch_quantile_histogram entry",
    )


def test_runtime_bloom_filter_prunes_big_big_join(spark, sf_dir):
    """Big-big joins where neither side broadcasts are the 100 TB shuffle
    that hurts most; Spark's runtime row-level filtering builds a Bloom
    filter from the SELECTIVE side's join keys and applies
    might_contain() on the other side BEFORE its shuffle, pruning rows
    that cannot match. Assert the engine's conf surface actually injects
    it on our fact tables: a selective orders slice joined to lineitem
    must show bloom_filter_agg on the creation side and a might_contain
    filter on the lineitem scan branch. Thresholds are lowered only
    because the fixture is small (production defaults gate on a 10 GB
    application-side scan — exactly the big-big regime); broadcast is
    disabled to force the shuffle join the feature exists for."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        sel = o.where(F.col("o_totalprice") > 150000)
        j = li.join(sel, li.l_orderkey == sel.o_orderkey).groupBy().count()
        plan = plan_of(j)
        assert "bloom_filter_agg" in plan, "no bloom filter built"
        assert "might_contain" in plan, "fact side not pruned"
        # the pruning filter must sit on the LINEITEM branch (application
        # side), keyed on l_orderkey
        mc_lines = [ln for ln in plan.splitlines() if "might_contain" in ln]
        assert any("l_orderkey" in ln for ln in mc_lines), mc_lines
        # and the join result is unchanged by the filter (it only removes
        # rows that cannot match)
        n_with = j.collect()[0][0]
        for k in confs:
            if saved[k] is not None:
                spark.conf.set(k, saved[k])
            else:
                spark.conf.unset(k)
        n_without = (
            li.join(sel, li.l_orderkey == sel.o_orderkey).groupBy().count().collect()
        )[0][0]
        assert n_with == n_without
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                try:
                    spark.conf.unset(k)
                except Exception:
                    pass


def test_bloom_prune_sits_below_the_join_exchange(spark, sf_dir):
    """The j12 claim, pinned structurally: with broadcast disabled (the
    100 TB too-big-to-broadcast dimension), the Bloom probe filter
    (element_at over the bitmap literal) must appear in the FACT side's
    plan BELOW the SortMergeJoin — the shuffle carries pruned rows. Also
    pins losslessness: the pruned-join result equals the plain join."""
    from forgottenlandapp_etl_spark.plans.registry import QUERIES

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = QUERIES["j12_bloom_pruned_join"](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        ji = min(
            i
            for i in (
                plan.find("SortMergeJoin"),
                plan.find("ShuffledHashJoin"),
            )
            if i >= 0
        )
        probe = plan.find("element_at")
        assert probe > ji, "bloom probe filter not below the join"
        got = {tuple(r) for r in df.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    plain = {tuple(r) for r in QUERIES["j12_bloom_pruned_join"](spark, sf_dir).collect()}
    assert got == plain


def test_bloom_prune_has_no_false_negatives_and_actually_prunes(spark, sf_dir):
    """bloom_prune's survivors must be a SUPERSET of the true matches
    (losslessness) and a PROPER subset of the fact table (the prune does
    work — the BUILDING segment is ~1/5 of customers)."""
    from forgottenlandapp_etl_spark import catalog
    from forgottenlandapp_etl_spark.operators import contamination
    from pyspark.sql import functions as F

    cust = (
        catalog.table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = catalog.table(spark, sf_dir, "orders").select("o_custkey")
    pruned = contamination.bloom_prune(orders, "o_custkey", cust, "c_custkey")
    n_all = orders.count()
    n_pruned = pruned.count()
    n_true = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"], "leftsemi"
    ).count()
    assert n_true <= n_pruned < n_all
    # the false-positive tail is bounded: k=4/m=65536 at this key count
    # keeps survivors well under half the fact table
    assert n_pruned < 0.5 * n_all
