"""Physical-plan regression tests — lock in the scale properties SCALE.md
documents: pushdown reaches the scan, small dims broadcast, windowed top-k
uses WindowGroupLimit, and bucketed tables co-locate joins with NO
exchange. These assert on `.explain` output, so a future change that
silently de-optimizes a plan fails here, not at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod

from conftest import plan_of

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    return entrymod.queries()


def test_scan_prune_pushes_filters_and_columns(spark, queries):
    plan = plan_of(queries["q_scan_prune"](spark, SF))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan
    # projection pruned to the 3 selected + filter columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_shipdate" in plan
    assert "codegen id" in plan  # fused whole-stage-codegen span


def test_geocode_dim_joins_broadcast(spark, queries):
    plan = plan_of(queries["op_geocode_join"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_theta_kmv_rank_filter_compiles_to_window_group_limit(spark):
    """x_theta_intersect's rn <= k sample cut (k = 1024) must compile to
    per-partition WindowGroupLimit heaps (Partial + Final).  Two things
    had to hold and BOTH regressed silently before round 9: (a)
    row_number must be the ONLY window function in the select (a
    co-resident count(*) OVER (PARTITION BY source) defeated the rewrite
    — r8 VERDICT #2), and (b) the InferWindowGroupLimit rule only fires
    for limits <= spark.sql.optimizer.windowGroupLimitThreshold, whose
    DEFAULT (1000) is below k = 1024 — get_spark raises it to 4096.
    The fragment is asserted standalone because the registered key hides
    it behind a lazy localCheckpoint in the displayed plan."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.plans.tierk import (
        _THETA_K,
    )
    from pyspark.sql.window import Window

    assert (
        int(spark.conf.get("spark.sql.optimizer.windowGroupLimitThreshold"))
        >= _THETA_K
    )
    h = spark.range(5000).select(
        (F.col("id") % 7).cast("string").alias("source"),
        F.col("id").cast("string").alias("shingle"),
        (F.col("id") * 0.0001).alias("u"),
    )
    wr = Window.partitionBy("source").orderBy("u", "shingle")
    kept = h.withColumn("rn", F.row_number().over(wr)).filter(
        F.col("rn") <= _THETA_K
    )
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert plan.count("WindowGroupLimit") == 2  # Partial + Final


def test_sim_topk_uses_window_group_limit(spark, queries):
    plan = plan_of(queries["x_sim_topk"](spark, SF))
    # partial + final per-partition heaps: only k rows per partition shuffle
    assert plan.count("WindowGroupLimit") >= 2
    assert "Partial" in plan and "Final" in plan


def test_topk_plans_take_ordered(spark, queries):
    plan = plan_of(queries["q_topk"](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_agg_has_partial_and_final_hashaggregate(spark, queries):
    plan = plan_of(queries["q_agg_basic"](spark, SF))
    # map-side combine: two HashAggregate levels around one hash exchange
    # (a second, range exchange comes from the final orderBy)
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange") <= 2


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Pre-bucketed tables on the join key co-locate a sort-merge join:
    zero Exchange operators — the 100 TB strategy for repeated big joins
    (SCALE.md §3)."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    spark.sql("DROP TABLE IF EXISTS t_orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS t_customer_bucketed")
    # the metastore is per-session but the warehouse dir persists — drop
    # stale managed-table locations or saveAsTable fails LOCATION_ALREADY_EXISTS
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("t_orders_bucketed", "t_customer_bucketed"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("t_orders_bucketed")
    )
    (
        customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("t_customer_bucketed")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("t_orders_bucketed").join(
            spark.table("t_customer_bucketed"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: no shuffle on either side
        # sanity: result is correct
        expected = orders.join(
            customer, F.col("o_custkey") == F.col("c_custkey")
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_geocode_fallback_no_broadcast_one_fact_exchange(spark):
    """Too-big-to-broadcast geo dimension (VERDICT r3 'Next round' #7):
    the bucketed dim joins with NO BroadcastExchange and NO dim-side
    shuffle; the only Exchange in the plan is the fact side's explicit
    co-partitioning repartition.  Results must equal the broadcast path."""
    import shutil

    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.operators.geocode import (
        build_geo_dim,
        enrich_geocode,
        enrich_geocode_bucketed,
        write_bucketed_geo_dim,
    )

    spark.sql("DROP TABLE IF EXISTS t_geo_dim_bucketed")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/t_geo_dim_bucketed", ignore_errors=True)

    dim = build_geo_dim(spark)
    write_bucketed_geo_dim(dim, "t_geo_dim_bucketed", n_buckets=8)

    fact = spark.range(500).select(
        F.col("id").alias("rid"),
        ((F.col("id") % 360) - 180 + 0.5).cast("double").alias("longitude"),
        ((F.col("id") % 180) - 90 + 0.5).cast("double").alias("latitude"),
    )
    # no explicit n_buckets: the count must come from the catalog
    enriched = enrich_geocode_bucketed(fact, spark, "t_geo_dim_bucketed")
    plan = plan_of(enriched)
    assert "BroadcastExchange" not in plan
    assert "SortMergeJoin" in plan
    # exactly ONE shuffle: the fact-side co-partitioning; the dim side's
    # bucketing satisfies the join distribution with zero movement
    import re

    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 1, plan

    # semantics identical to the broadcast path
    expected = enrich_geocode(fact, dim).orderBy("rid").collect()
    got = enriched.orderBy("rid").collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in expected]


def test_schema_drift_report_logs_not_applies(spark, tmp_path):
    """A20 crawler parity: drift is reported (added/missing/type_changed)
    while the declared schema stays authoritative."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        schema_drift_report,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 2.5)], "id int, name string, extra double"
    ).write.parquet(path)
    declared = StructType(
        [
            StructField("id", IntegerType()),
            StructField("name", IntegerType()),   # type drift
            StructField("gone", StringType()),    # missing from files
        ]
    )
    report = {
        r["column"]: r["status"]
        for r in schema_drift_report(spark, path, declared).collect()
    }
    assert report == {
        "id": "ok",
        "name": "type_changed",
        "gone": "missing",
        "extra": "added",
    }


def test_compact_partition_rewrites_to_single_file(spark, tmp_path):
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        compact_partition,
    )

    base = str(tmp_path / "stage")
    df = spark.range(0, 1000).withColumn("year", F.lit("2023"))
    df.repartition(8).write.partitionBy("year").parquet(base)
    part = "year=2023"
    import glob

    assert len(glob.glob(f"{base}/{part}/*.parquet")) == 8
    n = compact_partition(spark, base, part, target_files=1)
    assert n == 1000
    assert len(glob.glob(f"{base}/{part}/*.parquet")) == 1
    # data intact and partition column still derivable from the path
    back = spark.read.parquet(base)
    assert back.count() == 1000
    assert str(back.select("year").distinct().first()["year"]) == "2023"


def test_blocked_topk_equals_broadcast_topk(spark):
    """SCALE.md §5: the block-partitioned brute-force top-k returns
    exactly the broadcast version's results (order-insensitive)."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_blocked,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 12)
    a = cosine_topk(emb, queries, k=3)
    b = cosine_topk_blocked(emb, queries, k=3, n_blocks=3)
    assert sorted(map(tuple, a.collect()), key=lambda t: (t[0], t[2])) == \
           sorted(map(tuple, b.collect()), key=lambda t: (t[0], t[2]))


def test_salted_aggs_equal_direct(spark):
    """Skew utilities (SCALE.md): salted two-phase collect_set /
    exact-distinct-count equal the direct single-reducer forms."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.operators.skew import (
        salted_collect_set,
        salted_exact_distinct_count,
    )
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.tables import (
        load_table,
    )

    ev = load_table(spark, SF, "events")
    # hot-key shape: event_type has very few values over many rows
    direct = {
        r["event_type"]: r
        for r in ev.groupBy("event_type").agg(
            F.array_sort(F.collect_set("user_id")).alias("users"),
            F.count_distinct("user_id").alias("n"),
        ).collect()
    }
    salted_set = {
        r["event_type"]: sorted(r["user_id_set"])
        for r in salted_collect_set(ev, ["event_type"], "user_id").collect()
    }
    salted_cnt = {
        r["event_type"]: r["n_distinct"]
        for r in salted_exact_distinct_count(ev, ["event_type"], "user_id").collect()
    }
    assert set(direct) == set(salted_set) == set(salted_cnt)
    for k, r in direct.items():
        assert salted_set[k] == list(r["users"]), k
        assert salted_cnt[k] == r["n"], k


def test_explode_generates_without_shuffle(spark, queries):
    plan = plan_of(queries["q_explode"](spark, SF))
    assert "Generate" in plan
    assert "Exchange" not in plan  # row generation is executor-local


def test_unpivot_expands_without_python(spark, queries):
    plan = plan_of(queries["q_unpivot"](spark, SF))
    assert "Expand" in plan
    assert "BatchEvalPython" not in plan


def test_lateral_decorrelates_to_window_group_limit(spark, queries):
    # LATERAL ... ORDER BY ... LIMIT must plan as a grouped top-k
    # (partial+final WindowGroupLimit), never a per-outer-row re-execution
    plan = plan_of(queries["q_lateral"](spark, SF))
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_sim_lsh_stays_jvm_side(spark, queries):
    plan = plan_of(queries["x_sim_lsh"](spark, SF))
    assert "BatchEvalPython" not in plan   # whole pipeline in expressions
    assert "SortMergeJoin" not in plan     # query side broadcast


def test_analyze_tables_feeds_cbo(spark, tmp_path):
    """ANALYZE TABLE populates catalog stats (rows + bytes), the input the
    cost-based optimizer needs for join reordering at scale."""
    import shutil

    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        analyze_tables,
    )

    spark.sql("DROP TABLE IF EXISTS t_stats_demo")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/t_stats_demo", ignore_errors=True)
    spark.read.parquet(f"{SF}/nation.parquet").write.saveAsTable("t_stats_demo")
    try:
        stats = analyze_tables(
            spark, ["t_stats_demo"], {"t_stats_demo": ["n_nationkey", "n_name"]}
        )
        assert "25 rows" in stats["t_stats_demo"]
        # column-level stats landed too (NDV for the key column)
        desc = spark.sql(
            "DESCRIBE EXTENDED t_stats_demo n_nationkey"
        ).collect()
        kv = {r["info_name"]: r["info_value"] for r in desc}
        assert kv.get("distinct_count") == "25"
    finally:
        spark.sql("DROP TABLE IF EXISTS t_stats_demo")
        shutil.rmtree(f"{warehouse}/t_stats_demo", ignore_errors=True)


def test_round2_map_side_ops_shuffle_free(spark, queries):
    """x_quality_model / x_url_parse are pure per-row projections and
    x_embed_reduce a map-side matmul — none may introduce an Exchange or
    drop to Python."""
    for key in ("x_quality_model", "x_url_parse"):
        plan = plan_of(queries[key](spark, SF))
        assert "Exchange" not in plan, key
        assert "BatchEvalPython" not in plan, key
    plan = plan_of(queries["x_embed_reduce"](spark, SF))
    # the projection itself is map-side; the only allowed exchange is none
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_chunk_documents_generates_without_shuffle(spark, queries):
    plan = plan_of(queries["x_chunk_documents"](spark, SF))
    assert "Generate" in plan      # explode row generator
    assert "Exchange" not in plan  # executor-local


def test_decontaminate_near_broadcasts_benchmark_side(spark, queries):
    """The two most expensive bench plans must not silently regress:
    decontamination joins a 100 TB corpus against a tiny benchmark set —
    every join must build on the broadcast benchmark side; a SortMergeJoin
    anywhere means the corpus started shuffling against the benchmark."""
    plan = plan_of(queries["x_decontaminate_near"](spark, SF))
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_simhash_pairs_has_no_pair_distinct_exchange(spark, queries):
    """simhash_pairs dedups band collisions map-side (first-collision-band
    rule) — a |candidate-pairs|-sized distinct would reintroduce an
    Exchange partitioned on (id_a, id_b). Allowed exchanges partition on
    doc_id/tok (signature aggregation) or band keys, never pair ids."""
    plan = plan_of(queries["x_dedup_simhash"](spark, SF))
    for line in plan.splitlines():
        if "hashpartitioning" in line:
            assert "id_a" not in line and "id_b" not in line, line.strip()


def test_guarded_ngram_pairs_window_tagged_df(spark):
    """The guarded n-gram scorer (ngram_jaccard_pairs max_df mode) tags df
    with a WINDOW over the shingle shuffle instead of a separate
    groupBy+rejoin, stores the tagged frame ONCE (r15: four consumers —
    both rare self-join sides, the hot index, the sizes — read the stored
    blocks instead of re-running the window sort per branch), and nothing
    drops to Python, a cartesian product, or a nested-loop join."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.operators.dedup import (
        _df_tag,
        ngram_jaccard_pairs,
        shingle_set,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = plan_of(ngram_jaccard_pairs(docs, threshold=0.6, max_df=10))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the consumers read the one stored tagged frame, not per-branch
    # re-evaluations of the window subtree
    assert "Scan ExistingRDD" in plan, plan[:2000]
    assert "windowspecdefinition(shingle" not in plan, plan[:2000]
    # ... and the stored frame's producing plan is the window tag, not an
    # aggregate+join
    tag_plan = plan_of(_df_tag(shingle_set(docs)))
    assert "windowspecdefinition(shingle" in tag_plan, tag_plan[:2000]


def _shuffle_exchanges(plan: str) -> list[str]:
    """Detail-section shuffle Exchange nodes (excludes broadcast + reuse)."""
    return [
        l for l in plan.splitlines()
        if l.strip().startswith("(") and ") Exchange" in l
    ]


def test_scd2_shares_one_exchange_across_both_windows(spark, queries):
    """x_scd2's change-filter preserves the user_id distribution and the
    (ts, event_id) sort, so lag and lead must share ONE shuffle — a second
    Exchange means the filter broke the distribution contract."""
    plan = plan_of(queries["x_scd2"](spark, SF))
    assert len(_shuffle_exchanges(plan)) == 1, plan
    assert "BatchEvalPython" not in plan


def test_funnel_stage_chain_rides_one_user_shuffle(spark, queries):
    """q_funnel's three conditional-min windows + per-user collapse reuse
    the user_id exchange; only the final single-row rollup may add one."""
    plan = plan_of(queries["q_funnel"](spark, SF))
    assert len(_shuffle_exchanges(plan)) <= 2, plan
    assert "BatchEvalPython" not in plan


def test_gapfill_broadcasts_daily_aggregate(spark, queries):
    """The dense spine joins the daily aggregate via broadcast — a
    SortMergeJoin would shuffle the generated spine against the fact
    rollup for no reason (both sides are types x days sized)."""
    plan = plan_of(queries["q_gapfill"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bm25_top50_is_take_ordered(spark, queries):
    """Global top-50 must plan as TakeOrderedAndProject (per-partition
    heaps), never a full global sort; scoring stays JVM-side."""
    plan = plan_of(queries["x_bm25"](spark, SF))
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan


def test_zorder_is_map_side_plus_one_rollup(spark, queries):
    """The Morton key is a pure projection; the only shuffle is the
    zbucket rollup (map-side combined)."""
    plan = plan_of(queries["x_zorder"](spark, SF))
    assert len(_shuffle_exchanges(plan)) == 1, plan
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "BatchEvalPython" not in plan


def test_aqe_splits_skewed_join_at_runtime(spark):
    """The session's AQE skew-join config actually fires: a 250k-row hot
    key meets a 1000-key dim in a SortMergeJoin and the FINAL adaptive
    plan must read the hot partition as split sub-partitions
    (AQEShuffleRead ... skewed / skew=true) — the runtime guard that
    makes un-salted hot keys survivable at 100 TB.  Also documents the
    two ways a naive probe hides the skew: a filter or projection that
    prunes the heavy column below the join erases the hot bytes, and a
    downstream op requiring the join's partitioning vetoes the split."""
    prev = {
        "spark.sql.autoBroadcastJoinThreshold":
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor":
            spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            spark.conf.get(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes":
            spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "128KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    try:
        left = spark.range(300_000).select(
            F.when(F.col("id") < 250_000, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").select("k", "pad", "w")
        assert len(j.toPandas()) == 300_000  # result correct under the split
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
        assert "skewed" in plan  # AQEShuffleRead split the hot partition
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_stage_quality_report_single_scan(spark, tmp_path):
    """The maintenance quality gate: all constraint counters in ONE
    aggregate job, violation counts exact."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        pipeline_maintenance,
        stage_quality_report,
    )
    from pyspark.sql.types import StructType, StructField, IntegerType, DoubleType

    path = str(tmp_path / "stage")
    rows = [
        (1, 100, 1000, 5.0),      # clean
        (None, 101, 1001, 5.0),   # null deviceid
        (2, 102, None, 5.0),      # null date_time
        (3, 103, 1003, 250.0),    # battery out of range
        (4, 104, 1004, 5.0),      # duplicate pair...
        (4, 104, 1004, 5.0),      # ...of this
    ]
    spark.createDataFrame(
        rows, "deviceid int, packetid int, date_time int, battery_voltage double"
    ).write.parquet(path)
    got = stage_quality_report(spark, path)
    assert got == {
        "null_deviceid": 1,
        "null_date_time": 1,
        "battery_out_of_range": 1,
        "duplicate_deliveries": 1,
    }
    # wired into the scheduled-maintenance pass
    declared = StructType([
        StructField("deviceid", IntegerType()),
        StructField("packetid", IntegerType()),
        StructField("date_time", IntegerType()),
        StructField("battery_voltage", DoubleType()),
    ])
    report = pipeline_maintenance(spark, path, declared, quality=True)
    assert report["quality_violations"] == got


def test_timeseries_monitor_cusum_and_mase(spark, tmp_path):
    """The maintenance-cadence CUSUM/MASE monitors (streaming twins of
    x_cusum_changepoint / x_forecast_mase): a planted sustained voltage
    shift fires the per-device CUSUM alarm and is still alarming on the
    latest day; a perfectly weekly-periodic device scores MASE 0; a
    constant healthy device raises no alarm."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        timeseries_monitor_report,
    )

    day0 = 1_700_000_000
    rows = []
    # device 1: 20 days at 10 V then 10 days at 14 V, 3 readings/day
    for day in range(30):
        lv = 10.0 if day < 20 else 14.0
        for k in range(3):
            # minute offsets: day0 is 22:13 UTC, hour offsets would
            # cross midnight and split a reading into the next day
            rows.append((1, day0 + day * 86400 + k * 60, lv + 0.01 * k))
    # device 2: 28 days, weekly-periodic daily value
    for day in range(28):
        lv = [5.0, 50.0, 5.0, 5.0, 5.0, 5.0, 5.0][day % 7]
        rows.append((2, day0 + day * 86400, lv))
    # device 3: constant
    for day in range(10):
        rows.append((3, day0 + day * 86400, 4.2))
    path = str(tmp_path / "stage")
    spark.createDataFrame(
        rows, "deviceid int, date_time int, battery_voltage double"
    ).write.parquet(path)
    got = timeseries_monitor_report(spark, path)
    assert set(got) == {1, 2, 3}
    d1, d2, d3 = got[1], got[2], got[3]
    assert d1["n_days"] == 30
    assert d1["cusum_alarms"] >= 1 and d1["alarm_latest"]
    assert d1["cusum_max"] > 0
    assert d2["mase"] == 0.0  # seasonal-naive is exact on the periodic series
    assert d2["mase_n_scored"] == 28 - 7
    assert d2["cusum_alarms"] == 0
    assert d3["cusum_alarms"] == 0 and not d3["alarm_latest"]
    assert d3["mase"] is None  # naive MAE is 0 on a constant series

    # Deployment-timezone independence (r8 ADVICE): the readings sit at
    # 22:13 UTC, so a session-timezone rendering (the old
    # to_date(from_unixtime(...)) shape) would shift them into the NEXT
    # local day in an east-of-UTC zone and change day boundaries, MASE
    # pairing and alarm_latest.  Epoch-day bucketing must make the report
    # identical under any session timezone.
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        assert timeseries_monitor_report(spark, path) == got
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)


def test_sprt_monitor_sticky_across_batches(spark, tmp_path):
    """The maintenance-cadence SPRT monitor (streaming twin of x_sprt):
    the low-battery rate starts ambiguous (continue), a high-rate batch
    crosses the upper Wald boundary (reject_h0), and a later batch that
    drags the raw LLR far below the LOWER boundary must NOT flip the
    verdict — the decision is sticky at the first crossing, exactly the
    r8 batch-key semantics, replayed per maintenance pass over the
    append-only stage zone."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        pipeline_maintenance,
        sprt_monitor_report,
    )
    from pyspark.sql.types import (
        DoubleType, IntegerType, StructField, StructType,
    )

    day0 = 1_700_000_000 - (1_700_000_000 % 86400)  # midnight-aligned
    path = str(tmp_path / "stage")

    def write_days(first_day, n_days, per_day, k_low):
        rows = []
        for d in range(first_day, first_day + n_days):
            for i in range(per_day):
                v = 10.5 if i < k_low else 12.5  # < 11.0 == "success"
                rows.append((1, day0 + d * 86400 + i * 60, v))
        spark.createDataFrame(
            rows, "deviceid int, date_time int, battery_voltage double"
        ).write.mode("append").parquet(path)

    # batch 1: 5 days at the null rate 4/20 = 0.20 — no verdict yet
    write_days(0, 5, 20, 4)
    r1 = sprt_monitor_report(spark, path)
    assert r1["decision"] == "continue" and r1["decided_day"] is None
    assert r1["n_days"] == 5 and r1["cum_n"] == 100 and r1["cum_k"] == 20

    # batch 2: 10 days at 30/100 = 0.30 — LLR climbs ~2.5/day and crosses
    # the upper boundary log(0.95/0.05) ≈ 2.94 within two days
    write_days(5, 10, 100, 30)
    r2 = sprt_monitor_report(spark, path)
    assert r2["decision"] == "reject_h0"
    assert r2["decided_day"] is not None
    first_crossing = r2["decided_day"]

    # batch 3: 26 days at 5/100 = 0.05 — the raw LLR plunges ~3.75/day and
    # ends far BELOW the lower boundary, but the verdict already happened
    write_days(15, 26, 100, 5)
    r3 = sprt_monitor_report(spark, path)
    assert r3["llr"] < -2.944  # the un-stopped statistic did cross down …
    assert r3["decision"] == "reject_h0"  # … and the decision is sticky
    assert r3["decided_day"] == first_crossing

    # and through the maintenance entry point, next to the other monitors
    declared = StructType([
        StructField("deviceid", IntegerType()),
        StructField("date_time", IntegerType()),
        StructField("battery_voltage", DoubleType()),
    ])
    report = pipeline_maintenance(spark, path, declared, monitor_sprt=True)
    assert report["sprt"] == r3


def test_mann_whitney_monitor_detects_recent_shift(spark, tmp_path):
    """The maintenance-cadence Mann–Whitney monitor (streaming twin of
    x_mann_whitney, r10): values jump from ~10 V to ~14 V in the last
    7 epoch-days → a significant upward distribution shift; a
    constant-value stage (every rank tied, zero variance) must read
    z = None through the shared nullif guard, not ANSI-throw; and the
    report is session-timezone-invariant (epoch-day bucketing)."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        mann_whitney_monitor_report,
        pipeline_maintenance,
    )
    from pyspark.sql.types import (
        DoubleType, IntegerType, StructField, StructType,
    )

    day0 = 1_700_000_000 - (1_700_000_000 % 86400) + 79_980  # 22:13 UTC
    rows = []
    for day in range(30):
        base = 10.0 if day < 23 else 14.0  # days 23..29 = the last 7
        for k in range(3):
            rows.append((1, day0 + day * 86400 + k * 60, base + 0.2 * k))
    path = str(tmp_path / "stage")
    spark.createDataFrame(
        rows, "deviceid int, date_time int, battery_voltage double"
    ).write.parquet(path)
    got = mann_whitney_monitor_report(spark, path)
    assert got["n_recent"] == 7 * 3 and got["n_baseline"] == 23 * 3
    assert got["shifted"] and got["direction"] == "up" and got["z"] > 0
    # recent values beat every baseline value: U = n_r * n_b exactly
    assert got["u_recent"] == 21.0 * 69.0

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        assert mann_whitney_monitor_report(spark, path) == got
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)

    # zero-variance pool: all readings identical → NULL z, no verdict
    flat = str(tmp_path / "flat")
    spark.createDataFrame(
        [(1, day0 + d * 86400, 4.2) for d in range(10)],
        "deviceid int, date_time int, battery_voltage double",
    ).write.parquet(flat)
    fz = mann_whitney_monitor_report(spark, flat)
    assert fz["z"] is None and not fz["shifted"] and fz["direction"] is None

    # and through the maintenance entry point
    declared = StructType([
        StructField("deviceid", IntegerType()),
        StructField("date_time", IntegerType()),
        StructField("battery_voltage", DoubleType()),
    ])
    report = pipeline_maintenance(
        spark, path, declared, monitor_mann_whitney=True
    )
    assert report["mann_whitney"] == got


def test_ks_monitor_detects_shape_drift(spark, tmp_path):
    """The maintenance-cadence exact two-sample KS monitor (streaming
    twin of x_ks_test, r14 — the VERDICT r13 #6 echo next to PSI and
    Mann–Whitney): the last 7 epoch-days get a VARIANCE blow-up that
    leaves the per-day median untouched — the shape drift a binless KS
    catches.  D, crit, and at_value are adjudicated against a plain-
    Python replication of the exact integer supremum; session-timezone
    invariant; NULL screens; partitioning-equivalent; a store younger
    than the window (no baseline) and an empty stage stay silent."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        ks_monitor_report,
        pipeline_maintenance,
    )
    from pyspark.sql.types import (
        DoubleType, IntegerType, StructField, StructType,
    )

    day0 = 1_700_000_000 - (1_700_000_000 % 86400) + 79_980  # 22:13 UTC
    rows, base_vals, rec_vals = [], [], []
    for day in range(30):
        vals = ([10.0, 10.1, 10.2] if day < 23
                else [8.0, 8.1, 12.1, 12.2])  # half the mass each side
        (base_vals if day < 23 else rec_vals).extend(vals)
        rows += [(1, day0 + day * 86400 + k * 60, v)
                 for k, v in enumerate(vals)]
    path = str(tmp_path / "stage")
    spark.createDataFrame(
        rows, "deviceid int, date_time int, battery_voltage double"
    ).write.parquet(path)
    got = ks_monitor_report(spark, path)
    # plain-Python replication of the exact integer supremum
    n1, n2 = len(rec_vals), len(base_vals)
    support = sorted(set(rec_vals) | set(base_vals))
    d_at = {
        v: abs(
            sum(x <= v for x in rec_vals) * n2
            - sum(x <= v for x in base_vals) * n1
        )
        for v in support
    }
    d_max = max(d_at.values())
    at = min(v for v, dn in d_at.items() if dn == d_max)
    crit = 1.3581015157406195 * ((n1 + n2) / (n1 * float(n2))) ** 0.5
    assert got["n_recent"] == n1 and got["n_baseline"] == n2
    assert got["ks_d"] == round(d_max / (n1 * float(n2)), 6)
    assert got["crit"] == round(crit, 6)
    assert got["reject"] and got["at_value"] == at

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        assert ks_monitor_report(spark, path) == got
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)

    # NULL value/ts rows belong to neither sample — report unchanged
    dirty = rows + [(1, day0 + 29 * 86400, None), (1, None, 3.0)]
    dp = str(tmp_path / "dirty")
    spark.createDataFrame(
        dirty, "deviceid int, date_time int, battery_voltage double"
    ).write.parquet(dp)
    assert ks_monitor_report(spark, dp) == got

    # partitioning-equivalence: pure function of the rows, not layout
    pp = str(tmp_path / "parts7")
    spark.createDataFrame(
        rows, "deviceid int, date_time int, battery_voltage double"
    ).repartition(7).write.parquet(pp)
    assert ks_monitor_report(spark, pp) == got

    # identical distributions on both sides: D = 0, never fires
    same = [(1, day0 + d * 86400 + k * 60, [10.0, 10.1, 10.2][k])
            for d in range(30) for k in range(3)]
    sp = str(tmp_path / "same")
    spark.createDataFrame(
        same, "deviceid int, date_time int, battery_voltage double"
    ).write.parquet(sp)
    sz = ks_monitor_report(spark, sp)
    assert sz["ks_d"] == 0.0 and not sz["reject"]

    # store younger than the window: every row is recent, no baseline
    young = [(1, day0 + d * 86400, 10.0 + d) for d in range(3)]
    yp = str(tmp_path / "young")
    spark.createDataFrame(
        young, "deviceid int, date_time int, battery_voltage double"
    ).write.parquet(yp)
    yz = ks_monitor_report(spark, yp)
    assert yz["n_baseline"] == 0 and yz["ks_d"] is None and not yz["reject"]

    # empty stage: silent, never fires
    ep = str(tmp_path / "empty")
    spark.createDataFrame(
        [], "deviceid int, date_time int, battery_voltage double"
    ).write.parquet(ep)
    ez = ks_monitor_report(spark, ep)
    assert ez == {"n_recent": 0, "n_baseline": 0, "ks_d": None,
                  "crit": None, "reject": False, "at_value": None}

    # and through the maintenance entry point
    declared = StructType([
        StructField("deviceid", IntegerType()),
        StructField("date_time", IntegerType()),
        StructField("battery_voltage", DoubleType()),
    ])
    report = pipeline_maintenance(spark, path, declared, monitor_ks=True)
    assert report["ks"] == got


def test_did_monitor_isolates_rollout_effect(spark, tmp_path):
    """The maintenance-cadence DiD monitor (streaming twin of
    x_diff_in_diff, r10): odd devices get a +5 V firmware effect after
    the split day while a +2 V fleet-wide shock hits EVERYONE post-split
    — DiD must read ~+5 (the rollout), not +7 (rollout + shock), and be
    significant; with a cell missing (no pre-period data) the estimate
    stays None instead of throwing."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        did_monitor_report,
    )

    day0 = 1_700_000_000 - (1_700_000_000 % 86400)
    split = day0 // 86400 + 10
    rows = []
    for dev in (1, 2, 3, 4):  # 1, 3 treated (odd); 2, 4 control
        for day in range(20):
            post = day >= 10
            v = 10.0 + (2.0 if post else 0.0)        # fleet-wide shock
            if dev % 2 == 1 and post:
                v += 5.0                               # rollout effect
            for k in range(3):
                rows.append((dev, day0 + day * 86400 + k * 60, v + 0.1 * k))
    path = str(tmp_path / "stage")
    spark.createDataFrame(
        rows, "deviceid int, date_time int, battery_voltage double"
    ).write.parquet(path)
    got = did_monitor_report(spark, path, split_day=split)
    assert got["split_day"] == split
    assert got["cells"]["treat_post"]["n"] == 2 * 10 * 3
    assert abs(got["did"] - 5.0) < 0.01 and got["significant"]
    # control moved +2 (the shock): DiD subtracted it out
    assert abs(
        got["cells"]["ctrl_post"]["mean"] - got["cells"]["ctrl_pre"]["mean"]
        - 2.0
    ) < 0.01

    # missing pre-period: every row post-split → insufficient cells
    late = str(tmp_path / "late")
    spark.createDataFrame(
        [(d, day0 + (12 + i) * 86400, 10.0 + 0.1 * i)
         for d in (1, 2) for i in range(5)],
        "deviceid int, date_time int, battery_voltage double",
    ).write.parquet(late)
    miss = did_monitor_report(spark, late, split_day=split)
    assert miss["did"] is None and not miss["significant"]
    assert miss["cells"]["treat_pre"]["n"] == 0


def test_survival_monitor_censors_correctly(spark, tmp_path):
    """The maintenance-cadence KM survival monitor (streaming twin of
    x_survival, r10): 6 devices first seen the same day — three go
    low-battery at days 3/10/17, one at day 24, two never do (last
    readings days 20 and 25, CENSORED).  Hand-computed product-limit
    curve with 7-day buckets: n_risk 6/5/4/2, Ŝ = .833333, .666666,
    .5, .25; median at bucket 2 → 14 days.  A naive churn rate would
    call the two censored devices dead — KM must not."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        pipeline_maintenance,
        survival_monitor_report,
    )
    from pyspark.sql.types import (
        DoubleType, IntegerType, StructField, StructType,
    )

    day0 = 1_700_000_000 - (1_700_000_000 % 86400)
    rows = []

    def readings(dev, last_day, event_day=None):
        for d in range(last_day + 1):
            low = event_day is not None and d >= event_day
            rows.append((dev, day0 + d * 86400, 9.0 if low else 12.6))

    readings(1, 5, event_day=3)
    readings(2, 12, event_day=10)
    readings(3, 18, event_day=17)
    readings(4, 20)                 # censored at day 20 (bucket 2)
    readings(5, 25)                 # censored at day 25 (bucket 3)
    readings(6, 26, event_day=24)
    path = str(tmp_path / "stage")
    # NULL-ts / NULL-device rows belong to no lifetime
    rows += [(1, None, 9.0), (None, day0, 9.0)]
    spark.createDataFrame(
        rows, "deviceid int, date_time int, battery_voltage double"
    ).write.parquet(path)
    got = survival_monitor_report(spark, path)
    assert got["n_devices"] == 6
    assert got["n_events"] == 4 and got["n_censored"] == 2
    assert [p["n_risk"] for p in got["km_curve"]] == [6, 5, 4, 2]
    assert [p["km"] for p in got["km_curve"]] == pytest.approx(
        [0.833333, 0.666666, 0.5, 0.25], abs=2e-6
    )
    assert got["median_survival_days"] == 14

    # healthy fleet: no events → km stays 1.0, median None
    healthy = str(tmp_path / "healthy")
    spark.createDataFrame(
        [(d, day0 + i * 86400, 12.6) for d in (1, 2) for i in range(9)],
        "deviceid int, date_time int, battery_voltage double",
    ).write.parquet(healthy)
    h = survival_monitor_report(spark, healthy)
    assert h["n_events"] == 0 and h["median_survival_days"] is None
    assert all(p["km"] == 1.0 for p in h["km_curve"])

    # and through the maintenance entry point
    declared = StructType([
        StructField("deviceid", IntegerType()),
        StructField("date_time", IntegerType()),
        StructField("battery_voltage", DoubleType()),
    ])
    report = pipeline_maintenance(
        spark, path, declared, monitor_survival=True
    )
    assert report["survival"] == got


def test_monitors_screen_null_timestamps_and_null_treat(spark, tmp_path):
    """NULL-hygiene regression (round-10 review): rows whose timestamp —
    or, for DiD, whose treat predicate — evaluates NULL belong to NO
    window/cell.  Before the screen, NULL-ts rows silently landed in the
    Mann–Whitney BASELINE (is_recent NULL → counted in t, not a) and
    biased the rank arithmetic, and phantom (treat, NULL) cells could
    crash DiD's four-cell accounting with a KeyError once len(cells)
    reached 4.  The reports must equal the clean-subset reports exactly."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        did_monitor_report,
        mann_whitney_monitor_report,
    )

    day0 = 1_700_000_000 - (1_700_000_000 % 86400)
    split = day0 // 86400 + 10
    schema = "deviceid int, date_time int, battery_voltage double"
    clean = []
    for dev in (1, 2):
        for day in range(20):
            v = 10.0 + (3.0 if (dev % 2 == 1 and day >= 10) else 0.0)
            clean.append((dev, day0 + day * 86400, v + 0.01 * day))
    # NULL-ts junk is invisible to BOTH monitors; the NULL-deviceid row
    # with a VALID timestamp is a legitimate Mann-Whitney reading (that
    # monitor is device-agnostic) but evaluates treat=NULL for DiD, so it
    # only belongs in the DiD dirty set.
    dirty_mw = clean + [(1, None, 99.0), (2, None, 0.5), (None, None, 42.0)]
    dirty_did = dirty_mw + [(None, day0 + 15 * 86400, 7.0)]
    cp = str(tmp_path / "clean")
    mp, dp = str(tmp_path / "dirty_mw"), str(tmp_path / "dirty_did")
    spark.createDataFrame(clean, schema).write.parquet(cp)
    spark.createDataFrame(dirty_mw, schema).write.parquet(mp)
    spark.createDataFrame(dirty_did, schema).write.parquet(dp)
    assert mann_whitney_monitor_report(spark, mp) == \
        mann_whitney_monitor_report(spark, cp)
    assert did_monitor_report(spark, dp, split_day=split) == \
        did_monitor_report(spark, cp, split_day=split)

    # all-post + NULL-day rows: the shape that used to KeyError (phantom
    # cells pushing len(cells) past the guard) — must return did=None
    crashy = [(d, day0 + (12 + i) * 86400, 10.0 + i)
              for d in (1, 2) for i in range(3)]
    crashy += [(1, None, 5.0), (2, None, 6.0)]
    kp = str(tmp_path / "crashy")
    spark.createDataFrame(crashy, schema).write.parquet(kp)
    kc = did_monitor_report(spark, kp, split_day=split)
    assert kc["did"] is None and not kc["significant"]


def test_auc_monitor_detects_discrimination_loss(spark, tmp_path):
    """The maintenance-cadence AUC monitor (streaming twin of x_auc,
    r11 — the VERDICT r10 #4 scorer-eval cadence): in the baseline the
    solar scorer perfectly rank-separates the low-battery label
    (every positive's score below every negative's → AUC exactly 0.0,
    discrimination 1.0); in the last 7 epoch-days the pos/neg score
    distributions coincide (AUC exactly 0.5, discrimination 0.0) —
    delta_discrimination = −1 and the flag fires.  Session-timezone
    invariant (epoch-day bucketing); a single-class window reads
    auc = None through the nullif guard and never fires."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        auc_monitor_report,
        pipeline_maintenance,
    )
    from pyspark.sql.types import (
        DoubleType, IntegerType, StructField, StructType,
    )

    day0 = 1_700_000_000 - (1_700_000_000 % 86400) + 79_980  # 22:13 UTC
    rows = []
    for day in range(30):
        ts = day0 + day * 86400
        if day < 23:   # baseline: low solar ⇔ low battery, AUC = 0
            quads = [(1.0, 9.0), (2.0, 9.5), (5.0, 12.0), (6.0, 13.0)]
        else:          # recent: same scores, labels decoupled, AUC = 0.5
            quads = [(1.0, 12.0), (2.0, 9.0), (5.0, 9.5), (6.0, 13.0)]
        for k, (solar, bv) in enumerate(quads):
            rows.append((1, ts + k * 60, solar, bv))
    schema = ("deviceid int, date_time int, solar_panel_voltage double, "
              "battery_voltage double")
    path = str(tmp_path / "stage")
    spark.createDataFrame(rows, schema).write.parquet(path)
    got = auc_monitor_report(spark, path)
    assert got["n_recent"] == 7 * 4 and got["n_baseline"] == 23 * 4
    assert got["auc_baseline"] == 0.0 and got["auc_recent"] == 0.5
    assert got["delta_discrimination"] == -1.0 and got["degraded"]

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        assert auc_monitor_report(spark, path) == got
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)

    # NULL score/label/ts rows belong to no window — report unchanged
    dirty = rows + [(1, None, 3.0, 9.0), (1, day0, None, 9.0),
                    (1, day0, 3.0, None)]
    dp = str(tmp_path / "dirty")
    spark.createDataFrame(dirty, schema).write.parquet(dp)
    assert auc_monitor_report(spark, dp) == got

    # single-class window: every reading healthy → both windows lack a
    # positive, auc None on both sides, no verdict
    flat = [(1, day0 + d * 86400, 5.0, 12.6) for d in range(10)]
    fp = str(tmp_path / "flat")
    spark.createDataFrame(flat, schema).write.parquet(fp)
    fz = auc_monitor_report(spark, fp)
    assert fz["auc_recent"] is None and fz["auc_baseline"] is None
    assert fz["delta_discrimination"] is None and not fz["degraded"]

    # and through the maintenance entry point
    declared = StructType([
        StructField("deviceid", IntegerType()),
        StructField("date_time", IntegerType()),
        StructField("solar_panel_voltage", DoubleType()),
        StructField("battery_voltage", DoubleType()),
    ])
    report = pipeline_maintenance(spark, path, declared, monitor_auc=True)
    assert report["auc"] == got


def test_benford_monitor_flags_fabricated_counter(spark, tmp_path):
    """The maintenance-cadence Benford gate (streaming twin of
    x_benford, r11 — the VERDICT r10 #4 Benford gate): a counter
    planted at EXACTLY round(1000·log10(1+1/d)) rows per digit (values
    d·111, so digit extraction walks the multi-char path) grades
    'close' (MAD ≤ 0.006, the rounding residue alone); a fabricated
    uniform-digit counter (100 rows each of 100d) has MAD ≈ 0.0597 —
    'nonconforming', flag down.  NULL/zero/negative rows are screened;
    below min_n the verdict abstains (None, not a noise verdict)."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        benford_monitor_report,
        pipeline_maintenance,
    )
    from pyspark.sql.types import IntegerType, StructField, StructType

    import math

    per_digit = {d: round(1000 * math.log10(1 + 1 / d)) for d in range(1, 10)}
    assert sum(per_digit.values()) == 1000
    rows = [(1, d * 111) for d, n in per_digit.items() for _ in range(n)]
    rows += [(1, 0), (1, -5), (1, None)]  # screened: digit undefined
    schema = ("deviceid int, "
              "no_messages_sent_since_last_power_cycle int")
    path = str(tmp_path / "stage")
    spark.createDataFrame(rows, schema).write.parquet(path)
    got = benford_monitor_report(spark, path)
    assert got["n_total"] == 1000
    assert got["digits"][1]["n"] == per_digit[1]
    assert got["mad"] is not None and got["mad"] <= 0.006
    assert got["mad_verdict"] == "close" and got["conforming"] is True

    fab = [(1, d * 100 + 7) for d in range(1, 10) for _ in range(100)]
    fp = str(tmp_path / "fab")
    spark.createDataFrame(fab, schema).write.parquet(fp)
    bad = benford_monitor_report(spark, fp)
    assert bad["n_total"] == 900
    assert abs(bad["mad"] - 0.059716) < 1e-4
    assert bad["mad_verdict"] == "nonconforming"
    assert bad["conforming"] is False and bad["chi_total"] > 20.09

    # below min_n: abstain, don't guess
    tiny = [(1, 123)] * 50
    tp = str(tmp_path / "tiny")
    spark.createDataFrame(tiny, schema).write.parquet(tp)
    tz = benford_monitor_report(spark, tp)
    assert tz["n_total"] == 50
    assert tz["mad"] is None and tz["conforming"] is None

    # double-typed column: NaN compares GREATER than any numeric in
    # Spark, so without the isnan screen it passes >= 1 and ANSI-throws
    # in floor→BIGINT; >=2^63 values would CAST_OVERFLOW; (0,1) values
    # have no first digit under the integer-prefix extraction — all
    # three must be screened, not crash the maintenance pass
    dbl = [(1, float(d) * 111.0) for d in range(1, 10) for _ in range(112)]
    dbl += [(1, float("nan")), (1, 9.3e18), (1, 0.5), (1, None)]
    dp2 = str(tmp_path / "dbl")
    spark.createDataFrame(
        dbl, "deviceid int, no_messages_sent_since_last_power_cycle double"
    ).write.parquet(dp2)
    dz = benford_monitor_report(spark, dp2)
    assert dz["n_total"] == 9 * 112 and dz["mad_verdict"] == "nonconforming"

    # and through the maintenance entry point
    declared = StructType([
        StructField("deviceid", IntegerType()),
        StructField("no_messages_sent_since_last_power_cycle",
                    IntegerType()),
    ])
    report = pipeline_maintenance(
        spark, path, declared, monitor_benford=True
    )
    assert report["benford"] == got


def test_gini_monitor_detects_ingest_concentration(spark, tmp_path):
    """The maintenance-cadence Gini gate (streaming twin of
    x_gini_concentration, r12 — the VERDICT r11 #5 cadence echo): in the
    baseline 4 devices send equal volume (Gini exactly 0); in the last
    7 epoch-days device 1 sends 97×/day while the rest send 1×/day —
    recent Gini is exactly 0.72 by the sorted-rank identity
    (counts [7,7,7,679]: wsum = 7·1+7·2+7·3+679·4 = 2758, G =
    2·2758/(4·700) − 5/4), delta 0.72 > 0.05 and the flag fires.
    Session-timezone invariant; NULL key/ts rows screened; a
    single-window table reads None on the missing side and never
    fires."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        gini_monitor_report,
        pipeline_maintenance,
    )
    from pyspark.sql.types import IntegerType, StructField, StructType

    day0 = 1_700_000_000 - (1_700_000_000 % 86400) + 79_980  # 22:13 UTC
    rows = []
    for day in range(30):
        ts = day0 + day * 86400
        if day < 23:   # baseline: 4 devices × 5 rows each → Gini 0
            per_dev = {1: 5, 2: 5, 3: 5, 4: 5}
        else:          # recent: device 1 floods → Gini 0.72
            per_dev = {1: 97, 2: 1, 3: 1, 4: 1}
        for dev, n in per_dev.items():
            rows += [(dev, ts + k) for k in range(n)]
    schema = "deviceid int, date_time int"
    path = str(tmp_path / "stage")
    spark.createDataFrame(rows, schema).write.parquet(path)
    got = gini_monitor_report(spark, path)
    assert got["n_recent"] == 700 and got["n_baseline"] == 23 * 20
    assert got["k_recent"] == 4 and got["k_baseline"] == 4
    assert got["gini_baseline"] == 0.0 and got["gini_recent"] == 0.72
    assert got["delta"] == 0.72 and got["concentrating"]

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        assert gini_monitor_report(spark, path) == got
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)

    # NULL key/ts rows belong to no window — report unchanged
    dirty = rows + [(None, day0), (1, None)]
    dp = str(tmp_path / "dirty")
    spark.createDataFrame(dirty, schema).write.parquet(dp)
    assert gini_monitor_report(spark, dp) == got

    # partitioning-equivalence: the report is a pure function of the
    # rows, not of the stage zone's file layout
    pp = str(tmp_path / "parts7")
    spark.createDataFrame(rows, schema).repartition(7).write.parquet(pp)
    assert gini_monitor_report(spark, pp) == got

    # all rows inside the recent window: baseline side None, no verdict
    recent_only = [(d, day0 + k) for d in (1, 2) for k in range(3)]
    rp = str(tmp_path / "recent_only")
    spark.createDataFrame(recent_only, schema).write.parquet(rp)
    rz = gini_monitor_report(spark, rp)
    assert rz["n_baseline"] == 0 and rz["gini_baseline"] is None
    assert rz["delta"] is None and not rz["concentrating"]

    # and through the maintenance entry point
    declared = StructType([
        StructField("deviceid", IntegerType()),
        StructField("date_time", IntegerType()),
    ])
    report = pipeline_maintenance(spark, path, declared, monitor_gini=True)
    assert report["gini"] == got


def test_source_kl_monitor_flags_category_mix_shift(spark, tmp_path):
    """The maintenance-cadence categorical-mix gate (streaming twin of
    x_source_kl, r12 — the VERDICT r11 #5 cadence echo): baseline
    traffic is uniform over 4 devices; in the last 7 epoch-days only
    device 1 sends — KL(recent ‖ baseline) is far above the 0.1-nat
    threshold and the flag fires.  A no-shift control (same mix both
    windows) reads near-zero KL and stays quiet.  +0.5 smoothing over
    the union scaffold keeps a baseline-absent category finite.
    Session-timezone invariant; NULL screens; an empty window reads
    None, never a smoothed-uniform fabrication."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        pipeline_maintenance,
        source_kl_monitor_report,
    )
    from pyspark.sql.types import IntegerType, StructField, StructType

    day0 = 1_700_000_000 - (1_700_000_000 % 86400) + 79_980  # 22:13 UTC
    rows = []
    for day in range(30):
        ts = day0 + day * 86400
        if day < 23:   # baseline: uniform mix over 4 devices
            per_dev = {1: 25, 2: 25, 3: 25, 4: 25}
        else:          # recent: device 1 only — mix collapses
            per_dev = {1: 100}
        for dev, n in per_dev.items():
            rows += [(dev, ts + k) for k in range(n)]
    schema = "deviceid int, date_time int"
    path = str(tmp_path / "stage")
    spark.createDataFrame(rows, schema).write.parquet(path)
    got = source_kl_monitor_report(spark, path)
    assert got["n_recent"] == 700 and got["n_baseline"] == 2300
    assert got["k_categories"] == 4
    assert got["kl_nats"] is not None and got["kl_nats"] > 1.0
    assert got["shifted"]

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        assert source_kl_monitor_report(spark, path) == got
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)

    # NULL cat/ts rows belong to no window — report unchanged
    dirty = rows + [(None, day0), (1, None)]
    dp = str(tmp_path / "dirty")
    spark.createDataFrame(dirty, schema).write.parquet(dp)
    assert source_kl_monitor_report(spark, dp) == got

    # partitioning-equivalence: the report is a pure function of the
    # rows, not of the stage zone's file layout
    pp = str(tmp_path / "parts7")
    spark.createDataFrame(rows, schema).repartition(7).write.parquet(pp)
    assert source_kl_monitor_report(spark, pp) == got

    # no-shift control: identical mix both windows → near-zero KL
    flat = []
    for day in range(30):
        ts = day0 + day * 86400
        flat += [(dev, ts + k) for dev in (1, 2, 3, 4) for k in range(25)]
    fp = str(tmp_path / "flat")
    spark.createDataFrame(flat, schema).write.parquet(fp)
    fz = source_kl_monitor_report(spark, fp)
    assert fz["kl_nats"] is not None and abs(fz["kl_nats"]) < 0.01
    assert not fz["shifted"]

    # all rows recent: baseline empty → None, no smoothed fabrication
    recent_only = [(d, day0 + k) for d in (1, 2) for k in range(3)]
    rp = str(tmp_path / "recent_only")
    spark.createDataFrame(recent_only, schema).write.parquet(rp)
    rz = source_kl_monitor_report(spark, rp)
    assert rz["n_baseline"] == 0 and rz["kl_nats"] is None
    assert not rz["shifted"]

    # and through the maintenance entry point
    declared = StructType([
        StructField("deviceid", IntegerType()),
        StructField("date_time", IntegerType()),
    ])
    report = pipeline_maintenance(
        spark, path, declared, monitor_source_kl=True
    )
    assert report["source_kl"] == got


def test_heavy_hitters_monitor_names_flooding_key(spark, tmp_path):
    """The maintenance-cadence CMS token-flood gate (streaming twin of
    x_heavy_hitters, r13 — the VERDICT r12 #7 cadence echo): in the
    last 7 epoch-days device 1 sends 97×/day while devices 2-4 send
    1×/day — the top hitter is named with exact share 0.97 > 0.5 and
    the flood flag fires; every CMS estimate honors the
    never-underestimates invariant (cms_sound).  A uniform control
    reads share 0.25 and stays quiet.  Baseline-only traffic is
    EXCLUDED (flood is a recency question).  Session-timezone
    invariant; NULL key/ts rows screened; partitioning-equivalent;
    an empty stage reads empty/None and never fires."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        heavy_hitters_monitor_report,
        pipeline_maintenance,
    )
    from pyspark.sql.types import IntegerType, StructField, StructType

    day0 = 1_700_000_000 - (1_700_000_000 % 86400) + 79_980  # 22:13 UTC
    rows = []
    for day in range(30):
        ts = day0 + day * 86400
        if day < 23:   # baseline: device 9 dominates — must NOT leak
            per_dev = {9: 50, 2: 1}
        else:          # recent: device 1 floods
            per_dev = {1: 97, 2: 1, 3: 1, 4: 1}
        for dev, n in per_dev.items():
            rows += [(dev, ts + k) for k in range(n)]
    schema = "deviceid int, date_time int"
    path = str(tmp_path / "stage")
    spark.createDataFrame(rows, schema).write.parquet(path)
    got = heavy_hitters_monitor_report(spark, path)
    assert got["n_recent"] == 700 and got["k_distinct_recent"] == 4
    assert got["top"][0]["key"] == "1"
    assert got["top"][0]["exact_n"] == 679
    assert got["top_share"] == round(679 / 700, 6)
    assert got["flooding"] and got["cms_sound"]
    assert got["max_overcount"] >= 0
    assert all(t["overcount"] >= 0 for t in got["top"])  # CMS invariant
    assert all(t["key"] != "9" for t in got["top"])  # baseline excluded

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        assert heavy_hitters_monitor_report(spark, path) == got
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)

    # NULL key/ts rows belong to no window — report unchanged
    dirty = rows + [(None, day0 + 29 * 86400), (1, None)]
    dp = str(tmp_path / "dirty")
    spark.createDataFrame(dirty, schema).write.parquet(dp)
    assert heavy_hitters_monitor_report(spark, dp) == got

    # partitioning-equivalence: pure function of the rows, not layout
    pp = str(tmp_path / "parts7")
    spark.createDataFrame(rows, schema).repartition(7).write.parquet(pp)
    assert heavy_hitters_monitor_report(spark, pp) == got

    # uniform control: top share 1/4 — no flood
    flat = []
    for day in range(30):
        ts = day0 + day * 86400
        flat += [(dev, ts + k) for dev in (1, 2, 3, 4) for k in range(25)]
    fp = str(tmp_path / "flat")
    spark.createDataFrame(flat, schema).write.parquet(fp)
    fz = heavy_hitters_monitor_report(spark, fp)
    assert fz["top_share"] == 0.25 and not fz["flooding"]
    assert fz["cms_sound"]

    # empty stage: empty/None, never fires
    ep = str(tmp_path / "empty")
    spark.createDataFrame([], schema).write.parquet(ep)
    ez = heavy_hitters_monitor_report(spark, ep)
    assert ez == {"n_recent": 0, "k_distinct_recent": 0, "top": [],
                  "top_share": None, "flooding": False, "cms_sound": None,
                  "max_overcount": None}

    # and through the maintenance entry point
    declared = StructType([
        StructField("deviceid", IntegerType()),
        StructField("date_time", IntegerType()),
    ])
    report = pipeline_maintenance(
        spark, path, declared, monitor_heavy_hitters=True
    )
    assert report["heavy_hitters"] == got


def test_dedup_census_monitor_localizes_template_flood(spark, tmp_path):
    """The maintenance-cadence near-dup census monitor (streaming twin
    of x_dedup_census, r14 — the VERDICT r13 #6 echo): a batch with a
    6-copy template family, one organic 0.6-Jaccard near-pair, and 12
    distinct singletons must census as {1:12, 2:1, 6:1}, read
    dup_mass = 8/20, name the template cluster's min-id representative,
    and fire the flood verdict; an all-distinct batch reads dup_mass 0
    and stays quiet; NULL id/text rows are screened; the report is
    partitioning-invariant; an empty batch reads empty/None."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        dedup_census_monitor_report,
        pipeline_maintenance,
    )
    from pyspark.sql.types import IntegerType, StructField, StructType

    template = "free prize click here now winner claim today"
    rows = [(100 + i, template) for i in range(6)]
    rows += [(200, "alpha beta gamma delta epsilon zeta"),
             (201, "alpha beta gamma delta epsilon eta")]  # J = 3/5 = 0.6
    rows += [(300 + i, f"organic{i} document{i} body{i} text{i} unique{i}")
             for i in range(12)]
    path = str(tmp_path / "batch")
    spark.createDataFrame(rows, "doc_id int, text string").write.parquet(path)
    got = dedup_census_monitor_report(spark, path)
    assert got["census"] == [
        {"cluster_size": 1, "n_clusters": 12, "n_docs": 12},
        {"cluster_size": 2, "n_clusters": 1, "n_docs": 2},
        {"cluster_size": 6, "n_clusters": 1, "n_docs": 6},
    ]
    assert got["n_docs"] == 20 and got["n_clusters"] == 14
    assert got["dup_mass"] == 0.4 and got["max_cluster"] == 6
    assert got["top_template"] == {"cluster_id": 100, "size": 6}
    assert got["flooding"]

    # NULL id/text rows belong to no census — report unchanged
    dirty = rows + [(None, template), (999, None)]
    dp = str(tmp_path / "dirty")
    spark.createDataFrame(dirty, "doc_id int, text string").write.parquet(dp)
    assert dedup_census_monitor_report(spark, dp) == got

    # partitioning-equivalence: pure function of the rows, not layout
    pp = str(tmp_path / "parts7")
    spark.createDataFrame(rows, "doc_id int, text string").repartition(
        7
    ).write.parquet(pp)
    assert dedup_census_monitor_report(spark, pp) == got

    # an all-distinct batch: every doc a singleton, no flood
    solo = [(i, f"alone{i} words{i} here{i} only{i} once{i}")
            for i in range(5)]
    sp = str(tmp_path / "solo")
    spark.createDataFrame(solo, "doc_id int, text string").write.parquet(sp)
    sz = dedup_census_monitor_report(spark, sp)
    assert sz["census"] == [
        {"cluster_size": 1, "n_clusters": 5, "n_docs": 5}
    ]
    assert sz["dup_mass"] == 0.0 and not sz["flooding"]
    assert sz["top_template"]["size"] == 1

    # empty batch: silent, never fires
    ep = str(tmp_path / "empty")
    spark.createDataFrame([], "doc_id int, text string").write.parquet(ep)
    assert dedup_census_monitor_report(spark, ep) == {
        "n_docs": 0, "n_clusters": 0, "census": [], "dup_mass": None,
        "max_cluster": None, "top_template": None, "flooding": False,
    }

    # and through the maintenance entry point (own-path pattern, like
    # drift_profile_path — the stage zone carries no document text)
    declared = StructType([StructField("deviceid", IntegerType())])
    report = pipeline_maintenance(
        spark, str(tmp_path / "nostage"), declared,
        monitor_dedup_census_path=path,
    )
    assert report["dedup_census"] == got


def test_sketch_store_monitor_adjudicates_daily_and_union_hll(spark, tmp_path):
    """The maintenance-cadence HLL sketch-store health gate (streaming
    twin of x_active_users_hll, r13 — the other VERDICT r12 #7 echo):
    7 recent epoch-days with known per-day device sets — every daily
    estimate and the 7-day union estimate match the exact distincts
    (fleet-sized cardinalities sit in the sketch's sparse regime where
    the estimate is exact), so every ok flag and ``healthy`` read True.
    A skipped day inside the window reads missing_days 1 (ingestion
    gap); a store younger than the window is NOT flagged.
    Session-timezone invariant; NULL screens; partitioning-equivalent;
    an empty stage reads empty/None and never fires.  ADVICE r13: the
    data-anchored default is blind to a TRAILING gap (a stall re-anchors
    the window), so ``as_of_day`` wall-clock anchoring must surface
    stall days as missing — including a complete stall (empty window,
    non-empty store) — while an as_of at the last observed day
    reproduces the default exactly and an empty store stays silent."""
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.sources.maintenance import (
        pipeline_maintenance,
        sketch_store_monitor_report,
    )
    from pyspark.sql.types import IntegerType, StructField, StructType

    day0 = 1_700_000_000 - (1_700_000_000 % 86400) + 79_980  # 22:13 UTC
    rows = []
    for day in range(30):
        ts = day0 + day * 86400
        # day d sees devices 1..(3 + d % 4): per-day distincts 3..6,
        # union over any 7-day window = 6
        for dev in range(1, 4 + day % 4):
            rows += [(dev, ts + k) for k in range(5)]
    schema = "deviceid int, date_time int"
    path = str(tmp_path / "stage")
    spark.createDataFrame(rows, schema).write.parquet(path)
    got = sketch_store_monitor_report(spark, path)
    assert got["n_days"] == 7 and got["missing_days"] == 0
    assert [d["exact"] for d in got["days"]] == [
        2 + (23 + i) % 4 + 1 for i in range(7)
    ]
    assert all(d["est"] == d["exact"] and d["ok"] for d in got["days"])
    assert got["union_exact"] == 6 and got["union_est"] == 6
    assert got["union_ok"] and got["healthy"]

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        assert sketch_store_monitor_report(spark, path) == got
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)

    # NULL key/ts rows belong to no window — report unchanged
    dirty = rows + [(None, day0 + 29 * 86400), (1, None)]
    dp = str(tmp_path / "dirty")
    spark.createDataFrame(dirty, schema).write.parquet(dp)
    assert sketch_store_monitor_report(spark, dp) == got

    # partitioning-equivalence: pure function of the rows, not layout
    pp = str(tmp_path / "parts7")
    spark.createDataFrame(rows, schema).repartition(7).write.parquet(pp)
    assert sketch_store_monitor_report(spark, pp) == got

    # a silent day INSIDE the window is an ingestion gap, and a LEADING
    # gap counts too (the store is older than the window, so the empty
    # early window-days are missing state, not a shorter window)
    gap = [(d, t) for (d, t) in rows
           if not (day0 + 26 * 86400 <= t < day0 + 27 * 86400)]
    gp = str(tmp_path / "gap")
    spark.createDataFrame(gap, schema).write.parquet(gp)
    gz = sketch_store_monitor_report(spark, gp)
    assert gz["n_days"] == 6 and gz["missing_days"] == 1

    # store younger than the window: 3 days of data, expected clips to 3
    young = [(d, t) for (d, t) in rows if t >= day0 + 27 * 86400]
    yp = str(tmp_path / "young")
    spark.createDataFrame(young, schema).write.parquet(yp)
    yz = sketch_store_monitor_report(spark, yp)
    assert yz["n_days"] == 3 and yz["missing_days"] == 0
    assert yz["healthy"]

    # empty stage: empty/None, never fires
    ep = str(tmp_path / "empty")
    spark.createDataFrame([], schema).write.parquet(ep)
    ez = sketch_store_monitor_report(spark, ep)
    assert ez == {"days": [], "n_days": 0, "missing_days": 0,
                  "union_exact": 0, "union_est": 0, "union_ok": None,
                  "healthy": None}

    # wall-clock anchoring (ADVICE r13).  The store's last day is
    # base+29; "now" two days later = a 2-day trailing stall the
    # data-anchored mode cannot see: 5 present days, 2 missing.
    last_day = day0 // 86400 + 29
    az = sketch_store_monitor_report(spark, path, as_of_day=last_day + 2)
    assert az["n_days"] == 5 and az["missing_days"] == 2
    # anchored exactly at the last observed day == the default window
    assert sketch_store_monitor_report(
        spark, path, as_of_day=last_day
    ) == got
    # complete stall: empty window over a non-empty store surfaces the
    # whole expected span; healthy stays None (nothing to adjudicate),
    # missing_days carries the alarm
    sz = sketch_store_monitor_report(spark, path, as_of_day=last_day + 30)
    assert sz["n_days"] == 0 and sz["missing_days"] == 7
    assert sz["healthy"] is None
    # an empty STORE stays silent even in wall-clock mode (cannot
    # distinguish "stalled" from "never deployed")
    assert sketch_store_monitor_report(
        spark, ep, as_of_day=last_day
    ) == ez

    # and through the maintenance entry point
    declared = StructType([
        StructField("deviceid", IntegerType()),
        StructField("date_time", IntegerType()),
    ])
    report = pipeline_maintenance(
        spark, path, declared, monitor_sketch_store=True
    )
    assert report["sketch_store"] == got


def test_tiere_plans_have_no_cartesian_or_nested_loop(spark, queries):
    """Tier E candidate generation must stay keyed: the triangle wedge
    join, the SemDeDup pair join and the Bloom probe are all equi-joins —
    a refactor that drops the equi-key degrades them to a nested-loop
    cross product, which is the 100 TB failure mode."""
    for key in ("q_triangle_count", "x_dedup_semantic", "x_decontaminate_bloom"):
        plan = plan_of(queries[key](spark, SF))
        assert "CartesianProduct" not in plan, key
        if key == "x_dedup_semantic":
            # the ONLY nested-loop allowed is the k-row broadcast-centroid
            # argmax (same shape as x_sim_ivf): once per pair side in the
            # static plan (AQE's ReuseExchange dedupes the shared argmax
            # subtree at the window exchange above it at runtime); the
            # PAIR join itself must be keyed
            simple = plan_of(queries[key](spark, SF), "simple")
            assert simple.count("BroadcastNestedLoopJoin") <= 2, key
            assert "SortMergeJoin" in simple or "ShuffledHashJoin" in simple, key
        else:
            assert "BroadcastNestedLoopJoin" not in plan, key


def test_weighted_sample_plans_take_ordered(spark, queries):
    """A-ES top-k must be TakeOrderedAndProject (per-partition heaps), not
    a global sort of the corpus."""
    plan = plan_of(queries["x_sample_weighted"](spark, SF), "simple")
    assert "TakeOrderedAndProject" in plan
    # no full-corpus global sort (simple mode prints Sort with its keys
    # inline; formatted mode would put the keys on a detail line and make
    # this substring check vacuous)
    assert "Sort [priority" not in plan


def test_bloom_bitset_side_broadcasts(spark, queries):
    """The Bloom position set must reach the corpus probe as a broadcast —
    the corpus side must never shuffle for membership."""
    plan = plan_of(queries["x_decontaminate_bloom"](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_curate_pipeline_plan_stays_jvm_side(spark):
    # the composed curation chain adds no Python-eval nodes and the
    # decontamination benchmark side broadcasts (never shuffles the
    # corpus against it).
    from amazon_s3_datalake_nmea0183_real_time_ingestion_spark.operators.pipeline_curate import (
        curate_corpus,
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter(F.col("doc_id") < 3).select("text")
    out = curate_corpus(docs, benchmark=bench)
    plan = plan_of(out["curated"])
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # the benchmark-shingle anti-join side


def test_simhash_collapsed_reuses_signature_subtree(spark, queries):
    """simhash_pairs_collapsed references the signature subtree (tokenize
    + two 60-bit aggregations) from groups, both member expansions, and
    the within self-join; the lazy localCheckpoint added in round 10 must
    keep the source scan out of the compiled plan (one materialization,
    reused).  Without it Spark replans the subtree per reference —
    measured 16 scans of the documents source and +1.6 s at sf0.1."""
    plan = plan_of(queries["x_dedup_simhash"](spark, SF))
    assert plan.count("documents.parquet") <= 2, (
        "signature subtree is being replanned per reference "
        f"({plan.count('documents.parquet')} source scans)"
    )


def test_pagerank_report_stores_single_corpus_scale_frame(spark, queries):
    """r14 memory-cliff remedy pin (SCALE.md §7t / VERDICT r13 finding 1):
    the pagerank report must checkpoint exactly ONE corpus-scale frame —
    the degree-weighted edge list from weighted_edges' one-pass fold —
    plus the node-sized node frame.  The previous shape ALSO stored the
    raw pair list (the graph held twice as MEMORY_AND_DISK blocks while
    three rank iterations shuffled beside it: 5.99x on an sf1->sf2
    doubling, GC death at the default heap).  Pinned two ways so a
    reintroduced second corpus-scale checkpoint fails here, not at 100 TB:
    (a) the executed plan's Scan ExistingRDD schemas are exactly
    {(src, dst, __w), (node)} — no raw (src, dst) pair scan survives;
    (b) executing the key persists exactly 2 new RDD block sets, exactly
    one of them edge-scale (strictly more rows than the node universe)."""
    import re

    sc = spark.sparkContext
    before = set(dict(sc._jsc.getPersistentRDDs()).keys())
    df = queries["x_pagerank"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    schemas = {
        tuple(re.sub(r"#\d+L?", "", cols).split(","))
        for cols in re.findall(r"Scan ExistingRDD\[([^\]]*)\]", plan)
    }
    assert schemas == {("src", "dst", "__w"), ("node",)}, schemas
    df.write.format("noop").mode("overwrite").save()
    new = [
        v for k, v in dict(sc._jsc.getPersistentRDDs()).items()
        if k not in before
    ]
    assert len(new) == 2, f"expected 2 checkpointed frames, got {len(new)}"
    n_nodes = df.count()  # report is node-sized; reuses the stored blocks
    counts = sorted(rdd.count() for rdd in new)
    assert counts[0] == n_nodes, counts  # the node frame
    assert counts[1] > n_nodes, counts  # the single edge-scale frame
