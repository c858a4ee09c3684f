"""Physical-design pin: bucketed tables co-locate equi-joins.

The 100 TB lever the plan-shape tests cannot show from parquet scans
alone: two tables written ``bucketBy(N, key).sortBy(key)`` join with
ZERO shuffle exchanges and ZERO sorts — the join reads co-located,
pre-sorted buckets. This is the production answer for the repeated
fact-to-fact joins (orders x lineitem, events x events) where neither
side broadcasts and re-shuffling 100 TB per query is the bottleneck;
writing the layout once amortizes the exchange across every downstream
join. Bucket pruning (`SelectedBucketsCount`) is the same layout's
point-lookup win: an equality predicate on the bucket key scans 1/N of
the files.

Plan-pinned here (executed plan string), with the unbucketed join as a
negative control proving the pin is load-bearing. Uses its own tables
under the test warehouse; broadcast is disabled inside the test so the
shuffle-free SortMergeJoin is the only no-exchange explanation.
"""

from __future__ import annotations

import pytest

from kinesis_stream_video_project_spark import io


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    sf = "/root/testdata/sf0.001"
    orders = io.load_table(spark, sf, "orders")
    cust = io.load_table(spark, sf, "customer")
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_customer")
    # repartition on the bucket expression first: the writer then emits
    # exactly ONE file per bucket, which is what lets the scan trust the
    # sortBy metadata (multi-file buckets force a re-sort at read time).
    (
        orders.repartition(8, "o_custkey")
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .format("parquet")
        .saveAsTable("bt_orders")
    )
    (
        cust.withColumnRenamed("c_custkey", "o_custkey")
        .repartition(8, "o_custkey")
        .write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .format("parquet")
        .saveAsTable("bt_customer")
    )
    yield "bt_orders", "bt_customer"
    spark.sql("DROP TABLE IF EXISTS bt_orders")
    spark.sql("DROP TABLE IF EXISTS bt_customer")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange_and_no_sort(spark, bucketed_tables):
    t_orders, t_cust = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(t_orders).join(spark.table(t_cust), "o_custkey")
        plan = _executed_plan(joined)
        assert "SortMergeJoin" in plan
        # The shuffle is gone — the lever this layout buys. (An in-partition
        # Sort node remains: since 3.0 Spark only trusts sortBy file order
        # behind spark.sql.legacy.bucketedTableScanOutputOrdering, and the
        # per-bucket sort of already-co-located rows is the cheap part.)
        assert "Exchange" not in plan, plan

        # negative control: the same join from plain DataFrames shuffles
        sf = "/root/testdata/sf0.001"
        raw = io.load_table(spark, sf, "orders").join(
            io.load_table(spark, sf, "customer").withColumnRenamed(
                "c_custkey", "o_custkey"
            ),
            "o_custkey",
        )
        assert "Exchange" in _executed_plan(raw)

        # and the result is identical either way
        assert joined.count() == raw.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucket_pruning_on_key_equality(spark, bucketed_tables):
    t_orders, _ = bucketed_tables
    # autoBucketedScan (default on) turns bucketing OFF for scans with no
    # interesting partitioning requirement — which also forfeits bucket
    # pruning; a real point-lookup deployment pins it off for this table.
    old = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        plan = _executed_plan(spark.table(t_orders).filter("o_custkey = 7"))
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", old)


def test_bucketed_groupby_reuses_layout(spark, bucketed_tables):
    """Aggregation on the bucket key also skips its exchange — the same
    written layout pays off beyond joins."""
    t_orders, _ = bucketed_tables
    agg = spark.table(t_orders).groupBy("o_custkey").count()
    assert "Exchange" not in _executed_plan(agg)


def test_runtime_bloom_filter_join_injection(spark):
    """Physical-design pin for the runtime-filter lever (the shuffle-join
    companion of bucket pruning): with a SELECTIVE predicate on the
    creation side of a shuffle join, Catalyst injects a
    bloom_filter_agg on the filtered dim keys and a might_contain
    probe into the fact-side scan filter — fact rows that cannot join
    die before the exchange (at 100 TB that is the difference between
    shuffling the full fact table and shuffling the ~matching slice).
    Negative control: with the optimizer flag off the probe is absent.
    The thresholds are part of the pin: local fixtures sit under the
    default 10 MB creation-side floor, so the test (like a real
    deployment tuning this lever) sets them explicitly."""
    from pyspark.sql import functions as F

    from kinesis_stream_video_project_spark import io

    sf = "/root/testdata/sf0.01"
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        o = io.load_table(spark, sf, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = io.load_table(spark, sf, "lineitem")
        j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
            "l_orderkey", "o_orderpriority"
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert "might_contain" in plan, plan[:2000]
        assert j.count() > 0

        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        j2 = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
            "l_orderkey", "o_orderpriority"
        )
        plan2 = j2._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" not in plan2
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
