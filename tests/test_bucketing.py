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
