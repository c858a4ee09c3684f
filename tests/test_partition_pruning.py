"""Physical-design pin: Hive-style partitioned layouts prune at plan
time and dynamic partition pruning (DPP) prunes the fact side of a star
join at runtime — the other half of the layout story next to
tests/test_bucketing.py (bucketing co-locates JOINS; partitioning skips
SCANS).

The 100 TB claim these tests pin: a date/category-partitioned fact
table turns a selective predicate into "read 1/N of the files" BEFORE
any task launches (static pruning — PartitionFilters in the scan), and
a star join against a filtered dimension injects the dim's surviving
keys into the fact scan as a runtime filter (DPP — a dynamicpruning
subquery in the plan), so the fact side never reads partitions no dim
row can match. Both are free once the layout exists; neither works on
an unpartitioned dump — the negative controls assert exactly that.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    """events written twice: partitioned by event_type, and flat."""
    base = tmp_path_factory.mktemp("part_layout")
    ev = io.load_table(spark, SF, "events")
    part_dir = str(base / "events_by_type")
    flat_dir = str(base / "events_flat")
    ev.write.partitionBy("event_type").parquet(part_dir)
    ev.write.parquet(flat_dir)
    return part_dir, flat_dir


def _scan_node(plan: str) -> str:
    for chunk in plan.split("\n\n"):
        if "Scan parquet" in chunk:
            return chunk
    return plan


def test_static_partition_pruning_reads_one_partition(spark, partitioned_events):
    """A type-equality filter must land in PartitionFilters and the scan
    must touch ~1/5 of the files; the flat layout pushes the same
    predicate as a row-group filter only (negative control)."""
    part_dir, flat_dir = partitioned_events
    part = spark.read.parquet(part_dir).filter(F.col("event_type") == "error")
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "event_type" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan

    n_part = part.select(F.input_file_name()).distinct().count()
    all_files = (
        spark.read.parquet(part_dir).select(F.input_file_name()).distinct().count()
    )
    assert n_part < all_files, (n_part, all_files)

    flat = spark.read.parquet(flat_dir).filter(F.col("event_type") == "error")
    n_flat = flat.select(F.input_file_name()).distinct().count()
    flat_all = (
        spark.read.parquet(flat_dir).select(F.input_file_name()).distinct().count()
    )
    assert n_flat == flat_all  # no file-level pruning without the layout

    # same rows either way — pruning is a physical win, not a semantic one
    assert part.count() == flat.count() > 0


def test_dynamic_partition_pruning_on_star_join(spark, partitioned_events):
    """Joining the partitioned fact to a FILTERED tiny dim must inject a
    dynamicpruning# subquery into the fact scan (DPP); the same join on
    the flat layout must not (nothing to prune)."""
    part_dir, flat_dir = partitioned_events
    dim = spark.createDataFrame(
        [("error", 1), ("click", 2), ("view", 3), ("signup", 4), ("purchase", 5)],
        "event_type string, type_id int",
    )
    # Force the DPP decision regardless of size heuristics at toy scale.
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    fact = spark.read.parquet(part_dir)
    j = fact.join(dim.filter(F.col("type_id") <= 1), "event_type")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan

    flat_fact = spark.read.parquet(flat_dir)
    j_flat = flat_fact.join(dim.filter(F.col("type_id") <= 1), "event_type")
    plan_flat = j_flat._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" not in plan_flat, plan_flat

    # and the answer is right: only 'error' rows survive
    assert (
        j.select("event_type").distinct().collect()[0]["event_type"] == "error"
    )
    assert j.count() == fact.filter(F.col("event_type") == "error").count()


def test_partitioned_write_layout_shape(spark, partitioned_events):
    """The written layout has one directory per event_type and the
    partition column is restored on read (schema round-trip)."""
    import os

    part_dir, _ = partitioned_events
    dirs = {
        d.split("=", 1)[1]
        for d in os.listdir(part_dir)
        if d.startswith("event_type=")
    }
    assert dirs == {"click", "error", "purchase", "signup", "view"}
    back = spark.read.parquet(part_dir)
    assert "event_type" in back.columns
    assert back.count() == io.load_table(spark, SF, "events").count()


# ---------------------------------------------------------------------------
# Runtime Bloom-filter join pruning (the ROW-level companion of DPP)
# ---------------------------------------------------------------------------


def test_runtime_bloom_filter_join_pruning(spark):
    """A selective filter on one join side must inject a
    bloom_filter/might_contain runtime predicate into the other side's
    scan pipeline (Spark's runtime row-level filtering) once the size
    thresholds admit the toy input; disabled, the predicate vanishes;
    the answer is identical either way. This prunes fact rows that
    cannot join BEFORE the shuffle — at 100 TB the difference between
    shuffling the whole fact table and shuffling the matching slice.
    DPP (above) prunes whole partitions; this prunes inside them."""
    SF01 = "/root/testdata/sf0.1"
    li = spark.read.parquet(f"{SF01}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF01}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # SMJ: bloom matters
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
            "l_orderkey", "o_orderpriority"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
        n_with = j.count()

        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        j2 = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
            "l_orderkey", "o_orderpriority"
        )
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" not in plan2
        assert j2.count() == n_with > 0
    finally:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        for k, v in saved.items():
            spark.conf.set(k, v)
