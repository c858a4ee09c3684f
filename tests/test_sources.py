"""Batch source/sink round-trips: schema-explicit readers, partitioned and
bucketed writers, compaction. Verifies layout behavior (partition dirs,
bucket files, file counts), not just values."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.sources import batch


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return io.load_table(spark, sf_dir, "events")


def test_read_parquet_with_pruning(spark, sf_dir):
    df = batch.read_parquet(spark, f"{sf_dir}/orders.parquet", "o_orderkey", "o_totalprice")
    assert [f.name for f in df.schema.fields] == ["o_orderkey", "o_totalprice"]
    # Column pruning must reach the scan: ReadSchema lists only the 2 columns.
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "o_comment" not in plan


def test_csv_roundtrip_explicit_schema(spark, events, tmp_path):
    src = events.select("event_id", "user_id", "event_type", "value").limit(500)
    path = str(tmp_path / "events_csv")
    src.write.mode("overwrite").option("header", "true").csv(path)

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    back = batch.read_csv(spark, path, schema)
    assert back.count() == src.count()
    assert back.schema == schema
    want = src.agg(F.sum("value")).first()[0]
    got = back.agg(F.sum("value")).first()[0]
    assert abs(got - want) < 1e-6


def test_json_catalog_schema_matches_reference_shape(spark, tmp_path):
    # A list-streams style payload (putmedia_check.sh:6): one JSON document
    # with a StreamInfoList array — read with the canonical explicit schema.
    payload = (
        '{"StreamInfoList": ['
        '{"StreamName": "s1", "DeviceName": "d1", "Status": "ACTIVE"},'
        '{"StreamName": "s2", "DeviceName": "d2", "Status": "CREATING"}]}'
    )
    p = tmp_path / "catalog.json"
    p.write_text(payload)
    df = batch.read_json(
        spark, str(p), batch.SCHEMAS["stream_catalog_json"], multiline=True
    )
    rows = (
        df.select(F.explode("StreamInfoList").alias("s"))
        .select("s.StreamName", "s.Status")
        .orderBy("StreamName")
        .collect()
    )
    assert [(r.StreamName, r.Status) for r in rows] == [
        ("s1", "ACTIVE"),
        ("s2", "CREATING"),
    ]


def test_write_partitioned_parquet_prunes(spark, events, tmp_path):
    path = str(tmp_path / "events_part")
    df = events.withColumn("event_date", F.to_date("ts"))
    batch.write_partitioned_parquet(df, path, ["event_date"])
    # Layout: one directory level per date.
    dirs = [d for d in os.listdir(path) if d.startswith("event_date=")]
    assert len(dirs) >= 1
    one_date = dirs[0].split("=", 1)[1]
    back = spark.read.parquet(path).filter(F.col("event_date") == one_date)
    # Partition pruning: the predicate must land INSIDE PartitionFilters
    # (directory pruning at file-listing time), not merely as a row-group
    # PushedFilter.
    plan = back._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_date" in pf, plan
    assert back.count() == df.filter(F.col("event_date") == one_date).count()


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # Managed tables land in the default warehouse dir (gitignored); dropped below.
    orders = io.load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = io.load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    batch.write_bucketed_table(orders, "b_orders", ["o_orderkey"], 4)
    batch.write_bucketed_table(li, "b_lineitem", ["l_orderkey"], 4)
    try:
        j = (
            spark.table("b_orders")
            .hint("merge")  # force SMJ so the no-exchange property is observable
            .join(
                spark.table("b_lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # Same bucket count + key on both sides => no Exchange on either side,
        # and both scans advertise the bucket layout.
        assert "Exchange hashpartitioning" not in plan
        assert plan.count("Bucketed: true") == 2, plan
        assert j.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_compact_targets_file_count(spark, events, tmp_path):
    path = str(tmp_path / "compacted")
    # ~500 rows at 256B/row estimate vs 1 MiB target => exactly 1 file.
    batch.compact(events.limit(500), path, target_file_mb=1)
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) == 1


def test_orc_roundtrip_with_pruning(spark, sf_dir, tmp_path):
    """ORC write -> read back equal; column pruning reaches the ORC scan."""
    orders = batch.read_parquet(spark, f"{sf_dir}/orders.parquet")
    dest = str(tmp_path / "orders_orc")
    batch.write_orc(orders, dest)
    back = batch.read_orc(spark, dest, "o_orderkey", "o_totalprice")
    assert back.count() == orders.count()
    got = sorted(r.o_orderkey for r in back.collect())
    want = sorted(r.o_orderkey for r in orders.select("o_orderkey").collect())
    assert got == want
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>" in plan
