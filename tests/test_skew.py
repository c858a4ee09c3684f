"""Salted aggregation/join: result-equivalence with the naive plan, and the
structural property that the first shuffle distributes hot keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators import skew


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    events = io.load_table(spark, sf_dir, "events")
    got = skew.salted_agg(
        events,
        ["user_id"],
        {
            "total": ("value", "sum"),
            "n": ("event_id", "count"),
            "vmin": ("value", "min"),
            "vmax": ("value", "max"),
        },
        n_salts=16,
    )
    want = events.groupBy("user_id").agg(
        F.sum("value").alias("total"),
        F.count("event_id").alias("n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    g = {r.user_id: (round(r.total, 6), r.n, r.vmin, r.vmax) for r in got.collect()}
    w = {r.user_id: (round(r.total, 6), r.n, r.vmin, r.vmax) for r in want.collect()}
    assert g == w


def test_salted_agg_has_two_aggregation_stages(spark, sf_dir):
    events = io.load_table(spark, sf_dir, "events")
    df = skew.salted_agg(events, ["user_id"], {"total": ("value", "sum")}, n_salts=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Two logical group-bys => the hot key is spread before the final combine.
    assert plan.count("HashAggregate") >= 4  # partial+final for each stage


def test_salted_join_matches_plain_join(spark, sf_dir):
    # Build a deliberately skewed side: replicate one nation key.
    orders = io.load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = io.load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    got = skew.salted_join(orders, customer, "o_custkey", "c_custkey", n_salts=8)
    want = orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
    assert got.count() == want.count()
    g = got.groupBy("c_nationkey").count().collect()
    w = want.groupBy("c_nationkey").count().collect()
    assert {(r.c_nationkey, r["count"]) for r in g} == {
        (r.c_nationkey, r["count"]) for r in w
    }
    # Salt must not leak into the output schema.
    assert "__salt" not in got.columns


def test_salted_agg_rejects_non_algebraic(spark, sf_dir):
    events = io.load_table(spark, sf_dir, "events")
    try:
        skew.salted_agg(events, ["user_id"], {"bad": ("value", "avg")})
    except ValueError as e:
        assert "non-algebraic" in str(e)
    else:
        raise AssertionError("avg must be rejected (compose sum+count instead)")
