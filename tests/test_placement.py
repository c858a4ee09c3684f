"""Rendezvous-hashing placement: cross-engine assignment equality and
the minimal-disruption laws (add-only inflow, remove-only outflow,
conservation), pinned as INVARIANTS on real keys."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io
from kinesis_stream_video_project_spark.operators.placement import (
    rendezvous_assign,
    rendezvous_rebalance_audit,
)


def _duck_assign(sf_dir: str, nodes: list) -> dict:
    con = duckdb.connect()
    hs = ",".join(
        f"('0x'||substr(md5(CAST(o_orderkey AS VARCHAR)||':{n}'),1,12))::BIGINT"
        f" AS h{i}"
        for i, n in enumerate(nodes)
    )
    whens = " ".join(
        f"WHEN h{i} THEN '{n}'" for i, n in enumerate(nodes[:-1])
    )
    g = ",".join(f"h{i}" for i in range(len(nodes)))
    q = f"""
    WITH r AS (SELECT o_orderkey AS k, {hs}
               FROM '{sf_dir}/orders.parquet')
    SELECT k, CASE greatest({g}) {whens} ELSE '{nodes[-1]}' END AS a FROM r
    """
    return dict(con.sql(q).fetchall())


def test_assignment_matches_duckdb(spark, sf_dir):
    nodes = [f"s{i}" for i in range(5)]
    o = io.load_table(spark, sf_dir, "orders")
    got = dict(
        o.select(
            F.col("o_orderkey").alias("k"),
            rendezvous_assign(F.col("o_orderkey"), nodes).alias("a"),
        ).collect()
    )
    assert got == _duck_assign(sf_dir, nodes)
    # balance sanity: every node owns a non-trivial share
    from collections import Counter

    counts = Counter(got.values())
    assert set(counts) == set(nodes)
    assert min(counts.values()) > len(got) // (len(nodes) * 2)


def test_rebalance_add_node_laws(spark, sf_dir):
    """Adding a node: ALL inflow lands on it, existing nodes see zero
    inflow and only outflow (the HRW ordering-stability law — an
    invariant, not a probability), and Σ in == Σ out ≈ n/(|nodes|+1)."""
    o = io.load_table(spark, sf_dir, "orders")
    n5 = [f"s{i}" for i in range(5)]
    out = {
        r["shard"]: r
        for r in rendezvous_rebalance_audit(
            o, "o_orderkey", n5, n5 + ["s5"]
        ).collect()
    }
    total = sum(r["n_before"] for r in out.values())
    moved = sum(r["n_moved_in"] for r in out.values())
    assert moved == sum(r["n_moved_out"] for r in out.values())
    assert out["s5"]["n_moved_in"] == moved == out["s5"]["n_after"]
    assert out["s5"]["n_before"] == 0 and out["s5"]["n_moved_out"] == 0
    for s in n5:
        assert out[s]["n_moved_in"] == 0
    # expectation 1/6 of keys move; allow a generous band
    assert total // 9 < moved < total // 4


def test_rebalance_remove_node_laws(spark, sf_dir):
    o = io.load_table(spark, sf_dir, "orders")
    n5 = [f"s{i}" for i in range(5)]
    out = {
        r["shard"]: r
        for r in rendezvous_rebalance_audit(
            o, "o_orderkey", n5, n5[:-1]
        ).collect()
    }
    assert out["s4"]["n_after"] == 0
    assert out["s4"]["n_moved_out"] == out["s4"]["n_before"] > 0
    for s in n5[:-1]:
        assert out[s]["n_moved_out"] == 0


def test_assign_refusals():
    with pytest.raises(ValueError, match="non-empty"):
        rendezvous_assign(F.lit(1), [])
    with pytest.raises(ValueError, match="duplicate"):
        rendezvous_assign(F.lit(1), ["a", "a"])


def test_assign_refuses_null_key(spark):
    """ADVICE r10: concat_ws SKIPS nulls, so a NULL key used to hash
    ":node" Spark-side while the oracle's `k || ':node'` NULL-propagates
    to the CASE ELSE node — refuse loudly instead of diverging."""
    df = spark.createDataFrame([(None,), (1,)], "k long")
    with pytest.raises(Exception, match="NULL key"):
        df.select(rendezvous_assign(F.col("k"), ["a", "b"])).collect()
