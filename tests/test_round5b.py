"""Property tests for the round-5b queries (EWMA, skyline, weighted
median) beyond their driver-shaped oracle-parity rows: invariants an
oracle mismatch would not localize, and the scale-shape pins."""

from __future__ import annotations

import pandas as pd
import pytest

from kinesis_stream_video_project_spark.plans import registry
from kinesis_stream_video_project_spark.plans.queries_round5b import ewma_metric

SPECS = registry.all_queries()


def test_ewma_shard_count_invariance(spark, sf_dir):
    """The shard key is a pure parallelism knob: any n_shards must produce
    the identical result set (the fold re-sorts and re-splits per user
    inside each shard frame)."""
    a = ewma_metric(spark, sf_dir, n_shards=3).toPandas()
    b = ewma_metric(spark, sf_dir, n_shards=7).toPandas()
    key = ["user_id", "event_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_ewma_matches_pandas_ewm(spark, sf_dir):
    """Independent reference: pandas' own ewm(alpha=.5, adjust=False).mean()
    implements the same recursion — a third implementation (besides the
    Arrow fold and the DuckDB recursive CTE) agreeing to 4 dp."""
    import numpy as np

    from kinesis_stream_video_project_spark import io
    from tests.oracle_utils import compare

    got = ewma_metric(spark, sf_dir)
    ev = (
        io.load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .dropna(subset=["value"])
        .sort_values(["user_id", "ts", "event_id"])
    )
    want = pd.DataFrame(
        {
            "user_id": ev["user_id"].to_numpy(),
            "event_id": ev["event_id"].to_numpy(),
            "ewma": np.floor(
                ev.groupby("user_id", sort=False)["value"]
                .transform(lambda s: s.ewm(alpha=0.5, adjust=False).mean())
                .to_numpy()
                * 10000.0
                + 0.5
            )
            / 10000.0,
        }
    )
    compare(got, want, name="ewma_metric-vs-pandas")


def test_skyline_output_is_exactly_the_undominated_set(spark, sf_dir):
    """Definition check by brute force over the distinct pair set: every
    output pair is undominated, every non-output pair is dominated."""
    from kinesis_stream_video_project_spark import io

    out = {
        (r.p_retailprice, r.p_size)
        for r in SPECS["skyline_parts"].fn(spark, sf_dir).collect()
    }
    pairs = {
        (r.p_retailprice, r.p_size)
        for r in io.load_table(spark, sf_dir, "part")
        .select("p_retailprice", "p_size")
        .distinct()
        .collect()
    }

    def dominated(a, by):
        return (
            by[0] <= a[0]
            and by[1] <= a[1]
            and (by[0] < a[0] or by[1] < a[1])
        )

    for a in pairs:
        is_dom = any(dominated(a, b) for b in pairs)
        assert (a in out) == (not is_dom), f"pair {a}: dominated={is_dom}"


def test_skyline_plan_is_two_phase(spark, sf_dir):
    """Scale pin: the corpus-sized window is PARTITIONED by the hash bucket
    (no `Window > Sort > Exchange SinglePartition` pattern anywhere), and
    the only quadratic work is a broadcast nested-loop anti-join over the
    pruned survivor set."""
    import re

    df = SPECS["skyline_parts"].fn(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert not re.search(
        r"Window .*\n.*?Sort .*\n.*?Exchange SinglePartition", plan, re.MULTILINE
    ), f"unpartitioned window in skyline plan:\n{plan}"
    assert "BroadcastNestedLoopJoin" in plan and "LeftAnti" in plan


def test_weighted_median_definition(spark, sf_dir):
    """For each group: weight at-or-below the median and weight at-or-above
    the median are both >= half the total (the defining property of a
    weighted median), checked against raw lineitem."""
    from kinesis_stream_video_project_spark import io

    med = {
        r.l_returnflag: (r.weighted_median_price, r.total_weight)
        for r in SPECS["weighted_median_price"].fn(spark, sf_dir).collect()
    }
    li = (
        io.load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .toPandas()
    )
    for flag, (m, tw) in med.items():
        g = li[li.l_returnflag == flag]
        total = int(g.l_quantity.sum())
        assert total == tw
        below = int(g[g.l_extendedprice <= m].l_quantity.sum())
        above = int(g[g.l_extendedprice >= m].l_quantity.sum())
        assert 2 * below >= total, (flag, m, below, total)
        assert 2 * above >= total, (flag, m, above, total)
