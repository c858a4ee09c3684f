"""VERDICT r14 item 6: validate the probe-every-round CC decision at
depth. Builds a synthetic chain graph of diameter D (default 8, well
past the dup fixture's 2-3), then times min-label propagation with the
shipped probe-every-round loop vs an experimental probe-every-2-rounds
variant, interleaved min-of-N in one JVM.

The experimental variant skips the convergence aggregate on odd rounds:
the round's lazily-checkpointed labels then materialize inside the NEXT
round's join job (no separate job), at the cost of converging up to one
full propagation round late. Outputs are asserted identical to the
shipped operator's before any timing is trusted.

Usage: python scripts/cc_probe_depth.py [chain_len] [n_chains] [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from kinesis_stream_video_project_spark.operators.components import (  # noqa: E402
    connected_components,
)
from kinesis_stream_video_project_spark.session import get_spark  # noqa: E402


def cc_probe_every_2(pairs, a_col="doc_a", b_col="doc_b", max_iters=20):
    """The shipped loop with the convergence aggregate run every 2nd
    round (monotone-decrease makes any skipped-round signature
    comparison still sound: sig strictly decreases until fixpoint)."""
    edges = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")).union(
        pairs.select(F.col(b_col).alias("u"), F.col(a_col).alias("v"))
    )
    edges = edges.distinct().localCheckpoint(eager=True)
    labels = (
        edges.groupBy("u")
        .agg(F.least(F.col("u"), F.min("v")).alias("component"))
        .select(F.col("u").alias("node"), "component")
    ).localCheckpoint(eager=False)
    prev_sig: object = object()
    for i in range(max_iters):
        contrib = edges.join(labels, edges["v"] == labels["node"]).select(
            edges["u"].alias("node"), "component"
        )
        new_labels = (
            contrib.union(labels.select("node", "component"))
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        ).localCheckpoint(eager=False)
        labels = new_labels
        if i % 2 == 1 or i == max_iters - 1:
            sig = new_labels.agg(
                F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
            ).first()[0]
            if sig == prev_sig:
                break
            prev_sig = sig
    return labels


def main() -> None:
    chain_len = int(sys.argv[1]) if len(sys.argv) > 1 else 9
    n_chains = int(sys.argv[2]) if len(sys.argv) > 2 else 20000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    spark = get_spark(app_name="cc-probe-depth")
    spark.sparkContext.setLogLevel("ERROR")

    # n_chains disjoint chains of chain_len edges each -> diameter chain_len.
    pairs = (
        spark.range(n_chains * chain_len)
        .select(
            (F.col("id") + (F.col("id") / chain_len).cast("long")).alias("doc_a")
        )
        .select("doc_a", (F.col("doc_a") + 1).alias("doc_b"))
    ).localCheckpoint(eager=True)
    print(f"chains={n_chains} len={chain_len} edges={pairs.count()}", flush=True)

    # correctness first: identical label sets
    a = connected_components(pairs).orderBy("node").collect()
    b = cc_probe_every_2(pairs).orderBy("node").collect()
    assert a == b, "probe-every-2 diverged from the shipped operator"
    print("outputs identical", flush=True)

    t_ship, t_exp = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        connected_components(pairs).write.format("noop").mode("overwrite").save()
        t_ship.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        cc_probe_every_2(pairs).write.format("noop").mode("overwrite").save()
        t_exp.append(time.perf_counter() - t0)
    print(f"shipped  (probe every round): {[round(t,3) for t in t_ship]} min={min(t_ship):.3f}")
    print(f"probe-every-2:               {[round(t,3) for t in t_exp]} min={min(t_exp):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
