#!/usr/bin/env python
"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full materialization on
executors, no driver collect — the honest measure of plan cost).

Isolation (r5, VERDICT r4 item 2): the STABLE set and the ROTATION set run
in SEPARATE subprocesses — each gets its own JVM, so the stable set's
round-over-round numbers can't be perturbed by whatever the rotation window
happens to contain that round (r4 measured consecutive_failures at 2.28x
its r3 time with the module unchanged; in an isolated session it re-measured
at 0.33 s — the shared-JVM rotation was the noise source). Invoking
`python bench.py` orchestrates both children and merges their outputs into
the single JSON line; `python bench.py --part stable|rotation` runs one set
(that is what the children execute).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one representative per operator family (scan/agg, star join,
# top-k, sort+rank, window fns, gaps-and-islands, session/tumbling windows,
# as-of join, dedup, similarity, text analysis). FIXED across rounds for
# round-over-round comparison; "value" is this set's total.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "stream_health_60s",
    "join_star_revenue",
    "join_left_outer",
    "topk_orders",
    "sort_ranked",
    "window_running_agg",
    "consecutive_failures",
    "session_windows",
    "tumbling_hourly",
    "asof_probe_metric",
    "exact_dedup_docs",
    "minhash_lsh_near_dup",
    "cosine_topk",
    "ivf_topk",
    "token_stats",
    "quality_score",
    "curation_pipeline",
    "curation_pipeline_v2",
    "tfidf_topk",
    "decontaminate_ngram_overlap",
    "weekly_retention",
    "shipping_priority_top10",
    "local_supplier_volume",
]
# dup_clusters is timed separately below: its connected-components
# iterations execute eagerly at query-construction time (per-round
# checkpoint + convergence probes), so the standard warm-plan/noop-write
# split would only measure the final join and report a misleading ~0.1 s —
# its timing wraps construction + materialization in one span.
# decontaminate_ngram_overlap and dup_clusters are the two expensive
# sub-pipelines of curation_pipeline_v2; benching them separately makes a
# regression inside the composition attributable.

# Rotating window: gives the other query families a timed row, rotating
# every round (like registry.DRIVER_PRIORITY rotates correctness coverage).
# Totals are reported separately — "value" remains the stable headline
# total, "rotation_total" the window's — so BENCH_rN "value" stays
# comparable across rounds. Rotation entries are timed construction +
# materialization in one span (several are applyInPandas / claim / eager
# iterative queries whose build step does real work — the pagerank/LPA/
# k-core family localCheckpoints and probes during construction).
#
# r14 window policy: the rotation aligns with the r14 DRIVER_PRIORITY
# correctness window (minus stable-set members, which the stable child
# times every round), led by the 7 new round-14 registrations (the
# ENTIRE r17 claims queue — the log/entropy family reaching driver
# evidence), followed by the first-drift re-measures of the 7 round-13
# registrations (warm figures compare against BENCH_r13's
# rotation_warm), then the 35 non-stable members of the r14 refresh
# cohort (the window's block (b); asof_probe_metric,
# decontaminate_ngram_overlap, ivf_topk, join_left_outer,
# join_star_revenue, local_supplier_volume, shipping_priority_top10 and
# tfidf_topk are the cohort's eight stable-set members, already timed
# every round).
BENCH_ROTATION = [
    # new round-14 registrations: the full r17 claims queue (7)
    "entropy_hourly_claims",
    "kl_source_unigrams",
    "pmi_log_bracket_claims",
    "ams_join_size_events_orders",
    "markov_removal_attribution",
    "surprisal_bits_claims",
    "holt_conformal_coverage",
    # the 7 round-13 registrations re-measured (first-drift check;
    # warm figures compare against BENCH_r13 rotation_warm)
    "itemitem_cosine_recs",
    "quality_dup_calibration",
    "growth_accounting_daily",
    "ltv_cohort_revenue",
    "order_total_reconciliation",
    "abc_part_classes",
    "mmr_diverse_topk",
    # the r14 window refresh cohort (block (b): the first 43 of the
    # r8-latest cohort, minus its eight stable-set members)
    "session_paths",
    "source_overlap_matrix",
    "rank_normalize",
    "sliding_chunks",
    "image_dhash",
    "funnel_user_advances",
    "heavy_hitters_certificate",
    "bloom_decontaminate",
    "stupid_backoff_score",
    "ngram_novelty",
    "sq8_rerank_topk",
    "rate_limit_decisions",
    "audio_silence_runs",
    "curation_pipeline_v4",
    "argmax_order_per_customer",
    "boilerplate_prefixes",
    "catalog_filter_project",
    "catalog_json_roundtrip",
    "corpus_shuffle",
    "corpus_vocab_topk",
    "escalation_actions",
    "filter_predicates",
    "gap_filled_windows",
    "multimodal_decoded",
    "null_funcs",
    "percentiles_by_status",
    "rare_token_ratio",
    "salted_agg_events",
    "scd2_user_status",
    "seq_pack_docs",
    "set_ops_nations",
    "simhash_sketch",
    "struct_map_funcs",
    "surprisal_score",
    "top_terms_per_lang",
]

# Entries that get a WARM re-execution figure in addition to the
# construction+materialization span: the 7 new registrations (their
# first timings are compile-heavy) and the 7 r13-window registrations
# whose warm figures the first-drift check compares against BENCH_r13's
# rotation_warm.
BENCH_ROTATION_HEAD = BENCH_ROTATION[:14]

# The new registrations this round. Per-query rows no longer fit the
# compact stdout artifact (the driver's ~2000-char tail capture —
# VERDICT r8 item 3 requires the whole line to PARSE), so the line
# carries cohort TOTALS for the new block plus the detail-file pointer;
# every per-query first/warm figure lands in BENCH_DETAIL.json.
BENCH_NEW = BENCH_ROTATION[:7]

# Full per-query payload (stable + rotation + warm maps) is written here
# by main(); the stdout line stays compact and carries the path.
DETAIL_FILE = "BENCH_DETAIL.json"


def bench_streaming(spark, sf_dir: str) -> float:
    """Time the flagship streaming pipeline end-to-end: the events table
    replayed through the file source -> 60 s windowed health (watermark,
    stream-static-joinable shape) -> noop sink, availableNow (drains
    everything, then stops). Setup (staging the files) is excluded."""
    import shutil
    import tempfile

    from kinesis_stream_video_project_spark import io as eio
    from kinesis_stream_video_project_spark.streaming import jobs, sources

    staging = tempfile.mkdtemp(prefix="bench_stream_")
    ckpt = tempfile.mkdtemp(prefix="bench_ckpt_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        eio.load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(staging)
        # Stateful-stream partition count should track STATE size, not core
        # count: each shuffle partition owns a state store whose open/commit
        # cost is fixed per micro-batch (measured ~0.4-0.6 s/store/batch on
        # this host — halving stores halved drain time). sf0.1's ~90k window
        # groups fit comfortably in 4 stores; at 100 TB-scale state you raise
        # it (and RocksDB shards accordingly).
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        stream = sources.file_event_stream(spark, staging)
        health = jobs.stream_health_60s(stream)
        t0 = time.perf_counter()
        q = (
            health.writeStream.format("noop")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return round(time.perf_counter() - t0, 3)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def _run_stable(spark, specs, sf_dir: str) -> dict[str, float]:
    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = specs[name].fn
        # Warm the plan (analysis + file listing) once, then time execution.
        # Two timed runs, keep the min: on a shared host a single sample
        # conflates plan cost with neighbor noise; the min is the honest
        # steady-state estimate of what the plan itself costs.
        df = fn(spark, sf_dir)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # dup_clusters: construction is eager (see note above BENCH_QUERIES) —
    # time construction + materialization as one span, min of 2.
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        specs["dup_clusters"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
    timings["dup_clusters"] = round(best, 3)

    # Streaming: one untimed pass absorbs RocksDB store creation + state
    # codegen (per-JVM one-offs a long-running streaming job never re-pays),
    # then the timed pass measures the per-drain cost.
    bench_streaming(spark, sf_dir)
    timings["stream_health_streaming"] = bench_streaming(spark, sf_dir)
    return timings


def _run_rotation(spark, specs, sf_dir: str) -> tuple[dict, dict]:
    """Returns (rotation, rotation_warm). Rotation numbers time
    construction + materialization per run (min of 2) — comparable to
    every prior round's artifact, and the only honest span for the
    eager-construction iterative queries. For the head entries the
    second map adds WARM re-execution of one already-analyzed plan
    (min of 2): the giant-expression queries (simhash 32×64-literal
    projection) pay ~2 s of Catalyst analysis per fresh fn() call,
    which the cons+mat span charges on every run while a real
    deployment compiles once — rotation_warm is the steady-state plan
    cost the stable set reports (r8: simhash 3.5 cons+mat vs 1.0-1.2
    warm, plan-identical)."""
    rotation: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in BENCH_ROTATION:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        rotation[name] = round(best, 3)
        if name in BENCH_ROTATION_HEAD:
            wbest = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                wbest = min(wbest, time.perf_counter() - t0)
            warm[name] = round(wbest, 3)
    return rotation, warm


def _run_indexed(spark, sf_dir: str) -> tuple[dict, dict]:
    """VERDICT r12 item 4: the ivfadc_topk / semdedup_docs_keep rotation
    heads are dominated by their one-time index builds (5.2 s / 10.0 s
    measured vs 0.8 s / 1.9 s warm). These rows split that cost along
    the production boundary the operators now expose:

    * ``*_index_build`` — build + WRITE the persisted index (parquet,
      code/assignment tables partitioned by cell), the amortized one-off;
    * ``*_from_index`` — the query path against the RELOADED written
      index (first = cold plan, warm = min-of-2 re-execution), the
      steady state a deployment actually pays per query batch.

    Registered-query rows above keep timing the from-scratch composition
    so their figures stay comparable across rounds; these four rows are
    the measured evidence for the recorded keep-the-row decision."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from kinesis_stream_video_project_spark import io as eio
    from kinesis_stream_video_project_spark.functions.vectors import (
        hashed_bow_table,
    )
    from kinesis_stream_video_project_spark.operators import (
        semdedup as sd,
        similarity as sim,
    )

    rotation: dict[str, float] = {}
    warm: dict[str, float] = {}
    root = tempfile.mkdtemp(prefix="bench_index_")

    def timed_query(name: str, df) -> None:
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if i == 0:
                rotation[name] = round(dt, 3)
            else:
                best = min(best, dt)
        warm[name] = round(best, 3)

    try:
        e = eio.load_table(spark, sf_dir, "embeddings")
        q = e.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        t0 = time.perf_counter()
        sim.ivfadc_write_index(
            sim.ivfadc_build_index(e, n_cells=8, n_centroids=256),
            f"{root}/ivfadc",
        )
        rotation["ivfadc_index_build"] = round(time.perf_counter() - t0, 3)
        idx = sim.ivfadc_read_index(spark, f"{root}/ivfadc")
        timed_query(
            "ivfadc_topk_from_index",
            sim.ivfadc_query_index(q, idx, k=10, nprobe=4),
        )

        docs = eio.load_table(spark, sf_dir, "documents")
        emb = hashed_bow_table(docs).select(
            F.col("doc_id").alias("vec_id"), "embedding"
        )
        t0 = time.perf_counter()
        sd.semdedup_write_index(
            sd.semdedup_build_index(emb, n_cells=40), f"{root}/semdedup"
        )
        rotation["semdedup_index_build"] = round(time.perf_counter() - t0, 3)
        reloaded = sd.semdedup_read_index(spark, f"{root}/semdedup")
        timed_query(
            "semdedup_docs_keep_from_index",
            sd.semdedup_report_from_index(reloaded, threshold=0.95),
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return rotation, warm


def _run_part(part: str) -> None:
    """Child-process entry: run one set in this (fresh) JVM, print one JSON
    line {"queries": {...}}."""
    from kinesis_stream_video_project_spark.plans import registry
    from kinesis_stream_video_project_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"kinesis-spark-bench-{part}")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_queries()
    # One untimed execution absorbs JVM/codegen/file-listing warm-up so
    # per-query numbers reflect steady-state plan cost.
    specs[BENCH_QUERIES[0]].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    if part == "stable":
        payload = {"queries": _run_stable(spark, specs, sf_dir)}
    else:
        rotation, warm = _run_rotation(spark, specs, sf_dir)
        idx_rot, idx_warm = _run_indexed(spark, sf_dir)
        rotation.update(idx_rot)
        warm.update(idx_warm)
        payload = {"queries": rotation, "warm": warm}
    print(json.dumps(payload))
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 3 and sys.argv[1] == "--part":
        _run_part(sys.argv[2])
        return

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    def child(part: str) -> dict[str, float]:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--part", part],
            capture_output=True,
            text=True,
            env=os.environ.copy(),
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise RuntimeError(f"bench part {part} failed rc={proc.returncode}")
        # Last stdout line is the child's JSON (Spark noise is on stderr,
        # but progress bars can smear stdout — scan from the end).
        for line in reversed(proc.stdout.strip().splitlines()):
            line = line.strip().split("\r")[-1]
            if line.startswith("{"):
                return json.loads(line)
        raise RuntimeError(f"bench part {part}: no JSON line in output")

    timings = child("stable")["queries"]
    rot_payload = child("rotation")
    rotation = rot_payload["queries"]
    rotation_warm = rot_payload.get("warm", {})
    total = round(sum(timings.values()), 3)

    # The full per-query payload goes to DETAIL_FILE; stdout carries ONE
    # compact JSON object (VERDICT r8 item 3: the r7/r8 artifacts put the
    # wide combined map on the line and the driver's ~2000-char tail
    # capture cut it mid-JSON, leaving "parsed": null — the whole line
    # must now PARSE, so it carries only the stable headline map, the new
    # registrations' first+warm timings, the rotation total, and the
    # detail-file pointer; ~1.5 KB measured).
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), DETAIL_FILE),
        "w",
    ) as f:
        json.dump(
            {
                "sf": float(sf),
                "stable": timings,
                "rotation": rotation,
                "rotation_warm": rotation_warm,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(
        json.dumps(
            {
                "metric": f"headline_query_set_total_sf{sf}",
                "unit": "sec",
                "sf": float(sf),
                "detail_file": DETAIL_FILE,
                "rotation_total": round(sum(rotation.values()), 3),
                "new_head_total": round(
                    sum(rotation[k] for k in BENCH_NEW if k in rotation), 3
                ),
                "new_warm_total": round(
                    sum(
                        rotation_warm[k]
                        for k in BENCH_NEW
                        if k in rotation_warm
                    ),
                    3,
                ),
                "n_new": len(BENCH_NEW),
                "queries": timings,
                "value": total,
            }
        )
    )


if __name__ == "__main__":
    main()
