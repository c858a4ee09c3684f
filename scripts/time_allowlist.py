"""Re-time the repeated-subtree-guard allowlist (VERDICT r12 item 5).

The allowlist in tests/test_plan_properties.py is only as honest as its
measurements: every entry's rationale must carry a DATED warm figure at
sf0.1, refreshed whenever the owning module changes. This script times
each allowlisted query the way bench.py times rotation-head warm rows
(construct once, one untimed execution to absorb codegen, then min-of-2
warm re-executions of the analyzed plan) and prints one line per entry.

Usage (quiet host, after any bench child has exited):

    python scripts/time_allowlist.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from kinesis_stream_video_project_spark.plans import registry  # noqa: E402
from kinesis_stream_video_project_spark.session import get_spark  # noqa: E402

ALLOWLIST = [
    "ann_tier_claims",
    "ann_recall_eval",
    "lsh_tier_consistency",
    "ndcg_tier_claims",
    "simhash_bucket_pairs",
    "near_dup_shingle_jaccard",
    "minhash_lsh_near_dup",
    "embedding_near_dup",
    "near_dup_split_leakage",
    "verbatim_spans",
    "source_overlap_matrix",
    "bloom_decontaminate",
    "truncated_rerank_topk",
    "semdedup_keep_report",
    "semdedup_docs_keep",
    "pmi_collocations_topk",
    "ivf_kmeans_topk",
    "ra_linkpred_smallbasket",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="allowlist-retime")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_queries()
    for name in ALLOWLIST:
        df = specs[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # absorb codegen
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        print(f"{name} warm={best:.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
