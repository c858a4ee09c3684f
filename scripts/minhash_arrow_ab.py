"""r15 experiment: does the §4.2 broadcast-numpy recipe pay off for the
MinHash SIGNATURE stage of minhash_lsh_near_dups?

The shipped form computes 24 interpreted higher-order `transform` passes
plus array_min per doc over the md5 basis array (JVM, no codegen for
lambda bodies). The experimental form ships (doc_id, _hs) through ONE
mapInPandas and computes all 24 Kirsch-Mitzenmacher mins per Arrow batch
in numpy (pure int64 arithmetic — bit-exact trivially, h1 + 23·h2 < 2^35
so no overflow anywhere).

Protocol: assert the FULL operator output identical (collected, sorted),
then interleaved A/B min-of-N in one JVM on the registered
minhash_lsh_near_dup composition (noop sink).

Usage: SPARK_GRAFT_SF_DIR=... python scripts/minhash_arrow_ab.py [reps]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import pandas as pd  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from kinesis_stream_video_project_spark import io  # noqa: E402
from kinesis_stream_video_project_spark.functions.numeric import r4  # noqa: E402
from kinesis_stream_video_project_spark.functions.text import tokens  # noqa: E402
from kinesis_stream_video_project_spark.operators import dedup  # noqa: E402
from kinesis_stream_video_project_spark.operators.dedup import (  # noqa: E402
    MINHASH_PRIME,
    _H2_MASK,
    jaccard,
    lsh_band_keys,
    shingle_hash,
    shingles_of,
)
from kinesis_stream_video_project_spark.session import get_spark  # noqa: E402


def minhash_lsh_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 24,
    n_bands: int = 6,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """dedup.minhash_lsh_near_dups with the signature stage in numpy."""
    rows_per_band = n_hashes // n_bands
    tokenized = df.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
    )
    shingled = tokenized.select(
        "doc_id",
        F.array_distinct(shingles_of(F.col("_toks"), shingle_k)).alias("tok_set"),
    ).repartition("doc_id")
    hashed = shingled.select(
        "doc_id", F.transform(F.col("tok_set"), shingle_hash).alias("_hs")
    )

    sig_schema = T.StructType(
        [
            T.StructField("doc_id", df.schema[id_col].dataType),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )

    def gen(batches):
        import numpy as np

        ii = np.arange(24, dtype=np.int64)[:, None]
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            hs = pdf["_hs"]
            lens = np.fromiter((len(x) for x in hs), count=n, dtype=np.int64)
            nonempty = lens > 0
            arrs = [np.asarray(x, dtype=np.int64) for x in hs if len(x)]
            sigs = [None] * n
            if arrs:
                flat = np.concatenate(arrs)
                h1 = flat >> 30
                h2 = flat & _H2_MASK
                starts = np.zeros(len(arrs), dtype=np.int64)
                np.cumsum(lens[nonempty][:-1], out=starts[1:])
                vals = (h1[None, :] + ii * h2[None, :]) % MINHASH_PRIME
                mins = np.minimum.reduceat(vals, starts, axis=1)  # 24 x ndocs
                cols = mins.T.tolist()
                j = 0
                for k in range(n):
                    if nonempty[k]:
                        sigs[k] = cols[j]
                        j += 1
            for k in range(n):
                if sigs[k] is None:
                    sigs[k] = [None] * 24
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs})

    base = hashed.mapInPandas(gen, sig_schema)
    banded = base.select(
        "doc_id",
        F.explode_outer(
            F.array_distinct(lsh_band_keys(F.col("sig"), n_bands, rows_per_band))
        ).alias("bucket"),
    ).filter(F.col("bucket").isNotNull())
    banded = banded.repartition("bucket")
    pairs = (
        banded.alias("l")
        .join(banded.alias("r"), "bucket")
        .filter(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    pairs = F.broadcast(pairs)
    toks = shingled
    return (
        pairs.join(toks.alias("ta"), pairs["doc_a"] == F.col("ta.doc_id"))
        .join(toks.alias("tb"), pairs["doc_b"] == F.col("tb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            r4(jaccard(F.col("ta.tok_set"), F.col("tb.tok_set"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def main() -> None:
    import os

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="minhash-arrow-ab")
    spark.sparkContext.setLogLevel("ERROR")
    d = io.load_table(spark, sf_dir, "documents")

    a = dedup.minhash_lsh_near_dups(d, threshold=0.5)
    b = minhash_lsh_arrow(d, threshold=0.5)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb, f"outputs differ: {len(ra)} vs {len(rb)} rows"
    print(f"outputs identical ({len(ra)} pairs)", flush=True)

    ta, tb = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        dedup.minhash_lsh_near_dups(d, threshold=0.5).write.format("noop").mode(
            "overwrite"
        ).save()
        ta.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        minhash_lsh_arrow(d, threshold=0.5).write.format("noop").mode(
            "overwrite"
        ).save()
        tb.append(time.perf_counter() - t0)
    print(f"JVM folds : {[round(t,3) for t in ta]} min={min(ta):.3f}")
    print(f"Arrow sig : {[round(t,3) for t in tb]} min={min(tb):.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
