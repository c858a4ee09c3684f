"""Index persistence (VERDICT r12 item 4): the one-off ANN/SemDeDup
index builds are now real APIs that write the index as parquet tables
and query from the reloaded form — the production shape both operator
docstrings always described. The load-bearing pin: the from-scratch
operator, the built-in-memory index, and the write→read round-trip all
produce BIT-IDENTICAL results (doubles round-trip parquet exactly; the
partition column's INT inference is cast back to LONG on read)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kinesis_stream_video_project_spark import io


def _rendered(df):
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _queries_and_corpus(spark, sf_dir):
    e = io.load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return q, e


def test_ivfadc_index_roundtrip_bit_exact(spark, sf_dir, tmp_path):
    """ivfadc_topk ≡ query(build) ≡ query(read(write(build))) — the
    registered query's parameters, rendered-value equality (the driver
    comparison), through the partitionBy("cell") parquet round-trip."""
    from kinesis_stream_video_project_spark.operators import similarity as sim

    q, e = _queries_and_corpus(spark, sf_dir)
    base = _rendered(sim.ivfadc_topk(q, e, k=10, n_cells=8, nprobe=4,
                                     n_centroids=256))
    index = sim.ivfadc_build_index(e, n_cells=8, n_centroids=256)
    mem = _rendered(sim.ivfadc_query_index(q, index, k=10, nprobe=4))
    assert mem.equals(base)

    path = str(tmp_path / "ivfadc_index")
    sim.ivfadc_write_index(index, path)
    reloaded = sim.ivfadc_read_index(spark, path)
    disk = _rendered(sim.ivfadc_query_index(q, reloaded, k=10, nprobe=4))
    assert disk.equals(base)


def test_ivfadc_written_index_layout_and_pruning(spark, sf_dir, tmp_path):
    """The written code table is partitioned by cell (cell=*/ dirs), so
    a probe of specific cells prunes at the FILE level — the plan for a
    cell-filtered scan of the reloaded index must carry a non-empty
    PartitionFilters entry, the on-disk twin of the in-plan probe."""
    from kinesis_stream_video_project_spark.operators import similarity as sim

    _, e = _queries_and_corpus(spark, sf_dir)
    index = sim.ivfadc_build_index(e, n_cells=8, n_centroids=256)
    path = str(tmp_path / "ivfadc_index")
    sim.ivfadc_write_index(index, path)

    parts = [d for d in os.listdir(f"{path}/codes") if d.startswith("cell=")]
    assert len(parts) >= 2, parts

    coded = sim.ivfadc_read_index(spark, path)[2]
    plan = coded.filter(F.col("cell") == 3)._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    line = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "cell" in line and "PartitionFilters: []" not in line


def test_semdedup_index_roundtrip_bit_exact(spark, sf_dir, tmp_path):
    """semdedup_report ≡ from_index(build) ≡ from_index(read(write(
    build))) at the registered embeddings threshold (tau = 0.45)."""
    from kinesis_stream_video_project_spark.operators import semdedup as sd

    e = io.load_table(spark, sf_dir, "embeddings")
    base = _rendered(sd.semdedup_report(e, threshold=0.45))
    index = sd.semdedup_build_index(e)
    mem = _rendered(sd.semdedup_report_from_index(index, threshold=0.45))
    assert mem.equals(base)

    path = str(tmp_path / "semdedup_index")
    sd.semdedup_write_index(index, path)
    reloaded = sd.semdedup_read_index(spark, path)
    disk = _rendered(sd.semdedup_report_from_index(reloaded, threshold=0.45))
    assert disk.equals(base)
    # the verdict flips somewhere on the fixture (kept is non-degenerate)
    kept = set(disk["kept"].unique())
    assert "True" in kept


def test_semdedup_index_reuse_across_thresholds(spark, sf_dir, tmp_path):
    """The production win the written index exists for: a threshold
    sweep re-reads ONE Lloyd result instead of re-clustering per tau —
    and each tau's verdict from the written index equals the
    from-scratch operator at that tau."""
    from kinesis_stream_video_project_spark.operators import semdedup as sd

    e = io.load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "semdedup_index")
    sd.semdedup_write_index(sd.semdedup_build_index(e), path)
    reloaded = sd.semdedup_read_index(spark, path)
    for tau in (0.45, 0.95):
        disk = _rendered(sd.semdedup_report_from_index(reloaded, threshold=tau))
        base = _rendered(sd.semdedup_report(e, threshold=tau))
        assert disk.equals(base), tau
