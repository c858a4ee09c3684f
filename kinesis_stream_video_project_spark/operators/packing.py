"""Greedy sequence packing — the step between chunking and the tokenizer in
a pretraining pipeline: concatenate documents/chunks into fixed-budget
sequences (e.g. 512 tokens) so padding waste stays low.

Packing is an inherently sequential fold (bin boundaries depend on every
prior row), so it cannot be a window/aggregate expression; the Spark form is
``applyInPandas`` per pack group with an explicitly ordered walk — the same
grouped-Arrow pattern as the watchdog batch twin (O-22/O-33). Groups are the
parallelism unit, and a whole-``source`` group is a parallelism CEILING: with
a handful of sources at 100 TB, packing degenerates to a few giant sequential
tasks. ``pack_sequences`` therefore folds within ``(group, shard)`` where
``shard = hash_bucket(order_col) % n_shards`` — packing is an order-dependent
heuristic, so per-shard bin boundaries are an acceptable semantic (each shard
wastes at most one partial bin), and parallelism scales as sources × shards.

``greedy_fill`` is the single source of truth for the fold; the pandas path
and the pytest pure-Python twin both call it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from kinesis_stream_video_project_spark.functions.text import tokens
from kinesis_stream_video_project_spark.operators.sampling import hash_bucket


def greedy_fill(sizes: list[int], budget: int) -> list[tuple[int, int]]:
    """Greedy first-fit-in-order packing: walk items in order, open a new
    bin when the current one cannot take the next item. Oversized items
    (> budget) get a bin of their own.

    Returns [(bin_idx, bin_fill_after_item), ...] aligned with ``sizes``.
    """
    out: list[tuple[int, int]] = []
    bin_idx, fill = 0, 0
    for s in sizes:
        if fill > 0 and fill + s > budget:
            bin_idx += 1
            fill = 0
        fill += s
        out.append((bin_idx, fill))
    return out


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    size_col: str,
    budget: int,
    n_shards: int = 8,
) -> DataFrame:
    """Assign each row a ``shard`` and a ``bin_idx`` (plus running
    ``bin_fill``) such that consecutive rows (by ``order_col``, within
    ``(group_col, shard)``) sharing a bin sum to at most ``budget`` in
    ``size_col`` (single oversize rows get their own bin).

    ``shard = hash_bucket(order_col, n_shards)`` — the portable md5 bucket
    (operators/sampling.py), so the shard assignment, like the fold itself,
    is a pure function of the row and reproducible across engines. Bins are
    namespaced per (group, shard); downstream consumers treat (group_col,
    shard, bin_idx) as the sequence key. ``n_shards=1`` recovers the
    whole-group fold.
    """
    out_schema = (
        StructType()
        .add(group_col, df.schema[group_col].dataType)
        .add("shard", "long")
        .add(order_col, df.schema[order_col].dataType)
        .add(size_col, "long")
        .add("bin_idx", "long")
        .add("bin_fill", "long")
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        assignment = greedy_fill(pdf[size_col].tolist(), budget)
        return pd.DataFrame(
            {
                group_col: pdf[group_col].values,
                "shard": pdf["shard"].astype("int64").values,
                order_col: pdf[order_col].values,
                size_col: pdf[size_col].astype("int64").values,
                "bin_idx": [b for b, _ in assignment],
                "bin_fill": [f for _, f in assignment],
            }
        )

    return (
        df.select(
            group_col,
            hash_bucket(F.col(order_col), n_shards).alias("shard"),
            order_col,
            F.col(size_col).cast("long").alias(size_col),
        )
        .groupBy(group_col, "shard")
        .applyInPandas(pack, out_schema)
    )


def sliding_chunks(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sliding-window chunk table (r8/r9 registration queue): one row
    per ``(doc, chunk)`` with 1-based token bounds — the
    overlapping-chunk primitive of RAG indexing and long-document
    training prep (stride < chunk_tokens ⇒ consecutive chunks overlap
    by chunk_tokens − stride tokens, so no boundary-straddling span is
    lost; pack_sequences is the NON-overlapping budget-fill form).
    Output ``(doc_id, chunk_no, start_tok, end_tok, n_chunk_tokens)``;
    chunk starts are 1, 1+stride, … while start ≤ n_tokens (the final
    chunk may be short — emitted, because dropping it would silently
    lose the document tail; stated, not implied). All-integer.

    Coverage law (hypothesis-found, then enforced): every token
    position is covered by some chunk IFF stride ≤ chunk_tokens — a
    larger stride leaves inter-chunk gaps and can strand the document
    tail entirely (n=3, chunk=2, stride=3 covers only tokens 1-2), so
    the constructor REFUSES it rather than silently losing data;
    sampled (gappy) chunking is a different operator, not a parameter
    of this one.

    Scale: one sequence-generate + explode per row (fan-out
    n/stride), no shuffle, no second tokenization — the chunk table
    carries BOUNDS, not text (the consumer slices lazily)."""
    if stride > chunk_tokens:
        raise ValueError(
            f"sliding_chunks: stride {stride} > chunk_tokens "
            f"{chunk_tokens} leaves coverage gaps (tail tokens would be "
            "silently lost); use stride <= chunk_tokens"
        )
    n = F.size(tokens(F.col(text_col)))
    return (
        docs.select(
            id_col,
            n.alias("_n"),
            F.explode(
                F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))
            ).alias("start_tok"),
        )
        .select(
            id_col,
            (
                (F.col("start_tok") - F.lit(1)) / F.lit(stride) + F.lit(1)
            )
            .cast("long")
            .alias("chunk_no"),
            F.col("start_tok").cast("long"),
            F.least(
                F.col("start_tok") + F.lit(chunk_tokens - 1), F.col("_n")
            )
            .cast("long")
            .alias("end_tok"),
        )
        .withColumn(
            "n_chunk_tokens",
            (F.col("end_tok") - F.col("start_tok") + F.lit(1)).cast("long"),
        )
    )
