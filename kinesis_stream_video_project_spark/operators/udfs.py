"""Python UDF surface (O-32/O-33): vectorized pandas UDFs, grouped
applyInPandas, a table-valued UDTF, and the sketch functions that genuinely
need Python (SimHash bit-votes, rolling-hash fingerprints).

Policy (SURVEY.md §6): Python is the slow path. Everything here crosses the
boundary via Arrow batches (pandas_udf / applyInPandas / mapInPandas), never
row-at-a-time; and nothing in the relational/window/dedup hot paths depends
on this module — these exist as the escape hatch + showcase.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructType

# ---------------------------------------------------------------------------
# Scalar pandas UDFs (Arrow-vectorized)
# ---------------------------------------------------------------------------


@F.pandas_udf(LongType())
def pandas_token_count(text: pd.Series) -> pd.Series:
    """Whitespace token count — vectorized; oracle twin: len(string_split)."""
    return text.str.split(" ").str.len().astype("int64")


@F.pandas_udf(LongType())
def pandas_simhash64(text: pd.Series) -> pd.Series:
    """60-bit SimHash over whitespace tokens (still named *64 for the
    registered column contract; the value fits a SQL BIGINT with headroom).

    Token hash = the top 15 hex chars of md5(token) — portable since r4:
    DuckDB computes the identical integer (('0x'||substr(md5(t),1,15))::
    BIGINT), so the sketch itself is oracle-replayable, unlike the crc32
    pairing it replaces (duplicate tokens still vote with multiplicity).
    Bit votes are accumulated in a numpy matrix per Arrow batch
    (vectorized across the 60 bit positions).
    """
    import hashlib

    def simhash(s: str) -> int:
        toks = s.split(" ")
        if not toks:
            return 0
        hashes = np.fromiter(
            (
                int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                for t in toks
            ),
            dtype=np.uint64,
            count=len(toks),
        )
        bits = ((hashes[:, None] >> np.arange(60, dtype=np.uint64)) & 1).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        out = 0
        for b in np.nonzero(votes > 0)[0]:
            out |= 1 << int(b)
        return out

    return text.map(simhash).astype("int64")


@F.pandas_udf(LongType())
def pandas_rolling_fingerprint(text: pd.Series) -> pd.Series:
    """Rolling polynomial fingerprint over tokens (base-31 mod 2^61-1) —
    the content-defined fingerprint used for document identity at scale."""
    MOD = (1 << 61) - 1

    def fp(s: str) -> int:
        acc = 0
        for t in s.split(" "):
            acc = (acc * 31 + zlib.crc32(t.encode())) % MOD
        return acc

    return text.map(fp).astype("int64")


# ---------------------------------------------------------------------------
# Grouped-map / grouped-agg (O-33)
# ---------------------------------------------------------------------------


def grouped_lang_stats(docs: DataFrame) -> DataFrame:
    """applyInPandas per-language stats — the grouped-map UDAF surface.

    Semantically equals a plain groupBy().agg() (its oracle); exists to pin
    the Arrow grouped-map plumbing that custom aggregations need.
    """
    schema = (
        StructType()
        .add("lang", "string")
        .add("n_docs", "long")
        .add("avg_chars", "double")
        .add("max_chars", "long")
    )

    import math

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        mean = float(pdf["n_chars"].mean())
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(pdf)],
                # same floor-based 4-dp rounding as functions/numeric.py::r4
                "avg_chars": [math.floor(mean * 10000.0 + 0.5) / 10000.0],
                "max_chars": [int(pdf["n_chars"].max())],
            }
        )

    return docs.select("lang", "n_chars").groupBy("lang").applyInPandas(stats, schema)


# ---------------------------------------------------------------------------
# UDTF (O-32): table function exploding documents into position-stamped tokens
# ---------------------------------------------------------------------------


def explode_tokens_udtf(spark, docs: DataFrame, max_doc_id: int = 20) -> DataFrame:
    """Python UDTF emitting one row per token with its 1-based position.

    Oracle twin: string_split + generate_series indexing in DuckDB.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id: bigint, pos: bigint, token: string")
    class ExplodeTokens:
        def eval(self, doc_id: int, text: str):  # noqa: D401
            for i, tok in enumerate(text.split(" "), start=1):
                yield doc_id, i, tok

    docs.filter(F.col("doc_id") < max_doc_id).select(
        "doc_id", "text"
    ).createOrReplaceTempView("_udtf_docs_in")
    spark.udtf.register("explode_tokens", ExplodeTokens)
    return spark.sql(
        "SELECT t.doc_id, t.pos, t.token "
        "FROM _udtf_docs_in, LATERAL explode_tokens(doc_id, text) t"
    )
