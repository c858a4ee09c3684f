"""Slowly-changing-dimension Type-2 history build (Kimball, The Data
Warehouse Toolkit ch. 5) — the versioned-dimension primitive next to
``cdc.cdc_apply``: where cdc_apply answers "what is the CURRENT row per
key after this changelog", scd2_history answers "what was the row per
key AT EVERY POINT", emitting one validity-interval row per surviving
version. The reference's restart ledger (`restart.sh` appending to
restart_log) is the 1-column special case: each restart opens a new
"version" of the stream's liveness row.

Semantics (stated, not implied — the cdc_apply discipline):

* changes are ``(key, op, seq, payload)`` with op ∈ I/U/D, validated
  in-plan (any other op refuses loudly); ``seq`` is the version clock;
* two changes sharing (key, seq) are refused loudly — there is no
  deterministic version order between them (cdc_apply's same-seq
  tiebreak is NOT safe here because both changes would become visible
  versions, not one winner);
* a NO-OP UPDATE — an I/U whose payload is null-safe-equal to the
  immediately preceding change's payload when that change is also
  I/U — is collapsed (no new version row): the Kimball rule that a
  Type-2 row opens only when a tracked attribute CHANGES. The raw-lag
  rule chains transitively (a,a,a keeps only the first; a,D,a keeps
  both a's — the delete makes the re-insert a real new version);
* ``D`` closes the open version at its seq and opens nothing; a D with
  no open version is harmless (closes nothing, emits nothing);
* output: one row per surviving I/U version — ``(key, payload,
  valid_from, valid_to, is_current)`` with valid_from = the change's
  seq, valid_to = the NEXT effective change's seq (NULL while open),
  is_current = valid_to IS NULL. Intervals are half-open
  [valid_from, valid_to): a version is live at clock c iff
  valid_from <= c < coalesce(valid_to, +inf).

Scale: two windows, both partitioned on the key (the plan-guard rule —
never an unpartitioned window), zero joins, zero collects: the raw lag
computes the no-op collapse + duplicate-seq guard, the post-filter lead
assigns closing seqs. At 100 TB the changelog shuffles once on key and
everything else is within-partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_OP_OK = "op IN ('I','U','D')"


def scd2_history(
    changes: DataFrame,
    key: str,
    payload: str,
    seq: str = "seq",
    op: str = "op",
) -> DataFrame:
    """Build the Type-2 validity-interval history of ``changes``."""
    w = Window.partitionBy("_k").orderBy("_seq")
    ch = (
        changes.select(
            F.col(key).alias("_k"),
            F.col(op).alias("op"),
            F.col(seq).alias("_seq"),
            F.col(payload).alias("_p"),
        )
        .withColumn(
            "op",
            F.expr(
                f"CASE WHEN {_OP_OK} THEN op ELSE raise_error(concat("
                f"'scd2_history: unknown op ', op, ' - expected I/U/D')) END"
            ),
        )
        .withColumn("_prev_seq", F.lag("_seq").over(w))
        .withColumn("_prev_op", F.lag("op").over(w))
        .withColumn("_prev_p", F.lag("_p").over(w))
        .withColumn(
            "_seq_ok",
            F.expr(
                "CASE WHEN _prev_seq IS NULL OR _prev_seq <> _seq THEN true "
                "ELSE raise_error(concat('scd2_history: key ', "
                "CAST(_k AS STRING), ' has two changes at seq ', "
                "CAST(_seq AS STRING), ' - version order is ambiguous')) END"
            ),
        )
        .filter("_seq_ok")
    )
    noop = (
        F.col("op").isin("I", "U")
        & F.col("_prev_op").isin("I", "U")
        & F.col("_p").eqNullSafe(F.col("_prev_p"))
    )
    effective = ch.filter(~noop).select("_k", "op", "_seq", "_p")
    w2 = Window.partitionBy("_k").orderBy("_seq")
    return (
        effective.withColumn("_close", F.lead("_seq").over(w2))
        .filter(F.col("op") != "D")
        .select(
            F.col("_k").alias(key),
            F.col("_p").alias(payload),
            F.col("_seq").alias("valid_from"),
            F.col("_close").alias("valid_to"),
            F.col("_close").isNull().alias("is_current"),
        )
    )
