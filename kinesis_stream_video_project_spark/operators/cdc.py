"""CDC changeset application — MERGE INTO semantics as a deterministic
batch operator: apply an (insert/update/delete) change log to a snapshot
with latest-wins resolution, the upsert primitive every lakehouse table
format (Delta/Iceberg/Hudi MERGE) implements and the reference's
"restart replaces the live pipeline" is the 1-row special case of.

Semantics (stated, not implied):

* the WINNING change per key is the one with the highest ``seq``; among
  equal seqs the op breaks ties by D > U > I (a delete and an upsert in
  the same atomic batch resolve to the delete — the conservative
  reading); two changes sharing BOTH seq and op are refused loudly
  (their payloads could differ and no deterministic winner exists);
* ``D`` removes the key (whether or not it existed); ``U`` and ``I``
  both UPSERT (set the payload, inserting if absent) — the symmetric
  MERGE reading; the op column is validated in-plan and any other code
  refuses loudly;
* snapshot keys must be unique — enforced with an in-plan count guard
  (a duplicated snapshot key would make "update" ambiguous).

Scale: one change-log aggregate (max_by over the (seq, op_rank) pair —
map-side combined, no window), one full-outer join with the snapshot on
the key. Both shuffles key on the merge key; nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_OP_RANK = "CASE op WHEN 'D' THEN 3 WHEN 'U' THEN 2 WHEN 'I' THEN 1 ELSE NULL END"


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    payload: str,
    seq: str = "seq",
    op: str = "op",
) -> DataFrame:
    """Apply ``changes`` (``key, op, seq, payload``) to ``snapshot``
    (``key, payload``): returns the post-merge ``(key, payload)``."""
    ch = changes.select(
        F.col(key).alias("_k"),
        F.col(op).alias("op"),
        F.col(seq).alias("_seq"),
        F.col(payload).alias("_new"),
    ).withColumn(
        "_rank",
        F.expr(
            f"CASE WHEN {_OP_RANK} IS NOT NULL THEN {_OP_RANK} "
            f"ELSE raise_error(concat('cdc_apply: unknown op ', op, "
            f"' - expected I/U/D')) END"
        ),
    )
    # Single-integer ordering key seq*4 + op_rank keeps the arg-max
    # portable (DuckDB arg_max twin) — in-plan refusal above 2^60 seqs.
    winner = (
        ch.withColumn(
            "_ord",
            F.expr(
                "CASE WHEN _seq BETWEEN 0 AND 1152921504606846976 "
                "THEN _seq * 4 + _rank ELSE raise_error("
                "'cdc_apply: seq outside [0, 2^60] - ordering key would "
                "overflow') END"
            ),
        )
        .groupBy("_k")
        .agg(
            F.count(F.lit(1)).alias("_n_ord"),
            F.count_distinct(F.col("_ord")).alias("_n_distinct_ord"),
            F.max_by(
                F.struct(F.col("op").alias("op"), F.col("_new").alias("_new")),
                F.col("_ord"),
            ).alias("_w")
        )
        .select(
            "_k",
            F.expr(
                "CASE WHEN _n_ord = _n_distinct_ord THEN _w.op "
                "ELSE raise_error(concat('cdc_apply: key ', "
                "CAST(_k AS STRING), ' has changes sharing (seq, op) - "
                "no deterministic winner')) END"
            ).alias("_op"),
            F.col("_w._new").alias("_new"),
        )
    )
    snap = snapshot.select(F.col(key).alias("_sk"), F.col(payload).alias("_old"))
    dup_guard = snap.groupBy("_sk").agg(F.count(F.lit(1)).alias("_c")).select(
        F.expr(
            "CASE WHEN max(_c) = 1 THEN true ELSE "
            "raise_error('cdc_apply: snapshot keys are not unique - "
            "update target is ambiguous') END"
        ).alias("_ok")
    )
    merged = snap.join(winner, snap["_sk"] == winner["_k"], "full_outer")
    return (
        merged.crossJoin(F.broadcast(dup_guard))
        .filter("_ok")
        .filter((F.col("_op").isNull()) | (F.col("_op") != "D"))
        .select(
            F.coalesce(F.col("_sk"), F.col("_k")).alias(key),
            # decide by op, not by null-ness: a NULL payload in an
            # upsert must WIN (set the field to null), not fall back
            F.when(F.col("_op").isNull(), F.col("_old"))
            .otherwise(F.col("_new"))
            .alias(payload),
        )
    )
