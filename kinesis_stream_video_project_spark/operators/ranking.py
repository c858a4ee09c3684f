"""Top-k WITH TIES — the ANSI ``FETCH FIRST k ROWS WITH TIES`` semantics
per group, which ``row_number() <= k`` (the repo's topn_orders_per_nation
form) silently does NOT implement: a tie straddling the cutoff is either
wholly in (rank) or arbitrarily cut (row_number). On columns with heavy
collisions the difference is material, not cosmetic — probed on
per-supplier lineitem quantities: rank <= 2 keeps ~12 rows/supplier
(11 992 at sf0.1) where row_number keeps exactly 2 (2 000), because the
top quantity tier is shared by many line items.

Both semantics are exposed so consumers choose deliberately; the
``dense`` flag switches the cutoff to value-tiers (``dense_rank``: "the
k highest VALUES and everyone holding them") which is a third, again
different, contract.

Scale: one window per group key — the shuffle is the group key hash,
each task sorts its own group's rows; with ties the output is bounded
by data (k + the straddling tie group), stated, not by k alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def topk_with_ties(
    df: DataFrame,
    part_col: str,
    order_col: str,
    k: int,
    descending: bool = True,
    dense: bool = False,
) -> DataFrame:
    """All rows whose ``rank()`` (or ``dense_rank()``) over
    ``(part_col, order_col)`` is at most ``k`` — the input columns plus
    ``rk``. The window orders by ``order_col`` ALONE (no tie-break
    column): adding one would turn rank into row_number and silently
    drop the WITH-TIES contract this operator exists for."""
    if k < 1:
        raise ValueError(f"topk_with_ties: k must be >= 1, got {k}")
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(part_col).orderBy(oc)
    rk = (F.dense_rank() if dense else F.rank()).over(w)
    return (
        df.withColumn("rk", rk.cast("long"))
        .filter(F.col("rk") <= k)
    )
