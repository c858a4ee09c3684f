"""Skew mitigation: salted aggregation and salted broadcast-less joins.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most skew at runtime by splitting oversized shuffle
partitions. Two cases it does NOT cover, which these helpers do:

1. **Skewed aggregation**: a single hot group key (one device emitting 90 %
   of all probe events — the realistic failure mode of the reference's fleet:
   one broken gateway flooding errors, restart.sh:86-95) lands on one reducer.
   AQE cannot split a hash-aggregate group. :func:`salted_agg` runs a
   two-stage aggregate: stage 1 groups on (key, salt) spreading the hot key
   over N reducers, stage 2 re-aggregates the N partials per key. Only
   algebraic aggregates (sum/count/min/max — and avg via sum+count) compose
   this way, which is why the helper takes them explicitly.

2. **Skewed sort-merge join where neither side broadcasts**: salting the
   build side by replication. :func:`salted_join` appends a random salt in
   [0, n) to the skewed (large) side's key and explodes the other side n
   ways, turning one hot shuffle partition into n even ones at the cost of
   replicating the smaller side n-fold — profitable exactly when
   max_key_rows / avg_key_rows >> n.

Both are deterministic-output (the salt never reaches the result), though
salt assignment itself uses `rand()` — fine because aggregation/join results
are salt-invariant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-proof aggregation.

    ``aggs`` maps output column name -> (input column, fn) with fn in
    {"sum", "count", "min", "max"}. Example::

        salted_agg(events, ["user_id"], {"total": ("value", "sum"),
                                         "n": ("value", "count")})

    Equivalent to ``df.groupBy(group_cols).agg(...)`` but the first shuffle
    distributes each group over ``n_salts`` reducers.
    """
    stage1_exprs: list[Column] = []
    stage2_exprs: list[Column] = []
    for out, (col, fn) in aggs.items():
        if fn == "sum":
            stage1_exprs.append(F.sum(col).alias(out))
            stage2_exprs.append(F.sum(out).alias(out))
        elif fn == "count":
            stage1_exprs.append(F.count(col).alias(out))
            stage2_exprs.append(F.sum(out).alias(out))
        elif fn == "min":
            stage1_exprs.append(F.min(col).alias(out))
            stage2_exprs.append(F.min(out).alias(out))
        elif fn == "max":
            stage1_exprs.append(F.max(col).alias(out))
            stage2_exprs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted")
    salted = df.withColumn(_SALT, (F.rand(seed=42) * n_salts).cast("int"))
    partial = salted.groupBy(*group_cols, _SALT).agg(*stage1_exprs)
    return partial.groupBy(*group_cols).agg(*stage2_exprs)


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    skewed_key: str,
    other_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Shuffle-even join for a skewed large side against a non-broadcastable
    side. The skewed side gets a random salt; the other side is exploded to
    all n salts so every (key, salt) pair still meets its match.
    """
    s = skewed.withColumn(_SALT, (F.rand(seed=42) * n_salts).cast("int"))
    o = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = s.join(
        o,
        (s[skewed_key] == o[other_key]) & (s[_SALT] == o[_SALT]),
        how,
    )
    return joined.drop(s[_SALT]).drop(o[_SALT])
