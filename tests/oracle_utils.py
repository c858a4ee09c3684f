"""Oracle-differential comparison mirroring the driver's check:
row count + column set + order-insensitive values (exact after the engine's
own 4-dp rounding discipline)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = np.round(s.astype("float64"), 9)
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype("boolean")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "query") -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(oracle_pdf)
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ga = g.astype("float64").to_numpy()
            wa = w.astype("float64").to_numpy()
            both_nan = np.isnan(ga) & np.isnan(wa)
            eq = np.isclose(ga, wa, rtol=0, atol=1e-9) | both_nan
            if not eq.all():
                bad = np.flatnonzero(~eq)[:5]
                raise AssertionError(
                    f"{name}: column {c} differs at rows {bad.tolist()}: "
                    f"spark={ga[bad].tolist()} oracle={wa[bad].tolist()}"
                )
        else:
            eq = (g.isna() & w.isna()) | (g == w)
            if not eq.all():
                bad = np.flatnonzero(~eq.to_numpy())[:5]
                raise AssertionError(
                    f"{name}: column {c} differs at rows {bad.tolist()}: "
                    f"spark={g.iloc[bad].tolist()} oracle={w.iloc[bad].tolist()}"
                )
