"""Differential comparison helper — mirrors the driver's t2 gate:
row-count + schema (column names) + order-insensitive value comparison
between a Spark DataFrame and a DuckDB oracle result.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from pyspark.sql import DataFrame


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # array-typed cells (numpy arrays / lists) are unhashable-unsortable —
    # normalize to tuples so row sorting works
    for col in df.columns:
        if df[col].map(lambda v: isinstance(v, (list, tuple))
                       or hasattr(v, "tolist") and not isinstance(v, (str, bytes))
                       ).any():
            df[col] = df[col].map(
                lambda v: tuple(v.tolist() if hasattr(v, "tolist") else v)
                if v is not None and not isinstance(v, (str, bytes, float, int))
                else v
            )
    if len(df) == 0:
        return df.reset_index(drop=True)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(
    spark_df: DataFrame,
    con: duckdb.DuckDBPyConnection,
    oracle_sql: str,
    float_tol: float = 0.0,
) -> None:
    """Raise AssertionError with a readable diff on any mismatch."""
    sp = spark_df.toPandas()
    du = con.execute(oracle_sql).df()

    assert len(sp) == len(du), f"row count: spark={len(sp)} duckdb={len(du)}"
    assert sorted(sp.columns) == sorted(du.columns), (
        f"columns: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}"
    )
    sp, du = _normalize(sp), _normalize(du)

    mismatches = []
    for col in sp.columns:
        a, b = sp[col], du[col]
        for i, (x, y) in enumerate(zip(a, b)):
            if _eq(x, y, float_tol):
                continue
            mismatches.append((col, i, x, y))
            if len(mismatches) >= 10:
                break
        if len(mismatches) >= 10:
            break
    assert not mismatches, f"value mismatches (col, row, spark, duckdb): {mismatches}"


def _eq(x, y, tol: float) -> bool:
    xn = x is None or (isinstance(x, float) and math.isnan(x)) or x is pd.NaT
    yn = y is None or (isinstance(y, float) and math.isnan(y)) or y is pd.NaT
    try:
        if pd.isna(x) and pd.isna(y):
            return True
    except (TypeError, ValueError):
        pass
    if xn or yn:
        return xn and yn
    if isinstance(x, float) or isinstance(y, float):
        if x == y:
            return True
        return tol > 0 and abs(float(x) - float(y)) <= tol * max(1.0, abs(float(y)))
    if isinstance(x, (list, tuple)) or isinstance(y, (list, tuple)):
        x = list(x) if x is not None else None
        y = list(y) if y is not None else None
        return x == y
    return x == y
