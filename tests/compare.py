"""Differential comparison helper — mirrors the driver's t2 gate:
row-count + schema (column names) + order-insensitive value comparison
between a Spark DataFrame and a DuckDB oracle result.

The driver's value-hash is dtype-sensitive (round 4 lost 4 gates to DuckDB
integer-SUM HUGEINT -> decimal128 vs Spark int64, invisible to Python value
equality), so ``compare`` also asserts per-column *type-kind* equality
between the Spark schema and the oracle's Arrow schema: decimal vs int vs
float vs bool etc. must agree, while width/precision (int32 vs int64,
timestamp[us] vs [ns]) is tolerated.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def arrow_kind(t: pa.DataType) -> str:
    """Collapse an Arrow type to the coarse kind the dtype gate compares."""
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    # date and timestamp are ONE kind: both engines' pandas conversions
    # land on datetime64, and r4 evidence shows the driver hash accepts a
    # Spark timestamp against a DuckDB DATE (fifo_daily_rollup passed)
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "datetime"
    if pa.types.is_list(t) or pa.types.is_large_list(t) \
            or pa.types.is_fixed_size_list(t):
        return "list"
    if pa.types.is_struct(t):
        return "struct"
    if pa.types.is_map(t):
        return "map"
    return str(t)


def spark_kind(t: T.DataType) -> str:
    """Same coarse kind for a Spark SQL type."""
    if isinstance(t, T.DecimalType):
        return "decimal"
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(t, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(t, T.StringType):
        return "str"
    if isinstance(t, T.BinaryType):
        return "binary"
    if isinstance(t, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "datetime"
    if isinstance(t, T.ArrayType):
        return "list"
    if isinstance(t, T.StructType):
        return "struct"
    if isinstance(t, T.MapType):
        return "map"
    return t.simpleString()


def assert_kinds_match(
    spark_schema: T.StructType, oracle_schema: pa.Schema, name: str = ""
) -> None:
    sk = {f.name: spark_kind(f.dataType) for f in spark_schema.fields}
    ok = {f.name: arrow_kind(f.type) for f in oracle_schema}
    bad = [
        (c, sk[c], ok[c])
        for c in sorted(set(sk) & set(ok))
        if sk[c] != ok[c]
    ]
    assert not bad, (
        f"dtype-kind drift {name}: (col, spark, oracle) = {bad} — the "
        "driver's value-hash is dtype-sensitive; cast the oracle (e.g. "
        "CAST(SUM(..) AS BIGINT)) or the Spark column so the kinds agree"
    )


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
    oracle_tbl = con.execute(oracle_sql).arrow()
    assert_kinds_match(spark_df.schema, oracle_tbl.schema)
    # date_as_object=False matches duckdb's .df() (DATE -> datetime64), so
    # the value comparison behaves exactly as before the arrow-schema gate
    du = oracle_tbl.to_pandas(date_as_object=False)

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
