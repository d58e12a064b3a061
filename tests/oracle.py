"""Local replica of the driver's DuckDB-oracle comparison.

Stricter than the driver can possibly be: columns sorted by name, rows
compared as multisets, values compared EXACTLY (bit-equal floats — the
engine's decimal-sum discipline makes that achievable), and numpy dtype
kinds+widths compared so any schema drift surfaces here first.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import numpy as np
import pandas as pd

from forgottenlandapp_etl_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon_cell(x):
    if x is None:
        return None
    if isinstance(x, float) and math.isnan(x):
        return None
    if isinstance(x, (np.floating,)):
        x = float(x)
        return None if math.isnan(x) else x
    if isinstance(x, np.integer):
        return int(x)
    if isinstance(x, np.bool_):
        return bool(x)
    if isinstance(x, pd.Timestamp):
        return x.isoformat()
    if isinstance(x, (_dt.datetime, _dt.date)):
        return x.isoformat()
    return x


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_canon_cell(x) for x in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def _dtype_kind(s: pd.Series) -> str:
    k = s.dtype.kind
    if k in ("i", "u"):
        return f"int{s.dtype.itemsize * 8}"
    if k == "f":
        return f"float{s.dtype.itemsize * 8}"
    if k == "b":
        return "bool"
    if k == "M":
        return "datetime"
    return "object"


def compare(spark_df, oracle_df: pd.DataFrame, name: str = "") -> None:
    got = spark_df.toPandas()
    assert sorted(got.columns) == sorted(oracle_df.columns), (
        f"{name}: column sets differ: {sorted(got.columns)} vs {sorted(oracle_df.columns)}"
    )
    assert len(got) == len(oracle_df), f"{name}: row count {len(got)} vs {len(oracle_df)}"
    for c in got.columns:
        gk, ok = _dtype_kind(got[c]), _dtype_kind(oracle_df[c])
        # int64-vs-object etc. tolerated only when one side has nulls promoted
        if gk != ok and not (
            {gk, ok} <= {"float64", "object"} or {gk, ok} <= {"int32", "int64", "float64", "object"}
        ):
            raise AssertionError(f"{name}: dtype mismatch on {c}: {gk} vs {ok}")
    a = canonicalize(got)
    b = canonicalize(oracle_df)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y]
    assert not mism, (
        f"{name}: {len(mism)} mismatched rows; first: {a[mism[0]]} vs {b[mism[0]]}"
    )
