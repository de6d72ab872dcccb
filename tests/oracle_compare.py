"""Local replica of the driver's DuckDB correctness gate: run a Spark
query and its oracle SQL side-by-side, sort columns by name, sort rows,
compare values. Used by test_entry_oracle.py so mismatches surface in
pytest before the driver sees them."""

from __future__ import annotations

import math
from pathlib import Path

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str = "?"):
    got = _canon(spark_df.toPandas())
    want = _canon(con.execute(sql).df())
    assert len(got) == len(want), (
        f"{name}: row count {len(got)} != oracle {len(want)}"
    )
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            for i, (a, b) in enumerate(zip(g.astype(float), w.astype(float))):
                if math.isnan(a) and math.isnan(b):
                    continue
                assert abs(a - b) < 1e-9, f"{name}.{c}[{i}]: {a} != {b}"
        else:
            mism = (g.astype(str) != w.astype(str))
            assert not mism.any(), (
                f"{name}.{c}: first mismatch at row {mism.idxmax()}: "
                f"{g[mism].iloc[0]!r} != {w[mism].iloc[0]!r}"
            )
