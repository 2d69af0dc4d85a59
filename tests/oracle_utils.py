"""Local replica of the driver's Spark-vs-DuckDB compare: same tables,
column-name-sorted, order-insensitive, exact values."""

from __future__ import annotations

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def compare(spark_df, sql: str, sf_dir: str) -> tuple[bool, str]:
    got = canon(spark_df.toPandas())
    want = canon(duck_conn(sf_dir).execute(sql).df())
    if list(got.columns) != list(want.columns):
        return False, f"columns differ: {list(got.columns)} vs {list(want.columns)}"
    if len(got) != len(want):
        return False, f"row counts differ: {len(got)} vs {len(want)}"
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            import numpy as np

            if not np.allclose(
                a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True
            ):
                bad = (a.astype(float) != b.astype(float)).idxmax()
                return False, f"col {c} differs at row {bad}: {a[bad]} vs {b[bad]}"
        else:
            if not a.astype(str).equals(b.astype(str)):
                bad = (a.astype(str) != b.astype(str)).idxmax()
                return False, f"col {c} differs at row {bad}: {a[bad]!r} vs {b[bad]!r}"
    return True, "ok"
