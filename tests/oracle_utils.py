"""Test-side replica of the driver's correctness gate: run the Spark query
and its DuckDB oracle on the same parquet tables, then compare row count,
column names, and values (order-insensitive)."""

from __future__ import annotations

import duckdb
import pandas as pd

from dataworks_aws_corporate_data_ingestion_spark.sources.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _normalise(df: pd.DataFrame) -> pd.DataFrame:
    """Stringify every column the way a value-hashing driver would, so
    dtype drift (e.g. DuckDB HUGEINT -> pandas float) fails loudly instead
    of slipping past a dtype-insensitive numeric compare."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame(index=df.index)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.map(lambda v: repr(float(v)) if pd.notna(v) else "NaN")
        else:
            out[c] = s.astype(str)
    return out.sort_values(by=list(out.columns), kind="mergesort").reset_index(
        drop=True
    )


def compare(spark_df, oracle_df: pd.DataFrame, float_tol: float = 0.0) -> None:
    got = _normalise(spark_df.toPandas())
    want = _normalise(oracle_df)
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    pd.testing.assert_frame_equal(
        got,
        want,
        check_dtype=False,
        check_exact=(float_tol == 0.0),
        rtol=float_tol,
        atol=float_tol,
    )
