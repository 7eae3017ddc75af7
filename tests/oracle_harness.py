"""Local replica of the driver's correctness gate.

Runs a Spark query and its DuckDB oracle SQL on the same parquet tables and
compares row count, schema (name/type after normalization), and an
order-insensitive value comparison. Stricter than lenient: values are
compared exactly (post float64 normalization) so any engine drift fails
here before it fails in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from dnstap2clickhouse_spark.sources.tables import TABLES

def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()

def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = pd.to_datetime(s).dt.tz_localize(None)
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_bool_dtype(s):
            out[c] = s.astype("bool")
    # order-insensitive: sort columns by name, then rows by all columns
    out = out.reindex(sorted(out.columns), axis=1)
    out = out.sort_values(by=list(out.columns), ignore_index=True)
    return out

def assert_match(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(oracle_pdf)
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            gl, wl = g.astype("float64").tolist(), w.astype("float64").tolist()
            for i, (a, b) in enumerate(zip(gl, wl)):
                ok = (
                    (math.isnan(a) and math.isnan(b))
                    if (isinstance(a, float) and math.isnan(a)) or (isinstance(b, float) and math.isnan(b))
                    else a == b
                )
                assert ok, f"{name}: float col {c} row {i}: {a!r} != {b!r}"
        else:
            eq = g.eq(w) | (g.isna() & w.isna())
            assert eq.all(), (
                f"{name}: col {c} first diff at row {eq.idxmin()}: "
                f"{g[eq.idxmin()]!r} != {w[eq.idxmin()]!r}"
            )
