"""K1: config-driven column mapping and pruning.

Reference: the sink builds ``INSERT INTO t (c1,c2,...)`` from configured
column names; an empty name prunes the column from the statement
(clickhouse.go:124-175, defaults toml.go:63-71). In Spark this is a
select/alias — which also lets Catalyst push column pruning all the way
into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def apply_column_config(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Project logical columns to configured physical names; empty or
    missing name => column pruned (clickhouse.go:124-137)."""
    cols = [F.col(logical).alias(physical) for logical, physical in mapping.items() if physical]
    if not cols:
        raise ValueError("column config prunes every column")
    return df.select(*cols)

def apply_column_config_sql(inner_sql: str, mapping: dict[str, str]) -> str:
    sel = ", ".join(f"{lg} AS {ph}" for lg, ph in mapping.items() if ph)
    return f"SELECT {sel} FROM ({inner_sql})"
