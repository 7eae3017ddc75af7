"""Parquet table loaders.

Centralizes schema normalization so every operator sees clean Spark types:
``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark only reads
via ``spark.sql.legacy.parquet.nanosAsLong`` (as a raw long). We convert
back with *integer* division (``div 1000`` — floor, matching DuckDB's
nanos->micros truncation). Float division would silently lose precision:
nano timestamps (~1.7e18) exceed double's 53-bit exact-integer range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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

#: columns stored as TIMESTAMP(NANOS) in the test corpus
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in _NANO_TS_COLS.get(name, ()):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df

def register_views(spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view (for the SQL-flavored API)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
