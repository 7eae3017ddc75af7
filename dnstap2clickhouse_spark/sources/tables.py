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

def _ensure_session_confs(spark: SparkSession) -> None:
    """Make table reads independent of who built the SparkSession.

    The engine's own ``session.py`` sets these, but callers (test harnesses,
    notebooks) may hand us a vanilla session. Both confs are runtime-settable:

    - ``nanosAsLong``: events.ts is parquet TIMESTAMP(NANOS); without this the
      scan fails with PARQUET_TYPE_ILLEGAL. With it, ts arrives as bigint and
      the ``div 1000 -> timestamp_micros`` normalization below takes over.
    - ``timeZone=UTC``: keeps ``window()``/``year()`` aligned with the
      naive-timestamp DuckDB oracle regardless of the host zone.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # conf locked down (e.g. Connect server policy) — reads may still work

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
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
