"""Bucketed co-located join: the pre-shuffled storage layout.

At 100 TB the fact-fact join (orders x lineitem) shuffles both sides on
every query. Bucketing pays that shuffle ONCE at write time: both tables
are written ``bucketBy(N, key) sortBy(key)``, so a later join on the key
reads bucket i of each side into the same task — a sort-merge join with
**zero Exchange** in the plan. This module demonstrates the layout and is
asserted shuffle-free by ``tests/test_skew.py``.

The bucket count is the knob: it fixes join parallelism for every
consumer, so it is chosen from the target cluster (e.g. 2-4x total
cores), not the data size. AQE cannot coalesce bucketed scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

def write_bucketed(
    spark: SparkSession, sf_dir: str, buckets: int = 8, suffix: str = "_b"
) -> tuple[str, str]:
    """Write orders+lineitem bucketed on the join key; returns table names."""
    ot, lt = f"orders{suffix}", f"lineitem{suffix}"
    load_table(spark, sf_dir, "orders").write.bucketBy(buckets, "o_orderkey").sortBy(
        "o_orderkey"
    ).mode("overwrite").format("parquet").saveAsTable(ot)
    load_table(spark, sf_dir, "lineitem").write.bucketBy(buckets, "l_orderkey").sortBy(
        "l_orderkey"
    ).mode("overwrite").format("parquet").saveAsTable(lt)
    return ot, lt

def bucketed_order_revenue(spark: SparkSession, orders_table: str, lineitem_table: str) -> DataFrame:
    """Revenue per order priority via the co-located join — no shuffle on
    either fact side (scans are bucket-aligned)."""
    o = spark.table(orders_table)
    l = spark.table(lineitem_table)
    return (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )
