"""Scale-up test data: replicate /root/testdata/sf0.1 N× into /tmp.

Produces a corpus ~N×sf0.1 with DISTINCT keys per replica (event ids,
doc ids, order/line keys are offset per copy so joins/dedup behave like
real bigger data, not N identical clones) and MULTI-FILE parquet layout
so scans parallelize the way a real deployment's would.

Usage:  python tools/make_scale_data.py [N] [out_dir]
Default: N=10 -> ~sf1 at /tmp/scale_sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from dnstap2clickhouse_spark.session import get_spark
from dnstap2clickhouse_spark.sources.tables import TABLES, load_table

SRC = "/root/testdata/sf0.1"

#: per-table key columns that must stay unique across replicas
OFFSET_KEYS = {
    "events": {"event_id": 100_000, "user_id": 0},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
    "orders": {"o_orderkey": 600_000, "o_custkey": 0},
    "lineitem": {"l_orderkey": 600_000},
    "customer": {},
    "supplier": {},
    "part": {},
    "nation": {},
    "region": {},
}

#: keep event/query-time semantics: shift each replica by a day so windows
#: don't all collapse into the same buckets
TS_SHIFT = {"events": ("ts", 86_400)}


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_sf1"
    spark = get_spark("make-scale-data")
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        df = load_table(spark, SRC, t)
        offs = OFFSET_KEYS.get(t, {})
        if not offs and t in ("nation", "region", "customer", "supplier", "part"):
            # dimensions: keep as-is (joins stay valid, broadcast stays small)
            df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
            continue
        rep = df.withColumn(
            "__copy", F.explode(F.array(*[F.lit(i) for i in range(n)]))
        )
        for col, step in offs.items():
            if step:
                rep = rep.withColumn(col, F.col(col) + F.col("__copy") * F.lit(step))
        if t in TS_SHIFT:
            col, secs = TS_SHIFT[t]
            rep = rep.withColumn(
                col, F.col(col) + (F.col("__copy") * F.lit(secs)).cast("interval second")
            )
        files = max(8, n)
        (
            rep.drop("__copy")
            .repartition(files)
            .write.mode("overwrite")
            .parquet(f"{out}/{t}.parquet")
        )
        print(t, "->", files, "files")
    spark.stop()
    print("done:", out)


if __name__ == "__main__":
    main()
