"""Measure the two documented scale knobs at the 10x replica.

SCALING.md records two honest superlinear rows at FIXED test-scale
constants: `dedup_semantic` (fixed k=4 -> intra-cluster pairs grow
quadratically) and `dedup_embedding_lsh` (fixed 2^LSH_BITS buckets ->
occupancy grows linearly, candidates quadratically). Both rows name the
deploy knob that restores linearity — k proportional to n, LSH_BITS
proportional to log n. This script RUNS those knobs: it regenerates the
same audited SQL with the scaled constants (the generators read the
module constants at call time) and times both settings on the same
replica, so the "knob restores linearity" claim is a measurement, not
an argument.

Usage:  python tools/scale_knobs.py [replica_dir]
Prints one line per (query, setting): runtime + output size.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICA = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf1"
SF01 = "/root/testdata/sf0.1"


def main() -> None:
    from dnstap2clickhouse_spark.functions import similarity as fsim
    from dnstap2clickhouse_spark.session import get_spark

    spark = get_spark("scale_knobs")
    spark.sparkContext.setLogLevel("ERROR")

    def run(sql: str, sf_dir: str, label: str) -> None:
        fsim._register(spark, sf_dir)
        times = []
        for _ in range(2):
            t = time.time()
            n = spark.sql(sql).count()
            times.append(time.time() - t)
        print(f"{label}: min {min(times):.1f}s rows={n}", flush=True)

    # --- SemDeDup: k fixed (the contract constant) vs k scaled 10x ---
    # constant occupancy => intra-cluster pair work scales linearly
    base_k = fsim.KMEANS_K
    try:
        run(fsim._semantic_dedup_sql("spark"), SF01, f"sf0.1  dedup_semantic k={base_k}")
        fsim.KMEANS_K = base_k * 10
        run(fsim._semantic_dedup_sql("spark"), REPLICA, f"sf1    dedup_semantic k={base_k * 10}")
    finally:
        fsim.KMEANS_K = base_k

    # --- embedding LSH: bucket keyspace fixed vs widened by ~log(10x) ---
    # 4 tables x 2^4 buckets -> 4 tables x 2^7: occupancy back near the
    # sf0.1 level, candidate count (and cost) near-linear again
    base_bits = fsim.LSH_BITS
    try:
        run(
            fsim._embedding_lsh_pairs_sql("spark"),
            SF01,
            f"sf0.1  dedup_embedding_lsh bits={base_bits}",
        )
        fsim.LSH_BITS = base_bits + 3
        run(
            fsim._embedding_lsh_pairs_sql("spark"),
            REPLICA,
            f"sf1    dedup_embedding_lsh bits={base_bits + 3}",
        )
    finally:
        fsim.LSH_BITS = base_bits

    spark.stop()


if __name__ == "__main__":
    main()
