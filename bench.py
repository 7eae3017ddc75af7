"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries" (per-query
sec), "sf"}.

Each query executes end-to-end via the `noop` sink — the full physical
plan runs (scan -> shuffle -> agg/join) without driver-side collection,
so the numbers measure the engine, not result transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dnstap2clickhouse_spark.session import get_spark
import __spark_entry__ as entry

#: headline set: the flagship DNS pipeline + joins + the scale-relevant
#: training-data ops. (The full inventory runs in the correctness gate;
#: bench tracks the expensive representative plans.)
HEADLINE = [
    "dns_client_query_agg",
    "dns_client_response_agg",
    "dns_response_time_join",
    "dns_match_once",
    "dns_pipeline_e2e",
    "dns_q1_top_addresses",
    "dns_q4_latency_series",
    "tpch_pricing_summary",
    "tpch_top_orders",
    "tpch_region_revenue",
    "events_sessionize",
    "events_asof_attribution",
    "curate_corpus_e2e",
    "tpch_small_qty_revenue",
    "text_fingerprints",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "sim_ivf_topk",
]

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("bench")
    queries = entry.queries()

    # one untimed warm-up: JVM/codegen/parquet-footer initialization —
    # measured numbers then reflect steady-state plan execution
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    queries["dns_q1_top_addresses"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # two timed executions per query; headline value is the min
    # (steady-state, comparable round over round — the first pass eats any
    # cold page-cache / first-scan costs the host injects unpredictably),
    # but BOTH raw runs are emitted in "runs" so cold-start cost stays
    # recoverable from the output (methodology frozen as of round 2)
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name in HEADLINE:
        runs[name] = []
        for _ in range(2):
            df = queries[name](spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.time() - t0, 3))
        timings[name] = min(runs[name])
        # outside the timed region: let ContextCleaner drop finished
        # queries' broadcast blocks so late queries don't pay earlier
        # queries' GC debt (measured 11.3s -> 3.1s on the 18th query of a
        # 30x-corpus session)
        import gc

        gc.collect()
        spark._jvm.System.gc()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "runs": runs,
                "sf": sf,
            }
        )
    )
    spark.stop()

if __name__ == "__main__":
    main()
