"""End-to-end daemon wiring: unix socket -> bridge -> Structured
Streaming aggregation -> column-mapped parquet tables (the reference's
main.go path)."""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dnstap2clickhouse_spark.__main__ import build_streams, start_queries
from dnstap2clickhouse_spark.config import EngineConfig
from dnstap2clickhouse_spark.sources.bridge import SocketBridge, send_frames

def test_socket_to_tables_end_to_end(spark):
    work = tempfile.mkdtemp(prefix="daemon_")
    sock = os.path.join(work, "dnstap.sock")
    bridge_dir = os.path.join(work, "bridge")
    out_dir = os.path.join(work, "tables")
    bridge = SocketBridge(sock, bridge_dir, flush_rows=10)
    bridge.start()
    try:
        # queries (even ids) and responses (odd) incl. non-NOERROR ones
        rows = [
            {
                "event_id": i,
                "ts_us": 1_760_000_000_000_000 + i * 1_000_000,
                "user_id": i % 5,
                "event_type": ["click", "error", "purchase", "signup", "view"][i % 5],
                "value": float(i),
                "props": "{}",
            }
            for i in range(60)
        ]
        send_frames(sock, rows)
        import time

        deadline = time.time() + 10
        while bridge.frames_read < len(rows) and time.time() < deadline:
            time.sleep(0.1)
        assert bridge.frames_read == len(rows)
        bridge.flush()

        cfg = EngineConfig()
        cfg.sink.query_columns = {
            "queryTime": "ts",
            "identity": "ident",
            "queryAddress": "addr",
            "questionName": "qname",
            "questionType": "",  # pruned (K1 empty-name semantics)
            "counter": "hits",
        }
        queries = start_queries(
            spark, cfg, build_streams(spark, cfg, bridge_dir), out_dir, available_now=True
        )
        for q in queries:
            q.awaitTermination(timeout=60)

        cq = spark.read.parquet(os.path.join(out_dir, "clientQuery"))
        assert set(cq.columns) >= {"ts", "ident", "addr", "qname", "hits"}
        assert "questionType" not in cq.columns
        assert cq.count() > 0
        cr = spark.read.parquet(os.path.join(out_dir, "clientResponse"))
        assert cr.count() > 0  # non-NOERROR rows exist on odd ids
        assert cr.filter("responseStatus = 'NOERROR'").count() == 0  # F5
    finally:
        bridge.stop()
        shutil.rmtree(work, ignore_errors=True)

def test_update_mode_reemissions_collapse_to_final_counts(spark):
    """Two availableNow runs over one checkpoint re-emit the same window
    with a larger cumulative counter; raw parquet keeps both versions, so
    summing raw rows overcounts — read_output_table must collapse to the
    latest epoch's value per key (ADVICE r1)."""
    import time

    from pyspark.sql import functions as F

    from dnstap2clickhouse_spark.__main__ import read_output_table

    work = tempfile.mkdtemp(prefix="daemon_collapse_")
    sock = os.path.join(work, "dnstap.sock")
    bridge_dir = os.path.join(work, "bridge")
    out_dir = os.path.join(work, "tables")
    cfg = EngineConfig()
    cfg.aggregator.non_ok_client_responses = False  # one table is enough

    def run_wave(rows):
        bridge = SocketBridge(sock, bridge_dir, flush_rows=10)
        bridge.start()
        try:
            send_frames(sock, rows)
            deadline = time.time() + 10
            while bridge.frames_read < len(rows) and time.time() < deadline:
                time.sleep(0.1)
            assert bridge.frames_read == len(rows)
            bridge.flush()
        finally:
            bridge.stop()
        queries = start_queries(
            spark, cfg, build_streams(spark, cfg, bridge_dir), out_dir, available_now=True
        )
        for q in queries:
            q.awaitTermination(timeout=60)

    def rows_at(start, n):
        # all inside ONE event-time window so wave 2 re-emits wave 1's window
        return [
            {
                "event_id": i,
                "ts_us": 1_760_000_000_000_000 + i * 1_000,
                "user_id": 1,
                "event_type": "click",
                "value": float(i),
                "props": "{}",
            }
            for i in range(start, start + n)
        ]

    try:
        run_wave(rows_at(0, 20))
        run_wave(rows_at(20, 20))  # same window, same keys, larger counters

        raw = spark.read.parquet(os.path.join(out_dir, "clientQuery"))
        collapsed = read_output_table(spark, os.path.join(out_dir, "clientQuery"))
        # queries are even event_ids: 20 of 40 rows, x3 grouping-set variants
        total = (
            collapsed.agg(F.sum("counter").alias("s")).collect()[0]["s"]
        )
        assert total == 20 * 3, f"collapsed total {total} != 60"
        # raw parquet holds the wave-1 versions too -> strictly more
        raw_total = raw.agg(F.sum("counter").alias("s")).collect()[0]["s"]
        assert raw_total > total
        # collapse is unique per key
        keys = [c for c in collapsed.columns if c != "counter"]
        assert collapsed.groupBy(*keys).count().filter("count > 1").count() == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)
