"""Driver-session independence (round-1 postmortem).

Round 1 lost 33 correctness rows because ``events.parquet`` (parquet
TIMESTAMP(NANOS)) is only readable with ``nanosAsLong`` set, and the
driver harness builds its own vanilla SparkSession that never saw the
engine's ``session.py``. These tests pin the fix at two levels:

1. in-process: ``load_table`` must (re)establish the confs it needs even
   when a caller's session lacks or contradicts them;
2. subprocess: a representative slice of ``queries()`` must run AND
   hash-match its DuckDB oracle on a genuinely bare session
   (``tools/check_correctness.py``, the local replica of the driver).
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_SMOKE = "/root/testdata/sf0.001"


def test_load_table_survives_vanilla_confs(spark):
    from dnstap2clickhouse_spark.sources.tables import load_table

    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = load_table(spark, SF_SMOKE, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert df.count() > 0
        # load_table must have re-pinned both confs
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", tz)


def test_ntz_normalization_exact_in_dst_gap(spark, tmp_path):
    """The NTZ wall->UTC-instant normalization must be exact even for wall
    clocks inside a DST transition window of a non-UTC session zone
    (2025-03-09 02:30 does not exist in America/New_York; the old
    cast-then-from_utc_timestamp route shifted it by the DST delta)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dnstap2clickhouse_spark.sources.tables import load_table

    # us since epoch for wall clocks read AS UTC
    gap = 1741487400123456  # 2025-03-09T02:30:00.123456 (inside NY gap)
    normal = 1751371200000000  # 2025-07-01T12:00:00
    table = pa.table(
        {
            "event_id": pa.array([0, 1], pa.int64()),
            "ts": pa.array([gap, normal], pa.timestamp("us")),  # NTZ
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        # simulate a locked-down session where the UTC pin didn't stick:
        # normalization must not depend on the session zone at all
        df = load_table(spark, str(tmp_path), "events")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        got = {
            r.event_id: r.us
            for r in df.selectExpr("event_id", "unix_micros(ts) AS us").collect()
        }
        assert got == {0: gap, 1: normal}
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz)


def test_queries_on_bare_session_subprocess():
    """One query per family through the vanilla-session oracle checker."""
    sample = [
        "dns_query_stream",
        "dns_client_query_agg",
        "dns_response_time_join",
        "events_sessionize",
        "tpch_market_share",
        "dedup_minhash_lsh",
        "sim_cosine_topk",
        "mm_media_features",
        # round-4 families: streaming contract entry, PII gate,
        # incremental ingest, sequence packing
        "dns_streaming_agg",
        "text_pii_scrub",
        "dedup_incremental_ingest",
        "split_token_chunks",
    ]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_correctness.py"), SF_SMOKE, *sample],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=REPO,
    )
    out = proc.stdout
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert f"TOTAL: {len(sample)}  PASS={len(sample)}" in out, out[-2000:]
