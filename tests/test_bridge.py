"""S1-S5 bridge: real unix socket -> frames -> parquet chunks -> Spark
(batch and readStream), plus the S1 backoff ladder semantics."""

from __future__ import annotations

import itertools
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dnstap2clickhouse_spark.sources.bridge import SocketBridge, backoff_delays, send_frames
from dnstap2clickhouse_spark import streaming as st

def _sample_rows(n: int) -> list[dict]:
    base_us = 1_704_067_200_000_000
    types = ["click", "error", "purchase", "signup", "view"]
    return [
        {
            "event_id": i,
            "ts_us": base_us + i * 1_000_000,
            "user_id": i % 50,
            "event_type": types[i % 5],
            "value": float(i) / 10.0,
            "props": "{}",
        }
        for i in range(n)
    ]

def test_backoff_ladder_matches_reference():
    # dnstap.go:112-124: 1, 3, 7, 15, 31, 60, 60, ...
    assert list(itertools.islice(backoff_delays(), 7)) == [1, 3, 7, 15, 31, 60, 60]

def test_socket_to_parquet_to_spark(spark):
    d = tempfile.mkdtemp(prefix="bridge_")
    sock = os.path.join(d, "dnstap.sock")
    out = os.path.join(d, "chunks")
    bridge = SocketBridge(sock, out, readers=2, flush_rows=64)
    bridge.start()
    try:
        rows = _sample_rows(200)
        send_frames(sock, rows[:100])
        send_frames(sock, rows[100:])  # second connection exercises fan-in
        deadline = 50
        while bridge.frames_read < 200 and deadline:
            import time

            time.sleep(0.1)
            deadline -= 1
        assert bridge.frames_read == 200
    finally:
        bridge.stop()
    # socket file removed on stop; 0660 was applied while live
    assert not os.path.exists(sock)

    df = spark.read.parquet(out)
    assert df.count() == 200
    assert set(df.columns) == {"event_id", "ts", "user_id", "event_type", "value", "props"}
    # the bridge output feeds the SAME streaming pipeline as driver data
    sdf = st.streaming_client_query_agg(st.read_events_stream(spark, out, "/root/testdata/sf0.001"))
    mem = st.run_stream_to_memory(sdf, "update", spark)
    assert mem.count() > 0
    shutil.rmtree(d, ignore_errors=True)

def test_binary_frame_codec_round_trip():
    from dnstap2clickhouse_spark.sources.bridge import (
        decode_binary_frame,
        encode_binary_frame,
    )

    for row in _sample_rows(5):
        assert decode_binary_frame(encode_binary_frame(row)) == row

def test_binary_frames_over_socket(spark):
    """S2/S3: the protobuf-shaped binary wire format through the real
    socket path — frames sniffed per-frame, mixed with JSON."""
    d = tempfile.mkdtemp(prefix="bridge_bin_")
    sock = os.path.join(d, "dnstap.sock")
    out = os.path.join(d, "chunks")
    bridge = SocketBridge(sock, out, readers=2, flush_rows=32)
    bridge.start()
    try:
        rows = _sample_rows(64)
        send_frames(sock, rows[:32], codec="binary")
        send_frames(sock, rows[32:], codec="json")
        deadline = 50
        while bridge.frames_read < 64 and deadline:
            import time

            time.sleep(0.1)
            deadline -= 1
        assert bridge.frames_read == 64
    finally:
        bridge.stop()
    df = spark.read.parquet(out)
    assert df.count() == 64
    got = sorted(
        (r.event_id, r.event_type, r.value) for r in df.collect()
    )
    want = sorted((r["event_id"], r["event_type"], r["value"]) for r in _sample_rows(64))
    assert got == want

def test_unknown_frame_format_raises():
    """Non-JSON/non-binary frames parse as dnstap protobuf; garbage that
    isn't valid protobuf raises a wire-format error rather than yielding
    a bogus row."""
    import pytest

    from dnstap2clickhouse_spark.sources.bridge import _decode_frame

    with pytest.raises(ValueError):
        _decode_frame(b"\x7fGARBAGE")

def test_fstrm_control_frame_codec():
    from dnstap2clickhouse_spark.sources.bridge import (
        FSTRM_FIELD_CONTENT_TYPE,
        FSTRM_READY,
        encode_control_frame,
        parse_control_frame,
    )

    frame = encode_control_frame(FSTRM_READY, (b"protobuf:dnstap.Dnstap", b"application/json"))
    # escape (0) + control length + payload
    assert frame[:4] == b"\x00\x00\x00\x00"
    ctype, cts = parse_control_frame(frame[8:])
    assert ctype == FSTRM_READY
    assert cts == [b"protobuf:dnstap.Dnstap", b"application/json"]


def test_fstrm_bidirectional_handshake(spark):
    """S2: the real framestream exchange — READY/ACCEPT content-type
    negotiation, START, data frames, STOP/FINISH — through the live
    socket, both local content types, mixed with a no-handshake sender."""
    import time

    from dnstap2clickhouse_spark.sources.bridge import send_frames_fstrm

    d = tempfile.mkdtemp(prefix="bridge_fstrm_")
    sock = os.path.join(d, "dnstap.sock")
    out = os.path.join(d, "chunks")
    bridge = SocketBridge(sock, out, readers=2, flush_rows=16)
    bridge.start()
    try:
        rows = _sample_rows(48)
        send_frames_fstrm(sock, rows[:16], content_type=b"application/json")
        send_frames_fstrm(sock, rows[16:32], content_type=b"application/x-bridge-binary")
        send_frames(sock, rows[32:])  # degenerate session still accepted
        deadline = time.time() + 10
        while bridge.frames_read < 48 and time.time() < deadline:
            time.sleep(0.1)
        assert bridge.frames_read == 48
    finally:
        bridge.stop()
    df = spark.read.parquet(out)
    got = sorted((r.event_id, r.event_type, r.value) for r in df.collect())
    want = sorted((r["event_id"], r["event_type"], r["value"]) for r in _sample_rows(48))
    assert got == want
    shutil.rmtree(d, ignore_errors=True)


def test_fstrm_rejects_unaccepted_content_type():
    import pytest

    from dnstap2clickhouse_spark.sources.bridge import send_frames_fstrm

    d = tempfile.mkdtemp(prefix="bridge_rej_")
    sock = os.path.join(d, "dnstap.sock")
    bridge = SocketBridge(sock, os.path.join(d, "chunks"), readers=1)
    bridge.start()
    try:
        with pytest.raises(ConnectionError, match="does not accept"):
            send_frames_fstrm(sock, _sample_rows(1), content_type=b"text/unknown")
    finally:
        bridge.stop()
        shutil.rmtree(d, ignore_errors=True)
