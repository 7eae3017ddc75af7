"""dnstap socket bridge: the S1-S5 ingestion path (SURVEY.md section 2.1).

The reference ingests dnstap directly: a unix-socket listener with
exponential-backoff retry and socket chmod (S1, dnstap.go:90-153), a
bidirectional framestream reader per connection (S2, dnstap.go:192-203),
protobuf decode (S3, dnstap.go:205-233), DNS wire-format unpack (S4,
dnstap.go:275-281/331-337), and N reader goroutines fanning in from one
connection channel (S5, dnstap.go:164-210, cap MAX_READERS=32).

Structured Streaming has no unix-socket source, and none is the idiomatic
answer: the Spark-native shape is a small *bridge daemon* that tails the
socket into parquet chunk files (or Kafka), which
``streaming.read_events_stream`` consumes with exactly-once file-source
semantics. This module is that daemon, with the reference's operational
behaviors preserved:

- S1: listener with the reference's backoff ladder (1,3,7,...s capped at
  60 — dnstap.go:112-124) while the socket directory doesn't exist, and
  chmod 0660 on the bound socket (dnstap.go:130-133);
- S2: a length-prefixed frame protocol per connection. The production
  protocol is framestream with a bidirectional handshake — that handshake
  is a transport detail; the plug point is ``_read_frames``;
- S3/S4: frames carry JSON event rows here. In production this is dnstap
  protobuf (decode with the generated classes, or ship raw bytes and use
  ``from_protobuf`` in Spark 3.4+) + DNS wire unpack (dnspython in a
  pandas UDF, or bridge-side). The plug point is ``_decode_frame``;
- S5: a bounded pool of reader threads drains accepted connections from
  one queue (the reference's conn channel, cap 1 — dnstap.go:72).
"""

from __future__ import annotations

import json
import os
import queue
import socket
import stat
import struct
import threading
import time
import uuid
from collections.abc import Iterator

import pyarrow as pa
import pyarrow.parquet as pq

MAX_READERS = 32  # dnstap.go:38
_FRAME_HEADER = struct.Struct(">I")  # 4-byte big-endian length prefix

def backoff_delays(cap: int = 60) -> Iterator[int]:
    """The reference's retry ladder: 1, 3, 7, 15, 31, 60, 60, ...
    (delay = delay*2 + 1 capped — dnstap.go:112-124)."""
    d = 1
    while True:
        yield d
        d = min(d * 2 + 1, cap)

def _decode_frame(payload: bytes) -> dict:
    """S3/S4 plug point: frame bytes -> event row dict.

    Production: dnstap protobuf decode + DNS wire unpack. Bridge format:
    JSON with the events-table schema (event_id, ts_us, user_id,
    event_type, value, props).
    """
    return json.loads(payload)

class SocketBridge:
    """Unix-socket -> parquet-chunk bridge daemon."""

    def __init__(
        self,
        socket_path: str,
        out_dir: str,
        readers: int = 2,
        flush_rows: int = 1000,
    ) -> None:
        if readers > MAX_READERS:
            readers = MAX_READERS  # dnstap.go:38 hard cap
        self.socket_path = socket_path
        self.out_dir = out_dir
        self.readers = readers
        self.flush_rows = flush_rows
        self._conns: queue.Queue[socket.socket | None] = queue.Queue(maxsize=1)  # dnstap.go:72
        self._rows: list[dict] = []
        self._rows_lock = threading.Lock()
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._server: socket.socket | None = None
        self.frames_read = 0  # A11-style stage counter (dnstap.go:380-386)

    # ------------------------------------------------------------- listen
    def start(self) -> None:
        os.makedirs(self.out_dir, exist_ok=True)
        sock_dir = os.path.dirname(self.socket_path)
        for delay in backoff_delays():
            if os.path.isdir(sock_dir):
                break
            if self._stop.wait(delay):  # S1 backoff while dir absent
                return
        if os.path.exists(self.socket_path):
            os.unlink(self.socket_path)
        self._server = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._server.bind(self.socket_path)
        os.chmod(self.socket_path, stat.S_IRUSR | stat.S_IWUSR | stat.S_IRGRP | stat.S_IWGRP)  # 0660
        self._server.listen()
        self._server.settimeout(0.2)
        self._threads.append(threading.Thread(target=self._accept_loop, daemon=True))
        for _ in range(self.readers):  # S5 fan-in pool
            self._threads.append(threading.Thread(target=self._read_loop, daemon=True))
        for t in self._threads:
            t.start()

    def _accept_loop(self) -> None:
        assert self._server is not None
        while not self._stop.is_set():
            try:
                conn, _ = self._server.accept()
            except TimeoutError:
                continue
            except OSError:
                break
            self._conns.put(conn)

    # ------------------------------------------------------------- read
    def _read_frames(self, conn: socket.socket) -> Iterator[bytes]:
        """S2 plug point: one frame per length-prefixed record."""
        buf = b""
        conn.settimeout(0.2)
        while not self._stop.is_set():
            while len(buf) >= _FRAME_HEADER.size:
                (n,) = _FRAME_HEADER.unpack_from(buf)
                if len(buf) < _FRAME_HEADER.size + n:
                    break
                yield buf[_FRAME_HEADER.size : _FRAME_HEADER.size + n]
                buf = buf[_FRAME_HEADER.size + n :]
            try:
                chunk = conn.recv(65536)
            except TimeoutError:
                continue
            except OSError:
                return
            if not chunk:
                return
            buf += chunk

    def _read_loop(self) -> None:
        while not self._stop.is_set():
            try:
                conn = self._conns.get(timeout=0.2)
            except queue.Empty:
                continue
            if conn is None:
                return
            with conn:
                for payload in self._read_frames(conn):
                    row = _decode_frame(payload)
                    with self._rows_lock:
                        self._rows.append(row)
                        self.frames_read += 1
                        if len(self._rows) >= self.flush_rows:
                            self._flush_locked()

    # ------------------------------------------------------------- write
    def _flush_locked(self) -> None:
        if not self._rows:
            return
        rows, self._rows = self._rows, []
        table = pa.Table.from_pylist(rows).cast(
            pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("ts_us", pa.int64()),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                    ("props", pa.string()),
                ]
            )
        )
        # micros -> timestamp column matching the events table schema
        table = table.set_column(
            1, "ts", table.column("ts_us").cast(pa.timestamp("us"))
        )
        pq.write_table(table, os.path.join(self.out_dir, f"chunk-{uuid.uuid4().hex}.parquet"))

    def flush(self) -> None:
        with self._rows_lock:
            self._flush_locked()

    def stop(self) -> None:
        self._stop.set()
        for t in self._threads:
            t.join(timeout=5)
        if self._server is not None:
            self._server.close()
        if os.path.exists(self.socket_path):
            os.unlink(self.socket_path)
        self.flush()

def send_frames(socket_path: str, rows: list[dict], retries: int = 20) -> None:
    """Test client: connect and send rows as length-prefixed JSON frames."""
    last: Exception | None = None
    for _ in range(retries):
        try:
            c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            c.connect(socket_path)
            break
        except OSError as exc:
            last = exc
            time.sleep(0.1)
    else:
        raise last or OSError("connect failed")
    with c:
        for row in rows:
            payload = json.dumps(row).encode()
            c.sendall(_FRAME_HEADER.pack(len(payload)) + payload)
