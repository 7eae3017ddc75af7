"""The dnstap decode chain: filters F1-F4 and projections P1-P7.

Reference (``/root/reference/src/dnstap/dnstap.go:212-378``): each protobuf
frame is type-filtered (F1: only ``MESSAGE``; F2: only ``CLIENT_QUERY`` /
``CLIENT_RESPONSE``), null-guarded (F4), its timestamp assembled from
sec+nsec with a fallback (P1), port defaulted (P5), qtype/rcode codes
mapped to names (P3/P4), the DNS question section exploded to one row per
question (P6, dnstap.go:289-307), and projected into a typed row with
``counter=1`` (P7).

The test corpus has no protobuf frames, so ``raw_frames`` synthesizes a
deterministic frame table from ``events`` (both dialects, shared
expression list) including every edge the decode chain must handle:
non-MESSAGE frames, foreign message types, missing payloads, absent
timestamps, absent ports, multi-question messages. The real-wire
ingestion path (unix socket + framestream + protobuf) is a bridge
concern, not a Spark operator — see ``streaming/`` and SURVEY.md
section 2.1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

# P3: qtype code -> name (dns.Type.String, dnstap.go:296/360)
QTYPE_NAMES = {1: "A", 2: "NS", 15: "MX", 16: "TXT", 28: "AAAA"}
# P4: rcode -> status name — the FULL dns.RcodeToString table (miekg/dns,
# public; dnstap.go:350). Unlike qtype (dns.Type.String falls back to
# 'TYPE<n>'), a Go map lookup on a missing rcode yields the zero value ""
# — so the rcode fallback is the empty string, not 'TYPE<n>'.
RCODE_NAMES = {
    0: "NOERROR",
    1: "FORMERR",
    2: "SERVFAIL",
    3: "NXDOMAIN",
    4: "NOTIMP",
    5: "REFUSED",
    6: "YXDOMAIN",
    7: "YXRRSET",
    8: "NXRRSET",
    9: "NOTAUTH",
    10: "NOTZONE",
    16: "BADVERS",
    17: "BADKEY",
    18: "BADTIME",
    19: "BADMODE",
    20: "BADNAME",
    21: "BADALG",
    22: "BADTRUNC",
    23: "BADCOOKIE",
}

#: P1 fallback for frames without a wire timestamp (reference uses
#: time.Now(), dnstap.go:264-267 — non-deterministic; pinned for tests)
FALLBACK_EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z

def _frame_exprs(dialect: str) -> list[str]:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    idiv = "div" if dialect == "spark" else "//"
    us = "unix_micros(ts)" if dialect == "spark" else "epoch_us(ts)"
    arr2 = "array({0}, {1})" if dialect == "spark" else "[{0}, {1}]"
    arr1 = "array({0})" if dialect == "spark" else "[{0}]"
    q1 = f"'host' || CAST(event_id % 1000 AS {s}) || '.example.com.'"
    q2 = f"'alt' || CAST(event_id % 100 AS {s}) || '.example.org.'"
    return [
        "event_id",
        # F1 fodder: a sliver of non-MESSAGE frames
        f"CASE WHEN event_id % 97 = 0 THEN 'OTHER' ELSE 'MESSAGE' END AS frameType",
        # F2 fodder: mostly client query/response, some foreign kinds
        "CASE WHEN event_id % 89 = 0 THEN 'FORWARDER_QUERY' "
        "WHEN event_id % 2 = 0 THEN 'CLIENT_QUERY' ELSE 'CLIENT_RESPONSE' END AS messageType",
        # F4 fodder: missing payload
        "event_id % 83 <> 0 AS hasPayload",
        # P1 inputs: sec+nsec, occasionally absent
        f"CASE WHEN event_id % 101 = 0 THEN NULL ELSE {us} {idiv} 1000000 END AS timeSec",
        f"CASE WHEN event_id % 101 = 0 THEN NULL ELSE ({us} % 1000000) * 1000 END AS timeNsec",
        f"'ns' || CAST(user_id % 3 AS {s}) AS identity",
        f"'10.0.' || CAST(user_id % 32 AS {s}) || '.' || CAST(user_id % 251 AS {s}) AS queryAddress",
        # P5 fodder: absent port
        "CASE WHEN event_id % 53 = 0 THEN NULL ELSE CAST(1024 + event_id % 60000 AS BIGINT) END AS queryPort",
        # P3 input: numeric qtype code
        "CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 28 "
        "WHEN 'purchase' THEN 15 WHEN 'signup' THEN 2 ELSE 16 END AS qtypeCode",
        # P4 input: numeric rcode (odd residues — responses are odd ids)
        "CASE WHEN event_id % 20 = 1 THEN 3 WHEN event_id % 20 = 3 THEN 2 "
        "WHEN event_id % 20 = 5 THEN 5 ELSE 0 END AS rcode",
        f"CAST(event_id % 65536 AS BIGINT) AS id",
        # P6 input: question-section names, sometimes two per message
        f"CASE WHEN event_id % 10 = 0 THEN {arr2.format(q1, q2)} "
        f"ELSE {arr1.format(q1)} END AS questionNames",
        # P2 input: client address as raw 4 bytes (dnstap carries IPs as
        # bytes; dnstap.go:292/355 renders with net.IP.String())
        f"unhex('0a00' || lpad(hex(user_id % 32), 2, '0') || lpad(hex(user_id % 251), 2, '0')) AS addrBytes",
    ]

def raw_frames(spark: SparkSession, sf_dir: str, events: DataFrame | None = None) -> DataFrame:
    """Deterministic synthetic decoded-protobuf frame table."""
    ev = events if events is not None else load_table(spark, sf_dir, "events")
    return ev.selectExpr(*_frame_exprs("spark"))

RAW_FRAMES_SQL = "SELECT " + ",\n       ".join(_frame_exprs("duckdb")) + "\nFROM events"

def _case_from_map(
    col: str, mapping: dict[int, str], fallback: str = "'TYPE' || CAST({col} AS VARCHAR)"
) -> str:
    whens = " ".join(f"WHEN {k} THEN '{v}'" for k, v in sorted(mapping.items()))
    return f"CASE {col} {whens} ELSE {fallback.format(col=col)} END"

def decode_frames(frames: DataFrame, kind: str) -> DataFrame:
    """F1->F2->F4 filters, then P1/P3/P4/P5/P6/P7 projections.

    kind: 'CLIENT_QUERY' | 'CLIENT_RESPONSE'. Returns the Query/Response
    row schema (aggregator.go:55-64 / 75-86) with time column named
    queryTime/responseTime respectively.
    """
    time_col = "queryTime" if kind == "CLIENT_QUERY" else "responseTime"
    # P3 via a map literal kept JVM-side (broadcast-free: it's a constant
    # expression folded by Catalyst, the Spark analogue of the in-process
    # lookup table dns.Type.String)
    qtype_map = F.create_map(
        *[F.lit(x) for kv in QTYPE_NAMES.items() for x in kv]
    )
    out = (
        frames.filter(F.col("frameType") == "MESSAGE")  # F1 dnstap.go:242-244
        .filter(F.col("messageType") == kind)  # F2 dnstap.go:251-252
        .filter(F.col("hasPayload"))  # F4 dnstap.go:256-259
        .select(
            # P1: sec+nsec -> timestamp, fallback when absent (dnstap.go:260-268)
            F.timestamp_micros(
                F.coalesce(
                    F.col("timeSec") * F.lit(1_000_000)
                    + F.expr("timeNsec div 1000"),
                    F.lit(FALLBACK_EPOCH_US),
                )
            ).alias(time_col),
            F.col("identity"),
            F.col("queryAddress"),
            # P5: nil port -> 0 (dnstap.go:270-273)
            F.coalesce(F.col("queryPort"), F.lit(0)).alias("queryPort"),
            # unknown codes fall back to 'TYPE<n>' (dns.Type.String semantics)
            F.coalesce(
                F.element_at(qtype_map, F.col("qtypeCode")),
                F.concat(F.lit("TYPE"), F.col("qtypeCode").cast("string")),
            ).alias("questionType"),
            F.col("rcode"),
            F.col("id"),
            F.col("questionNames"),
        )
    )
    # P6: explode the question section (dnstap.go:289-307) — one row per
    # question, each with counter 1 (P7)
    out = out.withColumn("questionName", F.explode("questionNames")).drop("questionNames")
    cols = [time_col, "identity", "queryAddress", "queryPort", "questionName", "questionType", "id"]
    if kind == "CLIENT_RESPONSE":
        # P4 + success flag (dnstap.go:345-350); unmapped rcode -> "" (the
        # Go-map zero value dns.RcodeToString yields), NOT 'TYPE<n>'
        rcode_case = F.create_map(*[F.lit(x) for kv in RCODE_NAMES.items() for x in kv])
        out = out.withColumn(
            "responseStatus",
            F.coalesce(F.element_at(rcode_case, F.col("rcode")), F.lit("")),
        )
        out = out.withColumn("isSuccess", F.col("responseStatus") == "NOERROR")
        cols += ["responseStatus", "isSuccess"]
    return out.select(*cols, F.lit(1).cast("long").alias("counter"))

def _ip_to_string(col: str, dialect: str) -> str:
    """P2: 4-byte binary address -> dotted-quad string (net.IP.String(),
    dnstap.go:292) using only built-in byte/hex functions."""
    conv = (
        (lambda i: f"CAST(conv(substring(hex({col}), {2 * i + 1}, 2), 16, 10) AS BIGINT)")
        if dialect == "spark"
        else (lambda i: f"('0x' || substr(hex({col}), {2 * i + 1}, 2))::BIGINT")
    )
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return " || '.' || ".join(f"CAST({conv(i)} AS {s})" for i in range(4))

def decode_addresses(frames: DataFrame) -> DataFrame:
    """P2 as a standalone op: raw address bytes -> dotted-quad text."""
    return frames.selectExpr(
        "event_id",
        f"{_ip_to_string('addrBytes', 'spark')} AS clientAddress",
    )

def decode_addresses_sql() -> str:
    return (
        f"SELECT event_id, {_ip_to_string('addrBytes', 'duckdb')} AS clientAddress\n"
        f"FROM ({RAW_FRAMES_SQL})"
    )

def decode_frames_sql(kind: str) -> str:
    time_col = "queryTime" if kind == "CLIENT_QUERY" else "responseTime"
    qtype_case = _case_from_map("qtypeCode", QTYPE_NAMES)
    cols = [
        f"make_timestamp(coalesce(timeSec * 1000000 + timeNsec // 1000, {FALLBACK_EPOCH_US})) AS {time_col}",
        "identity",
        "queryAddress",
        "coalesce(queryPort, 0) AS queryPort",
        "unnest(questionNames) AS questionName",
        f"{qtype_case} AS questionType",
        "id",
    ]
    if kind == "CLIENT_RESPONSE":
        rcode_case = _case_from_map("rcode", RCODE_NAMES, fallback="''")
        cols += [f"{rcode_case} AS responseStatus", f"({rcode_case}) = 'NOERROR' AS isSuccess"]
    cols.append("CAST(1 AS BIGINT) AS counter")
    sel = ",\n       ".join(cols)
    inner = (
        f"SELECT * FROM ({RAW_FRAMES_SQL})\n"
        f"WHERE frameType = 'MESSAGE' AND messageType = '{kind}' AND hasPayload"
    )
    # reorder: unnest must be in the outer select; project then reorder to
    # put questionName before questionType like the Spark side
    outer = f"SELECT {sel} FROM ({inner})"
    final_cols = [time_col, "identity", "queryAddress", "queryPort", "questionName", "questionType", "id"]
    if kind == "CLIENT_RESPONSE":
        final_cols += ["responseStatus", "isSuccess"]
    final_cols.append("counter")
    return f"SELECT {', '.join(final_cols)} FROM ({outer})"
