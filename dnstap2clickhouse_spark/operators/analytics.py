"""Q1-Q4: the documented downstream analytics surface.

These are the Grafana queries the reference's output schema is designed to
serve (quickstart.md:99-154) — the engine's flagship correctness queries
(SURVEY.md section 3.4). Each takes the corresponding output table
DataFrame. Deterministic tiebreaks are added to every ORDER BY ... LIMIT
so result *sets* are stable under parallel execution (the quickstart SQL
relies on ClickHouse's arbitrary tie order).

Scale note: all four are single-table aggregations over the already
pre-aggregated output tables — orders of magnitude smaller than the raw
stream. Top-k uses ``orderBy().limit()`` which Spark executes as
TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import GROUPBY_TAG

def top_query_addresses(client_query: DataFrame, limit: int = 10) -> DataFrame:
    """Q1 (quickstart.md:101-112): top addresses by total query count."""
    return (
        client_query.filter(
            (F.col("questionName") == GROUPBY_TAG) & (F.col("queryAddress") != GROUPBY_TAG)
        )
        .groupBy("queryAddress")
        .agg(F.sum("counter").alias("values"))
        .orderBy(F.desc("values"), "queryAddress")
        .limit(limit)
    )

def top_query_addresses_sql(client_query_sql: str, limit: int = 10) -> str:
    return (
        f"SELECT queryAddress, CAST(sum(counter) AS BIGINT) AS values\n"
        f"FROM ({client_query_sql})\n"
        f"WHERE questionName = '{GROUPBY_TAG}' AND queryAddress <> '{GROUPBY_TAG}'\n"
        f"GROUP BY queryAddress ORDER BY values DESC, queryAddress LIMIT {limit}"
    )

def top_query_addresses_salted(client_query: DataFrame, limit: int = 10) -> DataFrame:
    """Q1 through the skew-spread two-stage aggregation
    (``operators.skew.salted_agg``) — identical results by construction
    (sum is associative), shares Q1's oracle. The variant a 100 TB
    deployment uses when one address dominates the traffic."""
    from .skew import salted_agg

    filtered = client_query.filter(
        (F.col("questionName") == GROUPBY_TAG) & (F.col("queryAddress") != GROUPBY_TAG)
    )
    return (
        salted_agg(filtered, ["queryAddress"], {"counter": "sum"})
        .select("queryAddress", F.col("counter").alias("values"))
        .orderBy(F.desc("values"), "queryAddress")
        .limit(limit)
    )

def top_nxdomain_names(client_response: DataFrame, limit: int = 10) -> DataFrame:
    """Q2 (quickstart.md:114-127): top NXDOMAIN names, concat display key."""
    return (
        client_response.filter(
            (F.col("responseStatus") == "NXDOMAIN") & (F.col("queryAddress") == GROUPBY_TAG)
        )
        .groupBy("responseStatus", "questionName", "questionType")
        .agg(F.sum("counter").alias("values"))
        .select(
            F.concat_ws(" ", "questionName", "questionType").alias("name"),
            "values",
        )
        .orderBy(F.desc("values"), "name")
        .limit(limit)
    )

def top_nxdomain_names_sql(client_response_sql: str, limit: int = 10) -> str:
    return (
        f"SELECT questionName || ' ' || questionType AS name,\n"
        f"       CAST(sum(counter) AS BIGINT) AS values\n"
        f"FROM ({client_response_sql})\n"
        f"WHERE responseStatus = 'NXDOMAIN' AND queryAddress = '{GROUPBY_TAG}'\n"
        f"GROUP BY responseStatus, questionName, questionType\n"
        f"ORDER BY values DESC, name LIMIT {limit}"
    )

def non_ok_time_series(client_response: DataFrame, bucket: str = "5 minutes") -> DataFrame:
    """Q3 (quickstart.md:129-141): non-OK responses bucketed time series."""
    return (
        client_response.filter(F.col("queryAddress") == GROUPBY_TAG)
        .groupBy(
            F.window("responseTime", bucket).alias("__w"),
            "responseStatus",
            "questionName",
            "questionType",
        )
        .agg(F.sum("counter").alias("values"))
        .select(
            F.col("__w.start").alias("bucket"),
            F.concat_ws(" ", "responseStatus", "questionName", "questionType").alias("name"),
            "values",
        )
        .orderBy("bucket", "name")
    )

def non_ok_time_series_sql(client_response_sql: str, bucket_s: int = 300) -> str:
    return (
        f"SELECT time_bucket(INTERVAL '{bucket_s} seconds', responseTime) AS bucket,\n"
        f"       responseStatus || ' ' || questionName || ' ' || questionType AS name,\n"
        f"       CAST(sum(counter) AS BIGINT) AS values\n"
        f"FROM ({client_response_sql})\n"
        f"WHERE queryAddress = '{GROUPBY_TAG}'\n"
        f"GROUP BY ALL ORDER BY bucket, name"
    )

def response_time_series(response_time: DataFrame, bucket: str = "1 minute") -> DataFrame:
    """Q4 (quickstart.md:143-154): average latency per identity over time.

    The inner table rows are per-sample-window integer averages; Grafana
    averages them again per display bucket. The outer average divides two
    exact integers — bit-identical across engines.
    """
    return (
        response_time.groupBy(F.window("windowStart", bucket).alias("__w"), "identity")
        .agg(
            (F.sum("responseTimeDelta") / F.count(F.lit(1))).alias("avgDelta")
        )
        .select(F.col("__w.start").alias("bucket"), "identity", "avgDelta")
        .orderBy("bucket", "identity")
    )

def response_time_series_sql(response_time_sql: str, bucket_s: int = 60) -> str:
    return (
        f"SELECT time_bucket(INTERVAL '{bucket_s} seconds', windowStart) AS bucket,\n"
        f"       identity,\n"
        f"       CAST(sum(responseTimeDelta) AS BIGINT) / count(*) AS avgDelta\n"
        f"FROM ({response_time_sql})\n"
        f"GROUP BY ALL ORDER BY bucket, identity"
    )


# ------------------------------------------------- qname DGA features

QNAME_TOP = 25  # suspicious names surfaced

def _qname_feature_exprs(dialect: str) -> list[str]:
    """Per-qname lexical features, all exact integers so the ranking is
    bit-portable (the `text_keyword_search` discipline — no libm): name
    and first-label lengths, digit count, label count, digit share in
    millionths, and a composite suspicion score. Real DGA detection
    layers an entropy / bigram model on top (public literature:
    Antonakakis et al. 2012's lexical feature family); on this corpus's
    synthetic names the entry pins the feature mechanics and the
    deterministic ranking, not detector quality."""
    digits = (
        "length(questionName) - length(regexp_replace(questionName, '[0-9]', ''))"
        if dialect == "spark"
        else "length(questionName) - length(regexp_replace(questionName, '[0-9]', '', 'g'))"
    )
    return [
        "questionName AS qname",
        "CAST(sum(counter) AS BIGINT) AS n_queries",
        "CAST(length(questionName) AS BIGINT) AS name_len",
        f"CAST({digits} AS BIGINT) AS n_digits",
        # trailing-dot FQDNs: #labels == #dots
        "CAST(length(questionName) - length(replace(questionName, '.', '')) AS BIGINT) AS n_labels",
        "CAST(instr(questionName, '.') - 1 AS BIGINT) AS first_label_len",
        f"CAST(({digits}) * 1000000 {'div' if dialect == 'spark' else '//'} length(questionName) AS BIGINT) AS digit_share_e6",
    ]

def _qname_score_expr(dialect: str) -> str:
    d = "div" if dialect == "spark" else "//"
    return (
        f"digit_share_e6 * 2 + CASE WHEN first_label_len >= 12 THEN 300000 ELSE 0 END"
        f" + (CAST(1000000 AS BIGINT) {d} (n_labels + 1))"
    )

def qname_features(client_query: DataFrame) -> DataFrame:
    """Top-`QNAME_TOP` suspicious query names by integer lexical score —
    the DGA-triage surface a DNS-telemetry store serves. One
    (qname)-keyed aggregate with map-side partials (features are
    functions of the group key — computed once per group, mapper-side),
    then TakeOrderedAndProject; nothing corpus-squared."""
    exprs = _qname_feature_exprs("spark")
    return (
        client_query.groupBy("questionName")
        .agg(F.expr("CAST(sum(counter) AS BIGINT)").alias("n_queries"))
        .selectExpr(
            *[e for e in exprs if not e.startswith("CAST(sum")],
            "n_queries",
        )
        .selectExpr("*", f"CAST({_qname_score_expr('spark')} AS BIGINT) AS score_e6")
        .orderBy(F.desc("score_e6"), F.desc("n_queries"), "qname")
        .limit(QNAME_TOP)
    )

def qname_features_sql(client_query_sql: str) -> str:
    exprs = _qname_feature_exprs("duckdb")
    sel = ",\n       ".join(e for e in exprs if not e.startswith("CAST(sum"))
    return f"""
SELECT *, CAST({_qname_score_expr('duckdb')} AS BIGINT) AS score_e6
FROM (
  SELECT {sel},
         CAST(sum(counter) AS BIGINT) AS n_queries
  FROM ({client_query_sql})
  GROUP BY questionName)
ORDER BY score_e6 DESC, n_queries DESC, qname
LIMIT {QNAME_TOP}
"""


# --------------------------------------------- HITS over client->qname

HITS_TOP = 20


def _hits_body(src: str) -> str:
    """HITS (Kleinberg 1999) on the bipartite client -> questionName
    graph of the CLIENT_QUERY stream, two exact iterations: a1 = qname
    indegree (hubs initialized to 1), h1 = per-client sum of its
    qnames' a1, a2 = per-qname sum of its clients' h1. Emits the
    top-``HITS_TOP`` authorities — "which names do the busiest
    resolvers concentrate on", the mutual-reinforcement ranking plain
    indegree (Q1/Q2's shape) can't express: a qname asked by ten
    one-shot clients outranks one asked by ten narrow clients only
    under HITS. Shared verbatim by both engines (no dialect split).

    Determinism: integers end-to-end — iterations are UNNORMALIZED
    (values bounded by |E|^2, fine for two rounds; a production run at
    100 TB adds the standard per-round max-normalization, which is one
    more 1-row broadcast per round). Scale shape: the DISTINCT edge
    set is one (client, qname) shuffle; each half-iteration is one
    vertex-keyed equi-join + aggregate (exactly the CC/pagerank round
    shape); top-k is TakeOrderedAndProject.
    """
    return f"""
WITH edges AS (
  SELECT DISTINCT queryAddress AS client, questionName AS qname
  FROM ({src}) s),
a1 AS (
  SELECT qname, CAST(count(*) AS BIGINT) AS indegree
  FROM edges GROUP BY qname),
h1 AS (
  SELECT e.client, CAST(sum(a.indegree) AS BIGINT) AS hub
  FROM edges e JOIN a1 a ON e.qname = a.qname GROUP BY e.client),
a2 AS (
  SELECT e.qname, CAST(sum(h.hub) AS BIGINT) AS authority
  FROM edges e JOIN h1 h ON e.client = h.client GROUP BY e.qname)
SELECT a.qname AS questionName, a1.indegree, a.authority
FROM a2 a JOIN a1 ON a1.qname = a.qname
ORDER BY a.authority DESC, questionName
LIMIT {HITS_TOP}
"""


def hits_authority(spark, sf_dir: str) -> DataFrame:
    """Top DNS authorities by 2-iteration HITS over client->qname."""
    from ..sources.events import dns_query_stream

    dns_query_stream(spark, sf_dir).createOrReplaceTempView("dns_hits_src")
    return spark.sql(_hits_body("SELECT * FROM dns_hits_src"))


def hits_authority_sql() -> str:
    from ..sources.events import QUERY_STREAM_SQL

    return _hits_body(QUERY_STREAM_SQL)


# --------------------------------------------- resolver-cache simulation

CACHE_TTL_S = 604_800  # BIND's default max-cache-ttl cap (7 days)


def _cache_hit_body(src: str, dialect: str) -> str:
    """Resolver-cache hit simulation: replay the CLIENT_QUERY stream
    against a per-client cache — a query is a HIT when the same
    (queryAddress, questionName) was queried within ``CACHE_TTL_S``
    seconds before it (the stub-resolver model: every miss refreshes
    the record, so hit-vs-miss is exactly a lag() within-TTL test; the
    TTL is BIND's default max-cache-ttl cap, the right horizon for the
    fixture corpus's 30-day event span).
    Emits per-client hit/miss totals + exact e6 hit ratio — the
    cache-efficiency readout a resolver operator sizes caches with,
    and the negative-cache/TTL-tuning instrument the reference's
    Grafana surface implies but cannot compute in one pass.

    Determinism: the replay order is (queryTime, queryPort) — the port
    derives from event_id, so the tiebreak is total. At the smallest
    test scale every questionName occurs once and the honest answer is
    0 hits everywhere; repeats (and hits) appear from sf0.01 up.

    Scale shape: ONE (client, qname)-keyed window sort — the lag is
    computed inside each key's partition, state is one row deep (the
    previous sighting), and the per-client rollup is a second
    client-keyed aggregate over already-reduced rows. The streaming
    twin is dropDuplicatesWithinWatermark semantics with a TTL
    watermark; here the batch replay is exact.
    """
    us = "unix_micros(queryTime)" if dialect == "spark" else "epoch_us(queryTime)"
    idiv = "div" if dialect == "spark" else "//"
    return f"""
WITH q AS (
  SELECT queryAddress, questionName, {us} AS t_us, queryPort
  FROM ({src}) s),
lagged AS (
  SELECT queryAddress,
         t_us - lag(t_us) OVER (
           PARTITION BY queryAddress, questionName
           ORDER BY t_us, queryPort) AS gap_us
  FROM q),
flags AS (
  SELECT queryAddress,
         CASE WHEN gap_us IS NOT NULL
                   AND gap_us <= {CACHE_TTL_S * 1_000_000}
              THEN 1 ELSE 0 END AS hit
  FROM lagged)
SELECT queryAddress,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(sum(hit) AS BIGINT) AS n_hits,
       CAST((sum(hit) * 1000000) {idiv} count(*) AS BIGINT) AS hit_ratio_e6
FROM flags
GROUP BY queryAddress
ORDER BY queryAddress
"""


def cache_hit_sim(spark, sf_dir: str) -> DataFrame:
    """Per-client simulated resolver-cache hit totals and ratio."""
    from ..sources.events import dns_query_stream

    dns_query_stream(spark, sf_dir).createOrReplaceTempView("dns_cache_src")
    return spark.sql(_cache_hit_body("SELECT * FROM dns_cache_src", "spark"))


def cache_hit_sim_sql() -> str:
    from ..sources.events import QUERY_STREAM_SQL

    return _cache_hit_body(QUERY_STREAM_SQL, "duckdb")


# --------------------------------------------- traffic mix drift

DRIFT_FLAG_E6 = 10_000  # flag a qtype whose share moved >= 1 pp


def _traffic_drift_body(src: str, dialect: str) -> str:
    """Query-type MIX drift between the first and second half of the
    observation window — the traffic-change alarm a resolver operator
    watches (an NXDOMAIN/TXT share spike is the classic tunneling/DGA
    symptom; `dns_qname_features` triages names, this watches the
    mix): per questionType, both halves' counts and exact e6 shares,
    the absolute share drift (the qtype's contribution to total
    variation distance — TVD = sum(drift)/2), and a >= 1pp flag. The
    midpoint is derived in-query from the stream's own span, so the
    entry survives corpus regeneration. Everything is an exact
    integer; no chi-square statistic is materialized, so no
    cross-multiplication can overflow at any corpus scale (the
    `events_ab_test` boolean keeps that form for the 2x2 case).

    Scale shape: one 1-row span aggregate (broadcast), one narrow
    half-assignment map, one (qtype, half) aggregate with map-side
    partials onto a <= 2x|qtypes| table; shares and drift are windows
    over that tiny table.
    """
    us = "unix_micros(queryTime)" if dialect == "spark" else "epoch_us(queryTime)"
    idiv = "div" if dialect == "spark" else "//"
    return f"""
WITH q AS (SELECT questionType, {us} AS t_us FROM ({src}) s),
b AS (SELECT min(t_us) + (max(t_us) - min(t_us)) {idiv} 2 AS mid FROM q),
halves AS (
  SELECT q.questionType,
         CASE WHEN q.t_us < b.mid THEN 0 ELSE 1 END AS h
  FROM q CROSS JOIN b),
counts AS (
  SELECT questionType,
         CAST(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
         CAST(sum(CASE WHEN h = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_second
  FROM halves GROUP BY questionType),
shares AS (
  SELECT questionType, n_first, n_second,
         (n_first * 1000000) {idiv} sum(n_first) OVER () AS share_first_e6,
         (n_second * 1000000) {idiv} sum(n_second) OVER () AS share_second_e6
  FROM counts)
SELECT questionType, n_first, n_second,
       CAST(share_first_e6 AS BIGINT) AS share_first_e6,
       CAST(share_second_e6 AS BIGINT) AS share_second_e6,
       CAST(abs(share_first_e6 - share_second_e6) AS BIGINT) AS drift_e6,
       CAST(abs(share_first_e6 - share_second_e6) >= {DRIFT_FLAG_E6}
            AS BOOLEAN) AS drifted
FROM shares
ORDER BY questionType
"""


def traffic_drift(spark, sf_dir: str) -> DataFrame:
    """Per-qtype first/second-half shares + TVD contribution + flag."""
    from ..sources.events import dns_query_stream

    dns_query_stream(spark, sf_dir).createOrReplaceTempView("dns_drift_src")
    return spark.sql(_traffic_drift_body("SELECT * FROM dns_drift_src", "spark"))


def traffic_drift_sql() -> str:
    from ..sources.events import QUERY_STREAM_SQL

    return _traffic_drift_body(QUERY_STREAM_SQL, "duckdb")


# --------------------------------------------- latency heatmap

HEATMAP_BUCKET_US = 60_000_000  # 1-minute latency buckets (delta <= 10 min)


def hit_latency_heatmap(spark, sf_dir: str) -> DataFrame:
    """Latency HEATMAP — the (time, latency-bucket, count) surface the
    Grafana heatmap panel renders (Q4 gives the mean latency series;
    operators diagnose tail behavior from the distribution per time
    slice, which a mean hides): every matched query/response pair from
    the J1 banded join, bucketed by hour-since-window-start and
    1-minute latency band. Exact integers; the hour origin is the
    matched stream's own min, so the entry survives corpus
    regeneration.

    Scale shape: inherits the banded J1 join's scale story
    (operators/join.py — probe width O(one interval's occupancy)),
    then ONE (hour, bucket) aggregate with map-side partials onto a
    bounded grid (hours x 10 latency bands); the origin is a 1-row
    broadcast.
    """
    from pyspark.sql import functions as F

    from ..operators.dns_pipeline import dns_pair_streams
    from ..operators.join import match_response_times

    q, r = dns_pair_streams(spark, sf_dir)
    matched = match_response_times(q, r).select(
        F.expr("unix_micros(responseTime)").alias("t_us"), "delta_us"
    )
    matched.createOrReplaceTempView("heatmap_matched")
    return spark.sql(f"""
WITH b AS (SELECT min(t_us) AS t0 FROM heatmap_matched),
g AS (
  SELECT (m.t_us - b.t0) div 3600000000 AS hour_idx,
         m.delta_us div {HEATMAP_BUCKET_US} AS delta_min
  FROM heatmap_matched m CROSS JOIN b)
SELECT CAST(hour_idx AS BIGINT) AS hour_idx,
       CAST(delta_min AS BIGINT) AS delta_min,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM g GROUP BY hour_idx, delta_min
ORDER BY hour_idx, delta_min
""")


def hit_latency_heatmap_sql() -> str:
    from ..operators.join import match_response_times_sql
    from ..sources.events import PAIR_QUERY_SQL, PAIR_RESPONSE_SQL

    matched = match_response_times_sql(PAIR_QUERY_SQL, PAIR_RESPONSE_SQL)
    return f"""
WITH m AS (SELECT epoch_us(responseTime) AS t_us, delta_us FROM ({matched}) x),
b AS (SELECT min(t_us) AS t0 FROM m),
g AS (
  SELECT (m.t_us - b.t0) // 3600000000 AS hour_idx,
         m.delta_us // {HEATMAP_BUCKET_US} AS delta_min
  FROM m CROSS JOIN b)
SELECT CAST(hour_idx AS BIGINT) AS hour_idx,
       CAST(delta_min AS BIGINT) AS delta_min,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM g GROUP BY hour_idx, delta_min
ORDER BY hour_idx, delta_min
"""


# --------------------------------------------- name-hierarchy rollup


def _name_rollup_body(src: str, dialect: str) -> str:
    """DNS name-hierarchy ROLLUP: query counts at TLD, second-level
    domain, and full-name grain in ONE pass via native ROLLUP — the
    hypertable/zone rollup a DNS analytics store materializes (and the
    GROUPING SETS machinery §2's A2-A4 uses, exercised here through
    the hierarchy special case). Grouping-null levels are collapsed to
    the `__ANY__` tag exactly like the reference's grouping-set rows
    (aggregator.go's __ANY__ convention), so every row is hash-stable.

    Scale shape: label parsing is a narrow mapper; ROLLUP expands each
    row into 4 grouping rows feeding ONE shuffle with map-side
    partials (identical cost model to the A2-A4 explode-variant).
    """
    stem = "substring(questionName, 1, length(questionName) - 1)"
    if dialect == "spark":
        labels = f"split({stem}, '[.]')"
        tld = "labels[size(labels) - 1]"
        sld = "concat(labels[size(labels) - 2], '.', labels[size(labels) - 1])"
    else:
        labels = f"string_split({stem}, '.')"
        tld = "labels[len(labels)]"
        sld = "labels[len(labels) - 1] || '.' || labels[len(labels)]"
    return f"""
WITH names AS (
  SELECT questionName AS fqdn, {labels} AS labels
  FROM ({src}) s),
parts AS (
  SELECT fqdn, {tld} AS tld, {sld} AS sld
  FROM names)
SELECT coalesce(tld, '__ANY__') AS tld,
       coalesce(sld, '__ANY__') AS sld,
       coalesce(fqdn, '__ANY__') AS fqdn,
       CAST(count(*) AS BIGINT) AS n_queries
FROM parts
GROUP BY ROLLUP (tld, sld, fqdn)
ORDER BY tld, sld, fqdn
"""


def name_rollup(spark, sf_dir: str) -> DataFrame:
    """Query counts at TLD / SLD / FQDN grain via native ROLLUP."""
    from ..sources.events import dns_query_stream

    dns_query_stream(spark, sf_dir).createOrReplaceTempView("dns_rollup_src")
    return spark.sql(_name_rollup_body("SELECT * FROM dns_rollup_src", "spark"))


def name_rollup_sql() -> str:
    from ..sources.events import QUERY_STREAM_SQL

    return _name_rollup_body(QUERY_STREAM_SQL, "duckdb")


# --------------------------------------------- client profile table


def _client_profile_body(src: str, dialect: str) -> str:
    """Per-client ENTITY PROFILE — the enrichment table a SOC / NOC
    keeps per source address (and the reference's Grafana drill-down
    implies): query volume, distinct-name/type/port diversity, first
    and last sighting, active span. Name diversity per client is the
    standard DGA-infection triage signal at the CLIENT grain
    (`dns_qname_features` triages at the NAME grain); port diversity
    separates NAT pools from single hosts. All exact integers.

    Scale shape: ONE client-keyed aggregate with map-side partials
    (the distincts are per-group exact counts — at 100 TB swap in
    approx_count_distinct per the `events_sketch_stats` pattern, the
    documented knob); output is client-domain-sized.
    """
    us = "unix_micros(queryTime)" if dialect == "spark" else "epoch_us(queryTime)"
    idiv = "div" if dialect == "spark" else "//"
    return f"""
SELECT queryAddress,
       CAST(count(*) AS BIGINT) AS n_queries,
       CAST(count(DISTINCT questionName) AS BIGINT) AS n_qnames,
       CAST(count(DISTINCT questionType) AS BIGINT) AS n_qtypes,
       CAST(count(DISTINCT queryPort) AS BIGINT) AS n_ports,
       CAST(min({us}) AS BIGINT) AS first_seen_us,
       CAST(max({us}) AS BIGINT) AS last_seen_us,
       CAST((max({us}) - min({us})) {idiv} 1000000 AS BIGINT) AS span_s
FROM ({src}) s
GROUP BY queryAddress
ORDER BY queryAddress
"""


def client_profile(spark, sf_dir: str) -> DataFrame:
    """Per-client volume/diversity/sighting profile."""
    from ..sources.events import dns_query_stream

    dns_query_stream(spark, sf_dir).createOrReplaceTempView("dns_profile_src")
    return spark.sql(_client_profile_body("SELECT * FROM dns_profile_src", "spark"))


def client_profile_sql() -> str:
    from ..sources.events import QUERY_STREAM_SQL

    return _client_profile_body(QUERY_STREAM_SQL, "duckdb")
