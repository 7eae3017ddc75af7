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
