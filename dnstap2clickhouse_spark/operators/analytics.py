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
