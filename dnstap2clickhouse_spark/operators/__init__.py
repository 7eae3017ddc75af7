from .grouping_sets import expand_grouping_sets, grouping_sets_sql_union
from .windows import window_dedup_count
from .join import match_response_times, avg_response_time_samples
from .sampling import sample_by_dns_id
from .columns import apply_column_config
from .analytics import (
    top_query_addresses,
    top_nxdomain_names,
    non_ok_time_series,
    response_time_series,
)
from .dns_pipeline import client_query_table, client_response_table, response_time_table

__all__ = [
    "expand_grouping_sets",
    "grouping_sets_sql_union",
    "window_dedup_count",
    "match_response_times",
    "avg_response_time_samples",
    "sample_by_dns_id",
    "apply_column_config",
    "top_query_addresses",
    "top_nxdomain_names",
    "non_ok_time_series",
    "response_time_series",
    "client_query_table",
    "client_response_table",
    "response_time_table",
]
