from .tables import load_table, register_views
from .events import (
    dns_query_stream,
    dns_response_stream,
    dns_pair_streams,
    QUERY_STREAM_SQL,
    RESPONSE_STREAM_SQL,
    PAIR_QUERY_SQL,
    PAIR_RESPONSE_SQL,
)

__all__ = [
    "load_table",
    "register_views",
    "dns_query_stream",
    "dns_response_stream",
    "dns_pair_streams",
    "QUERY_STREAM_SQL",
    "RESPONSE_STREAM_SQL",
    "PAIR_QUERY_SQL",
    "PAIR_RESPONSE_SQL",
]
