from .pipeline import (
    read_events_stream,
    streaming_client_query_agg,
    streaming_client_response_agg,
    streaming_passthrough,
    streaming_response_time_join,
    run_stream_to_memory,
)

__all__ = [
    "read_events_stream",
    "streaming_client_query_agg",
    "streaming_client_response_agg",
    "streaming_passthrough",
    "streaming_response_time_join",
    "run_stream_to_memory",
]
