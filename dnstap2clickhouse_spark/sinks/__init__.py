from .writers import foreach_batch_parquet, clickhouse_writer

__all__ = ["foreach_batch_parquet", "clickhouse_writer"]
