from projet_5spar_sparkstreaming_spark.sources.files import (
    load_tables,
    read_jsonl_events,
    read_parquet_table,
)

__all__ = ["load_tables", "read_jsonl_events", "read_parquet_table"]
