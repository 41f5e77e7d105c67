"""Source layer: parquet catalog tables + raw text/CSV/log readers."""

from stream_processing_system_spark.sources.tables import (
    TABLES,
    load_table,
    register_views,
)
from stream_processing_system_spark.sources.text import (
    APACHE_LOG_MIN_TOKENS,
    parse_apache_log,
    read_csv_positional,
    read_text_lines,
)

__all__ = [
    "TABLES",
    "load_table",
    "register_views",
    "read_text_lines",
    "read_csv_positional",
    "parse_apache_log",
    "APACHE_LOG_MIN_TOKENS",
]
