"""Source / registration layer: file-format table factories, hive
partition discovery, Arrow IPC, Delta (reference: crates/providers/).
"""

from adt_spark.sources.registry import (
    UnsupportedFormatError,
    ensure_scheme,
    path_sql_name,
    register_table,
)

__all__ = [
    "UnsupportedFormatError",
    "ensure_scheme",
    "path_sql_name",
    "register_table",
]
