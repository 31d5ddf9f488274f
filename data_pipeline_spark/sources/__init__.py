"""Sources and sinks: partitioned JSON lake reader (with validation +
corrupt-record taxonomy), change-log source re-exports, debug snapshot sink."""

from .json_lake import (
    PRODUCT_SCHEMA,
    debug_snapshot,
    parse_products,
    read_lake_json,
    validation_metrics,
)
from ..cdc.changelog import read_change_log  # canonical change-log source
from .jdbc import read_external_table, subscribed_users
from .debezium import (
    debezium_to_change_events,
    envelope_parse_stats,
    generate_debezium_log,
)

__all__ = [
    "PRODUCT_SCHEMA", "debug_snapshot", "parse_products",
    "read_lake_json", "validation_metrics", "read_change_log",
    "read_external_table", "subscribed_users",
    "debezium_to_change_events", "envelope_parse_stats", "generate_debezium_log",
]
