from xxt_cdc_spark.operators.apply import apply_changes, merge_into
from xxt_cdc_spark.operators.collapse import dedup_transport, last_write_wins
from xxt_cdc_spark.operators.normalize import envelope_to_typed, normalize_raw_events
from xxt_cdc_spark.operators.routing import route, with_partition_id
from xxt_cdc_spark.operators.table_filter import TableFilter

__all__ = [
    "apply_changes",
    "merge_into",
    "dedup_transport",
    "last_write_wins",
    "envelope_to_typed",
    "normalize_raw_events",
    "route",
    "with_partition_id",
    "TableFilter",
]
