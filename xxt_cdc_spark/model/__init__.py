from xxt_cdc_spark.model.envelope import (
    CHANGE_EVENT_SCHEMA,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE,
    Operation,
)
from xxt_cdc_spark.model.positions import BinlogPosition, FilePosition, GTIDPosition
from xxt_cdc_spark.model.states import CDCState, OffsetState
from xxt_cdc_spark.model.table_id import TableId
from xxt_cdc_spark.model.types import mysql_to_spark_type, spark_to_mysql_type

__all__ = [
    "CHANGE_EVENT_SCHEMA",
    "OP_INSERT",
    "OP_UPDATE",
    "OP_DELETE",
    "Operation",
    "BinlogPosition",
    "FilePosition",
    "GTIDPosition",
    "CDCState",
    "OffsetState",
    "TableId",
    "mysql_to_spark_type",
    "spark_to_mysql_type",
]
