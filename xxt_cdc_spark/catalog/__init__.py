from xxt_cdc_spark.catalog.discovery import (
    BinlogCapability,
    ColumnMeta,
    MySQLCatalogService,
    ParquetCatalogService,
    TableMeta,
)

__all__ = [
    "TableMeta",
    "ColumnMeta",
    "BinlogCapability",
    "MySQLCatalogService",
    "ParquetCatalogService",
]
