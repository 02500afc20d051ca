"""xxt_cdc_spark — a PySpark-native CDC/ETL + analytics engine.

A from-scratch rebuild of the capabilities of Xuxiaotuan/xxt-cdc
(a Scala/Pekko MySQL CDC service) on idiomatic PySpark:

- the canonical change-event envelope and type system (``model``)
- snapshot / catchup / streaming replication operators (``operators``)
- idempotent upsert sinks (``sinks``)
- Structured Streaming pipeline assembly (``streaming``)
- catalog discovery and table filtering (``catalog``, ``operators.table_filter``)
- observability (``obs``)
- large-scale data-pipeline operators the reference lacks: dedup,
  similarity search, text analysis, multimodal columns (``functions``)

Everything is DataFrame-first: Catalyst plans the physical execution,
and Python drops to Pandas UDFs only where built-ins cannot express
the semantics.
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy public API (keeps bare `import xxt_cdc_spark` free of the
    # pyspark import cost until something is actually used)
    api = {
        "CDCEngine": ("xxt_cdc_spark.engine", "CDCEngine"),
        "CDCStreamPipeline": ("xxt_cdc_spark.streaming.pipeline", "CDCStreamPipeline"),
        "JdbcUpsertWriter": ("xxt_cdc_spark.sinks.upsert", "JdbcUpsertWriter"),
        "apply_batch": ("xxt_cdc_spark.sinks.upsert", "apply_batch"),
        "apply_batch_multi": ("xxt_cdc_spark.sinks.upsert", "apply_batch_multi"),
        "apply_batch_fanout": ("xxt_cdc_spark.sinks.upsert", "apply_batch_fanout"),
        "EvolvingTableSink": ("xxt_cdc_spark.sinks.schema_evolution", "EvolvingTableSink"),
        "ParquetStateTable": ("xxt_cdc_spark.sinks.parquet_state", "ParquetStateTable"),
        "TableFilter": ("xxt_cdc_spark.operators.table_filter", "TableFilter"),
        "CDCConfig": ("xxt_cdc_spark.config", "CDCConfig"),
        "load_config": ("xxt_cdc_spark.config", "load_config"),
        "get_spark": ("xxt_cdc_spark.session", "get_spark"),
    }
    if name in api:
        import importlib

        module, attr = api[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'xxt_cdc_spark' has no attribute {name!r}")
