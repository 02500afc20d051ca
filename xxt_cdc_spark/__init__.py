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
