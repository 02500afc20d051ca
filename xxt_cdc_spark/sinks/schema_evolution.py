"""Additive sink schema evolution.

The reference detects DDL but never propagates it (README.md:32, 717 —
C31 is alert-only). This module goes one step further for the safe
subset: when incoming change events carry columns the target table
lacks, issue additive ``ALTER TABLE … ADD COLUMN`` statements and
continue replicating. Only ADDs are automated — type changes, renames
and drops remain alert-only (destructive evolution needs a human, same
posture as the reference).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import types as T

from xxt_cdc_spark.model.types import spark_to_mysql_type


@dataclass(frozen=True)
class NewColumn:
    name: str
    ddl_type: str
    spark_type: T.DataType


_SQLITE_TYPES: dict[str, str] = {
    # sqlite's affinity system: map the MySQL DDL type to an affinity class
    "TINYINT": "INTEGER", "SMALLINT": "INTEGER", "INT": "INTEGER",
    "BIGINT": "INTEGER", "TINYINT(1)": "INTEGER",
    "FLOAT": "REAL", "DOUBLE": "REAL",
    "DATE": "TEXT", "DATETIME(6)": "TEXT", "TEXT": "TEXT", "JSON": "TEXT",
    "BLOB": "BLOB",
}


def diff_new_columns(
    incoming: T.StructType,
    existing_cols: set[str],
    dialect: str = "mysql",
) -> list[NewColumn]:
    """Columns present in the incoming row image but absent at the sink.

    Name comparison is case-insensitive (MySQL identifier semantics).
    """
    existing = {c.lower() for c in existing_cols}
    out = []
    for f in incoming.fields:
        if f.name.lower() in existing:
            continue
        ddl = spark_to_mysql_type(f.dataType)
        if dialect == "sqlite":
            base = ddl if ddl in _SQLITE_TYPES else ddl.split("(")[0]
            ddl = _SQLITE_TYPES.get(base, "TEXT")
        out.append(NewColumn(f.name, ddl, f.dataType))
    return out


def evolve_table(
    connect_fn: Callable[[], object],
    table: str,
    incoming: T.StructType,
    dialect: str = "sqlite",
) -> list[NewColumn]:
    """Ensure the sink table has every incoming column; returns the
    columns added. New columns are nullable (additive-safe: existing
    rows get NULL, exactly what a MySQL ADD COLUMN does)."""
    conn = connect_fn()
    try:
        if dialect == "sqlite":
            cur = conn.execute(f"PRAGMA table_info({table})")
            existing = {row[1] for row in cur.fetchall()}
        else:  # pragma: no cover - needs a server
            cur = conn.cursor()
            cur.execute(
                "SELECT COLUMN_NAME FROM information_schema.COLUMNS "
                "WHERE TABLE_NAME = %s AND TABLE_SCHEMA = DATABASE()",
                (table,),
            )
            existing = {row[0] for row in cur.fetchall()}
        added = diff_new_columns(incoming, existing, dialect)
        for col in added:
            stmt = f"ALTER TABLE {table} ADD COLUMN {col.name} {col.ddl_type} NULL"
            if dialect == "sqlite":
                conn.execute(stmt)
            else:  # pragma: no cover
                conn.cursor().execute(stmt)
        conn.commit()
        return added
    finally:
        conn.close()


class EvolvingTableSink:
    """Streaming additive schema evolution: a ``foreachBatch`` body that
    widens the sink when the source's row image grows columns mid-stream.

    The reference only detects DDL (C31, alert-only). Here the safe
    subset is automated end-to-end: per micro-batch,

    1. collect the set of JSON keys present in the batch's row images —
       one JVM-side ``json_object_keys`` + explode + distinct over the
       micro-batch (no Python per row, no full parse);
    2. for keys the sink doesn't know yet, infer each new column's type
       from one sample payload (``schema_of_json`` on the driver, only
       on the rare batch that actually carries a new key; unparseable →
       string);
    3. ``ALTER TABLE … ADD COLUMN`` the sink additively (existing rows
       read NULL, exactly MySQL's ADD COLUMN semantics), widen the
       cached parse schema, and apply the batch through the normal
       upsert path.

    Driver-side state (the cached StructType) is safe: foreachBatch
    bodies run on the driver, one at a time per query.
    """

    def __init__(
        self,
        connect_fn: Callable[[], object],
        table: str,
        initial_schema: "T.StructType",
        key_cols: list[str],
        dialect: str = "sqlite",
        num_partitions: int = 4,
        batch_size: int = 500,
        connection_init: list[str] | None = None,
    ) -> None:
        self.connect_fn = connect_fn
        self.table = table
        self.schema = T.StructType(list(initial_schema.fields))
        self.key_cols = key_cols
        self.dialect = dialect
        self.num_partitions = num_partitions
        self.batch_size = batch_size
        self.connection_init = connection_init or []
        self.evolved: list[NewColumn] = []  # audit trail across batches

    # -- step 1: cheap key discovery -------------------------------------
    def _present_keys(self, batch_df) -> set[str]:
        from pyspark.sql import functions as F

        rows = (
            batch_df.select(
                F.explode(
                    F.json_object_keys(F.coalesce(F.col("after"), F.col("before")))
                ).alias("k")
            )
            .distinct()
            .collect()
        )
        return {r[0] for r in rows}

    # -- step 2: type inference for genuinely new keys -------------------
    def _infer_types(self, batch_df, new_keys: set[str]) -> list["T.StructField"]:
        from pyspark.sql import functions as F

        spark = batch_df.sparkSession
        fields: list[T.StructField] = []
        for key in sorted(new_keys):
            sample = (
                batch_df.select(F.coalesce(F.col("after"), F.col("before")).alias("p"))
                .filter(F.get_json_object(F.col("p"), f"$.{key}").isNotNull())
                .select(F.get_json_object(F.col("p"), f"$.{key}").alias("v"))
                .first()
            )
            dtype: T.DataType = T.StringType()
            if sample is not None and sample[0] is not None:
                v = sample[0]
                try:
                    inferred = spark.range(1).select(
                        F.schema_of_json(F.lit(f'{{"x": {v}}}'))
                    ).first()[0]
                    if "BIGINT" in inferred.upper():
                        dtype = T.LongType()
                    elif "DOUBLE" in inferred.upper() or "DECIMAL" in inferred.upper():
                        dtype = T.DoubleType()
                except Exception:
                    dtype = T.StringType()
            fields.append(T.StructField(key, dtype, nullable=True))
        return fields

    # -- the foreachBatch body -------------------------------------------
    def __call__(self, batch_df, batch_id: int) -> None:
        from xxt_cdc_spark.operators.normalize import envelope_to_typed
        from xxt_cdc_spark.sinks.upsert import JdbcUpsertWriter, apply_batch

        if batch_df.isEmpty():
            return
        known = {f.name.lower() for f in self.schema.fields}
        new_keys = {k for k in self._present_keys(batch_df) if k.lower() not in known}
        if new_keys:
            for f in self._infer_types(batch_df, new_keys):
                self.schema = self.schema.add(f)
            self.evolved.extend(
                evolve_table(self.connect_fn, self.table, self.schema, self.dialect)
            )
        typed = envelope_to_typed(batch_df, self.table, self.schema, image="auto")
        columns = [f.name for f in self.schema.fields]
        apply_batch(
            typed,
            lambda: JdbcUpsertWriter(
                connect_fn=self.connect_fn,
                table=self.table,
                columns=columns,
                key_cols=self.key_cols,
                dialect=self.dialect,
                batch_size=self.batch_size,
                connection_init=self.connection_init,
            ),
            self.key_cols,
            ["pos_file", "pos_offset"],
            self.num_partitions,
        )


def apply_additive_ddl(
    connect_fn: Callable[[], object],
    table: str,
    cols: list[tuple[str, str]],
    dialect: str = "sqlite",
) -> list[str]:
    """Execute parsed ADD COLUMN clauses (``operators/ddl.py::
    parse_add_columns``) against the sink — the DDL-channel twin of
    ``evolve_table`` (which infers columns from row images instead).
    Idempotent: columns the sink already has are skipped, so a
    micro-batch replay that re-delivers the DDL event is a no-op.
    Returns the column names actually added."""
    conn = connect_fn()
    try:
        if dialect == "sqlite":
            cur = conn.execute(f"PRAGMA table_info({table})")
            existing = {row[1].lower() for row in cur.fetchall()}
        else:  # pragma: no cover - needs a server
            cur = conn.cursor()
            cur.execute(
                "SELECT COLUMN_NAME FROM information_schema.COLUMNS "
                "WHERE TABLE_NAME = %s AND TABLE_SCHEMA = DATABASE()",
                (table,),
            )
            existing = {row[0].lower() for row in cur.fetchall()}
        added: list[str] = []
        # identifiers are re-emitted QUOTED per dialect: parse_add_columns
        # stripped the source's quoting, and an unquoted reserved word
        # (`order`, `group`) would turn a legitimate additive ALTER
        # into a syntax error that kills the stream under APPLY
        quote = "`" if dialect == "mysql" else '"'
        for name, ddl_type in cols:
            if name.lower() in existing:
                continue
            if dialect == "sqlite":
                base = ddl_type if ddl_type in _SQLITE_TYPES else ddl_type.split("(")[0]
                ddl_type = _SQLITE_TYPES.get(base, "TEXT")
            stmt = f"ALTER TABLE {table} ADD COLUMN {quote}{name}{quote} {ddl_type} NULL"
            if dialect == "sqlite":
                conn.execute(stmt)
            else:  # pragma: no cover
                conn.cursor().execute(stmt)
            added.append(name)
        conn.commit()
        return added
    finally:
        conn.close()
