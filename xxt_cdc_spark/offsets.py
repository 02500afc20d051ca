"""JDBC offset-store mirror (C23 / F5 ops parity).

The engine's real offsets live in the Structured Streaming checkpoint;
this optional mirror maintains the reference's ``cdc_offsets`` table
(coordinator/MySQLOffsetStore.scala:32-141, DDL at :36-45) so existing
xxt-cdc dashboards/runbooks keep working: one row per task with the
serialized position, REPLACE-style upsert.
"""

from __future__ import annotations

from typing import Callable

from xxt_cdc_spark.model.positions import BinlogPosition

DDL = """
CREATE TABLE IF NOT EXISTS cdc_offsets (
  task_name VARCHAR(128) PRIMARY KEY,
  position_type VARCHAR(32) NOT NULL,
  position_value TEXT NOT NULL,
  updated_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP
)
"""


class JdbcOffsetStore:
    def __init__(self, connect_fn: Callable[[], object], dialect: str = "sqlite") -> None:
        self.connect_fn = connect_fn
        self.dialect = dialect

    # all statements go through cursors: Connection.execute is a
    # sqlite3-only shortcut — portable DB-API code must not rely on it

    def ensure_table(self) -> None:
        conn = self.connect_fn()
        try:
            conn.cursor().execute(DDL)
            conn.commit()
        finally:
            conn.close()

    def save(self, task_name: str, position: BinlogPosition) -> None:
        kind = type(position).__name__
        value = position.as_string()
        conn = self.connect_fn()
        try:
            cur = conn.cursor()
            if self.dialect == "mysql":
                cur.execute(
                    "REPLACE INTO cdc_offsets (task_name, position_type, position_value) VALUES (%s, %s, %s)",
                    (task_name, kind, value),
                )
            else:
                cur.execute(
                    "INSERT INTO cdc_offsets (task_name, position_type, position_value) VALUES (?, ?, ?) "
                    "ON CONFLICT(task_name) DO UPDATE SET position_type=excluded.position_type, "
                    "position_value=excluded.position_value, updated_at=CURRENT_TIMESTAMP",
                    (task_name, kind, value),
                )
            conn.commit()
        finally:
            conn.close()

    def load(self, task_name: str) -> BinlogPosition | None:
        conn = self.connect_fn()
        try:
            cur = conn.cursor()
            ph = "%s" if self.dialect == "mysql" else "?"
            cur.execute(f"SELECT position_value FROM cdc_offsets WHERE task_name = {ph}", (task_name,))
            row = cur.fetchone()
            return BinlogPosition.parse(row[0]) if row else None
        finally:
            conn.close()
