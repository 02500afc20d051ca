"""TableId — (database, table) pair (reference model/TableId.scala:9-11)."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True, order=True)
class TableId:
    database: str
    table: str

    def full_name(self) -> str:
        return f"{self.database}.{self.table}"

    @staticmethod
    def parse(s: str) -> "TableId":
        db, _, tbl = s.partition(".")
        if not tbl:
            raise ValueError(f"expected 'db.table', got {s!r}")
        return TableId(db, tbl)
