"""Table include/exclude filtering with wildcard + regex patterns.

Parity target: T5 (reference filter/TableFilter.scala:16-240):
database include/exclude lists; table patterns where ``*`` / ``?``
wildcards compile to regex (:22-43); ``shouldInclude(TableId)``
(:51-88); batch ``filterTables``; stats (:108-130) and config
validation (:137-176). Exclude wins over include; empty include list
means "include all".

Two surfaces: a driver-side Python predicate (catalog filtering) and a
DataFrame predicate column (stream filtering — stays JVM-side via
``rlike``/``isin`` so it pushes into the scan).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F

from xxt_cdc_spark.model.table_id import TableId


def _compile(pattern: str) -> re.Pattern:
    """Wildcard pattern → anchored regex (reference TableFilter.scala:22-43).

    ``*`` → ``.*``, ``?`` → ``.``; everything else is escaped literally,
    so user patterns like ``orders.*`` behave as documented in the
    reference README (prefix wildcard), not as raw regex.
    """
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return re.compile("^" + "".join(out) + "$")


def _java_pattern(pattern: str) -> str:
    """Same compilation, emitted as a Java-regex string for ``rlike``."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        elif ch in r"\.[]{}()<>+-=!^$|":
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + "$"


@dataclass
class TableFilter:
    include_databases: list[str] = field(default_factory=list)
    exclude_databases: list[str] = field(default_factory=list)
    include_tables: list[str] = field(default_factory=list)
    exclude_tables: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        self._inc_db = [_compile(p) for p in self.include_databases]
        self._exc_db = [_compile(p) for p in self.exclude_databases]
        self._inc_tbl = [_compile(p) for p in self.include_tables]
        self._exc_tbl = [_compile(p) for p in self.exclude_tables]
        self.stats = {"evaluated": 0, "included": 0, "excluded": 0}

    # -- driver-side predicate (catalog filtering) ----------------------
    def should_include(self, table: TableId) -> bool:
        self.stats["evaluated"] += 1
        ok = self._should_include(table)
        self.stats["included" if ok else "excluded"] += 1
        return ok

    def _should_include(self, table: TableId) -> bool:
        if any(p.match(table.database) for p in self._exc_db):
            return False
        if self._inc_db and not any(p.match(table.database) for p in self._inc_db):
            return False
        if any(p.match(table.table) for p in self._exc_tbl):
            return False
        if self._inc_tbl and not any(p.match(table.table) for p in self._inc_tbl):
            return False
        return True

    def filter_tables(self, tables: list[TableId]) -> list[TableId]:
        return [t for t in tables if self.should_include(t)]

    # -- DataFrame-side predicate (stream filtering) ---------------------
    def predicate(self, db_col: str = "db", table_col: str = "table") -> Column:
        """Boolean Column implementing the same semantics JVM-side."""
        cond = F.lit(True)
        db, tbl = F.col(db_col), F.col(table_col)
        for p in self.exclude_databases:
            cond = cond & ~db.rlike(_java_pattern(p))
        if self.include_databases:
            inc = F.lit(False)
            for p in self.include_databases:
                inc = inc | db.rlike(_java_pattern(p))
            cond = cond & inc
        for p in self.exclude_tables:
            cond = cond & ~tbl.rlike(_java_pattern(p))
        if self.include_tables:
            inc = F.lit(False)
            for p in self.include_tables:
                inc = inc | tbl.rlike(_java_pattern(p))
            cond = cond & inc
        return cond

    # -- config validation (reference TableFilter.scala:137-176) ---------
    def validate(self) -> list[str]:
        problems = []
        for group, pats in (
            ("include_databases", self.include_databases),
            ("exclude_databases", self.exclude_databases),
            ("include_tables", self.include_tables),
            ("exclude_tables", self.exclude_tables),
        ):
            for p in pats:
                if not p or p.isspace():
                    problems.append(f"{group}: empty pattern")
                try:
                    _compile(p)
                except re.error as e:  # pragma: no cover - escape makes this rare
                    problems.append(f"{group}: bad pattern {p!r}: {e}")
        both = set(self.include_tables) & set(self.exclude_tables)
        if both:
            problems.append(f"patterns in both include and exclude: {sorted(both)}")
        return problems
