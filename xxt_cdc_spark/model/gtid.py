"""GTID set parsing and interval-based comparison.

The reference admits its GTID ordering is a simplified string compare
(model/BinlogPosition.scala:20). A GTID set is really
``uuid:ranges[,uuid:ranges]*`` with ranges like ``1-100:105:107-110``;
the meaningful relation is *containment*: set A is at-or-after set B
iff A ⊇ B per source UUID. This module implements the real semantics
(MySQL's GTID_SUBSET): parse → normalized interval sets → subset /
union / subtract, and a partial-order compare that reports
incomparable sets honestly instead of inventing a lexicographic
answer.
"""

from __future__ import annotations

from dataclasses import dataclass


def _merge(intervals: list[tuple[int, int]]) -> tuple[tuple[int, int], ...]:
    out: list[tuple[int, int]] = []
    for lo, hi in sorted(intervals):
        if out and lo <= out[-1][1] + 1:
            out[-1] = (out[-1][0], max(out[-1][1], hi))
        else:
            out.append((lo, hi))
    return tuple(out)


@dataclass(frozen=True)
class GTIDSet:
    """Normalized GTID set: uuid → merged, sorted (start, end) intervals."""

    by_uuid: tuple[tuple[str, tuple[tuple[int, int], ...]], ...]

    @staticmethod
    def parse(s: str) -> "GTIDSet":
        """Parse 'uuid:1-5:7,uuid2:1-3'. Empty string → empty set."""
        acc: dict[str, list[tuple[int, int]]] = {}
        for part in filter(None, (p.strip() for p in s.split(","))):
            uuid, _, ranges = part.partition(":")
            if not ranges:
                raise ValueError(f"GTID part without ranges: {part!r}")
            ivs = acc.setdefault(uuid.lower(), [])
            for r in ranges.split(":"):
                lo, _, hi = r.partition("-")
                a = int(lo)
                b = int(hi) if hi else a
                if b < a:
                    raise ValueError(f"inverted GTID range: {r!r}")
                ivs.append((a, b))
        return GTIDSet(tuple(sorted((u, _merge(iv)) for u, iv in acc.items())))

    def as_string(self) -> str:
        parts = []
        for uuid, ivs in self.by_uuid:
            rs = ":".join(f"{a}-{b}" if a != b else str(a) for a, b in ivs)
            parts.append(f"{uuid}:{rs}")
        return ",".join(parts)

    def _map(self) -> dict[str, tuple[tuple[int, int], ...]]:
        return dict(self.by_uuid)

    def contains(self, other: "GTIDSet") -> bool:
        """GTID_SUBSET(other, self): every transaction in `other` is in self."""
        mine = self._map()
        for uuid, ivs in other.by_uuid:
            have = mine.get(uuid)
            if have is None:
                return False
            for lo, hi in ivs:
                if not any(a <= lo and hi <= b for a, b in have):
                    # interval may span multiple of ours only if they're
                    # non-adjacent — merged form makes single-span a
                    # complete check
                    return False
        return True

    def union(self, other: "GTIDSet") -> "GTIDSet":
        acc: dict[str, list[tuple[int, int]]] = {}
        for src in (self.by_uuid, other.by_uuid):
            for uuid, ivs in src:
                acc.setdefault(uuid, []).extend(ivs)
        return GTIDSet(tuple(sorted((u, _merge(iv)) for u, iv in acc.items())))

    def compare(self, other: "GTIDSet") -> int | None:
        """Partial order: 0 equal, 1 self after other, -1 before,
        None incomparable (divergent histories — surfaced, not guessed)."""
        a_in_b = other.contains(self)
        b_in_a = self.contains(other)
        if a_in_b and b_in_a:
            return 0
        if b_in_a:
            return 1
        if a_in_b:
            return -1
        return None


def gtid_not_executed(executed: GTIDSet, gtid_col: str = "gtid"):
    """Column predicate: the row's single-transaction GTID
    (``uuid:txid``) is NOT contained in ``executed`` — the streaming
    resume gate for GTID mode (reference MySQLBinlogReader.scala:127-131
    seeds the client with setGtidSet; here the same cut is a Catalyst
    expression so it runs JVM-side inside whole-stage codegen).

    The executed set is small (a few intervals per source UUID), so it
    unrolls to literal BETWEEN clauses — no UDF, no broadcast join.
    Rows with a NULL gtid are kept (non-transactional events must not
    be silently dropped by a GTID gate), and so are rows whose
    transaction part doesn't parse as a plain integer (range form
    'uuid:1-5' or a multi-interval set): an unparseable position must
    fail open to "not executed", never silently drop — a NULL from the
    cast would otherwise poison the whole predicate.
    """
    from pyspark.sql import functions as F

    col = F.col(gtid_col)
    uuid = F.lower(F.split(col, ":").getItem(0))
    # try_cast, not cast: under ANSI mode (Spark 4 default) a plain
    # cast of a non-integer txid THROWS, killing the whole query
    txid = F.split(col, ":").getItem(1).try_cast("long")
    contained = F.lit(False)
    for u, ivs in executed.by_uuid:
        in_u = F.lit(False)
        for a, b in ivs:
            in_u = in_u | txid.between(F.lit(a), F.lit(b))
        contained = F.when(uuid == F.lit(u), in_u).otherwise(contained)
    return col.isNull() | txid.isNull() | ~contained
