"""Binlog position types — the engine's logical clock.

Parity target: ``BinlogPosition`` sealed trait with ``GTIDPosition``
and ``FilePosition`` (reference model/BinlogPosition.scala:7-65):
total-order ``compare``, string round-trip ``asString``/``parse``.

Like the reference (line 20 admits GTID compare is simplified string
compare), GTID ordering here is lexicographic; (file, offset) is the
fully-ordered mode and the one the engine uses for last-write-wins.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass


class BinlogPosition:
    """Base for position types; subclasses are totally ordered within kind."""

    def as_string(self) -> str:
        raise NotImplementedError

    @staticmethod
    def parse(s: str) -> "BinlogPosition":
        """Round-trip of ``as_string`` (reference BinlogPosition.scala:56-65)."""
        if s.startswith("gtid:"):
            return GTIDPosition(s[len("gtid:") :])
        if s.startswith("file:"):
            body = s[len("file:") :]
            filename, _, offset = body.rpartition(":")
            return FilePosition(filename, int(offset))
        raise ValueError(f"unparseable binlog position: {s!r}")


def _suffix_num(filename: str) -> int | None:
    """Numeric rotation suffix, or None. File order must be numeric:
    MySQL widens the suffix past its zero-padding ('binlog.1000000'
    follows 'binlog.999999'), where lexicographic compare inverts."""
    tail = filename.rsplit(".", 1)[-1]
    return int(tail) if tail.isdigit() else None


@functools.total_ordering
@dataclass(frozen=True)
class FilePosition(BinlogPosition):
    """(binlog file, byte offset); ordered by (numeric file suffix, offset)."""

    filename: str
    offset: int

    def as_string(self) -> str:
        return f"file:{self.filename}:{self.offset}"

    def __lt__(self, other: "FilePosition") -> bool:
        if not isinstance(other, FilePosition):
            return NotImplemented
        a, b = _suffix_num(self.filename), _suffix_num(other.filename)
        if a is not None and b is not None:
            return (a, self.offset) < (b, other.offset)
        return (self.filename, self.offset) < (other.filename, other.offset)


def position_after(
    start_pos,
    file_col: str = "pos_file",
    offset_col: str = "pos_offset",
):
    """Column predicate: event position strictly AFTER ``start_pos``.

    Real binlog offsets reset to ~4 when the server rotates to a new
    file, so a scalar ``pos_offset > o`` gate (the naive form) drops
    every fresh event written after a rotation. This orders on the
    composite (file, offset) — matching ``FilePosition.__lt__`` and the
    reference comparator (model/BinlogPosition.scala:24-31) — whenever
    the start position carries a file: ``FilePosition``, ``(file,
    offset)`` tuple/list, or the ``file:<name>:<off>`` string form.
    A bare int keeps the scalar gate (single-file / synthetic sources).

    GTID mode (``GTIDPosition`` / ``gtid:<set>`` string): "after" means
    the event's transaction is NOT contained in the executed set —
    real interval containment on the ``gtid`` column
    (model/gtid.gtid_not_executed), the semantics the reference's
    string-compare punt approximates.
    """
    from pyspark.sql import functions as F

    if isinstance(start_pos, str) and start_pos.startswith("file:"):
        start_pos = BinlogPosition.parse(start_pos)
    if isinstance(start_pos, str) and start_pos.startswith("gtid:"):
        start_pos = BinlogPosition.parse(start_pos)
    if isinstance(start_pos, GTIDPosition):
        from xxt_cdc_spark.model.gtid import GTIDSet, gtid_not_executed

        return gtid_not_executed(GTIDSet.parse(start_pos.gtid_set))
    if isinstance(start_pos, FilePosition):
        start_pos = (start_pos.filename, start_pos.offset)
    if isinstance(start_pos, (tuple, list)):
        fname, off = start_pos
        num = _suffix_num(fname)
        if num is not None:
            # JVM-side numeric suffix: survives MySQL widening the
            # rotation suffix past its zero-padding, where string
            # compare would order binlog.1000000 before binlog.999999
            suff = F.regexp_extract(F.col(file_col), r"([0-9]+)$", 1)
            file_gt = F.when(suff != "", suff.cast("long") > F.lit(num)).otherwise(
                F.col(file_col) > F.lit(fname)
            )
        else:
            file_gt = F.col(file_col) > F.lit(fname)
        return file_gt | (
            (F.col(file_col) == F.lit(fname)) & (F.col(offset_col) > F.lit(off))
        )
    return F.col(offset_col) > F.lit(start_pos)


def position_in_range(
    lo,
    hi,
    file_col: str = "pos_file",
    offset_col: str = "pos_offset",
):
    """Column predicate for the half-open catchup range (lo, hi] on the
    composite (file, offset) order — the bounded-replay cut (T8/C28)
    that stays correct across binlog file rotations."""
    from pyspark.sql import functions as F

    cond = position_after(lo, file_col, offset_col)
    if hi is None:
        return cond
    return cond & ~position_after(hi, file_col, offset_col)


@functools.total_ordering
@dataclass(frozen=True)
class GTIDPosition(BinlogPosition):
    """GTID set; simplified lexicographic order (same caveat as reference)."""

    gtid_set: str

    def as_string(self) -> str:
        return f"gtid:{self.gtid_set}"

    def __lt__(self, other: "GTIDPosition") -> bool:
        if not isinstance(other, GTIDPosition):
            return NotImplemented
        return self.gtid_set < other.gtid_set
