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


@functools.total_ordering
@dataclass(frozen=True)
class FilePosition(BinlogPosition):
    """(binlog file, byte offset); ordered by (file, offset)."""

    filename: str
    offset: int

    def as_string(self) -> str:
        return f"file:{self.filename}:{self.offset}"

    def __lt__(self, other: "FilePosition") -> bool:
        if not isinstance(other, FilePosition):
            return NotImplemented
        return (self.filename, self.offset) < (other.filename, other.offset)


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
