"""A real binlog transport: a DataSourceV2-style MicroBatchStream whose
OFFSETS ARE OWNED BY THE SOURCE, not by a file listing.

Parity target — the reference's BinaryLogClient machinery
(reader/MySQLBinlogReader.scala:63-123: bounded queue + listener;
:125-140: ``setBinlogFilename``/``setBinlogPosition``/``setGtidSet``
position seek). Spark mapping:

- the binlog is a directory of rotated append-only files
  (``binlog.000001``, ``binlog.000002``, …) of JSON-lines change
  records — the wire format a replication client materializes;
- ``BinlogStreamReader`` (pyspark.sql.datasource.DataSourceStreamReader,
  the Python DataSource API's MicroBatchStream) tracks a composite
  ``{file, pos}`` offset — byte position within the rotated file, the
  same logical clock as ``model.positions.FilePosition``;
- position seek ≈ ``initialOffset()``: ``startingPosition`` option
  (``earliest`` | ``latest`` | ``file:<name>:<off>``) or
  ``startingGtids`` (GTID-set seek: first transaction NOT contained in
  the executed set, via ``model.gtid.GTIDSet`` — real containment
  semantics, not the reference's string compare);
- bounded queue ≈ ``maxBytesPerTrigger``: ``latestOffset()`` advances
  at most that many bytes past the previous end — backpressure the
  source enforces, like the reference's OverflowStrategy.backpressure;
- ROTATE ≈ offset rollover: when a file is fully consumed the offset
  advances to ``(next file, 0)`` — the composite order stays monotone
  across rotations exactly as FilePosition.compare requires;
- exactly-once: Spark persists the {file,pos} offsets in the streaming
  checkpoint (WAL + commits); ``partitions(start, end)`` re-plans any
  range deterministically, so replays yield byte-identical batches.

``pos_file``/``pos_offset`` on emitted rows are REAL file positions
assigned by the source (record start offsets), so downstream operators
(LWW collapse, resume gates, watermark protocol) run on the transport's
own clock — the property the round-1/2 file-listing source lacked.

Records never split across partitions: every planned boundary is
snapped forward to a record (newline) boundary, so a chunk reads whole
lines in [start, end). At scale the per-file chunking (``chunkBytes``)
gives intra-file parallelism for catchup reads while the steady-state
tail batch is a single small range.
"""

from __future__ import annotations

import io
import json
import os
from dataclasses import dataclass
from datetime import datetime

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from xxt_cdc_spark.model.envelope import CHANGE_EVENT_SCHEMA
from xxt_cdc_spark.model.gtid import GTIDSet

FILE_PREFIX = "binlog."


def _file_num(name: str) -> int:
    """Numeric rotation suffix. All file-order comparisons go through
    this: lexicographic compare breaks once the suffix outgrows its
    zero-padding ('binlog.1000000' < 'binlog.999999' as strings), and
    MySQL widens the suffix exactly that way."""
    return int(name.rsplit(".", 1)[-1])


def _binlog_files(path: str) -> list[str]:
    """Rotated files in position (numeric-suffix) order."""
    try:
        names = [n for n in os.listdir(path) if n.startswith(FILE_PREFIX)]
    except FileNotFoundError:
        return []
    return sorted((n for n in names if n.rsplit(".", 1)[-1].isdigit()), key=_file_num)


def _complete_end(fp: str) -> int:
    """Byte size of the complete-record prefix: a torn tail line (writer
    crash mid-append) is excluded until its newline lands — readers only
    ever see whole records. The back-scan widens geometrically so even a
    torn record longer than the initial probe window is withheld."""
    try:
        size = os.path.getsize(fp)
    except FileNotFoundError:
        return 0
    if size == 0:
        return 0
    back = min(size, 1 << 16)
    with open(fp, "rb") as f:
        while True:
            f.seek(size - back)
            tail = f.read(back)
            last_nl = tail.rfind(b"\n")
            if last_nl >= 0:
                return size - back + last_nl + 1
            if back == size:
                return 0  # no newline anywhere: the whole file is one torn record
            back = min(size, back * 4)


def _snap_forward(fp: str, pos: int) -> int:
    """Smallest record boundary ≥ pos (boundaries are byte offsets of
    record starts; pos mid-record snaps past that record's newline)."""
    end = _complete_end(fp)
    if pos <= 0:
        return 0
    if pos >= end:
        return end
    with open(fp, "rb") as f:
        f.seek(pos - 1)
        if f.read(1) == b"\n":
            return pos
        f.readline()
        return min(f.tell(), end)


@dataclass(frozen=True)
class BinlogRange(InputPartition):
    """One record-aligned byte range of one rotated file."""

    path: str
    filename: str
    start: int
    end: int


def _parse_ts(v) -> datetime | None:
    if v is None:
        return None
    # naive ISO — interpreted in the pinned UTC session timezone,
    # matching the corpus normalization (session.normalize_timestamps)
    return datetime.fromisoformat(v)


_ARROW_BATCH_ROWS = 8192


def _read_range(part: BinlogRange):
    """Yield pyarrow RecordBatches (not tuples): the Python data source
    API ships Arrow batches to the JVM wholesale, skipping per-row
    pickling — measured ~3x decode throughput on the transport bench."""
    import pyarrow as pa

    schema = pa.schema(
        [
            ("db", pa.string()),
            ("table", pa.string()),
            ("op", pa.string()),
            ("ts", pa.timestamp("us")),
            ("pos_file", pa.string()),
            ("pos_offset", pa.int64()),
            ("gtid", pa.string()),
            ("key", pa.string()),
            ("before", pa.string()),
            ("after", pa.string()),
        ]
    )
    if part.start >= part.end:
        # no-op range (empty advance): don't touch the file — it may not
        # exist yet (fresh dir: initialOffset fabricates binlog.000001)
        # or may have been purged
        return
    fp = os.path.join(part.path, part.filename)
    cols: list[list] = [[] for _ in range(10)]

    def flush():
        batch = pa.RecordBatch.from_arrays(
            [pa.array(c, type=f.type) for c, f in zip(cols, schema)], schema=schema
        )
        for c in cols:
            c.clear()
        return batch

    with open(fp, "rb") as f:
        f.seek(part.start)
        pos = part.start
        while pos < part.end:
            line = f.readline()
            if not line:
                break
            rec_start = pos
            pos += len(line)
            line = line.strip()
            if not line:
                continue
            r = json.loads(line)
            for i, v in enumerate(
                (
                    r["db"],
                    r["table"],
                    r["op"],
                    _parse_ts(r.get("ts")),
                    part.filename,  # pos_file: the SOURCE's clock, not payload
                    rec_start,  # pos_offset: real byte position of the record
                    r.get("gtid"),
                    r["key"],
                    r.get("before"),
                    r.get("after"),
                )
            ):
                cols[i].append(v)
            if len(cols[0]) >= _ARROW_BATCH_ROWS:
                yield flush()
    if cols[0]:
        yield flush()


def _plan(path: str, start: dict, end: dict, chunk_bytes: int) -> list[BinlogRange]:
    files = _binlog_files(path)
    ends = end.get("ends") or {}
    out: list[BinlogRange] = []
    for name in files:
        if _file_num(name) < _file_num(start["file"]) or _file_num(name) > _file_num(end["file"]):
            continue
        fp = os.path.join(path, name)
        lo = start["pos"] if name == start["file"] else 0
        if name == end["file"]:
            hi = end["pos"]
        else:
            # intermediate files: use the end pinned at advance time so a
            # replayed batch is byte-identical even if a torn tail has
            # since completed; fall back to the live scan only for
            # offsets written before ends were recorded
            hi = ends.get(name, _complete_end(fp))
        while lo < hi:
            mid = _snap_forward(fp, min(lo + chunk_bytes, hi)) if chunk_bytes else hi
            mid = min(max(mid, lo + 1), hi) if mid <= lo else min(mid, hi)
            out.append(BinlogRange(path, name, lo, mid))
            lo = mid
    return out


class BinlogStreamReader(DataSourceStreamReader):
    """MicroBatchStream over the rotated binlog directory."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("binlog source requires a 'path' option")
        self.max_bytes = int(options.get("maxbytespertrigger", 4 << 20))
        self.chunk_bytes = int(options.get("chunkbytes", 8 << 20))
        self.starting = options.get("startingposition", "earliest")
        self.starting_gtids = options.get("startinggtids")
        self._last_end: dict | None = None
        # set iff Spark called initialOffset() this run — i.e. a FRESH
        # query. A restarted query skips initialOffset (the start comes
        # from the checkpoint, which this API never shows the reader),
        # so latestOffset must treat the no-state first call differently
        self._initial: dict | None = None

    # --- seek (reference MySQLBinlogReader.scala:125-140) -----------------
    def initialOffset(self) -> dict:
        self._initial = self._compute_initial()
        return self._initial

    def _compute_initial(self) -> dict:
        files = _binlog_files(self.path)
        if not files:
            return {"file": f"{FILE_PREFIX}000001", "pos": 0}
        if self.starting_gtids is not None:
            return self._seek_gtids(GTIDSet.parse(self.starting_gtids))
        if self.starting == "earliest":
            return {"file": files[0], "pos": 0}
        if self.starting == "latest":
            last = files[-1]
            return {"file": last, "pos": _complete_end(os.path.join(self.path, last))}
        if self.starting.startswith("file:"):
            body = self.starting[len("file:") :]
            filename, _, off = body.rpartition(":")
            return {"file": filename, "pos": _snap_forward(os.path.join(self.path, filename), int(off))}
        raise ValueError(f"unparseable startingPosition: {self.starting!r}")

    def _seek_gtids(self, executed: GTIDSet) -> dict:
        """GTID-mode seek (client.setGtidSet parity): position of the
        first transaction NOT already contained in the executed set —
        true interval containment, tolerant of gaps and interleaved
        source UUIDs, where the reference punts to string compare."""
        for name in _binlog_files(self.path):
            fp = os.path.join(self.path, name)
            for part in _plan(self.path, {"file": name, "pos": 0},
                              {"file": name, "pos": _complete_end(fp)}, 0):
                with open(fp, "rb") as f:
                    f.seek(part.start)
                    pos = part.start
                    while pos < part.end:
                        line = f.readline()
                        if not line:
                            break
                        rec_start = pos
                        pos += len(line)
                        gtid = json.loads(line).get("gtid")
                        if gtid and not executed.contains(GTIDSet.parse(gtid)):
                            return {"file": name, "pos": rec_start}
        files = _binlog_files(self.path)
        last = files[-1] if files else f"{FILE_PREFIX}000001"
        return {"file": last, "pos": _complete_end(os.path.join(self.path, last))}

    def _true_end(self, files: list) -> dict:
        """The complete current end of the log, with every earlier
        file's consumed end pinned for replay-stable plans."""
        last = files[-1]
        off = {"file": last, "pos": _complete_end(os.path.join(self.path, last))}
        ends = {
            name: _complete_end(os.path.join(self.path, name)) for name in files[:-1]
        }
        if ends:
            off["ends"] = ends
        return off

    # --- bounded advance (the reference's backpressured queue) ------------
    def latestOffset(self) -> dict:
        if self._last_end is None and self._initial is None:
            # FIRST call of a RESTARTED run. This API passes no start
            # offset, and on a restart Spark never calls initialOffset
            # (the start lives in its checkpoint, which the reader
            # can't see) — so a budgeted advance from the CONFIGURED
            # start could land at or behind the committed frontier,
            # and Spark would plan no-op windows forever (measured: a
            # restarted availableNow run stalled at 62/2200 records
            # because the deterministic budget landed exactly ON the
            # frontier). Return the TRUE end: the one recovery batch
            # is unbudgeted but correct (chunk_bytes still splits it
            # into tasks), and every later trigger budgets from the
            # now-known frontier. FRESH queries (initialOffset just
            # ran, self._initial known) fall through and budget from
            # it — a fresh earliest-start over a large retained log
            # must not void maxBytesPerTrigger; partitions() clamps a
            # regressed end as the restart safety net.
            files = _binlog_files(self.path)
            if files:
                self._last_end = self._true_end(files)
                return self._last_end
        start = self._last_end or self._initial or self.initialOffset()
        budget = self.max_bytes
        files = _binlog_files(self.path)
        f, p = start["file"], start["pos"]
        if files and _file_num(f) < _file_num(files[0]):
            f, p = files[0], 0  # purged prefix: resume at earliest retained
        ends: dict[str, int] = {}
        while budget > 0:
            fp = os.path.join(self.path, f)
            end = _complete_end(fp)
            if p < end:
                nxt = _snap_forward(fp, min(p + budget, end))
                nxt = max(nxt, _snap_forward(fp, p + 1)) if nxt <= p else nxt
                budget -= nxt - p
                p = min(nxt, end)
            later = [n for n in files if _file_num(n) > _file_num(f)]
            if p >= end and later and budget > 0:
                # ROTATE: rollover keeps the composite order monotone. Pin
                # the consumed end so a replayed plan of this batch stays
                # byte-identical even if the file's torn tail completes.
                ends[f] = end
                f, p = later[0], 0
            else:
                break
        self._last_end = {"file": f, "pos": p}
        if ends:
            self._last_end["ends"] = ends
        return self._last_end

    def partitions(self, start: dict, end: dict):
        # defensive frontier clamp: if a stale end ever lands behind the
        # batch's start (the restart hazard above), learn the true
        # frontier from the start Spark DOES know, so the next
        # latestOffset advances instead of replanning no-ops forever
        if (_file_num(end["file"]), end["pos"]) < (_file_num(start["file"]), start["pos"]):
            self._last_end = dict(start)
            return [BinlogRange(self.path, start["file"], start["pos"], start["pos"])]
        parts = _plan(self.path, start, end, self.chunk_bytes)
        # Spark requires ≥1 partition per batch; an empty advance still
        # needs a no-op range
        return parts or [BinlogRange(self.path, start["file"], start["pos"], start["pos"])]

    def read(self, partition: BinlogRange):
        return _read_range(partition)

    def commit(self, end: dict) -> None:
        # retention is the log owner's concern (MySQL expire_logs_days);
        # remember the committed frontier so a restarted latestOffset
        # can't re-shrink the plan window
        if self._last_end is None or (_file_num(end["file"]), end["pos"]) > (
            _file_num(self._last_end["file"]),
            self._last_end["pos"],
        ):
            self._last_end = end


class BinlogBatchReader(DataSourceReader):
    """Bounded (catchup) read of the same log: (lower, upper] position
    range via options — the T8 bounded-range cut executed directly
    against the transport."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("binlog source requires a 'path' option")
        self.chunk_bytes = int(options.get("chunkbytes", 8 << 20))
        self.lower = options.get("lowerbound")  # 'file:<name>:<off>' exclusive
        self.upper = options.get("upperbound")  # inclusive

    @staticmethod
    def _parse_bound(which: str, bound: str) -> tuple[str, int]:
        # validate the 'file:' prefix instead of blindly stripping 5
        # chars: a malformed bound would otherwise name a nonexistent
        # file, silently widening the T8 cut to the whole log
        if not bound.startswith("file:"):
            raise ValueError(f"unparseable {which}: {bound!r} (expected 'file:<name>:<off>')")
        fn, _, off = bound[len("file:") :].rpartition(":")
        if not fn or not off.isdigit():
            raise ValueError(f"unparseable {which}: {bound!r} (expected 'file:<name>:<off>')")
        return fn, int(off)

    def partitions(self):
        files = _binlog_files(self.path)
        if not files:
            return [BinlogRange(self.path, f"{FILE_PREFIX}000001", 0, 0)]
        start = {"file": files[0], "pos": 0}
        if self.lower:
            fn, off = self._parse_bound("lowerBound", self.lower)
            start = {"file": fn, "pos": _snap_forward(os.path.join(self.path, fn), off)}
        last = files[-1]
        end = {"file": last, "pos": _complete_end(os.path.join(self.path, last))}
        if self.upper:
            fn, off = self._parse_bound("upperBound", self.upper)
            end = {"file": fn, "pos": _snap_forward(os.path.join(self.path, fn), off)}
        if start["file"] not in files and self.lower:
            raise ValueError(f"lowerBound names unknown binlog file: {start['file']!r}")
        if end["file"] not in files and self.upper:
            raise ValueError(f"upperBound names unknown binlog file: {end['file']!r}")
        return _plan(self.path, start, end, self.chunk_bytes)

    def read(self, partition: BinlogRange):
        return _read_range(partition)


class BinlogDataSource(DataSource):
    """spark.readStream.format("xxt_binlog").option("path", dir)"""

    @classmethod
    def name(cls) -> str:
        return "xxt_binlog"

    def schema(self):
        return CHANGE_EVENT_SCHEMA

    def streamReader(self, schema):
        return BinlogStreamReader({k.lower(): v for k, v in self.options.items()})

    def reader(self, schema):
        return BinlogBatchReader({k.lower(): v for k, v in self.options.items()})


def register(spark) -> None:
    spark.dataSource.register(BinlogDataSource)


def read_binlog_stream(
    spark,
    path: str,
    starting_position: str | None = None,
    starting_gtids: str | None = None,
    max_bytes_per_trigger: int | None = None,
):
    """Streaming envelope frame from the binlog transport (S1)."""
    register(spark)
    r = spark.readStream.format("xxt_binlog").option("path", path)
    if starting_position:
        r = r.option("startingPosition", starting_position)
    if starting_gtids is not None:
        r = r.option("startingGtids", starting_gtids)
    if max_bytes_per_trigger:
        r = r.option("maxBytesPerTrigger", str(max_bytes_per_trigger))
    return r.load()


# --- the "master" side: an append/rotate log writer for tests & demos ----
def encode_record(rec: dict) -> str:
    """THE wire encoding for one binlog record — a compact JSON line.

    Every producer of log bytes (BinlogLogWriter here, the distributed
    fixture writer in queries/cdc.py) must encode through this one
    function so the on-disk format the reader parses cannot silently
    fork between writers: timestamps (datetime or pandas Timestamp)
    render as isoformat, NaN/NaT scrub to JSON null.
    """
    rec = dict(rec)
    ts = rec.get("ts")
    if ts is not None and not isinstance(ts, str):
        rec["ts"] = None if ts != ts else ts.isoformat()  # NaT != NaT
    rec = {k: (None if (v is None or v != v) else v) for k, v in rec.items()}
    return json.dumps(rec, separators=(",", ":"))


class BinlogLogWriter:
    """Appends change records as JSON lines; ``rotate()`` starts the
    next file (offsets reset to 0, like a real ROTATE event)."""

    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(path, exist_ok=True)
        files = _binlog_files(path)
        self.current = files[-1] if files else f"{FILE_PREFIX}000001"

    def _fp(self) -> str:
        return os.path.join(self.path, self.current)

    def append(self, records: list[dict]) -> tuple[str, int]:
        """Append records; returns the (file, end-offset) position after
        the write — what a master reports as its current position."""
        buf = io.StringIO()
        for r in records:
            buf.write(encode_record(r) + "\n")
        with open(self._fp(), "a", encoding="utf-8") as f:
            f.write(buf.getvalue())
            f.flush()
            os.fsync(f.fileno())
            endpos = f.tell()
        return (self.current, endpos)

    def rotate(self) -> str:
        n = int(self.current.rsplit(".", 1)[-1])
        self.current = f"{FILE_PREFIX}{n + 1:06d}"
        # a zero-length next file makes the rollover visible to readers
        open(self._fp(), "a").close()
        return self.current
