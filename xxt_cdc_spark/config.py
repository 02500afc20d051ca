"""Engine configuration + validation.

Parity target: CDCConfig (reference config/CDCConfig.scala:20-96 —
defaults: partitionCount=64, applyWorkerCount=8, batchSize=100,
flushInterval=1s, commitInterval=5s) and ConfigValidator
(config/ConfigLoader.scala:148-331).

In the Spark engine several reference knobs collapse into Spark confs
(flush interval → trigger, commit interval → checkpoint cadence); they
are kept here with the same names so reference configs translate 1:1.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class SourceConfig:
    host: str = "localhost"
    port: int = 3306
    database: str = "testdb"
    username: str = "cdc"
    password: str = ""  # pragma: allowlist secret
    server_id: int = 5652

    def jdbc_url(self) -> str:
        return f"jdbc:mysql://{self.host}:{self.port}/{self.database}"


@dataclass
class SinkConfig:
    kind: str = "mysql"  # mysql | starrocks | sqlite | parquet
    host: str = "localhost"
    port: int = 3306
    database: str = "target"
    username: str = "cdc"
    password: str = ""  # pragma: allowlist secret
    batch_size: int = 500


@dataclass
class ParallelismConfig:
    partition_count: int = 64  # reference default (CDCConfig.scala:92)
    apply_worker_count: int = 8  # :93 — informational; Spark tasks do the work
    batch_size: int = 100  # :94 — micro-batch admission, not a hard group
    flush_interval_s: float = 1.0  # trigger(processingTime)
    commit_interval_s: float = 5.0  # checkpoint commits once per batch anyway


@dataclass
class SnapshotConfig:
    enabled: bool = True
    chunk_count: int = 8  # PK-range chunks per table (S6)
    fetch_size: int = 1000


@dataclass
class CDCConfig:
    source: SourceConfig = field(default_factory=SourceConfig)
    sink: SinkConfig = field(default_factory=SinkConfig)
    parallelism: ParallelismConfig = field(default_factory=ParallelismConfig)
    snapshot: SnapshotConfig = field(default_factory=SnapshotConfig)
    include_databases: list[str] = field(default_factory=list)
    exclude_databases: list[str] = field(default_factory=list)
    include_tables: list[str] = field(default_factory=list)
    exclude_tables: list[str] = field(default_factory=list)
    checkpoint_dir: str = "/tmp/xxt-cdc-checkpoint"
    dead_letter_dir: str | None = None

    def validate(self) -> list[str]:
        """Config validation parity (ConfigLoader.scala:148-331):
        returns problems instead of raising, so callers can report all
        at once."""
        problems: list[str] = []
        p = self.parallelism
        if not (1 <= p.partition_count <= 4096):
            problems.append(f"partition_count out of range [1,4096]: {p.partition_count}")
        if not (1 <= p.apply_worker_count <= 256):
            problems.append(f"apply_worker_count out of range [1,256]: {p.apply_worker_count}")
        if not (1 <= p.batch_size <= 100_000):
            problems.append(f"batch_size out of range [1,100000]: {p.batch_size}")
        if p.flush_interval_s <= 0:
            problems.append("flush_interval_s must be positive")
        if p.commit_interval_s < p.flush_interval_s:
            problems.append("commit_interval_s must be >= flush_interval_s")
        if self.snapshot.chunk_count < 1:
            problems.append("snapshot.chunk_count must be >= 1")
        if self.sink.kind not in ("mysql", "starrocks", "sqlite", "parquet"):
            problems.append(f"unknown sink kind: {self.sink.kind}")
        if not self.checkpoint_dir:
            problems.append("checkpoint_dir is required")
        from xxt_cdc_spark.operators.table_filter import TableFilter

        problems.extend(
            TableFilter(
                self.include_databases,
                self.exclude_databases,
                self.include_tables,
                self.exclude_tables,
            ).validate()
        )
        return problems


def load_config(path: str) -> CDCConfig:
    """Load CDCConfig from a TOML or JSON file (ConfigLoader parity,
    reference config/ConfigLoader.scala:24-73). Unknown keys are
    rejected — misspelled config should fail loudly, not silently
    default (the validator posture of ConfigLoader.scala:148-331).
    """
    if path.endswith(".toml"):
        import tomllib

        with open(path, "rb") as f:
            raw = tomllib.load(f)
    else:
        with open(path) as f:
            raw = json.load(f)

    def build(cls, data: dict):
        known = {f.name for f in cls.__dataclass_fields__.values()}  # type: ignore[attr-defined]
        unknown = set(data) - known
        if unknown:
            raise ValueError(f"unknown {cls.__name__} keys: {sorted(unknown)}")
        return cls(**data)

    sections = {
        "source": SourceConfig,
        "sink": SinkConfig,
        "parallelism": ParallelismConfig,
        "snapshot": SnapshotConfig,
    }
    kwargs = {}
    for name, cls in sections.items():
        if name in raw:
            kwargs[name] = build(cls, raw.pop(name))
    cfg = build(CDCConfig, {**raw, **kwargs})
    problems = cfg.validate()
    if problems:
        raise ValueError("invalid config: " + "; ".join(problems))
    return cfg
