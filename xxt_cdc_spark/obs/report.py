"""Metric rendering: Prometheus exposition text (M33) and the periodic
performance report (M36, reference logging/PerformanceLogger.scala:19-132).

The Prometheus exposition format is plain text, so no client library
is needed — an HTTP handler can serve ``prometheus_text()`` at
/metrics directly.
"""

from __future__ import annotations

from xxt_cdc_spark.obs.metrics import MetricsSnapshot

_PREFIX = "xxt_cdc"


def prometheus_text(m: MetricsSnapshot, labels: dict[str, str] | None = None) -> str:
    """Render the snapshot in Prometheus exposition format."""
    lbl = ""
    if labels:
        inner = ",".join(f'{k}="{v}"' for k, v in sorted(labels.items()))
        lbl = "{" + inner + "}"
    lines = []

    def metric(name: str, kind: str, help_text: str, value) -> None:
        if value is None:
            return
        lines.append(f"# HELP {_PREFIX}_{name} {help_text}")
        lines.append(f"# TYPE {_PREFIX}_{name} {kind}")
        lines.append(f"{_PREFIX}_{name}{lbl} {value}")

    metric("events_ingested_total", "counter", "Change events ingested", m.events_ingested)
    metric("events_applied_total", "counter", "Change events applied to the sink", m.events_applied)
    metric("events_failed_total", "counter", "Change events dead-lettered", m.events_failed)
    metric("batches_total", "counter", "Micro-batches processed", m.batches)
    metric("batch_duration_ms", "gauge", "Last micro-batch duration", m.last_batch_duration_ms)
    metric("input_rows_per_second", "gauge", "Source input rate", m.input_rows_per_second)
    metric("processed_rows_per_second", "gauge", "Processing rate", m.processed_rows_per_second)
    metric("lag_ms", "gauge", "Event-time lag", m.lag_ms)
    metric("error_rate", "gauge", "Failed / total applied", round(m.error_rate, 6))
    metric("uptime_seconds", "gauge", "Engine uptime", round(m.uptime_s, 3))
    for table, count in sorted(m.per_table.items()):
        tl = dict(labels or {})
        tl["table"] = table
        inner = ",".join(f'{k}="{v}"' for k, v in sorted(tl.items()))
        lines.append(f"{_PREFIX}_table_events_total{{{inner}}} {count}")
    return "\n".join(lines) + "\n"


class PerformanceLogger:
    """Periodic box-report emitter (M36 parity, reference
    logging/PerformanceLogger.scala:19-132: a 60 s scheduled report).

    A daemon-thread loop on the driver: every ``interval_s`` renders
    ``performance_report(snapshot_fn())`` through ``emit`` (default:
    stdlib logging at INFO). ``snapshot_fn`` re-reads state each tick,
    so pair it with ``snapshot_from_query`` polling or a live
    MetricsSnapshot.
    """

    def __init__(self, snapshot_fn, interval_s: float = 60.0, emit=None) -> None:
        import logging
        import threading

        self._snapshot_fn = snapshot_fn
        self._interval_s = interval_s
        self._emit = emit or logging.getLogger("xxt_cdc_spark.perf").info
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> "PerformanceLogger":
        import threading

        def loop() -> None:
            while not self._stop.wait(self._interval_s):
                try:
                    self._emit("\n" + performance_report(self._snapshot_fn()))
                except Exception:  # noqa: BLE001 — the report must never kill the pipeline
                    pass

        self._thread = threading.Thread(target=loop, name="cdc-perf-logger", daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)

    def tick(self) -> str:
        """Render one report immediately (also what the loop emits)."""
        return performance_report(self._snapshot_fn())


def performance_report(m: MetricsSnapshot) -> str:
    """60s-style pretty box report (M36 parity)."""
    rows = [
        ("uptime", f"{m.uptime_s:,.0f} s"),
        ("events applied", f"{m.events_applied:,}"),
        ("events failed", f"{m.events_failed:,}"),
        ("TPS since start", f"{m.tps_since_start:,.1f}/s"),
        ("current input rate", f"{m.input_rows_per_second:,.1f}/s"),
        ("last batch", f"{m.last_batch_duration_ms:,.0f} ms"),
        ("error rate", f"{m.error_rate:.2%}"),
        ("lag", "n/a" if m.lag_ms is None else f"{m.lag_ms / 1000:,.1f} s"),
    ]
    width = max(len(k) for k, _ in rows) + 2
    body = [f"| {k.ljust(width)}{v.rjust(18)} |" for k, v in rows]
    bar = "+" + "-" * (width + 21) + "+"
    title = "| CDC performance".ljust(width + 22) + "|"
    return "\n".join([bar, title, bar, *body, bar])
