"""Custom stateful streaming operators (applyInPandasWithState).

``suppress_stale``: per-key monotone position gate. Within ONE
micro-batch the LWW collapse (R5) handles ordering; ACROSS batches a
late/replayed event with an already-applied position would still reach
the sink (harmless for idempotent upserts, but wasteful and wrong for
append-style sinks). This operator keeps the max applied position per
key as streaming state and passes only strictly newer events — the
cross-batch generalization of the reference's per-key ordering
guarantee (pipeline/CDCStreamPipeline.scala:100 kept per-key order
only while the process lived; this state survives via the checkpoint).

State size: one long per live key — bounded by the active key set; for
unbounded key spaces pair with a timeout (state TTL) matching the
transport's replay horizon.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from xxt_cdc_spark.model.envelope import CHANGE_EVENT_SCHEMA

_STATE_SCHEMA = "max_pos long"


def _gate(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    max_pos = state.get[0] if state.exists else -1
    out = []
    for pdf in pdfs:
        pdf = pdf.sort_values("pos_offset", kind="mergesort")
        keep = pdf[pdf["pos_offset"] > max_pos]
        if len(keep):
            max_pos = int(keep["pos_offset"].max())
            out.append(keep)
    state.update((max_pos,))
    if out:
        yield pd.concat(out)


def suppress_stale(env: DataFrame, timeout: str = "NoTimeout") -> DataFrame:
    """Envelope stream → envelope stream with stale positions dropped.

    Grouping is by the routing key (db, table, key) — the same key the
    hash router uses, so state co-locates with the apply partition.
    """
    return env.groupBy("db", "table", "key").applyInPandasWithState(
        _gate,
        outputStructType=CHANGE_EVENT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
