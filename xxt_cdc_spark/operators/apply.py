"""Change application — merge a batch of changes into target state.

Parity targets: O19 apply worker (reference
worker/DefaultApplyWorker.scala:31-205 — dispatch by op, batch apply)
and O16 upsert semantics (connector/sink/mysql/MySQLSinkConnector.scala:73-115
— INSERT ... ON DUPLICATE KEY UPDATE / UPDATE / DELETE by PK).

Two forms:

- ``apply_changes``: pure-DataFrame MERGE emulation — given current
  state and a change batch, produce the new state (anti-join + union).
  This is the lakehouse path (no Delta jar in this image, so the MERGE
  is hand-rolled; with Delta it is one ``MERGE INTO``).
- ``merge_into``: same semantics as a helper used by sinks/foreach_batch.

Scale: the anti-join shuffles both sides on the key; change batches
are micro-batches (small vs. 100 TB state), so Catalyst/AQE turns the
join into a broadcast of the collapsed batch — state is NOT rewritten
except for affected partitions when the target is partitioned storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from xxt_cdc_spark.model.envelope import OP_DELETE
from xxt_cdc_spark.operators.collapse import last_write_wins


def apply_changes(
    state: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """New state = (state minus touched keys) ∪ (latest non-delete images).

    ``changes`` carries the payload columns of ``state`` plus ``op_col``
    and ``order_cols``. Idempotent: replaying any suffix of the change
    log yields the same state (effectively-once, reference README.md:526-548).
    """
    latest = last_write_wins(changes, key_cols, order_cols)
    upserts = latest.filter(F.col(op_col) != OP_DELETE).select(*state.columns)
    touched = latest.select(*key_cols)
    kept = state.join(touched, on=key_cols, how="left_anti")
    return kept.unionByName(upserts)


def merge_into(
    state: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    order_cols: list[str] | None = None,
    op_col: str = "op",
) -> DataFrame:
    """Alias with envelope-default ordering columns."""
    return apply_changes(state, changes, key_cols, order_cols or ["pos_file", "pos_offset"], op_col)
