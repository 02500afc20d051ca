"""Engine lifecycle + offset state machines.

Parity targets: ``CDCState`` (reference model/CDCState.scala:6-51,
INIT → SNAPSHOT → CATCHUP → STREAMING with legal-transition
validation) and ``OffsetState`` (model/OffsetState.scala:7-44,
RECEIVED → APPLIED → COMMITTED).

In the Spark engine OffsetState is informational: the Structured
Streaming checkpoint (offset WAL + commit log) subsumes per-position
tracking (SURVEY.md C22/C23); the machine is kept for the optional
JDBC offset mirror and for unit-testable protocol parity.
"""

from __future__ import annotations

from enum import Enum


class InvalidTransition(ValueError):
    pass


class CDCState(str, Enum):
    INIT = "INIT"
    SNAPSHOT = "SNAPSHOT"
    CATCHUP = "CATCHUP"
    STREAMING = "STREAMING"
    STOPPED = "STOPPED"
    FAILED = "FAILED"

    def transition(self, to: "CDCState") -> "CDCState":
        legal = _CDC_LEGAL[self]
        if to not in legal:
            raise InvalidTransition(f"illegal CDC transition {self.value} -> {to.value}")
        return to


_CDC_LEGAL: dict[CDCState, frozenset[CDCState]] = {
    CDCState.INIT: frozenset({CDCState.SNAPSHOT, CDCState.STREAMING, CDCState.FAILED, CDCState.STOPPED}),
    CDCState.SNAPSHOT: frozenset({CDCState.CATCHUP, CDCState.FAILED, CDCState.STOPPED}),
    CDCState.CATCHUP: frozenset({CDCState.STREAMING, CDCState.FAILED, CDCState.STOPPED}),
    CDCState.STREAMING: frozenset({CDCState.STOPPED, CDCState.FAILED}),
    CDCState.STOPPED: frozenset(),
    CDCState.FAILED: frozenset({CDCState.INIT}),
}


class OffsetState(str, Enum):
    RECEIVED = "RECEIVED"
    APPLIED = "APPLIED"
    COMMITTED = "COMMITTED"

    def transition(self, to: "OffsetState") -> "OffsetState":
        legal = _OFFSET_LEGAL[self]
        if to not in legal:
            raise InvalidTransition(f"illegal offset transition {self.value} -> {to.value}")
        return to


_OFFSET_LEGAL: dict[OffsetState, frozenset[OffsetState]] = {
    OffsetState.RECEIVED: frozenset({OffsetState.APPLIED}),
    OffsetState.APPLIED: frozenset({OffsetState.COMMITTED}),
    OffsetState.COMMITTED: frozenset(),
}
