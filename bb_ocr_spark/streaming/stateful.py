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


# --------------------------------------------------------------------------
# the same operator on Spark 4's transformWithStateInPandas API
# --------------------------------------------------------------------------


def have_tws() -> bool:
    """transformWithStateInPandas needs protobuf for its state-server
    protocol; this image does not ship google.protobuf (and installs are
    not possible here), so the TWS form is availability-gated exactly
    like the media codec stubs."""
    try:
        from google.protobuf import descriptor  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


def seq_numbered_stream_tws(events: DataFrame) -> DataFrame:
    """Identical semantics to seq_numbered_stream, on the modern
    arbitrary-state API (transformWithStateInPandas): state is a typed
    ValueState handle instead of a packed tuple, timers replace the
    timeout conf, and the processor is an object with an explicit
    lifecycle — the shape new stateful operators should take on Spark 4.
    Output equality with the applyInPandasWithState form is asserted in
    tests when the runtime supports it (see have_tws)."""
    if not have_tws():
        raise NotImplementedError(
            "transformWithStateInPandas requires protobuf, absent in this "
            "image — use seq_numbered_stream (applyInPandasWithState)"
        )
    from pyspark.sql.streaming.stateful_processor import (  # noqa: PLC0415
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (  # noqa: PLC0415
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [
            StructField("seq", LongType()),
            StructField("cnt", LongType()),
            StructField("total", DoubleType()),
        ]
    )

    class SeqProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("seq_state", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd  # noqa: PLC0415

            if self._state.exists():
                seq, cnt, total = self._state.get()
            else:
                seq, cnt, total = 0, 0, 0.0
            for pdf in rows:
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
                    columns=[
                        "user_id", "event_id", "seq",
                        "running_count", "running_value",
                    ],
                )
            self._state.update((seq, cnt, total))

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=SeqProcessor(),
        outputStructType=OUTPUT_DDL,
        outputMode="append",
        timeMode="None",
    )
