"""Custom stateful streaming operators via ``applyInPandasWithState``.

Where the built-in windows/dedup (streaming/events.py) end, arbitrary
per-key state begins: Spark hands each key's micro-batch rows to Python as
Arrow-backed pandas frames plus a ``GroupState`` handle.  This module keeps
the state tiny and fixed-width (a few scalars per key) so per-key state is
O(1) and the operator scales to any key cardinality the state store holds.

Operator: running per-user totals with a high-value anomaly flag -- the
"custom stateful operator" shape (fraud counters, rate limiters, feature
freshness) that neither windows nor dropDuplicates can express, because
state must accumulate *across* windows for the stream's lifetime.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

#: per-key state: fixed-width scalars only (no per-event history).
STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("max_value", DoubleType()),
        StructField("anomaly", BooleanType()),
    ]
)


def _update_user_totals(threshold: float):
    def fn(
        key: tuple[Any, ...],
        pdfs: "Iterator[pd.DataFrame]",
        state: GroupState,
    ) -> "Iterator[pd.DataFrame]":
        import pandas as pd

        n, s, mx = (
            state.get if state.exists else (0, 0.0, float("-inf"))
        )
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
            mx = max(mx, float(pdf["value"].max()))
        state.update((n, s, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_value": [round(s, 6)],
                "max_value": [mx],
                "anomaly": [mx >= threshold],
            }
        )

    return fn


def running_user_totals_stream(
    events: DataFrame, anomaly_threshold: float = 190.0
) -> DataFrame:
    """Per-user lifetime totals, one updated row per user per micro-batch.

    Output mode is ``update``; each emitted row carries the totals *after*
    the batch, so the last row per user equals the global batch aggregate --
    the property the stream/batch parity test asserts.
    """
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_user_totals(anomaly_threshold),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_to_memory_sink(stream_df: DataFrame, query_name: str):
    """Drain a stateful stream (update mode) into an in-memory table."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 arbitrary-state API)
# ---------------------------------------------------------------------------

def tws_available() -> bool:
    """Whether transformWithStateInPandas can RUN here: the Python worker
    side of the new state protocol speaks protobuf, which this container
    does not ship -- same optional-dependency posture as the multimodal
    codecs (operators/multimodal.py): the operator below is real and the
    parity test skips with a named reason when the runtime dependency is
    absent."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except Exception:
        return False


def running_user_totals_tws(
    events: DataFrame, anomaly_threshold: float = 190.0
) -> DataFrame:
    """The same running per-user totals operator on the MODERN stateful
    API (``transformWithStateInPandas``, Spark 4): a StatefulProcessor
    with a named ValueState slot instead of the single opaque GroupState
    tuple.  Functionally identical to
    :func:`running_user_totals_stream`; operationally the new API is the
    forward path at scale -- multiple named state variables, state TTL,
    processing/event-time timers, and schema evolution of state, none of
    which ``applyInPandasWithState`` offers.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...state.RocksDBStateStoreProvider``) -- the HDFS-backed default
    does not implement the new operator's column-family state layout.
    """
    import pandas as pd
    from pyspark.sql.streaming import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, s, mx = (
                self._state.get()
                if self._state.exists()
                else (0, 0.0, float("-inf"))
            )
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
                mx = max(mx, float(pdf["value"].max()))
            self._state.update((n, s, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value": [round(s, 6)],
                    "max_value": [mx],
                    "anomaly": [mx >= anomaly_threshold],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_Totals(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
