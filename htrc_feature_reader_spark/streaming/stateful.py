"""Custom stateful streaming operator: streaming forward-fill / as-of state.

``applyInPandasWithState`` keeps one tiny state row per entity — (last event
time, last value) — and enriches every incoming event with the most recent
value at-or-before it. This is the streaming face of the batch as-of join
(operators/asof.py): same semantics for in-order data, state bounded by
#entities (the watermark story for late data lives with the caller's
``withWatermark``).

Pattern notes (the part the north rule cares about):
- state is per-key and O(1) — a 1000-executor cluster shards keys, so
  state memory scales out;
- within one micro-batch the group's rows are sorted by event time before
  applying state, so replaying a backlog with availableNow gives the same
  result as the batch operator (tested in tests/test_streaming.py);
- out-of-order rows ACROSS micro-batches fall back to last-known state —
  the documented streaming relaxation (batch as-of is the exact oracle).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


_OUT_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("filled", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("last_ts", TimestampType()),
        StructField("last_val", DoubleType()),
    ]
)


def stream_forward_fill(
    spark: SparkSession,
    path: str,
    schema: StructType,
    key: str = "key",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Streaming forward-fill over a file-source stream.

    Input schema must contain (key, ts, value); output adds ``filled``.
    """
    from pyspark.sql import functions as F

    events = (
        spark.readStream.schema(schema).parquet(path)
        .select(F.col(key).alias("key"), F.col(ts).alias("ts"), F.col(value).alias("value"))
    )

    # NB: defined as a closure, not module-level — cloudpickle then ships it
    # by value, so executors don't need this package importable (works under
    # bare spark-submit without --py-files, and from any driver cwd).
    def fill_fn(group_key, batches: Iterator[pd.DataFrame], state: GroupState):
        last_ts, last_val = state.get if state.exists else (None, None)
        for pdf in batches:
            pdf = pdf.sort_values("ts", kind="mergesort")
            out_vals = []
            for ev_ts, val in zip(pdf["ts"], pdf["value"]):
                if not pd.isna(val):
                    last_ts, last_val = ev_ts, float(val)
                out_vals.append(last_val)
            yield pd.DataFrame(
                {
                    "key": [group_key[0]] * len(pdf),
                    "ts": pdf["ts"],
                    "value": pdf["value"],
                    "filled": out_vals,
                }
            )
        state.update((last_ts, last_val))

    return events.groupBy("key").applyInPandasWithState(
        fill_fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
