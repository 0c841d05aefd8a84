"""Custom stateful streaming operator (applyInPandasWithState ffill) agrees
with the batch forward_fill on an in-order replay."""

import datetime as dt

from pyspark.sql import functions as F

from htrc_feature_reader_spark.operators import forward_fill
from htrc_feature_reader_spark.streaming.stateful import stream_forward_fill

T0 = dt.datetime(2024, 1, 1)


def test_stream_ffill_matches_batch(spark, tmp_path):
    rows = []
    for k in ("a", "b"):
        for i in range(20):
            val = float(i) if i % 3 == 0 else None
            rows.append((k, T0 + dt.timedelta(minutes=i), val))
    df = spark.createDataFrame(rows, "key string, ts timestamp, value double")
    path = str(tmp_path / "stream_in")
    df.coalesce(1).write.parquet(path)  # one file = one ordered micro-batch

    sdf = stream_forward_fill(spark, path, df.schema)
    q = (
        sdf.writeStream.outputMode("append").format("memory")
        .queryName("ffill_out").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["key"], r["ts"]): r["filled"]
        for r in spark.sql("select * from ffill_out").collect()
    }

    batch = forward_fill(df, ["value"], key="key", ts="ts", suffix="_f")
    expect = {(r["key"], r["ts"]): r["value_f"] for r in batch.collect()}
    assert got == expect
    # state carried within the batch: nulls between anchors are filled
    assert got[("a", T0 + dt.timedelta(minutes=4))] == 3.0
