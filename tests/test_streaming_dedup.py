"""Streaming exact dedup: first-arrival-wins on the content digest,
state carried across micro-batches, watermarked state expiry wiring."""

import datetime as dt

from htrc_feature_reader_spark.operators.dedup import exact_duplicates
from htrc_feature_reader_spark.streaming.dedup import stream_exact_dedup

T0 = dt.datetime(2024, 1, 1)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def test_stream_dedup_matches_batch_digest_set(spark, tmp_path):
    rows = [
        (1, "alpha beta", _mins(0)),
        (2, "alpha beta", _mins(1)),   # dup of 1
        (3, "gamma", _mins(2)),
        (4, "Alpha  Beta", _mins(3)),  # NOT a dup without normalize
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp")
    src = str(tmp_path / "src")
    docs.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)

    out = stream_exact_dedup(stream, text_col="text")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("dedup_out").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("select * from dedup_out").collect()
    # one row per distinct digest, digest column attached
    assert len(got) == 3
    assert {r["text"] for r in got} == {"alpha beta", "gamma", "Alpha  Beta"}
    assert all(len(r["digest"]) == 32 for r in got)
    # digest set identical to the batch operator's
    batch = {r["digest"] for r in exact_duplicates(docs).collect()}
    assert {r["digest"] for r in got} == batch


def test_stream_dedup_state_across_micro_batches(spark, tmp_path):
    """A duplicate arriving in a LATER micro-batch is suppressed by state
    built in an earlier one."""
    d1 = spark.createDataFrame(
        [(1, "same text", _mins(0))], "doc_id long, text string, ts timestamp"
    )
    src = str(tmp_path / "src")
    d1.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(d1.schema).parquet(src)
    out = stream_exact_dedup(stream, text_col="text")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("dedup_live").start())
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [(2, "same text", _mins(5)), (3, "fresh", _mins(6))],
            "doc_id long, text string, ts timestamp",
        ).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        got = {r["doc_id"] for r in spark.sql("select * from dedup_live").collect()}
    finally:
        q.stop()
    assert got == {1, 3}  # doc 2 suppressed by cross-batch state


def test_stream_dedup_watermarked_and_errors(spark, tmp_path):
    import pytest

    d = spark.createDataFrame(
        [(1, "x", _mins(0)), (2, "x", _mins(1))],
        "doc_id long, text string, ts timestamp",
    )
    src = str(tmp_path / "src")
    d.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(d.schema).parquet(src)

    with pytest.raises(ValueError, match="ts_col"):
        stream_exact_dedup(stream, watermark="1 hour")

    out = stream_exact_dedup(stream, ts_col="ts", watermark="1 hour",
                             normalize=True)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("dedup_wm").trigger(availableNow=True).start())
    q.awaitTermination()
    got = spark.sql("select * from dedup_wm").collect()
    assert len(got) == 1  # within-horizon dup suppressed
