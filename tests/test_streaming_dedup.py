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


def test_stream_ingest_against_store_cross_restart(spark, tmp_path):
    """The store-backed streaming ingest dedups across micro-batches AND
    across query RESTARTS with a fresh checkpoint — state lives in the
    store's parquet shards, not the state store. Also exercises the
    batch/stream boundary: a batch ingest_batch round pre-seeds what the
    stream then respects."""
    from htrc_feature_reader_spark.sources.digest_store import (
        ingest_batch, read_digest_store)
    from htrc_feature_reader_spark.streaming.dedup import (
        stream_ingest_against_store)

    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    src = str(tmp_path / "src")
    schema = "doc_id long, text string"

    # batch pre-seed: doc 0 recorded by a plain (non-streaming) ingest
    ingest_batch(spark.createDataFrame([(0, "seeded")], schema), store)

    d1 = spark.createDataFrame([(1, "aa"), (2, "aa"), (3, "seeded")], schema)
    d1.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(d1.schema).parquet(src)
    q = stream_ingest_against_store(
        stream, store, out, str(tmp_path / "ck1"))
    try:
        q.processAllAvailable()
        # within-batch dup (2) and batch-seeded dup (3) suppressed
        assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1}
        # later micro-batch: dup of earlier stream batch suppressed
        spark.createDataFrame([(4, "aa"), (5, "bb")], schema) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1, 5}
    finally:
        q.stop()

    # restart with a FRESH checkpoint and new data: store still remembers
    spark.createDataFrame([(6, "bb"), (7, "cc")], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    q2 = stream_ingest_against_store(
        spark.readStream.schema(d1.schema).parquet(src),
        store, out, str(tmp_path / "ck2"))
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    # the fresh checkpoint REPLAYS docs 1-5 (new query reads the whole
    # source) but the store drops every recorded digest: only 7 is new
    assert {r["doc_id"] for r in spark.read.parquet(out).collect()} == {1, 5, 7}
    st = read_digest_store(spark, store)
    assert st.select("digest").distinct().count() == 4  # seeded, aa, bb, cc
