"""Streaming as-of join agrees with the batch operator on an in-order
replay, honors the exact-match tie rule and tolerance, and carries state
across micro-batches."""

import datetime as dt

from pyspark.sql import functions as F

from htrc_feature_reader_spark.operators import asof_join
from htrc_feature_reader_spark.streaming.asof import stream_asof_join

T0 = dt.datetime(2024, 1, 1)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def _write_streams(spark, tmp_path, build_rows, probe_rows):
    build = spark.createDataFrame(build_rows, "key string, ts timestamp, price double")
    probe = spark.createDataFrame(probe_rows, "key string, ts timestamp, qty long")
    bpath, ppath = str(tmp_path / "build"), str(tmp_path / "probe")
    build.coalesce(1).write.parquet(bpath)
    probe.coalesce(1).write.parquet(ppath)
    bs = spark.readStream.schema(build.schema).parquet(bpath)
    ps = spark.readStream.schema(probe.schema).parquet(ppath)
    return build, probe, bs, ps


def test_stream_asof_matches_batch(spark, tmp_path):
    build_rows = [
        ("a", _mins(m), float(m)) for m in (0, 5, 10, 20)
    ] + [("b", _mins(m), 100.0 + m) for m in (3, 9)]
    probe_rows = [
        ("a", _mins(m), m) for m in (1, 5, 7, 19, 25)
    ] + [("b", _mins(m), m) for m in (2, 9, 30)]
    build, probe, bs, ps = _write_streams(spark, tmp_path, build_rows, probe_rows)

    out = stream_asof_join(ps, bs, on="key", ts="ts")
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("asof_out").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["key"], r["ts"]): (r["qty"], r["price"])
        for r in spark.sql("select * from asof_out").collect()
    }

    batch = asof_join(probe, build, on="key", ts="ts")
    expect = {(r["key"], r["ts"]): (r["qty"], r["price"]) for r in batch.collect()}
    assert got == expect
    # exact-match tie rule: probe at 5 sees the build row at 5
    assert got[("a", _mins(5))] == (5, 5.0)
    # before any build row -> null
    assert got[("b", _mins(2))] == (2, None)


def test_stream_asof_tolerance_and_no_exact(spark, tmp_path):
    build_rows = [("a", _mins(0), 1.0), ("a", _mins(10), 2.0)]
    probe_rows = [("a", _mins(10), 1), ("a", _mins(30), 2)]
    build, probe, bs, ps = _write_streams(spark, tmp_path, build_rows, probe_rows)

    out = stream_asof_join(
        ps, bs, on="key", ts="ts", tolerance_s=600.0, allow_exact_matches=False
    )
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("asof_tol_out").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r["key"], r["ts"]): r["price"]
        for r in spark.sql("select * from asof_tol_out").collect()
    }
    batch = asof_join(
        probe, build, on="key", ts="ts",
        tolerance_s=600.0, allow_exact_matches=False,
    )
    expect = {(r["key"], r["ts"]): r["price"] for r in batch.collect()}
    assert got == expect
    # exact match excluded -> falls back to the earlier row, 10 min = in tol
    assert got[("a", _mins(10))] == 1.0
    # 20 min past the last build row > 600 s tolerance -> null
    assert got[("a", _mins(30))] is None


def test_stream_asof_state_across_micro_batches(spark, tmp_path):
    """A probe row in a later micro-batch is served from state built in an
    earlier one — the cross-batch behavior memory sinks can't fake."""
    build = spark.createDataFrame(
        [("a", _mins(0), 7.0)], "key string, ts timestamp, price double"
    )
    probe1 = spark.createDataFrame(
        [("a", _mins(1), 1)], "key string, ts timestamp, qty long"
    )
    bpath, ppath = str(tmp_path / "build"), str(tmp_path / "probe")
    build.coalesce(1).write.parquet(bpath)
    probe1.coalesce(1).write.parquet(ppath)
    bs = spark.readStream.schema(build.schema).parquet(bpath)
    ps = spark.readStream.schema(probe1.schema).parquet(ppath)

    out = stream_asof_join(ps, bs, on="key", ts="ts")
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("asof_live").start()
    )
    try:
        q.processAllAvailable()
        # second micro-batch: probe only — build values must come from state
        spark.createDataFrame(
            [("a", _mins(2), 2)], "key string, ts timestamp, qty long"
        ).coalesce(1).write.mode("append").parquet(ppath)
        q.processAllAvailable()
        got = {
            (r["key"], r["ts"]): r["price"]
            for r in spark.sql("select * from asof_live").collect()
        }
    finally:
        q.stop()
    assert got == {("a", _mins(1)): 7.0, ("a", _mins(2)): 7.0}
