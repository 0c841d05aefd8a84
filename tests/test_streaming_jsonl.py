"""Streaming JSONL quarantine ingest: cross-micro-batch file discovery,
split and single-pass-routed consumption."""

import json
import os

from htrc_feature_reader_spark.streaming.jsonl import (
    route_good_and_quarantine,
    stream_jsonl,
)


def _write(path, lines):
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for ln in lines:
            f.write(ln + "\n")
    os.rename(tmp, path)  # atomic publish, as a crawler would


def test_stream_jsonl_split_across_micro_batches(spark, tmp_path):
    d = str(tmp_path / "landing")
    os.makedirs(d)
    _write(
        os.path.join(d, "s0.json"),
        [json.dumps({"doc_id": "a", "tokens": [1], "n_tok": 1, "source": "web"}),
         "{oops"],
    )
    good, bad = stream_jsonl(spark, d, required=("doc_id",))
    qg = good.writeStream.format("memory").queryName("sj_good").start()
    qb = bad.writeStream.format("memory").queryName("sj_bad").start()
    try:
        qg.processAllAvailable()
        qb.processAllAvailable()
        assert spark.sql("select doc_id from sj_good").count() == 1
        assert spark.sql("select * from sj_bad").count() == 1
        # second micro-batch: a new shard with a contract-null row
        _write(
            os.path.join(d, "s1.json"),
            [json.dumps({"doc_id": "b", "tokens": [2, 3], "n_tok": 2, "source": "web"}),
             '{"doc_id": null, "tokens": [], "n_tok": 0, "source": "x"}'],
        )
        qg.processAllAvailable()
        qb.processAllAvailable()
        assert {r.doc_id for r in spark.sql("select doc_id from sj_good").collect()} == {"a", "b"}
        raws = [r._corrupt_record for r in spark.sql("select * from sj_bad").collect()]
        assert len(raws) == 2 and "{oops" in raws
        assert all(r for r in raws)  # verbatim lines, never null
    finally:
        qg.stop()
        qb.stop()


def test_stream_jsonl_single_pass_router(spark, tmp_path):
    d = str(tmp_path / "landing2")
    os.makedirs(d)
    _write(
        os.path.join(d, "s0.json"),
        [json.dumps({"doc_id": "a", "tokens": [1], "n_tok": 1, "source": "web"}),
         "not json",
         json.dumps({"doc_id": "c", "tokens": [9], "n_tok": 1, "source": "code"})],
    )
    tagged = stream_jsonl(spark, d, required=("doc_id",), split=False)
    seen = {"good": [], "bad": []}

    def good_fn(df, epoch):
        seen["good"].extend(r.doc_id for r in df.collect())
        assert "_corrupt_record" not in df.columns

    def bad_fn(df, epoch):
        seen["bad"].extend(r._corrupt_record for r in df.collect())

    q = (
        tagged.writeStream.foreachBatch(route_good_and_quarantine(good_fn, bad_fn))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sorted(seen["good"]) == ["a", "c"]
    assert seen["bad"] == ["not json"]


def test_stream_jsonl_validates(spark):
    import pytest

    with pytest.raises(ValueError, match="collides"):
        stream_jsonl(spark, "/nonexistent", corrupt_col="doc_id")
    with pytest.raises(ValueError, match="not in schema"):
        stream_jsonl(spark, "/nonexistent", required=("zzz",))
