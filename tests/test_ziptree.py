"""Ziptree source/sink (reference resolvers.py:257-320): sha1-sharded zip
store written and read as Spark jobs, round-tripping through the same EF
ingest shape as plain JSON files."""

import bz2
import hashlib
import os
import zipfile

import pytest
from pyspark.sql import functions as F

from htrc_feature_reader_spark.sources.ef_json import read_ef_json, tokenlist_from_ef
from htrc_feature_reader_spark.sources.ids import (
    clean_htid,
    resolver_filename,
    ziptree_zipfile,
)
from htrc_feature_reader_spark.sources.ziptree import (
    read_ef_ziptree,
    write_ef_ziptree,
)

DATA = "/root/reference/tests/data"
FIXTURE = f"{DATA}/frankenstein-15pages.json.bz2"


def test_ziptree_path_math_matches_reference_rule():
    """resolvers.py:270-277: sha1 prefix names the shard; fname rule
    resolvers.py:51-63 (parquet drops compression)."""
    h = "mdp.39015028036104"
    code = hashlib.sha1(h.encode()).hexdigest()[:3]
    assert ziptree_zipfile(h) == f"{code}.zip"
    assert ziptree_zipfile(h, hash_chars=5) == \
        hashlib.sha1(h.encode()).hexdigest()[:5] + ".zip"
    assert ziptree_zipfile(h, hash_chars=0) == "features.zip"
    assert resolver_filename(h) == clean_htid(h) + ".json.bz2"
    assert resolver_filename(h, "json", None) == clean_htid(h) + ".json"
    assert resolver_filename(h, "parquet", "bz2") == clean_htid(h) + ".parquet"
    assert resolver_filename(h, "json", "gz", suffix="meta") == \
        clean_htid(h) + ".meta.json.gz"


@pytest.mark.skipif(not os.path.isfile(FIXTURE), reason="reference fixtures absent")
def test_ziptree_write_read_roundtrip(spark, tmp_path):
    """write_ef_ziptree -> read_ef_ziptree reproduces the exact tokenlist
    of reading the raw JSON; shard naming matches the JVM-side sha1 and
    the reference rule; shard write is idempotent."""
    with open(FIXTURE, "rb") as f:
        js = bz2.decompress(f.read()).decode("utf-8")
    raw = read_ef_json(spark, FIXTURE, multiline=True)
    htid = raw.select("htid").first()["htid"]

    docs = spark.createDataFrame([(htid, js), (htid + "X99", js)],
                                 "htid string, json string")
    dest = str(tmp_path / "ztree")
    metrics = write_ef_ziptree(docs, dest).collect()
    assert sum(m["n_members"] for m in metrics) == 2
    # shard names follow the sha1 rule and members the filename rule
    for h in (htid, htid + "X99"):
        zpath = os.path.join(dest, ziptree_zipfile(h))
        assert os.path.isfile(zpath)
        with zipfile.ZipFile(zpath) as zf:
            assert resolver_filename(h) in zf.namelist()

    back = read_ef_ziptree(spark, f"{dest}/*.zip")
    assert back.count() == 2
    a = sorted(map(tuple, tokenlist_from_ef(raw).collect()))
    b = sorted(map(tuple, tokenlist_from_ef(
        read_ef_ziptree(spark, f"{dest}/*.zip",
                        member_pattern=resolver_filename(htid))
    ).collect()))
    assert a == b and len(a) > 0

    # idempotent re-run: same shards, same member sets
    write_ef_ziptree(docs, dest).collect()
    with zipfile.ZipFile(os.path.join(dest, ziptree_zipfile(htid))) as zf:
        assert len(zf.namelist()) == len(set(zf.namelist()))


@pytest.mark.skipif(not os.path.isfile(FIXTURE), reason="reference fixtures absent")
def test_ziptree_gz_and_plain_members(spark, tmp_path):
    with open(FIXTURE, "rb") as f:
        js = bz2.decompress(f.read()).decode("utf-8")
    docs = spark.createDataFrame([("test.vol1", js)], "htid string, json string")
    for comp in ("gz", None):
        dest = str(tmp_path / f"z_{comp}")
        write_ef_ziptree(docs, dest, compression=comp).collect()
        back = read_ef_ziptree(spark, f"{dest}/*.zip")
        assert back.select("htid").first()["htid"] is not None
        assert tokenlist_from_ef(back).count() > 0

@pytest.mark.skipif(not os.path.isfile(FIXTURE), reason="reference fixtures absent")
def test_ziptree_incremental_populate_merges_shards(spark, tmp_path):
    """A second write_ef_ziptree job over NEW volumes must merge into
    existing shards, not replace them: 'w'-mode rewrites used to delete
    every batch-1 member whose sha1 prefix collided with a batch-2 shard.
    Same-htid rewrites still overwrite their member (update-in-place)."""
    with open(FIXTURE, "rb") as f:
        js = bz2.decompress(f.read()).decode("utf-8")
    dest = str(tmp_path / "ztree")
    # hash_chars=0 -> ONE shard (features.zip): every cross-batch write
    # collides, the worst case for the old clobbering behavior
    b1 = spark.createDataFrame([("vol.a", js), ("vol.b", js)],
                               "htid string, json string")
    write_ef_ziptree(b1, dest, hash_chars=0).collect()
    b2 = spark.createDataFrame([("vol.c", js)], "htid string, json string")
    metrics = write_ef_ziptree(b2, dest, hash_chars=0).collect()
    assert metrics[0]["n_members"] == 3  # lineage reports the merged shard
    with zipfile.ZipFile(os.path.join(dest, "features.zip")) as zf:
        assert sorted(zf.namelist()) == sorted(
            resolver_filename(h) for h in ("vol.a", "vol.b", "vol.c")
        )
    assert read_ef_ziptree(spark, f"{dest}/*.zip").count() == 3

    # same-htid re-write overwrites the member, not duplicates it
    js2 = js.replace('"title"', '"titleX"', 1)
    write_ef_ziptree(
        spark.createDataFrame([("vol.b", js2)], "htid string, json string"),
        dest, hash_chars=0,
    ).collect()
    with zipfile.ZipFile(os.path.join(dest, "features.zip")) as zf:
        names = zf.namelist()
        assert len(names) == 3 and len(set(names)) == 3
        got = bz2.decompress(zf.read(resolver_filename("vol.b"))).decode("utf-8")
    assert got == js2


@pytest.mark.skipif(not os.path.isfile(FIXTURE), reason="reference fixtures absent")
def test_ziptree_repopulate_with_different_codec_replaces_member(spark, tmp_path):
    """Re-populating the SAME volume with a different compression must
    replace its member, not leave two (the merge compares htid stems, not
    raw filenames — the name embeds the codec extension)."""
    with open(FIXTURE, "rb") as f:
        js = bz2.decompress(f.read()).decode("utf-8")
    dest = str(tmp_path / "ztree")
    docs = spark.createDataFrame([("vol.x", js)], "htid string, json string")
    write_ef_ziptree(docs, dest, hash_chars=0, compression="bz2").collect()
    write_ef_ziptree(docs, dest, hash_chars=0, compression="gz").collect()
    with zipfile.ZipFile(os.path.join(dest, "features.zip")) as zf:
        names = zf.namelist()
    assert names == [resolver_filename("vol.x", "json", "gz")], names
    assert read_ef_ziptree(spark, f"{dest}/*.zip").count() == 1


def test_ziptree_concurrent_populate_detected(spark, tmp_path):
    """A live advisory lock on a shard (another populate job mid-write)
    must fail the write loudly instead of interleaving merges; a stale
    lock from a crashed job is broken and the write proceeds."""
    import time

    from htrc_feature_reader_spark.sources.ids import ziptree_zipfile

    dest = str(tmp_path / "zt")
    os.makedirs(dest)
    docs = spark.createDataFrame(
        [("uc2.ark:/13960/t0", '{"a": 1}')], "htid string, json string")
    shard = os.path.join(dest, ziptree_zipfile("uc2.ark:/13960/t0"))
    lock = shard + ".__lock"
    with open(lock, "w") as f:
        f.write("other-job")
    with pytest.raises(Exception, match="concurrent write_ef_ziptree"):
        write_ef_ziptree(docs, dest).collect()
    # stale lock (crashed job): broken, write proceeds, lock released
    old = time.time() - 7200
    os.utime(lock, (old, old))
    assert write_ef_ziptree(docs, dest).collect()[0]["n_members"] == 1
    assert os.path.exists(shard) and not os.path.exists(lock)


def test_ziptree_own_job_retry_breaks_lock(spark, tmp_path):
    """A lock left by a crashed attempt of the SAME job (task retry —
    finally never ran) is recognized by application id and broken
    immediately, so retries stay recoverable instead of job-fatal."""
    from htrc_feature_reader_spark.sources.ids import ziptree_zipfile

    dest = str(tmp_path / "ztretry")
    os.makedirs(dest)
    docs = spark.createDataFrame(
        [("uc2.ark:/13960/t0", '{"a": 1}')], "htid string, json string")
    shard = os.path.join(dest, ziptree_zipfile("uc2.ark:/13960/t0"))
    lock = shard + ".__lock"
    with open(lock, "w") as f:
        f.write(f"{spark.sparkContext.applicationId} 999 0.0")
    out = write_ef_ziptree(docs, dest).collect()  # fresh lock, not stale
    assert out[0].n_members == 1
    assert not os.path.exists(lock)
