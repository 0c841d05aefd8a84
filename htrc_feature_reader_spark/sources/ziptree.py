"""Distributed ziptree source/sink (reference resolvers.py:257-320).

A 'ziptree' is the reference's zip-sharded volume store: volume ``htid``
lives in ``<dir>/<sha1(htid)[:k]>.zip`` as member
``clean_htid(htid).json[.bz2|.gz]``. The reference populates and reads it
one volume at a time through ``ZiptreeResolver``; here both directions are
Spark jobs:

- **read**: ``spark.read.format("binaryFile")`` fans the zip shards across
  executors; a ``mapInPandas`` stage opens each shard IN MEMORY (zipfiles
  are not splittable — the shard, ~sha1-uniform by construction, is the
  parallel unit) and yields one JSON text per member, decompressed by
  member extension; ``from_json`` with the explicit EF schema turns the
  payloads into exactly the ``read_ef_json`` shape, so every downstream
  extractor (tokenlist/sections/metadata/...) composes unchanged.
- **write**: volumes are grouped by their sha1 shard code (one shuffle)
  and ``applyInPandas`` writes each ``<code>.zip`` in a single task —
  embarrassingly parallel across shards, append-free (each shard written
  once per job), deterministic member names via the reference's filename
  rule.

HTTP/rsync remain non-goals (environment tooling); the ziptree itself is
pure path math + container format, i.e. engine semantics.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EF_JSON_SCHEMA
from .ids import resolver_filename


def _decompress_member(name: str, payload: bytes) -> str:
    if name.endswith(".bz2"):
        import bz2

        return bz2.decompress(payload).decode("utf-8")
    if name.endswith(".gz"):
        import gzip

        return gzip.decompress(payload).decode("utf-8")
    return payload.decode("utf-8")


def read_ef_ziptree(
    spark: SparkSession,
    zip_glob: str,
    member_pattern: str | None = None,
) -> DataFrame:
    """Read every EF volume JSON inside the ziptree's zip shards.

    Returns the ``read_ef_json`` shape (EF schema top level + coalesced
    ``htid``) so all extractors compose. ``member_pattern`` optionally
    restricts members by a substring match on the member name (e.g. one
    cleaned htid) — the filter runs inside the scan task, before any
    decompression of non-matching members.
    """
    shards = spark.read.format("binaryFile").load(zip_glob)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import zipfile

        for pdf in batches:
            out = {"member": [], "js": []}
            for content in pdf["content"]:
                with zipfile.ZipFile(io.BytesIO(bytes(content))) as zf:
                    for name in zf.namelist():
                        if member_pattern is not None and member_pattern not in name:
                            continue
                        out["member"].append(name)
                        out["js"].append(_decompress_member(name, zf.read(name)))
            yield pd.DataFrame(out)

    texts = shards.select("content").mapInPandas(
        extract, schema="member string, js string"
    )
    raw = texts.select(F.from_json("js", EF_JSON_SCHEMA).alias("r")).select("r.*")
    return raw.withColumn("htid", F.coalesce(F.col("htid"), F.col("id")))


def write_ef_ziptree(
    docs: DataFrame,
    dest_dir: str,
    htid_col: str = "htid",
    json_col: str = "json",
    compression: str | None = "bz2",
    hash_chars: int = 3,
) -> DataFrame:
    """Populate a ziptree from (htid, json-text) rows, distributed.

    One shuffle groups volumes by their sha1 shard code; each shard's zip
    is written by exactly one task (atomic tmp+rename publish, re-run
    idempotent). Incremental populate is safe across jobs: a shard that
    already exists is MERGED, not replaced — existing members are carried
    into the rewritten zip and only same-name members (same cleaned htid)
    are overwritten, mirroring the reference resolver's one-volume-at-a-
    time appends (resolvers.py:257-320). Within one job the groupBy
    guarantees a single writer per shard, so read-merge-replace is
    race-free. CONCURRENT populate jobs on one ``dest_dir`` are
    unsupported (their merges could interleave and lose members) and
    detected: each shard write takes an advisory ``<shard>.__lock``
    (atomic O_EXCL) and fails fast with a named error if another job
    holds it; locks older than an hour (a crashed job) are broken. Returns a lineage DataFrame (zipfile, n_members, n_bytes)
    describing the resulting shards; the write runs when it is
    materialized.
    """
    if compression not in (None, "bz2", "gz"):
        raise ValueError(f"unknown compression {compression!r}")
    os.makedirs(dest_dir, exist_ok=True)

    # shard code JVM-side: sha1 is a built-in (no Python in the plan);
    # parity with ids.ziptree_zipfile is pinned by test
    if hash_chars == 0:
        zip_expr = F.lit("features.zip")
    else:
        zip_expr = F.concat(
            F.substring(F.sha1(F.col(htid_col).cast("binary")), 1, hash_chars),
            F.lit(".zip"),
        )
    tagged = docs.select(
        F.col(htid_col).alias("__htid"),
        F.col(json_col).alias("__js"),
        zip_expr.alias("__zip"),
    )

    app_id = docs.sparkSession.sparkContext.applicationId

    def write_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        import time
        import zipfile

        zname = pdf["__zip"].iloc[0]
        dest = os.path.join(dest_dir, zname)
        tmp = dest + f".__tmp_{os.getpid()}"
        # Encode members BEFORE taking the lock: encoding touches no
        # shared state, and an encode error (bad payload) must not leave
        # an orphaned lock behind.
        new: dict[str, bytes] = {}
        for h, js in zip(pdf["__htid"], pdf["__js"]):
            member = resolver_filename(h, "json", compression)
            payload = js.encode("utf-8")
            if compression == "bz2":
                import bz2

                payload = bz2.compress(payload)
            elif compression == "gz":
                import gzip
                import io

                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                    g.write(payload)
                payload = buf.getvalue()
            new[member] = payload
        # Advisory per-shard lock around the read-merge-replace critical
        # section only: within one job the groupBy guarantees a single
        # LIVE writer per shard, so a foreign-job lock means a CONCURRENT
        # populate on the same dest_dir — whose read-merge-replace would
        # interleave with ours and silently lose members. Fail fast and
        # name that condition. O_EXCL is atomic on POSIX and HDFS-backed
        # NFS. The lock payload carries the Spark application id: a lock
        # left by a crashed attempt of THIS job (task retry — finally
        # never ran, e.g. executor OOM-kill) is recognized by matching
        # app id and broken immediately, so retries stay routinely
        # recoverable instead of failing the job; a FOREIGN lock is only
        # broken once older than _LOCK_STALE_S.
        lock = dest + ".__lock"
        _LOCK_STALE_S = 3600
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(fd, f"{app_id} {os.getpid()} {time.time()}".encode())
            os.close(fd)
        except FileExistsError:
            try:
                with open(lock) as lf:
                    owner = lf.read().split(" ", 1)[0]
            except OSError:
                owner = ""  # vanished: the other writer just finished
            try:
                stale = time.time() - os.path.getmtime(lock) > _LOCK_STALE_S
            except OSError:
                stale = True
            if owner != app_id and not stale:
                raise RuntimeError(
                    f"concurrent write_ef_ziptree populate detected on shard "
                    f"{dest!r} (lock {lock!r} held by job {owner!r}); "
                    f"concurrent populates of one dest_dir are unsupported — "
                    f"serialize them, or remove the lock if the other job "
                    f"crashed"
                )
            reason = "own retry" if owner == app_id else "broke stale lock"
            with open(lock, "w") as f:
                f.write(f"{app_id} {os.getpid()} {time.time()} ({reason})")
        # MERGE with a pre-existing shard: a 'w'-mode rewrite would delete
        # every prior member that hashed into this shard (incremental
        # populate across jobs would silently lose volumes). Carry old
        # members verbatim; a new member replaces any old member for the
        # SAME VOLUME — compared by htid stem, not raw filename, since the
        # member name embeds the compression extension and a re-populate
        # with a different codec would otherwise leave two members (and
        # read_ef_ziptree would return the volume twice). Shard size is
        # bounded by the sha1 sharding, so holding one shard in memory is
        # the same cost the read path already pays.
        def _stem(name: str) -> str:
            for ext in (".bz2", ".gz"):
                if name.endswith(ext):
                    name = name[: -len(ext)]
            return name

        try:
            new_stems = {_stem(n) for n in new}
            carried: dict[str, bytes] = {}
            if os.path.exists(dest):
                with zipfile.ZipFile(dest) as old:
                    for name in old.namelist():
                        if _stem(name) not in new_stems:
                            carried[name] = old.read(name)
            n_bytes = 0
            with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as zf:
                # deterministic member order -> byte-stable shards
                merged = {**carried, **new}
                for member in sorted(merged):
                    zf.writestr(zipfile.ZipInfo(member), merged[member])
                    n_bytes += len(merged[member])
            os.replace(tmp, dest)
        finally:
            try:
                os.remove(lock)
            except OSError:
                pass
        return pd.DataFrame(
            {"zipfile": [dest], "n_members": [len(merged)], "n_bytes": [n_bytes]}
        )

    return tagged.groupBy("__zip").applyInPandas(
        write_shard, schema="zipfile string, n_members long, n_bytes long"
    )
