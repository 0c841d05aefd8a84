"""Example spark-submit job: periodic maintenance of the incremental
dedup stores — compact the exact-dedup digest store and the near-dup
signature store back to one-row-per-key shard sets, with manifest
lineage (shard/row counts before and after) and crash-resume.

    scripts/submit.sh [--master URL] scripts/compact_stores_job.py \
        <digest_store_path> <signature_store_path> [snapshot_id]

Why this job exists: every ingest round (``digest_store.ingest_batch``,
``signature_store.ingest_batch_near_dup``, ``pipeline.ingest_clean_batch``
and their streaming faces) appends ONE new parquet shard per store —
correct forever (the readers are insensitive to duplicate keys), but
after ~10^4 rounds the file listing dominates the store probe and crash
replays may have duplicated keys. Compaction rewrites each store as one
deduplicated shard set; neither store's SEMANTICS change (tested in
tests/test_digest_store.py / test_signature_store.py), so this job can
run on any schedule without coordinating with readers — only with
concurrent WRITERS (serialize compaction with ingests, same rule as
concurrent ingests themselves).

Lineage + resume: each store gets a sibling manifest
(``<store>.compact.json`` — OUTSIDE the store directory, which the
compaction overwrite replaces wholesale) recording shard and row counts
before/after under the given snapshot id. A store whose manifest already
shows this snapshot complete is SKIPPED, so a crash between the two
compactions resumes with only the unfinished store (the mirror of
``resume_write``'s partition-level resume in the other job scripts). A
crash mid-compaction is absorbed by ``compact_shard_store`` itself: the
deduped relation is pinned before the overwrite starts, and the manifest
is only written after the store is rewritten — a torn run re-compacts
from the (idempotent) result.
"""

import json
import os
import sys

from pyspark.sql import SparkSession

from htrc_feature_reader_spark.sources.digest_store import (
    compact_digest_store,
    read_digest_store,
)
from htrc_feature_reader_spark.sources.signature_store import (
    compact_signature_store,
    read_signature_store,
)


def _manifest_path(store_path: str) -> str:
    return store_path.rstrip("/") + ".compact.json"


def _count_shards(spark: SparkSession, path: str) -> int:
    """Parquet shard files under the store, via the Hadoop FS API (the
    store lives wherever Spark can write — hdfs://, s3a://, ...)."""
    jvm, jsc = spark._jvm, spark._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return 0
    it, n = fs.listFiles(hpath, True), 0
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            n += 1
    return n


def compact_one(spark, kind, path, reader, compactor, snapshot) -> dict:
    mp = _manifest_path(path)
    if os.path.exists(mp):
        with open(mp) as f:
            prev = json.load(f)
        if prev.get("snapshot_id") == snapshot and prev.get("status") == "complete":
            print(f"{kind}: snapshot {snapshot!r} already compacted — skipping")
            return prev

    before = {
        "shards": _count_shards(spark, path),
        "rows": reader(spark, path).count(),
    }
    compactor(spark, path)
    after = {
        "shards": _count_shards(spark, path),
        "rows": reader(spark, path).count(),
    }
    manifest = {
        "store": kind,
        "path": path,
        "snapshot_id": snapshot,
        "status": "complete",
        "shards_before": before["shards"],
        "shards_after": after["shards"],
        "rows_before": before["rows"],
        "rows_after": after["rows"],
    }
    # atomic publish AFTER the store is rewritten: a crash before this
    # line re-runs the (idempotent) compaction on resume
    tmp = mp + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, mp)
    print(
        f"{kind}: shards {before['shards']} -> {after['shards']}, "
        f"rows {before['rows']} -> {after['rows']}"
    )
    return manifest


def main() -> None:
    digest_path, sig_path = sys.argv[1], sys.argv[2]
    snapshot = sys.argv[3] if len(sys.argv) > 3 else "unversioned"
    spark = SparkSession.builder.appName("compact-stores").getOrCreate()

    m1 = compact_one(
        spark, "digest", digest_path,
        read_digest_store, compact_digest_store, snapshot,
    )
    m2 = compact_one(
        spark, "signature", sig_path,
        read_signature_store, compact_signature_store, snapshot,
    )
    print(
        f"maintenance complete: digest rows {m1['rows_after']} "
        f"({m1['shards_after']} shards), signature rows {m2['rows_after']} "
        f"({m2['shards_after']} shards)"
    )


if __name__ == "__main__":
    main()
