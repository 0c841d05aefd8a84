"""Shared shard-store plumbing for the incremental dedup stores
(:mod:`.digest_store`, :mod:`.signature_store`): both are append-only
directories of parquet shards with the same read/compact contract, so the
existence probe and the compaction dance live once here.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def read_shard_store(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """A shard store as a DataFrame of ``schema``. A missing/empty path
    reads as an empty relation (first ingest needs no special casing);
    existence is probed through the Hadoop FileSystem API, NOT
    ``os.path`` — the store lives wherever Spark can write (hdfs://,
    s3a://, ...), and a driver-local ``os.path.isdir`` on such a URI is
    always False, which would silently read every remote store as EMPTY
    and re-admit all previously-seen documents. A genuinely
    missing/shard-less path is the only case that reads empty; any other
    read failure propagates."""
    jvm = spark._jvm
    jsc = spark._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return spark.createDataFrame([], schema)
    it = fs.listFiles(hpath, True)  # recursive
    has_shard = False
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            has_shard = True
            break
    if not has_shard:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(path)


def compact_shard_store(
    spark: SparkSession,
    path: str,
    schema: str,
    dedup: Callable[[DataFrame], DataFrame],
) -> None:
    """Rewrite a shard store as ``dedup(store)`` in one shard set. The
    deduped relation is pinned (localCheckpoint) so it is fully read
    BEFORE the overwrite starts — an overwrite whose source still lazily
    scans the target would read its own partially-deleted input."""
    compacted = dedup(read_shard_store(spark, path, schema)).localCheckpoint(
        eager=True
    )
    compacted.write.mode("overwrite").parquet(path)
