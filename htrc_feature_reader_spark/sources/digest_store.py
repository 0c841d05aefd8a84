"""Incremental exact-dedup digest store: index the corpus ONCE, dedup
every future ingest batch against it.

The reference's one-shot model (and :func:`..operators.dedup.exact_duplicates`)
dedups a corpus against itself; a production training-data pipeline ingests
*continuously* and must ask "have we EVER seen this content?" without
re-scanning 100 TB of history. The store holds one row per distinct
content digest (16 bytes + provenance) — ~10^4x smaller than the corpus —
and each ingest is:

1. digest the batch map-side (:func:`..operators.dedup.content_digest`),
2. keep one survivor per digest WITHIN the batch (min id — same
   survivorship rule as ``exact_duplicates``),
3. LEFT ANTI join against the store on digest (AQE picks broadcast for
   small ingests, shuffle join for bulk backfills — unhinted), and
4. append the survivors' digests as a new parquet shard —
   the next batch sees them without any rewrite of prior shards.

Appends are shard-granular (one directory, additive files), so a crashed
ingest leaves at worst an orphan shard whose digests re-drop the same
content — convergent, never corpus-corrupting. Re-ingesting an already
recorded batch is a no-op (anti join drops everything). Concurrent
ingests of DISJOINT batches are safe (append-only); concurrent ingests
that share content may both keep a copy — serialize ingests or run a
periodic ``compact_digest_store`` if that matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import content_digest
from .store_common import (
    compact_shard_store,
    read_shard_store,
    require_integral_id,
)

_SCHEMA = "digest string, keep_id long"


def read_digest_store(spark: SparkSession, path: str) -> DataFrame:
    """The store as a DataFrame (digest, keep_id). Empty store (no dir /
    no shards yet) reads as an empty relation, so first-ingest needs no
    special casing. Shards may repeat a digest only after concurrent
    same-content ingests; ``dedup_against_store`` is insensitive to that
    (anti join), and ``compact_digest_store`` restores one-row-per-digest.

    Existence is probed through the Hadoop FileSystem API, NOT
    ``os.path``: the store lives wherever Spark can write (hdfs://,
    s3a://, ...), and a driver-local ``os.path.isdir`` on such a URI is
    always False — every ingest would silently anti-join against an
    EMPTY store and re-admit all previously-seen documents. A genuinely
    missing/empty path is the only case that reads empty; any other read
    failure propagates. (Probe + shard scan shared with the signature
    store via :func:`.store_common.read_shard_store`.)"""
    return read_shard_store(spark, path, _SCHEMA)


def dedup_against_store(
    docs: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = False,
) -> DataFrame:
    """Batch rows surviving BOTH within-batch exact dedup (min ``id_col``
    per digest) and the store (never-seen digests only). Returns the
    surviving input rows plus their ``digest`` column (so the caller can
    append them via :func:`append_digests` after downstream filters)."""
    from pyspark.sql.window import Window

    digested = docs.withColumn("digest", content_digest(text_col, normalize))
    # within-batch survivorship: one hash-partitioned window (a single
    # shuffle on digest), no self-join
    w = Window.partitionBy("digest").orderBy(F.col(id_col).asc())
    survivors = (
        digested.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )
    return survivors.join(
        store.select("digest"), on="digest", how="left_anti"
    )


def append_digests(
    survivors: DataFrame, path: str, id_col: str = "doc_id"
) -> None:
    """Record a batch's surviving digests as a new store shard (parquet
    append — additive files, prior shards untouched). Raises eagerly on a
    non-integral id (:func:`.store_common.require_integral_id` — a string
    id would silently store keep_id NULL)."""
    require_integral_id(survivors, id_col, "append_digests")
    (
        survivors.select("digest", F.col(id_col).cast("long").alias("keep_id"))
        .write.mode("append")
        .parquet(path)
    )


def ingest_batch(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = False,
    out_path: str | None = None,
) -> DataFrame:
    """One ingest round: dedup ``docs`` against the store at ``path``,
    record the survivors' digests, and return the survivors (an EAGER
    call — the anti join must run before the append so the new shard
    cannot influence its own batch's decisions).

    Crash-ordering contract: pass ``out_path`` whenever the survivors
    are destined for a sink, so the DATA lands (append) BEFORE the
    digests are recorded. A crash between the two then leaves the batch
    unrecorded and a re-run re-admits it — duplicate output rows at
    worst (at-least-once; downstream exact dedup or the store's next
    compact absorbs them). The reverse order (digests first) turns the
    same crash into silent permanent loss: the replay's anti join drops
    every row of the batch as "already seen" while ``out_path`` never
    received it. Callers that instead consume the returned survivors
    must accept that loss window or persist before recording themselves.
    """
    spark = docs.sparkSession
    # validate BEFORE any work or write: a string id would otherwise land
    # as NULL keep_id in the store after out_path data already shipped
    require_integral_id(docs, id_col, "ingest_batch")
    survivors = dedup_against_store(
        docs, read_digest_store(spark, path), text_col, id_col, normalize
    ).localCheckpoint(eager=True)  # pin decisions before the store mutates
    if out_path is not None:
        survivors.write.mode("append").parquet(out_path)
    append_digests(survivors, path, id_col)
    return survivors


def compact_digest_store(spark: SparkSession, path: str) -> None:
    """Rewrite the store to one row per digest (min keep_id) in one shard
    set — run periodically if concurrent ingests may have duplicated
    digests or shard counts have grown past the file-listing comfort
    zone. Not required for correctness of ``dedup_against_store``."""
    compact_shard_store(
        spark, path, _SCHEMA,
        lambda st: st.groupBy("digest").agg(F.min("keep_id").alias("keep_id")),
    )
