"""Bucketed table layout: shuffle-free co-located joins.

The corpus's hot join key is the volume/document id — chunk labels join
tokenlists on it, metadata joins features on it, dedup verdicts join back
on it. At 100 TB every one of those is a corpus-wide shuffle UNLESS the
tables are written **bucketed** on the key: Spark's bucketing
(``bucketBy`` + ``saveAsTable``) pre-hashes rows into a fixed number of
bucket files, and a join between two tables bucketed the same way
satisfies the join's distribution requirement at read time — the
exchange disappears from the plan entirely, turning the nightly
"re-join features to metadata" job from O(corpus shuffle) into a
map-side zip of co-located bucket files. ``sortBy`` additionally
persists each bucket sorted; Spark elides the join-side Sort too when
``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` (off by
default since honoring stored order pins one reader per bucket file —
a concurrency trade the operator, not this module, should make).

This module is the thin, explicit seam for that layout (Spark only
honors bucketing through the table catalog, not bare
``write.parquet``):

- :func:`write_bucketed` — save a DataFrame as a bucketed (+optionally
  bucket-sorted) parquet table at a caller-controlled path.
- :func:`read_bucketed` — read it back with bucketing metadata intact.

See ``tests/test_bucketed.py`` for the frozen plan property: a
same-bucketing self/two-table join must contain ZERO Exchange nodes.
The companion knob ``spark.sql.sources.bucketing.autoBucketedScan`` and
bucket-count mismatch behavior (``coalesceBucketsInJoin``) are Spark
defaults we deliberately do not override.

Reference parity note: the reference stores one file per volume
(pairtree/stubbytree, resolvers.py) — its "layout" is the filesystem.
Bucketing is the engine-native analog: deterministic key -> file
placement that downstream reads exploit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int,
    key_cols: list[str] | str,
    sort_cols: list[str] | str | None = None,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a bucketed parquet table.

    ``n_buckets`` is a LAYOUT CONTRACT, not a tuning detail: joins are
    exchange-free only between tables with compatible bucket counts
    (equal, or one a multiple with bucket coalescing) on the same keys —
    pick it once per corpus (e.g. 4096 at the 100 TB tier: ~25 GB of
    compressed parquet per bucket) and write every id-keyed table with
    it. ``sort_cols`` persists each bucket pre-sorted so sort-merge
    joins skip their Sort too.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    # pre-partition on the bucket hash (same Murmur3 modulo Spark's
    # bucketing uses): each task then writes exactly ONE bucket file.
    # Without this, every write task emits a file per bucket it touches
    # (tasks x buckets small files at scale), and multi-file buckets make
    # Spark keep the join-side Sort even for sortBy'd tables (per-bucket
    # sorted order is only trusted for single-file buckets).
    df = df.repartition(int(n_buckets), *[df[k] for k in keys])
    w = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(int(n_buckets), *keys)
    )
    if sort_cols:
        sorts = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
        w = w.sortBy(*sorts)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table WITH its bucketing metadata (a bare
    ``read.parquet(path)`` on the same files would forget the layout and
    reintroduce the join shuffles)."""
    return spark.table(table)
