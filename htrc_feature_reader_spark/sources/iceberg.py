"""Iceberg table access, gated behind runtime availability.

The north rule's production input is an Iceberg table of pre-tokenized
sequences. This environment has no Iceberg runtime jars, so the reader
degrades to path-based parquet with the same call shape; on a cluster with
``iceberg-spark-runtime`` on the classpath and a catalog configured, the
same call reads the real table and ``snapshot_id`` pins the read for the
lineage manifests (plans/manifest.py stores it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


def read_sequences(
    spark: SparkSession,
    table_or_path: str,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Read the sequences table from an Iceberg identifier or a parquet path.

    Iceberg path (catalog.db.table): supports time travel via
    ``snapshot_id`` — the id recorded in checkpoint manifests, so a resumed
    job re-reads the exact snapshot it started from. Parquet fallback
    ignores ``snapshot_id`` (immutable test fixtures).
    """
    looks_like_table = "/" not in table_or_path
    if looks_like_table and iceberg_available(spark):
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", str(snapshot_id))
        return reader.load(table_or_path)
    return spark.read.parquet(table_or_path)


def current_snapshot_id(spark: SparkSession, table: str) -> str:
    """Snapshot id for manifest lineage; parquet fallback returns a content
    fingerprint of the file listing instead."""
    if iceberg_available(spark):
        row = spark.sql(
            f"SELECT snapshot_id FROM {table}.snapshots ORDER BY committed_at DESC LIMIT 1"
        ).first()
        return str(row["snapshot_id"]) if row else "empty"
    import glob
    import hashlib
    import os

    files = sorted(glob.glob(os.path.join(table, "*")))
    sig = hashlib.md5(
        "|".join(f"{os.path.basename(f)}:{os.path.getsize(f)}" for f in files).encode()
    ).hexdigest()
    return f"parquet-{sig[:16]}"
