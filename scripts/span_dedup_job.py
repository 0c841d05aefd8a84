"""Example spark-submit job: substring-level dedup rewrite, resumable.

    scripts/submit.sh [--master URL] scripts/span_dedup_job.py \
        <documents_parquet> <out_dir> [snapshot_id] [n] [min_count]

Runs ``remove_duplicate_spans`` (drop every non-first occurrence of a
duplicated ``n``-gram window, dual ~62-bit window hashes) over the
documents table and writes the rewritten corpus partitioned by a doc-hash
bucket with per-partition lineage manifests — re-running after a failure
completes only the missing partitions, and ``plans.repair_write`` heals
out-of-band damage. Removal totals come from the manifest-written rows,
never by re-executing the span plan.
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from htrc_feature_reader_spark.operators import remove_duplicate_spans
from htrc_feature_reader_spark.plans import resume_write

N_BUCKETS = 64


def main() -> None:
    docs_path, out_dir = sys.argv[1], sys.argv[2]
    snapshot = sys.argv[3] if len(sys.argv) > 3 else "unversioned"
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    min_count = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    # fold the span parameters into the snapshot id: resuming a partial
    # out_dir with different n/min_count must trip resume_write's
    # snapshot-mismatch guard, not silently mix two removal lineages
    snapshot = f"{snapshot}-n{n}-c{min_count}"
    spark = SparkSession.builder.appName("span-dedup").getOrCreate()

    docs = spark.read.parquet(docs_path)
    rewritten = remove_duplicate_spans(docs, n=n, min_count=min_count)
    out = rewritten.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(N_BUCKETS)).cast("string")
    )
    manifest = resume_write(out, out_dir, "bucket", snapshot_id=snapshot)
    n_docs = sum(p["row_count"] for p in manifest["partitions"].values())
    # token totals from the WRITTEN output (one cheap scan of two int64
    # columns — column pruning reaches the parquet footer stats); an empty
    # corpus writes no parquet at all, so skip the read rather than die
    # on schema inference after the write already succeeded
    if n_docs:
        agg = spark.read.parquet(out_dir).agg(
            F.sum("n_tokens").alias("t"), F.sum("n_removed").alias("r")
        ).first()
        t, r = int(agg["t"] or 0), int(agg["r"] or 0)
    else:
        t, r = 0, 0
    print(
        f"partitions complete: {len(manifest['partitions'])} (of {N_BUCKETS} "
        f"hash buckets); docs {n_docs}; tokens removed {r}/{t} "
        f"(removal rate {round(r / t, 6) if t else 0.0})"
    )


if __name__ == "__main__":
    main()
