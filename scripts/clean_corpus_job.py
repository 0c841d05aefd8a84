"""Example spark-submit job: the training-corpus cleaning pipeline,
resumable.

    scripts/submit.sh [--master URL] scripts/clean_corpus_job.py \
        <documents_parquet> <out_dir> [snapshot_id]

Runs ``clean_corpus`` (quality filter -> exact dedup -> MinHash-LSH
near-dup removal -> token counting) over the documents table and writes
the survivors partitioned by a doc-hash bucket with per-partition lineage
manifests — re-running after a failure completes only the missing
partitions, and ``plans.repair_write`` heals out-of-band damage.
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from htrc_feature_reader_spark.operators import CleanConfig, clean_corpus
from htrc_feature_reader_spark.plans import resume_write

N_BUCKETS = 64


def main() -> None:
    docs_path, out_dir = sys.argv[1], sys.argv[2]
    snapshot = sys.argv[3] if len(sys.argv) > 3 else "unversioned"
    spark = SparkSession.builder.appName("clean-corpus").getOrCreate()

    docs = spark.read.parquet(docs_path)
    cleaned = clean_corpus(docs, CleanConfig())
    out = cleaned.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(N_BUCKETS)).cast("string")
    )
    manifest = resume_write(out, out_dir, "bucket", snapshot_id=snapshot)
    # survivor count from the MANIFEST row counts (free — already computed
    # during the write), never by re-executing the funnel plan
    n_out = sum(p["row_count"] for p in manifest["partitions"].values())
    n_in = docs.count()
    print(
        f"partitions complete: {len(manifest['partitions'])} (of {N_BUCKETS} "
        f"hash buckets); survivors {n_out}/{n_in} "
        f"(drop rate {round(1 - n_out / n_in, 6) if n_in else 0.0})"
    )


if __name__ == "__main__":
    main()
