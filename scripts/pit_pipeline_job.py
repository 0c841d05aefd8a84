"""Example spark-submit job: the north-rule PIT pipeline, resumable.

    scripts/submit.sh [--master URL] scripts/pit_pipeline_job.py \
        <sequences_parquet> <out_dir> [snapshot_id]

Reads the sequences table, builds point-in-time features, as-of joins them
onto each row's (shifted) timestamp, and writes the output partitioned by a
doc-hash bucket with a per-partition lineage manifest — re-running after a
failure completes only the missing partitions (plans/manifest.py).
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from htrc_feature_reader_spark.operators import asof_join, build_pit_features
from htrc_feature_reader_spark.plans import resume_write

N_BUCKETS = 64


def main() -> None:
    seq_path, out_dir = sys.argv[1], sys.argv[2]
    snapshot = sys.argv[3] if len(sys.argv) > 3 else "unversioned"
    spark = SparkSession.builder.appName("pit-pipeline").getOrCreate()

    seqs = spark.read.parquet(seq_path)
    feats = build_pit_features(seqs, attach_payload=False)
    build = feats.select(
        "doc_id", "ts",
        F.col("seq_idx").cast("long").alias("f_seq_idx"),
        F.col("cum_n_tok").alias("f_cum_n_tok"),
        F.col("mean_token_id").alias("f_mean_token_id"),
        F.col("src_share").alias("f_src_share"),
    ).distinct()
    probe = seqs.select(
        "doc_id",
        (F.col("ts") + F.make_interval(secs=F.lit(1.0))).alias("ts"),
        "tokens", "n_tok", "source",
    )
    enriched = asof_join(probe, build, on="doc_id", ts="ts", salt=8)
    out = enriched.withColumn(
        "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(N_BUCKETS)).cast("string")
    )
    manifest = resume_write(out, out_dir, "bucket", snapshot_id=snapshot)
    print(f"non-empty partitions complete: {len(manifest['partitions'])} (of {N_BUCKETS} hash buckets)")


if __name__ == "__main__":
    main()
