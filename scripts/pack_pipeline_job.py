"""Example spark-submit job: raw documents -> model-ready training
sequences, resumable.

    scripts/submit.sh [--master URL] scripts/pack_pipeline_job.py \
        <documents_parquet> <out_dir> [snapshot_id] [seq_len]

The full training-data assembly line as ONE job:

1. :func:`sample_mixture` — deterministic per-source mixture rates
   (folded into the scan predicate; re-runs make identical decisions).
2. :func:`clean_corpus` — quality filters, language gate, exact +
   signature-verified near-dup dedup, token counts (one lazy plan).
3. A stand-in tokenizer (whitespace words -> integer ids; swap in a real
   BPE via mapInPandas at this seam).
4. :func:`pack_sequences` — fixed-length sequences with EOS separators
   and per-sequence doc spans.
5. :func:`resume_write` — output partitioned by a sequence bucket with
   per-partition lineage manifests: re-running after a crash completes
   only the missing buckets and never duplicates a published one.
"""

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from htrc_feature_reader_spark.operators import clean_corpus, pack_sequences, sample_mixture
from htrc_feature_reader_spark.plans import resume_write

N_BUCKETS = 64
# mixture recipe: full web, half books, tenth of everything else
MIX = {"src0": 1.0, "src1": 1.0, "src2": 0.5, "src3": 0.5}


def main() -> None:
    docs_path, out_dir = sys.argv[1], sys.argv[2]
    snapshot = sys.argv[3] if len(sys.argv) > 3 else "unversioned"
    seq_len = int(sys.argv[4]) if len(sys.argv) > 4 else 2048
    spark = SparkSession.builder.appName("pack-pipeline").getOrCreate()

    docs = spark.read.parquet(docs_path)
    mixed = sample_mixture(docs, MIX, default_rate=0.1)
    cleaned = clean_corpus(mixed)
    toked = cleaned.select(
        "doc_id",
        F.transform(
            F.split("text", " "),
            lambda w: (F.ascii(w) * 31 + F.length(w)).cast("int"),
        ).alias("tokens"),
    )
    packed = pack_sequences(toked, seq_len, eos_token=1, drop_last=True)
    out = packed.withColumn(
        "bucket", F.pmod(F.col("seq_id"), F.lit(N_BUCKETS)).cast("string")
    )
    manifest = resume_write(out, out_dir, "bucket", snapshot_id=snapshot)
    print(
        f"non-empty partitions complete: {len(manifest['partitions'])} "
        f"(of {N_BUCKETS} seq buckets)"
    )


if __name__ == "__main__":
    main()
