"""Point-in-time windowed feature build over the ``sequences`` table.

This is the north-rule headline pipeline (BASELINE.json): from the input
(doc_id, ts, tokens array<int32>, n_tok, source), produce a per-row
feature vector at each (doc_id, ts) such that **no feature reads rows with
ts' > ts** (zero temporal leakage) and the ``tokens`` array passes through
byte-identical.

Leakage safety by construction: every cumulative feature uses a RANGE
window frame ordered by event time with frame (unbounded preceding ..
current row) — a range frame includes *all* rows with equal ts and nothing
later, so results are deterministic even under duplicate timestamps (a row
frame would depend on shuffle order within ties).

All arithmetic is exact-integer until the final ratio, so results are
bit-reproducible across partitionings (SURVEY.md §4: never average floats
across shuffle-ordered partials).

Features:
- per-row:       n_tok, n_distinct (distinct token ids in the row),
                 sum_tok (Σ token ids — exact int64)
- per-doc cum:   seq_idx (rows so far), cum_n_tok, mean_n_tok,
                 mean_token_id (Σ token ids / Σ n_tok so far)
- per-source cum: src_cum_n_tok; src_share = (doc, source)-cum /
                 source-cum — this doc's share of everything its source has
                 emitted so far (a point-in-time source-level tf stat,
                 always in (0, 1])
- timeline:      gap_s since previous row, session_id (gap-based)

One shuffle per distinct partition key (doc_id, then source); AQE splits
skewed partitions at runtime; a hot doc_id's window is a sequential scan
within one partition, which is exactly the semantics' lower bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .windows import session_id_col

from ..functions import ts_seconds


def build_pit_features(
    seqs: DataFrame,
    doc_col: str = "doc_id",
    ts_col: str = "ts",
    session_gap_s: float = 1800.0,
) -> DataFrame:
    """Compute the point-in-time feature vector for every sequence row."""
    ts_s = ts_seconds(ts_col)

    doc_range = (
        Window.partitionBy(doc_col)
        .orderBy(ts_s)
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    src_range = (
        Window.partitionBy("source")
        .orderBy(ts_s)
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    doc_src_range = (
        Window.partitionBy(doc_col, "source")
        .orderBy(ts_s)
        .rangeBetween(Window.unboundedPreceding, 0)
    )

    df = seqs.withColumn("sum_tok", F.aggregate("tokens", F.lit(0).cast("long"), lambda a, x: a + x))
    df = df.withColumn("n_distinct", F.size(F.array_distinct("tokens")))

    df = (
        df.withColumn("seq_idx", F.count(F.lit(1)).over(doc_range))
        .withColumn("cum_n_tok", F.sum("n_tok").over(doc_range))
        .withColumn("cum_sum_tok", F.sum("sum_tok").over(doc_range))
        .withColumn("src_cum_n_tok", F.sum("n_tok").over(src_range))
        .withColumn("doc_src_cum_n_tok", F.sum("n_tok").over(doc_src_range))
    )
    df = (
        df.withColumn("mean_n_tok", F.col("cum_n_tok") / F.col("seq_idx"))
        .withColumn("mean_token_id", F.col("cum_sum_tok") / F.col("cum_n_tok"))
        .withColumn("src_share", F.col("doc_src_cum_n_tok") / F.col("src_cum_n_tok"))
    )

    # timeline features use a deterministic total order within ties
    order_w = Window.partitionBy(doc_col).orderBy(ts_s, F.col("n_tok"), F.col("sum_tok"))
    df = df.withColumn(
        "gap_s", ts_s - F.lag(ts_s).over(order_w)
    ).withColumn(
        "session_id",
        session_id_col(doc_col, ts_col, session_gap_s, tiebreak=["n_tok", "sum_tok"]).cast("long"),
    )
    return df
