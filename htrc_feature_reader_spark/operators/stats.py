"""Dataset-card statistics: the per-source corpus summary a training run
is configured from (mixture design inputs, imbalance detection, length
distributions for packing/bucketing choices).

One partial+final hash aggregate over the corpus — the output is
#sources-sized, so at 100 TB this is a single map-side-combined pass with
a tiny shuffle; no driver-side iteration, no sampling. Quantiles use
``percentile`` (exact, interpolated), not ``approx_percentile``: the cost
of exactness is a per-group sort of the length column only (narrow), and
the result is engine-portable (DuckDB's ``quantile_cont`` computes the
identical estimator, so oracle rows are value-exact instead of
approximate-within-tolerance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_stats(
    docs: DataFrame,
    source_col: str = "source",
    len_col: str = "n_chars",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-``source_col`` summary: doc count, total/mean/min/max of
    ``len_col``, exact interpolated quantiles (one ``q<pct>`` column per
    requested quantile), and the source's share of corpus documents
    (window over the 1-row total — no second scan)."""
    for q in quantiles:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile {q} outside [0, 1]")
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(len_col).alias("total_len"),
        F.avg(len_col).alias("mean_len"),
        F.min(len_col).alias("min_len"),
        F.max(len_col).alias("max_len"),
    ] + [
        F.percentile(F.col(len_col), F.lit(float(q))).alias(
            f"q{int(round(q * 100)):02d}"
        )
        for q in quantiles
    ]
    per = docs.groupBy(source_col).agg(*aggs)
    from pyspark.sql.window import Window

    total = F.sum("n_docs").over(Window.partitionBy())
    return per.withColumn(
        "doc_share", F.col("n_docs") / total
    )


def corpus_stats_sql(
    source_col: str = "source",
    len_col: str = "n_chars",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    table: str = "documents",
) -> str:
    """DuckDB replay of :func:`corpus_stats` (``quantile_cont`` is the
    same interpolated estimator as Spark's ``percentile``)."""
    qcols = ", ".join(
        f"quantile_cont({len_col}, {float(q)}) AS q{int(round(q * 100)):02d}"
        for q in quantiles
    )
    return f"""
      SELECT {source_col},
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum({len_col}) AS BIGINT) AS total_len,
             avg({len_col}) AS mean_len,
             CAST(min({len_col}) AS BIGINT) AS min_len,
             CAST(max({len_col}) AS BIGINT) AS max_len,
             {qcols},
             count(*) / CAST(sum(count(*)) OVER () AS DOUBLE) AS doc_share
      FROM {table} GROUP BY {source_col}
    """
