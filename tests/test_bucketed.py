"""Bucketed layout: co-located joins must be exchange-free (the frozen
plan property that removes the corpus shuffle from every id-keyed join),
and results identical to the unbucketed join."""

import pytest
from pyspark.sql import functions as F

from htrc_feature_reader_spark.sources.bucketed import read_bucketed, write_bucketed


def _formatted(df):
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture()
def two_tables(spark, tmp_path):
    docs = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).alias("feature"),
    )
    meta = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 7)).alias("source"),
    )
    write_bucketed(docs, "b_docs", str(tmp_path / "b_docs"), 8,
                   "doc_id", sort_cols="doc_id")
    write_bucketed(meta, "b_meta", str(tmp_path / "b_meta"), 8,
                   "doc_id", sort_cols="doc_id")
    yield docs, meta
    spark.sql("drop table if exists b_docs")
    spark.sql("drop table if exists b_meta")


def test_bucketed_join_has_no_exchange(spark, two_tables):
    docs, meta = two_tables
    a, b = read_bucketed(spark, "b_docs"), read_bucketed(spark, "b_meta")
    # force the join strategy a 100 TB table pair would get (no broadcast)
    joined = a.hint("merge").join(b, on="doc_id")
    plan = _formatted(joined)
    assert "SortMergeJoin" in plan
    assert plan.count(") Exchange") == 0, plan
    # and the co-located join computes exactly the unbucketed result
    expect = sorted(map(tuple, docs.join(meta, on="doc_id").collect()))
    assert sorted(map(tuple, joined.collect())) == expect


def test_bucketed_join_sort_elided_with_output_ordering(spark, two_tables):
    """With single-file sortBy'd buckets AND the opt-in scan-ordering
    conf, even the Sort nodes disappear (Spark distrusts per-bucket order
    by default because honoring it pins one reader per bucket file)."""
    key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
    old = spark.conf.get(key)
    spark.conf.set(key, "true")
    try:
        import re

        a, b = read_bucketed(spark, "b_docs"), read_bucketed(spark, "b_meta")
        plan = _formatted(a.hint("merge").join(b, on="doc_id"))
        assert plan.count(") Exchange") == 0, plan
        # \b: ") Sort" alone would also match ") SortMergeJoin"
        assert not re.findall(r"\) Sort\b", plan), plan
    finally:
        spark.conf.set(key, old)


def test_unbucketed_baseline_shuffles(spark, two_tables):
    """Contrast guard: reading the SAME files without the catalog's
    bucketing metadata re-introduces both exchanges."""
    docs, meta = two_tables
    loc = {
        t: spark.sql(f"describe formatted {t}")
        .filter("col_name = 'Location'").first()["data_type"]
        for t in ("b_docs", "b_meta")
    }
    a = spark.read.parquet(loc["b_docs"])
    b = spark.read.parquet(loc["b_meta"])
    plan = _formatted(a.hint("merge").join(b, on="doc_id"))
    assert plan.count(") Exchange") == 2


def test_bucketed_groupby_is_exchange_free(spark, two_tables):
    """Aggregations on the bucket key reuse the layout too."""
    agg = read_bucketed(spark, "b_docs").groupBy("doc_id").agg(
        F.sum("feature").alias("s")
    )
    assert _formatted(agg).count(") Exchange") == 0
