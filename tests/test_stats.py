"""Dataset-card corpus statistics (operators/stats.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from htrc_feature_reader_spark.operators.stats import (
    corpus_stats,
    corpus_stats_sql,
)


@pytest.fixture()
def docs(spark):
    # deterministic skewed lengths across 3 sources
    return spark.range(200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("source"),
        ((F.col("id") * 37) % 997 + 5).alias("n_chars"),
    )


def test_corpus_stats_exact_vs_duckdb(spark, docs):
    got = {
        r["source"]: r
        for r in corpus_stats(docs).collect()
    }
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = {
        r[0]: r
        for r in con.execute(corpus_stats_sql()).fetchall()
    }
    assert set(got) == set(want) == {"0", "1", "2"}
    for src, w in want.items():
        g = got[src]
        # columns: source n_docs total_len mean_len min_len max_len q50 q90 q99 doc_share
        assert (g["n_docs"], g["total_len"], g["min_len"], g["max_len"]) == (
            w[1], w[2], w[4], w[5])
        assert g["mean_len"] == pytest.approx(w[3], abs=0)
        # percentile vs quantile_cont: identical interpolated estimator
        assert (g["q50"], g["q90"], g["q99"]) == (w[6], w[7], w[8])
        assert g["doc_share"] == pytest.approx(w[9], abs=0)
    assert abs(sum(g["doc_share"] for g in got.values()) - 1.0) < 1e-12


def test_corpus_stats_custom_quantiles_and_validation(spark, docs):
    out = corpus_stats(docs, quantiles=(0.25, 0.75)).columns
    assert "q25" in out and "q75" in out and "q50" not in out
    with pytest.raises(ValueError, match="outside"):
        corpus_stats(docs, quantiles=(1.5,))


def test_corpus_stats_single_aggregate_plan(spark, docs):
    """One partial+final hash aggregate; the share window runs on the
    #sources-sized aggregate, adding no corpus-wide exchange."""
    plan = corpus_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # agg shuffle + tiny window single-partition
    assert "CartesianProduct" not in plan
