"""Property-based tests (hypothesis): as-of join vs pandas merge_asof on
arbitrary frames; fold conservation under arbitrary flag combinations."""

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from htrc_feature_reader_spark.operators import asof_join, fold_tokenlist

T0 = dt.datetime(2024, 1, 1)

# small composite strategies: a few keys, minute-granularity timestamps with
# deliberate duplicates, to hammer tie semantics
_key = st.sampled_from(["a", "b", "c"])
_minutes = st.integers(min_value=0, max_value=30)


@st.composite
def asof_frames(draw):
    build = draw(st.lists(st.tuples(_key, _minutes, st.floats(-10, 10, allow_nan=False)),
                          min_size=0, max_size=25))
    probe = draw(st.lists(st.tuples(_key, _minutes), min_size=1, max_size=25))
    return build, probe


@pytest.mark.slow
@settings(max_examples=12, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(frames=asof_frames())
def test_asof_matches_merge_asof_property(spark, frames):
    build_rows, probe_rows = frames
    # merge_asof tie behavior among equal build timestamps is order-defined;
    # keep build timestamps unique per key to test engine-level semantics
    seen = set()
    build_rows = [r for r in build_rows
                  if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))]
    build = spark.createDataFrame(
        [(k, T0 + dt.timedelta(minutes=m), v) for k, m, v in build_rows] or
        [("zz", T0, 0.0)],
        "key string, ts timestamp, val double",
    )
    probe = spark.createDataFrame(
        [(k, T0 + dt.timedelta(minutes=m)) for k, m in probe_rows],
        "key string, ts timestamp",
    )
    got = (
        asof_join(probe, build, on="key", ts="ts")
        .toPandas().sort_values(["key", "ts"]).reset_index(drop=True)
    )
    p = probe.toPandas().sort_values("ts", kind="mergesort")
    b = build.toPandas().sort_values("ts", kind="mergesort")
    expect = pd.merge_asof(p, b, on="ts", by="key").sort_values(
        ["key", "ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, expect, check_dtype=False)


@pytest.mark.slow
@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pages=st.booleans(),
    section=st.sampled_from(["all", "group", "body", "header"]),
    case=st.booleans(),
    pos=st.booleans(),
)
def test_fold_conserves_counts_property(tokenlist_df, pages, section, case, pos):
    folded = fold_tokenlist(tokenlist_df, pages=pages, section=section,
                            case=case, pos=pos)
    from pyspark.sql import functions as F

    base = tokenlist_df
    if section in ("body", "header"):
        base = base.filter(F.col("section") == section)
    assert folded.agg(F.sum("count")).first()[0] == base.agg(F.sum("count")).first()[0]