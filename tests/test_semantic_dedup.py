"""semantic_dedup: hand-checked drop sets, dominated-vs-components
contracts, a union-find reference over randomized clustered vectors,
IVF-assignment composition, and the plan shape (cluster equi-join, no
cartesian)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from htrc_feature_reader_spark.operators.similarity import semantic_dedup


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, label long, embedding array<double>"
    )


def _result(df):
    return {r.vec_id: (r.is_dup, r.dup_of) for r in df.collect()}


def test_hand_checked_dominated(spark):
    # cluster 0: v1 ~ v0 (identical), v2 orthogonal; cluster 1: v3 alone
    rows = [
        (0, 0, [1.0, 0.0]),
        (1, 0, [2.0, 0.0]),      # same direction as 0 -> cos 1
        (2, 0, [0.0, 1.0]),      # orthogonal -> survives
        (3, 1, [1.0, 0.0]),      # same direction as 0 but other cluster
    ]
    got = _result(semantic_dedup(_df(spark, rows), "label", threshold=0.9))
    assert got == {0: (False, None), 1: (True, 0), 2: (False, None), 3: (False, None)}


def test_dominated_vs_components_chain(spark):
    # chain a~b, b~c, a!~c (angles 0, 35, 70 degrees; threshold cos(40deg))
    def v(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)]

    rows = [(0, 0, v(0)), (1, 0, v(35)), (2, 0, v(70))]
    thr = math.cos(math.radians(40))
    dom = _result(semantic_dedup(_df(spark, rows), "label", threshold=thr))
    # dominated: 1 loses to 0; 2 loses to 1 (cos 35deg >= thr) even though
    # 1 is itself dropped — the conservative contract
    assert dom == {0: (False, None), 1: (True, 0), 2: (True, 1)}
    comp = _result(
        semantic_dedup(_df(spark, rows), "label", threshold=thr, mode="components")
    )
    # components: {0,1,2} is one component (via the 1-2 edge), keep min
    assert comp == {0: (False, None), 1: (True, 0), 2: (True, 0)}


def _brute(rows, threshold, mode):
    import itertools

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    edges = []
    for (ia, ca, va), (ib, cb, vb) in itertools.combinations(rows, 2):
        if ca == cb and cos(va, vb) >= threshold:
            edges.append((min(ia, ib), max(ia, ib)))
    if mode == "dominated":
        out = {}
        for i, _, _ in rows:
            smaller = [a for a, b in edges if b == i]
            out[i] = (bool(smaller), min(smaller) if smaller else None)
        return out
    # union-find
    parent = {i: i for i, _, _ in rows}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for i, _, _ in rows:
        r = find(i)
        out[i] = (r != i, r if r != i else None)
    return out


@pytest.mark.parametrize("mode", ["dominated", "components"])
def test_matches_brute_force(spark, mode):
    rng = random.Random(11)
    rows = []
    # 4 clusters x ~15 vectors near 3 seed directions -> plenty of dups
    for i in range(60):
        c = i % 4
        seed_dir = rng.choice([(1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.6, 0.6, 0.2)])
        vec = [s + rng.gauss(0, 0.12) for s in seed_dir]
        rows.append((i, c, vec))
    thr = 0.97
    got = _result(semantic_dedup(_df(spark, rows), "label", threshold=thr, mode=mode))
    assert got == _brute(rows, thr, mode)


def test_composes_with_ivf_assignment(spark):
    from htrc_feature_reader_spark.operators.ivf import ivf_index

    rng = random.Random(3)
    rows = [
        (i, 0, [rng.gauss(i % 2, 0.05), rng.gauss(1 - i % 2, 0.05)])
        for i in range(40)
    ]
    df = _df(spark, rows).drop("label")
    assigned, _ = ivf_index(df, n_centroids=2, n_iters=3)
    out = semantic_dedup(assigned, "__bucket", threshold=0.999)
    rows_out = out.collect()
    assert len(rows_out) == 40
    assert any(r.is_dup for r in rows_out)  # tight clusters must yield dups
    # survivors exist in every bucket
    for b in {r["__bucket"] for r in rows_out}:
        assert any((not r.is_dup) and r["__bucket"] == b for r in rows_out)


def test_plan_cluster_equijoin_no_cartesian(spark):
    rows = [(i, i % 3, [float(i), 1.0]) for i in range(9)]
    plan = (
        semantic_dedup(_df(spark, rows), "label")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_mode_validation(spark):
    with pytest.raises(ValueError, match="mode"):
        semantic_dedup(_df(spark, [(0, 0, [1.0])]), "label", mode="greedy")


def test_output_column_collision_raises(spark):
    df = _df(spark, [(0, 0, [1.0])]).withColumn("dup_of", F.lit(1))
    with pytest.raises(ValueError, match="collide"):
        semantic_dedup(df, "label")
