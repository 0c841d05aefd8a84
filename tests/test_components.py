"""Connected components (large-star/small-star) and signature-verified
near-dup survivorship."""

import random

import pytest
from pyspark.sql import functions as F

from htrc_feature_reader_spark.operators.components import connected_components
from htrc_feature_reader_spark.operators.dedup import verify_pairs_by_signature


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        (r["id"], r["component"])
        for r in connected_components(df).collect()
    }


def test_chain_collapses_to_one_component(spark):
    """The verdict's chain shape: A-B, B-C puts all three in ONE cluster
    keyed by the min id — pair-wise keep-min would also drop B and C, but
    components make the semantics explicit and deterministic."""
    assert _cc(spark, [(1, 2), (2, 3)]) == {(1, 1), (2, 1), (3, 1)}


def test_open_triangle_over_shared_node(spark):
    """Pairs (A,C), (B,C) — pair-wise drop-larger would keep both A and B;
    components put all three in one cluster (keep min only)."""
    assert _cc(spark, [(1, 3), (2, 3)]) == {(1, 1), (2, 1), (3, 1)}


def test_long_path_and_reverse_ordering(spark):
    """A 40-node path given in max-adverse id order still converges to a
    single min-rooted component (exercises multiple star rounds)."""
    n = 40
    edges = [(i + 1, i) for i in range(n - 1, 0, -1)]  # (larger, smaller)
    got = _cc(spark, [(a, b) for a, b in edges])
    assert got == {(i, 1) for i in range(1, n + 1)}


def test_multiple_components_and_self_loops(spark):
    got = _cc(spark, [(1, 2), (5, 6), (6, 7), (9, 9)])
    # self-loop contributes nothing; 9 is not emitted (singleton)
    assert got == {(1, 1), (2, 1), (5, 5), (6, 5), (7, 5)}


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_random_graphs_match_union_find(spark):
    """Fuzz vs a driver-side union-find oracle."""
    rng = random.Random(7)
    for trial in range(3):
        n = 30
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(5, 40))
        ]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        touched = set()
        for a, b in edges:
            if a != b:
                touched |= {a, b}
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        expect = {(x, find(x)) for x in touched}
        assert _cc(spark, edges) == expect, f"trial {trial}"


def test_verify_pairs_by_signature_exact_fractions(spark):
    sigs = spark.createDataFrame(
        [(1, [10, 20, 30, 40]), (2, [10, 20, 30, 41]),
         (3, [10, 99, 98, 97]), (4, [1, 2, 3, 4])],
        "id long, sig array<long>",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a long, id_b long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in verify_pairs_by_signature(pairs, sigs, threshold=0.25).collect()
    }
    assert got == {(1, 2): 0.75, (1, 3): 0.25}  # (1,4): 0 filtered
    kept = verify_pairs_by_signature(pairs, sigs, 0.5, keep_estimate=False)
    assert kept.columns == ["id_a", "id_b"]
    assert [tuple(r) for r in kept.collect()] == [(1, 2)]


def test_clean_corpus_cluster_survivorship(spark):
    """survivorship='clusters' keeps exactly one representative (min id)
    per near-dup cluster; unrelated docs are untouched; an unknown mode
    raises."""
    from htrc_feature_reader_spark.operators.pipeline import (
        CleanConfig, clean_corpus,
    )

    base = " ".join(f"tok{i % 37}x{i % 11}" for i in range(120))
    # enough unrelated docs that the dup cluster's shared shingles stay
    # under the 50% stop-shingle document-frequency cap
    others = [
        (10 + k, " ".join(f"u{k}w{i % 29}q{i % 13}" for i in range(140)))
        for k in range(5)
    ]
    docs = spark.createDataFrame(
        [(1, base + " alpha"), (2, base + " beta"), (3, base + " gamma")]
        + others,
        "doc_id long, text string",
    )
    cfg = CleanConfig(min_distinct_ratio=0.05, survivorship="clusters")
    kept = sorted(
        r["doc_id"] for r in clean_corpus(docs, cfg).select("doc_id").collect()
    )
    assert kept == [1, 10, 11, 12, 13, 14]

    with pytest.raises(ValueError, match="survivorship"):
        clean_corpus(docs, CleanConfig(min_distinct_ratio=0.05,
                                       survivorship="wat")).collect()


def test_clean_corpus_verification_spares_non_dups(spark):
    """A pair that collides in an LSH band but has LOW signature agreement
    must survive with the default threshold and be dropped only when
    verification is disabled (near_dup_threshold=None) — the data-loss
    mode the default now prevents."""
    from htrc_feature_reader_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures, word_shingle_ids,
    )
    from htrc_feature_reader_spark.operators.pipeline import (
        CleanConfig, clean_corpus,
    )

    rng = random.Random(123)

    def doc(seed, share):
        words = [f"w{seed}n{i}" for i in range(150)]
        for i in range(share):
            words[i] = f"shared{i}"
        return " ".join(words)

    # search for a seeded pair that IS an LSH candidate but fails the
    # 0.5 signature-agreement bar (low true overlap)
    found = None
    for trial in range(40):
        a, b = doc(2 * trial, 18), doc(2 * trial + 1, 18)
        docs = spark.createDataFrame(
            [(1, a), (2, b)], "doc_id long, text string"
        )
        sh = word_shingle_ids(docs, "text", "doc_id", n=3)
        sigs = minhash_signatures(sh)
        pairs = lsh_candidate_pairs(sigs).collect()
        if not pairs:
            continue
        est = verify_pairs_by_signature(
            spark.createDataFrame(pairs, "id_a long, id_b long"), sigs, 0.0
        ).collect()[0]["est_jaccard"]
        if est < 0.5:
            found = docs
            break
    if found is None:
        pytest.skip("no low-agreement LSH collision found in 40 seeds")

    cfg = CleanConfig(min_distinct_ratio=0.05)
    kept_verified = {r["doc_id"] for r in clean_corpus(found, cfg).collect()}
    assert kept_verified == {1, 2}  # candidate, but NOT a verified dup

    cfg_raw = CleanConfig(min_distinct_ratio=0.05, near_dup_threshold=None)
    kept_raw = {r["doc_id"] for r in clean_corpus(found, cfg_raw).collect()}
    assert kept_raw == {1}  # old behavior: bare candidacy deletes doc 2
