"""Round-2 operator guards: word-composed shingle hashing (bit-parity with
the per-shingle character hash), stop-shingle capping, banded embedding
near-dup mining (recall + no-cartesian plan), exact integer-microsecond
time arithmetic at threshold boundaries, and tf_idf plan laziness."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from htrc_feature_reader_spark.operators.dedup import (
    remove_stop_shingles,
    word_shingle_ids,
    word_shingles,
)
from htrc_feature_reader_spark.operators.similarity import (
    near_dup_pairs,
    ndp_component,
    ndp_plane_coeffs,
)
from htrc_feature_reader_spark.operators.text import rolling_hash, tf_idf
from htrc_feature_reader_spark.operators.windows import sessionize
from htrc_feature_reader_spark.operators import asof_join


def _formatted(df):
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


# ---------------------------------------------------------------- shingles

@pytest.fixture(scope="module")
def shingle_docs(spark):
    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "x  y z double  space survives"),
        ("c", "two words"),          # shorter than n: no shingles
        ("d", ""),                    # empty doc
        ("e", "unicode héllo wörld test ok fin"),
        ("f", "a b c"),               # exactly n words: one shingle
        ("g", "trailing space here "),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_word_shingle_ids_bit_parity(shingle_docs):
    """Composed word-level hashing == rolling_hash of the shingle string,
    including unicode, double spaces, and short docs."""
    new = set(map(tuple, word_shingle_ids(shingle_docs, "text", "doc_id", n=3).collect()))
    old = set(map(tuple, (
        word_shingles(shingle_docs, "text", "doc_id", n=3)
        .select("id", rolling_hash("shingle").alias("shingle_id"))
        .collect()
    )))
    assert new == old
    assert len(new) > 0


def test_word_shingles_short_docs_empty_not_error(shingle_docs):
    out = word_shingles(shingle_docs, "text", "doc_id", n=3)
    ids = {r["id"] for r in out.collect()}
    assert "c" not in ids and "d" not in ids  # too short: zero rows, no crash
    one = out.filter(F.col("id") == "f").collect()
    assert len(one) == 1 and one[0]["shingle"] == "a b c"


def test_remove_stop_shingles(spark):
    # 'viral' appears in 4 of 5 docs (> 50%), 'rare' in 1
    rows = [(f"d{i}", "viral") for i in range(4)] + [("d4", "rare"), ("d0", "rare2")]
    sh = spark.createDataFrame(rows, "id string, shingle string")
    kept = {r["shingle"] for r in remove_stop_shingles(sh, max_df_frac=0.5).collect()}
    assert kept == {"rare", "rare2"}
    # absolute cap form
    kept2 = {r["shingle"] for r in remove_stop_shingles(sh, max_df=3, max_df_frac=None).collect()}
    assert kept2 == {"rare", "rare2"}
    # cap off -> passthrough
    assert remove_stop_shingles(sh, max_df=None, max_df_frac=None) is sh


# ---------------------------------------------------------- near-dup pairs

@pytest.fixture(scope="module")
def planted_vectors(spark):
    """60 unit-ish vectors plus a perturbed near-dup of each (cos ~ 0.95)."""
    base = spark.range(60).select(
        F.col("id").cast("long").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(15)),
            lambda i: ndp_component(97, 31, i + F.col("id") * 101),
        ).alias("embedding"),
    )
    na, nb = ndp_plane_coeffs(1, 1, seed=5)[0]
    noise = F.transform(
        F.sequence(F.lit(0), F.size("embedding") - 1),
        lambda i: ndp_component(na, nb, i + F.col("vec_id") * 4099),
    )
    pert = base.select(
        "vec_id",
        F.zip_with("embedding", noise, lambda x, c: x + F.lit(0.12) * c).alias("embedding"),
    ).select((F.col("vec_id") + 1000).alias("vec_id"), "embedding")
    return base.unionByName(pert).cache()


def test_near_dup_recall_vs_exact(planted_vectors):
    exact = {
        (r["id_a"], r["id_b"])
        for r in near_dup_pairs(planted_vectors, threshold=0.9, exact=True).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in near_dup_pairs(
            planted_vectors, threshold=0.9, n_tables=8, band_bits=4
        ).collect()
    }
    assert len(exact) >= 50  # the planted pairs are really there
    assert approx <= exact   # no false positives (exact cosine re-check)
    recall = len(approx) / len(exact)
    assert recall >= 0.9, f"recall {recall:.2f}"


def test_near_dup_plan_no_cartesian(planted_vectors):
    plan = _formatted(near_dup_pairs(planted_vectors, threshold=0.9, n_tables=2, band_bits=4))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    for op in ("BatchEvalPython", "ArrowEvalPython"):
        assert op not in plan
    # the exact baseline IS the cartesian product (sanity: flag works)
    plan_exact = _formatted(near_dup_pairs(planted_vectors, threshold=0.9, exact=True))
    assert "CartesianProduct" in plan_exact or "BroadcastNestedLoopJoin" in plan_exact


# ------------------------------------------------------ integer-time edges

def _ts(s_offset_us):
    base = dt.datetime(2024, 3, 10, 0, 0, 0)
    return base + dt.timedelta(microseconds=s_offset_us)


def test_session_gap_exact_threshold_stays_in_session(spark):
    gap_s = 1800.0
    rows = [
        ("u", _ts(0)),
        ("u", _ts(1_800_000_000)),      # gap == threshold: same session
        ("u", _ts(3_600_000_001)),      # gap == threshold + 1us: new session
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = sessionize(df, key="user_id", ts="ts", gap_s=gap_s).orderBy("ts").collect()
    assert [r["session_id"] for r in out] == [1, 1, 2]


def test_asof_tolerance_exact_boundary_in_tolerance(spark):
    probe = spark.createDataFrame(
        [("k", _ts(10_000_000))], "key string, ts timestamp"
    )
    build = spark.createDataFrame(
        [("k", _ts(5_000_000), 1.0)], "key string, ts timestamp, v double"
    )
    # delta is exactly 5.0s: must match at tolerance 5.0, not at 4.999999
    hit = asof_join(probe, build, on="key", ts="ts", tolerance_s=5.0).collect()
    assert hit[0]["v"] == 1.0
    miss = asof_join(probe, build, on="key", ts="ts", tolerance_s=4.999999).collect()
    assert miss[0]["v"] is None


# ------------------------------------------------------------ tf_idf lazy

def test_tf_idf_construction_runs_no_job(spark, tokenlist_df):
    sc = spark.sparkContext
    group = "tfidf-lazy-probe"
    sc.setJobGroup(group, "tf_idf must not run jobs at plan construction")
    try:
        out = tf_idf(
            tokenlist_df.groupBy("htid", "token").agg(F.count(F.lit(1)).alias("count")),
            doc_col="htid", token_col="token", count_col="count",
        )
    finally:
        sc.setJobGroup(None, None)
    assert not sc.statusTracker().getJobIdsForGroup(group), \
        "tf_idf triggered a Spark job during plan construction"
    # and the plan still computes correct idf (N rides along as broadcast agg)
    assert out.first()["idf"] > 0


def test_session_timezone_pinned_utc(spark):
    """ts_micros reinterprets TIMESTAMP_NTZ (pandas-written parquet) in the
    session timezone; the integer-microsecond arithmetic is only DST-safe
    because get_spark pins UTC — guard the pin."""
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_remove_stop_shingles_assume_distinct_equivalent(spark):
    """assume_distinct=True must give identical results on already-distinct
    input (it only skips the redundant dedup shuffle)."""
    rows = [(d, s) for d in range(8) for s in ("x", "y", f"u{d}")]
    df = spark.createDataFrame(rows, "id long, shingle string")
    a = sorted(map(tuple, remove_stop_shingles(df, max_df=4).collect()))
    b = sorted(map(tuple, remove_stop_shingles(
        df, max_df=4, assume_distinct=True).collect()))
    assert a == b and len(a) == 8  # x, y (df=8) dropped; u<d> kept


def test_simhash_candidate_pairs_exact_recall(spark):
    """Pigeonhole: every pair within hamming <= n_bands-1 shares a band,
    so recall vs the brute-force pair set is exact."""
    from htrc_feature_reader_spark.operators.dedup import (
        hamming_distance,
        simhash_candidate_pairs,
    )

    sigs = spark.createDataFrame(
        [(i, h) for i, h in enumerate(
            [0b1010101010101010, 0b1010101010101011,  # hamming 1
             0b1010101010101110, 0b0101010101010101,  # h(0,2)=1; 4th far
             0b1111000011110000]
        )],
        "id long, simhash long",
    )
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in simhash_candidate_pairs(sigs).collect()}
    # brute force oracle
    a = sigs.selectExpr("id as id_a", "simhash as sa")
    brute = {
        (r["id_a"], r["id_b"]): r["h"]
        for r in a.crossJoin(sigs.selectExpr("id as id_b", "simhash as sb"))
        .filter("id_a < id_b")
        .selectExpr("id_a", "id_b", "bit_count(sa ^ sb) as h")
        .filter("h <= 3").collect()
    }
    assert got == brute and len(brute) >= 2


def test_simhash_defaults_are_corpus_scale(spark):
    """Defaults follow the documented sizing rule (bits=48, 4 bands of
    width 12) — the 16-bit configs live only in oracle-scale tests. A
    single-token doc's fingerprint equals its mixed hash masked to 48
    bits, proving the default width end-to-end."""
    from htrc_feature_reader_spark.operators.dedup import simhash

    seed, token_id = 42, 123_456_789
    A = 2 * ((seed * 2_654_435_761) % (1 << 30)) + 1
    B = seed * 97 + 13
    mixed = (token_id * A + B) % (1 << 62)
    dt = spark.createDataFrame(
        [(1, token_id, 1)], "id long, token_id long, weight long"
    )
    [row] = simhash(dt).collect()
    assert row["simhash"] == mixed & ((1 << 48) - 1)
    assert row["simhash"] >= (1 << 32)  # genuinely wider than 32 bits


def test_simhash_wide_fingerprint_pairs(spark):
    """bits=48 (corpus-scale band width 12): a planted hamming-2 pair is
    found; fingerprints differing in every band are never candidates."""
    from htrc_feature_reader_spark.operators.dedup import simhash_candidate_pairs

    base = 0x2E5F13A9C4D7  # arbitrary 48-bit fingerprint
    sigs = spark.createDataFrame(
        [(1, base),
         (2, base ^ (1 << 3) ^ (1 << 40)),     # hamming 2 -> must pair
         (3, base ^ 0xFFFFFFFFFFFF)],          # every 12-bit band differs
        "id long, simhash long",
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_candidate_pairs(sigs, bits=48, n_bands=4).collect()}
    assert pairs.get((1, 2)) == 2
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_banded_miners_bucket_cap(spark):
    """max_bucket drops only oversized (degenerate) buckets: pairs from
    small buckets survive, members of a viral bucket stop pairing."""
    from htrc_feature_reader_spark.operators.dedup import (
        lsh_candidate_pairs,
        simhash_candidate_pairs,
    )

    # LSH: ids 1-2 share a unique 8-hash signature; ids 10..19 share a
    # degenerate one (a 10-doc bucket -> 45 pairs without the cap)
    sig_a = [7, 7, 7, 7, 7, 7, 7, 7]
    sig_v = [0, 0, 0, 0, 0, 0, 0, 0]
    sigs = spark.createDataFrame(
        [(1, sig_a), (2, sig_a)] + [(10 + i, sig_v) for i in range(10)],
        "id long, sig array<long>",
    )
    uncapped = lsh_candidate_pairs(sigs).count()
    capped = {(r["id_a"], r["id_b"])
              for r in lsh_candidate_pairs(sigs, max_bucket=5).collect()}
    assert uncapped == 1 + 45
    assert capped == {(1, 2)}

    # SimHash: same shape on band slices
    fps = spark.createDataFrame(
        [(1, 0x2E5F13A9C4D7), (2, 0x2E5F13A9C4D7 ^ (1 << 3))]
        + [(10 + i, 0) for i in range(10)],
        "id long, simhash long",
    )
    got = {(r["id_a"], r["id_b"])
           for r in simhash_candidate_pairs(fps, bits=48, n_bands=4,
                                            max_bucket=5).collect()}
    assert got == {(1, 2)}
