"""TF-IDF operator + Iceberg-gated source fallback."""

import math

from pyspark.sql import functions as F

from htrc_feature_reader_spark.operators.text import tf_idf
from htrc_feature_reader_spark.sources.iceberg import (
    current_snapshot_id,
    iceberg_available,
    read_sequences,
)


def test_tf_idf_values(spark):
    rows = [
        ("d1", "x", 2), ("d1", "y", 2),   # d1: 4 tokens
        ("d2", "x", 1), ("d2", "z", 3),   # d2: 4 tokens
    ]
    tl = spark.createDataFrame(rows, "htid string, token string, count long")
    out = {(r["htid"], r["token"]): r for r in tf_idf(tl).collect()}
    # tf
    assert out[("d1", "x")]["tf"] == 0.5
    assert out[("d2", "z")]["tf"] == 0.75
    # df and smoothed idf with N=2
    assert out[("d1", "x")]["df"] == 2
    assert abs(out[("d1", "x")]["idf"] - (math.log(3 / 3) + 1)) < 1e-12
    assert abs(out[("d1", "y")]["idf"] - (math.log(3 / 2) + 1)) < 1e-12
    # shared token scores below unique token at equal tf
    assert out[("d1", "x")]["tf_idf"] < out[("d1", "y")]["tf_idf"]


def test_iceberg_fallback_reads_parquet(spark, sequences_df, tmp_path):
    assert not iceberg_available(spark)  # no runtime jars in this image
    p = str(tmp_path / "seqs")
    sequences_df.write.parquet(p)
    back = read_sequences(spark, p, snapshot_id=123)  # snapshot ignored on parquet
    assert back.count() == sequences_df.count()
    sid = current_snapshot_id(spark, p)
    assert sid.startswith("parquet-")
    # content fingerprint is stable and changes with the data
    assert sid == current_snapshot_id(spark, p)


def test_remove_duplicate_lines(spark):
    from htrc_feature_reader_spark.operators.text import remove_duplicate_lines

    boiler = "ACCEPT COOKIES"
    rows = [
        (1, f"{boiler}\nunique one\nalso unique"),
        (2, f"{boiler}\nsecond doc text"),
        (3, f"{boiler}\nthird doc text\n{boiler}"),  # twice in one doc
        (4, boiler),                                  # all-boilerplate doc
        (5, "no chrome here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text_deduped"]
           for r in remove_duplicate_lines(docs, min_df=3).collect()}
    assert out[1] == "unique one\nalso unique"
    assert out[2] == "second doc text"
    assert out[3] == "third doc text"      # BOTH occurrences removed
    assert out[4] == ""                    # row-preserving, empty result
    assert out[5] == "no chrome here"
    # df counts DISTINCT docs: a line twice in one doc is df=1, kept
    rows2 = [(1, "twice\ntwice"), (2, "x"), (3, "y")]
    docs2 = spark.createDataFrame(rows2, "doc_id long, text string")
    out2 = {r["doc_id"]: r["text_deduped"]
            for r in remove_duplicate_lines(docs2, min_df=2).collect()}
    assert out2[1] == "twice\ntwice"


def test_lang_id_broadened_markers(spark):
    from htrc_feature_reader_spark.operators.text import lang_id

    rows = [
        (1, "il problema che questo sono di per della"),
        (2, "você não são uma das também mais aqui"),
        (3, "het een niet voor aan ook zijn hier"),
        (4, "och att det som för inte är med"),
        (5, "nie się jest czy dla tego jak przez"),
        (6, "и в не на что это как вы"),
        (7, "the cat and the dog with you"),
        (8, "zzz qqq xxx"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r["id"]: r["lang"]
           for r in df.select("id", lang_id("text").alias("lang")).collect()}
    assert out == {1: "it", 2: "pt", 3: "nl", 4: "sv", 5: "pl",
                   6: "ru", 7: "en", 8: "und"}


def test_detect_language_model_hook(spark):
    """The mapInPandas model seam: a deterministic fake classifier drops
    in with the documented batched Series->Series contract; schema and
    row alignment preserved; errors on bad usage."""
    import pytest
    from htrc_feature_reader_spark.operators.text import detect_language

    docs = spark.createDataFrame(
        [(1, "aaa bbb"), (2, "ccc"), (3, "dd ee ff")],
        "doc_id long, text string",
    )

    def fake_model(texts):
        # deterministic 'model': even char counts -> xx, odd -> yy
        return texts.str.len().map(lambda n: "xx" if n % 2 == 0 else "yy")

    out = detect_language(docs, method="model", model_fn=fake_model)
    assert out.columns == ["doc_id", "text", "lang"]
    got = {r["doc_id"]: r["lang"] for r in out.collect()}
    assert got == {1: "yy", 2: "yy", 3: "xx"}

    # heuristic path unchanged and hook misuse fails loudly
    heur = detect_language(docs)  # default heuristic
    assert heur.filter("lang = 'und'").count() == 3
    with pytest.raises(ValueError, match="model_fn"):
        detect_language(docs, method="model")
    with pytest.raises(ValueError, match="method"):
        detect_language(docs, method="nope")
