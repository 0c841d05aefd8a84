"""Corpus/Volume facade + new operators (vocab, embeddings, EF-JSON sink)."""

import pytest
from pyspark.sql import functions as F

from htrc_feature_reader_spark.corpus import Corpus
from htrc_feature_reader_spark.errors import MissingDataError
from htrc_feature_reader_spark.operators.embeddings import weighted_embedding_average
from htrc_feature_reader_spark.operators.vocab import remove_stopwords, restrict_to_vocab


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    from htrc_feature_reader_spark.synth import write_ef_json_fixtures
    d = tmp_path_factory.mktemp("efc")
    write_ef_json_fixtures(str(d), n_volumes=3)
    return Corpus.from_ef_json(spark, str(d), multiline=False)


def test_reference_api_methods(corpus):
    assert corpus.tokenlist(case=False, pos=False).count() > 0
    assert corpus.tokens(min_count=2).count() > 0
    assert corpus.tokens_per_page().count() > 0
    tvf = corpus.term_volume_freqs(page_freq=True, pos=False)
    counts = [r["count"] for r in tvf.collect()]
    assert counts == sorted(counts, reverse=True)
    assert corpus.line_counts(section="body").count() > 0
    assert corpus.begin_line_chars().select("place").distinct().count() == 1
    assert "capAlphaSeq" in corpus.cap_alpha_seqs().columns


def test_volume_and_page_views(corpus):
    v = corpus.volume("syn.vol000")
    ids = v.tokenlist(section="all").select("htid").distinct().collect()
    assert [r["htid"] for r in ids] == ["syn.vol000"]
    pg = corpus.page("syn.vol000", 3)
    assert pg.select("page").distinct().collect()[0]["page"] == 3
    # absent page -> empty, matching the reference
    assert corpus.page("syn.vol000", 9999).count() == 0


def test_chunked_via_facade(corpus):
    ch = corpus.tokenlist(chunk=True, chunk_target=150, section="group",
                          case=False, pos=False)
    assert "chunk" in ch.columns
    total = corpus.tokenlist(section="group").agg(F.sum("count")).first()[0]
    assert ch.agg(F.sum("count")).first()[0] == total


def test_parquet_roundtrip_via_facade(spark, corpus, tmp_path):
    corpus.save_parquet(str(tmp_path / "quad"))
    back = Corpus.from_parquet(spark, str(tmp_path / "quad"))
    a = corpus.tokenlist(section="group").agg(F.sum("count")).first()[0]
    b = back.tokenlist(section="group").agg(F.sum("count")).first()[0]
    assert a == b
    assert back.metadata.count() == 3


def test_partial_corpus_errors(spark, corpus, tmp_path):
    corpus.save_parquet(str(tmp_path / "q2"))
    import shutil
    shutil.rmtree(str(tmp_path / "q2" / "section"))
    shutil.rmtree(str(tmp_path / "q2" / "chars"))
    partial = Corpus.from_parquet(spark, str(tmp_path / "q2"))
    assert partial.tokenlist(section="group").count() > 0
    with pytest.raises(MissingDataError):
        partial.section_features()
    with pytest.raises(MissingDataError):
        partial.line_chars()


def test_ef_json_sink_roundtrip(spark, corpus, tmp_path):
    """ingest(sink(ingest(x))) == ingest(x) — the engine's byte-fidelity
    analog (S9)."""
    out = str(tmp_path / "efout")
    corpus.save_ef_json(out)
    back = Corpus.from_ef_json(spark, out, multiline=False)
    a = corpus.tokenlist(section="all").orderBy("htid", "page", "section", "token", "pos")
    b = back.tokenlist(section="all").orderBy("htid", "page", "section", "token", "pos")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # scalar features survive too
    sa = corpus.section_features(section="group").agg(F.sum("lineCount")).first()[0]
    sb = back.section_features(section="group").agg(F.sum("lineCount")).first()[0]
    assert sa == sb


def test_vocab_ops(spark, corpus):
    tl = corpus.tokenlist(section="group", pos=False)
    vocab = spark.createDataFrame([("the",), ("green",)], "token string")
    kept = restrict_to_vocab(tl, vocab)
    assert set(r["token"] for r in kept.select("token").distinct().collect()) <= {"the", "green"}
    removed = remove_stopwords(tl, vocab)
    assert removed.filter(F.col("token").isin("the", "green")).count() == 0
    assert kept.count() + removed.count() == tl.count()


def test_weighted_embedding_average(spark):
    import math
    counts = spark.createDataFrame(
        [("d1", "a", 1), ("d1", "b", 1), ("d2", "a", 3)],
        "htid string, token string, count long",
    )
    emb = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0]), ("zzz", [9.0, 9.0])],
        "token string, vector array<double>",
    )
    out = {r["htid"]: r for r in weighted_embedding_average(counts, emb).collect()}
    # d1: equal weights -> midpoint
    assert out["d1"]["vector"] == [0.5, 0.5]
    assert out["d1"]["n_terms"] == 2
    # d2: only token 'a'
    assert out["d2"]["vector"] == [1.0, 0.0]
    # log1p weighting matches the reference formula
    w1, w3 = math.log1p(1), math.log1p(3)
    both = counts.filter("htid='d1'").union(
        spark.createDataFrame([("d1", "a", 3)], counts.schema))
    v = weighted_embedding_average(both, emb).filter("htid='d1'").first()["vector"]
    assert abs(v[0] - (w1 + w3) / (2 * w1 + w3)) < 1e-12
