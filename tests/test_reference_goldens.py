"""Golden-value parity against the reference's OWN fixture volumes.

These are the reference's published test values (tests/test_volume.py:137-255,
tests/test_resolvers.py:119) computed by THIS engine from the same fixture
files at /root/reference/tests/data/ — the strongest cell-for-cell parity
evidence available. Values verified against the reference executed in place
(SURVEY.md §5 'Empirically verified golden values')."""

import os

import pytest
from pyspark.sql import functions as F

from htrc_feature_reader_spark.operators import distinct_tokens, fold_tokenlist
from htrc_feature_reader_spark.operators.chunking import chunked_tokenlist
from htrc_feature_reader_spark.sources import (
    read_ef_json,
    section_features_from_ef,
    tokenlist_from_ef,
    volumes_from_ef,
)

DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference fixtures not present"
)


@pytest.fixture(scope="module")
def gables15(spark):
    return tokenlist_from_ef(
        read_ef_json(spark, f"{DATA}/green-gables-15pages.json", multiline=True)
    ).cache()


def test_tokenlist_body_golden(gables15):
    # reference: 1,852 rows / sum 3,411 for the default (body) tokenlist
    body = fold_tokenlist(gables15, pages=True, section="body", case=True,
                          pos=True, doc_col=None)
    assert body.count() == 1852
    assert body.agg(F.sum("count")).first()[0] == 3411


def test_tokens_golden(gables15):
    # reference tests/test_volume.py:140-151: 882 case-sensitive, 815 folded
    body = gables15.filter(F.col("section") == "body")
    assert distinct_tokens(body, case=True, doc_col=None).count() == 882
    assert distinct_tokens(body, case=False, doc_col=None).count() == 815


def test_specific_cell_golden(gables15):
    # reference tests/test_volume.py:190: tl1.loc[(5, 'body', 'GREEN', 'NE')] == 1
    cell = gables15.filter(
        (F.col("page") == 5) & (F.col("section") == "body")
        & (F.col("token") == "GREEN") & (F.col("pos") == "NE")
    ).first()
    assert cell is not None and cell["count"] == 1


def test_section_feature_goldens(spark):
    # reference tests/test_volume.py:153-170: body line/empty/sentence/capAlpha sums
    raw = read_ef_json(spark, f"{DATA}/green-gables-15pages.json", multiline=True)
    body = section_features_from_ef(raw).filter(F.col("section") == "body")
    sums = body.agg(
        F.sum("lineCount"), F.sum("emptyLineCount"),
        F.sum("sentenceCount"), F.sum("capAlphaSeq"),
    ).first()
    assert tuple(sums) == (441, 92, 191, 35)


def test_metadata_golden(spark):
    raw = read_ef_json(spark, f"{DATA}/green-gables-15pages.json", multiline=True)
    v = volumes_from_ef(raw).first()
    assert v["title"].startswith("Anne of Green Gables")
    assert v["pub_date"] == "1908"
    assert v["page_count"] == 414
    assert v["language"] == "eng"
    assert v["feature_schema_version"] == "3.0"


def test_full_volume_and_chunk_goldens(spark):
    # reference session-verified: full body sum 124,321; chunk_target=10000
    # with the 'ends' strategy -> 12 chunks with these exact sums
    full = tokenlist_from_ef(
        read_ef_json(spark, f"{DATA}/green-gables-full.json", multiline=True)
    ).cache()
    assert full.filter(F.col("section") == "body").agg(F.sum("count")).first()[0] == 124321
    ch = chunked_tokenlist(full, chunk_target=10000, overflow_strategy="ends",
                           section="body", case=True, pos=True)
    sums = {r["chunk"]: r["s"] for r in ch.groupBy("chunk").agg(F.sum("count").alias("s")).collect()}
    assert [sums[k] for k in sorted(sums)] == [
        12267, 9951, 10065, 10013, 10119, 9829, 9955, 9973, 10117, 10094, 9917, 12021
    ]


def test_big_volume_golden_bz2(spark):
    # reference tests/test_volume.py:242 + tests/test_resolvers.py:119:
    # 56,397 tokenlist rows, sum 97,691 — read straight from the bz2 file
    # (Spark decompresses natively; the reference needs a Python codec layer)
    big = tokenlist_from_ef(
        read_ef_json(spark, f"{DATA}/aeu.ark+=13960=t1rf63t52.json.bz2", multiline=True)
    )
    body = fold_tokenlist(big, pages=True, section="all", case=True, pos=True, doc_col=None)
    assert body.count() == 56397
    assert body.agg(F.sum("count")).first()[0] == 97691


def test_reference_parquet_fixture_roundtrip(spark):
    # the reference's own pre-saved parquet fixtures load and fold
    # (tests/test_parsers.py:20-112 analog)
    import glob

    toks = glob.glob(f"{DATA}/fullparquet/*.tokens.parquet")
    if not toks:
        pytest.skip("no fullparquet fixture")
    df = spark.read.parquet(*toks)
    cols = set(df.columns)
    assert {"token", "count"} <= cols
    folded = fold_tokenlist(df, pages="page" in cols,
                            section="group" if "section" in cols else "all",
                            case=False, pos=False, doc_col=None)
    assert folded.count() > 0
