"""EF-JSON ingest and parquet quad round-trips (reference test analogs:
tests/test_parsers.py:20-112, tests/test_resolvers.py:27-119)."""

import pytest
from pyspark.sql import functions as F

from htrc_feature_reader_spark.errors import MissingDataError
from htrc_feature_reader_spark.sources import (
    line_chars_from_ef,
    page_features_from_ef,
    read_ef_json,
    read_quad,
    section_features_from_ef,
    tokenlist_from_ef,
    volumes_from_ef,
    write_quad,
)


@pytest.fixture(scope="module")
def ef_raw(spark, tmp_path_factory):
    from htrc_feature_reader_spark.synth import write_ef_json_fixtures

    d = tmp_path_factory.mktemp("ef")
    write_ef_json_fixtures(str(d), n_volumes=3)
    return read_ef_json(spark, str(d)).cache()


def test_volumes_metadata(ef_raw):
    vols = volumes_from_ef(ef_raw).collect()
    assert len(vols) == 3
    v = {r["htid"]: r for r in vols}["syn.vol000"]
    assert v["pub_date"] == "1908"
    assert v["page_count"] == 10
    assert v["genre"] == ["fiction"]
    assert v["schema_version"] == "3.0"


def test_tokenlist_explode_matches_fixture_dicts(ef_raw):
    """Exploded counts match the raw nested dicts exactly (the reference's
    _make_tokencount_df contract, parsers.py:342-382)."""
    from htrc_feature_reader_spark.synth import make_ef_volume_dict

    tl = tokenlist_from_ef(ef_raw)
    got = {
        (r["htid"], r["page"], r["section"], r["token"], r["pos"]): r["count"]
        for r in tl.collect()
    }
    expect = {}
    for v in range(3):
        vol = make_ef_volume_dict(f"syn.vol{v:03d}", n_pages=10 + v, seed=42 + v)
        for pg in vol["features"]["pages"]:
            for sec in ("header", "body", "footer"):
                block = pg[sec]
                if not block:
                    continue
                for tok, posmap in block["tokenPosCount"].items():
                    for pos, c in posmap.items():
                        expect[(vol["htid"], int(pg["seq"]), sec, tok, pos)] = c
    assert got == expect


def test_zero_token_page_has_no_rows(ef_raw):
    tl = tokenlist_from_ef(ef_raw)
    assert tl.filter(F.col("page") == 2).count() == 0  # page 2 is the zero-token page


def test_section_features_invariant(ef_raw):
    """tokenCount per (page, section) equals the tokenlist sum for that
    (page, section) — FIXTURES.md T3 invariant."""
    sf = section_features_from_ef(ef_raw)
    tl = tokenlist_from_ef(ef_raw).groupBy("htid", "page", "section").agg(
        F.sum("count").alias("tlsum")
    )
    joined = sf.join(tl, on=["htid", "page", "section"], how="left").filter(
        F.col("tokenCount") > 0
    )
    assert joined.filter(F.col("tokenCount") != F.col("tlsum")).count() == 0


def test_line_chars_places(ef_raw):
    lc = line_chars_from_ef(ef_raw)
    places = {r["place"] for r in lc.select("place").distinct().collect()}
    assert places == {"begin", "end"}
    assert lc.filter(F.length("char") != 1).count() == 0


def test_page_features(ef_raw):
    pf = page_features_from_ef(ef_raw)
    r = pf.filter((F.col("htid") == "syn.vol000") & (F.col("page") == 1)).first()
    assert r["calculatedLanguage"] == "en"
    assert r["languages"] == [{"en": "1.00"}]


def test_quad_roundtrip_and_prefold(spark, ef_raw, tmp_path):
    tl = tokenlist_from_ef(ef_raw)
    total = tl.agg(F.sum("count")).first()[0]

    # full write + read back: counts conserved (the reference's round-trip
    # invariant, tests/test_resolvers.py:119)
    write_quad(str(tmp_path / "full"), tokenlist=tl,
               section_features=section_features_from_ef(ef_raw),
               line_chars=line_chars_from_ef(ef_raw),
               volumes=volumes_from_ef(ef_raw))
    back = read_quad(spark, str(tmp_path / "full"), "tokens")
    assert back.agg(F.sum("count")).first()[0] == total
    assert set(back.columns) == {"htid", "page", "section", "token", "pos", "count"}

    # pre-folded write drops columns but conserves counts
    write_quad(str(tmp_path / "partial"), tokenlist=tl,
               token_kwargs=dict(case=False, pos=False, section="group"))
    partial = read_quad(spark, str(tmp_path / "partial"), "tokens")
    assert set(partial.columns) == {"htid", "page", "lowercase", "count"}
    assert partial.agg(F.sum("count")).first()[0] == total

    # missing part raises MissingDataError (tests/test_parsers.py:20-75)
    with pytest.raises(MissingDataError):
        read_quad(spark, str(tmp_path / "partial"), "meta")


def test_quad_chunked_write(spark, ef_raw, tmp_path):
    tl = tokenlist_from_ef(ef_raw)
    write_quad(str(tmp_path / "chunked"), tokenlist=tl,
               chunk_kwargs=dict(chunk_target=150, section="group", case=False, pos=False))
    back = read_quad(spark, str(tmp_path / "chunked"), "tokens")
    assert "chunk" in back.columns and "page" not in back.columns
    assert back.agg(F.sum("count")).first()[0] == tl.agg(F.sum("count")).first()[0]
