"""Fold-semantics matrix for fold_tokenlist, mirroring the reference's
tests (/root/reference/tests/test_volume.py:137-234): column sets per flag
combo, count conservation, page_freq semantics, min_count, partial-schema
errors."""

import pytest
from pyspark.sql import functions as F

from htrc_feature_reader_spark.errors import MissingFieldError
from htrc_feature_reader_spark.operators import (
    distinct_tokens,
    fold_tokenlist,
    term_page_freqs,
    term_volume_freqs,
    tokens_per_page,
)
from htrc_feature_reader_spark.operators.tokenlist import min_count_window


def total(df):
    return df.agg(F.sum("count")).first()[0]


def test_fold_matrix_columns(tokenlist_df):
    cases = [
        (dict(section="all"), ["htid", "page", "section", "token", "pos", "count"]),
        (dict(section="body"), ["htid", "page", "section", "token", "pos", "count"]),
        (dict(section="group"), ["htid", "page", "token", "pos", "count"]),
        (dict(section="all", case=False), ["htid", "page", "section", "lowercase", "pos", "count"]),
        (dict(section="all", pos=False), ["htid", "page", "section", "token", "count"]),
        (dict(section="group", pages=False), ["htid", "token", "pos", "count"]),
        (dict(section="body", drop_section=True), ["htid", "page", "token", "pos", "count"]),
    ]
    for kwargs, cols in cases:
        out = fold_tokenlist(tokenlist_df, **kwargs)
        assert out.columns == cols, kwargs


def test_count_conservation(tokenlist_df):
    """Sum(count) is invariant under every fold with page_freq=False
    (FIXTURES.md golden invariant 1)."""
    base = total(fold_tokenlist(tokenlist_df, section="all"))
    for kwargs in (
        dict(section="group"),
        dict(section="all", case=False),
        dict(section="group", pos=False),
        dict(section="group", pages=False, case=False, pos=False),
    ):
        assert total(fold_tokenlist(tokenlist_df, **kwargs)) == base, kwargs


def test_section_slice_sums(tokenlist_df):
    """'group' total = header+body+footer totals (test_volume.py:199-206)."""
    parts = [
        total(fold_tokenlist(tokenlist_df, section=s)) for s in ("header", "body", "footer")
    ]
    assert total(fold_tokenlist(tokenlist_df, section="group")) == sum(parts)


def test_case_fold_merges(tokenlist_df):
    sensitive = fold_tokenlist(tokenlist_df, pages=False, section="group", pos=False)
    folded = fold_tokenlist(tokenlist_df, pages=False, section="group", pos=False, case=False)
    assert folded.count() < sensitive.count()
    assert total(folded) == total(sensitive)


def test_page_freq_pages_true(tokenlist_df):
    out = fold_tokenlist(tokenlist_df, section="group", page_freq=True)
    assert out.filter(F.col("count") != 1).count() == 0


def test_page_freq_pages_false_counts_distinct_pages(tokenlist_df):
    """pages=False + page_freq=True -> count = #distinct pages containing
    the token (the reference's documented intent, feature_reader.py:37-39)."""
    out = fold_tokenlist(
        tokenlist_df, pages=False, section="group", case=False, pos=False, page_freq=True
    )
    # cross-check one token per doc against a direct computation
    sample = out.limit(5).collect()
    for r in sample:
        expect = (
            tokenlist_df.filter(
                (F.col("htid") == r["htid"]) & (F.lower(F.col("token")) == r["lowercase"])
            )
            .select("page")
            .distinct()
            .count()
        )
        assert expect == r["count"]


def test_page_select(tokenlist_df):
    out = fold_tokenlist(tokenlist_df, section="all", page_select=3)
    pages = [r["page"] for r in out.select("page").distinct().collect()]
    assert pages == [3]
    # absent page -> empty, not an error (feature_reader.py:701-707)
    assert fold_tokenlist(tokenlist_df, section="all", page_select=999999).count() == 0


def test_missing_field_errors(tokenlist_df):
    partial = fold_tokenlist(
        tokenlist_df, pages=True, section="group", case=False, pos=False
    )  # columns: htid, page, lowercase, count
    with pytest.raises(MissingFieldError):
        fold_tokenlist(partial, section="body")  # no section col, explicit slice
    with pytest.raises(MissingFieldError):
        fold_tokenlist(partial, section="group", case=True)  # no raw-case token
    with pytest.raises(MissingFieldError):
        fold_tokenlist(partial, section="group", case=False, pos=True)  # no pos
    # but compatible folds still work
    assert fold_tokenlist(partial, section="group", case=False, pos=False).count() > 0


def test_chunk_column_treated_as_page(tokenlist_df):
    from htrc_feature_reader_spark.operators.chunking import chunked_tokenlist

    chunked = chunked_tokenlist(tokenlist_df, chunk_target=300, section="all")
    refold = fold_tokenlist(chunked, pages=True, section="group", case=False, pos=False)
    assert "chunk" in refold.columns
    assert total(refold) == total(fold_tokenlist(tokenlist_df, section="group"))


def test_min_count_variants_agree(tokenlist_df):
    a = distinct_tokens(tokenlist_df, case=False, min_count=20)
    b = (
        min_count_window(tokenlist_df, min_count=20, case=False)
        .select("htid", "lowercase")
        .distinct()
    )
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0


def test_term_volume_freqs(tokenlist_df):
    out = term_volume_freqs(tokenlist_df, page_freq=True, pos=False, case=False)
    rows = out.collect()
    # ranked descending
    counts = [r["count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    # page_freq=True: count is #pages containing the term, bounded by page count
    max_pages = tokenlist_df.select("page").distinct().count()
    assert max(counts) <= max_pages
    # reference default slices to body: equals the explicit body fold and is
    # strictly narrower than the all-sections fold
    body = term_volume_freqs(
        tokenlist_df.filter(F.col("section") == "body"),
        page_freq=True, pos=False, case=False, section="group",
    )
    assert out.exceptAll(body).count() == 0
    total_all = term_volume_freqs(
        tokenlist_df, page_freq=True, pos=False, case=False, section="group"
    ).agg(F.sum("count")).first()[0]
    assert total_all >= out.agg(F.sum("count")).first()[0]


def test_tokens_per_page_matches_fold(tokenlist_df):
    # section='group' folds every section, matching the direct full sum
    via_fold = tokens_per_page(tokenlist_df, section="group")
    direct = tokenlist_df.groupBy("htid", "page").agg(F.sum("count").alias("count"))
    assert via_fold.exceptAll(direct).count() == 0
    # the default slices to 'body' first, like the reference
    # (section_features inherits default_page_section='body')
    via_default = tokens_per_page(tokenlist_df)
    direct_body = (
        tokenlist_df.filter(F.col("section") == "body")
        .groupBy("htid", "page").agg(F.sum("count").alias("count"))
    )
    assert via_default.exceptAll(direct_body).count() == 0
    assert direct_body.exceptAll(via_default).count() == 0


def test_term_page_freqs_pivot(tokenlist_df):
    out = term_page_freqs(
        tokenlist_df, page_freq=False, case=False, token_values=["the", "green", "house"]
    )
    assert set(out.columns) >= {"htid", "page", "the", "green", "house"}
    # pivot cell equals the direct filtered sum
    row = out.orderBy("htid", "page").first()
    direct = (
        tokenlist_df.filter(
            (F.col("htid") == row["htid"]) & (F.col("page") == row["page"])
            & (F.lower(F.col("token")) == "the")
        ).agg(F.coalesce(F.sum("count"), F.lit(0))).first()[0]
    )
    assert row["the"] == direct


def test_case_fold_unicode_parity_with_reference(spark):
    """C1: the reference folds case with pandas ``Series.str.lower()``
    (feature_reader.py:85-86); the engine uses JVM ``F.lower``. Verified
    exhaustively over U+0020..U+2FFFF (zero divergent codepoints) — this
    test pins the cased subset so a Spark/ICU upgrade that changes the
    mapping fails loudly."""
    import pyspark.sql.functions as F

    cased = [chr(cp) for cp in range(0x20, 0x30000) if chr(cp).lower() != chr(cp)]
    df = spark.createDataFrame([(c,) for c in cased], "token string")
    rows = df.select("token", F.lower("token").alias("jvm")).collect()
    diff = [r for r in rows if r["jvm"] != r["token"].lower()]
    assert diff == []
