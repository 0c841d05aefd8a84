"""EF-JSON ingest: nested volume JSON -> the engine's long tables.

Replaces the reference's hand-rolled parser
(/root/reference/htrc_features/parsers.py:192-250, 282-430 — a preallocated
structured numpy array per volume) with pure Catalyst ``explode`` plans over
``spark.read.json`` with an explicit schema:

- one scan reads any number of volumes (a whole corpus manifest) in one job,
- bz2/gz decompression is native to Spark's text codecs (the reference
  decompresses per-file in Python, resolvers.py:65-79),
- token counts come from ``explode(tokenPosCount)`` twice (token map, then
  pos map) — no Python executes per row,
- null sections (parsers.py:317-320 skips them) drop out for free: explode
  of a null map yields no rows.

The "~40x faster than dict parsing" trick the reference is proud of
(parsers.py:355-357) is subsumed by Spark's vectorized JSON reader.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EF_JSON_SCHEMA, SECTIONS


def read_ef_json(
    spark: SparkSession,
    paths: str | list[str],
    multiline: bool = False,
) -> DataFrame:
    """Read EF volume JSON file(s) with the explicit v3.0 schema.

    ``multiline=True`` for pretty-printed one-object-per-file volumes (the
    HathiTrust distribution format); False for NDJSON manifests.
    """
    reader = spark.read.schema(EF_JSON_SCHEMA)
    if multiline:
        reader = reader.option("multiLine", "true")
    raw = reader.json(paths)
    # 'htid' (newer files) or 'id' (older) — parsers.py:244 equivalent
    return raw.withColumn("htid", F.coalesce(F.col("htid"), F.col("id")))


def _pages(raw: DataFrame) -> DataFrame:
    return raw.select(
        "htid", F.explode("features.pages").alias("pg")
    ).withColumn("page", F.col("pg.seq").cast("long"))


def tokenlist_from_ef(raw: DataFrame) -> DataFrame:
    """(htid, page, section, token, pos, count) — operator S2.

    Reference: _make_tokencount_df (parsers.py:342-382). The double explode
    unnests token -> {pos -> count} maps; output matches TOKENLIST_SCHEMA.

    Single-scan shape: the three sections become an array<struct> exploded
    in one pass — a per-section union would re-parse every JSON file three
    times (measured 3x ingest cost on the reference corpus).
    """
    pages = _pages(raw)
    sec_arr = F.array(*[
        F.struct(F.lit(sec).alias("section"),
                 F.col(f"pg.{sec}.tokenPosCount").alias("tpc"))
        for sec in SECTIONS
    ])
    return (
        pages.select("htid", "page", F.explode(sec_arr).alias("s"))
        .filter(F.col("s.tpc").isNotNull())
        .select("htid", "page", F.col("s.section").alias("section"),
                F.explode("s.tpc").alias("token", "posmap"))
        .select("htid", "page", "section", "token",
                F.explode("posmap").alias("pos", "count"))
    )


def section_features_from_ef(raw: DataFrame) -> DataFrame:
    """(htid, page, section, 5 scalar features) — operator S4.

    Reference: _make_section_feature_df (parsers.py:315-330); null sections
    are dropped, matching the reference's per-section skip.
    """
    pages = _pages(raw)
    sec_arr = F.array(*[
        F.struct(
            F.lit(sec).alias("section"),
            F.col(f"pg.{sec}").isNotNull().alias("present"),
            F.col(f"pg.{sec}.tokenCount").alias("tokenCount"),
            F.col(f"pg.{sec}.lineCount").alias("lineCount"),
            F.col(f"pg.{sec}.emptyLineCount").alias("emptyLineCount"),
            F.col(f"pg.{sec}.capAlphaSeq").alias("capAlphaSeq"),
            F.col(f"pg.{sec}.sentenceCount").alias("sentenceCount"),
        )
        for sec in SECTIONS
    ])
    return (
        pages.select("htid", "page", F.explode(sec_arr).alias("s"))
        .filter(F.col("s.present"))
        .select("htid", "page", F.col("s.section").alias("section"),
                F.col("s.tokenCount").alias("tokenCount"),
                F.col("s.lineCount").alias("lineCount"),
                F.col("s.emptyLineCount").alias("emptyLineCount"),
                F.col("s.capAlphaSeq").alias("capAlphaSeq"),
                F.col("s.sentenceCount").alias("sentenceCount"))
    )


def page_features_from_ef(raw: DataFrame) -> DataFrame:
    """Per-page scalars (htid, page, version, calculatedLanguage, languages)
    — operator S5 (parsers.py:304-313)."""
    return _pages(raw).select(
        "htid",
        "page",
        F.col("pg.version").alias("version"),
        F.col("pg.calculatedLanguage").alias("calculatedLanguage"),
        F.col("pg.languages").alias("languages"),
    )


def line_chars_from_ef(raw: DataFrame) -> DataFrame:
    """(htid, page, section, place, char, count) — operator S3.

    Reference: _make_line_char_df (parsers.py:384-429). 'begin' rows come
    from beginCharCounts, 'end' rows from endCharCount (3.0 names;
    parsers.py:397-402 lists per-version variants).
    """
    pages = _pages(raw)
    sec_arr = F.array(*[
        F.struct(F.lit(sec).alias("section"), F.lit(place).alias("place"),
                 F.col(f"pg.{sec}.{field}").alias("cmap"))
        for sec in SECTIONS
        for place, field in (("begin", "beginCharCounts"), ("end", "endCharCount"))
    ])
    return (
        pages.select("htid", "page", F.explode(sec_arr).alias("s"))
        .filter(F.col("s.cmap").isNotNull())
        .select("htid", "page", F.col("s.section").alias("section"),
                F.col("s.place").alias("place"),
                F.explode("s.cmap").alias("char", "count"))
    )


# MARC genre-term URI -> label (reference utils.py:7, applied at
# parsers.py:232-236). Kept as a literal map expression — a broadcast-free
# constant-folded lookup.
_MARCGT = {
    "fic": "fiction", "bio": "biography", "his": "history", "poe": "poetry",
    "dra": "drama", "new": "newspaper", "per": "periodical", "gov": "government publication",
    "dic": "dictionary", "enc": "encyclopedia", "law": "law report or digest",
    "cat": "catalog", "the": "thesis", "boo": "book", "ess": "essay",
}
_MARCGT_PREFIX = "http://id.loc.gov/vocabulary/marcgt/"


def _genre_label(col):
    code = F.substring(col, len(_MARCGT_PREFIX) + 1, 10)
    mapping = F.create_map(*[F.lit(x) for kv in _MARCGT.items() for x in kv])
    return F.when(
        col.startswith(_MARCGT_PREFIX) & mapping.getItem(code).isNotNull(),
        mapping.getItem(code),
    ).otherwise(col)


def volumes_from_ef(raw: DataFrame) -> DataFrame:
    """One metadata row per volume — operator S6 (parsers.py:206-242).

    camelCase -> snake_case renames per the reference's field maps
    (parsers.py:145-174); MARC genre URIs mapped to labels (utils.py:7).
    """
    return raw.select(
        "htid",
        F.col("metadata.title").alias("title"),
        F.col("metadata.pubDate").alias("pub_date"),
        F.col("metadata.language").alias("language"),
        F.col("features.pageCount").alias("page_count"),
        F.col("metadata.names").alias("names"),
        F.transform(F.col("metadata.genre"), _genre_label).alias("genre"),
        F.col("metadata.sourceInstitution").alias("source_institution"),
        F.col("metadata.accessProfile").alias("access_profile"),
        F.col("features.schemaVersion").alias("schema_version"),
    )
