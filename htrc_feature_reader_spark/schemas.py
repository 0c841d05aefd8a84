"""Explicit StructTypes for every table in the engine's data model.

Mirrors the reference data model (SURVEY.md §1; /root/reference/htrc_features/
parsers.py:342-429 for the long tables, parsers.py:145-178 for metadata and
per-page/section scalar features) plus the BASELINE.json north-rule input
(``sequences``: doc_id, tokens array<int32>, n_tok int32, source string — we
add ``ts timestamp`` for the temporal axis).

Schemas are always passed explicitly to readers — no inference — so a scan
never pays an inference pass and partial-schema files are detected by column
presence, exactly as the reference's parquet loader does
(parsers.py:560-570).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# North-rule primary input: pre-tokenized training sequences
# (BASELINE.json input_hint). ``tokens`` is a pass-through column: the
# engine never re-encodes it — per-row byte equality is an invariant.
SEQUENCES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

# --------------------------------------------------------------------------
# The reference's core fact table: long-format token counts.
# Reference index (page, section, token, pos) -> count
# (parsers.py:342-382); corpus-wide we add htid as a leading column
# (reference prepends it on demand, feature_reader.py:717-719).
TOKENLIST_SCHEMA = T.StructType(
    [
        T.StructField("htid", T.StringType(), False),
        T.StructField("page", T.LongType(), False),
        T.StructField("section", T.StringType(), False),
        T.StructField("token", T.StringType(), False),
        T.StructField("pos", T.StringType(), False),
        T.StructField("count", T.LongType(), False),
    ]
)

# Per-(page, section) scalar features (parsers.py:315-330, field list :177-178).
SECTION_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("htid", T.StringType(), False),
        T.StructField("page", T.LongType(), False),
        T.StructField("section", T.StringType(), False),
        T.StructField("tokenCount", T.LongType(), True),
        T.StructField("lineCount", T.LongType(), True),
        T.StructField("emptyLineCount", T.LongType(), True),
        T.StructField("capAlphaSeq", T.LongType(), True),
        T.StructField("sentenceCount", T.LongType(), True),
    ]
)

# Per-page scalars (parsers.py:304-313, field list :176).
PAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("htid", T.StringType(), False),
        T.StructField("page", T.LongType(), False),
        T.StructField("version", T.StringType(), True),
        T.StructField("calculatedLanguage", T.StringType(), True),
        T.StructField("languages", T.ArrayType(T.MapType(T.StringType(), T.StringType())), True),
    ]
)

# Begin/end-of-line character counts (parsers.py:384-429).
LINE_CHARS_SCHEMA = T.StructType(
    [
        T.StructField("htid", T.StringType(), False),
        T.StructField("page", T.LongType(), False),
        T.StructField("section", T.StringType(), False),
        T.StructField("place", T.StringType(), False),
        T.StructField("char", T.StringType(), False),
        T.StructField("count", T.LongType(), False),
    ]
)

# Volumes dimension: the reference's ~30 bibliographic metadata fields
# (parsers.py:145-174) become one row per htid. We carry the commonly-used
# subset; extra fields ride along in ``extra`` for lossless ingest.
VOLUMES_SCHEMA = T.StructType(
    [
        T.StructField("htid", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("pub_date", T.StringType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("page_count", T.LongType(), True),
        T.StructField("names", T.ArrayType(T.StringType()), True),
        T.StructField("genre", T.ArrayType(T.StringType()), True),
        T.StructField("source_institution", T.StringType(), True),
        T.StructField("access_profile", T.StringType(), True),
        T.StructField("schema_version", T.StringType(), True),
    ]
)

# --------------------------------------------------------------------------
# EF (Extracted Features) JSON v3.0 nested layout, for spark.read.json with
# an explicit schema (no inference pass over 100 TB of JSON). Shape per
# /root/reference/tests/data/green-gables-15pages.json and
# parsers.py:192-250. tokenPosCount is token -> {pos -> count}; begin/end
# char counts are char -> count maps. Sections may be null.
_EF_SECTION = T.StructType(
    [
        T.StructField("tokenCount", T.LongType(), True),
        T.StructField("lineCount", T.LongType(), True),
        T.StructField("emptyLineCount", T.LongType(), True),
        T.StructField("sentenceCount", T.LongType(), True),
        T.StructField("capAlphaSeq", T.LongType(), True),
        T.StructField(
            "tokenPosCount",
            T.MapType(T.StringType(), T.MapType(T.StringType(), T.LongType())),
            True,
        ),
        # schema 3.0 names (parsers.py:397-402); older variants handled at ingest
        T.StructField("beginCharCounts", T.MapType(T.StringType(), T.LongType()), True),
        T.StructField("endCharCount", T.MapType(T.StringType(), T.LongType()), True),
    ]
)

EF_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.StringType(), True),
        T.StructField("tokenCount", T.LongType(), True),
        T.StructField("lineCount", T.LongType(), True),
        T.StructField("emptyLineCount", T.LongType(), True),
        T.StructField("sentenceCount", T.LongType(), True),
        T.StructField("version", T.StringType(), True),
        T.StructField("calculatedLanguage", T.StringType(), True),
        T.StructField("languages", T.ArrayType(T.MapType(T.StringType(), T.StringType())), True),
        T.StructField("header", _EF_SECTION, True),
        T.StructField("body", _EF_SECTION, True),
        T.StructField("footer", _EF_SECTION, True),
    ]
)

EF_JSON_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("htid", T.StringType(), True),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("title", T.StringType(), True),
                    T.StructField("pubDate", T.StringType(), True),
                    T.StructField("language", T.StringType(), True),
                    T.StructField("names", T.ArrayType(T.StringType()), True),
                    T.StructField("genre", T.ArrayType(T.StringType()), True),
                    T.StructField("sourceInstitution", T.StringType(), True),
                    T.StructField("accessProfile", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField(
            "features",
            T.StructType(
                [
                    T.StructField("schemaVersion", T.StringType(), True),
                    T.StructField("pageCount", T.LongType(), True),
                    T.StructField("pages", T.ArrayType(EF_PAGE_SCHEMA), True),
                ]
            ),
            True,
        ),
    ]
)

SECTIONS = ("header", "body", "footer")

# Supported EF schema versions (parsers.py:140).
SUPPORTED_SCHEMA_VERSIONS = (
    "3.0",
    "https://schemas.hathitrust.org/EF_Schema_FeaturesSubSchema_v_3.0",
)
