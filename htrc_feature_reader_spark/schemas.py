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

# Volumes dimension: the reference's full bibliographic metadata surface
# (parsers.py:145-174: METADATA_FIELDS + METADATA_FIELDS_1_3 +
# METADATA_FIELDS_3_0, with the `_ld` name flattening of :220-242) becomes
# one row per htid. Era-specific fields are null for the other era; the raw
# metadata subtree rides along losslessly in ``extra`` (VariantType).
_LD_ENTITY = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
    ]
)

VOLUMES_SCHEMA = T.StructType(
    [
        T.StructField("htid", T.StringType(), False),
        # METADATA_FIELDS (all eras, parsers.py:145-152)
        T.StructField("metadata_schema_version", T.StringType(), True),
        T.StructField("enumeration_chronology", T.StringType(), True),
        T.StructField("type_of_resource", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("date_created", T.StringType(), True),
        T.StructField("pub_date", T.StringType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("access_profile", T.StringType(), True),
        T.StructField("isbn", T.ArrayType(T.StringType()), True),
        T.StructField("issn", T.ArrayType(T.StringType()), True),
        T.StructField("lccn", T.ArrayType(T.StringType()), True),
        T.StructField("oclc", T.ArrayType(T.StringType()), True),
        T.StructField("page_count", T.LongType(), True),
        T.StructField("feature_schema_version", T.StringType(), True),
        # METADATA_FIELDS_1_3 (schema 2.0/3.0 era, parsers.py:154-165)
        T.StructField("ht_bib_url", T.StringType(), True),
        T.StructField("genre", T.ArrayType(T.StringType()), True),
        T.StructField("handle_url", T.StringType(), True),
        T.StructField("imprint", T.StringType(), True),
        T.StructField("names", T.ArrayType(T.StringType()), True),
        T.StructField("id", T.StringType(), True),
        T.StructField("source_institution", T.StringType(), True),
        T.StructField("classification", T.MapType(T.StringType(), T.ArrayType(T.StringType())), True),
        T.StructField("issuance", T.StringType(), True),
        T.StructField("bibliographic_format", T.StringType(), True),
        T.StructField("government_document", T.BooleanType(), True),
        T.StructField("hathitrust_record_number", T.StringType(), True),
        T.StructField("rights_attributes", T.StringType(), True),
        T.StructField("pub_place", T.StringType(), True),
        T.StructField("volume_identifier", T.StringType(), True),
        T.StructField("source_institution_record_number", T.StringType(), True),
        T.StructField("last_update_date", T.StringType(), True),
        # METADATA_FIELDS_3_0 (JSON-LD era, parsers.py:167-174) + flattening
        T.StructField("access_rights", T.StringType(), True),
        T.StructField("alternate_title", T.ArrayType(T.StringType()), True),
        T.StructField("category", T.ArrayType(T.StringType()), True),
        T.StructField("genre_ld", T.ArrayType(T.StringType()), True),
        T.StructField("contributor_ld", T.ArrayType(_LD_ENTITY), True),
        T.StructField("contributor", T.ArrayType(T.StringType()), True),
        T.StructField("source_institution_ld", _LD_ENTITY, True),
        T.StructField("lcc", T.ArrayType(T.StringType()), True),
        T.StructField("type", T.ArrayType(T.StringType()), True),
        T.StructField("is_part_of", T.VariantType(), True),
        T.StructField("last_rights_update_date", T.StringType(), True),
        T.StructField("pub_place_ld", _LD_ENTITY, True),
        T.StructField("main_entity_of_page", T.ArrayType(T.StringType()), True),
        T.StructField("publisher_ld", _LD_ENTITY, True),
        T.StructField("publisher", T.StringType(), True),
        # lossless raw metadata subtree
        T.StructField("extra", T.VariantType(), True),
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
        # per-version line-char key names (parsers.py:397-402):
        # '3.0' -> beginCharCounts/endCharCount; the URL schema ->
        # beginCharCount/endCharCount; <=2.0 -> beginLineChars/endLineChars.
        # All variants are declared so one scan serves any corpus era.
        T.StructField("beginCharCounts", T.MapType(T.StringType(), T.LongType()), True),
        T.StructField("beginCharCount", T.MapType(T.StringType(), T.LongType()), True),
        T.StructField("endCharCount", T.MapType(T.StringType(), T.LongType()), True),
        T.StructField("beginLineChars", T.MapType(T.StringType(), T.LongType()), True),
        T.StructField("endLineChars", T.MapType(T.StringType(), T.LongType()), True),
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
        # The metadata subtree is era-polymorphic: the same key can be a
        # string in 2.0/3.0 files and a JSON-LD object (or object list) in
        # URL-schema files (parsers.py:154-174). VariantType reads every era
        # in ONE scan losslessly; volumes_from_ef extracts typed columns
        # with try_variant_get, dispatched on features.schemaVersion.
        T.StructField("metadata", T.VariantType(), True),
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
