"""EF-JSON sink (operator S9): long tables -> nested EF v3.0 JSON.

The reference's JSON writer is a byte-faithful file copy with optional
re-compression (parsers.py:252-272) — trivial because it never re-encodes.
The engine-side analog worth having is the inverse of the ingest exploder:
re-assemble the nested page/section/tokenPosCount structure from the long
tables and write NDJSON (one volume per line; Spark compresses via
``option('compression', ...)``). Ingest(sink(ingest(x))) == ingest(x) is
tested — the engine's byte-fidelity analog at the semantic level.

All pure Catalyst: groupBy + map_from_entries + collect_list; the only
shuffle keys are (htid, page, section) then (htid, page) then htid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import SECTIONS


def _section_struct(tokens_g: DataFrame, sec_feats: DataFrame | None,
                    line_chars: DataFrame | None) -> DataFrame:
    """Per (htid, page, section): tokenPosCount map + scalars + char maps."""
    tpc = (
        tokens_g.groupBy("htid", "page", "section", "token")
        .agg(F.map_from_entries(F.collect_list(F.struct("pos", "count"))).alias("posmap"))
        .groupBy("htid", "page", "section")
        .agg(F.map_from_entries(F.collect_list(F.struct("token", "posmap"))).alias("tokenPosCount"),
             F.sum(F.aggregate(F.map_values("posmap"), F.lit(0).cast("long"), lambda a, x: a + x)).alias("tokenCount"))
    )
    if line_chars is not None:
        chars = (
            line_chars.groupBy("htid", "page", "section", "place")
            .agg(F.map_from_entries(F.collect_list(F.struct("char", "count"))).alias("cmap"))
            .groupBy("htid", "page", "section")
            .pivot("place", ["begin", "end"])
            .agg(F.first("cmap"))
            .withColumnsRenamed({"begin": "beginCharCounts", "end": "endCharCount"})
        )
        tpc = tpc.join(chars, on=["htid", "page", "section"], how="left")
    else:
        tpc = tpc.withColumn("beginCharCounts", F.lit(None).cast("map<string,long>"))
        tpc = tpc.withColumn("endCharCount", F.lit(None).cast("map<string,long>"))
    if sec_feats is not None:
        tpc = tpc.drop("tokenCount").join(
            sec_feats.select("htid", "page", "section", "tokenCount", "lineCount",
                             "emptyLineCount", "sentenceCount", "capAlphaSeq"),
            on=["htid", "page", "section"], how="left",
        )
    else:
        for c in ("lineCount", "emptyLineCount", "sentenceCount", "capAlphaSeq"):
            tpc = tpc.withColumn(c, F.lit(None).cast("long"))
    return tpc


def write_ef_json(
    path: str,
    tokenlist: DataFrame,
    section_features: DataFrame | None = None,
    line_chars: DataFrame | None = None,
    volumes: DataFrame | None = None,
    page_features: DataFrame | None = None,
    compression: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Re-assemble EF v3.0 nested volumes and write NDJSON.

    ``page_features``: optional (htid, page, version, calculatedLanguage,
    languages) rows — written as per-page scalars, the inverse of
    ``page_features_from_ef``."""
    secs = _section_struct(tokenlist, section_features, line_chars)
    sec_struct = F.struct(
        "tokenCount", "lineCount", "emptyLineCount", "sentenceCount",
        "capAlphaSeq", "tokenPosCount", "beginCharCounts", "endCharCount",
    )
    pages = (
        secs.groupBy("htid", "page")
        .pivot("section", list(SECTIONS))
        .agg(F.first(sec_struct))
        .select("htid", "page", *[F.col(s).alias(s) for s in SECTIONS])
    )
    if page_features is not None:
        # FULL outer: a blank page (features but zero tokens in any
        # section) must still be written — the sink is the inverse of
        # page_features_from_ef, and pageCount counts it
        pages = pages.join(
            page_features.select(
                "htid", "page", "version", "calculatedLanguage", "languages"
            ),
            on=["htid", "page"], how="full_outer",
        )
    else:
        pages = (
            pages.withColumn("version", F.lit(None).cast("string"))
            .withColumn("calculatedLanguage", F.lit(None).cast("string"))
            .withColumn("languages", F.lit(None).cast("array<map<string,string>>"))
        )
    pages = pages.withColumn(
        "seq", F.format_string("%08d", F.col("page"))
    ).withColumn(
        "tokenCount",
        sum(F.coalesce(F.col(f"{s}.tokenCount"), F.lit(0)) for s in SECTIONS),
    )
    vols = (
        pages.orderBy("page")
        .groupBy("htid")
        .agg(
            # structs with map fields are not orderable: sort by page via
            # an explicit comparator
            F.array_sort(
                F.collect_list(F.struct(
                    "page", "seq", "tokenCount", "version",
                    "calculatedLanguage", "languages",
                    *[F.col(s) for s in SECTIONS]
                )),
                lambda l, r: F.when(l["page"] < r["page"], -1)
                .when(l["page"] > r["page"], 1)
                .otherwise(0),
            ).alias("_pg"),
        )
        .select(
            "htid",
            F.struct(
                F.lit("3.0").alias("schemaVersion"),
                F.size("_pg").alias("pageCount"),
                F.transform(
                    F.col("_pg"),
                    lambda p: F.struct(
                        p["seq"].alias("seq"),
                        p["tokenCount"].alias("tokenCount"),
                        p["version"].alias("version"),
                        p["calculatedLanguage"].alias("calculatedLanguage"),
                        p["languages"].alias("languages"),
                        *[p[s].alias(s) for s in SECTIONS],
                    ),
                ).alias("pages"),
            ).alias("features"),
        )
    )
    if volumes is not None:
        # full snake_case -> camelCase field map (inverse of
        # volumes_from_ef / reference parsers.py:145-174); optional columns
        # are written only when the caller's volumes table carries them
        field_map = {
            "title": "title",
            "pub_date": "pubDate",
            "language": "language",
            "names": "names",
            "genre": "genre",
            "source_institution": "sourceInstitution",
            "access_profile": "accessProfile",
            "ht_bib_url": "htBibUrl",
            "handle_url": "handleUrl",
            "imprint": "imprint",
            "isbn": "isbn",
            "issn": "issn",
            "lccn": "lccn",
            "oclc": "oclc",
            "classification": "classification",
            "issuance": "issuance",
            "bibliographic_format": "bibliographicFormat",
            "government_document": "governmentDocument",
            "rights_attributes": "rightsAttributes",
            "pub_place": "pubPlace",
            "type_of_resource": "typeOfResource",
            "date_created": "dateCreated",
            "enumeration_chronology": "enumerationChronology",
        }
        fields = [
            F.col(snake).alias(camel)
            for snake, camel in field_map.items()
            if snake in volumes.columns
        ]
        meta = volumes.select("htid", F.struct(*fields).alias("metadata"))
        vols = vols.join(meta, on="htid", how="left")
    w = vols.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
