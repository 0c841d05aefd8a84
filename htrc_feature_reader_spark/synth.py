"""Deterministic synthetic tables, generated distributed.

Everything here is a pure function of (seed, scale): rows are derived from
``spark.range(n)`` with ``xxhash64`` column arithmetic — no driver-side RNG,
no ``Date.now``-style nondeterminism, no collect. That means the generator
itself scales: the same code that makes 10^4 CI rows makes 10^9 bench rows
as a fully parallel Catalyst plan (FIXTURES.md requires seed-purity).

Tables produced:
- ``sequences``  — the north-rule input (BASELINE.json input_hint):
  (doc_id, ts, tokens array<int32>, n_tok, source). Zipf-ish doc_id skew so
  hot keys exist (exercises salted as-of joins), heavy-tailed token lengths,
  duplicate and gapped timestamps (exercises as-of / fill / sessionize).
- ``tokenlist``  — the reference's long fact table (FIXTURES.md T2), with
  mixed-case tokens (so case-folding merges rows), multi-POS tokens, and
  body-heavy section mass.
- EF-JSON volume fixtures — tiny nested-JSON volumes for the ingest path
  (FIXTURES.md T6), including null sections and a zero-token page.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def _h(seed: int, *cols):
    """Stable 64-bit mix of columns (xxhash64 — deterministic across runs)."""
    return F.xxhash64(*cols, F.lit(seed))


def _u(seed: int, *cols):
    """Uniform double in [0, 1) derived from the hash."""
    return (F.pmod(_h(seed, *cols), F.lit(1_000_000)).cast("double") / 1_000_000.0)


def generate_sequences(
    spark: SparkSession,
    n_rows: int,
    n_docs: int = 100,
    vocab_size: int = 50_000,
    seed: int = 42,
    start_ts: str = "2024-01-01 00:00:00",
    span_seconds: int | None = None,
    n_partitions: int | None = None,
) -> DataFrame:
    """North-rule ``sequences`` table (doc_id, ts, tokens, n_tok, source).

    doc_id skew: doc index = floor(n_docs * u^3) — u^3 concentrates mass on
    low indices, so doc000000 is a genuinely hot key (~10% of rows at
    n_docs=100), exercising the salted as-of path.

    Token lengths are heavy-tailed: ~95% of rows draw 1..100 tokens, ~5%
    draw up to 2000 (FIXTURES.md T1: lengths 1-2000, heavy-tailed).
    """
    span = span_seconds if span_seconds is not None else max(n_rows * 30, 3600)
    rng = spark.range(n_rows, numPartitions=n_partitions)
    i = F.col("id")

    doc_idx = F.floor(F.lit(float(n_docs)) * F.pow(_u(seed, i), F.lit(3.0))).cast("int")
    doc_idx = F.least(doc_idx, F.lit(n_docs - 1))

    ts_off = F.pmod(_h(seed + 1, i), F.lit(span))
    is_long = F.pmod(_h(seed + 2, i), F.lit(20)) == 0
    length = (
        F.lit(1)
        + F.pmod(_h(seed + 3, i), F.lit(100))
        + F.when(is_long, F.pmod(_h(seed + 4, i), F.lit(1900))).otherwise(F.lit(0))
    ).cast("int")

    tokens = F.transform(
        F.sequence(F.lit(0), length - 1),
        lambda k: F.pmod(_h(seed + 5, i, k), F.lit(vocab_size)).cast("int"),
    )
    source = F.element_at(
        F.array(F.lit("web"), F.lit("book"), F.lit("news"), F.lit("code")),
        (F.pmod(_h(seed + 6, i), F.lit(4)) + 1).cast("int"),
    )

    return rng.select(
        F.format_string("doc%06d", doc_idx).alias("doc_id"),
        (F.to_timestamp(F.lit(start_ts)) + F.make_interval(secs=ts_off.cast("double"))).alias("ts"),
        tokens.alias("tokens"),
        length.alias("n_tok"),
        source.alias("source"),
    )


_POS_TAGS = ("NN", "NNP", "VB", "DT", "JJ", "IN", ".", "UNK")
_TOKEN_STEMS = (
    "the", "green", "Gables", "anne", "said", "house", "tree", "Avonlea",
    "walk", "window", "morning", "bright", "!", ".", "over", "under",
    "Marilla", "river", "small", "grand",
)


def generate_tokenlist(
    spark: SparkSession,
    n_docs: int = 5,
    pages_per_doc: int = 20,
    rows_per_page: int = 30,
    seed: int = 42,
) -> DataFrame:
    """The reference's long-format fact table (FIXTURES.md T2).

    Properties engineered to exercise fold semantics exactly as the
    reference's fixtures do (tests/test_volume.py:137-221):
    - mixed-case tokens (case fold actually merges rows),
    - the same token with >=2 POS tags on one page,
    - body carries ~90% of mass; some pages lack header/footer rows.
    """
    n = n_docs * pages_per_doc * rows_per_page
    rng = spark.range(n)
    i = F.col("id")

    doc = F.floor(i / (pages_per_doc * rows_per_page)).cast("int")
    page = (F.pmod(F.floor(i / rows_per_page), F.lit(pages_per_doc)) + 1).cast("long")

    sec_draw = F.pmod(_h(seed, i), F.lit(20))
    section = (
        F.when(sec_draw == 0, F.lit("header"))
        .when(sec_draw == 1, F.lit("footer"))
        .otherwise(F.lit("body"))
    )
    stem = F.element_at(
        F.array(*[F.lit(t) for t in _TOKEN_STEMS]),
        (F.pmod(_h(seed + 1, i), F.lit(len(_TOKEN_STEMS))) + 1).cast("int"),
    )
    # Occasionally upper-case the stem so case=False merges distinct rows.
    token = F.when(F.pmod(_h(seed + 2, i), F.lit(4)) == 0, F.upper(stem)).otherwise(stem)
    pos = F.element_at(
        F.array(*[F.lit(p) for p in _POS_TAGS]),
        (F.pmod(_h(seed + 3, i), F.lit(len(_POS_TAGS))) + 1).cast("int"),
    )
    count = (F.pmod(_h(seed + 4, i), F.lit(8)) + 1).cast("long")

    raw = rng.select(
        F.format_string("vol%03d", doc).alias("htid"),
        page.alias("page"),
        section.alias("section"),
        token.alias("token"),
        pos.alias("pos"),
        count.alias("count"),
    )
    # Collapse duplicate (htid,page,section,token,pos) draws, as the real
    # table is keyed on the full index.
    return raw.groupBy("htid", "page", "section", "token", "pos").agg(
        F.sum("count").alias("count")
    )


def make_ef_volume_dict(htid: str, n_pages: int = 15, seed: int = 42,
                        era: str = "3.0") -> dict:
    """One EF-JSON volume as a plain dict (FIXTURES.md T6 layout).

    Driver-side (tiny fixture data only). Includes a zero-token page (page 2)
    and null header/footer sections on some pages, matching the shape quirks
    of the reference fixture green-gables-15pages.json.

    ``era`` selects the schema generation (reference parsers.py:140,154-174,
    397-402):
      - "3.0" (default): schemaVersion 3.0, 1.3-era metadata,
        beginCharCounts/endCharCount line-char keys
      - "2.0": legacy metadata, beginLineChars/endLineChars keys
      - "ld": the URL schema, JSON-LD metadata (entity objects,
        scalar-or-list polymorphism), beginCharCount/endCharCount keys
    """

    def det(a: int, b: int, mod: int) -> int:
        # small deterministic mixer, pure function of (seed, a, b)
        x = (seed * 1_000_003 + a * 7_919 + b * 104_729) & 0xFFFFFFFF
        x ^= x >> 13
        x = (x * 2_654_435_761) & 0xFFFFFFFF
        return x % mod

    pages = []
    for p in range(1, n_pages + 1):
        def section_block(sec_i: int, n_toks: int):
            if n_toks == 0:
                return None
            tpc: dict[str, dict[str, int]] = {}
            total = 0
            for t in range(n_toks):
                tok = _TOKEN_STEMS[det(p * 100 + sec_i, t, len(_TOKEN_STEMS))]
                if det(p, t + sec_i * 31, 4) == 0:
                    tok = tok.upper()
                pos = _POS_TAGS[det(p * 7 + sec_i, t, len(_POS_TAGS))]
                c = 1 + det(p, t * 3 + sec_i, 5)
                tpc.setdefault(tok, {})
                tpc[tok][pos] = tpc[tok].get(pos, 0) + c
                total += c
            begin = {chr(ord("a") + det(p, sec_i * 11 + k, 26)): 1 + det(p, k, 3) for k in range(4)}
            end = {".": 1 + det(p, sec_i, 4), chr(ord("a") + det(p, sec_i + 50, 26)): 1}
            begin_key, end_key = {
                "3.0": ("beginCharCounts", "endCharCount"),
                "ld": ("beginCharCount", "endCharCount"),
                "2.0": ("beginLineChars", "endLineChars"),
            }[era]
            return {
                "tokenCount": total,
                "lineCount": 5 + det(p, sec_i, 20),
                "emptyLineCount": det(p, sec_i + 1, 4),
                "sentenceCount": 1 + det(p, sec_i + 2, 12),
                "capAlphaSeq": det(p, sec_i + 3, 6),
                "tokenPosCount": tpc,
                begin_key: begin,
                end_key: end,
            }

        zero_page = p == 2
        body = section_block(1, 0 if zero_page else 5 + det(p, 0, 40))
        header = section_block(0, 0 if (zero_page or det(p, 1, 3) == 0) else 1 + det(p, 2, 3))
        footer = section_block(2, 0 if (zero_page or det(p, 3, 2) == 0) else 1 + det(p, 4, 2))
        tc = sum(s["tokenCount"] for s in (header, body, footer) if s)
        pages.append(
            {
                "seq": f"{p:08d}",
                "tokenCount": tc,
                "lineCount": sum(s["lineCount"] for s in (header, body, footer) if s),
                "emptyLineCount": sum(s["emptyLineCount"] for s in (header, body, footer) if s),
                "sentenceCount": sum(s["sentenceCount"] for s in (header, body, footer) if s),
                "version": "2020-07",
                "calculatedLanguage": "en",
                "languages": [{"en": "1.00"}],
                "header": header,
                "body": body,
                "footer": footer,
            }
        )
    if era == "ld":
        # JSON-LD metadata (URL schema): entity objects, scalar-or-list
        # polymorphism, URI genres (reference parsers.py:167-174,220-242)
        metadata = {
            "schemaVersion": "2.0",
            "title": f"Synthetic Volume {htid}",
            "alternateTitle": f"Alt {htid}",  # scalar (wrap-to-list path)
            "pubDate": 1908,  # LD files carry ints
            "language": "en",
            "accessProfile": "open",
            "accessRights": "pd",
            "category": ["Literature", "Fiction"],
            "genre": ["http://id.loc.gov/vocabulary/marcgt/nov",
                      "http://id.loc.gov/vocabulary/marcgt/fic"],
            "contributor": {"id": "http://www.viaf.org/viaf/0",
                            "name": "Synthetic, Author", "type": "Person"},
            "publisher": {"id": "http://catalog.example/pub",
                          "name": "Synthetic Press", "type": "Organization"},
            "pubPlace": {"id": "http://id.loc.gov/vocabulary/countries/onc",
                         "name": "Ontario", "type": "Place"},
            "sourceInstitution": {"name": "SYN", "type": "Organization"},
            "id": f"https://hdl.example/2027/{htid}",
            "lcc": "PR9199.3",  # scalar (wrap-to-list path)
            "type": ["DataFeedItem", "Book"],
            "isPartOf": {"title": "Synthetic Series", "volume": 1},
            "lastRightsUpdateDate": 20200209,
            "mainEntityOfPage": [f"https://catalog.example/{htid}"],
            "oclc": "320127250",  # scalar (wrap-to-list path)
            "enumerationChronology": "v.1",
            "typeOfResource": "http://id.loc.gov/ontologies/bibframe/Text",
            "dateCreated": 20200301,
        }
        feature_schema = "https://schemas.hathitrust.org/EF_Schema_FeaturesSubSchema_v_3.0"
        top_id = {"htid": htid}
    else:
        # 1.3-era metadata (reference parsers.py:145-165 field surface)
        metadata = {
            "schemaVersion": "1.3",
            "title": f"Synthetic Volume {htid}",
            "pubDate": "1908",
            "language": "en",
            "names": ["Synthetic, Author"],
            "genre": ["fiction"],
            "sourceInstitution": "SYN",
            "accessProfile": "open",
            "dateCreated": "2016-06-19T02:14:20Z",
            "enumerationChronology": "v.1",
            "typeOfResource": "text",
            "isbn": ["0665034075"],
            "issn": [],
            "lccn": [],
            "oclc": ["320127250"],
            "htBibUrl": f"http://catalog.example/api/volumes/full/htid/{htid}.json",
            "handleUrl": f"http://hdl.example/2027/{htid}",
            "imprint": "Synthetic Press, 1908.",
            "classification": {"ddc": ["813.52"]},
            "issuance": "monographic",
            "bibliographicFormat": "BK",
            "governmentDocument": False,
            "hathitrustRecordNumber": "0000001",
            "rightsAttributes": "pd",
            "pubPlace": "onc",
            "volumeIdentifier": htid,
            "sourceInstitutionRecordNumber": "2480325",
            "lastUpdateDate": "2010-04-29 20:31:43",
        }
        feature_schema = era
        # legacy files carry a top-level 'id' (reference field map '.id',
        # parsers.py:155); only LD files use '.htid'
        top_id = {"id": htid}
    return {
        **top_id,
        "metadata": metadata,
        "features": {
            "schemaVersion": feature_schema,
            "pageCount": n_pages,
            "pages": pages,
        },
    }


def write_ef_json_fixtures(path: str, n_volumes: int = 3, seed: int = 42,
                           era: str = "3.0") -> list[str]:
    """Write newline-delimited EF-JSON volume files; returns file paths."""
    import os

    os.makedirs(path, exist_ok=True)
    out = []
    for v in range(n_volumes):
        htid = f"syn.vol{v:03d}"
        fp = os.path.join(path, f"{htid}.json")
        with open(fp, "w") as f:
            json.dump(make_ef_volume_dict(htid, n_pages=10 + v, seed=seed + v, era=era), f)
        out.append(fp)
    return out
