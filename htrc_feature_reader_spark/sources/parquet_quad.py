"""Parquet "quad" layout read/write (operators S7/S8) + partial schemas.

The reference stores each volume as up to four files — ``{id}.tokens.parquet``,
``.chars.parquet``, ``.section.parquet``, ``.meta.json`` — and reconstructs
whatever index columns exist (parsers.py:476-586). Corpus-scale Spark keeps
the same logical quad as four *tables* (directories), partitionable and
prunable; per-volume files would be millions of tiny objects, the #1
anti-pattern at 100 TB.

Partial schemas are first-class exactly as in the reference
(parsers.py:560-570; tests/test_parsers.py:80-112): ``write_quad`` can
pre-fold the token table via ``token_kwargs`` (dropping section/pos/case or
chunking pages), and downstream folds adapt to whichever columns survived —
or raise MissingFieldError, which is tested.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..errors import MissingDataError
from ..operators.chunking import chunked_tokenlist
from ..operators.tokenlist import fold_tokenlist

TOKENS, CHARS, SECTION, META = "tokens", "chars", "section", "meta"
_PARTS = (TOKENS, CHARS, SECTION, META)


def write_quad(
    path: str,
    tokenlist: DataFrame | None = None,
    line_chars: DataFrame | None = None,
    section_features: DataFrame | None = None,
    volumes: DataFrame | None = None,
    mode: str = "overwrite",
    compression: str = "snappy",
    token_kwargs: dict | None = None,
    chunk_kwargs: dict | None = None,
    sort_for_compression: bool = True,
    partition_by: list[str] | None = None,
) -> None:
    """Write the quad tables under ``path``.

    ``token_kwargs`` pre-folds the token table before writing (the
    reference's fold-before-save, parsers.py:505-506 — e.g.
    ``dict(case=False, pos=False, drop_section=True)`` reproduces its
    'partialparq' fixture shape). ``chunk_kwargs`` instead writes a chunked
    tokenlist (tests/test_chunking.py:12-27 fixture shape).

    ``sort_for_compression`` sorts within partitions before writing — the
    reference measured ~20% size win from token-major ordering
    (dev/ParquetSizeComparisons.ipynb); ``sortWithinPartitions`` gets the
    run-length win without a global shuffle.
    """
    if tokenlist is not None:
        tl = tokenlist
        if chunk_kwargs is not None:
            tl = chunked_tokenlist(tl, **chunk_kwargs)
        elif token_kwargs:
            tl = fold_tokenlist(tl, **token_kwargs)
        if sort_for_compression:
            sort_cols = [c for c in tl.columns if c != "count"]
            tl = tl.sortWithinPartitions(*sort_cols)
        w = tl.write.mode(mode).option("compression", compression)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(os.path.join(path, TOKENS))
    for df, name in ((line_chars, CHARS), (section_features, SECTION), (volumes, META)):
        if df is not None:
            df.write.mode(mode).option("compression", compression).parquet(
                os.path.join(path, name)
            )


def read_quad(spark: SparkSession, path: str, part: str = TOKENS) -> DataFrame:
    """Read one quad table; MissingDataError when absent (parsers.py paths
    raise it for meta-only / tokens-only stores, tests/test_parsers.py:20-75).
    """
    if part not in _PARTS:
        raise ValueError(f"unknown quad part {part!r}")
    sub = os.path.join(path, part)
    if not os.path.isdir(sub):
        raise MissingDataError(f"quad part {part!r} not present at {path}")
    return spark.read.parquet(sub)
