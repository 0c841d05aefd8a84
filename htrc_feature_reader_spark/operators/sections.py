"""Per-(page, section) scalar feature folds (operators A5/F1/F2/F4).

Reference: ``Volume.section_features`` at /root/reference/htrc_features/
feature_reader.py:487-506 — select a section (filter), or section='group'
sums the five scalar features across sections per page; ``feature=`` projects
one column; ``page_select`` restricts to one page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import MissingFieldError
from .tokenlist import SECREF

FEATURE_COLS = ("tokenCount", "lineCount", "emptyLineCount", "capAlphaSeq", "sentenceCount")


def fold_section_features(
    df: DataFrame,
    section: str = "all",
    feature: str | None = None,
    page_select: int | None = None,
    doc_col: str = "htid",
) -> DataFrame:
    """Slice/fold the per-(page, section) scalar feature table."""
    cols = set(df.columns)
    if feature is not None and feature not in cols:
        raise MissingFieldError(f"unknown feature column {feature!r}")
    feats = [feature] if feature else [c for c in FEATURE_COLS if c in cols]

    if page_select is not None:
        df = df.filter(F.col("page") == F.lit(page_select))

    keys = [c for c in (doc_col,) if c in cols] + ["page"]
    if section in SECREF:
        df = df.filter(F.col("section") == F.lit(section))
        return df.select(*keys, "section", *feats)
    if section == "all":
        return df.select(*keys, "section", *feats)
    if section == "group":
        return df.groupBy(*keys).agg(*[F.sum(c).alias(c) for c in feats])
    raise ValueError("invalid section argument: %r" % section)
