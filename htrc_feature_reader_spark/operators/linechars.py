"""Line-character fold (operator A4/F3).

Reference: ``group_linechars`` at /root/reference/htrc_features/
feature_reader.py:144-173 — the same conditional-fold pattern as the
tokenlist over (page, section, place, char): 'all' keeps a level, a specific
value slices (filter), 'group' folds it out of the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import MissingFieldError
from .tokenlist import SECREF

PLACES = ("begin", "end")


def fold_linechars(
    df: DataFrame,
    section: str = "all",
    place: str = "all",
    doc_col: str = "htid",
    char_col: str = "char",
) -> DataFrame:
    """Fold the (page, section, place, char) -> count table.

    section: 'header'|'body'|'footer' slice, 'all' keep, 'group' fold.
    place:   'begin'|'end' slice, 'all' keep, 'group' fold.
    """
    cols = set(df.columns)
    for needed in ("page", char_col, "count"):
        if needed not in cols:
            raise MissingFieldError(f"line_chars table lacks column {needed!r}")

    if section in SECREF:
        df = df.filter(F.col("section") == F.lit(section))
    elif section not in ("all", "group"):
        raise ValueError("invalid section argument: %r" % section)
    if place in PLACES:
        df = df.filter(F.col("place") == F.lit(place))
    elif place not in ("all", "group"):
        raise ValueError("invalid place argument: %r" % place)

    group_cols = [c for c in (doc_col,) if c in cols]
    group_cols.append("page")
    if section != "group" and "section" in cols:
        group_cols.append("section")
    if place != "group" and "place" in cols:
        group_cols.append("place")
    group_cols.append(char_col)

    return df.groupBy(*group_cols).agg(F.sum("count").alias("count"))
