"""The tokenlist fold family — the reference's central operators, Spark-first.

Replicates the semantics of ``group_tokenlist`` and the ``tokenlist()``
surface (reference: /root/reference/htrc_features/feature_reader.py:25-112
and :615-721) as corpus-wide Catalyst plans:

- the fold is a plain ``groupBy(...).agg(sum(count))`` whose grouping key is
  assembled from the same flag decision table the reference uses;
- section slicing is a pushed-down filter; case folding is ``lower()``;
- ``page_freq`` both branches implement the *intended* semantics (the
  reference's pages=False branch crashes on modern pandas — SURVEY.md §5);
- partial-schema tables (missing section/pos/token, chunk-for-page) are
  detected by column presence and raise ``MissingFieldError`` exactly where
  the reference does (feature_reader.py:676-699).

Everything is whole-stage-codegen'd JVM work: no UDFs. At 100 TB the fold
is one hash-aggregate with map-side partial aggregation; Catalyst prunes the
parquet scan to exactly the grouping + count columns and pushes the section/
page filters into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..errors import MissingFieldError

SECREF = ("header", "body", "footer")


def _page_colname(df: DataFrame) -> str | None:
    """'page', or 'chunk' when the table was saved chunked (the reference
    treats them identically — feature_reader.py:676-681)."""
    if "page" in df.columns:
        return "page"
    if "chunk" in df.columns:
        return "chunk"
    return None


def _token_col(df: DataFrame, case: bool):
    """Resolve the token grouping column per the case flag.

    case=True needs raw-case 'token'; case=False prefers a stored
    'lowercase' column (pre-folded parquet) and otherwise derives it.
    Reference: feature_reader.py:81-89, 694-699.
    """
    cols = df.columns
    if case:
        if "token" not in cols:
            raise MissingFieldError(
                "case=True requires a raw-case 'token' column; this table "
                f"has {cols} (saved case-folded?)"
            )
        return F.col("token"), "token"
    if "lowercase" in cols:
        return F.col("lowercase"), "lowercase"
    if "token" not in cols:
        raise MissingFieldError("neither 'token' nor 'lowercase' column present")
    return F.lower(F.col("token")).alias("lowercase"), "lowercase"


def fold_tokenlist(
    df: DataFrame,
    pages: bool = True,
    section: str = "default",
    case: bool = True,
    pos: bool = True,
    page_freq: bool = False,
    page_select: int | None = None,
    drop_section: bool = False,
    doc_col: str = "htid",
) -> DataFrame:
    """Conditional fold of the long token-count table (operator A1/A2/A3).

    Flag semantics match the reference exactly (feature_reader.py:25-112):

    - ``pages``: keep the page (or chunk) level, else sum across pages.
    - ``section``: 'header'|'body'|'footer' slices to that section (keeping
      the now-constant column); 'all' keeps the level; 'group' folds it.
      Ignored when the table has no section column — unless a specific
      section was requested, which raises MissingFieldError
      (feature_reader.py:685-689).
    - ``case``: False groups on lowercased tokens (column 'lowercase').
    - ``pos``: False folds across part-of-speech tags.
    - ``page_freq``: True→ per-page counts become presence (1); with
      pages=False, count = number of distinct pages containing the token
      (the docstring semantics at feature_reader.py:37-39; the reference's
      own pages=False code path is broken on pandas>=2).
    - ``page_select``: restrict to one page; absent page → empty result,
      not an error (feature_reader.py:701-707).
    - ``doc_col``: corpus-wide grouping key; pass None for single-volume
      frames (the reference's per-volume view).
    """
    cols = set(df.columns)
    pagecol = _page_colname(df)

    # 'default' inherits body / degrades to cross-section fold on
    # sectionless tables; explicit slices on sectionless tables raise —
    # one rule, one place (_resolve_section)
    section = _resolve_section(df, section)
    if (pages or page_select is not None) and pagecol is None:
        raise MissingFieldError("table has neither 'page' nor 'chunk' column")
    if page_select is not None and not pages:
        raise ValueError("page_select requires pages=True")
    if "section" not in cols:
        # explicit SECREF slices already raised inside _resolve_section
        section = "ignore"
    elif section not in SECREF + ("all", "group"):
        raise ValueError("invalid section argument: %r" % section)

    if pos and "pos" not in cols:
        raise MissingFieldError("pos=True requires a 'pos' column")

    token_expr, token_name = _token_col(df, case)

    # --- filters first: they push into the parquet scan ---
    if page_select is not None:
        df = df.filter(F.col(pagecol) == F.lit(page_select))
    if section in SECREF:
        df = df.filter(F.col("section") == F.lit(section))

    # --- grouping key per the reference's decision table ---
    keep_section = section in ("all",) + SECREF and not drop_section
    group_cols: list[str] = []
    if doc_col and doc_col in cols:
        group_cols.append(doc_col)
    if pages:
        group_cols.append(pagecol)
    if keep_section:
        group_cols.append("section")

    df = df.withColumn(token_name, token_expr)
    group_cols.append(token_name)
    if pos:
        group_cols.append("pos")

    if page_freq and not pages:
        # number of distinct pages containing the token
        out = df.groupBy(*group_cols).agg(
            F.countDistinct(pagecol).cast("long").alias("count")
        )
    else:
        out = df.groupBy(*group_cols).agg(F.sum("count").alias("count"))
        if page_freq:
            out = out.withColumn("count", F.lit(1).cast("long"))
    return out


def distinct_tokens(
    df: DataFrame,
    case: bool = True,
    min_count: int = 1,
    doc_col: str | None = "htid",
) -> DataFrame:
    """Unique tokens, optionally filtered by summed count >= min_count
    (operators A8 + F5; reference feature_reader.py:559-568).

    The reference evaluates min_count with a groupwise ``transform('sum')``
    over the *whole volume* — here a window sum partitioned by
    (doc, token), then distinct. With doc_col=None the scope is the corpus.
    """
    token_expr, token_name = _token_col(df, case)
    df = df.withColumn(token_name, token_expr)
    keys = ([doc_col] if doc_col and doc_col in df.columns else []) + [token_name]
    if min_count > 1:
        # aggregate-then-filter: cheaper than the reference's window-sum
        # formulation (map-side partial agg; no per-row broadcast back)
        return (
            df.groupBy(*keys)
            .agg(F.sum("count").alias("_total"))
            .filter(F.col("_total") >= min_count)
            .select(*keys)
        )
    return df.select(*keys).distinct()


def _resolve_section(df: DataFrame, section: str) -> str:
    """Reference default-section semantics: section='default' inherits
    ``default_page_section`` and slices to 'body' (feature_reader.py:349) —
    unless the table has no section column (partial schemas), where the
    only meaningful default is folding across what's stored. An EXPLICIT
    slice request on a sectionless table raises instead of being silently
    rewritten to a cross-section fold."""
    has_section = "section" in df.columns
    if section == "default":
        return "body" if has_section else "group"
    if not has_section and section in SECREF:
        raise MissingFieldError(
            f"section={section!r} requested but this table has no section column"
        )
    return section


def term_volume_freqs(
    df: DataFrame,
    page_freq: bool = True,
    pos: bool = True,
    case: bool = True,
    doc_col: str = "htid",
    section: str = "default",
) -> DataFrame:
    """Per-volume term frequencies ranked descending (operator A7;
    reference feature_reader.py:772-779).

    page_freq=True (the reference default) makes 'count' the number of
    pages on which the term occurs. ``section`` defaults to 'body' like the
    reference (term_volume_freqs calls tokenlist() which inherits
    default_page_section='body', feature_reader.py:686); pass 'group'/'all'
    to fold across sections.
    """
    folded = fold_tokenlist(
        df,
        pages=False,
        section=_resolve_section(df, section),
        case=case,
        pos=pos,
        page_freq=page_freq,
        drop_section=True,  # reference output is token-level (no section col)
        doc_col=doc_col,
    )
    return folded.orderBy(F.desc("count"))


def tokens_per_page(
    df: DataFrame,
    section_features: DataFrame | None = None,
    doc_col: str = "htid",
    section: str = "default",
) -> DataFrame:
    """Per-page token totals (operator A6; reference feature_reader.py:578-586).

    Prefers the stored per-section ``tokenCount`` scalars when available
    (their page-sums are exactly the tokenlist page-sums — FIXTURES.md T3
    invariant); falls back to folding the fact table. ``section`` defaults
    to 'body' like the reference (tokens_per_page goes through
    section_features(), which inherits default_page_section='body');
    'group'/'all' sums across sections.
    """
    if section_features is not None:
        sec = _resolve_section(section_features, section)
        if sec in ("header", "body", "footer"):
            section_features = section_features.filter(F.col("section") == sec)
        keys = [c for c in (doc_col, "page") if c in section_features.columns]
        return section_features.groupBy(*keys).agg(
            F.sum("tokenCount").alias("count")
        )
    sec = _resolve_section(df, section)
    if sec in ("header", "body", "footer"):
        df = df.filter(F.col("section") == sec)
    pagecol = _page_colname(df)
    keys = [c for c in (doc_col, pagecol) if c and c in df.columns]
    return df.groupBy(*keys).agg(F.sum("count").alias("count"))


def term_page_freqs(
    df: DataFrame,
    page_freq: bool = True,
    case: bool = True,
    doc_col: str = "htid",
    token_values: list[str] | None = None,
    section: str = "default",
) -> DataFrame:
    """Page x token wide matrix (operator R1; reference
    feature_reader.py:723-733): values = count (or presence), missing -> 0.

    ``token_values`` pins the pivot columns, which (a) keeps the schema
    stable and (b) skips Spark's extra distinct-values job — at corpus scale
    an unpinned pivot over an open vocabulary is an anti-pattern (the
    reference only ever pivots one volume). For corpus-scale term-document
    matrices keep the long format or build sparse vectors instead.

    ``section`` defaults to 'body' like the reference (term_page_freqs goes
    through tokenlist(), which inherits default_page_section='body').
    """
    pagecol = _page_colname(df)
    folded = fold_tokenlist(
        df, pages=True, section=_resolve_section(df, section), case=case,
        pos=False, page_freq=page_freq, drop_section=True, doc_col=doc_col,
    )
    token_name = "token" if case else "lowercase"
    keys = [c for c in (doc_col, pagecol) if c and c in folded.columns]
    pv = folded.groupBy(*keys).pivot(token_name, token_values)
    return pv.sum("count").na.fill(0)


def min_count_window(df: DataFrame, min_count: int, case: bool = True,
                     doc_col: str | None = "htid") -> DataFrame:
    """The reference's literal min_count formulation (operator W2): a
    window sum broadcast back to rows (feature_reader.py:566), kept for
    parity testing against :func:`distinct_tokens`'s agg-then-filter plan.
    """
    token_expr, token_name = _token_col(df, case)
    df = df.withColumn(token_name, token_expr)
    keys = ([doc_col] if doc_col and doc_col in df.columns else []) + [token_name]
    w = Window.partitionBy(*[F.col(k) for k in keys])
    return df.withColumn("_total", F.sum("count").over(w)).filter(
        F.col("_total") >= min_count
    ).drop("_total")
