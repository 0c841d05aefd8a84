"""Size-targeted page chunking (operators W1/A9/A10, joins J1/J2).

Semantics replicated from the reference's chunking layer
(/root/reference/htrc_features/transformations.py:47-156 and the driver
``Volume._chunked_tokenlist`` at feature_reader.py:735-770): greedily
partition a document's per-page word counts into contiguous chunks of
roughly ``chunk_target`` words, with three overflow strategies:

- ``ends``  — first/last chunks absorb the slack (books' messy ends), the
  interior stays near target ("mids" rebalancing after the first pass);
- ``even``  — slack spread across all chunks every pass;
- ``last``  — every chunk hits target, the final chunk takes all slack.

The scan is inherently sequential *within* a document (each break depends
on the running cumulative sum from both ends) but embarrassingly parallel
*across* documents — exactly the shape ``groupBy(doc).applyInPandas`` is
for. The per-group input is one row per page (tiny: thousands of rows max
per doc), so the Python-side work is negligible; the heavy token table is
never shipped to Python — only the (doc, page) -> chunk label map comes
back, and it joins onto the fact table JVM-side (broadcast when small).

Parity notes (tested against the reference's published goldens,
tests/test_chunking.py:29-77 and the 12-chunk green-gables run):
the label array is the cumulative sum of break flags, labels start at 1,
and the quirky details — signed overflow nearest zero, per-pass overflow
share 2/chunks_remaining, the <2.5x-target midpoint split, the
same-chunk-from-both-ends clamp — are reproduced exactly. The reference's
``np.int`` crash on numpy>=1.24 (transformations.py:77) is fixed, not
replicated.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .tokenlist import _page_colname, fold_tokenlist

_MAX_PASSES = 10_000


def _label_chunks(counts: np.ndarray, target: int, *, balance, two_sided: bool,
                  defer: bool) -> np.ndarray:
    """Break a 1-D array of per-page word counts into chunk labels.

    ``balance``: True (every pass), "mids" (from the second pass on), or
    False. ``two_sided``: consume from both ends toward the middle.
    ``defer``: never rebalance (all slack lands in the final chunk).
    Returns int labels (1-based, contiguous), one per page.
    """
    if target <= 0:
        raise ValueError("chunk target must be positive")
    n = len(counts)
    marks = np.zeros(n, dtype=np.int64)
    if n:
        marks[0] = 1
    lo, hi = 0, n
    passes = 0

    while lo != hi:
        passes += 1
        if passes > _MAX_PASSES:
            raise OverflowError("chunking failed to converge")

        live = counts[lo:hi]
        fwd = np.cumsum(live)
        remaining = int(fwd[-1])
        if remaining < target * 1.5:
            break  # tail merges into the open front chunk

        # signed slack, whichever of (+r, r-target) is nearer zero
        slack = remaining % target
        if (target - slack) < slack:
            slack = slack - target
        if balance is True or (balance == "mids" and passes > 1):
            n_chunks = np.round(remaining / target)
            if two_sided and n_chunks > 2:
                slack = slack * 2 / n_chunks
            elif (not two_sided) and n_chunks > 1:
                slack = slack / n_chunks
        local_target = target + (slack / 2 if two_sided else slack)
        if defer:
            local_target = target

        if two_sided and remaining < target * 2.5:
            # two chunks left: split nearest the midpoint and stop
            mid = int(np.argmin(np.abs(fwd - remaining / 2)))
            if lo + mid + 1 < n:
                marks[lo + mid + 1] = 1
            break

        step = int(np.argmin(np.abs(fwd - local_target)))
        lo = lo + step + 1
        if lo >= n:
            break  # last page bigger than the window — nothing left to mark
        marks[lo] = 1

        if two_sided:
            bwd = np.cumsum(live[::-1])
            back = int(np.argmin(np.abs(bwd - local_target)))
            hi = hi - back - 1
            marks[hi] = 1
            if lo > hi:
                hi = lo  # both ends claimed the same middle — stop next pass

    return np.cumsum(marks)


def chunk_ends(page_counts, target: int) -> np.ndarray:
    """'ends' strategy: messy first/last chunks, near-target interior."""
    return _label_chunks(np.asarray(page_counts), target, balance="mids",
                         two_sided=True, defer=False)


def chunk_even(page_counts, target: int) -> np.ndarray:
    """'even' strategy: slack spread across all chunks."""
    return _label_chunks(np.asarray(page_counts), target, balance=True,
                         two_sided=True, defer=False)


def chunk_last(page_counts, target: int) -> np.ndarray:
    """'last' strategy: exact chunks, the final one takes the slack."""
    return _label_chunks(np.asarray(page_counts), target, balance=False,
                         two_sided=False, defer=True)


_STRATEGIES = {"ends": chunk_ends, "even": chunk_even, "last": chunk_last}


def chunk_labels(
    page_counts: DataFrame,
    chunk_target: int = 10_000,
    overflow_strategy: str = "ends",
    doc_col: str = "htid",
    page_col: str = "page",
    with_bounds: bool = False,
) -> DataFrame:
    """(doc, page, count) -> (doc, page, chunk) label map, distributed.
    ``with_bounds=True`` adds per-chunk (pstart, pend) page bounds,
    computed JVM-side from the per-doc label array BEFORE the explode —
    labels are contiguous 1-based (cumsum of break marks), so chunk c's
    bounds are the pages at the first/last index carrying label c; one
    O(pages) filter per doc, no second aggregation and no extra join.

    Shape: one JVM-side groupBy collects each doc's (page, count) pairs
    into a sorted array, a SCALAR Arrow pandas UDF maps count-arrays to
    label-arrays (one Python invocation per ~10k-doc Arrow batch, not per
    group — groupBy().applyInPandas costs one Python call + one Arrow
    batch PER DOCUMENT, which at millions of tiny groups is pure overhead;
    measured 2.4x faster on 60k docs), and a JVM-side zip/explode emits
    the label map. Per-doc state is one int per page; docs parallelize
    across all executors with no skew — the shape the north rule asks for.
    """
    if overflow_strategy not in _STRATEGIES:
        raise ValueError(f"unknown overflow strategy {overflow_strategy!r}")
    fn = _STRATEGIES[overflow_strategy]

    @F.pandas_udf("array<long>")
    def labels_udf(counts: pd.Series) -> pd.Series:
        return counts.map(
            lambda c: fn(np.asarray(c, dtype=np.int64), chunk_target)
        )

    per_doc = (
        page_counts.groupBy(doc_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(page_col).alias("p"), F.col("count").alias("c")
                    )
                )
            ).alias("__pc")
        )
        .select(
            doc_col,
            F.col("__pc.p").alias("__pages"),
            labels_udf(F.col("__pc.c")).alias("__labs"),
        )
    )
    z = F.explode(F.arrays_zip("__pages", "__labs")).alias("__z")
    if not with_bounds:
        return per_doc.select(doc_col, z).select(
            doc_col,
            F.col("__z.__pages").alias(page_col),
            F.col("__z.__labs").cast("long").alias("chunk"),
        )

    labs, n = F.col("__labs"), F.size("__labs")
    # 1-based indices where a new label starts / a label ends; labels are
    # contiguous from 1, so chunk c's bounds sit at __firsts[c]/__lasts[c].
    # when-guards keep element_at off index 0 / n+1 (If evaluates lazily).
    firsts = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: F.when(i == 1, F.lit(True)).otherwise(
            F.element_at(labs, i.cast("int"))
            != F.element_at(labs, (i - 1).cast("int"))
        ),
    )
    lasts = F.filter(
        F.sequence(F.lit(1), n),
        lambda i: F.when(i == n, F.lit(True)).otherwise(
            F.element_at(labs, (i + 1).cast("int"))
            != F.element_at(labs, i.cast("int"))
        ),
    )
    # Bounds are zipped into the exploded struct as per-page SCALARS: a
    # post-explode lookup into doc-level arrays would project the full
    # __pages/__firsts/__lasts arrays onto every exploded per-page row —
    # an O(pages^2) intermediate per doc. Instead build per-page
    # (pstart, pend) arrays pre-explode (O(pages) transform with O(1)
    # element_at lookups, all row-local per doc) and explode the 4-way
    # zip, so exploded rows carry 4 scalars each.
    staged = per_doc.select(
        doc_col, "__pages", "__labs",
        firsts.alias("__firsts"), lasts.alias("__lasts"),
    )
    pstarts = F.transform(
        F.col("__labs"),
        lambda c: F.element_at(
            F.col("__pages"), F.element_at("__firsts", c.cast("int")).cast("int")
        ),
    )
    pends = F.transform(
        F.col("__labs"),
        lambda c: F.element_at(
            F.col("__pages"), F.element_at("__lasts", c.cast("int")).cast("int")
        ),
    )
    z4 = F.explode(
        F.arrays_zip(
            F.col("__pages"), F.col("__labs"),
            pstarts.alias("__ps"), pends.alias("__pe"),
        )
    ).alias("__z")
    return staged.select(doc_col, z4).select(
        doc_col,
        F.col("__z.__pages").alias(page_col),
        F.col("__z.__labs").cast("long").alias("chunk"),
        F.col("__z.__ps").alias("pstart"),
        F.col("__z.__pe").alias("pend"),
    )


def chunked_tokenlist(
    df: DataFrame,
    chunk_target: int = 10_000,
    overflow_strategy: str = "ends",
    page_ref: bool = False,
    doc_col: str = "htid",
    broadcast_labels: bool = False,
    page_counts: DataFrame | None = None,
    **fold_kwargs,
) -> DataFrame:
    """Tokenlist folded by chunk instead of page (reference
    feature_reader.py:735-770; operators A9/A10 + joins J1/J2).

    1. fold with pages kept (chunking needs per-page counts),
    2. per-doc chunk labels via the sequential algorithm,
    3. equi-join labels back,
    4. regroup by chunk; optionally attach per-chunk (pstart, pend).

    The label map (and the page_ref bounds table) is one row per
    (doc, page) — tiny for one volume but #pages-sized corpus-wide
    (billions of rows at 100 TB), so the joins are UNHINTED by default:
    AQE broadcasts them when their runtime size is actually small and
    falls back to a shuffle join otherwise. ``broadcast_labels=True``
    forces the hint for single-volume / notebook use where the caller
    knows the map fits.

    ``page_counts``: optional caller-supplied ``(doc, page, count)``
    per-page word-count table. By default it is aggregated from the fold
    itself, which re-evaluates the whole fold subplan a second time
    (Spark has no cross-branch common-subplan reuse, and an explicit
    shared exchange measured slower than the duplicate fold). A caller
    whose pages are DERIVED (e.g. fixed positional blocks, where page
    ``p``'s count is ``min(block, n_words - (p-1)*block)`` in closed
    form) can state the counts arithmetically and skip that second
    evaluation entirely — the §8 "use what you know the optimizer does
    not" move. Values must equal the fold-derived counts exactly; the
    chunk labels are integer functions of them, so any drift changes
    results.
    """
    fold_kwargs["pages"] = True
    fold_kwargs.setdefault("section", "all")
    tl = fold_tokenlist(df, doc_col=doc_col, **fold_kwargs)
    pagecol = _page_colname(tl)

    if page_counts is None:
        page_counts = tl.groupBy(doc_col, pagecol).agg(
            F.sum("count").alias("count")
        )
    labels = chunk_labels(
        page_counts, chunk_target, overflow_strategy, doc_col=doc_col,
        page_col=pagecol, with_bounds=page_ref,
    )
    if broadcast_labels:
        labels = F.broadcast(labels)

    # ONE join attaches chunk (+ bounds when page_ref): bounds come from the
    # per-doc label arrays pre-explode, so the Arrow labeler runs once —
    # a second bounds aggregate would re-evaluate the whole label subplan
    # (Spark has no cross-branch common-subplan reuse).
    with_chunks = tl.join(labels, on=[doc_col, pagecol])
    regroup = [c for c in with_chunks.columns
               if c not in (pagecol, "count", "chunk", "pstart", "pend")]
    keys = [*regroup, "chunk"] + (["pstart", "pend"] if page_ref else [])
    out = with_chunks.groupBy(*keys).agg(F.sum("count").alias("count"))
    if page_ref:
        # column order parity with the two-join formulation
        out = out.select(*regroup, "chunk", "count", "pstart", "pend")
    return out
