"""Binned range (interval) join: point-in-interval matching at scale.

The reference has no temporal joins at all (its only joins are tiny
index-aligned equi joins, ``reference/htrc_features/feature_reader.py``
around 755-767); like :mod:`.asof`, this is a north-rule extension: for
every probe row ``(keys, ts)`` attach every interval row
``(keys, start, end)`` with the same keys whose *inclusive* interval
``[start, end]`` contains ``ts``.

Expressed naively, ``probe.join(intervals, ts.between(start, end))`` has
no equi condition Catalyst can hash on, so the physical plan degrades to
``BroadcastNestedLoopJoin`` (or ``CartesianProduct``) — a probe x
intervals blow-up that is quadratic at corpus scale. The classic fix
(the same idea behind Databricks' range-join bins and single-node
interval trees) is **binning**:

1. quantize time into fixed-width bins of ``bin_width_s`` seconds;
2. explode each interval into the bins it overlaps (explode factor =
   ``len/bin + 1``, so ~2 rows per interval when the bin width is near
   the typical interval length);
3. equi-join probe rows on ``(keys, bin)`` — an ordinary shuffled hash /
   sort-merge join (or an AQE broadcast when one side is small);
4. re-check the exact ``start <= ts <= end`` predicate on the survivors.

Each probe row lands in exactly ONE bin, so an (interval, probe) pair can
meet at most once and no post-join dedup is needed.

Bin-width choice is the whole cost model: too narrow explodes the
interval side; too wide turns each bin into a mini nested loop (the
residual predicate rejects most pairs). ``bin_width_s='auto'`` derives
the width from the mean interval length as a 1-row in-plan aggregate
(broadcast funnel — the same pattern as bm25's corpus constants; no
driver job at plan-construction time). Intervals much longer than the
bin width still explode proportionally — at 100 TB pick an explicit
``bin_width_s`` near the p50 interval length and let the few giant
intervals pay their true fan-out (they must meet every bin they span;
there is no cheaper exact plan without an interval-tree build side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import ts_micros

_US = 1_000_000


def range_join(
    probe: DataFrame,
    intervals: DataFrame,
    keys: list[str] | None = None,
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bin_width_s: float | str = "auto",
    how: str = "inner",
    probe_id: str | None = None,
    min_bin_s: float = 1.0,
    max_bin_s: float = 30 * 86400.0,
) -> DataFrame:
    """Join probe rows to every same-key interval containing their ``ts``.

    Both bounds are inclusive (``start <= ts <= end``). Intervals with
    ``end < start`` are dropped (never matched) rather than silently
    producing a *descending* bin sequence — ``F.sequence`` would count
    down, not emit empty. Output columns are probe columns followed by
    the interval's non-key columns; overlapping non-key names raise
    eagerly (rename before joining — silent suffixing hides bugs).

    ``how='left'`` keeps unmatched probe rows with null interval columns
    and requires ``probe_id`` — a UNIQUE, NON-NULL probe key (null ids
    would share one window partition and lose rows); implemented as one
    binned left join plus a per-probe window, so the join is never
    planned twice. 'inner' is the default.

    ``bin_width_s``: bin width in seconds, or ``'auto'`` (mean interval
    length, clamped to ``[min_bin_s, max_bin_s]``, computed lazily as a
    1-row broadcast funnel).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if how == "left" and probe_id is None:
        raise ValueError("how='left' requires probe_id (a unique probe key)")
    if not (min_bin_s > 0):
        raise ValueError(f"min_bin_s must be positive, got {min_bin_s!r}")
    if max_bin_s < min_bin_s:
        raise ValueError(
            f"max_bin_s ({max_bin_s!r}) must be >= min_bin_s ({min_bin_s!r})"
        )
    keys = list(keys or [])
    overlap = (set(probe.columns) & set(intervals.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"probe and intervals share non-key columns {sorted(overlap)}; "
            "rename them before range_join (silent suffixing hides bugs)"
        )
    reserved = {"__w", "__bin", "__pus", "__sus", "__eus", "__flag", "__rn"}
    taken = reserved & (set(probe.columns) | set(intervals.columns))
    if taken:
        raise ValueError(
            f"columns {sorted(taken)} collide with range_join internals; "
            "rename them first"
        )

    pus = ts_micros(F.col(ts))
    sus, eus = ts_micros(F.col(start)), ts_micros(F.col(end))
    ivl = intervals.filter(eus >= sus).withColumn("__sus", sus).withColumn(
        "__eus", eus
    )

    if bin_width_s == "auto":
        # 1-row funnel: mean interval length, clamped. Broadcast hint is
        # safe by construction (exactly one row) — same contract as the
        # corpus-constants funnels in bm25/tf_idf.
        width = ivl.agg(
            F.least(
                F.greatest(
                    F.coalesce(
                        F.avg(F.col("__eus") - F.col("__sus")),
                        F.lit(float(min_bin_s * _US)),
                    ),
                    F.lit(float(min_bin_s * _US)),
                ),
                F.lit(float(max_bin_s * _US)),
            )
            .cast("long")
            .alias("__w")
        )
        ivl = ivl.crossJoin(F.broadcast(width))
        pr = probe.crossJoin(F.broadcast(width))
    else:
        w = int(float(bin_width_s) * _US)
        if w <= 0:
            raise ValueError(f"bin_width_s must be positive, got {bin_width_s!r}")
        ivl = ivl.withColumn("__w", F.lit(w).cast("long"))
        pr = probe.withColumn("__w", F.lit(w).cast("long"))

    ivl = ivl.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.col("__sus") / F.col("__w")).cast("long"),
                (F.col("__eus") / F.col("__w")).cast("long"),
            )
        ),
    ).drop("__w")
    pr = pr.withColumn("__pus", pus).withColumn(
        "__bin", (F.col("__pus") / F.col("__w")).cast("long")
    ).drop("__w")

    helpers = ["__bin", "__pus", "__sus", "__eus"]
    cond = (F.col("__pus") >= F.col("__sus")) & (F.col("__pus") <= F.col("__eus"))
    if how == "inner":
        return (
            pr.join(ivl, on=keys + ["__bin"], how="inner")
            .filter(cond)
            .drop(*helpers)
        )

    # left: ONE binned left join (never planned twice), then a single
    # window on probe_id keeps all true matches, or exactly one nulled row
    # when none — ordering by the flag makes the rank-1 row a match
    # whenever any exists, so the filter never double-emits a probe row.
    from pyspark.sql.window import Window

    ivl_payload = [c for c in ivl.columns if c not in keys and c not in helpers]
    # a NULL probe id would collapse every null-id row into one window
    # partition and silently LOSE rows — fail loudly at runtime instead
    # (the other preconditions raise eagerly; this one needs the data).
    # The assert rides inside the always-used __pus column so column
    # pruning cannot drop it: assert_true yields NULL on success, so the
    # when() is the identity on valid rows and throws on the first null id.
    guard = F.assert_true(
        F.col(probe_id).isNotNull(),
        F.lit(f"range_join(how='left'): null probe id in {probe_id!r} — "
              "probe_id must be unique and non-null"),
    )
    pr = pr.withColumn("__pus", F.when(guard.isNull(), F.col("__pus")))
    joined = pr.join(ivl, on=keys + ["__bin"], how="left").withColumn(
        "__flag", F.coalesce(cond, F.lit(False))
    )
    w = Window.partitionBy(probe_id).orderBy(F.col("__flag").desc())
    joined = joined.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__flag") | (F.col("__rn") == 1)
    )
    for c in ivl_payload:
        joined = joined.withColumn(c, F.when(F.col("__flag"), F.col(c)))
    return joined.drop("__flag", "__rn", *helpers)
