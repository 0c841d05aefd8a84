"""Streaming as-of join: serve point-in-time features to a probe stream.

The north star's serving face: a build stream (feature timeline) and a
probe stream (query timestamps) are union-tagged and fed through ONE
``applyInPandasWithState`` — per-key state is the latest build row
(last_ts, last values), every probe row is enriched with the most recent
build values at-or-before its timestamp. Semantics match the batch
``operators/asof.py:asof_join`` (backward direction, exact matches
allowed, optional tolerance) for in-order replays; out-of-order rows
ACROSS micro-batches see last-known state — the same documented streaming
relaxation as ``stateful.stream_forward_fill``, with the batch operator as
the exact oracle (tested in tests/test_streaming_asof.py). The relaxation
is one-sided: a late PROBE (ts earlier than the state's newest build row)
is never served a future build value — it falls back to the strictly-
earlier state row or null-fills (zero temporal leakage, matching the
batch operator's guarantee); what is relaxed is only that build rows
older than the retained two-row state are forgotten.

Scale shape (what the north rule cares about):
- one shuffle (the groupBy key hash) shared by both streams — identical
  to the batch union-window strategy's single-shuffle plan;
- state is O(1) per key (latest build row only, never a buffer), so a
  1000-executor cluster shards keys and state memory scales out;
- within a micro-batch the group is sorted by (ts, side) so build rows at
  timestamp T are visible to probe rows at T (allow_exact_matches) — the
  same tie rule as the batch operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructField, StructType, TimestampNTZType, TimestampType


def stream_asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str = "key",
    ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_s: float | None = None,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """As-of join ``build``'s latest values onto ``probe`` rows, streaming.

    ``probe`` and ``build`` are streaming DataFrames sharing the key and
    timestamp column names. Returns probe columns + one column per build
    value column (nullable; null when no build row at-or-before the probe
    ts within tolerance). Probe rows are emitted in append mode.
    """
    if value_cols is None:
        value_cols = [c for c in build.columns if c not in (on, ts)]
    clash = set(value_cols) & set(probe.columns)
    if clash:
        raise ValueError(f"value columns clash with probe columns: {sorted(clash)}")
    probe_payload = [c for c in probe.columns if c not in (on, ts)]

    # union-tag: build side=0 sorts before probe side=1 at equal ts, which
    # is exactly the allow_exact_matches tie rule; probe payload rides
    # along nulled on build rows and vice versa
    tagged = build.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c) for c in value_cols],
        *[F.lit(None).cast(probe.schema[c].dataType).alias(c) for c in probe_payload],
    ).unionByName(
        probe.select(
            F.col(on).alias("__k"),
            F.col(ts).alias("__ts"),
            F.lit(1).alias("__side"),
            *[F.lit(None).cast(build.schema[c].dataType).alias(c) for c in value_cols],
            *[F.col(c) for c in probe_payload],
        )
    )

    key_t = probe.schema[on].dataType
    ts_t = probe.schema[ts].dataType
    if not isinstance(ts_t, (TimestampType, TimestampNTZType)):
        raise TypeError(f"ts column {ts!r} must be a timestamp, got {ts_t}")
    out_schema = StructType(
        [StructField(on, key_t), StructField(ts, ts_t)]
        + [StructField(c, probe.schema[c].dataType) for c in probe_payload]
        + [StructField(c, build.schema[c].dataType, True) for c in value_cols]
    )
    # state = latest build row AND the latest strictly-earlier one: when
    # allow_exact_matches=False and the newest build row coincides with the
    # probe ts, the join must fall back to the previous row — still O(1)
    state_schema = StructType(
        [StructField("last_ts", ts_t)]
        + [StructField(c, build.schema[c].dataType, True) for c in value_cols]
        + [StructField("prev_ts", ts_t)]
        + [StructField(f"__prev_{c}", build.schema[c].dataType, True) for c in value_cols]
    )
    n_vals = len(value_cols)

    # closure, not module-level: cloudpickle ships it by value so executors
    # never import this package (works from any driver cwd / bare submit)
    if allow_exact_matches:
        def admissible(t, p):
            return t is not None and t <= p
    else:
        def admissible(t, p):
            return t is not None and t < p

    def join_fn(group_key, batches: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            st = state.get
            last_ts, last_vals = st[0], list(st[1 : 1 + n_vals])
            prev_ts, prev_vals = st[1 + n_vals], list(st[2 + n_vals :])
        else:
            last_ts, last_vals = None, [None] * n_vals
            prev_ts, prev_vals = None, [None] * n_vals
        # ONE sort over the whole micro-batch: `batches` yields Arrow
        # chunks (arrow.maxRecordsPerBatch rows each) and a chunk-local
        # sort would mis-order rows straddling chunk boundaries — the
        # late-row guard below would then drop same-batch builds and
        # serve probes a future value. One group's micro-batch rows are
        # already colocated in this worker, so the concat is bounded by
        # per-key micro-batch volume, not state.
        chunks = list(batches)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
            pdf = pdf.sort_values(["__ts", "__side"], kind="mergesort")
            sides = pdf["__side"].to_list()
            tss = pdf["__ts"].to_list()
            vals = {c: pdf[c].to_list() for c in value_cols}
            pays = {c: pdf[c].to_list() for c in probe_payload}
            out = {c: [] for c in (on, ts, *probe_payload, *value_cols)}
            for i in range(len(pdf)):
                if sides[i] == 0:
                    # a LATE build row (older than last-known state, i.e.
                    # out-of-order across micro-batches) must not regress
                    # state: overwriting would serve probes stale values
                    # and could leave prev_ts AFTER last_ts (a future-value
                    # leak under allow_exact_matches=False). Drop it — the
                    # documented last-known-state relaxation.
                    if last_ts is not None and tss[i] < last_ts:
                        continue
                    if last_ts is not None and tss[i] > last_ts:
                        prev_ts, prev_vals = last_ts, last_vals
                    last_ts = tss[i]
                    last_vals = [vals[c][i] for c in value_cols]
                    continue
                # ONE admissibility rule covers both the exact-match
                # exclusion and the PIT guard for probes arriving LATE
                # across micro-batches (ts < state's last_ts): a candidate
                # must be <= the probe ts (strictly < when
                # allow_exact_matches=False), else it is temporal leakage
                # — and the (unsigned) tolerance check would wave the
                # negative delta through. Chaining the two rules as
                # separate fallbacks was wrong: last_ts failing the exact
                # rule could fall back to a prev_ts that itself equals the
                # probe ts. prev_ts <= last_ts always (late builds are
                # dropped above), so last-then-prev picks the most recent
                # admissible row. (`admissible` is hoisted above the loop
                # — this is the per-probe-row hot path.)
                pts = tss[i]
                if admissible(last_ts, pts):
                    cand_ts, cand_vals = last_ts, last_vals
                elif admissible(prev_ts, pts):
                    cand_ts, cand_vals = prev_ts, prev_vals
                else:
                    cand_ts, cand_vals = None, [None] * n_vals
                hit = cand_ts is not None and (
                    tolerance_s is None
                    or (tss[i] - cand_ts).total_seconds() <= tolerance_s
                )
                out[on].append(group_key[0])
                out[ts].append(tss[i])
                for c in probe_payload:
                    out[c].append(pays[c][i])
                for c, v in zip(value_cols, cand_vals):
                    out[c].append(v if hit else None)
            if out[on]:  # all-build batches yield nothing (append mode)
                yield pd.DataFrame(out)
        if last_ts is not None:
            # probe-only keys carry nothing worth remembering — updating
            # would allocate permanent per-key state (NoTimeout) that grows
            # with probe-key cardinality forever
            state.update((last_ts, *last_vals, prev_ts, *prev_vals))

    return tagged.groupBy("__k").applyInPandasWithState(
        join_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
