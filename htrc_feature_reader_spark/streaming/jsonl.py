"""Streaming JSONL ingest with corrupt-record quarantine.

The streaming face of ``sources/jsonl_raw.read_jsonl`` for a landing
directory that crawlers append shards to continuously: each micro-batch
parses new files under the explicit contract, good rows flow to the
pipeline, and every malformed or contract-violating line is preserved
verbatim on a quarantine stream (typically sunk to its own directory
next to the run's manifest for triage and replay).

Same parsing strategy as the batch path — ``from_json`` over a
``readStream.text`` scan, so the corrupt column is an ordinary column
(no SPARK-21610 restriction) and ``.gz``/``.bz2`` shards decompress
natively. Two consumption shapes:

- ``split=True`` (default): two filtered streams. Each started query
  tracks its own file offsets, so running both sinks reads each file
  twice — fine when quarantine volume is tiny (the usual case) or the
  sinks run at different cadences.
- ``split=False``: ONE tagged stream (contract columns + ``corrupt_col``
  set only on bad rows + ``src_file``); pair with
  :func:`route_good_and_quarantine` under ``foreachBatch`` for a
  single-pass split — each shard parsed exactly once per micro-batch.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..sources.jsonl_raw import (
    SEQUENCES_JSONL_SCHEMA,
    _validate_contract,
    parse_jsonl_lines,
    split_parsed_jsonl,
)


def stream_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType = SEQUENCES_JSONL_SCHEMA,
    required: tuple[str, ...] = (),
    corrupt_col: str = "_corrupt_record",
    max_files_per_trigger: int | None = None,
    split: bool = True,
) -> tuple[DataFrame, DataFrame] | DataFrame:
    """Streaming ``(good, quarantine)`` — or one tagged stream — over a
    JSONL landing directory.

    The parse/validate/split core is SHARED with the batch reader
    (``sources.jsonl_raw.parse_jsonl_lines`` — one definition of the
    contract, including the NULL-struct guard for valid-JSON-non-object
    lines), so batch and streaming ingest cannot drift. ``required=``
    promotes contract-null rows into quarantine. ``max_files_per_
    trigger`` bounds micro-batch size for backpressure (pick it so one
    batch fits the trigger cadence).
    """
    _validate_contract(schema, required, corrupt_col)  # before the scan
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw, is_bad = parse_jsonl_lines(reader.text(path), schema, required, corrupt_col)
    if not split:
        data_cols = [f.name for f in schema.fields]
        return raw.select(
            *[F.col("__r")[c].alias(c) for c in data_cols],
            F.when(is_bad, F.col("__raw")).alias(corrupt_col),
            "src_file",
        )
    return split_parsed_jsonl(raw, is_bad, schema, corrupt_col)


def route_good_and_quarantine(
    good_fn: Callable[[DataFrame, int], None],
    quarantine_fn: Callable[[DataFrame, int], None],
    corrupt_col: str = "_corrupt_record",
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` router for the ``split=False`` tagged stream:
    one file pass per micro-batch, both sinks served. ``good_fn``
    receives the contract columns only; ``quarantine_fn`` the full
    tagged shape (bad rows only). The batch is persisted around the two
    passes so the parse runs once.
    """

    def route(batch: DataFrame, epoch_id: int) -> None:
        batch.persist()
        try:
            is_bad = F.col(corrupt_col).isNotNull()
            good_cols = [
                c for c in batch.columns if c not in (corrupt_col, "src_file")
            ]
            good_fn(batch.filter(~is_bad).select(*good_cols), epoch_id)
            quarantine_fn(batch.filter(is_bad), epoch_id)
        finally:
            batch.unpersist()

    return route
