"""Shared scalar helpers (engine-internal column expressions)."""

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_seconds(c: Column | str) -> Column:
    """Event time as fractional epoch seconds, for window ordering/arithmetic.

    Works for TIMESTAMP, TIMESTAMP_NTZ (pandas-written parquet surfaces NTZ
    in Spark 4 — a direct double cast is rejected), DATE, and numeric
    epoch columns. The intermediate cast to session-TZ timestamp is an
    identity for LTZ and a fixed-offset reinterpretation for NTZ — safe for
    differences and ordering, which is all the engine uses it for.
    """
    c = F.col(c) if isinstance(c, str) else c
    return c.cast("timestamp").cast("double")
