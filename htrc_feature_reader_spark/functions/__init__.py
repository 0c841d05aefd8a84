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


def ts_micros(c: Column | str) -> Column:
    """Event time as exact integer epoch microseconds (long) — the form all
    window ordering, range framing, bucketing, and gap comparisons use.

    Double epoch-seconds has a ~0.24 us ULP in the 2020s: a gap exactly
    equal to a threshold can flip under float rounding, so order/frame/
    compare on integer micros and divide to seconds only for output
    columns. Works for TIMESTAMP, TIMESTAMP_NTZ, DATE, and numeric epoch
    columns. The NTZ->LTZ cast reinterprets wall time in the session
    timezone; the engine pins ``spark.sql.session.timeZone=UTC``
    (session.py) so that reinterpretation is a DST-free identity — pin the
    same if you bring your own session.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(c.cast("timestamp"))
