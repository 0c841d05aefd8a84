"""Error types mirroring the reference's user-facing failure modes.

Reference: /root/reference/htrc_features/feature_reader.py:685-699 raises
``MissingFieldError`` when a requested fold needs an index level the stored
(possibly partial-schema) data lacks; ``MissingDataError`` when a whole
feature table is absent (e.g. meta-only parquet, parsers.py:560-586).
"""


class MissingFieldError(KeyError):
    """A fold requested a column the stored table does not carry.

    E.g. asking for ``case=True`` (raw-case tokens) on a table that was
    saved case-folded and only has ``lowercase``.
    """


class MissingDataError(ValueError):
    """A whole feature table is absent from the stored dataset."""
