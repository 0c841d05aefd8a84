from .manifest import (  # noqa: F401
    partition_digests,
    read_manifest,
    resume_write,
    verify_output,
    write_partitioned,
)
