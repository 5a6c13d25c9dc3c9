"""Scalar column-expression library (SURVEY §2.8).

Everything here is a pure Column expression built from
``pyspark.sql.functions`` — JVM-side, whole-stage-codegen friendly.
No row-at-a-time Python UDFs.
"""

from .hashing import composite_id, entry_id, entry_id_sized, fingerprint_md5
from .paths import (
    ancestors,
    basename,
    extension,
    format_size,
    glob_to_regex,
    is_hidden,
    path_depth,
    relative_to,
    skip_filter,
)
from .timeparse import (
    find_ls_timestamp,
    iso_format,
    ns_epoch_to_timestamp,
)

__all__ = [
    "ancestors",
    "basename",
    "composite_id",
    "entry_id",
    "entry_id_sized",
    "extension",
    "find_ls_timestamp",
    "fingerprint_md5",
    "format_size",
    "glob_to_regex",
    "is_hidden",
    "iso_format",
    "ns_epoch_to_timestamp",
    "path_depth",
    "relative_to",
    "skip_filter",
]
