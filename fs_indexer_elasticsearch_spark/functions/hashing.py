"""Identity / hashing column expressions.

Reference parity:
 - entry_id:        sha256 of relative_path (scanner.py:99-108,
                    parallel_scanner.py:581-590)
 - entry_id_sized:  sha256 of "path:size:mtime" (scanner.py:288-290)
 - fingerprint_md5: content fingerprint used by the dedup extensions
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def entry_id(relative_path: Column | str) -> Column:
    """Stable record id: sha256 hex of the relative path."""
    return F.sha2(_c(relative_path), 256)


def entry_id_sized(
    path: Column | str, size_bytes: Column | str, mtime: Column | str
) -> Column:
    """Content-sensitive id: sha256 of ``path:size:mtime_iso``
    (scanner.py:288-290 builds the same colon-joined key)."""
    return F.sha2(
        F.concat_ws(
            ":",
            _c(path),
            _c(size_bytes).cast("string"),
            F.date_format(_c(mtime), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
        ),
        256,
    )


def fingerprint_md5(text: Column | str) -> Column:
    """md5 hex of a string — chosen over xxhash64 because DuckDB and
    Spark produce byte-identical md5, letting the oracle reproduce
    every derived hash."""
    return F.md5(_c(text))
