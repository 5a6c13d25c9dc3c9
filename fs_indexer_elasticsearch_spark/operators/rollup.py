"""Directory-size rollup — linear-scale replacement for the
reference's quadratic prefix-LIKE theta join.

Reference computes per-directory recursive totals with
``f.filepath LIKE d1.filepath || '/%' OR f.filepath = d1.filepath``
(elasticsearch_integration.py:325-348, duplicate 128-151;
lucidlink/directory_size.py:39-60) — an O(files×dirs) nested-loop join
that cannot survive 100 TB. Here: explode each file's ancestor array
(one row per (ancestor, file)) and hash-aggregate — O(rows×depth),
shuffle-partitioned on the ancestor key, map-side partial sums.

The reference's ``f.filepath = d1.filepath`` term also counts the
directory's own row; directories carry size 0/NULL so totals match
(SURVEY §7 "hard parts" #2) — we reproduce the file-only SUM via the
type='file' conditional (A-4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions import ancestors


def directory_rollup(
    entries: DataFrame,
    path_col: str = "filepath",
    size_col: str = "size_bytes",
    type_col: str = "type",
) -> DataFrame:
    """Recursive per-directory totals: (directory, total_size,
    file_count, dir_count).

    Every entry contributes to each of its ancestors; files add their
    size, directories add to dir_count only.
    """
    is_file: Column = F.col(type_col) == "file"
    exploded = entries.select(
        F.explode(ancestors(F.col(path_col))).alias("directory"),
        F.when(is_file, F.coalesce(F.col(size_col), F.lit(0))).otherwise(0).alias("_sz"),
        F.when(is_file, 1).otherwise(0).alias("_f"),
        F.when(~is_file, 1).otherwise(0).alias("_d"),
    )
    return exploded.groupBy("directory").agg(
        F.sum("_sz").alias("total_size"),
        F.sum("_f").alias("file_count"),
        F.sum("_d").alias("dir_count"),
    )
