"""`find -ls` / tab-format line parsers as pure column expressions.

Reference parity (S5/S6): the reference parses `find` output with
three near-identical Python row loops (scanner.py:110-202,
parallel_scanner.py:592-671, batch_processor.py:50-146) and a
tab-separated variant (scanner.py:254-310). Here each is ONE select
over a text DataFrame — whole-stage codegen, no Python in the loop.

`find -ls` line layout (scanner.py:119-129):
  inode blocks perms nlinks owner group size month day time_or_year path...
  e.g. "1234 8 -rw-r--r-- 1 root root 5120 Mar 15 10:30 /data/file.txt"
Type comes from the first perms char ('d' → directory, scanner.py:146);
dates are the two-format parse with year rollback (P6); names with
spaces survive because the path is everything after column 10.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..functions import (
    basename,
    entry_id,
    extension,
    find_ls_timestamp,
    relative_to,
)

# 10 leading whitespace-separated fields, then the path (greedy, may
# contain spaces).
_FIND_LS_RX = (
    r"^\s*(\S+)\s+(\S+)\s+(\S+)\s+(\S+)\s+(\S+)\s+(\S+)\s+(\S+)\s+"
    r"(\S+\s+\S+\s+\S+)\s+(.+)$"
)


def parse_find_ls(
    lines: DataFrame,
    line_col: str = "value",
    root: str = "",
    now: Column | None = None,
) -> DataFrame:
    """Parse a DataFrame of raw `find -ls` lines into fs_entry rows.

    Malformed lines (too few columns) yield null paths and are
    dropped, matching the reference's skip-on-parse-error
    (scanner.py:199-202).
    """
    c = F.col(line_col)
    perms = F.regexp_extract(c, _FIND_LS_RX, 3)
    size = F.regexp_extract(c, _FIND_LS_RX, 7)
    date_raw = F.regexp_extract(c, _FIND_LS_RX, 8)
    path = F.regexp_extract(c, _FIND_LS_RX, 9)
    rel = relative_to(path, root) if root else path
    mtime = find_ls_timestamp(date_raw, now=now)
    return (
        lines.select(
            path.alias("_path"),
            perms.alias("_perms"),
            size.alias("_size"),
            mtime.alias("modified_time"),
            rel.alias("relative_path"),
        )
        .filter(F.col("_path") != "")
        .select(
            entry_id(F.col("relative_path")).alias("id"),
            basename(F.col("_path")).alias("name"),
            F.col("relative_path"),
            F.col("_path").alias("filepath"),
            F.when(F.col("_perms").startswith("d"), "directory")
            .otherwise("file")
            .alias("type"),
            F.when(
                F.col("_perms").startswith("d"), F.lit(None).cast("long")
            )
            .otherwise(F.col("_size").cast("long"))
            .alias("size_bytes"),
            extension(basename(F.col("_path"))).alias("extension"),
            F.lit("").alias("checksum"),
            F.col("modified_time"),
            F.col("modified_time").alias("creation_time"),  # fallback, scanner.py:192
            F.current_timestamp().alias("last_seen"),
        )
    )


def parse_tab_format(
    lines: DataFrame, line_col: str = "value", root: str = ""
) -> DataFrame:
    """Parse the tab-separated variant: path\\tsize\\tmtime\\tctime
    (scanner.py:254-310). The id is the content-sensitive
    sha256(path:size:mtime) form (scanner.py:288-290)."""
    c = F.col(line_col)
    parts = F.split(c, "\t")
    path = F.element_at(parts, 1)
    size = F.element_at(parts, 2).cast("long")
    mtime = F.to_timestamp(F.element_at(parts, 3))
    ctime = F.to_timestamp(F.element_at(parts, 4))
    rel = relative_to(path, root) if root else path
    return (
        lines.filter(F.size(parts) >= 4)
        .select(
            F.sha2(
                F.concat_ws(
                    ":", path, size.cast("string"), F.element_at(parts, 3)
                ),
                256,
            ).alias("id"),
            basename(path).alias("name"),
            rel.alias("relative_path"),
            path.alias("filepath"),
            F.lit("file").alias("type"),
            size.alias("size_bytes"),
            extension(basename(path)).alias("extension"),
            F.lit("").alias("checksum"),
            mtime.alias("modified_time"),
            ctime.alias("creation_time"),
            F.current_timestamp().alias("last_seen"),
        )
    )
