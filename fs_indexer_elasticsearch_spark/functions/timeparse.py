"""Timestamp parsing / formatting expressions.

Reference parity:
 - find_ls_timestamp: the two-format `find -ls` date parse with
   future-date year rollback (scanner.py:148-164, duplicated 3×)
 - ns_epoch_to_timestamp: LucidLink ns-epoch creationTime
   (lucidlink_api.py:71-74, 117-121)
 - iso_format: ES document timestamp formatting
   (elasticsearch_integration.py:98-112)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def find_ls_timestamp(raw: Column | str, now: Column | None = None) -> Column:
    """Parse `find -ls` dates: recent entries print ``Mon DD HH:MM``
    (no year), old ones ``Mon DD YYYY``. The no-year form is resolved
    against the current year, then rolled back one year if that lands
    in the future (scanner.py:155-156).

    ``now`` is injectable for deterministic tests.
    """
    # Squeeze runs of spaces first: `find -ls` pads single-digit days
    # to two chars like ls ("Jun  3 04:22", "May  9 2020"), and the
    # 'MMM d ...' patterns require exactly one space — without the
    # squeeze those (roughly a third of all dates) parse to NULL, and
    # a NULL modified_time is "never newer" to upsert_newer_wins, so
    # the affected files would never update in the snapshot.
    raw_c = F.regexp_replace(F.trim(_c(raw)), " +", " ")
    now = F.current_timestamp() if now is None else now
    year = F.date_format(now, "yyyy")
    # try_to_timestamp: unmatched format → NULL (Spark 4's to_timestamp
    # raises), which is what the two-format coalesce needs.
    with_year = F.try_to_timestamp(
        F.concat(raw_c, F.lit(" "), year), F.lit("MMM d HH:mm yyyy")
    )
    rolled = F.when(
        with_year > now, with_year - F.expr("INTERVAL 1 YEAR")
    ).otherwise(with_year)
    old_form = F.try_to_timestamp(raw_c, F.lit("MMM d yyyy"))
    return F.coalesce(old_form, rolled)


def ns_epoch_to_timestamp(ns: Column | str) -> Column:
    """int64 ns epoch → timestamp (µs precision). Exact decimal
    division — ns epochs (~1.8e18) exceed double's 2^53 exact-integer
    range, so a float divide would drift by ±1 µs (see tables.load)."""
    c = _c(ns).cast("decimal(38,0)")
    return F.timestamp_micros(((c - (c % 1000)) / 1000).cast("long")).cast("timestamp")


def iso_format(ts: Column | str) -> Column:
    """ISO-8601 string for ES documents (elasticsearch_integration.py:98-112)."""
    return F.date_format(_c(ts), "yyyy-MM-dd'T'HH:mm:ss")
