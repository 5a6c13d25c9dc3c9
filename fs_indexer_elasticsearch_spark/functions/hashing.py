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


_HEX = "0123456789abcdef"


def md5_shard(key: Column | str, n_shards: int) -> Column:
    """Deterministic content shard in [0, n_shards): the first 32-bit
    word of md5(key) (8 hex chars, exact nibble decode) mod n. md5
    produces identical bytes in Spark and DuckDB, so oracles can
    mirror the assignment exactly (the engines' native hash functions
    differ). The decode must be exact — ``ascii(ch) % n`` folds
    '8'/'9' onto 'a'..'f' residues and leaves slots empty, skewing
    shards 3x.

    A 32-bit word, not one byte: a single byte caps the useful shard
    count at 256 (shards 256.. would stay permanently empty) and any
    n not dividing 256 gets a built-in ±(n/256) occupancy imbalance —
    at 2^32 both effects are negligible for any practical n_shards.

    This is THE canonical shard assignment: the export sink
    (sinks/export.py) writes with it and the ``shard_balance_audit``
    query audits it — one function so they cannot drift.
    """
    h = F.md5(_c(key).cast("string"))
    word = F.lit(0).cast("long")
    for i in range(1, 9):
        word = word * 16 + (F.instr(F.lit(_HEX), F.substring(h, i, 1)) - 1)
    return word % n_shards


def md5_shard_sql(key_sql: str, n_shards: int) -> str:
    """DuckDB oracle twin of :func:`md5_shard` — same first-32-bit-word
    decode, importable next to the Spark expression so the two cannot
    drift."""
    return (
        f"(('0x' || substr(md5(({key_sql})::VARCHAR), 1, 8))::BIGINT"
        f" % {n_shards})"
    )


def composite_id(cols: list) -> Column:
    """Injective colon-joined serialization of a composite key into
    one string id (the ES ``_id`` for composite-key stores and the
    streaming feed-store key).

    A naive ``concat_ws(':')`` is NOT injective: an unescaped ':'
    inside a component makes ('a:b','c') and ('a','b:c') collide, and
    concat_ws silently DROPS null components so ('a', NULL) collides
    with ('a',). Here each component is escaped ('\\' -> '\\\\',
    ':' -> '\\:') and NULL is encoded as the bare token '\\N'
    (unreachable by any escaped real value — a literal backslash
    always doubles) BEFORE joining, so distinct key tuples always
    produce distinct ids and both publish paths (batch CDC sync and
    the streaming feed store) agree on one stable identity per key."""
    out = []
    for c in cols:
        s = _c(c).cast("string")
        esc = F.replace(
            F.replace(s, F.lit("\\"), F.lit("\\\\")),
            F.lit(":"),
            F.lit("\\:"),
        )
        out.append(F.coalesce(esc, F.lit("\\N")))
    return F.concat_ws(":", *out)
