"""Vector column expressions for embedding similarity search.

All math is elementwise float→double then a sequential fold — the
DuckDB oracle mirrors it with list lambdas, so dot products are
computed over identical doubles in both engines. Rankings always use
``stable_round``-ed similarities + an id tiebreak so top-k sets can't
flip on last-ulp differences.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two equal-length float arrays."""
    prods = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def hyperplane_weight(h: int | Column, d: Column) -> Column:
    """Deterministic pseudo-random hyperplane weight in [-1, 1]:
    derived from md5(f"{h}:{d}") so every engine regenerates the same
    planes without storing them (no RNG, no broadcast state)."""
    hs = F.lit(f"{h}:") if isinstance(h, int) else F.concat(h.cast("string"), F.lit(":"))
    key = F.concat(hs, d.cast("string"))
    v = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    return ((v % 2001) - 1000) / F.lit(1000.0)


def hyperplane_weight_py(h: int, d: int) -> float:
    """Python twin of :func:`hyperplane_weight` — bit-identical value
    (int(md5 hex[:8], 16) is exactly conv(substr(md5, 1, 8), 16, 10),
    and the % / division operands are non-negative, so Python and JVM
    arithmetic agree). Used to FOLD the planes into literal arrays at
    plan-build time: the weight depends only on (plane, dim), but
    inside a ``transform`` lambda Catalyst cannot constant-fold the
    md5, so the expression form cost tables x planes x dims md5 evals
    PER ROW — 4096/row for the 8x8 OR-construction, the actual hot
    spot of the r6 recall gate (r6 verdict #6)."""
    import hashlib

    v = int(hashlib.md5(f"{h}:{d}".encode()).hexdigest()[:8], 16)
    return ((v % 2001) - 1000) / 1000.0


def quote_ident(name: str) -> str:
    """Backtick-quote a column name for embedding in SQL text: quoting
    keeps reserved words, non-ASCII names, and names that collide with
    niladic functions (``current_date``) resolving as COLUMNS, exactly
    like F.col. Embedded backticks are escaped by doubling."""
    return "`" + name.replace("`", "``") + "`"


def _lsh_bucket_sql(
    vec_sql: str, num_planes: int, table: int, ndims: int
) -> str:
    """The full per-table bucket code as ONE Spark-SQL string.

    Semantically identical to the Column-builder path below (same
    literal weights — repr() round-trips doubles exactly — same
    left-fold order, same dim guard), but built in a single F.expr:
    the Column form issues one py4j call per plane weight, and at
    8 planes x 8 tables x 64 dims x 2 join sides that is ~8 SECONDS of
    DRIVER-side plan construction per recall-gate invocation (measured
    plan-build 7.97 s vs 1.44 s execution). String building is pure
    Python; the JVM parses it once."""

    def plane(h: int) -> str:
        ws = ",".join(
            f"{hyperplane_weight_py(table * 64 + h, d)!r}D"
            for d in range(1, ndims + 1)
        )
        dp = (
            f"aggregate(zip_with({vec_sql}, array({ws}), "
            "(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (acc, x) -> acc + x)"
        )
        return (
            f"(CASE WHEN {dp} > 0 THEN shiftleft(CAST(1 AS BIGINT), {h}) "
            "ELSE CAST(0 AS BIGINT) END)"
        )

    guard = (
        f"(CASE WHEN size({vec_sql}) = {ndims} THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(raise_error(format_string("
        f"'lsh_bucket: vector has %s dims, expected {ndims} "
        f"(pass ndims= to match the data)', "
        f"CAST(size({vec_sql}) AS STRING))) AS BIGINT) END)"
    )
    return " + ".join([guard] + [plane(h) for h in range(num_planes)])


def lsh_bucket(
    vec: Column | str, num_planes: int = 8, table: int = 0, ndims: int = 64
) -> Column:
    """Sign-random-projection LSH bucket code (num_planes bits).

    Scale path for ANN: vectors land in 2^num_planes buckets; search
    joins on the bucket key instead of crossing the full corpus.
    ``table`` offsets the hyperplane keys so multiple independent
    tables (the recall-boosting OR-construction) reuse this builder.

    The hyperplanes are baked into the plan as LITERAL weight arrays
    (one per plane, ``hyperplane_weight_py``) — zero per-row hash
    work; the per-row cost is ``num_planes`` fused multiply-add folds.
    Bit-identical to the md5-expression form it replaced: same
    weights, same left-fold summation order.

    ``ndims`` must match the vector width, and that is ENFORCED per
    row: a mismatched vector would zip against NULL-padded weights,
    yield a NULL dot product, and silently land every such vector in
    code 0 — collapsing the bucket join toward a cross product with
    no error (r7 review finding). raise_error beats that failure mode;
    callers with variable-width vectors pass the right ndims per call.

    A plain column NAME takes the single-F.expr fast path
    (``_lsh_bucket_sql``, name backtick-quoted so reserved words and
    non-ASCII names resolve as columns) — identical semantics, ~100x
    cheaper plan construction; an arbitrary Column expression keeps
    the builder below.
    """
    if isinstance(vec, str):
        return F.expr(
            _lsh_bucket_sql(quote_ident(vec), num_planes, table, ndims)
        )
    v = _c(vec)
    dim_guard = F.when(
        F.size(v) == F.lit(ndims), F.lit(0).cast("long")
    ).otherwise(
        F.raise_error(
            F.format_string(
                "lsh_bucket: vector has %s dims, expected "
                + str(ndims)
                + " (pass ndims= to match the data)",
                F.size(v).cast("string"),
            )
        ).cast("long")
    )

    def plane_bit(h: int) -> Column:
        w = F.array(
            *[
                F.lit(hyperplane_weight_py(table * 64 + h, d))
                for d in range(1, ndims + 1)
            ]
        )
        prods = F.zip_with(v, w, lambda x, y: x.cast("double") * y)
        dp = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
        return F.when(dp > 0, F.shiftleft(F.lit(1).cast("long"), h)).otherwise(
            F.lit(0).cast("long")
        )

    code = dim_guard
    for h in range(num_planes):
        code = code + plane_bit(h)
    return code
