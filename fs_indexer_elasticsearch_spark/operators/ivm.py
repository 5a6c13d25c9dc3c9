"""Incremental view maintenance from the snapshot store's change feed.

Distributive aggregates (count/sum) maintain purely algebraically —
add post-images, subtract pre-images (see the
``incremental_view_maintenance`` registered query). MIN/MAX are only
SEMI-incremental: an insert can only improve the extremum (pure delta
math), but deleting the extremum row leaves the new extremum unknown
without looking at the group again. ``maintain_min_max`` therefore
splits the groups per cycle:

- groups whose feed removals can't have touched the stored extremum
  (every removed value strictly inside the (min, max) interval) update
  from the delta alone — O(feed);
- groups where a removal ties-or-beats the stored extremum are
  RECOMPUTED from the post-state base, restricted to exactly those
  groups by a LEFT-SEMI JOIN of the affected-group frame against the
  base — the affected set never becomes a driver-side key list or a
  literal predicate. The join strategy is left to AQE: the common
  cycle's handful of affected groups broadcasts, while a mass delete
  touching millions of groups falls back to a shuffled semi-join
  (an explicit broadcast hint here would smuggle the
  driver-proportional cost back in through the broadcast build).

Cost honesty at 100 TB: the recompute's aggregation work is
O(affected groups' rows), but a base bucketed on the KEY (the
store's layout) gives the group semi-join no file-level pruning, so
an extremum-departure cycle pays one scan of the base filtered by
the broadcast hash set. That is the standard engineering answer
absent a per-group index (Materialize maintains hierarchical
min/max arrangements to avoid exactly this; Delta's OPTIMIZE ZORDER
on the group column would restore skipping) — NOT pretending min/max
are distributive over deletes, and still zero cost on the common
cycles where no extremum departs: the only driver round-trip is a
LIMIT-1 existence probe on the (checkpointed) affected branch, and
with AQE the empty-affected case short-circuits anyway.

Reference parity: the reference recomputes its stats queries from
scratch each scan (db_duckdb.py:342-356); this module is the
scale path those rescans become.
"""

from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..tables import ckpt_shared


def maintain_min_max(
    store,
    v_from: int,
    v_to: int,
    group_cols: list[str],
    value_col: str,
    *,
    old_view: DataFrame | None = None,
    with_sum: bool = False,
) -> DataFrame:
    """Maintain a per-group (count, min, max) view across a feed
    window. Returns columns ``group_cols + [n, min_v, max_v]`` equal to
    a from-scratch ``groupBy(group).agg(count, min, max)`` over the
    ``v_to`` state. ``value_col`` is assumed non-null (the view's
    measure). ``with_sum=True`` adds a distributive ``s`` column
    (``sum(value_col)`` — adds add, removals subtract; the recompute
    branch re-sums) for callers maintaining a combined sum+extremum
    view (the streaming pipeline's declared view); the default leaves
    the established three-measure plan untouched.

    ``old_view`` is the PREVIOUSLY MAINTAINED view (columns
    ``group_cols + [n, min_v, max_v]``, as this function returns) — in
    steady state the caller feeds each cycle's output back in, so the
    common path touches ONLY the feed plus the affected-group
    recompute, never the base. When omitted (first cycle, or the
    oracle-gated demo, which must re-derive deterministically) the old
    view is computed from the ``v_from`` snapshot — one O(v_from)
    aggregate."""
    g = list(group_cols)
    val = F.col(value_col)
    sum_old = [F.col("s").alias("_s0")] if with_sum else []
    sum_old_agg = [F.sum(val).alias("_s0")] if with_sum else []
    if old_view is not None:
        old = old_view.select(
            *g,
            F.col("n").alias("_n0"),
            F.col("min_v").alias("_m0"),
            F.col("max_v").alias("_x0"),
            *sum_old,
        )
    else:
        old = (
            store.read(version=v_from)
            .groupBy(*g)
            .agg(
                F.count(F.lit(1)).alias("_n0"),
                F.min(val).alias("_m0"),
                F.max(val).alias("_x0"),
                *sum_old_agg,
            )
        )
    feed = store.read_changes(v_from, v_to, update_images="both")
    is_add = F.col("_change").isin("insert", "update_postimage")
    sum_inc = (
        [F.sum(F.when(is_add, val).otherwise(-val)).alias("_ds")]
        if with_sum
        else []
    )
    inc = feed.groupBy(*g).agg(
        F.sum(F.when(is_add, 1).otherwise(-1)).alias("_dn"),
        F.min(F.when(is_add, val)).alias("_ma"),
        F.max(F.when(is_add, val)).alias("_xa"),
        F.min(F.when(~is_add, val)).alias("_mr"),
        F.max(F.when(~is_add, val)).alias("_xr"),
        *sum_inc,
    )
    # Null-safe full outer: a NULL group value is a legitimate group
    # (SQL GROUP BY treats NULL as one group), but an equi-join on the
    # group columns would never pair its old row with its feed row —
    # the old extremum would pass through untouched. eqNullSafe joins
    # them like classify_changes does; group values coalesce from
    # whichever side is present.
    o, i = old.alias("o"), inc.alias("i")
    joined = o.join(
        i,
        reduce(
            lambda a, b: a & b,
            [F.col(f"o.{c}").eqNullSafe(F.col(f"i.{c}")) for c in g],
        ),
        "full_outer",
    ).select(
        *[F.coalesce(F.col(f"o.{c}"), F.col(f"i.{c}")).alias(c) for c in g],
        "_n0",
        "_m0",
        "_x0",
        "_dn",
        "_ma",
        "_xa",
        "_mr",
        "_xr",
        *(["_s0", "_ds"] if with_sum else []),
    )
    # Two consumers (kept branch + affected-group collect) share one
    # execution of the old-view/feed join.
    j = (
        joined
        .withColumn(
            "_n_new",
            (
                F.coalesce("_n0", F.lit(0)) + F.coalesce("_dn", F.lit(0))
            ).cast("long"),
        )
        .withColumn(
            "_recompute",
            F.coalesce(
                (
                    F.col("_mr").isNotNull()
                    & F.col("_m0").isNotNull()
                    & (F.col("_mr") <= F.col("_m0"))
                )
                | (
                    F.col("_xr").isNotNull()
                    & F.col("_x0").isNotNull()
                    & (F.col("_xr") >= F.col("_x0"))
                ),
                F.lit(False),
            ),
        )
        .transform(ckpt_shared)
    )
    kept = j.filter(~F.col("_recompute") & (F.col("_n_new") > 0)).select(
        *g,
        F.col("_n_new").alias("n"),
        # least/greatest skip NULLs: a brand-new group takes the
        # feed's extremum, an untouched group keeps the stored one.
        F.least("_m0", "_ma").alias("min_v"),
        F.greatest("_x0", "_xa").alias("max_v"),
        *(
            [
                (
                    F.coalesce("_s0", F.lit(0)) + F.coalesce("_ds", F.lit(0))
                ).alias("s")
            ]
            if with_sum
            else []
        ),
    )
    # Affected groups stay a DataFrame — no key list on the driver, no
    # literal predicate in the plan. The eqNullSafe semi-join keeps an
    # affected NULL group (plain == would drop it from the view). No
    # explicit broadcast hint: the common cycle's affected set is tiny
    # and AQE broadcasts it on its own, while a mass delete touching
    # millions of groups must be FREE to fall back to a shuffled
    # semi-join — a forced broadcast would rebuild exactly the
    # driver-proportional failure (collect to driver + 8 GB broadcast
    # cap) this path exists to avoid.
    affected = j.filter(F.col("_recompute")).select(
        *[F.col(c).alias(f"_ag_{c}") for c in g]
    )
    # Bounded existence probe (LIMIT 1 over the checkpointed branch),
    # not a key collect: skips planning the base read on the common
    # no-extremum-departure cycle.
    if affected.isEmpty():
        return kept
    cur = store.read(version=v_to)
    recomputed = (
        cur.join(
            affected,
            reduce(
                lambda a, b: a & b,
                [F.col(c).eqNullSafe(F.col(f"_ag_{c}")) for c in g],
            ),
            "left_semi",
        )
        .groupBy(*g)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(val).alias("min_v"),
            F.max(val).alias("max_v"),
            *([F.sum(val).alias("s")] if with_sum else []),
        )
    )
    return kept.unionByName(recomputed)


def maintain_joined_agg(
    fact_store,
    dim_store,
    v_from: int,
    v_to: int,
    *,
    fact_key_col: str,
    dim_key_col: str,
    group_col: str,
    cents_col: str = "price",
    old_view: DataFrame | None = None,
) -> DataFrame:
    """Maintain a fact ⋈ dim per-group (count, cents-sum) view across
    one window in which BOTH stores changed, by the exact two-term
    delta decomposition

        V2 - V1 = ΔF ⋈ D1  +  F2 ⋈ ΔD

    (first change the facts under yesterday's dim, then move whole
    per-key fact aggregates between groups as the dim rows move).
    Returns columns ``[group_col, n, s]`` (``s`` in integer cents)
    equal to a from-scratch ``F(v_to) ⋈ D(v_to)`` aggregate.

    - Term 1 joins the FACT feed to the pre-state dim with signed
      algebra: pre-images subtract, post-images add.
    - Term 2 signs the DIM feed (a re-grouped key subtracts its
      entire post-state fact aggregate from the old group and adds it
      to the new one; inserts/deletes are one-sided) against per-key
      aggregates of F(v_to) RESTRICTED by a semi-join to only the
      dim-changed keys — the fact table is never rescanned; O(facts
      of changed keys).

    Join strategies are left to AQE (same reasoning as
    ``maintain_min_max``'s affected-group join): the typically-small
    dim and changed-key set broadcast at runtime, while a dim-wide
    re-grouping touching millions of keys stays free to take a
    shuffled join instead of hitting the driver-built broadcast cap.

    ``old_view`` is the PREVIOUSLY MAINTAINED view (this function's
    own output) — feed each cycle's result back in and the base is
    never rescanned after the first derivation, exactly like
    ``maintain_min_max``'s steady state. Omitted, V1 derives from the
    two ``v_from`` snapshots (one O(v_from) join, the demo /
    first-cycle path).

    A NULL ``group_col`` is a legitimate group (SQL GROUP BY treats
    NULL as one group — a dim row with an unset attribute): the
    three-way combine pairs terms with eqNullSafe joins, same as
    ``maintain_min_max``'s old/feed join, so the NULL group's three
    contributions land on one output row instead of splitting."""
    cents = F.round(F.col(cents_col) * 100).cast("long")
    d_prev = dim_store.read(version=v_from).select(dim_key_col, group_col)
    if old_view is not None:
        old = old_view.select(
            group_col, F.col("n").alias("_n0"), F.col("s").alias("_s0")
        )
    else:
        old = (
            fact_store.read(version=v_from)
            .join(d_prev, F.col(fact_key_col) == F.col(dim_key_col))
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("_n0"), F.sum(cents).alias("_s0"))
        )
    sign_of = lambda col: F.when(  # noqa: E731
        col.isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    ffeed = fact_store.read_changes(v_from, v_to, update_images="both").join(
        d_prev, F.col(fact_key_col) == F.col(dim_key_col)
    )
    fsign = sign_of(F.col("_change"))
    t1 = ffeed.groupBy(group_col).agg(
        F.sum(fsign).alias("_n1"), F.sum(fsign * cents).alias("_s1")
    )
    # Two consumers (changed-key set + signed contributions) share one
    # execution of the dim feed's classification join.
    dfeed = (
        dim_store.read_changes(v_from, v_to, update_images="both")
        .select(
            F.col(dim_key_col).alias("_dk"),
            group_col,
            sign_of(F.col("_change")).alias("_dsign"),
        )
        .transform(ckpt_shared)
    )
    changed_keys = dfeed.select(F.col("_dk").alias("_ck")).distinct()
    per_key = (
        fact_store.read(version=v_to)
        .join(
            changed_keys,
            F.col(fact_key_col) == F.col("_ck"),
            "left_semi",
        )
        .groupBy(fact_key_col)
        .agg(F.count(F.lit(1)).alias("_kn"), F.sum(cents).alias("_ks"))
    )
    # Left join: a dim-changed key with no facts contributes zero.
    t2 = (
        dfeed.join(per_key, F.col("_dk") == F.col(fact_key_col), "left")
        .groupBy(group_col)
        .agg(
            F.sum(F.col("_dsign") * F.coalesce("_kn", F.lit(0))).alias("_n2"),
            F.sum(F.col("_dsign") * F.coalesce("_ks", F.lit(0))).alias("_s2"),
        )
    )
    # Null-safe combine: a plain USING full-outer would never pair the
    # NULL group's rows across the three terms (NULL != NULL), so its
    # old count, fact delta and dim moves would emerge as three
    # separate rows. eqNullSafe pairs them; the group value coalesces
    # from whichever side is present (still NULL for the NULL group —
    # that IS its label).
    m = _null_safe_outer(old, t1, group_col, ["_n0", "_s0"], ["_n1", "_s1"])
    return (
        _null_safe_outer(
            m, t2, group_col, ["_n0", "_s0", "_n1", "_s1"], ["_n2", "_s2"]
        )
        .select(
            group_col,
            (
                F.coalesce("_n0", F.lit(0))
                + F.coalesce("_n1", F.lit(0))
                + F.coalesce("_n2", F.lit(0))
            )
            .cast("long")
            .alias("n"),
            (
                F.coalesce("_s0", F.lit(0))
                + F.coalesce("_s1", F.lit(0))
                + F.coalesce("_s2", F.lit(0))
            )
            .cast("long")
            .alias("s"),
        )
        .filter(F.col("n") > 0)
    )


def _null_safe_outer(
    left: DataFrame,
    right: DataFrame,
    group_col: str,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """Full-outer join of two per-group frames on ``group_col`` with
    NULL-as-a-group semantics (eqNullSafe — SQL GROUP BY's one NULL
    group must pair across terms, where plain equality would split
    it), coalescing the group label from whichever side is present."""
    l, r = left.alias("l"), right.alias("r")
    return l.join(
        r,
        F.col(f"l.{group_col}").eqNullSafe(F.col(f"r.{group_col}")),
        "full_outer",
    ).select(
        F.coalesce(f"l.{group_col}", f"r.{group_col}").alias(group_col),
        *left_cols,
        *right_cols,
    )


def maintain_joined_min_max(
    fact_store,
    dim_store,
    v_from: int,
    v_to: int,
    *,
    fact_key_col: str,
    dim_key_col: str,
    group_col: str,
    cents_col: str = "price",
    old_view: DataFrame | None = None,
) -> DataFrame:
    """Compose the two IVM algebras (r10 verdict #5): maintain a
    fact ⋈ dim per-group ``(n, s, min_c, max_c)`` view — count,
    integer-cents sum, AND extremum measures — across one window in
    which BOTH stores changed. Returns
    ``[group_col, n, s, min_c, max_c]`` equal to a from-scratch
    ``F(v_to) ⋈ D(v_to)`` aggregate.

    Why neither parent covers this: ``maintain_joined_agg`` is
    count/sum only (distributive — pure signed algebra), and
    ``maintain_min_max`` is single-table — a DIM MOVE can retire a
    group's extremum without any fact delete (the extremum-holding
    key re-groups away), which no fact-feed inspection can see.

    n and s maintain by the exact two-term decomposition
    ``V2 − V1 = ΔF ⋈ D1 + F2 ⋈ ΔD`` (same algebra as
    ``maintain_joined_agg``). min/max are SEMI-incremental, split per
    group exactly like ``maintain_min_max``:

    - additions can only improve an extremum, so add-candidates come
      from (a) fact-feed post-images assigned to their POST-state dim
      group and (b) moved-in dim keys' post-state per-key extrema
      (already aggregated for term 2 — one shared scan);
    - a group is RECOMPUTED from the post-state join when an extremum
      may have departed: a fact-feed removal under the PRE-state dim
      ties-or-beats the stored extremum, OR any dim key genuinely
      left the group (pre-group ≠ post-group null-safe, or deleted) —
      the departed key's pre-state fact values are unknown without a
      rescan, so departure is conservatively a threat. Attribute-only
      dim updates (pre-group = post-group) threaten nothing and are
      filtered out of the threat set (their term-2 rows still cancel
      in the n/s algebra).

    The recompute restricts BOTH sides before the join: D2 is
    semi-joined to the affected groups first, so the fact scan is
    pruned by the key join to only the threatened groups' facts —
    never a full rescan. Affected groups stay a DataFrame end to end
    (no driver key list); join strategies are left to AQE, same
    reasoning as both parents. NULL groups pair via eqNullSafe
    everywhere (a NULL dim attribute is one legitimate group)."""
    cents = F.round(F.col(cents_col) * 100).cast("long")
    d_prev = dim_store.read(version=v_from).select(dim_key_col, group_col)
    d_cur = dim_store.read(version=v_to).select(
        F.col(dim_key_col).alias("_dk2"), F.col(group_col).alias("_g2")
    )
    if old_view is not None:
        old = old_view.select(
            group_col,
            F.col("n").alias("_n0"),
            F.col("s").alias("_s0"),
            F.col("min_c").alias("_m0"),
            F.col("max_c").alias("_x0"),
        )
    else:
        old = (
            fact_store.read(version=v_from)
            .join(d_prev, F.col(fact_key_col) == F.col(dim_key_col))
            .groupBy(group_col)
            .agg(
                F.count(F.lit(1)).alias("_n0"),
                F.sum(cents).alias("_s0"),
                F.min(cents).alias("_m0"),
                F.max(cents).alias("_x0"),
            )
        )
    sign_of = lambda col: F.when(  # noqa: E731
        col.isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    feed = fact_store.read_changes(
        v_from, v_to, update_images="both"
    ).transform(ckpt_shared)
    is_add = F.col("_change").isin("insert", "update_postimage")
    # Term 1 (n/s algebra + removal threats): fact feed under the
    # PRE-state dim — removals happened to rows grouped by D1.
    ffeed = feed.join(d_prev, F.col(fact_key_col) == F.col(dim_key_col))
    fsign = sign_of(F.col("_change"))
    t1 = ffeed.groupBy(group_col).agg(
        F.sum(fsign).alias("_n1"),
        F.sum(fsign * cents).alias("_s1"),
        F.min(F.when(~is_add, cents)).alias("_fr_min"),
        F.max(F.when(~is_add, cents)).alias("_fr_max"),
    )
    # Add-candidates: fact-feed post-images land in their POST-state
    # dim group (an added row is a v_to row — its group is D2's).
    fadd = (
        feed.filter(is_add)
        .join(d_cur, F.col(fact_key_col) == F.col("_dk2"))
        .groupBy(F.col("_g2").alias(group_col))
        .agg(
            F.min(cents).alias("_fa_min"),
            F.max(cents).alias("_fa_max"),
        )
    )
    # Dim feed, shared by the n/s term 2, the moved-in candidates and
    # the departure threats (one classification join execution).
    dfeed = (
        dim_store.read_changes(v_from, v_to, update_images="both")
        .select(
            F.col(dim_key_col).alias("_dk"),
            group_col,
            sign_of(F.col("_change")).alias("_dsign"),
        )
        .transform(ckpt_shared)
    )
    changed_keys = dfeed.select(F.col("_dk").alias("_ck")).distinct()
    per_key = (
        fact_store.read(version=v_to)
        .join(changed_keys, F.col(fact_key_col) == F.col("_ck"), "left_semi")
        .groupBy(fact_key_col)
        .agg(
            F.count(F.lit(1)).alias("_kn"),
            F.sum(cents).alias("_ks"),
            F.min(cents).alias("_kmin"),
            F.max(cents).alias("_kmax"),
        )
        .transform(ckpt_shared)
    )
    dj = dfeed.join(per_key, F.col("_dk") == F.col(fact_key_col), "left")
    t2 = dj.groupBy(group_col).agg(
        F.sum(F.col("_dsign") * F.coalesce("_kn", F.lit(0))).alias("_n2"),
        F.sum(F.col("_dsign") * F.coalesce("_ks", F.lit(0))).alias("_s2"),
        # Moved-in (and attribute-updated) keys' post-state extrema:
        # their F2 values are v_to members of this group, so they are
        # valid min/max candidates; for a no-op move they're already
        # in the group — least/greatest make the redundancy harmless.
        F.min(F.when(F.col("_dsign") == 1, F.col("_kmin"))).alias("_da_min"),
        F.max(F.when(F.col("_dsign") == 1, F.col("_kmax"))).alias("_da_max"),
    )
    # Departure threats: a key whose PRE-group differs (null-safe)
    # from its POST-group — or that was deleted outright — may have
    # held its old group's extremum; its pre-state fact values are
    # unknown without a rescan, so its old group recomputes. The
    # struct flag distinguishes "no pre row" from "pre row with a
    # NULL group" (a NULL group is real and must be threatenable).
    mv = dfeed.groupBy("_dk").agg(
        F.max(
            F.when(
                F.col("_dsign") == -1,
                F.struct(F.lit(1).alias("h"), F.col(group_col).alias("g")),
            )
        ).alias("_pre"),
        F.max(
            F.when(
                F.col("_dsign") == 1,
                F.struct(F.lit(1).alias("h"), F.col(group_col).alias("g")),
            )
        ).alias("_post"),
    )
    dthreat = (
        mv.filter(
            F.col("_pre").isNotNull()
            & (
                F.col("_post").isNull()
                | ~F.col("_pre.g").eqNullSafe(F.col("_post.g"))
            )
        )
        .select(F.col("_pre.g").alias(group_col))
        .distinct()
        .withColumn("_dthreat", F.lit(True))
    )
    j = (
        _null_safe_outer(old, t1, group_col,
                         ["_n0", "_s0", "_m0", "_x0"],
                         ["_n1", "_s1", "_fr_min", "_fr_max"])
        .transform(lambda df: _null_safe_outer(
            df, t2, group_col,
            ["_n0", "_s0", "_m0", "_x0", "_n1", "_s1", "_fr_min", "_fr_max"],
            ["_n2", "_s2", "_da_min", "_da_max"]))
        .transform(lambda df: _null_safe_outer(
            df, fadd, group_col,
            ["_n0", "_s0", "_m0", "_x0", "_n1", "_s1", "_fr_min", "_fr_max",
             "_n2", "_s2", "_da_min", "_da_max"],
            ["_fa_min", "_fa_max"]))
        .transform(lambda df: _null_safe_outer(
            df, dthreat, group_col,
            ["_n0", "_s0", "_m0", "_x0", "_n1", "_s1", "_fr_min", "_fr_max",
             "_n2", "_s2", "_da_min", "_da_max", "_fa_min", "_fa_max"],
            ["_dthreat"]))
        .withColumn(
            "_n_new",
            (
                F.coalesce("_n0", F.lit(0))
                + F.coalesce("_n1", F.lit(0))
                + F.coalesce("_n2", F.lit(0))
            ).cast("long"),
        )
        .withColumn(
            "_s_new",
            (
                F.coalesce("_s0", F.lit(0))
                + F.coalesce("_s1", F.lit(0))
                + F.coalesce("_s2", F.lit(0))
            ).cast("long"),
        )
        .withColumn(
            "_recompute",
            F.coalesce("_dthreat", F.lit(False))
            | F.coalesce(
                (
                    F.col("_fr_min").isNotNull()
                    & (
                        F.col("_m0").isNull()
                        | (F.col("_fr_min") <= F.col("_m0"))
                        | (F.col("_fr_max") >= F.col("_x0"))
                    )
                ),
                F.lit(False),
            ),
        )
        .transform(ckpt_shared)
    )
    kept = j.filter(~F.col("_recompute") & (F.col("_n_new") > 0)).select(
        group_col,
        F.col("_n_new").alias("n"),
        F.col("_s_new").alias("s"),
        F.least("_m0", "_fa_min", "_da_min").alias("min_c"),
        F.greatest("_x0", "_fa_max", "_da_max").alias("max_c"),
    )
    affected = j.filter(F.col("_recompute")).select(
        F.col(group_col).alias("_ag")
    )
    if affected.isEmpty():
        return kept
    # Prune D2 to the threatened groups FIRST, so the key join prunes
    # the fact scan to those groups' facts — the recompute never
    # rescans the whole base (maintain_min_max's honesty note does
    # not apply here: the dim key join IS the per-group index).
    d_aff = d_cur.join(
        affected, F.col("_g2").eqNullSafe(F.col("_ag")), "left_semi"
    )
    recomputed = (
        fact_store.read(version=v_to)
        .join(d_aff, F.col(fact_key_col) == F.col("_dk2"))
        .groupBy(F.col("_g2").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(cents).alias("s"),
            F.min(cents).alias("min_c"),
            F.max(cents).alias("max_c"),
        )
    )
    return kept.unionByName(recomputed)


def maintain_value_counts(
    store,
    v_from: int,
    v_to: int,
    group_cols: list[str],
    value_col: str,
    *,
    old_hist: DataFrame | None = None,
) -> DataFrame:
    """Maintain the per-(group, value) MULTIPLICITY view — the
    auxiliary state that turns the HOLISTIC aggregates (exact
    COUNT(DISTINCT), exact MEDIAN / percentiles, MODE) into exactly
    incremental ones under inserts AND deletes. None of those is
    distributive (deleting a value can retire a distinct bin, shift
    the median, or demote the mode — the classic reason engines fall
    back to full rescans or approximate sketches, and sketches like
    HLL are not even delete-capable), but all of them are PURE
    FUNCTIONS of this histogram, and the histogram itself maintains
    with count's trivial algebra: +1 per added (group, value) row,
    −1 per removed one, bins dropped at zero.

    Returns columns ``group_cols + [value_col, c]`` equal to a
    from-scratch ``groupBy(group, value).count()`` over the ``v_to``
    state. ``old_hist`` is the previously maintained histogram (same
    columns, as returned here) — steady-state callers feed each
    cycle's output back in, so a cycle costs O(feed) + O(touched
    bins), never a base rescan; omitted, the first derivation
    aggregates the ``v_from`` snapshot once. Serve the aggregates
    with :func:`histogram_stats`.

    A NULL value forms its own bin (null-safe pairing, same rule as
    the NULL group) — callers wanting SQL's NULL-ignoring
    COUNT(DISTINCT) semantics filter it before the stats pass.

    Cost honesty at 100 TB: the view state is O(groups × distinct
    values), not O(rows) — for a bounded-domain measure (status
    codes, buckets, star ratings) it is tiny; for a near-unique
    measure it approaches the base's key count and a sketch is the
    right tool instead. The maintenance pass is one feed-sized
    groupBy plus one full-outer join against the old histogram on
    (group, value) — both shuffle on the same key, no base scan, no
    driver round-trips, no recompute branch AT ALL (unlike min/max,
    the histogram algebra is closed under deletes).

    Reference parity: the reference recomputes its per-extension /
    per-root stats queries from scratch each scan
    (db_duckdb.py:342-356); this is the exact-holistic scale path."""
    g = list(group_cols)
    gv = g + [value_col]
    if old_hist is not None:
        old = old_hist.select(*gv, F.col("c").alias("_c0"))
    else:
        old = (
            store.read(version=v_from)
            .groupBy(*gv)
            .agg(F.count(F.lit(1)).alias("_c0"))
        )
    feed = store.read_changes(v_from, v_to, update_images="both")
    is_add = F.col("_change").isin("insert", "update_postimage")
    inc = feed.groupBy(*gv).agg(
        F.sum(F.when(is_add, 1).otherwise(-1)).alias("_dc")
    )
    o, i = old.alias("o"), inc.alias("i")
    joined = o.join(
        i,
        reduce(
            lambda a, b: a & b,
            [F.col(f"o.{c}").eqNullSafe(F.col(f"i.{c}")) for c in gv],
        ),
        "full_outer",
    ).select(
        *[F.coalesce(F.col(f"o.{c}"), F.col(f"i.{c}")).alias(c) for c in gv],
        (F.coalesce("_c0", F.lit(0)) + F.coalesce("_dc", F.lit(0)))
        .cast("long")
        .alias("c"),
    )
    # c == 0: the bin's last row departed — dropped, so the histogram
    # stays dense (a negative c can only mean old_hist was not the
    # true v_from histogram — a caller contract violation, same class
    # as feeding a foreign old_view into maintain_min_max).
    return joined.filter(F.col("c") > 0)


def histogram_stats(
    hist: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    quantiles: dict[str, float] | None = None,
) -> DataFrame:
    """The holistic per-group aggregates, served FROM a (maintained)
    value-count histogram — no base scan, O(bins) work:

    - ``n``           total rows (sum of multiplicities),
    - ``n_distinct``  exact COUNT(DISTINCT value) — the bin count,
    - ``mode_v``      most frequent value, ties broken to the
                      SMALLEST value (deterministic, unlike SQL
                      engines' unspecified MODE tiebreak),
    - ``median_v``    exact continuous-interpolation median (the
                      quantile_cont(0.5) every engine implements):
                      mean of the lower- and upper-middle values from
                      the weighted cumulative counts — for odd n the
                      two coincide.

    ``quantiles`` adds exact continuous-interpolation quantile
    columns (``{"p90": 0.9, ...}`` — name to fraction), the same
    definition as SQL ``percentile_cont``: 1-indexed position
    ``1 + (n-1)q`` over the weighted cumulative counts, linear
    interpolation between the straddling values. Exactness where
    ``approx_percentile`` sketches, still O(bins).

    One window sort per group over the BINS (not the rows) serves the
    cumulative, total, and max-count frames; the final groupBy folds
    them. ``value_col`` must be orderable and numeric (the
    interpolation arithmetic)."""
    from pyspark.sql import Window

    g = list(group_cols)
    val = F.col(value_col)
    w = Window.partitionBy(*g).orderBy(value_col)
    w_cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    e = hist.select(
        *g,
        value_col,
        "c",
        F.sum("c").over(w_cum).alias("_cum"),
        F.sum("c").over(w_all).alias("_tot"),
        F.max("c").over(w_all).alias("_mc"),
    )
    lo_k = F.floor((F.col("_tot") + 1) / 2)
    hi_k = F.floor(F.col("_tot") / 2) + 1
    q_aggs = []
    for name, q in (quantiles or {}).items():
        # Position is constant per group (_tot is), so the straddling
        # values are plain conditional MINs over the bins; the
        # interpolation runs on the folded aggregates below.
        pos = F.lit(1.0) + (F.col("_tot") - 1) * F.lit(float(q))
        q_aggs += [
            F.min(F.when(F.col("_cum") >= F.floor(pos), val)).alias(
                f"_{name}_lo"
            ),
            F.min(F.when(F.col("_cum") >= F.ceil(pos), val)).alias(
                f"_{name}_hi"
            ),
        ]
    agged = e.groupBy(*g).agg(
        F.max("_tot").alias("n"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.min(F.when(F.col("c") == F.col("_mc"), val)).alias("mode_v"),
        (
            (
                F.min(F.when(F.col("_cum") >= lo_k, val))
                + F.min(F.when(F.col("_cum") >= hi_k, val))
            )
            / F.lit(2.0)
        ).alias("median_v"),
        *q_aggs,
    )
    for name, q in (quantiles or {}).items():
        pos = F.lit(1.0) + (F.col("n") - 1) * F.lit(float(q))
        frac = pos - F.floor(pos)
        agged = agged.withColumn(
            name,
            F.col(f"_{name}_lo")
            + frac * (F.col(f"_{name}_hi") - F.col(f"_{name}_lo")),
        ).drop(f"_{name}_lo", f"_{name}_hi")
    return agged


def maintain_top_k(
    store,
    v_from: int,
    v_to: int,
    group_cols: list[str],
    value_col: str,
    k: int,
    *,
    old_view: DataFrame | None = None,
) -> DataFrame:
    """Maintain the per-group TOP-K view — the k-generalization of
    ``maintain_min_max``'s max side (k=1 degenerates to it). Returns
    ``group_cols + [n, topk]`` where ``topk`` is the k largest
    ``value_col`` values sorted descending (fewer when the group has
    fewer rows), equal to a from-scratch ranked top-k over the
    ``v_to`` state. ``value_col`` is assumed non-null.

    The same semi-incremental split as min/max, with the k-th stored
    value as the HORIZON:

    - inserts merge algebraically — the new top-k is the top-k of
      (stored array ∪ feed adds' own top-k), O(k) per group;
    - a removal strictly BELOW the horizon (the smallest stored
      element) cannot touch the membership — pure delta, only ``n``
      moves. This covers the n0 <= k case for free: there every
      group value IS stored, so any genuine removal ties-or-beats
      the horizon;
    - a removal that ties-or-beats the horizon RECOMPUTES that group
      from the post-state base via the same AQE-adaptive eqNullSafe
      left-semi join (no driver key list, no forced broadcast — see
      the module docstring's cost note).

    Feed adds are pre-ranked per group (window row_number, keep
    ``<= k``) BEFORE the array collect, so a mass-insert cycle never
    materializes an unbounded collect_list — the maintenance state
    stays O(groups × k) everywhere. The first derivation (no
    ``old_view``) ranks the ``v_from`` snapshot the same way."""
    from pyspark.sql import Window

    g = list(group_cols)
    val = F.col(value_col)

    def ranked_topk(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*g).orderBy(F.desc(value_col))
        return (
            df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .groupBy(*g)
            .agg(
                F.reverse(F.array_sort(F.collect_list(val))).alias("_tk")
            )
        )

    def n_and_topk(df: DataFrame) -> DataFrame:
        # ONE pass for (n, topk): collect_list skips the NULL the
        # when() assigns past rank k, so the array stays O(k) while
        # the count covers every row — and no group-key join is
        # needed (a join on the group columns would drop the NULL
        # group; GROUP BY keeps it).
        w = Window.partitionBy(*g).orderBy(F.desc(value_col))
        return (
            df.withColumn("_rk", F.row_number().over(w))
            .groupBy(*g)
            .agg(
                F.count(F.lit(1)).alias("_n"),
                F.reverse(
                    F.array_sort(
                        F.collect_list(F.when(F.col("_rk") <= k, val))
                    )
                ).alias("_tk"),
            )
        )

    if old_view is not None:
        old = old_view.select(
            *g, F.col("n").alias("_n0"), F.col("topk").alias("_tk0")
        )
    else:
        old = (
            n_and_topk(store.read(version=v_from))
            .withColumnRenamed("_n", "_n0")
            .withColumnRenamed("_tk", "_tk0")
        )
    feed = store.read_changes(v_from, v_to, update_images="both")
    is_add = F.col("_change").isin("insert", "update_postimage")
    adds = ranked_topk(feed.filter(is_add)).withColumnRenamed("_tk", "_ta")
    counts = feed.groupBy(*g).agg(
        F.sum(F.when(is_add, 1).otherwise(-1)).alias("_dn"),
        F.max(F.when(~is_add, val)).alias("_xr"),
    )
    inc = _multi_null_safe_outer(counts, adds, g).select(
        *g, "_dn", "_xr", "_ta"
    )
    joined = _multi_null_safe_outer(old, inc, g)
    j = (
        joined.withColumn(
            "_n_new",
            (
                F.coalesce("_n0", F.lit(0)) + F.coalesce("_dn", F.lit(0))
            ).cast("long"),
        )
        .withColumn(
            # Horizon = the smallest STORED top-k element; a removal
            # that ties-or-beats it may retire a member (or, when the
            # whole group is stored, must — a removed value always
            # exists in the group).
            "_recompute",
            F.coalesce(
                F.col("_xr").isNotNull()
                & F.col("_tk0").isNotNull()
                & (F.col("_xr") >= F.element_at("_tk0", -1)),
                F.lit(False),
            ),
        )
        .transform(ckpt_shared)
    )
    # Typed empty fallbacks (slice-to-zero of the OTHER side) — a bare
    # F.array() is array<void> and won't coerce to the value type. A
    # row always has at least one side present, so the coalesce chain
    # never needs both.
    merged_tk = F.slice(
        F.reverse(
            F.array_sort(
                F.concat(
                    F.coalesce("_tk0", F.slice("_ta", 1, 0)),
                    F.coalesce("_ta", F.slice("_tk0", 1, 0)),
                )
            )
        ),
        1,
        k,
    )
    kept = j.filter(~F.col("_recompute") & (F.col("_n_new") > 0)).select(
        *g,
        F.col("_n_new").alias("n"),
        merged_tk.alias("topk"),
    )
    affected = j.filter(F.col("_recompute")).select(
        *[F.col(c).alias(f"_ag_{c}") for c in g]
    )
    if affected.isEmpty():
        return kept
    cur = store.read(version=v_to)
    scoped = cur.join(
        affected,
        reduce(
            lambda a, b: a & b,
            [F.col(c).eqNullSafe(F.col(f"_ag_{c}")) for c in g],
        ),
        "left_semi",
    )
    recomputed = (
        n_and_topk(scoped)
        .withColumnRenamed("_n", "n")
        .withColumnRenamed("_tk", "topk")
    )
    return kept.unionByName(recomputed)


def _multi_null_safe_outer(
    left: DataFrame, right: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Full-outer join on ALL group columns with NULL-as-a-group
    pairing, group labels coalesced — the multi-column sibling of
    ``_null_safe_outer``."""
    l, r = left.alias("l"), right.alias("r")
    return l.join(
        r,
        reduce(
            lambda a, b: a & b,
            [
                F.col(f"l.{c}").eqNullSafe(F.col(f"r.{c}"))
                for c in group_cols
            ],
        ),
        "full_outer",
    ).select(
        *[
            F.coalesce(F.col(f"l.{c}"), F.col(f"r.{c}")).alias(c)
            for c in group_cols
        ],
        *[F.col(f"l.{c}") for c in left.columns if c not in group_cols],
        *[F.col(f"r.{c}") for c in right.columns if c not in group_cols],
    )


def maintain_moments(
    store,
    v_from: int,
    v_to: int,
    group_cols: list[str],
    value_col: str,
    *,
    old_view: DataFrame | None = None,
) -> DataFrame:
    """Maintain the per-group MOMENT view ``(n, s, s2)`` — count, sum,
    and sum of squares — the distributive state behind every
    mean/variance/stddev dashboard. Like count/sum (and unlike
    min/max), the algebra is CLOSED under deletes: adds add, removals
    subtract, no recompute branch, one feed-sized pass.

    The accumulators are ``decimal(38,0)``, not long, on purpose: a
    100 TB fact table with cent-scale measures (~1e7) has per-row
    squares ~1e14, and a long sum of squares overflows at ~1e5 such
    rows — SILENTLY with ANSI off, the worst failure mode for a
    metric nobody cross-checks. 38-digit decimals hold ~1e38: room
    for 1e12 rows of 1e13-scale squares, and Spark's decimal sum
    raises on genuine overflow instead of wrapping.

    ``value_col`` must be integral (the exact-integer contract every
    money measure in this library follows — see the cents rule in
    plans/scale_queries.py); derived stats (mean, variance, stddev)
    are for the CALLER to compute from the exact moments, fixing the
    double-arithmetic shape on both sides of any oracle comparison.
    ``old_view`` feeds back the previous cycle's output
    (``group_cols + [n, s, s2]``); omitted, the first derivation
    aggregates the ``v_from`` snapshot once."""
    g = list(group_cols)
    val = F.col(value_col).cast("decimal(19,0)")
    sq = (val * val).cast("decimal(38,0)")
    v1 = val.cast("decimal(38,0)")
    if old_view is not None:
        old = old_view.select(
            *g,
            F.col("n").alias("_n0"),
            F.col("s").cast("decimal(38,0)").alias("_s0"),
            F.col("s2").cast("decimal(38,0)").alias("_q0"),
        )
    else:
        old = (
            store.read(version=v_from)
            .groupBy(*g)
            .agg(
                F.count(F.lit(1)).alias("_n0"),
                F.sum(v1).cast("decimal(38,0)").alias("_s0"),
                F.sum(sq).cast("decimal(38,0)").alias("_q0"),
            )
        )
    feed = store.read_changes(v_from, v_to, update_images="both")
    is_add = F.col("_change").isin("insert", "update_postimage")
    sign = F.when(is_add, F.lit(1)).otherwise(F.lit(-1)).cast("decimal(19,0)")
    inc = feed.groupBy(*g).agg(
        F.sum(F.when(is_add, 1).otherwise(-1)).alias("_dn"),
        F.sum((sign * val).cast("decimal(38,0)")).cast("decimal(38,0)").alias("_ds"),
        F.sum((sign * sq).cast("decimal(38,0)")).cast("decimal(38,0)").alias("_dq"),
    )
    zero = F.lit(0).cast("decimal(38,0)")
    return (
        _multi_null_safe_outer(old, inc, g)
        .select(
            *g,
            (
                F.coalesce("_n0", F.lit(0)) + F.coalesce("_dn", F.lit(0))
            )
            .cast("long")
            .alias("n"),
            (F.coalesce("_s0", zero) + F.coalesce("_ds", zero))
            .cast("decimal(38,0)")
            .alias("s"),
            (F.coalesce("_q0", zero) + F.coalesce("_dq", zero))
            .cast("decimal(38,0)")
            .alias("s2"),
        )
        .filter(F.col("n") > 0)
    )


def maintain_joined_value_counts(
    fact_store,
    dim_store,
    v_from: int,
    v_to: int,
    *,
    fact_key_col: str,
    dim_key_col: str,
    group_col: str,
    value_col: str,
    old_hist: DataFrame | None = None,
    dim_v_from: int | None = None,
    dim_v_to: int | None = None,
) -> DataFrame:
    """Maintain the fact ⋈ dim per-(group, value) multiplicity
    histogram across one window in which BOTH stores changed — the
    composition of ``maintain_joined_agg``'s two-term decomposition
    with ``maintain_value_counts``'s bin algebra. Bins are counts
    grouped one level finer than the joined (n, s) view, so the same
    exact identity applies:

        bins(V2) - bins(V1) = bins(ΔF ⋈ D1) + bins(F2 ⋈ ΔD)

    - Term 1 joins the FACT feed to the pre-state dim and signs bin
      deltas per (group, value): pre-images −1, post-images +1.
    - Term 2 signs the DIM feed against per-(key, value) counts of
      F(v_to) RESTRICTED by a semi-join to the dim-changed keys — a
      re-grouped key moves its whole value multiset between groups;
      the fact table is never rescanned.

    Serve the holistic aggregates — exact COUNT(DISTINCT), MEDIAN /
    quantiles, MODE per dim group — from the result with
    :func:`histogram_stats`; because the bin algebra is closed under
    deletes there is no recompute branch anywhere, even when a dim
    departure withdraws a group's entire contribution. Returns
    ``[group_col, value_col, c]`` equal to a from-scratch
    ``F(v_to) ⋈ D(v_to)`` bin count; ``old_hist`` feeds back the
    previous cycle's output for the never-rescan steady state. Join
    strategies are left to AQE throughout (same reasoning as
    ``maintain_joined_agg``).

    ``dim_v_from`` / ``dim_v_to`` (default: the fact window's numbers)
    let the DIM side advance over its OWN version window — the
    identity bins(V2) − bins(V1) = bins(ΔF⋈D1) + bins(F2⋈ΔD) never
    required the two stores' version counters to align, only that V1
    is (f_from, d_from) and V2 is (f_to, d_to). The streaming joined
    maintainer records one reflected version PER STORE and passes
    both windows here."""
    gv = [group_col, value_col]
    d_from = v_from if dim_v_from is None else dim_v_from
    d_to = v_to if dim_v_to is None else dim_v_to
    d_prev = dim_store.read(version=d_from).select(dim_key_col, group_col)
    if old_hist is not None:
        old = old_hist.select(*gv, F.col("c").alias("_c0"))
    else:
        old = (
            fact_store.read(version=v_from)
            .join(d_prev, F.col(fact_key_col) == F.col(dim_key_col))
            .groupBy(*gv)
            .agg(F.count(F.lit(1)).alias("_c0"))
        )
    sign_of = lambda col: F.when(  # noqa: E731
        col.isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    ffeed = fact_store.read_changes(v_from, v_to, update_images="both").join(
        d_prev, F.col(fact_key_col) == F.col(dim_key_col)
    )
    t1 = ffeed.groupBy(*gv).agg(
        F.sum(sign_of(F.col("_change"))).alias("_c1")
    )
    dfeed = (
        dim_store.read_changes(d_from, d_to, update_images="both")
        .select(
            F.col(dim_key_col).alias("_dk"),
            group_col,
            sign_of(F.col("_change")).alias("_dsign"),
        )
        .transform(ckpt_shared)
    )
    changed_keys = dfeed.select(F.col("_dk").alias("_ck")).distinct()
    per_key_val = (
        fact_store.read(version=v_to)
        .join(
            changed_keys,
            F.col(fact_key_col) == F.col("_ck"),
            "left_semi",
        )
        .groupBy(fact_key_col, value_col)
        .agg(F.count(F.lit(1)).alias("_kc"))
    )
    # Left join: a dim-changed key with no facts yields one
    # (group, NULL-value) row with _kc NULL — it contributes 0 and the
    # c > 0 filter drops the phantom bin (a REAL NULL-value bin, if
    # the data has one, just absorbs a harmless +0).
    t2 = (
        dfeed.join(per_key_val, F.col("_dk") == F.col(fact_key_col), "left")
        .groupBy(*gv)
        .agg(
            F.sum(F.col("_dsign") * F.coalesce("_kc", F.lit(0))).alias("_c2")
        )
    )
    m = _multi_null_safe_outer(old, t1, gv)
    return (
        _multi_null_safe_outer(m, t2, gv)
        .select(
            *gv,
            (
                F.coalesce("_c0", F.lit(0))
                + F.coalesce("_c1", F.lit(0))
                + F.coalesce("_c2", F.lit(0))
            )
            .cast("long")
            .alias("c"),
        )
        .filter(F.col("c") > 0)
    )


def maintain_hll_distinct(
    store,
    v_from: int,
    v_to: int,
    group_cols: list[str],
    key_col: str,
    *,
    old_sketches: DataFrame | None = None,
) -> DataFrame:
    """Maintain per-group HLL DISTINCT-COUNT sketches across an
    INSERT-ONLY window — the sketch dual of
    :func:`maintain_value_counts`: where the exact histogram carries
    O(distinct values) state and survives deletes, the HLL sketch
    carries O(2^lgK) bytes per group regardless of cardinality — the
    right tool when the measure is near-unique (doc ids, user ids,
    URLs) and the feed only ever adds. Union-of-sketches is EXACT
    with respect to the sketch algorithm (register-wise max), so the
    maintained estimate is bit-identical to a from-scratch
    ``hll_sketch_agg`` over the post state — maintenance loses
    nothing beyond the sketch's own approximation.

    DELETES ARE REFUSED LOUDLY: an HLL register cannot forget, so a
    feed containing removals would silently over-count forever — the
    one failure mode a sketch consumer cannot detect downstream. A
    window with any delete/update_preimage row raises; route such
    workloads to the exact histogram instead.

    Returns ``group_cols + [sk]`` (binary sketch — feed it back as
    ``old_sketches`` next cycle); estimate with
    ``F.hll_sketch_estimate``."""
    g = list(group_cols)
    feed = store.read_changes(v_from, v_to, update_images="both")
    is_add = F.col("_change").isin("insert", "update_postimage")
    if not feed.filter(~is_add).isEmpty():
        raise ValueError(
            "maintain_hll_distinct: the window contains removals — an "
            "HLL register cannot forget, so maintaining through a "
            "delete silently over-counts forever. Use the exact "
            "histogram view (maintain_value_counts) for delete-bearing "
            "feeds."
        )
    if old_sketches is not None:
        old = old_sketches.select(*g, F.col("sk").alias("_sk0"))
    else:
        old = (
            store.read(version=v_from)
            .groupBy(*g)
            .agg(F.hll_sketch_agg(key_col).alias("_sk0"))
        )
    inc = feed.groupBy(*g).agg(F.hll_sketch_agg(key_col).alias("_ska"))
    return _multi_null_safe_outer(old, inc, g).select(
        *g,
        F.when(F.col("_sk0").isNull(), F.col("_ska"))
        .when(F.col("_ska").isNull(), F.col("_sk0"))
        .otherwise(F.hll_union("_sk0", "_ska"))
        .alias("sk"),
    )


def classify_membership(
    rows: DataFrame,
    dim_store,
    dim_version: int,
    *,
    fact_key_col: str,
    dim_key_col: str,
) -> DataFrame:
    """Tag fact rows with dim-key existence at ``dim_version``: one
    column-pruned read of the dim key column, left join, ``matched``
    coalesced to False (a NULL fact key never matches — SQL join
    semantics). The ONE definition shared by the batch maintainer,
    the delta form and the streaming pipeline's first derivation, so
    the classification rule cannot drift between paths."""
    dim_keys = dim_store.read(version=dim_version).select(
        F.col(dim_key_col).alias("_dk"), F.lit(True).alias("_m")
    )
    return (
        rows.join(dim_keys, F.col(fact_key_col) == F.col("_dk"), "left")
        .withColumn("matched", F.coalesce("_m", F.lit(False)))
        .drop("_dk", "_m")
    )


def maintain_join_membership(
    fact_store,
    dim_store,
    v_from: int,
    v_to: int,
    *,
    fact_key_col: str,
    dim_key_col: str,
    old_view: DataFrame | None = None,
) -> DataFrame:
    """Maintain the SEMI/ANTI-JOIN PARTITION of the fact table by dim
    membership across one window in which BOTH stores changed: every
    fact post-state row, tagged ``matched`` = does its ``fact_key_col``
    currently exist in the dim store. ``matched=false`` rows ARE the
    maintained anti-join (orphans / referential-integrity violations);
    ``matched=true`` rows are the semi-join. The two partitions always
    tile the fact exactly — maintaining the pair is what makes dim-key
    transitions O(feed): a key that appears in the dim RETIRES orphans
    by flipping their flag in place, and a key that vanishes CREATES
    orphans from rows the view already holds — neither direction ever
    rescans the fact store.

    Per cycle the inputs are: both change feeds, plus ONE
    column-pruned scan of the dim post-state KEY column (to classify
    brand-new fact keys the previous view has never seen — the one
    question neither feed can answer; dim ≪ fact at scale, the scan
    reads a single parquet column, and AQE broadcasts the typically
    small fact-add side). Dim 'update' rows change attributes, never
    key existence (the dim store is keyed on ``dim_key_col``), so only
    its insert/delete rows drive flips. A NULL fact key never matches
    any dim key (SQL join semantics) and therefore stays
    ``matched=false`` through every cycle without special casing.

    ``old_view`` is this function's own previous output (fact columns
    + ``matched``); omitted, the first derivation joins the two
    ``v_from`` snapshots once. Returns the fact ``v_to`` rows +
    ``matched`` — feed it back next cycle.

    Reference parity: the reference's orphan checks are full NOT-IN
    rescans per scan cycle (scanner.py:447-454, db_duckdb.py:296-312);
    this is the scale path those rescans become."""
    fact_pk = fact_store.key
    pks = [fact_pk] if isinstance(fact_pk, str) else list(fact_pk)
    if old_view is None:
        old_view = classify_membership(
            fact_store.read(version=v_from).drop("_bucket"),
            dim_store,
            v_from,
            fact_key_col=fact_key_col,
            dim_key_col=dim_key_col,
        )
    out_cols = old_view.columns

    # Fact feed: an update is remove-pre-image + add-post-image; the
    # collapsed feed already carries post-images for insert/update and
    # pre-images for delete, so pks(update|delete) drop and rows
    # (insert|update) re-enter through the add path.
    ffeed = fact_store.read_changes(v_from, v_to).transform(ckpt_shared)
    gone_pks = ffeed.filter(F.col("_change").isin("update", "delete")).select(
        *pks
    )
    adds = ffeed.filter(F.col("_change").isin("insert", "update")).drop(
        "_change"
    )

    # Dim feed: only insert/delete change key existence. A collapsed
    # 'update' has the key present on both sides of the window.
    dfeed = dim_store.read_changes(v_from, v_to).transform(ckpt_shared)
    appeared = (
        dfeed.filter(F.col("_change") == "insert")
        .select(F.col(dim_key_col).alias("_ak"), F.lit(True).alias("_ap"))
    )
    vanished = (
        dfeed.filter(F.col("_change") == "delete")
        .select(F.col(dim_key_col).alias("_vk"), F.lit(True).alias("_va"))
    )

    survivors = old_view.join(gone_pks, pks, "left_anti")
    flipped = (
        survivors.join(appeared, F.col(fact_key_col) == F.col("_ak"), "left")
        .join(vanished, F.col(fact_key_col) == F.col("_vk"), "left")
        .withColumn(
            "matched",
            F.when(F.col("_ap"), F.lit(True))
            .when(F.col("_va"), F.lit(False))
            .otherwise(F.col("matched")),
        )
        .select(*out_cols)
    )

    # Brand-new fact rows classify against the dim POST-state key
    # column — the cycle's one dim scan (column-pruned; adds side
    # broadcasts under AQE when small).
    classified_adds = classify_membership(
        adds, dim_store, v_to,
        fact_key_col=fact_key_col, dim_key_col=dim_key_col,
    ).select(*out_cols)
    return flipped.unionByName(classified_adds)


def _merge_count_sum(
    old: DataFrame, delta: DataFrame, group_col: str
) -> DataFrame:
    """Merge a signed (dn, ds) delta frame into a (n, s) view frame on
    ``group_col`` (null-safe outer — NULL is one group), dropping
    groups whose count reaches zero. The distributive half every
    cascade level shares; callers always supply a view frame (the
    cascade derives both levels when no feedback is given)."""
    return (
        _null_safe_outer(
            old.select(
                group_col, F.col("n").alias("_n0"), F.col("s").alias("_s0")
            ),
            delta,
            group_col,
            ["_n0", "_s0"],
            ["_dn", "_ds"],
        )
        .select(
            group_col,
            (F.coalesce("_n0", F.lit(0)) + F.coalesce("_dn", F.lit(0)))
            .cast("long")
            .alias("n"),
            (F.coalesce("_s0", F.lit(0)) + F.coalesce("_ds", F.lit(0)))
            .cast("long")
            .alias("s"),
        )
        .filter(F.col("n") > 0)
    )


def maintain_rollup_cascade(
    store,
    v_from: int,
    v_to: int,
    *,
    fine_col: str,
    coarse_col: str,
    coarse_of,
    value_col: str,
    old_fine: DataFrame | None = None,
    old_coarse: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Maintain a TWO-LEVEL ROLLUP HIERARCHY (fine grain → coarse
    grain, e.g. day → month) of per-group (count, sum) views from one
    change feed, where the COARSE level is maintained from the FINE
    LEVEL'S DELTA — never from the feed, never from the base:

        ΔV_day   = Σ feed rows, grouped by day          (O(feed))
        V_day'   = V_day ⊕ ΔV_day                       (O(changed days))
        ΔV_month = ΔV_day regrouped by month(day)       (O(changed days))
        V_month' = V_month ⊕ ΔV_month                   (O(changed months))

    This is the composition law that makes N-level rollup trees
    (hour→day→month→year dashboards) affordable at 100 TB: each level
    consumes only the level below's delta, so a feed touching one
    day's partition costs O(feed) once plus O(1) per coarser level —
    not one rescan per level. Correct because count/sum are
    distributive and the coarse grouping is a FUNCTION of the fine
    grain (every fine group maps to exactly one coarse group), so
    regrouping the delta commutes with aggregation.

    ``coarse_of`` maps a fine-grain Column to its coarse value (e.g.
    ``lambda d: F.trunc(d, "month")``). ``old_fine``/``old_coarse``
    are this function's previous outputs (feed them back — steady
    state never rescans); omitted, both derive from the ``v_from``
    snapshot with one scan. Values flow as integers (cents-style) —
    callers pre-scale floats so the sums are exact. Returns
    ``(fine_view, coarse_view)``, each ``[grain_col, n, s]``.

    Reference parity: the reference's directory rollup recomputes
    every ancestor total per scan (directory_size.py:39-60); this is
    the maintained form of the same size-tree idea."""
    val = F.col(value_col)
    feed = store.read_changes(v_from, v_to, update_images="both")
    is_add = F.col("_change").isin("insert", "update_postimage")
    sign = F.when(is_add, F.lit(1)).otherwise(F.lit(-1))
    # ONE aggregation of the feed produces the fine delta; both levels
    # consume it (localCheckpoint shares the execution).
    d_fine = (
        feed.groupBy(F.col(fine_col))
        .agg(
            F.sum(sign).alias("_dn"),
            F.sum(sign * val).alias("_ds"),
        )
        .transform(ckpt_shared)
    )
    if old_fine is None and old_coarse is None:
        base = store.read(version=v_from)
        old_fine = base.groupBy(fine_col).agg(
            F.count(F.lit(1)).alias("n"), F.sum(val).cast("long").alias("s")
        ).transform(ckpt_shared)
        old_coarse = old_fine.groupBy(
            coarse_of(F.col(fine_col)).alias(coarse_col)
        ).agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    elif old_fine is None or old_coarse is None:
        raise ValueError(
            "maintain_rollup_cascade: feed back both views or neither"
        )
    fine = _merge_count_sum(old_fine, d_fine, fine_col)
    d_coarse = d_fine.groupBy(
        coarse_of(F.col(fine_col)).alias(coarse_col)
    ).agg(F.sum("_dn").alias("_dn"), F.sum("_ds").alias("_ds"))
    coarse = _merge_count_sum(old_coarse, d_coarse, coarse_col)
    return fine, coarse


def cms_bucket(d_col, key_col, width: int):
    """Count-min bucket for hash row ``d``: md5('cms' || d || ':' ||
    key) first-8-hex-digits mod width — md5-derived like the LSH
    planes (deterministic, no RNG, no stored state), so a DuckDB
    oracle rebuilds the identical sketch."""
    key = F.concat(
        F.lit("cms"), d_col.cast("string"), F.lit(":"), key_col.cast("string")
    )
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        % F.lit(width)
    )


def maintain_cms(
    store,
    v_from: int,
    v_to: int,
    key_col: str,
    *,
    depth: int = 4,
    width: int = 256,
    old_cells: DataFrame | None = None,
) -> DataFrame:
    """Maintain a COUNT-MIN SKETCH of a key column's occurrence counts
    across a feed window — the DELETE-CAPABLE sketch complement to
    :func:`maintain_hll_distinct`: CMS is a turnstile-model linear
    sketch (cells are plain sums), so removals subtract exactly where
    HLL registers cannot forget. Per cycle the maintenance is one
    O(feed × depth) delta aggregation merged into the O(depth × width)
    cell frame — the sketch never grows with the key space, which is
    the point: approximate per-key counts (heavy hitters, frequency
    caps) over a billion-key domain in a few KB of maintained state,
    with the one-sided guarantee (estimate >= true count) preserved
    by maintenance because the merged cells equal the from-scratch
    cells EXACTLY (the gate proves bit-equality, not just bounds).

    Returns ``(d, bucket, cnt)`` cells (feed back as ``old_cells``);
    read a key's estimate as min over d of its hashed cells."""
    depths = F.array(*[F.lit(d).cast("long") for d in range(depth)])
    key = F.col(key_col)
    if old_cells is not None:
        old = old_cells.select(
            "d", "bucket", F.col("cnt").alias("_c0")
        )
    else:
        old = (
            store.read(version=v_from)
            .select(key.alias("_k"), F.explode(depths).alias("d"))
            .select("d", cms_bucket(F.col("d"), F.col("_k"), width).alias("bucket"))
            .groupBy("d", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("_c0"))
        )
    feed = store.read_changes(v_from, v_to, update_images="both")
    sign = F.when(
        F.col("_change").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = (
        feed.select(key.alias("_k"), sign.alias("_s"), F.explode(depths).alias("d"))
        .select("d", cms_bucket(F.col("d"), F.col("_k"), width).alias("bucket"), "_s")
        .groupBy("d", "bucket")
        .agg(F.sum("_s").alias("_dc"))
    )
    return (
        old.join(delta, ["d", "bucket"], "full_outer")
        .select(
            "d",
            "bucket",
            (F.coalesce("_c0", F.lit(0)) + F.coalesce("_dc", F.lit(0)))
            .cast("long")
            .alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )


def join_membership_delta(
    fact_store,
    dim_store,
    v_from: int,
    v_to: int,
    *,
    fact_key_col: str,
    dim_key_col: str,
    view_df: DataFrame,
    dim_v_from: int | None = None,
    dim_v_to: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The DELTA form of :func:`maintain_join_membership`, for a view
    that is PUBLISHED AS A KEYED STORE rather than rewritten whole:
    the full partition view is O(|fact|), so a streaming publisher
    that overwrote it per epoch would pay a fact-sized write for a
    feed-sized change. This returns exactly what changed —

    - ``upserts``: fact adds (insert/update post-images) classified
      against the dim post-state key column, PLUS rows of the current
      view whose flag actually flips under the window's dim-key
      appearances/disappearances (rows whose flag already agrees are
      not re-emitted);
    - ``removed``: the fact pks deleted in the window (updates re-enter
      through upserts — a keyed merge replaces them in place).

    Merging these into the view store costs O(feed + flips), never
    O(|fact|). ``view_df`` is the current published view (fact columns
    + ``matched``); the caller reads it from the view store, so the
    store IS the feedback loop. ``dim_v_from``/``dim_v_to`` let the
    dim window differ from the fact window (an out-of-band dim writer
    has its own version counter); they default to the fact window."""
    dvf = v_from if dim_v_from is None else dim_v_from
    dvt = v_to if dim_v_to is None else dim_v_to
    out_cols = [c for c in view_df.columns if c != "_bucket"]
    view_df = view_df.drop("_bucket")
    fact_pk = fact_store.key
    pks = [fact_pk] if isinstance(fact_pk, str) else list(fact_pk)

    ffeed = fact_store.read_changes(v_from, v_to).transform(ckpt_shared)
    removed = ffeed.filter(F.col("_change") == "delete").select(*pks)
    adds = ffeed.filter(F.col("_change").isin("insert", "update")).drop(
        "_change"
    )
    classified_adds = classify_membership(
        adds, dim_store, dvt,
        fact_key_col=fact_key_col, dim_key_col=dim_key_col,
    ).select(*out_cols)

    dfeed = dim_store.read_changes(dvf, dvt)
    appeared = dfeed.filter(F.col("_change") == "insert").select(
        F.col(dim_key_col).alias("_tk"), F.lit(True).alias("_to")
    )
    vanished = dfeed.filter(F.col("_change") == "delete").select(
        F.col(dim_key_col).alias("_tk"), F.lit(False).alias("_to")
    )
    transitions = appeared.unionByName(vanished)
    # Rows re-entering through adds are classified fresh there; exclude
    # them from the flip path so one upsert per pk reaches the merge.
    flips = (
        view_df.join(adds.select(*pks), pks, "left_anti")
        .join(removed, pks, "left_anti")
        .join(transitions, F.col(fact_key_col) == F.col("_tk"))
        .filter(F.col("matched") != F.col("_to"))
        .withColumn("matched", F.col("_to"))
        .select(*out_cols)
    )
    return classified_adds.unionByName(flips), removed


def maintain_joined3_agg(
    fact_store,
    dim1_store,
    dim2_store,
    v_from: int,
    v_to: int,
    *,
    fact_key_col: str,
    dim1_key_col: str,
    dim1_attr_col: str,
    dim2_key_col: str,
    group_col: str,
    cents_col: str = "price",
    old_view: DataFrame | None = None,
    dim1_window: tuple[int, int] | None = None,
    dim2_window: tuple[int, int] | None = None,
) -> DataFrame:
    """Maintain a THREE-TABLE joined per-group (count, cents-sum) view
    — fact ⋈ dim1 ⋈ dim2 (a snowflake arm: orders ⋈ customer ⋈
    nation) — across one window in which ALL THREE stores changed, by
    the telescoping three-term decomposition

        V2 − V1 = ΔF ⋈ C1 ⋈ N1  +  F2 ⋈ ΔC ⋈ N1  +  F2 ⋈ C2 ⋈ ΔN

    (joins are multilinear over signed multisets, so the exact
    identity follows from telescoping F2⋈C2⋈N2 − F1⋈C1⋈N1 one factor
    at a time). Each term is delta-bound:

    - Term 1 joins the FACT feed (signed images) to the two PRE-state
      dims — O(feed).
    - Term 2 signs the DIM1 feed; each image carries its whole
      per-key fact aggregate (F2 restricted by a semi-join to the
      dim1-changed keys — the fact is never rescanned) and re-groups
      through the PRE-state dim2.
    - Term 3 signs the DIM2 feed; each image carries the per-dim2-key
      aggregate of F2 ⋈ C2 restricted to the dim2-changed keys — the
      POST dim1 is filtered to those keys FIRST, so the fact join is
      pruned to exactly the affected snowflake slice.

    The n-table generalization is the same ladder (pre-state factors
    to the left of the changed one, post-state to the right), each
    term pruned by its own changed-key semi-join; Spark's AQE picks
    broadcast vs shuffle per term at runtime. ``old_view`` feeds back
    this function's own output; ``dim1_window``/``dim2_window`` let
    out-of-band dim writers advance on their own version counters
    (default: the fact window). Returns ``[group_col, n, s]``.

    Reference parity: the reference's 3-way files × direct_links ×
    directory_sizes join (direct_links.py:194-260) is recomputed per
    scan; this is its maintained form."""
    cents = F.round(F.col(cents_col) * 100).cast("long")
    d1vf, d1vt = dim1_window or (v_from, v_to)
    d2vf, d2vt = dim2_window or (v_from, v_to)
    c1 = dim1_store.read(version=d1vf).select(dim1_key_col, dim1_attr_col)
    n1 = dim2_store.read(version=d2vf).select(dim2_key_col, group_col)
    sign_of = lambda col: F.when(  # noqa: E731
        col.isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))

    if old_view is not None:
        old = old_view.select(
            group_col, F.col("n").alias("_n0"), F.col("s").alias("_s0")
        )
    else:
        old = (
            fact_store.read(version=v_from)
            .join(c1, F.col(fact_key_col) == F.col(dim1_key_col))
            .join(n1, F.col(dim1_attr_col) == F.col(dim2_key_col))
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("_n0"), F.sum(cents).alias("_s0"))
        )

    # Term 1: ΔF ⋈ C1 ⋈ N1
    ffeed = fact_store.read_changes(v_from, v_to, update_images="both")
    t1 = (
        ffeed.withColumn("_sg", sign_of(F.col("_change")))
        .join(c1, F.col(fact_key_col) == F.col(dim1_key_col))
        .join(n1, F.col(dim1_attr_col) == F.col(dim2_key_col))
        .groupBy(group_col)
        .agg(
            F.sum("_sg").alias("_n1"),
            F.sum(F.col("_sg") * cents).alias("_s1"),
        )
    )

    # Terms 2 and 3 both need post-state fact slices. The fact store
    # is bucketed on its own pk, so a changed-key semi-join prunes
    # shuffle volume but not storage I/O — paying that scan TWICE
    # (once per term) would double the heaviest read of the cycle
    # (review finding). Instead, ONE scan restricted to the union of
    # both changed-key slices is shared: it is delta-sized (facts of
    # dim1-changed customers plus facts of dim2-changed nations'
    # customers), so the lazy checkpoint materializes O(affected), not
    # O(fact).
    d1feed = (
        dim1_store.read_changes(d1vf, d1vt, update_images="both")
        .select(
            F.col(dim1_key_col).alias("_d1k"),
            F.col(dim1_attr_col).alias("_d1a"),
            sign_of(F.col("_change")).alias("_d1s"),
        )
        .transform(ckpt_shared)
    )
    d2feed = (
        dim2_store.read_changes(d2vf, d2vt, update_images="both")
        .select(
            F.col(dim2_key_col).alias("_d2k"),
            group_col,
            sign_of(F.col("_change")).alias("_d2s"),
        )
        .transform(ckpt_shared)
    )
    changed_cks = d1feed.select(F.col("_d1k").alias("_ck")).distinct()
    changed_nks = d2feed.select(F.col("_d2k").alias("_nk")).distinct()
    # Post dim1 filtered to the changed dim2 keys FIRST, so the fact
    # join sees only the affected snowflake slice.
    c2_changed = (
        dim1_store.read(version=d1vt)
        .select(dim1_key_col, dim1_attr_col)
        .join(changed_nks, F.col(dim1_attr_col) == F.col("_nk"), "left_semi")
        .transform(ckpt_shared)
    )
    combined_keys = changed_cks.unionByName(
        c2_changed.select(F.col(dim1_key_col).alias("_ck"))
    ).distinct()
    f_slice = (
        fact_store.read(version=v_to)
        .join(combined_keys, F.col(fact_key_col) == F.col("_ck"), "left_semi")
        .transform(ckpt_shared)
    )

    # Term 2: F2 ⋈ ΔC ⋈ N1 — per-key fact aggregates move whole.
    per_key = (
        f_slice.join(
            changed_cks, F.col(fact_key_col) == F.col("_ck"), "left_semi"
        )
        .groupBy(fact_key_col)
        .agg(F.count(F.lit(1)).alias("_kn"), F.sum(cents).alias("_ks"))
    )
    t2 = (
        d1feed.join(per_key, F.col("_d1k") == F.col(fact_key_col), "left")
        .join(n1, F.col("_d1a") == F.col(dim2_key_col))
        .groupBy(group_col)
        .agg(
            F.sum(F.col("_d1s") * F.coalesce("_kn", F.lit(0))).alias("_n2"),
            F.sum(F.col("_d1s") * F.coalesce("_ks", F.lit(0))).alias("_s2"),
        )
    )

    # Term 3: F2 ⋈ C2 ⋈ ΔN over the shared slice.
    per_nation = (
        f_slice.join(c2_changed, F.col(fact_key_col) == F.col(dim1_key_col))
        .groupBy(dim1_attr_col)
        .agg(F.count(F.lit(1)).alias("_gn"), F.sum(cents).alias("_gs"))
    )
    t3 = (
        d2feed.join(
            per_nation, F.col("_d2k") == F.col(dim1_attr_col), "left"
        )
        .groupBy(group_col)
        .agg(
            F.sum(F.col("_d2s") * F.coalesce("_gn", F.lit(0))).alias("_n3"),
            F.sum(F.col("_d2s") * F.coalesce("_gs", F.lit(0))).alias("_s3"),
        )
    )

    m = _null_safe_outer(old, t1, group_col, ["_n0", "_s0"], ["_n1", "_s1"])
    m = _null_safe_outer(
        m, t2, group_col, ["_n0", "_s0", "_n1", "_s1"], ["_n2", "_s2"]
    )
    m = _null_safe_outer(
        m,
        t3,
        group_col,
        ["_n0", "_s0", "_n1", "_s1", "_n2", "_s2"],
        ["_n3", "_s3"],
    )
    zsum = lambda cols: reduce(  # noqa: E731
        lambda a, b: a + b, [F.coalesce(c, F.lit(0)) for c in cols]
    )
    return m.select(
        group_col,
        zsum(["_n0", "_n1", "_n2", "_n3"]).cast("long").alias("n"),
        zsum(["_s0", "_s1", "_s2", "_s3"]).cast("long").alias("s"),
    ).filter(F.col("n") > 0)


def maintain_joined_top_k(
    fact_store,
    dim_store,
    v_from: int,
    v_to: int,
    *,
    fact_key_col: str,
    dim_key_col: str,
    group_col: str,
    k: int,
    cents_col: str = "price",
    old_view: DataFrame | None = None,
    dim_window: tuple[int, int] | None = None,
) -> DataFrame:
    """The last cell of the composition matrix: per-group TOP-K over a
    JOINED view with BOTH stores changing — count/sum ride the exact
    two-term decomposition (``maintain_joined_agg``), the k-deep
    extremum rides the horizon rule (``maintain_top_k``), and the dim
    feed contributes both directions exactly as in
    ``maintain_joined_min_max``: a moved-IN key's post-state fact
    values are candidates that can only improve the stored array, a
    moved-OUT (or deleted) key may have held any of its old group's
    top-k and forces that group's recompute. Returns
    ``[group_col, n, s, topk]`` (``topk`` = k largest cents,
    descending) equal to a from-scratch ranked top-k over
    ``F(v_to) ⋈ D(v_to)``.

    Per cycle: O(feed) candidate ranking (pre-ranked per group before
    any array collect, so state stays O(groups × k)), plus ONE
    group-pruned post-state join for the threatened groups — D2 is
    semi-joined to the affected set first, so the fact scan is pruned
    by the key join (never a rescan); all join strategies left to
    AQE. NULL groups pair null-safely end to end."""
    from pyspark.sql import Window

    cents = F.round(F.col(cents_col) * 100).cast("long")
    # ``dim_window`` lets an out-of-band dim writer advance on its own
    # version counter (default: the fact window) — the same contract
    # as maintain_joined3_agg's dim windows / maintain_joined_value_
    # counts' dim_v_from/dim_v_to, required by the streaming twin
    # where the dim evolves outside the fact stream.
    dvf, dvt = dim_window or (v_from, v_to)
    d_prev = dim_store.read(version=dvf).select(dim_key_col, group_col)
    d_cur = dim_store.read(version=dvt).select(
        F.col(dim_key_col).alias("_dk2"), F.col(group_col).alias("_g2")
    )

    def ranked(df: DataFrame, val_col: str) -> DataFrame:
        w = Window.partitionBy(group_col).orderBy(F.desc(val_col))
        return (
            df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k)
            .groupBy(group_col)
            .agg(
                F.reverse(
                    F.array_sort(F.collect_list(F.col(val_col)))
                ).alias("_cand")
            )
        )

    if old_view is not None:
        old = old_view.select(
            group_col,
            F.col("n").alias("_n0"),
            F.col("s").alias("_s0"),
            F.col("topk").alias("_tk0"),
        )
    else:
        base = (
            fact_store.read(version=v_from)
            .join(d_prev, F.col(fact_key_col) == F.col(dim_key_col))
            .select(group_col, cents.alias("_c"))
            .transform(ckpt_shared)
        )
        w = Window.partitionBy(group_col).orderBy(F.desc("_c"))
        old = (
            base.withColumn("_rk", F.row_number().over(w))
            .groupBy(group_col)
            .agg(
                F.count(F.lit(1)).alias("_n0"),
                F.sum("_c").alias("_s0"),
                F.reverse(
                    F.array_sort(
                        F.collect_list(F.when(F.col("_rk") <= k, F.col("_c")))
                    )
                ).alias("_tk0"),
            )
        )
    sign_of = lambda col: F.when(  # noqa: E731
        col.isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    feed = fact_store.read_changes(
        v_from, v_to, update_images="both"
    ).transform(ckpt_shared)
    is_add = F.col("_change").isin("insert", "update_postimage")
    # n/s algebra + removal threats under the PRE-state dim.
    ffeed = feed.join(d_prev, F.col(fact_key_col) == F.col(dim_key_col))
    fsign = sign_of(F.col("_change"))
    t1 = ffeed.groupBy(group_col).agg(
        F.sum(fsign).alias("_n1"),
        F.sum(fsign * cents).alias("_s1"),
        F.max(F.when(~is_add, cents)).alias("_xr"),
    )
    # Dim feed: term-2 n/s + moved-in candidates + departure threats.
    dfeed = (
        dim_store.read_changes(dvf, dvt, update_images="both")
        .select(
            F.col(dim_key_col).alias("_dk"),
            group_col,
            sign_of(F.col("_change")).alias("_dsign"),
        )
        .transform(ckpt_shared)
    )
    changed_keys = dfeed.select(F.col("_dk").alias("_ck")).distinct()
    fact_pk = fact_store.key
    pks = [fact_pk] if isinstance(fact_pk, str) else list(fact_pk)
    f_slice = (
        fact_store.read(version=v_to)
        .join(changed_keys, F.col(fact_key_col) == F.col("_ck"), "left_semi")
        .select(*pks, F.col(fact_key_col).alias("_fk"), cents.alias("_c"))
        .transform(ckpt_shared)
    )
    per_key = f_slice.groupBy("_fk").agg(
        F.count(F.lit(1)).alias("_kn"), F.sum("_c").alias("_ks")
    )
    t2 = (
        dfeed.join(per_key, F.col("_dk") == F.col("_fk"), "left")
        .groupBy(group_col)
        .agg(
            F.sum(F.col("_dsign") * F.coalesce("_kn", F.lit(0))).alias("_n2"),
            F.sum(F.col("_dsign") * F.coalesce("_ks", F.lit(0))).alias("_s2"),
        )
    )
    # Candidates: fact post-images under the POST dim, plus moved-in
    # keys' post-state fact values (their group is the feed's +1 row's
    # group) — ranked per group BEFORE any collect, O(groups x k).
    fadd_rows = (
        feed.filter(is_add)
        .join(d_cur, F.col(fact_key_col) == F.col("_dk2"))
        .select(F.col("_g2").alias(group_col), cents.alias("_v"))
    )
    # Moved-in keys' post-state rows, MINUS rows already contributed
    # by the fact feed's post-images (a row that is both a feed add
    # and a moved-in key's row must enter the candidate multiset
    # exactly once — arrays, unlike min/max, are not idempotent).
    din_rows = (
        dfeed.filter(F.col("_dsign") == 1)
        .join(
            f_slice.join(feed.filter(is_add).select(*pks), pks, "left_anti"),
            F.col("_dk") == F.col("_fk"),
        )
        .select(group_col, F.col("_c").alias("_v"))
    )
    cands = ranked(fadd_rows.unionByName(din_rows), "_v")
    # Departure threats: pre-group differs null-safely from post-group,
    # or the key was deleted (same struct trick as joined min/max).
    mv = dfeed.groupBy("_dk").agg(
        F.max(
            F.when(
                F.col("_dsign") == -1,
                F.struct(F.lit(1).alias("h"), F.col(group_col).alias("g")),
            )
        ).alias("_pre"),
        F.max(
            F.when(
                F.col("_dsign") == 1,
                F.struct(F.lit(1).alias("h"), F.col(group_col).alias("g")),
            )
        ).alias("_post"),
    )
    dthreat = (
        mv.filter(
            F.col("_pre").isNotNull()
            & (
                F.col("_post").isNull()
                | ~F.col("_pre.g").eqNullSafe(F.col("_post.g"))
            )
        )
        .select(F.col("_pre.g").alias(group_col))
        .distinct()
        .withColumn("_dthreat", F.lit(True))
    )
    j = (
        _null_safe_outer(old, t1, group_col,
                         ["_n0", "_s0", "_tk0"], ["_n1", "_s1", "_xr"])
        .transform(lambda df: _null_safe_outer(
            df, t2, group_col,
            ["_n0", "_s0", "_tk0", "_n1", "_s1", "_xr"], ["_n2", "_s2"]))
        .transform(lambda df: _null_safe_outer(
            df, cands, group_col,
            ["_n0", "_s0", "_tk0", "_n1", "_s1", "_xr", "_n2", "_s2"],
            ["_cand"]))
        .transform(lambda df: _null_safe_outer(
            df, dthreat, group_col,
            ["_n0", "_s0", "_tk0", "_n1", "_s1", "_xr", "_n2", "_s2",
             "_cand"],
            ["_dthreat"]))
        .withColumn(
            "_n_new",
            (
                F.coalesce("_n0", F.lit(0))
                + F.coalesce("_n1", F.lit(0))
                + F.coalesce("_n2", F.lit(0))
            ).cast("long"),
        )
        .withColumn(
            "_s_new",
            (
                F.coalesce("_s0", F.lit(0))
                + F.coalesce("_s1", F.lit(0))
                + F.coalesce("_s2", F.lit(0))
            ).cast("long"),
        )
        .withColumn(
            # Horizon rule: a removal ties-or-beats the k-th stored
            # value (or the group was never fully stored — _tk0 null),
            # or a dim key departed the group.
            "_recompute",
            F.coalesce("_dthreat", F.lit(False))
            | F.coalesce(
                F.col("_xr").isNotNull()
                & (
                    F.col("_tk0").isNull()
                    | (F.col("_xr") >= F.element_at("_tk0", -1))
                ),
                F.lit(False),
            ),
        )
        .transform(ckpt_shared)
    )
    empty_arr = F.slice(F.coalesce("_cand", "_tk0"), 1, 0)
    kept = j.filter(~F.col("_recompute") & (F.col("_n_new") > 0)).select(
        group_col,
        F.col("_n_new").alias("n"),
        F.col("_s_new").alias("s"),
        F.slice(
            F.reverse(
                F.array_sort(
                    F.concat(
                        F.coalesce("_tk0", empty_arr),
                        F.coalesce("_cand", empty_arr),
                    )
                )
            ),
            1,
            k,
        ).alias("topk"),
    )
    affected = j.filter(F.col("_recompute")).select(
        F.col(group_col).alias("_ag")
    )
    if affected.isEmpty():
        return kept
    d_aff = d_cur.join(
        affected, F.col("_g2").eqNullSafe(F.col("_ag")), "left_semi"
    )
    rebase = (
        fact_store.read(version=v_to)
        .join(d_aff, F.col(fact_key_col) == F.col("_dk2"))
        .select(F.col("_g2").alias(group_col), cents.alias("_c"))
    )
    w2 = Window.partitionBy(group_col).orderBy(F.desc("_c"))
    recomputed = (
        rebase.withColumn("_rk", F.row_number().over(w2))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_c").alias("s"),
            F.reverse(
                F.array_sort(
                    F.collect_list(F.when(F.col("_rk") <= k, F.col("_c")))
                )
            ).alias("topk"),
        )
    )
    return kept.unionByName(recomputed)


def dyadic_bucket(lvl_col, d_col, node_col, width: int):
    """Count-min bucket for dyadic node ``node`` at level ``lvl``,
    hash row ``d``: md5('dcms' || lvl || ':' || d || ':' || node)
    first-8-hex-digits mod width — the md5-derived no-RNG scheme of
    :func:`cms_bucket`, extended with the level so the per-level
    sketches are independent (a DuckDB oracle rebuilds identically)."""
    key = F.concat(
        F.lit("dcms"),
        lvl_col.cast("string"),
        F.lit(":"),
        d_col.cast("string"),
        F.lit(":"),
        node_col.cast("string"),
    )
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        % F.lit(width)
    )


def maintain_dyadic_cms(
    store,
    v_from: int,
    v_to: int,
    value,
    *,
    levels: int = 12,
    depth: int = 3,
    width: int = 128,
    old_cells: DataFrame | None = None,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Maintain a DYADIC count-min sketch of an integer value column —
    the turnstile RANK/QUANTILE sketch (Cormode-Muthukrishnan): one
    CMS per dyadic level ℓ counts the level's nodes (``value div
    2^ℓ``), so the rank of any x — count of values < x — is the sum
    of at most ``levels`` node estimates along x's dyadic
    decomposition of [0, x), each a min-over-depth CMS read. That
    closes the gap between the maintained exact histogram (exact
    quantiles, O(distinct) state) and the flat CMS (per-key counts,
    no order): approximate ranks/quantiles over a value domain of
    2^levels in O(levels × depth × width) cells, with DELETES
    subtracting exactly (cells are plain sums — the same turnstile
    property the flat CMS has and HLL lacks), and the one-sided
    guarantee (estimated rank >= true rank) preserved because every
    node estimate is one-sided.

    ``value`` is a Column expression (the caller owns the integer
    encoding; values MUST lie in [0, 2^levels)). Per cycle the
    maintenance is one O(feed × levels × depth) signed delta
    aggregation merged into the cell frame — never a base rescan.
    Returns ``(lvl, d, bucket, cnt)`` cells (feed back as
    ``old_cells``). ``group_cols`` maintains one INDEPENDENT sketch
    per group (cells keyed group + (lvl, d, bucket)) — the
    per-language length-quantile shape curation caps need; state is
    O(groups × levels × depth × width), still corpus-size-free.
    Serve rank estimates by decomposing [0, x) into
    its ≤``levels`` dyadic nodes and summing min-over-d cell reads
    (absent cells read 0). Rank probes must also lie in
    [0, 2^levels): x = 2^levels would need the level-``levels`` root
    node, which is deliberately not maintained (total count is the
    trivial n-view's job, not a sketch read)."""
    lvls = F.array(*[F.lit(v).cast("long") for v in range(levels)])
    ds = F.array(*[F.lit(d).cast("long") for d in range(depth)])

    # Loud domain guard: a value outside [0, 2^levels) would fold
    # into nonsense nodes (negative floors, phantom high nodes) and
    # silently corrupt every rank read that follows — raise with the
    # offending value instead (the _norm dim-guard rule).
    dom = F.lit(1 << levels).cast("long")
    guarded = F.when(
        (value.cast("long") >= 0) & (value.cast("long") < dom),
        value.cast("long"),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "maintain_dyadic_cms: value %s outside [0, "
                + str(1 << levels)
                + ") — the caller owns the integer encoding",
                value.cast("string"),
            )
        )
    )

    gcols = list(group_cols or [])

    def cells_of(df, sign_col):
        return (
            df.select(
                *gcols,
                guarded.alias("_v"),
                sign_col.alias("_s"),
            )
            .select(*gcols, "_v", "_s", F.explode(lvls).alias("lvl"))
            .select(
                *gcols,
                "lvl",
                "_s",
                F.floor(
                    F.col("_v") / F.pow(F.lit(2), F.col("lvl"))
                ).cast("long").alias("_node"),
            )
            .select(*gcols, "lvl", "_s", "_node", F.explode(ds).alias("d"))
            .select(
                *gcols,
                "lvl",
                "d",
                dyadic_bucket(F.col("lvl"), F.col("d"), F.col("_node"), width)
                .alias("bucket"),
                "_s",
            )
            .groupBy(*gcols, "lvl", "d", "bucket")
            .agg(F.sum("_s").alias("_dc"))
        )

    keys = [*gcols, "lvl", "d", "bucket"]
    if old_cells is not None:
        old = old_cells.select(*keys, F.col("cnt").alias("_c0"))
    else:
        old = cells_of(
            store.read(version=v_from), F.lit(1)
        ).select(*keys, F.col("_dc").alias("_c0"))
    feed = store.read_changes(v_from, v_to, update_images="both")
    sign = F.when(
        F.col("_change").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    delta = cells_of(feed, sign)
    # NULL-safe key pairing: a NULL stratum is one group (SQL GROUP
    # BY semantics) — a plain list-key join would leave its old and
    # delta cells UNMATCHED on both outer sides, splitting the
    # stratum into partial-count duplicate rows (lvl/d/bucket are
    # never null; only caller group columns can be).
    o, dl = old.alias("o"), delta.alias("dl")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"o.{k}").eqNullSafe(F.col(f"dl.{k}")) for k in keys],
    )
    return (
        o.join(dl, cond, "full_outer")
        .select(
            *[
                F.coalesce(F.col(f"o.{k}"), F.col(f"dl.{k}")).alias(k)
                for k in keys
            ],
            (F.coalesce("_c0", F.lit(0)) + F.coalesce("_dc", F.lit(0)))
            .cast("long")
            .alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )


def dyadic_rank_probe(
    cells: DataFrame,
    probes: DataFrame,
    *,
    levels: int,
    depth: int,
    width: int,
    group_cols: list[str] | None = None,
    probe_col: str = "x",
    out_col: str = "est_rank",
    broadcast_cells: bool = False,
    _skip_restore: bool = False,
) -> DataFrame:
    """EXECUTOR-SIDE rank serving over a maintained dyadic-CMS cell
    frame (r13 verdict #2): :func:`dyadic_cells_dict` +
    :func:`dyadic_rank` collect the cells to a driver dict — right
    for ONE sketch (KBs), wrong for the grouped form at
    high-cardinality strata (10⁴ domains × levels × depth × width
    rows). This serves any number of (group, probe) rank reads as a
    DataFrame plan instead: decompose each probe x into the ≤levels
    dyadic nodes of [0, x) (explode + bit test — no UDF), join the
    node/depth/bucket triples against the cells frame (absent cell =
    0 via left join), min over depth per node, sum per probe.

    ``probes`` carries ``group_cols + [probe_col]`` plus any
    pass-through columns; one output row per input probe row, with
    ``out_col`` appended (0 for probes whose decomposition matches no
    cells — including x = 0, whose decomposition is empty). Probes
    must lie in [0, 2^levels); the level-``levels`` root is not
    maintained (same contract as :func:`dyadic_rank` — but no raise
    here: an out-of-domain probe reads 0, callers own the domain).
    Group keys pair NULL-SAFELY (a NULL stratum is one SQL group,
    same rule as the maintainer). 100 TB: the join shuffles
    O(probes × levels × depth) rows against a corpus-size-free cell
    frame — no driver materialization anywhere. ``broadcast_cells``
    hints the cells onto the build side (the outer probe side cannot
    be) — right for the single-sketch / few-strata regimes where
    cells are KBs; leave False when strata count makes the cell
    frame executor-memory-sized."""
    gcols = list(group_cols or [])
    lvls = F.sequence(F.lit(0), F.lit(levels - 1))
    ds = F.array(*[F.lit(d).cast("long") for d in range(depth)])
    two_b = F.pow(F.lit(2.0), F.col("_b"))
    x = F.col(probe_col)
    pcols = probes.columns
    nodes = (
        probes.select(*pcols, F.explode(lvls).alias("_b"))
        .select(*pcols, F.col("_b").cast("long").alias("_b"))
        .filter((F.floor(x / two_b) % 2) == 1)
        .select(
            *pcols,
            "_b",
            (F.floor(x / (two_b * 2)) * 2).cast("long").alias("_node"),
        )
    )
    if broadcast_cells:
        # Broadcast regime: the min-over-depth needs no shuffle — join
        # the node frame (no depth explode) against each depth's cell
        # slice as ``depth`` broadcast left joins and take least() of
        # the per-depth reads row-locally. One shuffle per rank pass
        # (the final sum) instead of two; the descent loop multiplies
        # the saving by ``levels``.
        reads = []
        for dd in range(depth):
            cd = F.broadcast(
                cells.filter(F.col("d") == dd).select(
                    *[F.col(g).alias(f"_cg{dd}_{g}") for g in gcols],
                    F.col("lvl").alias(f"_cl{dd}"),
                    F.col("bucket").alias(f"_cb{dd}"),
                    F.col("cnt").alias(f"_cc{dd}"),
                )
            )
            cond_d = (F.col("_b") == F.col(f"_cl{dd}")) & (
                dyadic_bucket(
                    F.col("_b"), F.lit(dd).cast("long"), F.col("_node"), width
                )
                == F.col(f"_cb{dd}")
            )
            for g in gcols:
                cond_d = cond_d & F.col(g).eqNullSafe(F.col(f"_cg{dd}_{g}"))
            nodes = nodes.join(cd, cond_d, "left")
            reads.append(F.coalesce(F.col(f"_cc{dd}"), F.lit(0)))
        est = (
            nodes.withColumn("_nc", F.least(*reads))
            .groupBy(*pcols)
            .agg(F.sum("_nc").cast("long").alias(out_col))
        )
    else:
        decomp = nodes.select(
            *pcols, "_b", "_node", F.explode(ds).alias("_d")
        ).withColumn(
            "_bucket",
            dyadic_bucket(F.col("_b"), F.col("_d"), F.col("_node"), width),
        )
        c = cells.select(
            *[F.col(g).alias(f"_cg_{g}") for g in gcols],
            F.col("lvl").alias("_cl"),
            F.col("d").alias("_cd"),
            F.col("bucket").alias("_cb"),
            F.col("cnt").alias("_cc"),
        )
        cond = (
            (F.col("_b") == F.col("_cl"))
            & (F.col("_d") == F.col("_cd"))
            & (F.col("_bucket") == F.col("_cb"))
        )
        for g in gcols:
            cond = cond & F.col(g).eqNullSafe(F.col(f"_cg_{g}"))
        node_est = (
            decomp.join(c, cond, "left")
            .groupBy(*pcols, "_b", "_node")
            .agg(F.min(F.coalesce(F.col("_cc"), F.lit(0))).alias("_nc"))
        )
        est = node_est.groupBy(*pcols).agg(
            F.sum("_nc").cast("long").alias(out_col)
        )
    # Fast path for loop callers (the quantile descent): when every
    # probe is guaranteed in [1, 2^levels) its decomposition is
    # non-empty and the left join above preserves it, so ``est``
    # already has one row per probe — the restore join below is a
    # per-round tax the descent runs ``levels`` times.
    if _skip_restore:
        return est
    # Restore probes the decomposition dropped entirely (x = 0): one
    # row per input probe row, rank 0.
    back = reduce(
        lambda a, b: a & b,
        [F.col(f"p.{c_}").eqNullSafe(F.col(f"e.{c_}")) for c_ in pcols],
    )
    return (
        probes.alias("p")
        .join(est.alias("e"), back, "left")
        .select(
            *[F.col(f"p.{c_}").alias(c_) for c_ in pcols],
            F.coalesce(F.col(f"e.{out_col}"), F.lit(0))
            .cast("long")
            .alias(out_col),
        )
    )


def dyadic_quantile_serve(
    cells: DataFrame,
    totals: DataFrame,
    q: float,
    *,
    levels: int,
    depth: int,
    width: int,
    group_cols: list[str] | None = None,
    n_col: str = "n",
    out_col: str = "qhat",
    broadcast_cells: bool = False,
    arity: int = 2,
) -> DataFrame:
    """DISTRIBUTED per-group quantile serving (r13 verdict #2): the
    binary search :func:`dyadic_quantile` runs driver-side per sketch
    becomes ``levels`` chained DataFrame rounds over ALL groups at
    once — each round serves every group's rank(mid+1) via ONE
    :func:`dyadic_rank_probe` pass and halves every group's [lo, hi]
    interval together, so 10⁴ strata cost the same round count as
    one. Lineage is localCheckpoint-truncated per round (the
    connected-components hygiene), keeping round k's plan O(1).

    ``totals`` carries ``group_cols + [n_col]`` (the trivial
    maintained n-view's job — the sketch deliberately does not carry
    totals); groups with n <= 0 are dropped. Returns one row per
    group: ``group_cols + [out_col]``, the estimated q-quantile.
    Same one-sided semantics as :func:`dyadic_quantile`: rank
    estimates are >= true, so ``out_col`` is biased LOW relative to
    the exact quantile — the conservative direction for curation
    cuts. A group converges when lo == hi; later rounds hold it
    fixed (the guard also keeps the probe domain inside
    [1, 2^levels), where the root read x = 2^levels would
    misread 0).

    ``arity``: the search branches ``arity``-ways per round —
    ``arity - 1`` evenly-spaced probes split every open interval, so
    round count drops from ``levels`` (binary) to
    ``ceil(log_arity(2^levels))`` at the price of (arity - 1)× probe
    rows per round. Probe rows are O(groups) and rounds are JOBS
    (each pays scheduling + codegen + a checkpoint), so a wider fan
    is the right trade when rounds dominate: arity=8 serves a 2^12
    domain in 4 rounds. CAVEAT — the returned VALUE depends on the
    probe path: CMS rank estimates are one-sided but NOT monotone in
    x (per-node collision noise differs between decompositions), so
    different arities can legitimately land on different — equally
    valid — estimates. arity=2 reproduces :func:`dyadic_quantile`'s
    binary probes byte-for-byte (the default, and what its oracle
    twins pin); any arity preserves the ONE-SIDED guarantee, because
    a probe at or above the exact quantile can never fail (true rank
    is monotone and est >= true), so the final lo can never be
    pushed above it."""
    if not 0 < q <= 1:
        raise ValueError(f"dyadic_quantile_serve: q={q} outside (0, 1]")
    if arity < 2:
        raise ValueError(f"dyadic_quantile_serve: arity={arity} < 2")
    gcols = list(group_cols or [])
    # The cells frame is typically a MAINTENANCE PLAN (full-outer
    # delta merge over store reads); every descent round joins
    # against it, so truncate its lineage once here. EAGER
    # (optimization round r14): with a lazy checkpoint the rounds'
    # broadcast exchanges are independent subtrees that all build at
    # job submit and RACE-compute the maintenance plan — the sketch
    # was maintained once per round, not once per serve (the same
    # measured failure mode as recall_against's lazy truth). One
    # O(cells) job here; every round then reads blocks.
    cells = cells.transform(ckpt_shared)
    state = totals.filter(F.col(n_col) > 0).select(
        *gcols,
        F.ceil(F.lit(float(q)) * F.col(n_col)).cast("long").alias("_t"),
        F.lit(0).cast("long").alias("_lo"),
        F.lit((1 << levels) - 1).cast("long").alias("_hi"),
    )
    # Rounds to certain convergence: interval length L shrinks to at
    # most ceil(L / arity) per round — probes sit at
    # lo - 1 + ceil(L*i/arity), the ceil-split that bounds EVERY
    # surviving segment by ceil(L/arity) (the floor-split leaves a
    # floor(L/arity)+1 first segment and needs an extra round; at
    # arity=2 the ceil-split is exactly the classical
    # mid=(lo+hi)//2... binary probe).
    rounds, length = 0, 1 << levels
    while length > 1:
        length = -(-length // arity)
        rounds += 1
    cuts = F.array(*[F.lit(i).cast("long") for i in range(1, arity)])
    for rnd in range(1, rounds + 1):
        # arity-1 probes per open interval, each CLAMPED into
        # [1, 2^levels - 1]: an open interval's probes satisfy that
        # already; a CONVERGED group's ranks are ignored by the
        # open-guard below — the clamp only keeps every probe's
        # decomposition non-empty so the rank probe can skip its
        # restore join without dropping the row (skip_restore).
        probed = (
            state.select(
                *gcols, "_t", "_lo", "_hi", F.explode(cuts).alias("_i")
            )
            .withColumn("_len", F.col("_hi") - F.col("_lo") + 1)
            .withColumn(
                "_m",
                F.least(
                    F.col("_lo")
                    - 1
                    + F.floor(
                        (F.col("_len") * F.col("_i") + F.lit(arity - 1))
                        / arity
                    ).cast("long"),
                    F.col("_hi") - 1,
                ),
            )
            .withColumn(
                "_x",
                F.greatest(
                    F.least(F.col("_m") + 1, F.lit((1 << levels) - 1)),
                    F.lit(1),
                ),
            )
        )
        ranked = dyadic_rank_probe(
            cells,
            probed,
            levels=levels,
            depth=depth,
            width=width,
            group_cols=gcols,
            probe_col="_x",
            out_col="_r",
            broadcast_cells=broadcast_cells,
            _skip_restore=True,
        )
        # Fold the probe verdicts back to one row per group: the
        # answer (smallest v with rank(v+1) >= target) lies above
        # every failing probe and at/below every succeeding one.
        upd = ranked.groupBy(*gcols, "_t", "_lo", "_hi").agg(
            F.max(
                F.when(F.col("_r") < F.col("_t"), F.col("_m") + 1)
            ).alias("_nlo"),
            F.min(
                F.when(F.col("_r") >= F.col("_t"), F.col("_m"))
            ).alias("_nhi"),
        )
        open_ = F.col("_lo") < F.col("_hi")
        state = upd.select(
            *gcols,
            "_t",
            F.when(
                open_,
                F.greatest(
                    F.col("_lo"), F.coalesce(F.col("_nlo"), F.col("_lo"))
                ),
            )
            .otherwise(F.col("_lo"))
            .alias("_lo"),
            F.when(
                open_,
                F.least(F.col("_hi"), F.coalesce(F.col("_nhi"), F.col("_hi"))),
            )
            .otherwise(F.col("_hi"))
            .alias("_hi"),
        )
        # Lineage cut every FOURTH round, not every round (optimization
        # round r15 — r14 verdict #5). A per-round lazy checkpoint
        # compiles each round into its OWN plan segment, so the
        # broadcast_cells builds (``depth`` broadcast exchanges per
        # round, each rebuilding a cells slice) can never be shared:
        # the hc serve shipped the ~1.8M-row cell frame 16 times per
        # invocation. Rounds left UNCHECKPOINTED fuse into one compiled
        # plan where ReuseExchange collapses the identical
        # Filter(d=k)-over-checkpoint broadcast builds to ``depth``
        # TOTAL per segment. Cadence 4 (not "never") bounds plan depth
        # for the arity=2 binary descent (12 rounds) — the same
        # plan-O(1) hygiene as before, paid 4x less often. State rows
        # are O(groups); each checkpoint is one narrow job.
        if rnd % 4 == 0 and rnd < rounds:
            state = state.localCheckpoint(eager=False)
    return state.select(*gcols, F.col("_lo").alias(out_col))


def dyadic_cells_dict(cells: DataFrame) -> dict:
    """Collect a maintained dyadic-CMS cell frame into the serving
    dict {(lvl, d, bucket): cnt}. The collect is BOUNDED BY DESIGN —
    at most levels × depth × width rows (KBs), never by data size —
    which is the point of the sketch: rank/quantile serving becomes
    pure driver-side arithmetic over a broadcastable structure."""
    return {(r.lvl, r.d, r.bucket): r.cnt for r in cells.collect()}


def dyadic_rank(
    cells: dict, x: int, *, levels: int, depth: int, width: int
) -> int:
    """Estimated rank of ``x`` — count of values < x — from a
    collected cell dict: sum of min-over-depth CMS reads along the
    dyadic decomposition of [0, x). One-sided (estimate >= true
    rank). ``x`` must lie in [0, 2^levels]; x = 2^levels reads the
    two level-(levels-1) children instead of the unmaintained root."""
    import hashlib

    if not 0 <= x <= (1 << levels):
        raise ValueError(
            f"dyadic_rank: x={x} outside [0, {1 << levels}]"
        )

    def node_read(lvl: int, node: int) -> int:
        per_d = []
        for d in range(depth):
            h = hashlib.md5(
                f"dcms{lvl}:{d}:{node}".encode()
            ).hexdigest()[:8]
            per_d.append(cells.get((lvl, d, int(h, 16) % width), 0))
        return min(per_d)

    if x == (1 << levels):
        top = levels - 1
        return node_read(top, 0) + node_read(top, 1)
    total = 0
    for b in range(levels):
        if (x >> b) & 1:
            total += node_read(b, (x >> (b + 1)) * 2)
    return total


def dyadic_quantile(
    cells: dict, q: float, n: int, *, levels: int, depth: int, width: int
) -> int:
    """Estimated q-quantile from a collected cell dict: the smallest
    value v in [0, 2^levels) whose estimated rank(v+1) reaches
    ceil(q*n) — a binary search of ``levels`` steps, each an
    O(levels × depth) rank read, all driver-side arithmetic. ``n`` is
    the view's total row count (the trivial maintained n-view's job —
    the sketch deliberately does not carry it). Because rank
    estimates are one-sided (>= true), the returned value can only be
    BIASED LOW relative to the exact quantile — the conservative
    direction for length-cap / percentile-band curation cuts."""
    if not 0 < q <= 1:
        raise ValueError(f"dyadic_quantile: q={q} outside (0, 1]")
    if n <= 0:
        raise ValueError("dyadic_quantile: empty view (n <= 0)")
    import math

    target = math.ceil(q * n)
    lo, hi = 0, (1 << levels) - 1  # answer in [lo, hi]
    while lo < hi:
        mid = (lo + hi) // 2
        if (
            dyadic_rank(
                cells, mid + 1, levels=levels, depth=depth, width=width
            )
            >= target
        ):
            hi = mid
        else:
            lo = mid + 1
    return lo


def bm25_postings_of(
    docs: DataFrame, id_col: str, text_col: str, terms: list[str]
) -> DataFrame:
    """Query-term postings of a document frame: one row per
    (doc, query term) with its term frequency and the doc's token
    length — the per-doc state BM25 scoring needs. Tokenization is
    the engine tokenizer (functions.text.tokens), so batch and
    maintained scoring agree by construction."""
    from ..functions.text import tokens

    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("tk")
    ).select("doc_id", "tk", F.size("tk").alias("dl"))
    return (
        toks.select("doc_id", "dl", F.explode("tk").alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def maintain_bm25(
    store,
    v_from: int,
    v_to: int,
    *,
    id_col: str,
    text_col: str,
    terms: list[str],
    old_postings: DataFrame | None = None,
    old_stats: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Maintain the BM25 SERVING STATE of a document store across one
    change window — the incremental twin of the batch
    ``bm25_search_topk`` (r13 verdict #5: the one LLM-pipeline
    operator family that had no maintained form). Two frames:

    - ``postings`` (doc_id, dl, term, tf), QUERY TERMS ONLY — keyed
      by doc: the feed's changed docs have their old postings dropped
      (one anti-join on doc_id) and their post-image postings
      re-derived; untouched docs are never re-tokenized. O(feed)
      per cycle.
    - ``stats`` — the 1-row (n_docs, sum_dl) corpus normalizer,
      maintained as TURNSTILE SUMS (pre-images subtract, post-images
      add — deletes are exact, the same algebra as the flat CMS).
      It covers ALL docs, not just those containing query terms — a
      delete of a term-free doc still moves the length norm, which
      postings alone could never see.

    Feed back both frames to chain windows. First derivation
    (``old_* = None``) runs one full pass over ``v_from``.
    Serve with :func:`bm25_topk` — df is derived from the postings
    per serve (a groupBy over a |terms|-bounded frame), so it can
    never drift from them. 100 TB: maintenance tokenizes only the
    changed docs; state is O(docs containing query terms) + 1 row."""
    from ..functions.text import tokens

    if old_postings is None:
        base = store.read(version=v_from)
        old_postings = bm25_postings_of(base, id_col, text_col, terms)
    if old_stats is None:
        base = store.read(version=v_from)
        old_stats = base.select(
            tokens(F.col(text_col)).alias("tk")
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.coalesce(F.sum(F.size("tk")), F.lit(0))
            .cast("long")
            .alias("sum_dl"),
        )
    feed = store.read_changes(v_from, v_to, update_images="both")
    is_post = F.col("_change").isin("insert", "update_postimage")
    changed = feed.select(F.col(id_col).alias("doc_id")).distinct()
    post_docs = feed.filter(is_post)
    postings = old_postings.join(changed, "doc_id", "anti").unionByName(
        bm25_postings_of(post_docs, id_col, text_col, terms)
    )
    sign = F.when(is_post, F.lit(1)).otherwise(F.lit(-1))
    delta = feed.select(
        sign.alias("_s"), F.size(tokens(F.col(text_col))).alias("_dl")
    ).agg(
        F.coalesce(F.sum("_s"), F.lit(0)).cast("long").alias("_dn"),
        F.coalesce(F.sum(F.col("_s") * F.col("_dl")), F.lit(0))
        .cast("long")
        .alias("_ddl"),
    )
    stats = old_stats.crossJoin(F.broadcast(delta)).select(
        (F.col("n_docs") + F.col("_dn")).cast("long").alias("n_docs"),
        (F.col("sum_dl") + F.col("_ddl")).cast("long").alias("sum_dl"),
    )
    return postings, stats


def bm25_topk(
    postings: DataFrame,
    stats: DataFrame,
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k BM25 scores served from maintained state — the same
    expressions as the batch query (plans/llm_pipeline2.py
    bm25_search_topk), with df derived from the postings (a groupBy
    over a |query terms|-bounded frame, broadcast) so serving can
    never drift from the state it reads. TakeOrdered on the rounded
    (score, doc_id) total order — never a full sort."""
    from ..functions.rounding import stable_round

    df_tbl = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    j = postings.join(F.broadcast(df_tbl), "term").crossJoin(
        F.broadcast(stats)
    )
    idf = F.log(
        1
        + ((F.col("n_docs") - F.col("df")).cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    )
    contrib = (
        idf
        * F.col("tf").cast("double")
        * (k1 + 1)
        / (
            F.col("tf").cast("double")
            + k1
            * (
                1
                - b
                + b
                * F.col("dl").cast("double")
                * F.col("n_docs")
                / F.col("sum_dl")
            )
        )
    )
    scored = j.groupBy("doc_id").agg(
        F.sum(contrib).cast("double").alias("raw")
    )
    rounded = scored.select(
        "doc_id", stable_round(F.col("raw"), 4).alias("bm25")
    )
    return rounded.orderBy(F.col("bm25").desc(), F.col("doc_id")).limit(k)


# ---------------------------------------------------------------------------
# Keyed-slice view maintenance (the general per-key-recompute combinator)
# ---------------------------------------------------------------------------


def maintain_keyed_slices(
    old_view: DataFrame,
    touched_keys: DataFrame,
    by: str,
    recompute,
) -> DataFrame:
    """THE combinator behind every view that is a pure per-key function
    of the base state (as-of joins, sessionization, per-user funnels):

        view' = view ∖ touched  ∪  recompute(touched)

    Untouched keys' rows carry forward VERBATIM (anti-join — no
    recompute, no rescan); touched keys' slices rebuild from post-state
    via ``recompute(touched_keys) -> DataFrame`` (which should
    semi-join the base sides down to the touched slice before its real
    work). Correct for exactly the views where a key's rows depend only
    on same-key base rows — which is also what makes the hard
    incremental cases (delete-induced re-matching in as-of, gap-insert
    session MERGES, delete-induced session SPLITS) fall out for free:
    the slice is recomputed, not patched. Cost: O(view) anti-join +
    O(touched rows) recompute; at 100 TB with feeds touching 0.1% of
    keys, 0.1% of both sides is read (key-bucketed stores prune the
    semi-join to touched buckets)."""
    return old_view.join(touched_keys, [by], "left_anti").unionByName(
        recompute(touched_keys)
    )
