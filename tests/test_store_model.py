"""Randomized model-based test of the SnapshotStore.

Every other store test checks one scenario; this one checks the
ALGEBRA: a seeded random program of merges (upserts + deletions),
overwrites, rollbacks, vacuums and rebuckets is applied in lockstep to
the store and to a pure-Python model (dict + committed-snapshot
history), and after every commit the store must agree with the model
on the full read, on point lookups, on time travel, and on the change
feed between every checked pair of retained versions. Interleaving
bugs (merge-after-rollback, feed-across-rebucket, vacuum eating a
version the feed still needs) live exactly in the sequences humans
don't think to write down — the seeded program writes them for us,
deterministically (no flaky shrinking; a failure reproduces from the
seed)."""

from __future__ import annotations

import random

import pytest

from fs_indexer_elasticsearch_spark.sinks.snapshot import SnapshotStore

KEYS = [f"k{i:02d}" for i in range(24)]  # small space → heavy collisions
SCHEMA = "k string, v int, payload string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _apply_merge(model: dict, batch: list, removed: list) -> None:
    """upsert_newer_wins + key deletions, on the model: strictly newer
    wins, deletions apply after the upsert (merge's left_anti)."""
    for k, v, p in batch:
        cur = model.get(k)
        if cur is None or v > cur[0]:
            model[k] = (v, p)
    for k in removed:
        model.pop(k, None)


def _store_state(store) -> dict:
    return {
        r.k: (r.v, r.payload)
        for r in store.read().select("k", "v", "payload").collect()
    }


def _model_diff(h_from: dict, h_to: dict) -> dict:
    out = {}
    for k in h_to.keys() - h_from.keys():
        out[k] = ("insert", h_to[k])
    for k in h_from.keys() - h_to.keys():
        out[k] = ("delete", h_from[k])
    for k in h_to.keys() & h_from.keys():
        if h_to[k] != h_from[k]:
            out[k] = ("update", h_to[k])
    return out


@pytest.mark.parametrize("layout", ["hardlink", "manifest"])
@pytest.mark.race
def test_two_concurrent_writers_all_commits_land_exactly_once(
    spark, tmp_path, layout
):
    """Optimistic multi-writer: two threads (each with its OWN store
    handle, as two jobs would have) race merge_with_retry on one store.
    Every merge must land EXACTLY once — the loser of each claim race
    rebases and re-applies, never double-applies, never silently drops
    — and the final state is the newer-wins fold of all batches
    (well-defined: every (key, v) pair is globally unique)."""
    import threading

    path = str(tmp_path / "snap")
    SnapshotStore(
        spark, path, key="k", version_col="v", num_buckets=4, layout=layout
    ).overwrite(_df(spark, [(k, 0, "seed") for k in KEYS]))

    N_MERGES = 6
    programs = {}  # writer -> list of batches
    rng = random.Random(13)
    for w, vbase in (("A", 1), ("B", 2)):
        batches = []
        for j in range(N_MERGES):
            ks = rng.sample(KEYS, rng.randint(2, 6))
            v = vbase + 2 * j  # A: odd steps 1,3,..; B: even 2,4,..
            batches.append([(k, v, f"{w}{j}") for k in ks])
        programs[w] = batches

    errors: list[Exception] = []

    def run(writer: str) -> None:
        try:
            store = SnapshotStore(
                spark, path, key="k", version_col="v", num_buckets=4,
                layout=layout,
            )
            for batch in programs[writer]:
                store.merge_with_retry(
                    _df(spark, batch), max_retries=20, backoff_s=0.02
                )
        except Exception as exc:  # noqa: BLE001 — surfaced below
            errors.append(exc)

    threads = [threading.Thread(target=run, args=(w,)) for w in ("A", "B")]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []

    store = SnapshotStore(
        spark, path, key="k", version_col="v", num_buckets=4, layout=layout
    )
    # Exactly once: the seed + one version per merge, no lost commits.
    assert store.current_version() == 1 + 2 * N_MERGES

    model: dict[str, tuple[int, str]] = {k: (0, "seed") for k in KEYS}
    for batches in programs.values():
        for batch in batches:
            _apply_merge(model, batch, [])
    assert _store_state(store) == model


@pytest.mark.parametrize("layout,seed", [("hardlink", 7), ("manifest", 11)])
def test_store_agrees_with_model_under_random_programs(
    spark, tmp_path, layout, seed
):
    rng = random.Random(seed)
    store = SnapshotStore(
        spark,
        str(tmp_path / "snap"),
        key="k",
        version_col="v",
        num_buckets=4,
        layout=layout,
    )
    model: dict[str, tuple[int, str]] = {}
    history: dict[int, dict] = {}  # committed version -> model snapshot

    def commit_snapshot(v: int) -> None:
        history[v] = dict(model)

    ops = ["merge"] * 8 + ["overwrite", "rollback", "vacuum", "rebucket"]
    for step in range(18):
        op = rng.choice(ops)
        if op == "merge":
            ks = rng.sample(KEYS, rng.randint(1, 6))
            batch = [
                (k, rng.randint(1, 9), f"p{rng.randrange(100)}") for k in ks
            ]
            removed = (
                rng.sample(KEYS, rng.randint(0, 2)) if rng.random() < 0.5 else []
            )
            v = store.merge(
                _df(spark, batch),
                removed=(
                    spark.createDataFrame([(k,) for k in removed], "k string")
                    if removed
                    else None
                ),
            )
            _apply_merge(model, batch, removed)
            commit_snapshot(v)
        elif op == "overwrite":
            rows = [
                (k, rng.randint(1, 9), f"p{rng.randrange(100)}")
                for k in rng.sample(KEYS, rng.randint(1, 8))
            ]
            v = store.overwrite(_df(spark, rows))
            model = {k: (vv, p) for k, vv, p in rows}
            commit_snapshot(v)
        elif op == "rollback":
            retained = store.versions()
            if len(retained) < 2:
                continue
            target = rng.choice(retained[:-1])
            store.rollback(target)
            model = dict(history[target])
            for dead in [x for x in history if x > target]:
                del history[dead]
        elif op == "vacuum":
            keep = rng.randint(1, 3)
            for victim in store.vacuum(keep=keep):
                history.pop(victim, None)
        elif op == "rebucket":
            if store.current_version() is None:
                continue
            v = store.rebucket(rng.choice([2, 4, 8]))
            if v is not None:
                commit_snapshot(v)

        # -- invariants after every op --------------------------------
        if store.current_version() is None:
            assert model == {}
            continue
        assert _store_state(store) == model, f"step {step} op {op}"
        probe = rng.sample(KEYS, 4)
        got = {
            r.k: (r.v, r.payload)
            for r in store.read_keys(probe).select("k", "v", "payload").collect()
        }
        assert got == {k: model[k] for k in probe if k in model}, (
            f"step {step} read_keys"
        )
        # versions() must be exactly the model's retained history.
        assert sorted(history) == store.versions(), f"step {step} versions"

        # Time travel + change feed on a random retained pair (every
        # other step — the feed join is the expensive check).
        retained = store.versions()
        if step % 2 == 0 and len(retained) >= 2:
            v_from, v_to = sorted(rng.sample(retained, 2))
            tt = {
                r.k: (r.v, r.payload)
                for r in store.read(version=v_from)
                .select("k", "v", "payload")
                .collect()
            }
            assert tt == history[v_from], f"step {step} time-travel v{v_from}"
            feed = {
                r.k: (r._change, (r.v, r.payload))
                for r in store.read_changes(v_from, v_to).collect()
            }
            assert feed == _model_diff(history[v_from], history[v_to]), (
                f"step {step} feed v{v_from}->v{v_to}"
            )


@pytest.mark.parametrize(
    "layout,seed",
    [("hardlink", 3), pytest.param("manifest", 5, marks=pytest.mark.slow)],
)
def test_feed_survives_vacuumed_intermediate_versions(
    spark, tmp_path, layout, seed
):
    """The degradation contract (r9 verdict #7): when an intermediate
    version VANISHES mid-history — a crash-interrupted vacuum, an
    externally truncated store — the version-path walk can no longer
    prove transitions pure, and read_changes must degrade to a full
    two-version diff that is still HASH-IDENTICAL to the true delta
    (correct, just slower), for every retained endpoint pair.

    The program builds a seeded random history with a REBUCKET in the
    middle, then removes one random intermediate version's artifacts
    per probe round (manifest file / version dir — exactly what a
    partial vacuum leaves). Removing the rebucket commit itself severs
    the provenance chain (counts differ across the gap, no
    rebucket_from match -> the honest full-diff path); removing a
    plain merge leaves a same-count gap the metadata diff still
    resolves exactly. Both must agree with the model."""
    import os
    import shutil

    rng = random.Random(seed)
    store = SnapshotStore(
        spark,
        str(tmp_path / "snap"),
        key="k",
        version_col="v",
        num_buckets=4,
        layout=layout,
    )
    model: dict[str, tuple[int, str]] = {}
    history: dict[int, dict] = {}

    def commit_merge(step: int) -> None:
        ks = rng.sample(KEYS, rng.randint(2, 6))
        batch = [(k, step, f"p{rng.randrange(100)}") for k in ks]
        removed = rng.sample(KEYS, rng.randint(0, 2))
        v = store.merge(
            _df(spark, batch),
            removed=spark.createDataFrame([(k,) for k in removed], "k string")
            if removed
            else None,
        )
        _apply_merge(model, batch, removed)
        history[v] = dict(model)

    v = store.overwrite(_df(spark, [(k, 0, "seed") for k in KEYS[:12]]))
    model = {k: (0, "seed") for k in KEYS[:12]}
    history[v] = dict(model)
    for step in range(1, 4):
        commit_merge(step)
    rb = store.rebucket(8)
    history[rb] = dict(model)
    for step in range(4, 7):
        commit_merge(step)

    def drop_version(victim: int) -> None:
        if layout == "manifest":
            os.remove(store._manifest_path(victim))
        else:
            shutil.rmtree(store._version_dir(victim))
        history.pop(victim, None)

    # Round 1: drop the REBUCKET commit itself — the provenance chain
    # breaks and every window spanning the gap must take the full-diff
    # path. Round 2: drop another random intermediate (same-count gap).
    retained = store.versions()
    drop_version(rb)
    # The degradation branch must actually engage: across the gap the
    # counts differ and no surviving cfg carries the provenance tag,
    # so the walk returns None (-> full diff), not a pruned group set.
    assert store._changed_bucket_groups(rb - 1, rb + 1) is None
    for _ in range(2):
        retained = store.versions()
        assert sorted(history) == retained
        for v_from in retained[:-1]:
            for v_to in retained[retained.index(v_from) + 1 :]:
                feed = {
                    r.k: (r._change, (r.v, r.payload))
                    for r in store.read_changes(v_from, v_to).collect()
                }
                assert feed == _model_diff(history[v_from], history[v_to]), (
                    f"feed v{v_from}->v{v_to} after dropping intermediates"
                )
        drop_version(rng.choice(retained[1:-1]))
