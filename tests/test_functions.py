"""Scalar expression library vs known-good values (the reference's
exact-schema/value assertion style, test_parallel_scanner.py:64-77)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from fs_indexer_elasticsearch_spark.functions import (
    ancestors,
    basename,
    entry_id,
    extension,
    find_ls_timestamp,
    format_size,
    glob_to_regex,
    is_hidden,
    path_depth,
    relative_to,
    skip_filter,
)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


@pytest.mark.parametrize(
    ("path", "expected"),
    [
        ("/a/b/c.txt", "c.txt"),
        ("file.tar.gz", "file.tar.gz"),
        ("/a/dir name/f f.txt", "f f.txt"),
    ],
)
def test_basename(spark, path, expected):
    assert one(spark, basename(F.lit(path))) == expected


@pytest.mark.parametrize(
    ("name", "expected"),
    [
        ("report.PDF", "pdf"),
        ("archive.tar.gz", "gz"),
        (".bashrc", ""),  # dotfile: no extension (os.path.splitext parity)
        ("noext", ""),
        ("weird.", ""),
    ],
)
def test_extension(spark, name, expected):
    assert one(spark, extension(F.lit(name))) == expected


def test_entry_id_is_sha256(spark):
    import hashlib

    assert one(spark, entry_id(F.lit("/a/b.txt"))) == hashlib.sha256(
        b"/a/b.txt"
    ).hexdigest()


def test_ancestors(spark):
    assert one(spark, ancestors(F.lit("/a/b/c.txt"))) == ["/a", "/a/b"]
    assert one(spark, ancestors(F.lit("/a/b"), include_self=True)) == ["/a", "/a/b"]
    assert one(spark, ancestors(F.lit("/top"))) == []


def test_path_depth_and_hidden(spark):
    assert one(spark, path_depth(F.lit("/a/b/c"))) == 3
    assert one(spark, is_hidden(F.lit(".git"))) is True
    assert one(spark, is_hidden(F.lit("src"))) is False


def test_relative_to(spark):
    assert one(spark, relative_to(F.lit("/mnt/fs/a/b"), "/mnt/fs")) == "/a/b"
    assert one(spark, relative_to(F.lit("/mnt/fs"), "/mnt/fs")) == "/"


@pytest.mark.parametrize(
    ("n", "expected"),
    [
        (512, "512.0 B"),
        (1536, "1.5 KB"),
        (1048576, "1.0 MB"),
        (3 * 1024**3, "3.0 GB"),
        (None, None),
    ],
)
def test_format_size(spark, n, expected):
    col = format_size(F.lit(n).cast("long"))
    assert one(spark, col) == expected


def test_glob_to_regex_semantics():
    import re

    assert re.match(glob_to_regex("*.tmp"), "x.tmp")
    assert not re.match(glob_to_regex("*.tmp"), "a/x.tmp")  # * doesn't cross /
    assert re.match(glob_to_regex("**/*.tmp"), "a/b/x.tmp")
    assert re.match(glob_to_regex("file?.txt"), "file1.txt")
    assert not re.match(glob_to_regex("file?.txt"), "file12.txt")


def test_glob_negated_class_leading_dash():
    # [!-a] excludes exactly '-' and 'a' (and '/'); a leading '-' in
    # the class body must NOT fuse with the injected '/' into a
    # '/'-to-'a' range (which would wrongly exclude digits and ':').
    import re

    rx = glob_to_regex("[!-a]")
    for ch in "b1:Z.":
        assert re.fullmatch(rx, ch), ch
    for ch in "-a/":
        assert not re.fullmatch(rx, ch), ch
    # Unnegated leading '-' stays literal.
    rx2 = glob_to_regex("[-a]")
    assert re.fullmatch(rx2, "-") and re.fullmatch(rx2, "a")
    assert not re.fullmatch(rx2, "b")


def test_skip_filter_matches_reference_fnmatch(spark):
    # Reference semantics (scanner.py:71-97): drop when the whole path
    # OR any component matches a glob.
    rows = [
        ("/src/app.py", True),
        ("/src/.git/config", False),  # component match
        ("/node_modules/x.js", False),
        ("/data/file.tmp", False),  # *.tmp component
        ("/data/file.txt", True),
    ]
    df = spark.createDataFrame([(p,) for p, _ in rows], "path string")
    keep = df.filter(
        skip_filter(F.col("path"), [".git", "node_modules", "*.tmp"])
    )
    kept = {r.path for r in keep.collect()}
    assert kept == {p for p, ok in rows if ok}


def test_find_ls_timestamp_two_formats(spark):
    now = F.lit("2026-08-13 12:00:00").cast("timestamp")
    # Old format: explicit year.
    assert str(one(spark, find_ls_timestamp(F.lit("Mar 15 2019"), now=now))) == (
        "2019-03-15 00:00:00"
    )
    # Recent format: resolved against current year.
    assert str(one(spark, find_ls_timestamp(F.lit("Mar 15 10:30"), now=now))) == (
        "2026-03-15 10:30:00"
    )
    # Future-looking date rolls back one year (scanner.py:155-156).
    assert str(one(spark, find_ls_timestamp(F.lit("Dec 25 10:30"), now=now))) == (
        "2025-12-25 10:30:00"
    )


def test_ns_epoch_to_timestamp_exact(spark):
    from fs_indexer_elasticsearch_spark.functions import ns_epoch_to_timestamp

    # 1.7e18 ns exceeds double's 2^53 exact range — the conversion must
    # not drift by a microsecond.
    ns = 1700000000123456789
    got = one(spark, ns_epoch_to_timestamp(F.lit(ns)))
    assert got.strftime("%Y-%m-%d %H:%M:%S.%f") == "2023-11-14 22:13:20.123456"


def test_iso_format(spark):
    from fs_indexer_elasticsearch_spark.functions import iso_format

    got = one(spark, iso_format(F.lit("2024-03-01 10:20:30").cast("timestamp")))
    assert got == "2024-03-01T10:20:30"


def test_entry_id_sized(spark):
    import hashlib

    from fs_indexer_elasticsearch_spark.functions import entry_id_sized

    got = one(
        spark,
        entry_id_sized(
            F.lit("/a/b.txt"),
            F.lit(123).cast("long"),
            F.lit("2024-01-02 03:04:05.000001").cast("timestamp"),
        ),
    )
    expect = hashlib.sha256(b"/a/b.txt:123:2024-01-02T03:04:05.000001").hexdigest()
    assert got == expect


def test_format_size_tb_branch(spark):
    from fs_indexer_elasticsearch_spark.functions import format_size

    assert one(spark, format_size(F.lit(3 * 1024**4).cast("long"))) == "3.0 TB"
    assert one(spark, format_size(F.lit(2 * 1024**5).cast("long"))) == "2.0 PB"


def test_find_ls_timestamp_space_padded_days(spark):
    """`find -ls` pads single-digit days to two chars ('Jun  3 04:22',
    'May  9 2020'); the 'MMM d' patterns need one space, so without
    whitespace squeezing ~a third of real dates parsed to NULL — and a
    NULL modified_time is 'never newer' to upsert_newer_wins."""
    from fs_indexer_elasticsearch_spark.functions.timeparse import (
        find_ls_timestamp,
    )

    df = spark.createDataFrame(
        [("Jun  3 04:22",), ("May  9 2020",), ("Jun 13 04:22",), ("May 19 2020",)],
        "raw string",
    )
    now = F.lit("2021-01-01 00:00:00").cast("timestamp")
    got = df.select(find_ls_timestamp(F.col("raw"), now=now).alias("ts")).collect()
    assert all(r.ts is not None for r in got), got
    assert got[1].ts.year == 2020 and got[1].ts.day == 9
    assert got[0].ts.day == 3


def test_relative_to_requires_component_boundary(spark):
    """root='/mnt/data' must not string-prefix-strip sibling paths like
    '/mnt/database/x' (that yielded 'base/x' — a wrong relative path
    and thus a wrong sha256 entry id for a file outside the root)."""
    from fs_indexer_elasticsearch_spark.functions.paths import relative_to

    df = spark.createDataFrame(
        [("/mnt/data/a/b.txt",), ("/mnt/database/x.txt",), ("/mnt/data",)],
        "p string",
    )
    got = [r.rel for r in df.select(relative_to(F.col("p"), "/mnt/data").alias("rel")).collect()]
    assert got == ["/a/b.txt", "/mnt/database/x.txt", "/"]


def test_md5_shard_uses_32_bit_word(spark):
    """One md5 byte caps useful shard counts at 256 (shards 256+ stay
    permanently empty for the export sink); the 32-bit word populates
    any practical n_shards."""
    from fs_indexer_elasticsearch_spark.functions.hashing import md5_shard

    df = spark.range(4000).select(F.col("id").alias("k"))
    shards = {
        r.s for r in df.select(md5_shard(F.col("k"), 512).alias("s")).collect()
    }
    assert max(shards) >= 256  # upper half actually reachable
    assert min(shards) >= 0 and max(shards) < 512
    assert len(shards) > 400  # densely populated


def test_composite_id_injective(spark):
    """composite_id must keep DISTINCT key tuples on distinct ids —
    the naive concat_ws(':') collides ('a:b','c') with ('a','b:c')
    and, because concat_ws drops NULLs, ('a', NULL) with ('a','') or
    bare 'a'. Covers separator injection, backslash escapes, the NULL
    token, and a real value that spells the NULL token."""
    from fs_indexer_elasticsearch_spark.functions import composite_id

    tuples = [
        ("a:b", "c"),
        ("a", "b:c"),
        ("a", None),
        (None, "a"),
        ("a", ""),
        ("", "a"),
        ("a", "\\N"),
        ("a", "N"),
        ("a\\", ":b"),
        ("a", "\\:b"),
        ("a\\:b", ""),
        ("p2", "d0"),
    ]
    df = spark.createDataFrame(tuples, "k1 string, k2 string")
    ids = [
        r.id
        for r in df.select(
            composite_id(["k1", "k2"]).alias("id")
        ).collect()
    ]
    assert len(set(ids)) == len(tuples), sorted(ids)
    # Clean values keep the historical readable encoding.
    plain = dict(zip(tuples, ids))
    assert plain[("p2", "d0")] == "p2:d0"
