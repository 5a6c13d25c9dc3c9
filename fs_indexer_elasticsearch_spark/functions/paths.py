"""Path-derived column expressions.

Reference parity:
 - extension:   scanner.py:166 (lower-cased suffix without dot)
 - basename:    scanner.py:187
 - prefix strip: scanner.py:168-183 (mount-point / root-path removal)
 - glob skip:   scanner.py:71-97 (fnmatch on whole path and each component)
 - format_size: utils/size_formatter.py:1-25 (duplicated 4× in the
   reference; here it is one expression)
 - ancestors:   replaces BOTH the ES path_hierarchy tokenizer
   (elasticsearch_integration.py:52-63) and the O(files×dirs)
   prefix-LIKE rollup join (elasticsearch_integration.py:325-348) —
   one array column serves path search and the directory rollup.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def basename(path: Column | str) -> Column:
    """Last path component (scanner.py:187)."""
    return F.substring_index(_c(path), "/", -1)


def extension(name: Column | str) -> Column:
    """Lower-cased extension without the dot; '' when none or dotfile
    (scanner.py:166: ``splitext(name)[1].lstrip('.').lower()``).

    os.path.splitext gives '' for dotfiles like '.bashrc' — the regex
    requires at least one char before the final dot to match that.
    """
    return F.lower(F.regexp_extract(_c(name), r"[^/.].*\.([^./]+)$", 1))


def is_hidden(name: Column | str) -> Column:
    """Hidden-entry predicate (scanner.py:132,338-339)."""
    return _c(name).startswith(".")


def relative_to(path: Column | str, root: str) -> Column:
    """Strip a mount-point/root prefix, keeping a leading '/'
    (scanner.py:168-183).

    The prefix match is anchored at a path-COMPONENT boundary
    (lookahead for '/' or end): a bare string-prefix strip would
    corrupt sibling paths that share the root as a character prefix —
    root='/mnt/data' must leave '/mnt/database/x.txt' untouched, not
    mangle it to 'base/x.txt' (wrong relative path → wrong sha256
    entry_id for a file that is not even under the root)."""
    root = root.rstrip("/")
    quoted = re.escape(root)
    out = F.regexp_replace(_c(path), f"^{quoted}(?=/|$)", "")
    return F.when(out == "", F.lit("/")).otherwise(out)


def path_depth(path: Column | str) -> Column:
    """Number of components in a '/'-separated path."""
    p = _c(path)
    return F.size(F.filter(F.split(p, "/"), lambda x: x != ""))


def ancestors(path: Column | str, include_self: bool = False) -> Column:
    """Array of every ancestor directory of ``path`` ('/a/b/c.txt' →
    ['/a', '/a/b']); with ``include_self`` the path itself is appended.

    This is the linear-scale replacement for the reference's quadratic
    prefix-LIKE containment join: explode(ancestors) + hash agg shuffles
    O(rows×depth) instead of comparing O(files×dirs) pairs.
    """
    p = _c(path)
    parts = F.filter(F.split(p, "/"), lambda x: x != "")
    n = F.size(parts)
    upto = n if include_self else n - 1
    idx = F.sequence(F.lit(1), upto)
    arr = F.transform(
        idx,
        lambda i: F.concat(F.lit("/"), F.array_join(F.slice(parts, 1, i), "/")),
    )
    # sequence(1, 0) yields [1, 0] (descending) rather than empty; guard.
    return F.when(upto >= 1, arr).otherwise(F.array().cast("array<string>"))


def glob_to_regex(glob: str) -> str:
    """Compile one shell glob to an anchored Java regex ('*' does not
    cross '/'; '**' does). Mirrors fnmatch semantics used by the
    reference's skip_patterns (scanner.py:87-94)."""
    out, i = [], 0
    while i < len(glob):
        ch = glob[i]
        if ch == "*":
            if glob[i : i + 2] == "**":
                out.append(".*")
                i += 2
                continue
            out.append("[^/]*")
        elif ch == "?":
            out.append("[^/]")
        elif ch == "[":
            # Mirror fnmatch.translate's bracket scan: a ']' appearing
            # FIRST in the class (optionally after '!') is a literal
            # member, not the terminator; an unclosed '[' is a literal
            # '[' (scanner.py:87-94 semantics via fnmatch).
            n = len(glob)
            j = i + 1
            if j < n and glob[j] == "!":
                j += 1
            if j < n and glob[j] == "]":
                j += 1
            while j < n and glob[j] != "]":
                j += 1
            if j >= n:
                out.append("\\[")
            else:
                stuff = glob[i + 1 : j]
                i = j
                neg = stuff.startswith("!")
                if neg:
                    stuff = stuff[1:]
                # Escape chars whose in-class meaning differs between
                # regex dialects (Java rlike vs python re); keep '-'
                # so ranges like [a-z] survive.
                stuff = (
                    stuff.replace("\\", "\\\\")
                    .replace("]", "\\]")
                    .replace("[", "\\[")
                )
                if stuff.startswith("^"):
                    stuff = "\\" + stuff
                if neg:
                    # Negated classes also exclude '/': classes match
                    # one path-component char, consistent with '*'.
                    # A leading '-' in the body would sit right after
                    # the injected '/' and form an unintended
                    # '/'-to-<char> range ([!-a] → [^/-a] matches
                    # neither digits nor ':'); escape it.
                    if stuff.startswith("-"):
                        stuff = "\\" + stuff
                    out.append(f"[^/{stuff}]")
                else:
                    out.append(f"[{stuff}]")
        else:
            out.append(re.escape(ch))
        i += 1
    return "^" + "".join(out) + "$"


def skip_filter(path: Column | str, patterns: list[str]) -> Column:
    """True for rows that survive the skip patterns — the reference
    checks the full path AND every individual component against each
    glob (scanner.py:71-97, duplicated at lucidlink_api.py:467-483 and
    direct_links.py:104-107).

    Compiled to ONE alternation regex applied to the path and, for
    component matches, via ``exists`` over split components — all
    JVM-side, usable as a pushed-down scan predicate.
    """
    if not patterns:
        return F.lit(True)
    p = _c(path)
    rx = "|".join(f"(?:{glob_to_regex(g)[1:-1]})" for g in patterns)
    full = p.rlike(f"^(?:{rx})$")
    comp = F.exists(
        F.filter(F.split(p, "/"), lambda x: x != ""),
        lambda x: x.rlike(f"^(?:{rx})$"),
    )
    return ~(full | comp)


_UNITS = ["B", "KB", "MB", "GB", "TB", "PB"]


def format_size(size_bytes: Column | str) -> Column:
    """Human-readable size string, e.g. 1536 → '1.5 KB'
    (utils/size_formatter.py:1-25: divide by 1024 until < 1024, one
    decimal place). Pure CASE ladder — no UDF."""
    s = _c(size_bytes).cast("double")
    cases = []
    for i, unit in enumerate(_UNITS):
        bound = 1024.0 ** (i + 1)
        div = 1024.0**i
        cases.append((bound, div, unit))
    # format_string("%.1f"), NOT format_number: the latter inserts
    # thousands separators ("1,020.0 B" for sizes in [1000, 1024)),
    # which DuckDB's printf never does. The +1e-7 shifts exact-half
    # ties (e.g. 196864 B = 192.25 KB) off the knife edge where Java's
    # HALF_UP and C's half-even disagree — oracle SQL twins add the
    # same epsilon (stable_round convention).
    eps = F.lit(1e-7)
    result = F.when(s.isNull(), F.lit(None).cast("string"))
    for bound, div, unit in cases[:-1]:
        result = result.when(
            s < bound,
            F.concat(F.format_string("%.1f", s / div + eps), F.lit(" " + unit)),
        )
    _, div, unit = cases[-1]
    result = result.otherwise(
        F.concat(F.format_string("%.1f", s / div + eps), F.lit(" " + unit))
    )
    return result
