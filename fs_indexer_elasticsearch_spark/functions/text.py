"""Text-analysis column expressions for the LLM-data pipeline layer.

All builders are deterministic, engine-portable (the DuckDB oracle
reproduces each via string/list lambdas), and UDF-free.

Design notes for 100 TB:
 - everything is per-row columnar work (no shuffle); tokenization and
   hashing run inside whole-stage codegen.
 - md5 is used as the portable hash (byte-identical in Spark and
   DuckDB); the per-permutation MinHash trick is ``min(md5(i:shingle))``
   over the shingle set — string min is a valid permutation surrogate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

TOKEN_PATTERN = "[^a-z0-9]+"

# Small English stopword list for quality scoring / lang-id heuristics.
EN_STOPWORDS = (
    "the a an and or of to in is are was for on with as by at it this that be from".split()
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: DuckDB oracle twin of :func:`tokens` — built FROM ``TOKEN_PATTERN``
#: so the Spark tokenizer and every oracle that imports this stay in
#: lockstep. (Inline copies of this fragment inside long oracle
#: strings are pinned mechanically by
#: tests/test_plans.py::test_every_oracle_token_split_matches_engine.)
TOKS_SQL = (
    f"list_filter(regexp_split_to_array(lower(text), '{TOKEN_PATTERN}'), "
    "x -> x <> '')"
)


def tokens(text: Column | str) -> Column:
    """Lower-cased word tokens (alnum runs)."""
    return F.filter(F.split(F.lower(_c(text)), TOKEN_PATTERN), lambda x: x != "")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def distinct_tokens(text: Column | str) -> Column:
    return F.array_distinct(tokens(text))


def _shingle_at(toks: Column, i: Column, n: int) -> Column:
    """The n tokens starting at 1-based position ``i``, space-joined —
    the single definition of shingle text shared by word_shingles,
    positional_word_shingles, and rolling_fingerprint (r7 review
    finding: three byte-identical copies of this closure)."""
    pieces = []
    for k in range(n):
        if k:
            pieces.append(F.lit(" "))
        pieces.append(F.element_at(toks, i + F.lit(k)))
    return F.concat(*pieces)


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-word shingles; whole text as one shingle when shorter
    than n tokens (so tiny docs still dedup)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(F.transform(idx, lambda i: _shingle_at(toks, i, n))),
    ).otherwise(F.array(F.array_join(toks, " ")))


def positional_word_shingles(toks: Column, n: int) -> Column:
    """Array of struct(pos, shingle): stride-1 n-word shingles WITH
    their 1-based start positions, NOT deduplicated — unlike
    :func:`word_shingles`, positions matter here. A doc shorter than
    n tokens yields an EMPTY array (the when-guard matters: an
    unguarded sequence(1, size-n+1) runs DESCENDING when size < n and
    would emit wrap-around garbage shingles). Shared by the
    substring-dedup queries (plans/llm_pipeline5.py) and the
    incremental shingle store (operators/incremental_substring.py) so
    batch and full-corpus paths shingle identically by construction."""

    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.struct(
                i.cast("long").alias("pos"),
                _shingle_at(toks, i, n).alias("shingle"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:bigint,shingle:string>>"))


# Universal-hash MinHash family: permutation i maps a 32-bit base
# hash h to (a_i*h + b_i) mod MINHASH_P. p = 2^31-1 (prime); with
# h, b < p and a < p the product stays under 2^62 — exact BIGINT
# arithmetic in every engine, no overflow, no floats. The (a, b)
# pairs are fixed pseudorandom constants (md5 of "minhash-{a,b}-{i}",
# reduced mod p) so Spark and the DuckDB oracle share one table.
MINHASH_P = (1 << 31) - 1
MINHASH_AB = (
    (1062152830, 1695421687),
    (1268543612, 648833165),
    (1909065456, 49877568),
    (1816160850, 2128198149),
    (257569287, 1658739226),
    (1287187322, 1879143231),
    (170452813, 947560632),
    (1527001035, 1255994588),
    (1011933876, 2046957751),
    (179173683, 1862357070),
    (979716681, 513948596),
    (1023073390, 1451000904),
    (286615217, 953950331),
    (206804578, 1495278991),
    (938733894, 1658718891),
    (1657740429, 1200190740),
)


def minhash_base(shingles: Column) -> Column:
    """Per-shingle 32-bit base hash reduced mod p — ONE md5 per
    shingle; every permutation derives arithmetically from this array.
    Callers must PROJECT this column before minhash_signature (the
    usual no-CSE-across-lambdas rule: inlining would re-run the md5
    once per permutation — 16× the hashing, the cost this family
    exists to avoid)."""
    return F.transform(
        shingles, lambda s: hex_word32(F.md5(s), 1) % MINHASH_P
    )


def minhash_signature(base: Column, num_hashes: int = 16) -> list[Column]:
    """MinHash signature over a MATERIALIZED minhash_base array:
    signature i = min over shingles of (a_i*h + b_i) mod p."""

    def perm(a: int, b: int):
        # Single-arg lambda: a two-arg lambda would make F.transform
        # pass the ARRAY INDEX as the second argument.
        return lambda h: (F.lit(a) * h + F.lit(b)) % MINHASH_P

    return [
        F.array_min(F.transform(base, perm(*MINHASH_AB[i]))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]


def band_hashes(sig_cols: list[Column | str], bands: int) -> list[Column]:
    """LSH banding: hash each contiguous band of signature values."""
    cols = [F.col(c) if isinstance(c, str) else c for c in sig_cols]
    rows_per_band = len(cols) // bands
    out = []
    for b in range(bands):
        chunk = cols[b * rows_per_band : (b + 1) * rows_per_band]
        out.append(F.md5(F.concat_ws("|", *chunk)).alias(f"band_{b}"))
    return out


def token_hash32(tok: Column) -> Column:
    """First 32 bits of md5(token) as a non-negative long — portable
    (DuckDB: ('0x' || substr(md5(t),1,8))::BIGINT)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def hex_word32(hexstr: Column, pos: int) -> Column:
    """32-bit word from hex chars [pos, pos+8) of a hash string
    (1-based, like substr). Portable: DuckDB
    ('0x' || substr(h, pos, 8))::BIGINT."""
    return F.conv(F.substring(hexstr, pos, 8), 16, 10).cast("long")


def _simhash32_sql(hs_sql: str) -> str:
    """The whole 32-bit SimHash fold as ONE Spark-SQL string — the
    SQL function form of shiftright takes a column shift amount, so
    the bit loop that the Column API forces to unroll (32 x ~10 py4j
    calls of plan construction per call site) collapses to a single
    aggregate over sequence(0, 31). Identical per-bit semantics and
    ascending summation order."""
    return (
        "aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, j) -> acc + "
        f"IF(size(filter({hs_sql}, h -> (shiftright(h, j) & 1) = 1)) * 2 "
        f"> size({hs_sql}), "
        "shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))"
    )


def simhash32_from_hashes(hashes: Column | str) -> Column:
    """32-bit SimHash from a MATERIALIZED array of 32-bit token
    hashes: bit j is set when more than half the tokens have bit j set
    (#set*2 > n form avoids a ±1 accumulator). A column NAME takes the
    single-F.expr fast path (``_simhash32_sql``); a Column expression
    unrolls the bit loop in Python (the Column-API shiftright requires
    a literal shift).

    Callers must project the hash array in a prior select —
    ``transform(tk, token_hash32)`` inlined here would recompute the
    md5 once per (token, bit): 32× the work (no CSE across lambdas).
    """
    if isinstance(hashes, str):
        from .vectors import quote_ident

        return F.expr(_simhash32_sql(quote_ident(hashes)))
    n = F.size(hashes)

    def bit_set(j: int):
        # Single-arg lambda (two-arg would receive the array index).
        return lambda h: F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1

    code = F.lit(0).cast("long")
    for j in range(32):
        set_cnt = F.size(F.filter(hashes, bit_set(j)))
        code = code + F.when(set_cnt * 2 > n, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return code


def simhash32(toks: Column) -> Column:
    """Convenience single-expression SimHash (fine for tests / small
    data; the staged operator path projects the hash array first)."""
    return simhash32_from_hashes(F.transform(toks, token_hash32))


def simhash64_words(toks: Column) -> tuple[Column, Column]:
    """64-bit SimHash as TWO 32-bit words (lo, hi) — lo from md5 hex
    chars 1-8 per token, hi from chars 9-16.

    Why a word pair instead of one BIGINT: a true 64-bit fingerprint
    needs the sign bit, and signed-overflow semantics differ across
    engines (Java longs wrap; DuckDB BIGINT shifts/multiplies raise) —
    two non-negative 32-bit words are overflow-free and byte-portable.
    Convenience form for tests; the operator path materializes the md5
    array once and derives both words from it (one hash per token)."""
    mh = F.transform(toks, F.md5)
    return (
        simhash32_from_hashes(F.transform(mh, lambda s: hex_word32(s, 1))),
        simhash32_from_hashes(F.transform(mh, lambda s: hex_word32(s, 9))),
    )


def hamming32(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def hamming64(a_lo: Column, a_hi: Column, b_lo: Column, b_hi: Column) -> Column:
    """Hamming distance over a (lo, hi) word-pair fingerprint."""
    return hamming32(a_lo, b_lo) + hamming32(a_hi, b_hi)


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens(text)
    sw = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return F.when(F.size(toks) > 0, sw / F.size(toks)).otherwise(F.lit(0.0))


def punct_ratio(text: Column | str) -> Column:
    t = _c(text)
    punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    return F.when(F.length(t) > 0, punct / F.length(t)).otherwise(F.lit(0.0))


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality in [0,1]: length factor + stopword
    presence − punctuation noise (the usual pre-training quality
    gates, deterministic + portable)."""
    toks = tokens(text)
    n = F.size(toks)
    length_factor = F.least(n / F.lit(100.0), F.lit(1.0))
    return F.greatest(
        F.lit(0.0),
        F.least(
            F.lit(1.0),
            0.5 * length_factor + 0.5 * stopword_ratio(text) * 2 - punct_ratio(text),
        ),
    )


def rolling_fingerprint(toks: Column, window: int = 4) -> Column:
    """Document fingerprint: minimum md5 over all ``window``-gram
    token windows (winnowing-style min-sampling of a rolling hash)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (window - 1))
    return F.when(
        F.size(toks) >= window,
        F.array_min(
            F.transform(idx, lambda i: F.md5(_shingle_at(toks, i, window)))
        ),
    ).otherwise(F.md5(F.array_join(toks, " ")))
