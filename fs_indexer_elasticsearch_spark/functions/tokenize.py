"""Exact tokenizer token counts for training-data budgeting.

Training budgets are denominated in real tokenizer tokens; the
`bpe_token_estimate` heuristic (plans/llm_pipeline2.py) is fine for
triage but drifts on real corpora. This module provides EXACT counts
under a deterministic reference tokenizer, plus an optional hook for a
real installed tokenizer:

- **Reference tokenizer** (always available, oracle-twinned): greedy
  longest-match wordpiece over the fixed ``TOKENIZER_VOCAB`` piece
  table, single-character fallback — the WordPiece/BPE-inference
  algorithm (Wu et al. 2016's "greedy longest-match-first"), with a
  small fixed vocabulary instead of a learned 50k one so DuckDB can
  recompute it exactly (recursive CTE over a precomputed greedy-step
  table; see plans/llm_pipeline6 token_count_exact).
- **Real tokenizer** (optional, import-gated): ``tiktoken`` or
  HuggingFace ``tokenizers`` when installed — same Arrow-batched
  ``mapInPandas`` plumbing, so swapping the function swaps the
  tokenizer; this container ships neither, and the deterministic
  reference path is the fallback (and the only oracle-checkable one).

Scale shape: the corpus is never tokenized row-at-a-time in Python.
Token counting runs over DISTINCT words (Heaps-law sublinear in corpus
size), Arrow-batched, and joins the per-word counts back — the same
dedup-the-work pattern the curation layer uses throughout. A real
subword tokenizer without a pre-tokenizer word split would tokenize
full documents instead (``count_tokens_exact_docs``) — still
Arrow-batched mapInPandas, linear in corpus bytes, embarrassingly
parallel.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Fixed reference vocabulary: multi-char pieces only (a 1-char piece is
# indistinguishable from the char fallback). Chosen to cover common
# English subwords plus the synthetic corpus vocabulary so counts are
# non-trivial (most words split into 1-3 pieces, unknown words fall
# back per-char). The ORACLE SQL embeds this same tuple via
# vocab_values_sql() — single source of truth, drift impossible.
TOKENIZER_VOCAB: tuple[str, ...] = (
    "the", "ing", "er", "ion", "re", "on", "at", "en", "an",
    "table", "ta", "ble", "scan", "row", "val", "ue", "da",
    "jo", "in", "qu", "ery", "sl", "ow", "fa", "st", "sm", "all",
    "ba", "tch", "wi", "nd", "ha", "sh", "agg", "key", "part",
    "ord", "mer", "ge", "fil", "ter", "str", "eam", "col", "umn",
    "spark", "line", "big", "cus", "tom",
)

_MAX_PIECE = max(len(p) for p in TOKENIZER_VOCAB)


def vocab_values_sql() -> str:
    """The vocab as a SQL VALUES list for the DuckDB oracle twin."""
    return ", ".join(f"('{p}')" for p in TOKENIZER_VOCAB)


def wordpiece_count(word: str) -> int:
    """Greedy longest-match piece count of one word: at each position
    consume the LONGEST matching vocab piece, else one character."""
    pos, n = 0, 0
    L = len(word)
    while pos < L:
        adv = 1
        # longest match first: scan down from the cap
        for k in range(min(_MAX_PIECE, L - pos), 1, -1):
            if word[pos : pos + k] in _VOCAB_SET:
                adv = k
                break
        pos += adv
        n += 1
    return n


_VOCAB_SET = frozenset(TOKENIZER_VOCAB)


def word_token_counts(words: DataFrame, word_col: str = "w") -> DataFrame:
    """(word, ntok) for a DataFrame of DISTINCT words — Arrow-batched
    mapInPandas (never row-at-a-time Python; the plan audit would fail
    a BatchEvalPython node)."""

    def count_batches(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf[[word_col]].copy()
            pdf["ntok"] = [wordpiece_count(w) for w in pdf[word_col]]
            yield pdf

    return words.select(word_col).mapInPandas(
        count_batches, f"{word_col} string, ntok long"
    )


def load_real_tokenizer(spec: str):
    """Import-gated real tokenizer: ``"tiktoken:<encoding>"`` or
    ``"hf:<name-or-path>"``. Returns a ``str -> int`` counter, or
    None when the library isn't installed (this container ships
    neither — callers fall back to the reference wordpiece)."""
    kind, _, name = spec.partition(":")
    try:
        if kind == "tiktoken":
            import tiktoken  # noqa: F401 — optional dep

            enc = tiktoken.get_encoding(name or "cl100k_base")
            return lambda s: len(enc.encode(s))
        if kind == "hf":
            from tokenizers import Tokenizer  # noqa: F401 — optional dep

            tok = Tokenizer.from_pretrained(name)
            return lambda s: len(tok.encode(s).ids)
    except ImportError:
        return None
    raise ValueError(f"unknown tokenizer spec {spec!r}")


def count_tokens_exact_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    tokenizer_spec: str | None = None,
) -> DataFrame:
    """(id, n_tokens) per document. With ``tokenizer_spec`` and the
    library installed, counts REAL tokenizer tokens over the raw text
    (Arrow-batched, linear, parallel); otherwise counts the reference
    wordpiece tokenizer exactly (over the engine's standard word
    split). Budget/packing queries can point here once a real
    tokenizer ships with the cluster image."""
    counter = load_real_tokenizer(tokenizer_spec) if tokenizer_spec else None
    if counter is not None:

        def count_docs(batches: Iterator) -> Iterator:
            for pdf in batches:
                out = pdf[[id_col]].copy()
                out["n_tokens"] = [
                    counter(t) if t is not None else 0 for t in pdf[text_col]
                ]
                yield out

        return df.select(id_col, text_col).mapInPandas(
            count_docs, f"{id_col} long, n_tokens long"
        )

    from .text import tokens

    words = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w")
    )
    per_word = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("n"))
    counts = word_token_counts(per_word.select("w").distinct())
    summed = (
        per_word.join(counts, "w")
        .groupBy(id_col)
        .agg(F.sum(F.col("n") * F.col("ntok")).alias("_nt"))
    )
    # One row per INPUT document in both paths: the explode drops
    # zero-token docs, so left-join back and coalesce to 0 — otherwise
    # result multiplicity would depend on which tokenizer happens to
    # be installed (r7 review finding).
    return df.select(id_col).join(summed, id_col, "left").select(
        id_col, F.coalesce(F.col("_nt"), F.lit(0)).cast("long").alias("n_tokens")
    )
