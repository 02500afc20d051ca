"""Text analysis operators: tokenization, quality, language-ID,
fingerprinting.

All column expressions are built from pyspark.sql.functions built-ins
(split / regexp / md5 / array ops) so they run inside whole-stage
codegen — no Python UDFs on the 100 TB path. Every operator has an
ANSI-SQL twin in queries/text.py for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in")

# marker words per language for the n-gram/keyword language-ID
# heuristic; the CASE-chain priority (en, de, es, fr, zh) is the
# deterministic tie-break.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and"),
    "de": ("der", "die", "und"),
    "es": ("el", "los", "que"),
    "fr": ("le", "les", "et"),
    "zh": (),
}


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(col)))


# GPT-2-style pre-tokenizer pattern: contraction suffixes, then
# space-prefixed letter runs, digit runs, and punctuation runs. This is
# the subword-boundary split BPE vocabularies are trained over; counting
# its matches approximates BPE token counts far better than whitespace
# (which undercounts punctuation-heavy and number-heavy text). The
# pattern uses only syntax shared by Java regex (Spark) and RE2
# (DuckDB): \p{L}, \p{N}, character classes, alternation.
BPE_SPLIT_RE = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_tokens(text_col: str) -> Column:
    """Subword-boundary token array (BPE pre-tokenization units)."""
    pat = BPE_SPLIT_RE.replace("\\", "\\\\").replace("'", "\\'")
    return F.expr(f"regexp_extract_all({text_col}, '{pat}', 0)")


def bpe_token_count(text_col: str) -> Column:
    return F.size(bpe_tokens(text_col))


def marker_count(text_col: str, words: tuple[str, ...]) -> Column:
    """How many tokens (with multiplicity) fall in `words` — JVM-side
    higher-order filter, no UDF."""
    if not words:
        return F.lit(0)
    arr = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter(split(trim({text_col}), '\\\\s+'), t -> t IN ({arr})))")


def stopword_count(text_col: str, words: tuple[str, ...] = STOPWORDS) -> Column:
    return marker_count(text_col, words)


def quality_score(text_col: str) -> Column:
    """Deterministic quality heuristic in [0,1]:
    0.5·min(len/500,1) + 0.3·distinct-token ratio + 0.2·(1 − stopword ratio).

    Mirrors the shape of production quality filters (length, lexical
    diversity, boilerplate share); arithmetic is single-expression
    double math — bit-identical across engines.
    """
    c = F.col(text_col)
    n = F.length(c).cast("double")
    tok = token_count(text_col).cast("double")
    dist = distinct_token_count(text_col).cast("double")
    stop = stopword_count(text_col).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    diversity = dist / tok
    stop_ratio = stop / tok
    return F.lit(0.5) * len_score + F.lit(0.3) * diversity + F.lit(0.2) * (F.lit(1.0) - stop_ratio)


def predict_lang(text_col: str) -> Column:
    """Keyword-marker language ID with deterministic priority order.

    On real corpora the markers separate languages; the synthetic test
    corpus is English-jargon word salad, so this mostly exercises the
    determinism + plumbing (documented; accuracy is judged on real data).
    """
    counts = {lang: marker_count(text_col, words) for lang, words in LANG_MARKERS.items()}
    c = counts
    return (
        F.when((c["en"] >= c["de"]) & (c["en"] >= c["es"]) & (c["en"] >= c["fr"]) & (c["en"] > 0), F.lit("en"))
        .when((c["de"] >= c["es"]) & (c["de"] >= c["fr"]) & (c["de"] > 0), F.lit("de"))
        .when((c["es"] >= c["fr"]) & (c["es"] > 0), F.lit("es"))
        .when(c["fr"] > 0, F.lit("fr"))
        .otherwise(F.lit("unknown"))
    )


ROLL_BASE = 257
ROLL_MOD = 1_000_000_007


def char_codes(text_col: str) -> Column:
    """Per-character code array (bigint) — the input to rolling hashes."""
    return F.expr(
        f"transform(sequence(1, length({text_col})), "
        f"i -> cast(ascii(substring({text_col}, i, 1)) as bigint))"
    )


def rolling_hash_expr(arr: str) -> Column:
    """Polynomial rolling hash of a char-code array column:
    fold (acc·B + c) mod M — the Rabin-Karp document fingerprint.
    Unlike md5, prefix hashes extend incrementally, which is what
    streaming fingerprinters and content-defined chunkers need."""
    return F.expr(
        f"aggregate({arr}, cast(0 as bigint), "
        f"(acc, c) -> (acc * {ROLL_BASE} + c) % {ROLL_MOD})"
    )


def chunk_boundary_count(arr: str, window: int = 16, divisor: int = 64) -> Column:
    """Content-defined chunking boundary count: positions whose
    ``window``-char rolling hash ≡ 0 (mod ``divisor``) — the
    Rabin-fingerprint cut rule used by dedup-friendly chunkers (LBFS /
    restic-style). Expected chunk length ≈ divisor chars. The guard
    matters: Spark's sequence(a, b) runs DESCENDING when b < a, so
    short docs must short-circuit to 0 boundaries."""
    whash = (
        f"aggregate(slice({arr}, i - {window} + 1, {window}), cast(0 as bigint), "
        f"(acc, c) -> (acc * {ROLL_BASE} + c) % {ROLL_MOD})"
    )
    return F.expr(
        f"IF(size({arr}) >= {window}, "
        f"size(filter(sequence({window}, size({arr})), i -> {whash} % {divisor} = 0)), 0)"
    )


def fingerprint(text_col: str) -> Column:
    """Content fingerprint: md5 of the case/punctuation-normalized text."""
    return F.md5(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""))


def bow_fingerprint(text_col: str) -> Column:
    """Bag-of-words fingerprint: md5 over the sorted token multiset —
    collapses word-order permutations (near-dup normalization)."""
    return F.md5(F.array_join(F.array_sort(tokens(text_col)), " "))
