"""Text-analysis column builders (beyond-parity training-data operators).

Everything here is a pure JVM column expression -- no Python crossing --
so the whole text pipeline stays inside WholeStageCodegen.  Formulas are
deliberately SQL-replicable so each operator carries a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_MOD = 1_000_000_007

# marker words per language for the n-gram/stopword language heuristic;
# priority order breaks score ties deterministically
LANG_MARKERS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("en", ("a", "the", "and", "of", "to")),
    ("es", ("el", "la", "los", "de", "que")),
    ("fr", ("le", "la", "les", "des", "et")),
    ("de", ("der", "die", "das", "und", "nicht")),
    ("zh", ("de5", "shi4", "le5", "zai4", "you3")),
)

STOPWORDS = ("a", "the", "and", "of", "to")


def tokens(text: Column) -> Column:
    return F.split(F.lower(text), " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wordset, t)))


def stopword_ratio(text: Column) -> Column:
    toks = tokens(text)
    return _count_in(toks, STOPWORDS).cast("double") / F.size(toks)


def distinct_token_ratio(text: Column) -> Column:
    toks = tokens(text)
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks)


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: lexical diversity + length
    saturation + stopword plausibility.  The exact double-op order is part
    of the contract (mirrored in oracle SQL)."""
    toks = tokens(text)
    n = F.size(toks)
    diversity = F.size(F.array_distinct(toks)).cast("double") / n
    length_sat = F.least(F.lit(1.0), n.cast("double") / F.lit(100.0))
    stop = _count_in(toks, STOPWORDS).cast("double") / n
    return diversity * F.lit(0.5) + length_sat * F.lit(0.3) + (F.lit(1.0) - stop) * F.lit(0.2)


def lang_id(text: Column) -> Column:
    """Marker-word language heuristic: most marker hits wins; ties resolve
    by LANG_MARKERS priority order; zero hits everywhere -> 'und'."""
    toks = tokens(text)
    scores = [(code, _count_in(toks, words)) for code, words in LANG_MARKERS]
    best = scores[0][1]
    for _, s in scores[1:]:
        best = F.greatest(best, s)
    expr = F.lit("und")
    # build the when-chain in reverse so earlier languages win ties
    for code, s in reversed(scores):
        expr = F.when((s == best) & (best > 0), F.lit(code)).otherwise(expr)
    return expr


def fingerprint(text: Column) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    per-token codes (len*256 + first-char codepoint) mod 1e9+7.  Pure
    integer math -> identical in any engine."""
    toks = tokens(text)
    codes = F.transform(
        toks, lambda t: (F.length(t) * F.lit(256) + F.ascii(t)).cast("bigint")
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * F.lit(31) + c) % F.lit(HASH_MOD),
    )


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles (the unit set for jaccard/minhash dedup).

    Built as k array slices zipped with string concat rather than indexed
    gets: column expressions are trees, not DAGs, so a per-index
    formulation re-evaluates the split() subexpression once per get
    (~3x tokens times per row -- measured 25x slower); the slice form
    evaluates it a constant ~5 times."""
    toks = tokens(text)
    n_shingles = F.greatest(F.lit(0), F.size(toks) - F.lit(k - 1))
    parts = [F.slice(toks, F.lit(j + 1), n_shingles) for j in range(k)]
    sh = parts[0]
    for p in parts[1:]:
        sh = F.zip_with(sh, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.array_distinct(sh)


def jaccard(a: Column, b: Column) -> Column:
    """Exact jaccard similarity of two (distinct-element) arrays."""
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(
        F.array_union(a, b)
    )


# --------------------------------------------------------------------------
# PII redaction (training-data scrubbing)
# --------------------------------------------------------------------------

# Patterns chosen to behave IDENTICALLY under Java regex (Spark) and RE2
# (DuckDB oracles): no backreferences, no lookaround, explicit classes.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}
_PII_ORDER = ("email", "phone", "ssn")  # phone (3-3-4) before ssn (3-2-4)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII occurrence counts as JVM expressions (regexp_count,
    no Python).  Count BEFORE redacting -- replacement tokens must not
    shadow later patterns."""
    return {
        kind: F.regexp_count(text, F.lit(pat))
        for kind, pat in PII_PATTERNS.items()
    }


def redact_pii(text: Column) -> Column:
    """All PII spans replaced with typed tokens ([EMAIL], [PHONE],
    [SSN]) -- pure regexp_replace chain inside WholeStageCodegen, zero
    Python.  Order matters: phone's 3-3-4 shape is matched before ssn's
    3-2-4 so neither digit run is half-eaten by the other (the two are
    mutually exclusive on the middle group, but a fixed order keeps the
    output deterministic and oracle-reproducible)."""
    out = text
    for kind in _PII_ORDER:
        out = F.regexp_replace(
            out, PII_PATTERNS[kind], f"[{kind.upper()}]"
        )
    return out


def raw_ngrams(text: Column, k: int = 2) -> Column:
    """Token n-grams WITH multiplicity (word_shingles minus the distinct)
    -- the unit for repetition scoring, where how often an n-gram repeats
    is the signal."""
    toks = tokens(text)
    n = F.greatest(F.lit(0), F.size(toks) - F.lit(k - 1))
    parts = [F.slice(toks, F.lit(j + 1), n) for j in range(k)]
    out = parts[0]
    for p in parts[1:]:
        out = F.zip_with(out, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return out


# BPE-ish subword-token estimator. Real BPE needs a merges table and a
# lookahead-heavy pretokeniser (GPT-2's regex is not RE2-expressible);
# this is the standard cheap estimate -- letter runs, digit runs, and
# individual non-alphanumeric marks each count as one token -- which
# tracks trained-tokeniser counts within ~15% on English text and is
# Java-regex/RE2-portable for the oracle.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """Estimated subword token count (see BPE_ISH_PATTERN); pure
    regexp_count, zero Python."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("bigint")
