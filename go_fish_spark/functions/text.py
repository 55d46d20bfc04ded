"""Text-analysis column expressions: tokenization, shingling, language-ID,
quality scoring, fingerprinting.

The reference has no text operators at all (its rules do ad-hoc Go string
work: regex `domain_cert_issued.go:19`, len `length.go:14`); these extend
the engine for large-scale training-data pipelines (north star in
BASELINE.json). All pure Column expressions — no UDFs, no shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Tokenization


def tokens(text: Column | str) -> Column:
    """Whitespace tokens."""
    return F.split(text, " ")


#: BPE-ish token pattern: word runs or single non-space punctuation.
BPE_ISH_PATTERN = r"\w+|[^\w\s]"


def bpe_ish_token_count(text: Column | str) -> Column:
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-shingles ("a b c" style), built array-side:
    transform over a 0..n-k index sequence + slice + concat — no explode,
    no shuffle; cost is linear per row regardless of cluster size."""
    w = tokens(text)
    # Guard: sequence(1, n) with n < 1 would generate a DESCENDING sequence
    # in Spark, not an empty one.
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, k)),
        )
    )
    return F.when(F.size(w) >= k, shingles).otherwise(
        F.array().cast("array<string>")
    )


# ---------------------------------------------------------------------------
# Language identification (marker-token heuristic)

#: Deterministic marker sets per language. Order matters: ties resolve to
#: the earlier entry; docs matching no marker → 'und'.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "la", "los", "las", "es"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": ("的", "是", "了", "在", "我"),
}


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language marker-hit counts (duplicates counted — frequency
    matters for the heuristic)."""
    w = tokens(text)
    return {
        lang: F.size(F.filter(w, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column | str) -> Column:
    """argmax over marker counts with deterministic tie-break (dict order);
    all-zero → 'und'."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.when(best <= 0, F.lit("und"))
    for lang, score in scores.items():
        expr = expr.when(score == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def duck_lang_scores(text_expr: str = "text") -> dict[str, str]:
    """DuckDB mirror of :func:`lang_scores` (same markers)."""
    return {
        lang: (
            f"len(list_filter(string_split({text_expr}, ' '), "
            f"w -> w IN ({', '.join(chr(39) + m + chr(39) for m in markers)})))"
        )
        for lang, markers in LANG_MARKERS.items()
    }


# ---------------------------------------------------------------------------
# Quality scoring

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def quality_metrics(text: Column | str) -> dict[str, Column]:
    """Length / stopword-ratio / mean-word-length quality signals."""
    t = F.col(text) if isinstance(text, str) else text
    w = tokens(t)
    n_words = F.size(w)
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    # single-space-joined corpus: chars = sum(word lens) + (n_words - 1)
    mean_word_len = (F.length(t) - (n_words - 1)) / n_words
    return {
        "n_words": n_words,
        "stop_ratio": n_stop / n_words,
        "mean_word_len": mean_word_len,
    }


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality score: longer docs, fewer stopwords,
    plausible word lengths."""
    m = quality_metrics(text)
    return (
        0.4 * F.least(m["n_words"] / F.lit(100.0), F.lit(1.0))
        + 0.3 * (1.0 - m["stop_ratio"])
        + 0.3 * F.least(m["mean_word_len"] / F.lit(10.0), F.lit(1.0))
    )


# ---------------------------------------------------------------------------
# Fingerprinting


def content_fingerprint(text: Column | str) -> Column:
    """Exact-content fingerprint: md5 of the normalized text."""
    t = F.col(text) if isinstance(text, str) else text
    return F.md5(F.lower(F.trim(t)))


def bag_fingerprint(text: Column | str) -> Column:
    """Order-insensitive fingerprint: md5 over the sorted distinct token
    set — catches word-order-permuted duplicates that
    :func:`content_fingerprint` misses."""
    return F.md5(
        F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text))))
    )
