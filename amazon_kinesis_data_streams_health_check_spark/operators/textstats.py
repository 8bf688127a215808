"""[EXT] Text-analysis operators for training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (token/type ratios),
token counting (whitespace + regex token models), and document fingerprinting
(content hash + char-n-gram min-hash). No reference citations — this is
north-star scope beyond the reference surface (SURVEY.md section 2.10 E3).

Engineering stance: every op is a pure column expression over the built-in
array/string functions (codegen'd, zero Python) so it scales scan-bound, and
each has an exact DuckDB twin generated from the same constants — both
engines compute identical integers/doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Word-token model shared by both engines.
TOKEN_RE = "[a-z0-9]+"
#: BPE-ish fallback token model: letter runs, single digits, single symbols.
BPE_RE = "[a-z]+|[0-9]|[^a-z0-9\\s]"

#: Tiny per-language stopword lists for the n-gram/stopword lang-ID heuristic.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "y", "en", "que", "es", "un", "una", "los"),
    "fr": ("le", "la", "de", "et", "en", "que", "est", "un", "une", "les"),
    "de": ("der", "die", "das", "und", "in", "zu", "ist", "ein", "eine", "den"),
    "zh": ("de", "le", "shi", "wo", "ni", "ta", "zai", "you", "he", "bu"),
}
#: Deterministic tie-break priority for argmax over language scores.
LANG_PRIORITY = ("en", "es", "fr", "de", "zh")


def _tok(text_col: str) -> str:
    return f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)"


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add token-count / quality-signal columns (all integer-exact or
    integer-ratio doubles — cross-engine deterministic)."""
    t = _tok(text_col)
    ws = f"split(trim({text_col}), '\\\\s+')"
    all_stop = sorted({w for ws_ in STOPWORDS.values() for w in ws_})
    stop_arr = "array(" + ",".join(f"'{w}'" for w in all_stop) + ")"
    return df.withColumns(
        {
            "n_tokens": F.expr(f"size({t})"),
            "n_ws_tokens": F.expr(f"size({ws})"),
            "n_distinct_tokens": F.expr(f"size(array_distinct({t}))"),
            "total_token_chars": F.expr(
                f"aggregate(transform({t}, x -> length(x)), 0, (a, x) -> a + x)"
            ),
            "n_stopword_tokens": F.expr(
                f"size(filter({t}, x -> array_contains({stop_arr}, x)))"
            ),
        }
    )


def with_quality_score(df: DataFrame) -> DataFrame:
    """Composite quality score over the token stats: type-token ratio,
    length saturation, non-stopword density. Inputs are exact ints, so the
    double arithmetic is order-free and engine-identical."""
    ttr = F.col("n_distinct_tokens") / F.col("n_tokens")
    length_sat = F.least(F.lit(1.0), F.col("n_tokens") / F.lit(100.0))
    stop_ratio = F.col("n_stopword_tokens") / F.col("n_tokens")
    return df.withColumns(
        {
            "ttr": ttr,
            "avg_token_len": F.col("total_token_chars") / F.col("n_tokens"),
            "stopword_ratio": stop_ratio,
            "quality_score": F.round(
                F.lit(0.4) * ttr + F.lit(0.3) * length_sat + F.lit(0.3) * (F.lit(1.0) - stop_ratio),
                6,
            ),
        }
    )


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID: distinct-token overlap with each language's
    stopword list; argmax with fixed priority tie-break."""
    t = _tok(text_col)
    for lang in LANG_PRIORITY:
        arr = "array(" + ",".join(f"'{w}'" for w in STOPWORDS[lang]) + ")"
        df = df.withColumn(
            f"score_{lang}", F.expr(f"size(array_intersect({t}, {arr}))").cast("long")
        )
    mx = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_PRIORITY])
    # First language (in priority order) reaching the max score wins.
    guess = F.when(F.col(f"score_{LANG_PRIORITY[0]}") == mx, F.lit(LANG_PRIORITY[0]))
    for lang in LANG_PRIORITY[1:]:
        guess = guess.when(F.col(f"score_{lang}") == mx, F.lit(lang))
    return df.withColumn("lang_guess", guess)


def with_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: exact content hash + min/max over the char
    5-gram hash set (a 2-hash winnow — rolling-hash family, deterministic)."""
    lowered = f"lower({text_col})"
    grams = (
        f"transform(sequence(1, greatest(length({lowered}) - 4, 1)),"
        f" i -> substr({lowered}, i, 5))"
    )
    return df.withColumns(
        {
            "content_hash": F.expr(f"md5({text_col})"),
            "min_gram_hash": F.expr(f"array_min(transform({grams}, g -> md5(g)))"),
            "max_gram_hash": F.expr(f"array_max(transform({grams}, g -> md5(g)))"),
        }
    )


# ---------------------------------------------------------------------------
# DuckDB twin fragments (kept adjacent so constants never drift).
# ---------------------------------------------------------------------------
def duck_tok(text_col: str = "text") -> str:
    return f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}')"


def duck_stop_list(langs: tuple[str, ...] | None = None) -> str:
    words = sorted(
        {w for lang in (langs or STOPWORDS.keys()) for w in STOPWORDS[lang]}  # type: ignore[union-attr]
    )
    return "[" + ",".join(f"'{w}'" for w in words) + "]"


def duck_lang_arr(lang: str) -> str:
    return "[" + ",".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"
