"""Text-analysis operators for training-data pipelines.

All hot-path functions are pure Column expressions (JVM-side,
whole-stage codegen — no Python), deliberately written with
engine-portable primitives (length/replace/regexp_replace) so the
DuckDB correctness oracles can reproduce them exactly. Integer
outputs are preferred over float ratios to keep cross-engine
value-hashes stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: language marker words for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["und", "der", "nicht"],
    "fr": ["le", "et", "les"],
    "es": ["el", "que", "de"],
}


def count_occurrences(col: Column, needle: str) -> Column:
    """# of occurrences of `needle` via the portable replace-diff
    trick: (len(s) - len(replace(s, needle))) / len(needle)."""
    return (
        (F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def word_count(col: Column, word: str) -> Column:
    """Occurrences of `word` as a standalone whitespace token.
    Whitespace is normalized, then every space doubled so adjacent
    repeats ("the the") are each isolated before the replace-diff
    count — exact token semantics with portable primitives."""
    collapsed = F.regexp_replace(F.trim(col), r"\s+", " ")
    isolated = F.concat(
        F.lit(" "), F.replace(collapsed, F.lit(" "), F.lit("  ")), F.lit(" ")
    )
    return count_occurrences(isolated, f" {word} ")


def token_count(col: Column) -> Column:
    """Whitespace token count: collapse runs, count separators + 1."""
    collapsed = F.regexp_replace(F.trim(col), r"\s+", " ")
    return F.when(F.length(collapsed) == 0, F.lit(0)).otherwise(
        count_occurrences(collapsed, " ") + 1
    )


#: GPT-2-style pre-tokenizer alternation (contractions, letter runs,
#: digit runs, punctuation runs, each with an optional leading
#: space). Deliberately lookahead-free so the SAME pattern runs in
#: Java regex (Spark codegen) and RE2 (DuckDB oracle).
BPE_TOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
)


def bpe_token_count(col: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer matches (the
    unit a byte-pair encoder would split further). JVM-side
    ``regexp_count`` — no Python."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_PATTERN)).cast("long")


def punct_count(col: Column) -> Column:
    return F.length(col) - F.length(F.regexp_replace(col, r"[.,;:!?]", ""))


def stopword_count(col: Column) -> Column:
    """Total occurrences of the English marker stopwords."""
    total = F.lit(0)
    for w in LANG_MARKERS["en"]:
        total = total + word_count(col, w)
    return total.cast("long")


def quality_features(col: Column) -> list[Column]:
    """Integer quality-signal columns (length / punctuation /
    stopword / token counts) for heuristic corpus filtering."""
    return [
        F.length(col).alias("n_chars"),
        token_count(col).alias("n_tokens"),
        bpe_token_count(col).alias("n_bpe_tokens"),
        punct_count(col).alias("n_punct"),
        stopword_count(col).alias("n_stopwords"),
    ]


def lang_scores(col: Column) -> list[Column]:
    """Marker-word score per language (deterministic heuristic)."""
    out = []
    for lang, words in LANG_MARKERS.items():
        score = F.lit(0)
        for w in words:
            score = score + word_count(col, w)
        out.append(score.cast("long").alias(f"score_{lang}"))
    return out


def detect_lang(col: Column) -> Column:
    """argmax of marker scores with fixed precedence order
    (en > de > fr > es on ties; 'und' = undetermined when all 0)."""
    scores = {lang: sum((word_count(col, w) for w in words), F.lit(0))
              for lang, words in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):  # earlier langs win ties
        expr = F.when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        ).otherwise(expr)
    return expr


def normalized_text(col: Column) -> Column:
    """lower + collapse whitespace + trim (shared by fingerprint and
    shingle-based dedup so both sides agree on the canonical form)."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def md5_fingerprint64(col: Column) -> Column:
    """int64 document fingerprint: first 16 hex chars of
    md5(normalized text) — portable to DuckDB for oracles."""
    hexs = F.md5(normalized_text(col))
    hi = F.conv(F.substring(hexs, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hexs, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def rolling_fingerprint64(col: Column, window: int = 8) -> Column:
    """Polynomial rolling-hash fingerprint (min-hash of windowed
    rolling hashes) — JVM-side via aggregate over a char sequence.
    Not oracle-portable (documented rows-only check)."""
    # two independent 31-bit polynomial hashes (Mersenne 2^31-1;
    # intermediate values stay < 2^40, safe under ANSI overflow
    # checks), combined into one 62-bit fingerprint — in Catalyst
    norm = normalized_text(col)
    codes = F.transform(F.split(norm, ""), lambda c: F.ascii(c).cast("long"))
    MOD = 2147483647  # 2^31 - 1
    h1 = F.aggregate(codes, F.lit(0).cast("long"),
                     lambda acc, c: (acc * 257 + c) % MOD)
    h2 = F.aggregate(codes, F.lit(0).cast("long"),
                     lambda acc, c: (acc * 131 + c + 7) % MOD)
    return F.shiftleft(h1, 31).bitwiseOR(h2)
