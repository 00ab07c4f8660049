"""Text analysis for training-data pipelines — all JVM-side Catalyst
expressions (no Python UDFs): language-ID, quality scoring, token
counting, document fingerprinting.

Every function here is a narrow projection over the ``documents``
table, so at 100 TB the parquet scan reads only the ``text`` (+id)
columns (column pruning) and the work is embarrassingly parallel —
no shuffle at all for per-document features.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from analyst_spark.tables import spread

# Marker stopwords per language for the n-gram/stopword heuristic.
# Deterministic, tiny, and expressible identically in ANSI SQL for the
# oracle. Order matters: ties break toward the earlier language.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "les", "et", "est"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "los", "las", "y", "es"],
}


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (the baseline tokenizer)."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-ish proxy: count word pieces + digits + punctuation runs.

    A deterministic regex over the text — not a real BPE, but scales
    like one (pure codegen, no vocab lookup) and is the standard cheap
    stand-in for budgeting token counts at corpus scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"), 0))


def _marker_hits(col: Column, words: list[str]) -> Column:
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def language_id(col: Column | str) -> Column:
    """N-gram/stopword-heuristic language ID.

    CJK characters dominate (→ 'zh'); otherwise the language whose
    marker-stopword hit-count is highest wins, ties resolved in the
    fixed order en > fr > de > es; no hits at all → 'und'.
    """
    c = F.col(col) if isinstance(col, str) else col
    cjk = F.length(F.regexp_replace(c, r"[^一-鿿]", ""))
    hits = {lang: _marker_hits(c, ws) for lang, ws in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    expr = F.when(cjk > 0, "zh").when(best == 0, "und")
    for lang in LANG_MARKERS:  # insertion order = tiebreak order
        expr = expr.when(hits[lang] == best, lang)
    return expr


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a
    composite [0,1] score, mirroring the standard C4/Gopher-style
    cheap filters. All arithmetic is exact and ANSI-portable so the
    DuckDB oracle can reproduce it bit-for-bit."""
    df = spread(df, id_col)
    c = F.col(text_col)
    n_chars = F.length(c)
    toks = tokens(c)
    n_tokens = F.size(toks)
    mean_tok_len = (
        F.aggregate(toks, F.lit(0.0), lambda a, x: a + F.length(x)) / n_tokens
    )
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    punct_ratio = n_punct.cast("double") / F.greatest(n_chars, F.lit(1))
    stop_hits = _marker_hits(c, LANG_MARKERS["en"])
    stopword_ratio = stop_hits.cast("double") / F.greatest(n_tokens, F.lit(1))
    score = (
        F.least(n_tokens / F.lit(50.0), F.lit(1.0)) * F.lit(0.5)
        + F.least(stopword_ratio * 10, F.lit(1.0)) * F.lit(0.3)
        + (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0))) * F.lit(0.2)
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_token_len"),
        punct_ratio.alias("punct_ratio"),
        F.round(stopword_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse runs of
    whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic content fingerprint = md5 of the normalized text.

    md5 (not xxhash64) so the fingerprint is portable across engines;
    for pure intra-Spark dedup `F.xxhash64` is ~4× cheaper — see
    dedup.exact_dedup's `fast` flag.
    """
    return F.md5(normalize_text(col))
