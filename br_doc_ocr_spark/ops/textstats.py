"""Text analysis operators over a document corpus: token counting, quality
scoring, language identification, fingerprinting.

Scale design: every operator except the rolling-hash fingerprint is pure
column expressions (whole-stage codegen, no Python). They compose with any
filter/groupBy without extra shuffles — at 100 TB these run at scan speed.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as sf

# Stopword samples per language for the n-gram/stopword-ratio heuristic
# (public langid practice: stopword hit-rate per language, e.g. the approach
# of the classic "stopwords" method in langid literature).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in"),
    "es": ("el", "de", "la", "y", "que", "los"),
    "fr": ("le", "de", "la", "et", "les", "des"),
    "de": ("der", "die", "und", "das", "ist", "von"),
    "zh": ("的", "是", "了", "在", "和", "有"),
}


def token_count(text: Column) -> Column:
    """Whitespace token count (BPE-ish pre-tokenization proxy)."""
    t = sf.trim(text)
    return sf.when(sf.length(t) == 0, sf.lit(0)).otherwise(
        sf.size(sf.split(t, r"\s+"))
    )


def punct_ratio(text: Column) -> Column:
    """Share of true punctuation: strip Unicode letters/digits/whitespace
    (``[\\p{L}\\p{N}\\s]``) — an ASCII-only class counted every accented
    letter (ã, ç, é — ubiquitous in the Portuguese domain text) as
    punctuation, systematically penalizing clean documents."""
    stripped = sf.regexp_replace(text, r"[\p{L}\p{N}\s]", "")
    return sf.round(sf.length(stripped) / sf.greatest(sf.length(text), sf.lit(1)), 6)


def _word_tokens(text: Column) -> Column:
    """Lowercased word tokens: non-letter/digit runs collapse to a single
    space, then split — punctuation-bounded and adjacent occurrences all
    tokenize cleanly (a ``\\s<word>\\s`` split consumed the shared delimiter
    and missed 'the the' and 'the.')."""
    return sf.split(
        sf.regexp_replace(sf.lower(text), r"[^\p{L}\p{N}]+", " "), " ")


def _is_cjk(word: str) -> bool:
    return any("一" <= ch <= "鿿" for ch in word)


def stopword_hits(text: Column, words: tuple[str, ...]) -> Column:
    """Total occurrences of the given stopwords in the text.

    Latin-script words count by exact token equality over
    :func:`_word_tokens`; CJK entries (no word boundaries in running text —
    ``\\s的\\s`` can never match Chinese prose) count by substring
    occurrence. Both are whole-stage-friendly column expressions with exact
    DuckDB renderings (queries.py keeps the SQL in lockstep).
    """
    lowered = sf.lower(text)
    tokens = _word_tokens(text)
    counts = []
    for w in words:
        if _is_cjk(w):
            counts.append(
                (sf.length(lowered)
                 - sf.length(sf.replace(lowered, sf.lit(w), sf.lit(""))))
                / len(w))
        else:
            # closure factory, NOT a default-arg lambda: a two-parameter
            # lambda in sf.filter is the (element, index) form and the word
            # would be bound to the integer index column
            def _equals(word):
                return lambda x: x == word

            counts.append(sf.size(sf.filter(tokens, _equals(w))))
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    return sf.greatest(total.cast("int"), sf.lit(0))


def quality_score(text: Column) -> Column:
    """Deterministic document quality score ∈ [0,1]: rewards mid-range length,
    low punctuation share, and English-stopword presence — the standard
    pretraining-filter shape (length/punct/stopword ratios)."""
    n_tokens = token_count(text)
    len_component = sf.least(n_tokens / sf.lit(64.0), sf.lit(1.0))
    punct_component = sf.lit(1.0) - sf.least(punct_ratio(text) * 5, sf.lit(1.0))
    stop_component = sf.least(
        stopword_hits(text, LANG_STOPWORDS["en"]) / sf.greatest(n_tokens, sf.lit(1))
        * sf.lit(4.0),
        sf.lit(1.0),
    )
    return sf.round(
        len_component * 0.4 + punct_component * 0.3 + stop_component * 0.3, 6
    )


def lang_scores(text: Column) -> list[tuple[str, Column]]:
    return [(lang, stopword_hits(text, words))
            for lang, words in LANG_STOPWORDS.items()]


def predict_lang(text: Column) -> Column:
    """argmax over per-language stopword hit counts; 'und' when all zero.
    Ties break by language-code order (deterministic)."""
    scored = lang_scores(text)
    structs = sf.array(*[
        sf.struct(hits.alias("hits"), sf.lit(lang).alias("lang"))
        for lang, hits in sorted(scored, key=lambda kv: kv[0])
    ])
    best = sf.array_max(sf.filter(structs, lambda s: s["hits"] > 0))
    return sf.coalesce(best["lang"], sf.lit("und"))


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach n_tokens / punct_ratio / quality / lang_pred columns."""
    t = sf.col(text_col)
    return df.withColumns({
        "n_tokens": token_count(t),
        "punct_ratio": punct_ratio(t),
        "quality": quality_score(t),
        "lang_pred": predict_lang(t),
    })


# ---------------------------------------------------------------------------
# Rolling-hash fingerprint — no JVM primitive for a char-level polynomial
# hash, so this is the one Arrow-batched kernel in the module.
# ---------------------------------------------------------------------------

_FP_BASE = 1000003
_FP_MOD = (1 << 61) - 1


def _fingerprint_str(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * _FP_BASE + ord(ch)) % _FP_MOD
    return h


def with_fingerprint(df: DataFrame, text_col: str = "text",
                     out_col: str = "fingerprint") -> DataFrame:
    """Deterministic 61-bit polynomial rolling hash per document (content
    fingerprint for incremental-dedup manifests)."""
    from pyspark.sql import types as T

    # NB: StructType.add mutates in place — build a fresh copy.
    schema = T.StructType(list(df.schema.fields)
                          + [T.StructField(out_col, T.LongType())])

    def kernel(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            batch[out_col] = [
                _fingerprint_str(t) if isinstance(t, str) else 0
                for t in batch[text_col]
            ]
            yield batch

    return df.mapInPandas(kernel, schema=schema)
