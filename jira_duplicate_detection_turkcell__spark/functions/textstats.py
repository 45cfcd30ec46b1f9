"""Text analysis for training-data pipelines — all JVM-side expressions.

Language ID (stopword-hit heuristic), quality scoring, token counting, and
document fingerprinting over a text column. Every function returns Column
expressions built from pyspark.sql.functions only (whole-stage codegen, no
Python), and each has an exact ANSI-SQL equivalent used as the DuckDB oracle
in __spark_entry__.py. Counters are integers so cross-engine value hashing is
exact (no float formatting drift).

Reference analogs: language detection (src/preprocess_jira.py:110-210 — model
cascade, replaced by a deterministic heuristic), masking-stat counts
(:613-629), feature extraction (src/text_feature_extractor.py:18-90).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword alternations. ASCII-only on purpose: \b is
# ASCII-word-based in both Java regex and RE2, so non-ASCII letters (ç, ü, …)
# would sit on a false "boundary" and diverge between engines.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|on)\b",
    "tr": r"\b(ve|bir|bu|ile|olarak|daha|gibi|ama|bu|deneme)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|eine|auf)\b",
    "es": r"\b(el|la|los|las|que|de|en|un|una|por)\b",
    "fr": r"\b(le|la|les|des|une|est|dans|pour|qui|avec)\b",
}


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank text)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )


def uniq_token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.array_distinct(F.split(F.trim(text), r"\s+")))
    )


def total_token_chars(text: Column) -> Column:
    """Sum of token lengths = chars excluding whitespace."""
    return F.length(F.regexp_replace(text, r"\s+", ""))


def punct_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))


def digit_count(text: Column) -> Column:
    return F.length(text) - F.length(F.regexp_replace(text, r"[0-9]", ""))


def stopword_hits(text: Column, lang: str) -> Column:
    """Occurrences of the language's stopword alternation (lowercased input)."""
    return F.regexp_count(F.lower(text), F.lit(LANG_MARKERS[lang]))


def langid_heuristic(text: Column) -> Column:
    """argmax over stopword hit counts; deterministic tie-break by language
    code; 'unknown' when nothing matches."""
    pairs = [(lang, stopword_hits(text, lang)) for lang in sorted(LANG_MARKERS)]
    best_count = F.greatest(*[c for _, c in pairs])
    expr = F.lit("unknown")
    # build reversed when-chain so earlier (alphabetical) languages win ties
    for lang, cnt in reversed(pairs):
        expr = F.when((cnt == best_count) & (best_count > 0), F.lit(lang)).otherwise(expr)
    return expr


# Wider marker sets for the confidence-scored variant — the deterministic
# stand-in for the reference's CLD3→fastText→langdetect cascade
# (src/preprocess_jira.py:110-210), which emits "en (0.75)"-style
# language+confidence. Confidence here is evidence counts (best-language
# hits / total hits) kept as INTEGER columns so cross-engine value hashing
# is exact; consumers derive the ratio. ASCII-only for Java/RE2 \b parity.
LANG_MARKERS_EXT: dict[str, str] = {
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|eine|auf|von|zu|den|sich)\b",
    "en": r"\b(the|and|of|to|in|is|that|for|with|on|as|are|was|this)\b",
    "es": r"\b(el|la|los|las|que|de|en|un|una|por|con|para|su|es)\b",
    "fr": r"\b(le|la|les|des|une|est|dans|pour|qui|avec|sur|pas|par|plus)\b",
    "it": r"\b(il|che|di|e|un|una|per|con|del|sono|non|si|come|anche)\b",
    "nl": r"\b(de|het|een|en|van|is|dat|op|voor|met|zijn|niet|aan|ook)\b",
    "pt": r"\b(o|a|os|as|que|de|em|um|uma|para|com|por|nao|mais)\b",
    "tr": r"\b(ve|bir|bu|ile|olarak|daha|gibi|ama|icin|cok|var|yok|sonra|kadar)\b",
}


def langid_confidence_columns(text: Column) -> list[Column]:
    """(lang_pred, n_hits_best, n_hits_total) over the extended marker sets.

    ``n_hits_best / n_hits_total`` is the confidence analog of the
    reference cascade's score; 'unknown' rows have both counts derivable
    (best may be 0). Ties break alphabetically like langid_heuristic.
    """
    low = F.lower(text)
    pairs = [
        (lang, F.regexp_count(low, F.lit(pat)))
        for lang, pat in sorted(LANG_MARKERS_EXT.items())
    ]
    best = F.greatest(*[c for _, c in pairs])
    total = pairs[0][1]
    for _, c in pairs[1:]:
        total = total + c
    pred = F.lit("unknown")
    for lang, cnt in reversed(pairs):
        pred = F.when((cnt == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return [
        pred.alias("lang_pred"),
        best.cast("long").alias("n_hits_best"),
        total.cast("long").alias("n_hits_total"),
    ]


def fingerprint_md5(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of lowercased,
    whitespace-collapsed text (hex)."""
    normalized = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(normalized.cast("binary"))


# GPT-2-style pre-tokenizer regex, restricted to constructs Java regex and
# RE2 interpret identically (\p{L}/\p{N} unicode classes, alternation, no
# lookarounds) so the DuckDB oracle can run the same pattern verbatim.
BPE_TOKEN_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


def bpe_token_count(text: Column) -> Column:
    """Approximate LLM-token count: matches of the GPT-2-ish pre-tokenizer
    split pattern. The real byte-pair merge step needs a vocab (not in this
    sandbox); the split count is the standard cheap proxy a training-data
    pipeline budgets with."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_PATTERN))


def truncate_ellipsis(text: Column, max_chars: int = 200) -> Column:
    """F20: ``text[:N] + '...'`` when longer than N, else the text verbatim
    (reference hybrid_search.py:499)."""
    return F.when(
        F.length(text) > max_chars,
        F.concat(F.substring(text, 1, max_chars), F.lit("...")),
    ).otherwise(text)


def quality_columns(text: Column) -> list[Column]:
    """Integer quality-signal columns for filtering pipelines."""
    return [
        F.length(text).alias("n_chars"),
        token_count(text).alias("n_tokens"),
        uniq_token_count(text).alias("n_uniq_tokens"),
        total_token_chars(text).alias("n_token_chars"),
        punct_count(text).alias("n_punct"),
        digit_count(text).alias("n_digits"),
    ]
