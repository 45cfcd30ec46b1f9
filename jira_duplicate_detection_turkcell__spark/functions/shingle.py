"""Shingling — entirely JVM-side (whole-stage codegen, zero Python).

The reference embeds whole texts with a sentence-transformer
(src/embedding_pipeline.py:96-108); the new engine's retrieval unit is the
shingle (SURVEY.md §2.11 C1). Tokenize / n-gram / hash all happen in Spark SQL
expressions (`split` / `transform` / `slice` / `xxhash64`), so the expensive
per-character work never crosses the Arrow boundary — only the much smaller
``array<long>`` shingle-hash sets do, and only when a pandas UDF (MinHash)
actually needs them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

XXHASH_SEED = 42  # fixed engine-wide; signatures must be reproducible


def tokens(text: Column) -> Column:
    """Whitespace tokens of already-cleaned (lowercased) text."""
    return F.split(F.trim(text), r"\s+")


def word_shingles(text: Column, w: int = 3) -> Column:
    """Distinct xxhash64 hashes of all ``w``-word shingles.

    Documents shorter than ``w`` tokens contribute their whole token string
    as a single shingle, so short docs still participate in dedup instead of
    vanishing. Output: ``array<long>`` (distinct, order irrelevant).
    """
    toks = tokens(text)
    n = F.size(toks)
    grams = F.when(
        n >= w,
        F.transform(
            F.sequence(F.lit(0), n - w),
            lambda i: F.array_join(F.slice(toks, i + 1, w), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))
    return F.array_distinct(F.transform(grams, lambda g: F.xxhash64(g, F.lit(XXHASH_SEED))))


def word_gram_strings(text: Column, w: int = 3) -> Column:
    """Distinct ``w``-word shingles as strings (array<string>).

    Same gram semantics as `word_shingles` but unhashed — used where the
    shingle itself must be join-key-visible (exact n-gram Jaccard with a
    SQL-expressible oracle)."""
    toks = tokens(text)
    n = F.size(toks)
    grams = F.when(
        n >= w,
        F.transform(
            F.sequence(F.lit(0), n - w),
            lambda i: F.array_join(F.slice(toks, i + 1, w), " "),
        ),
    ).otherwise(F.array(F.array_join(toks, " ")))
    return F.array_distinct(grams)


def char_shingles(text: Column, c: int = 9) -> Column:
    """Distinct xxhash64 hashes of all ``c``-char shingles (array<long>)."""
    n = F.length(text)
    grams = F.when(
        n >= c,
        F.transform(
            F.sequence(F.lit(1), n - c + 1),
            lambda i: F.substring(text, i, c),
        ),
    ).otherwise(F.array(text))
    return F.array_distinct(F.transform(grams, lambda g: F.xxhash64(g, F.lit(XXHASH_SEED))))
