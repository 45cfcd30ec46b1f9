"""Exact substring dedup — the C4 path (suffix array + fingerprint join).

Capability replaced: the reference's substring-semantics duplicate deletion
(`str.contains(old_summary)`, api_server.py:800-813) and boilerplate
detection. Two cooperating mechanisms:

1. **Mod-sampled fingerprint join (the scale path).** Every L-char shingle
   hash with ``hash % sample == 0`` is a fingerprint (deterministic 1/sample
   sampling of the shingle stream — any shared substring of length
   ≥ L + sample·E[gap] shares a fingerprint w.h.p.; with sample=1 recall is
   exact for shared substrings ≥ L). Docs are joined on fingerprints —
   JVM-side end to end, same hot-bucket capping as LSH.

2. **Per-partition suffix array (the exact verifier).** Inside
   ``applyInPandas`` over fingerprint-bucketed groups, a numpy prefix-doubling
   suffix array + Kasai LCP over the concatenated member texts emits, for
   every adjacent cross-document suffix pair, the exact shared-substring
   length; pairs with LCP ≥ L become verified edges. Exactness is scoped to
   within a bucket-group — the fingerprint join is what brings substring-
   sharing docs into the same group across partitions (SURVEY.md §7.5
   boundary contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.shingle import char_shingles


def fingerprints(text, length: int = 32, sample: int = 1):
    """array<long> of mod-sampled L-char shingle hashes (JVM-side)."""
    sh = char_shingles(text, length)
    if sample <= 1:
        return sh
    return F.filter(sh, lambda h: F.pmod(h, F.lit(sample)) == 0)


def fingerprint_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "url",
    length: int = 32,
    sample: int = 1,
    max_bucket_size: int = 200,
) -> tuple[DataFrame, DataFrame]:
    """Docs sharing ≥1 fingerprint → candidate pairs + salted-fp lineage.

    Hot fingerprints (boilerplate shared by >cap docs) are salted, not
    dropped (operators/buckets.py) — full recall, bounded per-task work.
    """
    from .buckets import salted_bucket_pairs

    fps = docs.select(
        F.col(key_col),
        F.explode(fingerprints(F.col(text_col), length, sample)).alias("fp"),
    ).distinct()
    pairs, hot = salted_bucket_pairs(fps, ["fp"], key_col, max_bucket_size)
    return pairs.distinct(), hot


# --------------------------------------------------------------------------
# numpy suffix array (prefix doubling) + Kasai LCP
# --------------------------------------------------------------------------

def suffix_array(codes: np.ndarray) -> np.ndarray:
    """Suffix array of an int sequence via prefix doubling (O(n log² n))."""
    n = codes.size
    rank = np.unique(codes, return_inverse=True)[1].astype(np.int64)
    sa = np.argsort(rank, kind="stable")
    k = 1
    while k < n:
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        order = np.lexsort((second, rank))
        pair = np.stack([rank[order], second[order]], axis=1)
        new_rank = np.empty(n, dtype=np.int64)
        changed = np.any(pair[1:] != pair[:-1], axis=1)
        new_rank[order] = np.concatenate(([0], np.cumsum(changed)))
        sa, rank = order, new_rank
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa


def lcp_array(codes: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = LCP(suffix sa[i], suffix sa[i+1])."""
    n = codes.size
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    lcp = np.zeros(max(n - 1, 0), dtype=np.int64)
    h = 0
    for i in range(n):
        r = rank[i]
        if r < n - 1:
            j = sa[r + 1]
            while i + h < n and j + h < n and codes[i + h] == codes[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def _group_spans(pdf: pd.DataFrame, min_len: int) -> pd.DataFrame:
    """Exact shared-substring pairs within one group of docs.

    Concatenate member texts with unique negative separators, build the
    suffix array, and for each *adjacent* suffix pair from different docs
    with LCP ≥ min_len emit (key_l, key_r, span_len). Adjacency in SA order
    suffices: any cross-doc repeat ≥ min_len induces at least one adjacent
    cross-doc pair with LCP ≥ min_len within its SA run.
    """
    keys = pdf["url"].tolist()
    texts = pdf["text"].tolist()
    parts, owners = [], []
    for idx, t in enumerate(texts):
        codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
        parts.append(codes)
        parts.append(np.array([-(idx + 1)], dtype=np.int64))  # unique separator
        owners.append(np.full(codes.size + 1, idx, dtype=np.int64))
    if not parts:
        return pd.DataFrame({"key_l": [], "key_r": [], "span_len": []})
    codes = np.concatenate(parts)
    owner = np.concatenate(owners)
    sa = suffix_array(codes)
    lcp = lcp_array(codes, sa)
    if lcp.size == 0:
        return pd.DataFrame({"key_l": pd.Series(dtype=str), "key_r": pd.Series(dtype=str), "span_len": pd.Series(dtype="int64")})
    o1, o2 = owner[sa[:-1]], owner[sa[1:]]
    mask = (lcp >= min_len) & (o1 != o2)
    rows = {}
    for a, b, ln in zip(o1[mask], o2[mask], lcp[mask]):
        ka, kb = (keys[a], keys[b]) if keys[a] < keys[b] else (keys[b], keys[a])
        prev = rows.get((ka, kb), 0)
        if ln > prev:
            rows[(ka, kb)] = int(ln)
    if not rows:
        return pd.DataFrame({"key_l": pd.Series(dtype=str), "key_r": pd.Series(dtype=str), "span_len": pd.Series(dtype="int64")})
    ks = list(rows)
    return pd.DataFrame(
        {"key_l": [k[0] for k in ks], "key_r": [k[1] for k in ks], "span_len": [rows[k] for k in ks]}
    )


def substring_edges(
    docs: DataFrame,
    text_col: str = "text",
    key_col: str = "url",
    min_len: int = 32,
    sample: int = 1,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Verified exact-shared-substring edges (key_l, key_r, span_len).

    Plan: fingerprint join groups substring-sharing docs; each candidate
    *connected group* (grouped by min fingerprint partner — here simply by
    pair) is verified by the per-group suffix array. To keep verification
    pairwise-local we apply the SA per candidate pair's two texts grouped via
    applyInPandas over pair ids — exact, touches candidates only.
    """
    pairs, _hot = fingerprint_candidate_pairs(
        docs, text_col, key_col, min_len, sample, max_bucket_size
    )
    slim = docs.select(F.col(key_col), F.col(text_col))
    left = slim.select(F.col(key_col).alias("key_l"), F.col(text_col).alias("text_l"))
    right = slim.select(F.col(key_col).alias("key_r"), F.col(text_col).alias("text_r"))
    cand = pairs.join(left, "key_l").join(right, "key_r")

    def verify(pdf: pd.DataFrame) -> pd.DataFrame:
        out_l, out_r, out_len = [], [], []
        for key_l, key_r, t1, t2 in zip(
            pdf["key_l"], pdf["key_r"], pdf["text_l"], pdf["text_r"]
        ):
            g = _group_spans(
                pd.DataFrame({"url": [key_l, key_r], "text": [t1, t2]}), min_len
            )
            if len(g):
                out_l.append(key_l)
                out_r.append(key_r)
                out_len.append(int(g["span_len"].max()))
        return pd.DataFrame({"key_l": out_l, "key_r": out_r, "span_len": out_len})

    # group by hash of the pair → balanced verification partitions
    grouped = cand.withColumn(
        "pair_bucket", F.pmod(F.xxhash64("key_l", "key_r"), F.lit(256))
    )
    return grouped.groupBy("pair_bucket").applyInPandas(
        verify, "key_l string, key_r string, span_len long"
    )
