"""No-JVM unit tests for the numpy signature kernel internals.

Pins the cache-blocked MinHash loop (`_minhash_blocked`) to the naive
one-permutation-at-a-time computation it replaced: blocking changes memory
access order only, never a single output bit. Exercises row-length shapes
that straddle block boundaries, including a single row larger than the
whole block.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from jira_duplicate_detection_turkcell__spark.operators import signatures as S
from jira_duplicate_detection_turkcell__spark.operators.minhash import _permutations


def _naive_minhash(g, offsets, a, b, num_perm):
    out = np.empty((offsets.size, num_perm), dtype=np.uint64)
    for k in range(num_perm):
        hv = a[k] * g + b[k]
        out[:, k] = np.minimum.reduceat(hv, offsets)
    return out


def _random_case(rng, n_rows, max_len):
    lengths = rng.integers(1, max_len, size=n_rows)
    g = rng.integers(0, 2**63, size=int(lengths.sum()), dtype=np.uint64)
    offsets = np.zeros(n_rows, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    return g, offsets


def test_blocked_minhash_equals_naive():
    rng = np.random.default_rng(11)
    a, b = _permutations(128, 7)
    for n_rows, max_len in [(1, 5), (7, 40), (300, 700), (50, 3)]:
        g, offsets = _random_case(rng, n_rows, max_len)
        hv_buf = np.empty(g.size, dtype=np.uint64)
        got = S._minhash_blocked(g, offsets, a, b, 128, hv_buf)
        want = _naive_minhash(g, offsets, a, b, 128)
        assert np.array_equal(got, want), (n_rows, max_len)


def test_blocked_minhash_row_larger_than_block():
    """One row with more grams than _MINHASH_BLOCK must still be exact."""
    rng = np.random.default_rng(12)
    big = S._MINHASH_BLOCK + 1234
    lengths = np.array([3, big, 17], dtype=np.int64)
    g = rng.integers(0, 2**63, size=int(lengths.sum()), dtype=np.uint64)
    offsets = np.zeros(3, dtype=np.int64)
    np.cumsum(lengths[:-1], out=offsets[1:])
    a, b = _permutations(16, 7)
    hv_buf = np.empty(g.size, dtype=np.uint64)
    got = S._minhash_blocked(g, offsets, a, b, 16, hv_buf)
    want = _naive_minhash(g, offsets, a, b, 16)
    assert np.array_equal(got, want)


def test_simhash_chunk_size_invariance():
    """SimHash output must not depend on the vote-chunk size."""
    rng = np.random.default_rng(13)
    lengths = np.array([0, 5, 2 * S._SIMHASH_CHUNK + 77, 1, 1000], dtype=np.int64)
    tflat = rng.integers(0, 2**63, size=int(lengths.sum()), dtype=np.uint64)
    bit_idx = np.arange(64, dtype=np.uint64)
    base = S._simhash_from_flat(tflat, lengths, bit_idx)
    old_chunk = S._SIMHASH_CHUNK
    try:
        S._SIMHASH_CHUNK = 999  # awkward non-power-of-two chunking
        alt = S._simhash_from_flat(tflat, lengths, bit_idx)
    finally:
        S._SIMHASH_CHUNK = old_chunk
    assert np.array_equal(base, alt)


def test_text_sign_kernel_end_to_end_stability():
    """Full text kernel: batch-size invariance (blocking must not leak
    across batch boundaries) and deterministic output."""
    texts = [
        "alpha beta gamma delta epsilon zeta " * 30,
        "one two three",
        "",
        "solo",
        "alpha beta gamma delta epsilon zeta " * 30,  # dup of row 0
    ] * 8
    pdf = pd.DataFrame({"url": [f"u{i}" for i in range(len(texts))], "text": texts})
    kernel = S.text_sign_compute()

    def run(batch_size):
        outs = list(
            kernel(iter(pdf.iloc[i : i + batch_size] for i in range(0, len(pdf), batch_size)))
        )
        out = pd.concat(outs, ignore_index=True)
        return out.sort_values("url").reset_index(drop=True)

    a = run(3)
    b = run(40)
    assert list(a["url"]) == list(b["url"])
    for i in range(len(a)):
        assert np.array_equal(a["minhash_sig"][i], b["minhash_sig"][i])
        assert a["simhash"][i] == b["simhash"][i]
        assert np.array_equal(a["band_hashes"][i], b["band_hashes"][i])
    # byte-identical texts → identical signatures
    u0 = a[a["url"] == "u0"]["minhash_sig"].iloc[0]
    u4 = a[a["url"] == "u4"]["minhash_sig"].iloc[0]
    assert np.array_equal(u0, u4)


def test_zipimport_invalidate_stat_guard(tmp_path):
    """warm_daemon's stat guard: unchanged archives skip the directory
    re-read; a touched archive still invalidates."""
    import os
    import zipfile
    import zipimport

    from jira_duplicate_detection_turkcell__spark import warm_daemon

    # importing must NOT patch; only explicit activation (the daemon's
    # __main__ path) does
    warm_daemon.patch_zipimport_invalidate()
    assert getattr(zipimport.zipimporter.invalidate_caches, "_jdt_patch", False)
    zp = tmp_path / "m.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("modx.py", "x = 1\n")
    zi = zipimport.zipimporter(str(zp))
    calls = {"n": 0}
    orig = zipimport._read_directory

    def counting(path):
        calls["n"] += 1
        return orig(path)

    zipimport._read_directory = counting
    try:
        zi.invalidate_caches()
        zi.invalidate_caches()
        zi.invalidate_caches()
        assert calls["n"] == 1  # first call reads, guard absorbs the rest
        os.utime(zp, ns=(12345, 67890))
        zi.invalidate_caches()
        assert calls["n"] == 2  # mtime moved -> genuine re-read
    finally:
        zipimport._read_directory = orig
