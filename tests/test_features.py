"""F19 multi-family feature extraction — parity vs the reference extractor.

The reference TextFeatureExtractor (src/text_feature_extractor.py) is
imported at test time only, as a behavioral oracle, exactly like the
extract-parity suite does for the cleaner.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from jira_duplicate_detection_turkcell__spark.functions import features as FX
from jira_duplicate_detection_turkcell__spark.functions.textstats import truncate_ellipsis

TEXTS = [
    "BiP uygulaması iOS 14.5'te açılmıyor. iPhone 12'de test edildi.",
    "Whatsapp Android 11'de çöküyor. Kritik hata!",
    "Login component'inde bug var. Version 2.3.1",
    "Samsung Galaxy S21 Windows login problemi, severity: high",
    "the app: FooBar 99 crashes on macOS, low priority",
    "component: Payment Gateway   failure on iPad Pro",
    "nothing interesting here at all",
    "",
    "urgent! Instagram donuyor, versiyon 7.7.7 Huawei P30",
    # whitespace-only group(1): the FIRST matching pattern must win with ''
    # (stop-on-first-match), not fall through to a later pattern
    "app:\n\n!!! medium Checkout",
    # Turkish letters in UPPERCASE: needs Unicode case folding, (?i) alone
    # is ASCII-only in Java regex
    "sorun ÇOK YÜKSEK öncelikli, DÜŞÜK değil",
]
FAMILIES = ["application", "platform", "version", "device", "severity", "component"]


def _reference_extractor():
    ref_src = Path("/root/reference/src")
    if not ref_src.exists():  # pragma: no cover
        pytest.skip("reference repo not available")
    if str(ref_src) not in sys.path:
        sys.path.insert(0, str(ref_src))
    from text_feature_extractor import TextFeatureExtractor  # type: ignore

    return TextFeatureExtractor()


def test_feature_extraction_parity_vs_reference(spark):
    ref = _reference_extractor()
    expected = {
        t: ref.extract_all_features(t, FAMILIES) for t in TEXTS
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    out = FX.extract_features(df, "text")
    got_rows = {r["doc_id"]: r for r in out.collect()}
    for i, t in enumerate(TEXTS):
        for fam in FAMILIES:
            got = got_rows[i][fam]
            want = expected[t][fam]
            assert got == want, f"text {i!r} family {fam}: spark={got!r} ref={want!r}"


def test_sampled_hit_rate_extrapolation(spark):
    rows = [(i, "version 1.2.3" if i % 2 == 0 else "no match") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = FX.sampled_hit_rate(
        df, "text", {"version": [r"(\d+\.\d+\.\d+)"]}, sample_rows=10, order_col="doc_id"
    ).collect()[0]
    assert out["n_total"] == 40 and out["n_sample"] == 10
    # first 10 rows by doc_id → 5 hits → est = floor(5 * 40 / 10) = 20
    assert out["est_version"] == 20


def test_sampled_hit_rate_empty_table(spark):
    # the session pins ANSI mode, where x/0 raises instead of yielding
    # NULL — an empty corpus must produce a zero-count row, not a
    # SparkArithmeticException from the n_sample=0 denominator
    df = spark.createDataFrame([], "doc_id long, text string")
    out = FX.sampled_hit_rate(
        df, "text", {"version": [r"(\d+\.\d+\.\d+)"]}, sample_rows=10
    ).collect()[0]
    assert out["n_total"] == 0 and out["n_sample"] == 0
    assert out["est_version"] == 0


def test_version_triple_reference_zero_padding(spark):
    # oracle values hand-derived from the reference _normalize_version
    # (hybrid_search.py:254-262): every digit run is a component, first
    # three taken, zero-padded
    from jira_duplicate_detection_turkcell__spark.functions.versions import (
        version_triple,
    )

    cases = {
        "1.2.3": (1, 2, 3),
        "1.2": (1, 2, 0),
        "7": (7, 0, 0),
        "v1.2.3-beta4": (1, 2, 3),
        "iOS 14.5": (14, 5, 0),
        "": (0, 0, 0),
        "N/A": (0, 0, 0),
        None: (0, 0, 0),
        "no digits at all": (0, 0, 0),
    }
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(cases)], "id long, v string"
    )
    got = {
        r["id"]: (r["t"]["maj"], r["t"]["mnr"], r["t"]["pat"])
        for r in df.select("id", version_triple(F.col("v")).alias("t")).collect()
    }
    for i, v in enumerate(cases):
        assert got[i] == cases[v], f"{v!r}: {got[i]} != {cases[v]}"


def test_version_similarity_reference_branches(spark):
    # oracle values hand-derived from _calculate_version_similarity
    # (hybrid_search.py:264-289): exact → 1.0; (maj, mnr) match →
    # 0.9 − 0.05·patch_diff (UNclamped); maj match → 0.7 − 0.1·minor_diff;
    # maj mismatch or maj == 0 → 0.0; ''/'N/A' either side → 0.0 pre-parse
    from jira_duplicate_detection_turkcell__spark.functions.versions import (
        version_similarity,
    )

    cases = [
        ("1.2.3", "1.2.3", 1.0),
        ("1.2.3", "1.2.5", 0.8),
        ("1.2.3", "1.2.33", 0.9 - 0.05 * 30),  # unclamped, goes negative
        ("1.2.3", "1.5.0", 0.4),
        ("1.2.3", "2.2.3", 0.0),
        ("0.2.3", "0.5.0", 0.0),  # equal majors but 0 → mismatch branch
        ("0", "0.0", 1.0),  # both parse to (0,0,0) → exact-match branch
        ("", "1.2.3", 0.0),
        ("N/A", "N/A", 0.0),
        ("1.2", "1.2.0", 1.0),  # zero padding
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b, _) in enumerate(cases)],
        "id long, a string, b string",
    )
    got = {
        r["id"]: r["s"]
        for r in df.select(
            "id", version_similarity(F.col("a"), F.col("b")).alias("s")
        ).collect()
    }
    for i, (a, b, want) in enumerate(cases):
        assert abs(got[i] - want) < 1e-9, f"{a!r} vs {b!r}: {got[i]} != {want}"


def test_truncate_ellipsis(spark):
    df = spark.createDataFrame(
        [(1, "x" * 250), (2, "short")], "id long, text string"
    )
    got = {
        r["id"]: r["t"]
        for r in df.select("id", truncate_ellipsis(F.col("text"), 200).alias("t")).collect()
    }
    assert got[1] == "x" * 200 + "..." and len(got[1]) == 203
    assert got[2] == "short"
