"""Parity for the duplicate-records cleaner variant vs its reference module
(/root/reference/src/duplike_preprocess/preprocess_duplicate.py), over the
same adversarial + fuzz corpora as the primary contract plus variant-specific
cases (URL-encoded URLs, case-sensitive platform words, smart quotes)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

from jira_duplicate_detection_turkcell__spark import extract_duplicate as exd
from tests.test_extract import ADVERSARIAL, _fuzz_corpus

VARIANT_CASES = [
    "encoded https%3A%2F%2Fwww.example.com%2Fpath%3Fq%3D1 end",
    "encoded-http http%3A%2F%2Ffoo.bar%2Fbaz, tail",
    "ios should stay lowercase, IOS becomes iOS, iphone stays",
    "Smart ‘single’ and ’apostrophe’ quotes stay cased",
    "MiXeD Case Text With UPPER and lower PRESERVED",
    "Test Step: single (variant needs Steps)\nTest Steps: plural",
    "https%3A%2F%2Flogs.example.com%2Fabc. punct tail",
]


def _reference_duplicate_cleaner():
    ref_src = Path("/root/reference/src/duplike_preprocess")
    if not ref_src.exists():  # pragma: no cover
        pytest.skip("reference repo not available")
    if str(ref_src) not in sys.path:
        sys.path.insert(0, str(ref_src))
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import preprocess_duplicate  # type: ignore

    return preprocess_duplicate


@pytest.fixture(scope="module")
def oracle():
    mod = _reference_duplicate_cleaner()
    return mod.TextCleaner(), mod


def test_duplicate_description_parity(oracle):
    cleaner, _ = oracle
    for s in ADVERSARIAL + VARIANT_CASES:
        assert exd.clean_description_duplicate(s) == cleaner.clean_description(s), repr(s)


def test_duplicate_summary_parity(oracle):
    cleaner, _ = oracle
    for s in ADVERSARIAL + VARIANT_CASES:
        assert exd.clean_summary_duplicate(s) == cleaner.clean_summary(s), repr(s)


def test_duplicate_description_parity_fuzz(oracle):
    cleaner, _ = oracle
    for s in _fuzz_corpus(n=300, seed=4242):
        assert exd.clean_description_duplicate(s) == cleaner.clean_description(s), repr(s)


def test_duplicate_summary_parity_fuzz(oracle):
    cleaner, _ = oracle
    for s in _fuzz_corpus(n=300, seed=2424):
        assert exd.clean_summary_duplicate(s) == cleaner.clean_summary(s), repr(s)


def test_duplicate_semver_column_parity(oracle):
    _, mod = oracle
    for v in ["", "v1.2.3", "v 1.2.3", " 1 . 2 . 3 ", "3.70.16", "v", "x.y"]:
        assert exd.normalize_semver_column_duplicate(v) == mod.normalize_semver(v), repr(v)


def test_variants_differ_where_documented():
    # the two cleaner variants must NOT collapse into one another
    from jira_duplicate_detection_turkcell__spark import extract as exj

    s = "MiXeD ios IOS ‘q’"
    dup = exd.clean_description_duplicate(s)
    jira = exj.clean_description(s)
    assert dup != jira
    assert "MiXeD" in dup and "mixed" in jira  # no lowercase in the variant
    assert " ios " in f" {dup} "  # case-sensitive platform sub leaves 'ios'
