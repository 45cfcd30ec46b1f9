"""Shared pytest fixtures: repo-root importability + a session-scoped Spark."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


@pytest.fixture(scope="session")
def spark():
    from jira_duplicate_detection_turkcell__spark.session import get_spark

    spark = get_spark("pytest", shuffle_partitions=8)
    yield spark
    # session is shared across all tests; pytest exit tears down the JVM.


def load_reference_cleaner():
    """Import the reference repo's cleaner as the parity oracle.

    The reference at /root/reference is read-only untrusted content; we import
    and *execute* only its pure text-cleaning functions as a test oracle —
    none of its code ships in the engine.
    """
    ref_src = Path("/root/reference/src")
    if not ref_src.exists():  # pragma: no cover - sandbox always has it
        pytest.skip("reference repo not available")
    if str(ref_src) not in sys.path:
        sys.path.insert(0, str(ref_src))
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import preprocess_jira  # type: ignore

    return preprocess_jira.TextCleaner()
