"""Version-triple parsing and similarity — F13/F14/F15.

Capability replaced: the reference's ``_normalize_version`` and
``_calculate_version_similarity`` (hybrid_search.py:247-289): every run of
digits in the version string is a component, the first three are taken and
zero-padded to (major, minor, patch); similarity is 1.0 on an exact triple
match, 0.9 − 0.05·|patch diff| on a (major, minor) match, 0.7 − 0.1·|minor
diff| on a major-only match (major > 0), else 0.0 — with empty/'N/A'
versions scoring 0.0 against anything. The reference does NOT clamp the
linear falloffs at 0; neither does this port.

All codegen (``regexp_extract_all`` + array ops), zero Python. Divergence
note: components are cast to 64-bit ints; a digit run longer than 19 chars
would overflow where Python's int() would not (no real version string does).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NOT_A_VERSION = ("", "N/A")


def version_triple(version: Column) -> Column:
    """string → struct(maj, mnr, pat) — first three digit runs, zero-padded.

    NULL / '' / 'N/A' (the reference's sentinels) → (0, 0, 0), exactly as
    ``_normalize_version`` (hybrid_search.py:254-262).
    """
    nums = F.regexp_extract_all(F.coalesce(version, F.lit("")), F.lit(r"(\d+)"), 1)
    comp = [
        # try_element_at: NULL past the end (element_at throws under ANSI)
        F.coalesce(F.try_element_at(nums, F.lit(i)).cast("long"), F.lit(0)).alias(name)
        for i, name in ((1, "maj"), (2, "mnr"), (3, "pat"))
    ]
    return F.struct(*comp)


def _is_versionless(v: Column) -> Column:
    return v.isNull() | v.isin(*_NOT_A_VERSION)


def version_similarity(query_version: Column, result_version: Column) -> Column:
    """Reference-parity similarity in [−∞, 1.0] (unclamped linear falloffs).

    hybrid_search.py:264-289 semantics, including the pre-parse gate:
    an empty/'N/A'/NULL version on EITHER side scores 0.0 before parsing
    (so '' vs '' is 0.0 even though both parse to (0,0,0)), while '0' vs
    '0.0' parses to identical triples and scores 1.0.
    """
    q, r = version_triple(query_version), version_triple(result_version)
    score = (
        F.when(q == r, F.lit(1.0))
        .when(
            (q["maj"] == r["maj"]) & (q["maj"] > 0),
            F.when(
                q["mnr"] == r["mnr"],
                F.lit(0.9) - F.lit(0.05) * F.abs(q["pat"] - r["pat"]),
            ).otherwise(F.lit(0.7) - F.lit(0.1) * F.abs(q["mnr"] - r["mnr"])),
        )
        .otherwise(F.lit(0.0))
    )
    return F.when(
        _is_versionless(query_version) | _is_versionless(result_version), F.lit(0.0)
    ).otherwise(score)
