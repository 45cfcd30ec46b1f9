"""Multi-family regex feature extraction — F19 (+ A6 sampled hit-rate).

Capability replaced: the reference's TextFeatureExtractor
(src/text_feature_extractor.py:18-90): six pattern families
(application / platform / version / device / severity / component), each a
prioritized pattern list where the FIRST matching pattern's group(1) wins,
with severity values normalized through a fixed map (:55-60, :96-98), and a
sampled hit-rate estimator (suggest_extractions, :153-181) that counts
matches on a bounded sample and extrapolates to the full table.

Spark-side: each family compiles to one codegen expression — a chained
``CASE WHEN rlike(p1) THEN trim(regexp_extract(p1)) WHEN rlike(p2) …`` —
so a 6-family extraction over any corpus size is a single whole-stage-
codegen projection: no UDFs, no Python, shuffles nothing. The CASE gates
on *pattern match*, not on a non-empty capture, replicating the
reference's stop-on-first-match exactly: a matching pattern whose
group(1).strip() is '' returns '' and stops (a coalesce-of-nullif
fell through to later patterns there). The severity normalization is a
chained CASE. Pattern semantics note: the reference matches with Python's
re.IGNORECASE (Unicode case folding and word classes); the default
families below carry an inline ``(?iU)`` — Java's CASE_INSENSITIVE +
UNICODE_CHARACTER_CLASS (which implies UNICODE_CASE) — so Turkish-letter
alternatives (yüksek, düşük, çalışmıyor) fold case like the reference
(plain ``(?i)`` is ASCII-only in Java).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Reference pattern families (src/text_feature_extractor.py:20-52), ported
# verbatim in intent; first match wins, group(1) is the value.
REFERENCE_FAMILIES: dict[str, list[str]] = {
    "application": [
        r"(?iU)\b([A-Z][a-z]+(?:\s+[A-Z][a-z]+)*)\s+(?:uygulaması|application|app)",
        r"(?iU)(?:uygulama|app):\s*([A-Za-z0-9\s]+)",
        r"(?iU)\b(BiP|Whatsapp|Instagram|Facebook|Twitter|Gmail|YouTube)\b",
        r"(?iU)\b([A-Z][a-z]{2,})\s+(?:çalışmıyor|açılmıyor|donuyor)",
    ],
    "platform": [
        r"(?iU)\b(iOS|Android|Windows|macOS|Linux|Web)\b",
        r"(?iU)\b(iPhone|iPad|Samsung|Huawei)\b",
    ],
    "version": [
        r"(?iU)(?:version|versiyon|v\.?)\s*:?\s*(\d+(?:\.\d+)*)",
        r"(?iU)\b(\d+\.\d+(?:\.\d+)?)\b",
        r"(?iU)iOS\s+(\d+(?:\.\d+)*)",
        r"(?iU)Android\s+(\d+(?:\.\d+)*)",
    ],
    "device": [
        r"(?iU)\b(iPhone\s+\d+(?:\s+Pro)?(?:\s+Max)?)\b",
        r"(?iU)\b(iPad(?:\s+Pro)?(?:\s+Air)?)\b",
        r"(?iU)\b(Samsung\s+Galaxy\s+[A-Z]\d+)\b",
        r"(?iU)\b(Huawei\s+[A-Z0-9]+)\b",
    ],
    "severity": [
        r"(?iU)\b(critical|kritik|acil|urgent)\b",
        r"(?iU)\b(high|yüksek|önemli)\b",
        r"(?iU)\b(medium|orta|normal)\b",
        r"(?iU)\b(low|düşük|minor)\b",
    ],
    "component": [
        r"(?iU)(?:component|bileşen|modül):\s*([A-Za-z0-9\s]+)",
        r"(?iU)\b(Login|Register|Payment|Checkout|Search|Profile)\b",
    ],
}

# Severity normalization (src/text_feature_extractor.py:55-60)
SEVERITY_MAP: dict[str, str] = {
    "critical": "Critical", "kritik": "Critical", "acil": "Critical",
    "urgent": "Critical",
    "high": "High", "yüksek": "High", "önemli": "High",
    "medium": "Medium", "orta": "Medium", "normal": "Medium",
    "low": "Low", "düşük": "Low", "minor": "Low",
}


def extract_family(text: Column, patterns: list[str]) -> Column:
    """First-MATCH-wins extraction over a prioritized pattern list.

    NULL when no pattern matches (the reference returns None); the first
    matching pattern's group(1) is trimmed and returned *even when empty*
    (the reference returns match.group(1).strip() and stops —
    src/text_feature_extractor.py:79-88), so the gate is ``rlike``, not a
    non-empty capture: 'app:\\n\\n!!!' yields '' here, never a later
    pattern's value.
    """
    expr = None
    for p in patterns:
        cond = text.rlike(p)
        # Python's .strip() removes ALL (unicode) whitespace; SQL trim()
        # removes only spaces — '\n' captures diverged under trim
        val = F.regexp_replace(F.regexp_extract(text, p, 1), r"(?U)^\s+|\s+$", "")
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr


def normalize_severity(value: Column, mapping: dict[str, str] | None = None) -> Column:
    """Map raw severity words to canonical levels; unknown values pass through."""
    mapping = SEVERITY_MAP if mapping is None else mapping
    expr = None
    low = F.lower(value)
    for raw, canon in mapping.items():
        cond = low == raw
        expr = F.when(cond, canon) if expr is None else expr.when(cond, canon)
    return expr.otherwise(value) if expr is not None else value


def extract_features(
    df: DataFrame,
    text_col: str = "text",
    families: dict[str, list[str]] | None = None,
    severity_map: dict[str, str] | None = None,
) -> DataFrame:
    """Add one extracted column per family (reference add_extracted_columns,
    src/text_feature_extractor.py:104-148) — all codegen, zero Python."""
    families = REFERENCE_FAMILIES if families is None else families
    out = df
    for fam, patterns in families.items():
        col = extract_family(F.col(text_col), patterns)
        if fam == "severity":
            col = normalize_severity(col, severity_map)
        out = out.withColumn(fam, col)
    return out


def sampled_hit_rate(
    df: DataFrame,
    text_col: str = "text",
    families: dict[str, list[str]] | None = None,
    sample_rows: int = 100,
    order_col: str | None = None,
) -> DataFrame:
    """A6: estimate per-family extraction counts from a bounded sample.

    Mirrors the reference's suggest_extractions
    (src/text_feature_extractor.py:153-181): take the first ``sample_rows``
    rows, count rows where the family extracts non-null, extrapolate with
    ``floor(count · total / sample)``. ``order_col`` pins the sample
    deterministically (a bare head() is partition-layout-dependent on a
    distributed table). Returns ONE row: n_total, n_sample, and one
    ``est_<family>`` column per family.
    """
    families = REFERENCE_FAMILIES if families is None else families
    total = df.count()
    sample = df
    if order_col is not None:
        sample = sample.orderBy(order_col)
    sample = sample.limit(sample_rows)
    aggs = [
        F.count(F.lit(1)).alias("n_sample"),
    ]
    for fam, patterns in families.items():
        hit = extract_family(F.col(text_col), patterns).isNotNull()
        aggs.append(
            F.sum(F.when(hit, 1).otherwise(0)).alias(f"_hits_{fam}")
        )
    row = sample.agg(*aggs)
    est_cols = [F.lit(total).cast("long").alias("n_total"), F.col("n_sample")]
    for fam in families:
        est_cols.append(
            # guard the empty-table case: the session pins ANSI mode, where
            # x/0 raises SparkArithmeticException instead of yielding NULL —
            # CASE WHEN evaluates the division only when n_sample > 0
            F.when(
                F.col("n_sample") > 0,
                F.floor(F.col(f"_hits_{fam}") * F.lit(total) / F.col("n_sample")),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias(f"est_{fam}")
        )
    return row.select(*est_cols)
