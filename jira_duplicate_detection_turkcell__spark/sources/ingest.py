"""Sources — the engine-side equivalents of the reference's scan surface.

Reference scans (SURVEY.md §2.1): robust CSV with encoding×separator sniffing
(S1/S2, src/preprocess_jira.py:517-547, src/duplike_preprocess/fix_encoding.py
:108-199), multipart upload grid (S4, api_server.py:972-1052), parquet load
(S5), schema-pinned parquet sink (S6).

Spark-side: a fixed schema is the contract (schema-on-read sniffing is a
single-node habit the distributed engine replaces with explicit DDL), but the
robust-CSV capability is preserved for ingest jobs: `read_csv_robust` tries
the same encoding×separator grid the reference does, each attempt a cheap
sample-limited Spark read, and returns the first parse that yields enough
columns — then the full distributed read runs with the winning combination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the input_hint contract (BASELINE.json): the production pages table
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

ENCODINGS = ["UTF-8", "ISO-8859-1", "windows-1252"]  # reference :523
SEPARATORS = [";", ",", "\t", "|"]  # reference :524 (semicolon-first)


def read_pages(spark: SparkSession, path: str) -> DataFrame:
    """Load the pages table (parquet; Iceberg would be
    ``spark.read.format("iceberg").load(...)`` — same downstream code)."""
    return spark.read.schema(PAGES_SCHEMA).parquet(path)


def read_csv_robust(
    spark: SparkSession,
    path: str,
    min_columns: int = 5,
    multi_line: bool = True,
) -> DataFrame:
    """Encoding × separator grid scan, reference-compatible (S1/S2/S4).

    Every attempt checks the header column count AND parses a 10-row sample
    under the exact options the full read would use (plus FAILFAST, so
    decode/malformed errors surface as exceptions instead of silent NULL
    rows) — a combination whose header splits wide enough but whose data
    rows don't parse must lose to a later one that parses. The winner is
    then used for the full distributed read with all columns as strings
    (the reference forces ``dtype=str``) and the reference's NA sentinels.
    """

    def _reader(mode: str):
        return (
            spark.read.option("header", True)
            .option("sep", sep)
            .option("encoding", encoding)
            .option("multiLine", multi_line)
            .option("quote", '"')
            .option("escape", '"')
            .option("nullValue", "")
            .option("inferSchema", False)
            .option("mode", mode)
        )

    last_err: Exception | None = None
    for encoding in ENCODINGS:
        for sep in SEPARATORS:
            try:
                sample = _reader("FAILFAST").csv(path)
                if len(sample.columns) < min_columns:
                    continue
                sample.limit(10).collect()  # parse real rows, not just header
                df = _reader("PERMISSIVE").csv(path)
                # strip BOM/whitespace from headers (reference :541)
                for c in df.columns:
                    clean = c.strip().replace("﻿", "")
                    if clean != c:
                        df = df.withColumnRenamed(c, clean)
                return df
            except Exception as exc:  # try next combination
                last_err = exc
    raise ValueError(f"CSV could not be parsed with any encoding/separator: {last_err}")


def validate_columns(df: DataFrame, expected: list[str]) -> None:
    """Fail fast on missing columns (reference :550-558)."""
    missing = [c for c in expected if c not in df.columns]
    if missing:
        raise ValueError(f"Required columns missing: {missing}; have {df.columns}")


def write_pages(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Schema-pinned sink (S6): enforce the pages schema on write."""
    cols = [f.name for f in PAGES_SCHEMA.fields if f.name in df.columns]
    df.select(*cols).write.mode(mode).parquet(path)


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Partitioned parquet sink — the plain-parquet analog of the north
    rule's Iceberg partition spec (days(warc_ts) / bucket(url)): partition
    values become directory keys, so filters on them prune whole
    directories at planning time (``PartitionFilters`` in the scan, P4).
    On Iceberg the same write is ``.writeTo(tbl).partitionedBy(
    days("warc_ts"), bucket(N, "url"))`` with hidden transforms; reference
    analog: per-platform index selection (hybrid_search.py:361-386).
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """CSV debug sink (S7; reference preprocess_duplicate.py:499-506)."""
    df.write.mode(mode).option("header", True).csv(path)
