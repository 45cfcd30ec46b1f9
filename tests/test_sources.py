"""Source-surface tests: robust CSV grid scan, pages schema round-trip."""

from __future__ import annotations

import pytest

from jira_duplicate_detection_turkcell__spark import synth
from jira_duplicate_detection_turkcell__spark.sources import ingest


def test_read_csv_robust_semicolon(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text(
        "A;B;C;D;E\n1;x;y;z;w\n2;q;r;s;t\n", encoding="utf-8"
    )
    df = ingest.read_csv_robust(spark, str(p))
    assert df.columns == ["A", "B", "C", "D", "E"]
    assert df.count() == 2


def test_read_csv_robust_comma_with_quotes(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text(
        'A,B,C,D,E\n1,"multi\nline",y,z,w\n', encoding="utf-8"
    )
    df = ingest.read_csv_robust(spark, str(p))
    assert df.count() == 1
    assert "multi\nline" in df.collect()[0]["B"]


def test_read_csv_robust_bom_header(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_bytes("﻿A;B;C;D;E\n1;2;3;4;5\n".encode("utf-8"))
    df = ingest.read_csv_robust(spark, str(p))
    assert "A" in df.columns


def test_validate_columns_raises(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("A;B;C;D;E\n1;2;3;4;5\n")
    df = ingest.read_csv_robust(spark, str(p))
    ingest.validate_columns(df, ["A", "B"])  # present → no raise
    with pytest.raises(ValueError, match="missing"):
        ingest.validate_columns(df, ["A", "ZZZ"])


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    # P4: a filter on the partition column must appear as PartitionFilters
    # in the scan (directory pruning), not just a data filter
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    rows = [(i, f"doc {i}", ["en", "de", "fr"][i % 3]) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = str(tmp_path / "by_lang")
    ingest.write_partitioned(df, out, ["lang"])

    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    assert back.count() == 10
    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert "(lang" in plan and "= en)" in plan


def test_csv_sink_roundtrip(spark, tmp_path):
    rows = [(1, "alpha"), (2, "beta")]
    df = spark.createDataFrame(rows, "id long, name string")
    out = str(tmp_path / "csv_out")
    ingest.write_csv(df, out)
    back = spark.read.option("header", True).csv(out)
    assert {(int(r["id"]), r["name"]) for r in back.collect()} == set(rows)


def test_pages_write_read_roundtrip(spark, tmp_path):
    pages = spark.createDataFrame(synth.generate_pages_pdf(16, seed=42)).withColumn(
        "text", __import__("pyspark").sql.functions.lit(None).cast("string")
    )
    out = tmp_path / "pages"
    ingest.write_pages(pages, str(out))
    back = ingest.read_pages(spark, str(out))
    assert back.count() == 16
    assert [f.name for f in back.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]

def test_extract_docs_single_pass_and_filtering(spark):
    """extract_docs: one Python pass, byte-equal to extract_text per row,
    null/empty-html rows dropped (the old pandas-UDF + JVM-filter shape
    evaluated the cleaner twice; this pins the replacement's semantics)."""
    from pyspark.sql import Row

    from jira_duplicate_detection_turkcell__spark.extract import (
        BODY_CLOSE,
        BODY_OPEN,
        extract_docs,
        extract_text,
    )

    rows = [
        Row(url="u1", html=f"<x>{BODY_OPEN}Hello World version 1.2.3{BODY_CLOSE}</x>".encode()),
        Row(url="u2", html=None),
        Row(url="u3", html=f"{BODY_OPEN}{BODY_CLOSE}".encode()),  # empty body
        Row(url="u4", html=f"{BODY_OPEN}  IOS crash at 10.0.0.1  {BODY_CLOSE}".encode()),
    ]
    out = {r["url"]: r["text"] for r in extract_docs(spark.createDataFrame(rows)).collect()}
    assert set(out) == {"u1", "u4"}  # null + empty-body rows dropped
    for r in rows:
        if r.url in out:
            assert out[r.url] == extract_text(r.html)
    # plan shape: exactly ONE Python evaluation node, no ArrowEvalPython
    plan = extract_docs(spark.createDataFrame(rows))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "ArrowEvalPython" not in plan
