"""Structured Streaming parity, incremental append dedup, and CLI packaging."""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from jira_duplicate_detection_turkcell__spark import synth
from jira_duplicate_detection_turkcell__spark.plans import pipeline as P
from jira_duplicate_detection_turkcell__spark.streaming import incremental, windows

SF_DIR = "/root/testdata/sf0.001"
CFG = P.DedupConfig(minhash_bucket_cap=10_000, simhash_bucket_cap=10_000)


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    src = tmp_path / "events_src"
    spark.read.parquet(f"{SF_DIR}/events.parquet").write.parquet(str(src))
    batch_df = spark.read.parquet(str(src))
    expected = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value_cents"])
        for r in windows.windowed_event_counts(batch_df).collect()
    }

    stream = spark.readStream.schema(batch_df.schema).parquet(str(src))
    out = windows.windowed_event_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value_cents"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == expected


def test_streaming_signatures_match_batch(spark, tmp_path):
    src = tmp_path / "pages_src"
    pages = spark.createDataFrame(synth.generate_pages_pdf(48, seed=42))
    pages.write.parquet(str(src))
    batch_pages = spark.read.parquet(str(src))

    expected = {
        r["url"]: (list(r["minhash_sig"]), r["simhash"])
        for r in windows.streaming_signatures(batch_pages, CFG).collect()
    }
    stream = spark.readStream.schema(batch_pages.schema).parquet(str(src))
    q = (
        windows.streaming_signatures(stream, CFG)
        .writeStream.format("memory")
        .queryName("sigs")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["url"]: (list(r["minhash_sig"]), r["simhash"])
        for r in spark.sql("SELECT * FROM sigs").collect()
    }
    assert got == expected


def test_incremental_append_equals_full_rerun(spark):
    """Split the corpus; batch 1 + incremental batch 2 must equal one full run."""
    pdf = synth.generate_pages_pdf(96, seed=42)
    pages_all = spark.createDataFrame(pdf)
    pages_1 = spark.createDataFrame(pdf.iloc[:64])
    pages_2 = spark.createDataFrame(pdf.iloc[64:])

    full = P.run_dedup(spark, pages_all, CFG)
    full_assign = {r["url"]: r["cluster_id"] for r in full["clusters"].collect()}

    base = P.run_dedup(spark, pages_1, CFG)
    upd = incremental.apply_append(base["signatures"], base["edges"], pages_2, CFG)
    inc_assign = {r["url"]: r["cluster_id"] for r in upd["clusters"].collect()}

    assert inc_assign == full_assign


def test_cli_dedup_in_process(spark, tmp_path):
    from jira_duplicate_detection_turkcell__spark import cli

    out_dir = tmp_path / "clusters"
    cli.main(
        [
            "dedup",
            "--synth-n", "64",
            "--output", str(out_dir),
            "--checkpoint-dir", str(tmp_path / "ckpt"),
        ]
    )
    result = spark.read.parquet(str(out_dir))
    assert result.count() > 0
    assert set(result.columns) == {"url", "cluster_id"}


def test_pyfiles_zip_builds_and_imports(tmp_path):
    repo = Path(__file__).resolve().parent.parent
    subprocess.run(
        ["bash", str(repo / "scripts" / "make_pyfiles.sh")], check=True, cwd=repo,
        capture_output=True,
    )
    zip_path = repo / "dist" / "jdt_spark.zip"
    assert zip_path.exists()
    # the zip must be importable standalone (zipimport), as --py-files requires
    code = (
        "import sys; sys.path.insert(0, sys.argv[1]); "
        "import jira_duplicate_detection_turkcell__spark.plans.pipeline as p; "
        "print(p.DedupConfig().fingerprint())"
    )
    out = subprocess.run(
        [sys.executable, "-c", code, str(zip_path)],
        check=True, capture_output=True, text=True,
    )
    assert len(out.stdout.strip()) == 16
