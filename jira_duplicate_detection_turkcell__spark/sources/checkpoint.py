"""Stage checkpointing with per-partition lineage — the resume backbone.

The reference resumes by checking whether artifact files exist in cloud
storage and skipping recompute on a hit (src/user_embedding_pipeline.py:196-219,
src/firebase_storage_manager.py:173-202). The new engine generalizes that to
per-stage *table* commits: every pipeline stage writes its output table plus a
manifest recording row counts (total and per output partition), config
fingerprint, and free-form metrics; a resumed run loads any stage whose
manifest matches the current config fingerprint and recomputes only what is
missing — the north rule's snapshot-checkpoint semantics.

Storage backend: Iceberg would provide this natively via snapshot commits;
the `iceberg-spark-runtime` jar is not available in this sandbox (SURVEY.md
§7.5), so the default backend is partitioned Parquet + a JSON manifest that
emulates an atomic snapshot commit (write to a temp suffix, fsync manifest
last — the manifest's existence *is* the commit). The pipeline only ever
talks to this interface, so swapping in an Iceberg catalog is a backend
change, not a pipeline change.
"""

from __future__ import annotations

import json
import shutil
from dataclasses import asdict, dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageManifest:
    stage: str
    config_fingerprint: str
    row_count: int
    partition_rows: dict[str, int]
    metrics: dict = field(default_factory=dict)
    schema_ddl: str = ""
    file_count: int = 0
    # True when partition_rows holds only the first `file_cap` files (by
    # name) — row_count/file_count stay exact, computed executor-side
    partition_rows_truncated: bool = False


class StageStore:
    """Parquet + manifest-JSON stage store with atomic-commit semantics.

    ``file_cap`` bounds the per-file lineage section of the manifest: a
    100 TB stage writes 10⁵-10⁶ parquet files, and collecting one dict
    entry per file would make the manifest (and the driver collect behind
    it) grow with data size. Totals are aggregated executor-side and stay
    exact at any file count; per-file rows are recorded for the first
    ``file_cap`` files only, with ``partition_rows_truncated`` flagging the
    cut — so the manifest is O(file_cap) bytes regardless of scale.
    """

    def __init__(
        self, root: str | Path, config_fingerprint: str = "", file_cap: int = 1024
    ):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.config_fingerprint = config_fingerprint
        self.file_cap = file_cap

    # -- paths -------------------------------------------------------------
    def _data_dir(self, stage: str) -> Path:
        return self.root / stage / "data"

    def _manifest_path(self, stage: str) -> Path:
        return self.root / stage / "MANIFEST.json"

    # -- commit protocol ----------------------------------------------------
    def commit(self, stage: str, df: DataFrame, metrics: dict | None = None) -> StageManifest:
        """Write stage output + lineage manifest. The manifest write is last:
        a stage directory without a manifest is an aborted commit and is
        recomputed on resume (kill-and-resume test relies on this)."""
        data_dir = self._data_dir(stage)
        if data_dir.exists():
            shutil.rmtree(data_dir.parent)
        df.write.mode("overwrite").parquet(str(data_dir))

        # per-partition lineage: rows per committed parquet file, capped at
        # file_cap entries (exact totals aggregated executor-side first —
        # ONE 2-column row reaches the driver however many files exist)
        spark = df.sparkSession
        committed = spark.read.parquet(str(data_dir))
        # per_file is tiny (one row per file) — persist it so the totals
        # aggregate and the capped head read the committed stage ONCE
        per_file = committed.groupBy(F.input_file_name().alias("file")).count().persist()
        try:
            totals = per_file.agg(
                F.count(F.lit(1)).alias("n_files"), F.sum("count").alias("n_rows")
            ).collect()[0]
            file_count = int(totals["n_files"] or 0)
            head = per_file.orderBy("file").limit(self.file_cap).collect()
        finally:
            per_file.unpersist()
        partition_rows = {Path(r["file"]).name: r["count"] for r in head}
        manifest = StageManifest(
            stage=stage,
            config_fingerprint=self.config_fingerprint,
            row_count=int(totals["n_rows"] or 0),
            partition_rows=partition_rows,
            metrics=metrics or {},
            schema_ddl=committed.schema.simpleString(),
            file_count=file_count,
            partition_rows_truncated=file_count > self.file_cap,
        )
        tmp = self._manifest_path(stage).with_suffix(".tmp")
        tmp.write_text(json.dumps(asdict(manifest), indent=2))
        tmp.rename(self._manifest_path(stage))  # atomic on POSIX
        return manifest

    def is_committed(self, stage: str) -> bool:
        mp = self._manifest_path(stage)
        if not mp.exists():
            return False
        try:
            manifest = json.loads(mp.read_text())
        except (json.JSONDecodeError, OSError):
            return False
        return manifest.get("config_fingerprint") == self.config_fingerprint

    def load(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(str(self._data_dir(stage)))

    def manifest(self, stage: str) -> StageManifest:
        d = json.loads(self._manifest_path(stage).read_text())
        return StageManifest(**d)

    def invalidate(self, stage: str) -> None:
        mp = self._manifest_path(stage)
        if mp.exists():
            mp.unlink()
