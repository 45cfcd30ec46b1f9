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


class StageStore:
    """Parquet + manifest-JSON stage store with atomic-commit semantics."""

    def __init__(self, root: str | Path, config_fingerprint: str = ""):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        self.config_fingerprint = config_fingerprint

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

        # per-partition lineage: rows per committed parquet file
        spark = df.sparkSession
        committed = spark.read.parquet(str(data_dir))
        per_file = (
            committed.groupBy(F.input_file_name().alias("file"))
            .count()
            .collect()
        )
        partition_rows = {Path(r["file"]).name: r["count"] for r in per_file}
        manifest = StageManifest(
            stage=stage,
            config_fingerprint=self.config_fingerprint,
            row_count=sum(partition_rows.values()),
            partition_rows=partition_rows,
            metrics=metrics or {},
            schema_ddl=committed.schema.simpleString(),
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
