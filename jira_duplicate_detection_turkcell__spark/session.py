"""SparkSession factory tuned for the dedup engine.

Single place that owns the session config so tests, bench, the CLI and the
driver contract (`__spark_entry__.py`) all run the same engine settings:
Arrow-backed pandas UDF transfer, AQE (with skew-join handling — LSH hot
buckets are the canonical skew source, SURVEY.md §4), and a shuffle
partition count sized for the sandbox (`local[N]`) while remaining the knob
a real cluster deployment would raise to O(input partitions).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the sandbox (local[32], 128 GiB). On a real cluster
# these are overridden via spark-submit --conf; nothing below hard-codes
# single-node assumptions.
_BASE_CONF: dict[str, str] = {
    # Arrow transfer for pandas UDFs / mapInPandas — the only Python that
    # ever touches row data runs vectorized over Arrow batches.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # modest batches keep per-worker UDF temporaries cache-sized; large
    # batches measurably anti-scale at high worker counts on one socket
    "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
    # AQE: runtime coalescing of small shuffle partitions + skew-join
    # splitting. LSH band buckets on boilerplate pages are skewed by
    # construction; AQE is the backstop behind explicit salting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # The engine relies on wrapping 64-bit arithmetic inside numpy (never
    # in SQL expressions), so ANSI mode stays ON — overflow in a SQL expr
    # is a bug we want surfaced, not wrapped.
    "spark.sql.ansi.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(
    app_name: str = "spark-webtext-dedup",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine SparkSession.

    `cores=None` uses ``local[$SPARK_GRAFT_CPUS]`` (default ``local[*]``);
    an explicit `cores` pins ``local[cores]`` — the bench harness uses this
    to evidence N→4N scaling (local[8] vs local[32]) per BASELINE.md.
    """
    if cores is None:
        env_cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env_cpus}]" if env_cpus else "local[*]"
        default_parallelism = int(env_cpus) if env_cpus else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        default_parallelism = cores

    if shuffle_partitions is None:
        # one shuffle partition per core in local mode; a cluster run sets
        # this to ~2-3x total executor cores via --conf.
        shuffle_partitions = max(default_parallelism, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(default_parallelism))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
    )
    for k, v in _BASE_CONF.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    """Stop the active session (used between bench parallelism levels)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
