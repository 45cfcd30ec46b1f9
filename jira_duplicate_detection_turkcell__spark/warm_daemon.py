"""Pre-warmed PySpark worker daemon (``spark.python.daemon.module``).

The stock daemon forks a fresh worker per task slot; each worker then pays
the numpy/pandas/pyarrow import (~1.5-2 s of CPU and tens of MB of freshly
faulted pages) before its first batch. With N task slots × multiple chained
UDF stages that import storm lands entirely inside the first job's critical
path — measured as a multi-second serial floor per parallelism level.

Importing the heavy modules HERE, in the daemon process *before* it forks,
gives every worker a warm copy-on-write image: imports resolve instantly and
the module pages are shared. The engine's own kernel modules are warmed too.
This module then defers to the stock ``pyspark.daemon`` manager loop.
"""

# fmt: off
import numpy            # noqa: F401
import pandas           # noqa: F401
import pandas.core.util.hashing  # noqa: F401  (pd.util.hash_array path)
import pyarrow          # noqa: F401

try:  # engine kernels (repo root must be on PYTHONPATH; see session.py)
    import jira_duplicate_detection_turkcell__spark.operators.signatures  # noqa: F401
    import jira_duplicate_detection_turkcell__spark.extract  # noqa: F401
except ImportError:  # pragma: no cover - daemon still works without them
    pass
# fmt: on

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
