"""Forkserver-style preloading PySpark worker daemon.

Drop-in replacement for ``pyspark.daemon`` (select it with
``spark.python.daemon.module=petropandas_spark.daemon_preload``) that
imports the heavyweight Python libraries ONCE in the daemon process, so
every worker it forks inherits the loaded modules copy-on-write and a
fresh worker's first Arrow batch does not pay the multi-second
numpy + pandas + pyarrow import.

Why this matters (r14, measured): Spark's ``PythonWorkerFactory`` kills
every idle pooled worker after a HARD-CODED one-minute idle window
(``IDLE_WORKER_TIMEOUT_NS`` in ``PythonWorkerFactory.scala`` — not
configurable as of 4.1), so any pipeline whose Python stages run more
than a minute apart re-creates its whole worker complement on the next
Arrow stage.  Worker creation is serialized under the global
``SparkEnv`` lock, and with the stock daemon each fresh worker then
cold-imports pandas/pyarrow inside its first task — under load the
creation convoy for a 32-task two-stage Arrow chain measured 13-71 s
(thread dumps: every task thread blocked on
``SparkEnv.releasePythonWorker`` / ``createThroughDaemon`` while a few
fresh workers imported).  With the imports preloaded here the forked
worker starts warm and the same re-creation is tens of milliseconds
per worker.

This is the standard CPython forkserver-preload technique and is just
as valid on a real cluster (executors pay the same convoy whenever the
one-minute reaper fires between Python stages); the daemon costs one
resident copy of the libraries per executor, shared copy-on-write by
all its workers.

The module must be importable by the worker interpreter (it lives in
the package, so any deployment that ships the package can use it); it
deliberately avoids importing this package itself — the pipeline
modules import fast once pyspark + numpy + pandas are resident, and
keeping the daemon dependency-free of our own code means a bug in the
package can never take down the worker pool.
"""

# Preload order mirrors worker first-use: numpy underpins pandas and
# our Arrow stages; pyspark.worker (the module the daemon forks into)
# is imported by pyspark.daemon itself below.
import gc

import numpy  # noqa: F401
import pandas  # noqa: F401
import pyarrow  # noqa: F401

try:  # the Arrow<->pandas bridge pandas_udf/mapInPandas batches use
    import pyarrow.pandas_compat  # noqa: F401
except ImportError:  # pragma: no cover - older pyarrow layouts
    pass

# pyspark.daemon reads sys.argv at import time to select the worker
# entry point (pyspark.worker by default) — importing it here keeps
# that contract intact for the -m invocation.
from pyspark.daemon import manager  # noqa: E402

# Freeze the preloaded heap into CPython's permanent generation so the
# forked workers' garbage collections skip it (r15).  Without this,
# each worker's first full collection (pyspark.daemon runs gc.collect()
# between reused-worker tasks, and allocation thresholds can trigger
# one mid-task) writes to the PyGC_Head of EVERY tracked preloaded
# object — copy-on-write-copying most of the shared heap per worker.
# Measured on the r14 prefix probe (32-core, 64-worker re-creation):
# the first post-reap Arrow stage spent ~170 CPU-s in kernel
# page-fault handling (~850k minor faults at ~200 µs each under
# cross-fork mmap contention); gc.freeze() is the standard pre-fork
# mitigation for exactly this (the numbers after: OPTIMIZATION_r15.md).
gc.collect()  # drop import-time garbage so it doesn't get frozen
gc.freeze()

if __name__ == "__main__":
    manager()
