"""Session-builder helpers: the engine-recommended Spark configs that
belong to the LIBRARY, not to any one benchmark script.

Python worker-pool re-creation fix (r14, promoted into the engine in
r15 — VERDICT item 6).  Spark's ``PythonWorkerFactory`` reaps every
idle pooled Python worker after a HARD-CODED one-minute idle window
(``IDLE_WORKER_TIMEOUT_NS`` — not configurable in 4.1), so the first
Arrow/mapInPandas stage after any >1-minute Python-idle stretch must
re-create its whole worker complement; creations are serialized under
the global ``SparkEnv`` lock, and over the stock TCP+auth handshake
they trickle at ~4/s — a measured 26-71 s stall (thread dumps,
event-log task attribution and process sampling in
``OPTIMIZATION_r14.md`` §4).  Two configs remove the two serial
components, and BOTH are needed (measured one-at-a-time: ~58 s each,
1.7-7.6 s together):

* ``spark.python.unix.domain.socket.enabled=true`` — Spark 4.1's
  unix-domain-socket worker transport: filesystem-permission trust, no
  per-creation TCP connect + auth-secret roundtrip;
* ``spark.python.daemon.module=petropandas_spark.daemon_preload`` — a
  forkserver-style daemon that imports numpy/pandas/pyarrow ONCE so
  forked workers inherit them copy-on-write instead of cold-importing
  ~5 CPU-s of libraries in their first task.

Any long-lived session that runs Python stages more than a minute
apart (ETL DAGs with JVM-only stretches, notebook sessions, the bench)
pays the identical convoy on a real cluster — these are production
configs, not bench shape.
"""

from __future__ import annotations

import os

#: the configs themselves — exposed as data so callers composing their
#: own builder (or spark-submit conf files) can consume them verbatim
WORKER_POOL_CONFS: dict[str, str] = {
    "spark.python.unix.domain.socket.enabled": "true",
    "spark.python.daemon.module": "petropandas_spark.daemon_preload",
}


def export_daemon_pythonpath() -> None:
    """Make ``petropandas_spark.daemon_preload`` importable by the
    JVM-spawned daemon process.

    The daemon is spawned by the JVM, which only inherits the PROCESS
    environment — the driver's ``sys.path`` additions are shipped to
    workers by the worker protocol but never reach the daemon — so the
    package path must be on ``PYTHONPATH`` before the JVM starts.
    No-op when the package is already importable from the existing
    ``PYTHONPATH``/site-packages (the daemon re-imports it itself)."""
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_dir in existing.split(os.pathsep):
        return
    os.environ["PYTHONPATH"] = (
        pkg_dir + os.pathsep + existing if existing else pkg_dir
    )


def apply_worker_pool_confs(builder):
    """Apply :data:`WORKER_POOL_CONFS` to a ``SparkSession.Builder`` (and
    export the daemon ``PYTHONPATH``).  Returns the builder for chaining::

        from petropandas_spark.session import apply_worker_pool_confs
        spark = apply_worker_pool_confs(
            SparkSession.builder.master(...)).getOrCreate()
    """
    export_daemon_pythonpath()
    for k, v in WORKER_POOL_CONFS.items():
        builder = builder.config(k, v)
    return builder
