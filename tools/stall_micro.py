"""Fast reproducer for the post-reap Python-worker COW fault storm
(r15; replaces the 5-minute 176-query prefix of worker_stall_probe.py).

Shape: warm the worker pool with one tiny Python stage, run JVM-only
registry queries for IDLE_SECONDS (> the hard-coded 60 s idle reaper,
so the pool dies WHILE the JVM works — the two conditions r14 isolated),
then time the target Arrow query.  Prints one JSON line.

Knobs (env): MICRO_IDLE (default 80 s), MICRO_TARGET (default
media_audio_fingerprints), MICRO_REPS (default 3), MICRO_PRELOAD (1),
MICRO_UDS (1), MICRO_GCFREEZE passed through to the daemon via
PETRO_DAEMON_GCFREEZE, MICRO_PS (worker /proc sampling like
worker_stall_probe).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time


def main() -> int:
    idle_s = float(os.environ.get("MICRO_IDLE", "80"))
    target = os.environ.get("MICRO_TARGET", "media_audio_fingerprints")
    reps = int(os.environ.get("MICRO_REPS", "3"))
    uds = os.environ.get("MICRO_UDS", "1") == "1"
    preload = os.environ.get("MICRO_PRELOAD", "1") == "1"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ["PYTHONPATH"] = (
        repo + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH") else repo
    )
    sys.path.insert(0, repo)

    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("stall-micro")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.driver.memory", "24g")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
    )
    if uds:
        b = b.config("spark.python.unix.domain.socket.enabled", "true")
    if preload:
        b = b.config("spark.python.daemon.module",
                     "petropandas_spark.daemon_preload")
    for kv in os.environ.get("MICRO_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            b = b.config(k.strip(), v.strip())
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    qs = e.queries()

    # JVM-only fillers: cheap, Python-free TPC-H/petro chains
    fillers = ["q1_pricing_summary", "q6_forecast_revenue",
               "garnet_end_members", "q3_shipping_topk",
               "oxide_means_grouped", "q12_shipmode"]

    spark.range(1_000_000).selectExpr("sum(id) s").write.format(
        "noop").mode("overwrite").save()

    # warm the Python pool
    def _ident(it):
        for pdf in it:
            yield pdf
    spark.range(64).repartition(int(cpus)).mapInPandas(
        _ident, "id long").write.format("noop").mode("overwrite").save()

    t0 = time.perf_counter()
    n_fill = 0
    while time.perf_counter() - t0 < idle_s:
        for name in fillers:
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            n_fill += 1
        spark.catalog.clearCache()
    fill_wall = round(time.perf_counter() - t0, 1)

    # worker-process sampler (same /proc fields as worker_stall_probe)
    def ps_sampler(rep: int, stop: threading.Event) -> None:
        tick = os.sysconf("SC_CLK_TCK")
        with open(f"/tmp/micro_ps_rep{rep}.log", "w") as fh:
            t0 = time.perf_counter()
            while not stop.wait(0.5):
                rows = []
                for p in os.listdir("/proc"):
                    if not p.isdigit():
                        continue
                    try:
                        with open(f"/proc/{p}/cmdline", "rb") as cf:
                            cmd = cf.read().replace(b"\0", b" ").decode(
                                "utf-8", "replace")
                        if "pyspark.worker" not in cmd and \
                                "pyspark.daemon" not in cmd and \
                                "daemon_preload" not in cmd:
                            continue
                        with open(f"/proc/{p}/stat") as sf:
                            st = sf.read().rsplit(")", 1)[1].split()
                        rows.append((int(p), int(st[11]) / tick,
                                     int(st[12]) / tick, st[0],
                                     int(st[7])))
                    except OSError:
                        continue
                fh.write(f"--- t={time.perf_counter()-t0:.2f}s "
                         f"n={len(rows)}\n")
                for pid, ut, stm, state, mnf in rows:
                    fh.write(f"{pid} u={ut:.2f} s={stm:.2f} {state} "
                             f"mnf={mnf}\n")
                fh.flush()

    rep_times = []
    for rep in range(reps):
        stop = threading.Event()
        if os.environ.get("MICRO_PS", "0") == "1":
            threading.Thread(target=ps_sampler, args=(rep, stop),
                             daemon=True).start()
        t = time.perf_counter()
        qs[target](spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        rep_times.append(round(time.perf_counter() - t, 3))
        stop.set()
        spark.catalog.clearCache()

    print(json.dumps({
        "idle_s": idle_s, "fill_wall": fill_wall, "n_fill": n_fill,
        "uds": uds, "preload": preload, "target": target,
        "rep_times": rep_times,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
