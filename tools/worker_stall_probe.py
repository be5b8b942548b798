"""Prefix probe for the Python worker-pool re-creation stall (r14 §4).

Reproduces the positional stall deterministically: run a PREFIX of the
registry (default: positions 0..175 — everything before the audio pair
at 176/177, i.e. the media family plus the ~160-query JVM-only
stretch), then time each rep of the TARGET query individually.  The
first rep after the long Python-idle stretch is where the worker-pool
re-creation convoy (and the open JVM-flag residual) lands.

Knobs (env):
    PROBE_JVM_FLAGS   driver extraJavaOptions (default: bench.py's
                      "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing")
    PROBE_UDS         "1"/"0" unix-domain-socket transport (default 1)
    PROBE_PRELOAD     "1"/"0" preloading daemon (default 1)
    PROBE_PREFIX      prefix length (default 176)
    PROBE_TARGET      target query (default media_audio_fingerprints)
    PROBE_REPS        target reps (default 3)
    PROBE_DUMP_AFTER  seconds into a slow rep after which jstack dumps
                      are taken from a watcher thread (default 8; 0=off)

Prints one JSON line: prefix wall, per-rep target seconds, dump paths.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time


def _jvm_pid() -> int | None:
    """The local-mode driver JVM is our direct child java process."""
    try:
        out = subprocess.run(
            ["pgrep", "-P", str(os.getpid()), "java"],
            capture_output=True, text=True, timeout=10,
        ).stdout.split()
        return int(out[0]) if out else None
    except Exception:
        return None


def main() -> int:
    flags = os.environ.get(
        "PROBE_JVM_FLAGS",
        "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
    )
    uds = os.environ.get("PROBE_UDS", "1") == "1"
    preload = os.environ.get("PROBE_PRELOAD", "1") == "1"
    prefix_n = int(os.environ.get("PROBE_PREFIX", "176"))
    target = os.environ.get("PROBE_TARGET", "media_audio_fingerprints")
    reps = int(os.environ.get("PROBE_REPS", "3"))
    dump_after = float(os.environ.get("PROBE_DUMP_AFTER", "8"))
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
        .appName("worker-stall-probe")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
    )
    if flags.strip():
        b = b.config("spark.driver.extraJavaOptions", flags)
    if uds:
        b = b.config("spark.python.unix.domain.socket.enabled", "true")
    if preload:
        b = b.config("spark.python.daemon.module",
                     "petropandas_spark.daemon_preload")
    # extra confs: PROBE_EXTRA_CONF="k1=v1;k2=v2"
    for kv in os.environ.get("PROBE_EXTRA_CONF", "").split(";"):
        if "=" in kv:
            k, v = kv.split("=", 1)
            b = b.config(k.strip(), v.strip())
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    qs = e.queries()
    names = list(qs)

    spark.range(1_000_000).selectExpr("sum(id) s").write.format(
        "noop").mode("overwrite").save()

    t0 = time.perf_counter()
    for name in names[:prefix_n]:
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    prefix_wall = time.perf_counter() - t0

    # PROBE_WARMPY=1: one single-task trivial Python stage between the
    # prefix and the target (plus a short sleep).  If this removes the
    # stall, the cost is re-warming cold daemon/library pages (one
    # worker re-touches the shared pages for everyone), not per-worker
    # re-creation.
    warmpy = os.environ.get("PROBE_WARMPY", "0") == "1"
    warmpy_wall = None
    if warmpy:
        def _ident(it):
            for pdf in it:
                yield pdf
        tw = time.perf_counter()
        spark.range(10).coalesce(1).mapInPandas(
            _ident, "id long").write.format("noop").mode(
            "overwrite").save()
        warmpy_wall = round(time.perf_counter() - tw, 3)
        time.sleep(1.0)

    pid = _jvm_pid()
    dumps: list[str] = []

    def watcher(rep: int, started: float, stop: threading.Event) -> None:
        while not stop.wait(0.5):
            if time.perf_counter() - started > dump_after:
                for k in range(3):
                    path = f"/tmp/stall_dump_rep{rep}_{k}.txt"
                    try:
                        with open(path, "w") as fh:
                            subprocess.run(["jstack", str(pid)],
                                           stdout=fh, timeout=30)
                        dumps.append(path)
                    except Exception:
                        pass
                    time.sleep(2.0)
                return

    def ps_sampler(rep: int, stop: threading.Event) -> None:
        """Sample python worker processes via /proc (tick-precision
        utime+stime) every 0.5 s into /tmp/stall_ps_rep<rep>.log."""
        tick = os.sysconf("SC_CLK_TCK")
        with open(f"/tmp/stall_ps_rep{rep}.log", "w") as fh:
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
                                "pyspark.daemon" not in cmd:
                            continue
                        if cmd.lstrip().startswith("/usr/lib/jvm"):
                            continue
                        with open(f"/proc/{p}/stat") as sf:
                            st = sf.read().rsplit(")", 1)[1].split()
                        # after comm: state=0, minflt=7, majflt=9,
                        # utime=11, stime=12
                        rows.append((int(p), int(st[11]) / tick,
                                     int(st[12]) / tick, st[0],
                                     int(st[7]), int(st[9])))
                    except OSError:
                        continue
                try:
                    with open("/proc/stat") as gf:
                        g = gf.readline().split()  # cpu u n s idle iow irq sirq steal
                    host = " ".join(g[1:9])
                    psi = ""
                    for res in ("cpu", "memory"):
                        try:
                            with open(f"/proc/pressure/{res}") as pf:
                                psi += f" {res}:{pf.readline().strip()}"
                        except OSError:
                            pass
                except OSError:
                    host, psi = "", ""
                fh.write(f"--- t={time.perf_counter()-t0:.2f}s "
                         f"n={len(rows)} host={host}{psi}\n")
                for pid, ut, stm, state, mnf, mjf in rows:
                    fh.write(f"{pid} u={ut:.2f} s={stm:.2f} {state} "
                             f"mnf={mnf} mjf={mjf}\n")
                # kernel stacks of up to 6 running workers (root only;
                # best-effort) — tells WHICH kernel path eats the stime
                shown = 0
                for pid, ut, stm, state, mnf, mjf in rows:
                    if state != "R" or shown >= 6:
                        continue
                    try:
                        with open(f"/proc/{pid}/stack") as kf:
                            stk = kf.read().strip()
                        with open(f"/proc/{pid}/status") as vf:
                            sw = [ln.strip() for ln in vf
                                  if "ctxt_switches" in ln]
                        fh.write(f"## kstack {pid}: {' | '.join(stk.splitlines()[:6])} ({'; '.join(sw)})\n")
                        shown += 1
                    except OSError:
                        continue
                fh.flush()

    rep_times = []
    for rep in range(reps):
        stop = threading.Event()
        started = time.perf_counter()
        th = None
        if dump_after > 0 and pid:
            th = threading.Thread(target=watcher,
                                  args=(rep, started, stop), daemon=True)
            th.start()
        if os.environ.get("PROBE_PS", "0") == "1":
            threading.Thread(target=ps_sampler, args=(rep, stop),
                             daemon=True).start()
        df = qs[target](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        rep_times.append(round(time.perf_counter() - started, 3))
        stop.set()
        spark.catalog.clearCache()

    print(json.dumps({
        "flags": flags, "uds": uds, "preload": preload,
        "prefix_n": prefix_n, "prefix_wall": round(prefix_wall, 1),
        "warmpy_wall": warmpy_wall,
        "target": target, "rep_times": rep_times, "dumps": dumps,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
