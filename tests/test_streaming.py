"""Structured Streaming operators: stream results == batch results.

Each operator runs twice over sf0.001 events — once as a file-source
stream drained with availableNow into a memory sink, once as a plain
batch DataFrame — and the two results must agree exactly.
"""

from __future__ import annotations

import pandas as pd
import pytest

from petropandas_spark.streaming import events as ev

EVENTS = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    """Spark's file stream source requires a directory — stage the single
    parquet file into one (testdata itself is read-only)."""
    import shutil

    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(EVENTS, d / "part-000.parquet")
    return str(d)


def _batch_events(spark):
    return ev.read_events_batch(spark, EVENTS)


def _sorted(df, cols) -> pd.DataFrame:
    return df.toPandas().sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize(
    "op,keys,mode",
    [
        (ev.tumbling_counts, ["window_start", "event_type"], "complete"),
        (ev.sliding_value, ["window_start", "event_type"], "complete"),
        (ev.sessionize, ["user_id", "session_start"], "complete"),
    ],
)
def test_stream_matches_batch(spark, events_dir, op, keys, mode):
    stream = ev.read_events_stream(spark, events_dir)
    name = f"t_{op.__name__}"
    got = _sorted(ev.run_to_memory(op(stream), name, output_mode=mode), keys)
    expected = _sorted(op(_batch_events(spark)), keys)
    pd.testing.assert_frame_equal(got, expected, atol=1e-9, rtol=1e-9)
    assert len(got) > 0


def test_dedup_stream(spark, events_dir):
    stream = ev.read_events_stream(spark, events_dir)
    out = ev.run_to_memory(
        ev.dedup_events(stream), "t_dedup", output_mode="append"
    )
    batch = _batch_events(spark)
    assert out.count() == batch.select("event_id").distinct().count()


def test_watermark_present_in_plan(spark, events_dir):
    # the logical plan must carry the watermark node (bounded state at scale)
    stream = ev.read_events_stream(spark, events_dir)
    plan = ev.tumbling_counts(stream)._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in plan


def test_stateful_anomaly_detector(spark, events_dir):
    """applyInPandasWithState custom operator: stream result == batch."""
    keys = ["user_id", "event_id"]
    stream = ev.read_events_stream(spark, events_dir)
    got = _sorted(
        ev.run_to_memory(
            ev.user_value_anomalies(stream), "t_anom", output_mode="append"
        ),
        keys,
    )
    expected = _sorted(ev.user_value_anomalies(_batch_events(spark)), keys)
    pd.testing.assert_frame_equal(got, expected, atol=1e-9, rtol=1e-9)
    assert len(got) > 0  # the synthetic stream contains outliers


def test_stream_stream_join_matches_batch(spark, events_dir):
    """Watermarked stream-stream interval join (purchase attribution):
    streaming result == batch result, and both stream sides carry
    watermarks in the plan (bounded join state)."""
    keys = ["purchase_id", "click_id"]
    stream = ev.read_events_stream(spark, events_dir)
    joined = ev.purchase_attribution(stream)
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") >= 2
    got = _sorted(
        ev.run_to_memory(joined, "t_attr", output_mode="append"), keys
    )
    expected = _sorted(ev.purchase_attribution(_batch_events(spark)), keys)
    pd.testing.assert_frame_equal(got, expected, atol=1e-9, rtol=1e-9)
    assert len(got) > 0


def test_load_normalizes_both_ts_precisions(spark, tmp_path):
    """Driver testdata has shipped events.ts as TIMESTAMP(NANOS) (round
    1) and TIMESTAMP(MICROS) (round 2); registry._load must produce the
    same BIGINT UTC nanoseconds for either physical encoding."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from petropandas_spark.registry import _load

    micros = 1704067200123456  # 2024-01-01T00:00:00.123456Z
    for name, typ, val in [
        ("us", pa.timestamp("us"), micros),
        ("ns", pa.timestamp("ns"), micros * 1000),
    ]:
        d = tmp_path / name
        d.mkdir()
        pq.write_table(
            pa.table({
                "event_id": pa.array([1], pa.int64()),
                "ts": pa.array([val], typ),
            }),
            d / "events.parquet",
        )
    ns_row = _load(spark, str(tmp_path / "ns"), "events").first()
    us_row = _load(spark, str(tmp_path / "us"), "events").first()
    assert ns_row["ts"] == us_row["ts"] == micros * 1000


def test_nanos_conf_restored_and_decode_still_works(spark, tmp_path):
    """``nanosAsLong`` must not leak session-wide (a cohabiting workload
    reading its own TIMESTAMP(NANOS) parquet would silently get BIGINT),
    AND the restore must happen before the action without breaking the
    decode — i.e. the conf is resolved into the relation at creation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from petropandas_spark.registry import _load

    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    d = tmp_path / "ev"
    d.mkdir()
    pq.write_table(
        pa.table({
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([1_000, 2_000], pa.timestamp("ns")),
        }),
        d / "events.parquet",
    )
    for loader in (
        lambda: _load(spark, str(d), "events"),
        lambda: ev.read_events_batch(spark, str(d / "events.parquet")),
    ):
        df = loader()
        assert spark.conf.get(key, None) == prev, "conf leaked"
        # action AFTER restore: decode must still see the raw longs
        assert {r.ts for r in df.select("ts").collect()} == {1_000, 2_000}
    # streaming path: conf restored at creation AND a microbatch over
    # the NANOS parquet still decodes after the restore (the pinned
    # stream schema carries the long mapping into execution)
    sdf = ev.read_events_stream(spark, str(d))  # file source needs a dir
    assert spark.conf.get(key, None) == prev, "stream reader leaked conf"
    q = (sdf.writeStream.format("memory").queryName("nanos_restore_t")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.ts for r in
           spark.sql("SELECT ts FROM nanos_restore_t").collect()}
    assert got == {1_000, 2_000}, "nanos stream mis-decoded after restore"


def test_welford_prefix_scan_matches_sequential_recurrence():
    """The vectorized prefix scan (cumsum + Chan combine) must agree with
    the textbook sequential Welford recurrence — same anomaly set, same
    z-scores, same carried-out state — and be invariant to micro-batch
    chunking of the same event sequence."""
    import numpy as np

    def sequential(rows, count, mean, m2, k=3.0):
        rows = rows.sort_values(["ts", "event_id"])
        out = []
        for _, r in rows.iterrows():
            v = float(r["value"])
            if count >= 5:
                std = (m2 / count) ** 0.5
                if std > 0 and abs(v - mean) > k * std:
                    out.append((int(r["user_id"]), int(r["event_id"]),
                                int(r["ts"]), v, (v - mean) / std))
            count += 1
            d = v - mean
            mean += d / count
            m2 += d * (v - mean)
        return out, count, mean, m2

    rng = np.random.default_rng(7)
    n = 400
    vals = rng.normal(1000.0, 5.0, n)
    vals[rng.choice(n, 12, replace=False)] += rng.choice(
        [-60.0, 60.0], 12)  # clear outliers
    pdf = pd.DataFrame({
        "user_id": np.full(n, 42, dtype=np.int64),
        "event_id": np.arange(n, dtype=np.int64),
        "ts": np.arange(n, dtype=np.int64) * 10,
        "value": vals,
    })
    got, gc, gm, g2 = ev.welford_prefix_scan(pdf, 0, 0.0, 0.0)
    exp, ec, em, e2 = sequential(pdf, 0, 0.0, 0.0)
    assert gc == ec and abs(gm - em) < 1e-9 and abs(g2 - e2) < 1e-6
    assert [r[:3] for r in got] == [r[:3] for r in exp]
    np.testing.assert_allclose([r[4] for r in got], [r[4] for r in exp],
                               rtol=1e-9)
    # chunk invariance: feeding the same rows in 3 micro-batches with the
    # state handed across the boundary reproduces the single-pass result
    chunks = [pdf.iloc[:97], pdf.iloc[97:250], pdf.iloc[250:]]
    st, rows2 = (0, 0.0, 0.0), []
    for c in chunks:
        r, *st = ev.welford_prefix_scan(c, *st)
        rows2.extend(r)
    assert [r[:3] for r in rows2] == [r[:3] for r in got]
    assert st[0] == gc
    np.testing.assert_allclose(st[1:], [gm, g2], rtol=1e-9, atol=1e-9)


def test_funnel_stream_matches_batch_and_registered_sql(spark, tmp_path):
    """Streaming funnel twin: the per-user chained-min funnel emitted
    incrementally over ≥3 micro-batches (maxFilesPerTrigger=1, shuffled
    file order → cross-batch, out-of-order arrival) converges to the
    batch twin, and the batch twin equals the registered events_funnel
    SQL row-for-row."""
    d = tmp_path / "funnel_stream"
    d.mkdir()
    batch = _batch_events(spark)
    # 3 files split by a hash that interleaves users across files, so
    # most users' funnels are assembled across micro-batches
    for i in range(3):
        batch.filter(f"pmod(event_id, 3) = {i}").coalesce(1) \
            .write.mode("overwrite").parquet(str(d / f"f{i}"))
    import shutil
    staged = tmp_path / "staged"
    staged.mkdir()
    n = 0
    for sub in sorted(d.iterdir()):
        for f in sub.glob("part-*.parquet"):
            shutil.copy(f, staged / f"part-{n:03d}.parquet")
            n += 1
    assert n == 3

    stream = ev.read_events_stream(spark, str(staged),
                                   max_files_per_trigger=1)
    # collect() keeps nullable BIGINT exact — toPandas would coerce the
    # nanosecond timestamps through float64 and round them (ulp 256 at
    # 1.7e18)
    out = ev.run_to_memory(ev.funnel_progress(stream), "t_funnel",
                           output_mode="append").collect()
    # several emissions per user across micro-batches; keep the latest
    per_user = {}
    n_emissions = {}
    for r in out:
        n_emissions[r.user_id] = n_emissions.get(r.user_id, 0) + 1
        best = per_user.get(r.user_id)
        if best is None or r.n_events > best.n_events:
            per_user[r.user_id] = r
    assert max(n_emissions.values()) > 1
    latest = sorted((r.user_id, r.n_events, r.signup_ts, r.view_ts,
                     r.click_ts, r.purchase_ts, r.funnel_depth)
                    for r in per_user.values())
    got_batch = sorted((r.user_id, r.n_events, r.signup_ts, r.view_ts,
                        r.click_ts, r.purchase_ts, r.funnel_depth)
                       for r in ev.funnel_progress(batch).collect())
    assert latest == got_batch

    # the batch twin (minus the emission counter) == registered SQL
    from petropandas_spark.registry import build_registry
    sql = sorted((r.user_id, r.signup_ts, r.view_ts, r.click_ts,
                  r.purchase_ts, r.funnel_depth)
                 for r in build_registry()["events_funnel"]
                 .spark_fn(spark, "/root/testdata/sf0.001").collect())
    assert [(t[0],) + t[2:] for t in got_batch] == sql
