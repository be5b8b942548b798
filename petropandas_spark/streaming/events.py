"""Structured Streaming operators over the ``events`` table (SURVEY.md §2.13,
§7.2 milestone 8 — an extension; the reference has zero streaming surface).

Design: every operator takes a *streaming* DataFrame with the events schema
(``event_id ts user_id event_type value props``, ``ts`` = BIGINT epoch
nanoseconds — parquet TIMESTAMP of either precision is normalized on read)
and returns a transformed streaming DataFrame.  Watermarks bound state so
the same topology runs unbounded on a real source at 100 TB/day: windowed
aggregation state is dropped ``delay`` behind the max event time, and
``dropDuplicatesWithinWatermark`` keeps only the dedup keys inside the
watermark horizon instead of an ever-growing set.

All operators also accept a *batch* DataFrame unchanged (same code path,
minus the watermark no-op) — the tests exercise both and cross-check the
streaming results against the batch equivalents.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id BIGINT, ts BIGINT, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)


@contextmanager
def nanos_as_long(spark):
    """Scoped ``spark.sql.legacy.parquet.nanosAsLong`` — lets a
    TIMESTAMP(NANOS) parquet load as raw BIGINT, then restores the prior
    value so the setting never leaks into a cohabiting workload reading
    its own nano-precision parquet.  Restoring BEFORE the action is safe:
    the conf is resolved into the relation when the DataFrame (or the
    pinned stream schema) is created — verified for both batch reads and
    availableNow streams on pyspark 4.1.x in ``test_streaming.py``."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "true")
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def _normalize_ts(spark, df):
    """Normalize ``ts`` to BIGINT UTC epoch nanoseconds.  Testdata
    generations vary: TIMESTAMP(NANOS) arrives as a raw long (via
    ``nanosAsLong``), TIMESTAMP(MICROS) as timestamp/timestamp_ntz."""
    if df.schema["ts"].dataType.typeName() != "long":
        # NTZ→TIMESTAMP cast is session-tz-sensitive; pin UTC.  The tz is
        # resolved into the cast when the DataFrame is (eagerly) analyzed,
        # so restore the previous session tz immediately after instead of
        # leaving the session mutated for later tz-sensitive expressions.
        tz_key = "spark.sql.session.timeZone"
        prev_tz = spark.conf.get(tz_key)
        spark.conf.set(tz_key, "UTC")
        try:
            df = df.withColumn(
                "ts", F.expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000")
            )
        finally:
            spark.conf.set(tz_key, prev_tz)
    return df


def read_events_batch(spark, path: str):
    """Batch read of an events parquet with ``ts`` as BIGINT ns."""
    with nanos_as_long(spark):
        return _normalize_ts(spark, spark.read.parquet(path))


def read_events_stream(spark, path: str, max_files_per_trigger: int | None = None):
    """File-source stream over an events parquet directory/file.  The
    stream schema is sniffed from a (metadata-only) batch read so both
    timestamp generations load; ``ts`` is normalized to BIGINT ns."""
    with nanos_as_long(spark):
        reader = spark.readStream.schema(spark.read.parquet(path).schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return _normalize_ts(spark, reader.format("parquet").load(path))


def with_event_time(df):
    """Derive a TIMESTAMP event-time column from the BIGINT nanoseconds."""
    return df.withColumn(
        "event_time", F.timestamp_micros((F.col("ts") / F.lit(1000)).cast("long"))
    )


def _maybe_watermark(df, delay: str):
    if df.isStreaming:
        return df.withWatermark("event_time", delay)
    return df


def tumbling_counts(df, window: str = "1 hour", delay: str = "30 minutes"):
    """Tumbling-window per-type counts and value sums with a watermark."""
    d = _maybe_watermark(with_event_time(df), delay)
    return (
        d.groupBy(F.window("event_time", window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type", "n_events", "total_value",
        )
    )


def sliding_value(df, window: str = "1 hour", slide: str = "15 minutes",
                  delay: str = "30 minutes"):
    """Sliding-window mean value per type."""
    d = _maybe_watermark(with_event_time(df), delay)
    return (
        d.groupBy(F.window("event_time", window, slide), F.col("event_type"))
        .agg(F.avg("value").alias("avg_value"), F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type", "avg_value", "n",
        )
    )


def sessionize(df, gap: str = "30 minutes", delay: str = "30 minutes"):
    """Session windows per user (native session_window state store)."""
    d = _maybe_watermark(with_event_time(df), delay)
    return (
        d.groupBy(F.session_window("event_time", gap), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id", "n_events", "session_value",
        )
    )


def dedup_events(df, delay: str = "30 minutes"):
    """Exactly-once event stream on ``event_id`` with bounded state."""
    d = _maybe_watermark(with_event_time(df), delay)
    if d.isStreaming:
        return d.dropDuplicatesWithinWatermark(["event_id"])
    return d.dropDuplicates(["event_id"])


def run_to_memory(stream_df, name: str, output_mode: str = "complete"):
    """Drain a bounded stream with availableNow into an in-memory table and
    return the result DataFrame (test/driver harness path)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def purchase_attribution(df, attribution: str = "30 minutes",
                         delay: str = "30 minutes"):
    """Watermarked stream-stream interval join: attribute every purchase
    to the same user's clicks in the preceding ``attribution`` window.

    Both sides carry watermarks and the join condition bounds click time
    to ``[purchase_time - attribution, purchase_time]``, so Spark can
    expire join state on both sides (the canonical Structured Streaming
    stream-stream join shape).  On batch inputs the identical topology
    runs as an ordinary interval join.
    """
    d = with_event_time(df)
    clicks = _maybe_watermark(
        d.filter(F.col("event_type") == "click"), delay
    ).select(
        F.col("user_id").alias("click_user"),
        F.col("event_id").alias("click_id"),
        F.col("event_time").alias("click_time"),
    )
    purchases = _maybe_watermark(
        d.filter(F.col("event_type") == "purchase"), delay
    ).select(
        F.col("user_id").alias("purchase_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
        F.col("event_time").alias("purchase_time"),
    )
    return purchases.join(
        clicks,
        (F.col("purchase_user") == F.col("click_user"))
        & (F.col("click_time") <= F.col("purchase_time"))
        & (F.col("click_time")
           >= F.col("purchase_time") - F.expr(f"INTERVAL {attribution}")),
    ).select(
        F.col("purchase_user").alias("user_id"),
        "purchase_id", "purchase_value", "purchase_time",
        "click_id", "click_time",
    )


def welford_prefix_scan(rows, count: int, mean: float, m2: float,
                        threshold_sigma: float = 3.0):
    """Vectorized Welford prefix scan in arrival (event-time) order.

    Row ``i`` is judged against the statistics of the carried-in state
    combined with values ``0..i-1``.  Instead of a per-row Python loop,
    the prefix (count, mean, M2) at every position is computed in one
    shot from shifted cumulative sums (Chan et al.'s pairwise-combine
    identity, with the batch side centered on its first value to avoid
    catastrophic cancellation).  Equal to the sequential recurrence up
    to float rounding (~1e-16 relative); the stream==batch pin runs at
    1e-9 tolerance.  Returns ``(anomaly_rows, count', mean', m2')`` where
    the primed state is the carried state combined with the whole batch —
    the chunked micro-batch handoff stays a closed form.
    """
    import numpy as np

    rows = rows.sort_values(["ts", "event_id"])
    v = rows["value"].to_numpy(dtype=np.float64)
    n = v.size
    if n == 0:
        return [], count, mean, m2
    # prefix i = carried state ⊕ first i batch values, for i = 0..n
    idx = np.arange(n + 1, dtype=np.float64)
    centered = v - v[0]
    cs = np.concatenate(([0.0], np.cumsum(centered)))
    css = np.concatenate(([0.0], np.cumsum(centered * centered)))
    tot = count + idx
    safe_i = np.maximum(idx, 1.0)
    safe_t = np.maximum(tot, 1.0)
    mean_b = v[0] + cs / safe_i           # batch-prefix mean (idx > 0)
    m2_b = np.maximum(css - cs * cs / safe_i, 0.0)
    mean_pre = np.where(tot > 0,
                        (count * mean + v[0] * idx + cs) / safe_t, mean)
    delta = np.where(idx > 0, mean_b - mean, 0.0)
    m2_pre = m2 + m2_b + delta * delta * (count * idx / safe_t)
    # anomaly test for row i uses the prefix BEFORE it (position i)
    pre_n, pre_mean, pre_m2 = tot[:n], mean_pre[:n], m2_pre[:n]
    std = np.sqrt(np.maximum(pre_m2, 0.0) / safe_t[:n])
    hit = (pre_n >= 5) & (std > 0) & (
        np.abs(v - pre_mean) > threshold_sigma * std)
    out = []
    if hit.any():
        uid = rows["user_id"].to_numpy()[hit]
        eid = rows["event_id"].to_numpy()[hit]
        ts = rows["ts"].to_numpy()[hit]
        z = (v[hit] - pre_mean[hit]) / std[hit]
        out = [(int(u), int(e), int(t), float(val), float(zz))
               for u, e, t, val, zz
               in zip(uid, eid, ts, v[hit], z)]
    return out, int(count) + int(n), float(mean_pre[n]), float(m2_pre[n])


def user_value_anomalies(df, threshold_sigma: float = 3.0,
                         delay: str = "30 minutes"):
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running mean/variance (Welford) persisted in the state store; emits
    events whose value deviates more than ``threshold_sigma`` from the
    user's running statistics at the time of arrival.

    State per user is three doubles (count, mean, M2) — bounded regardless
    of stream length; the watermark bounds how late state-updating events
    can arrive.  On a batch DataFrame the same semantics run via a
    groupBy-apply over event-time-ordered groups.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "user_id BIGINT, event_id BIGINT, ts BIGINT, value DOUBLE, "
        "zscore DOUBLE"
    )
    state_schema = "count BIGINT, mean DOUBLE, m2 DOUBLE"

    def scan_group(rows, count, mean, m2):
        return welford_prefix_scan(rows, count, mean, m2, threshold_sigma)

    def update(key, pdfs, state):
        count, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        collected = []
        for pdf in pdfs:
            rows, count, mean, m2 = scan_group(pdf, count, mean, m2)
            collected.extend(rows)
        state.update((count, mean, m2))
        if collected:
            yield pd.DataFrame(
                collected,
                columns=["user_id", "event_id", "ts", "value", "zscore"],
            )

    d = _maybe_watermark(with_event_time(df), delay)
    if d.isStreaming:
        return (
            d.groupBy("user_id")
            .applyInPandasWithState(
                update, out_schema, state_schema,
                "append", GroupStateTimeout.NoTimeout,
            )
        )

    # batch path: one pass per user with fresh state
    def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows, *_ = scan_group(pdf, 0, 0.0, 0.0)
        return pd.DataFrame(
            rows, columns=["user_id", "event_id", "ts", "value", "zscore"]
        )

    return d.groupBy("user_id").applyInPandas(batch_fn, out_schema)


def funnel_merge(state_arrays, new_by_type):
    """Merge per-type timestamp arrays and recompute the chained funnel.

    ``state_arrays``: 4 sorted-distinct numpy int64 arrays
    (signup/view/click/purchase); ``new_by_type``: 4 arrays of this
    batch's timestamps.  Returns ``(merged_arrays, t1..t4, depth)``.
    Because the state keeps the DISTINCT per-type timestamps — not a
    scalar running min — the chained semantics (earliest view at-or-
    after the earliest signup, …) stay EXACT under out-of-order and
    cross-batch arrival: a late-arriving earlier signup re-qualifies
    views already seen.  State size is O(distinct event times per user
    per type), the price of exactness; the registered batch funnel
    (``events_funnel``) is the one-shot equivalent."""
    import numpy as np

    merged = [np.unique(np.concatenate([s, n])) if n.size else s
              for s, n in zip(state_arrays, new_by_type)]
    ts = [None, None, None, None]
    prev = None
    for i, arr in enumerate(merged):
        cand = arr if i == 0 else arr[arr >= prev]
        if cand.size:
            ts[i] = int(cand.min())
        prev = ts[i]
        if prev is None:  # deeper levels stay NULL once a level is missing
            break
    depth = sum(1 for t in ts if t is not None)
    return merged, ts, depth


def funnel_progress(df, delay: str = "30 minutes"):
    """Streaming twin of the registered ``events_funnel`` query: per-user
    signup→view→click→purchase chained-min funnel, emitted incrementally
    as events arrive (``applyInPandasWithState``).

    Each emission carries ``n_events`` (monotone count of the user's
    events seen so far) so a consumer — or the stream==batch pin — can
    select the LATEST row per user; after the stream drains, that row
    equals the batch funnel exactly.  On a batch DataFrame the same
    fold runs once per user and ``n_events`` is the user's total."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "user_id BIGINT, n_events BIGINT, signup_ts BIGINT, "
        "view_ts BIGINT, click_ts BIGINT, purchase_ts BIGINT, "
        "funnel_depth INT"
    )
    state_schema = (
        "n BIGINT, signup ARRAY<BIGINT>, view ARRAY<BIGINT>, "
        "click ARRAY<BIGINT>, purchase ARRAY<BIGINT>"
    )
    kinds = ("signup", "view", "click", "purchase")

    def by_type(pdf: pd.DataFrame):
        et = pdf["event_type"].to_numpy()
        ts = pdf["ts"].to_numpy(dtype=np.int64)
        return [ts[et == k] for k in kinds]

    def update(key, pdfs, state):
        if state.exists:
            n, *arrs = state.get
            arrs = [np.asarray(a if a is not None else [], dtype=np.int64)
                    for a in arrs]
        else:
            n, arrs = 0, [np.array([], dtype=np.int64) for _ in kinds]
        uid = None
        for pdf in pdfs:
            if len(pdf):
                uid = int(pdf["user_id"].iloc[0])
                n += len(pdf)
                new = by_type(pdf)
                arrs, ts, depth = funnel_merge(arrs, new)
        state.update((int(n), *[[int(x) for x in a] for a in arrs]))
        if uid is not None:
            yield pd.DataFrame([{
                "user_id": uid, "n_events": int(n),
                "signup_ts": ts[0], "view_ts": ts[1],
                "click_ts": ts[2], "purchase_ts": ts[3],
                "funnel_depth": int(depth),
            }])

    d = _maybe_watermark(with_event_time(df), delay)
    if d.isStreaming:
        return d.groupBy("user_id").applyInPandasWithState(
            update, out_schema, state_schema,
            "append", GroupStateTimeout.NoTimeout,
        )

    def batch_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = [np.array([], dtype=np.int64) for _ in kinds]
        _, ts, depth = funnel_merge(empty, by_type(pdf))
        return pd.DataFrame([{
            "user_id": int(pdf["user_id"].iloc[0]),
            "n_events": int(len(pdf)),
            "signup_ts": ts[0], "view_ts": ts[1],
            "click_ts": ts[2], "purchase_ts": ts[3],
            "funnel_depth": int(depth),
        }])

    return d.groupBy("user_id").applyInPandas(batch_fn, out_schema)
