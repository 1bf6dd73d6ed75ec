"""Stateful sessionization: streaming operator vs deterministic batch twin."""

import shutil

from pyspark.sql import functions as F

from web_content_extraction_benchmark_spark.streaming.sessions import (
    batch_sessionize,
    stream_sessionize,
)


def _closed_key(rows):
    return {
        (r.user_id, r.session_start, r.session_end, r.n_events,
         round(r.sum_value, 6))
        for r in rows
    }


def test_batch_sessionize_gap_semantics(spark):
    events = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:10:00", 2.0),   # same session (gap 10m)
            (1, "2024-01-01 01:10:00", 3.0),   # new session (gap 60m)
            (2, "2024-01-01 00:00:00", 5.0),
        ],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    sessions = {(r.user_id, r.n_events, r.sum_value)
                for r in batch_sessionize(events).collect()}
    assert sessions == {(1, 2, 3.0), (1, 1, 3.0), (2, 1, 5.0)}


def test_stream_sessions_subset_of_batch(spark, sf_dir, tmp_path):
    """Every session the stateful stream CLOSES must appear identically in
    the batch twin (the stream holds trailing sessions in open state)."""
    src = tmp_path / "events"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")

    out = stream_sessionize(spark, str(src))
    query = (
        out.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .start()
    )
    query.processAllAvailable()
    query.stop()
    streamed = _closed_key(spark.sql("SELECT * FROM sessions_test").collect())

    batch = _closed_key(
        batch_sessionize(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).collect()
    )
    assert streamed <= batch
    # single file + event-time timeout: the closed set is the batch set
    # minus each user's trailing session
    n_users = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id").distinct().count()
    )
    assert len(batch) - len(streamed) <= n_users
    assert len(streamed) > 0


def test_state_store_flush_equals_batch_truth(spark, sf_dir, tmp_path):
    """The r5 state-store flush: sentinels are derived from the running
    query's OWN committed state (Spark state data source) — only
    still-open users, no second event scan — and the resulting
    append-mode output equals the batch truth EXACTLY."""
    from web_content_extraction_benchmark_spark.streaming.sessions import (
        run_session_stream_with_state_flush,
    )

    src = tmp_path / "events"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")

    run_session_stream_with_state_flush(
        spark, str(src), query_name="sessions_state_flush",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    streamed = _closed_key(
        spark.sql("SELECT * FROM sessions_state_flush").collect()
    )
    batch = _closed_key(
        batch_sessionize(
            spark.read.parquet(f"{sf_dir}/events.parquet")
        ).collect()
    )
    assert streamed == batch
    assert len(batch) > 0
    # the sentinel file covers exactly the users still open after the
    # real events (bounded by active users, not corpus users)
    sentinel_files = [
        p for p in src.iterdir() if p.name.startswith("zz_sentinels")
    ]
    assert len(sentinel_files) == 1
    sent = spark.read.parquet(str(sentinel_files[0]))
    assert sent.count() <= spark.read.parquet(
        f"{sf_dir}/events.parquet"
    ).select("user_id").distinct().count()
    assert sent.filter("event_type != '__flush__'").count() == 0


class _FakeState:
    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutTimestamp(self, ts):
        self.timeout = ts


def _run_kernel(state, events_us):
    """Drive _sessionize_group with one micro-batch of (ts_us, value)."""
    import pandas as pd

    from web_content_extraction_benchmark_spark.streaming.sessions import (
        _sessionize_group,
    )

    pdf = pd.DataFrame(
        {
            "ts": [pd.Timestamp(t, unit="us") for t, _ in events_us],
            "value": [v for _, v in events_us],
        }
    )
    return list(_sessionize_group(("u1",), iter([pdf]), state))


def test_kernel_late_event_extends_envelope_not_shrinks():
    """A late-but-within-watermark event arriving in a LATER micro-batch
    must extend the open session's envelope (min start / max end), never
    move session_end backward — an unconditional last=ts would make the
    next in-gap event look like a gap and spuriously split the session
    (code-review r4 finding)."""
    HOUR = 3_600_000_000
    state = _FakeState()
    assert _run_kernel(state, [(10 * HOUR, 1.0)]) == []
    # batch 2: late event 30 min earlier (within a 1h watermark)
    _run_kernel(state, [(int(9.5 * HOUR), 1.0)])
    start, last, n, total = state.get
    assert start == int(9.5 * HOUR)  # envelope extends backward
    assert last == 10 * HOUR         # ...and end does NOT shrink
    assert n == 2
    # batch 3: event 5 min after the true end stays IN the session
    _run_kernel(state, [(10 * HOUR + 300_000_000, 1.0)])
    assert state.get[1] == 10 * HOUR + 300_000_000
    assert state.get[2] == 3


def test_batch_gap_uses_microseconds(spark):
    """Gap arithmetic must match the stream kernel at MICROSECOND
    resolution: a true gap of 1800.9 s splits even though whole-second
    truncation would compute exactly 1800 and merge (code-review r4)."""
    import datetime as dt

    from web_content_extraction_benchmark_spark.streaming.sessions import (
        batch_sessionize,
    )

    t0 = dt.datetime(2023, 1, 1, 0, 0, 10, 0)
    t1 = t0 + dt.timedelta(seconds=1800, microseconds=900_000)
    events = spark.createDataFrame(
        [(1, "u", t0, "e", 1.0, None), (2, "u", t1, "e", 1.0, None)],
        "event_id long, user_id string, ts timestamp_ntz, "
        "event_type string, value double, props string",
    )
    assert batch_sessionize(events).count() == 2  # split, not merged


def test_restart_from_checkpoint_then_flush_equals_batch_truth(
    spark, sf_dir, tmp_path
):
    """The sentinel flush composes with REAL incremental arrival
    (VERDICT r5 #5): phase 1 streams the first half of the events
    (time-split) against a checkpoint and stops WITHOUT flushing;
    phase 2 restarts the SAME checkpoint with the later half appended,
    then flushes from the committed state store.  The union of both
    phases' append output must equal the batch truth on the full event
    set — state (open sessions) survives the restart, cross-phase
    sessions merge, and phase-1 timeouts agree with the batch split
    because every phase-2 event is later than phase 1's max."""
    import os

    from web_content_extraction_benchmark_spark.streaming.sessions import (
        run_session_stream_with_state_flush,
    )

    import pandas as pd

    real = spark.read.parquet(f"{sf_dir}/events.parquet")
    cutoff = int(real.selectExpr(
        "percentile(unix_micros(cast(ts as timestamp_ltz)), 0.5)"
    ).collect()[0][0])
    # plant a GUARANTEED cross-phase session: one user with an event
    # just before and one just after the cutoff (within the session
    # gap) — its single merged session only exists if the open-session
    # state survives the restart
    span_user = 99_999_001  # outside the synthetic user-id range
    ts_at = lambda us: pd.Timestamp(us, unit="us").to_pydatetime()
    planted = spark.createDataFrame(
        [
            (900_001, ts_at(cutoff - 10_000_000), span_user, "view", 1.0, None),
            (900_002, ts_at(cutoff + 10_000_000), span_user, "view", 2.0, None),
        ],
        real.schema,
    )
    events = real.unionByName(planted)
    epoch = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    phase_a = events.filter(epoch < cutoff)
    phase_b = events.filter(epoch >= cutoff)

    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def land(df, name, mtime):
        staging = tmp_path / f"__stage_{name}"
        df.coalesce(1).write.mode("overwrite").parquet(str(staging))
        part = next(p for p in staging.iterdir()
                    if p.name.endswith(".parquet"))
        dest = src / name
        shutil.move(str(part), str(dest))
        os.utime(dest, (mtime, mtime))  # pin file-discovery order

    land(phase_a, "phase_a.parquet", 1_000_000)

    # phase 1: stream A, checkpointed, NO flush.  A durable (parquet)
    # sink is REQUIRED: a memory sink cannot recover a checkpoint, so
    # the phase-2 restart would refuse to start
    out_dir = str(tmp_path / "sessions_out")
    q1 = (
        stream_sessionize(spark, str(src))
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    q1.processAllAvailable()
    q1.stop()
    p1 = _closed_key(spark.read.parquet(out_dir).collect())

    # phase 2: MORE events land, restart from the same checkpoint, flush
    land(phase_b, "phase_b.parquet", 2_000_000)
    run_session_stream_with_state_flush(
        spark, str(src), query_name="sessions_restart_p2",
        checkpoint_dir=ckpt, sink_path=out_dir,
    )
    final = _closed_key(spark.read.parquet(out_dir).collect())
    p2 = final - p1

    batch = _closed_key(batch_sessionize(events).collect())
    assert final == batch
    # both phases contributed
    assert p1 and p2
    assert p1 <= final
    # at least one cross-phase merge happened: some batch session spans
    # the cutoff (starts before, ends at/after) — the case that needs
    # state to survive the restart
    # the planted user's two events straddle the cutoff within the gap:
    # exactly ONE session, spanning both phases — only possible if the
    # open-session state survived the checkpoint restart
    span_sessions = [s for s in final if s[0] == span_user]
    assert len(span_sessions) == 1
    assert span_sessions[0][3] == 2  # both events merged


def test_reflushing_a_flushed_checkpoint_raises(spark, sf_dir, tmp_path):
    """A sentinel-flushed checkpoint is TERMINAL (the watermark sits
    ~2 days ahead): resuming it with more events would silently drop
    them all as late data, so the runner must refuse (review r6)."""
    import pytest as _pytest

    from web_content_extraction_benchmark_spark.streaming.sessions import (
        run_session_stream_with_state_flush,
    )

    src = tmp_path / "events"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    run_session_stream_with_state_flush(
        spark, str(src), query_name="sessions_terminal_p1",
        checkpoint_dir=ckpt, sink_path=out_dir,
    )
    with _pytest.raises(RuntimeError, match="TERMINAL"):
        run_session_stream_with_state_flush(
            spark, str(src), query_name="sessions_terminal_p2",
            checkpoint_dir=ckpt, sink_path=out_dir,
        )
