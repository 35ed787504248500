"""Stateful streaming sessionization (applyInPandasWithState):
streamed closed sessions == batch sessionizer output over the same
events, under forced one-file-per-micro-batch slicing."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

SCHEMA = "user_id long, ts timestamp, event_type string, value double"


def _events():
    """3 users, multiple sessions each, plus a far-future sentinel per
    user that forces every REAL session closed via the in-data gap path
    (the sentinel's own session stays open and is never emitted)."""
    t0 = datetime(2024, 1, 1, 0, 0)
    rows = []
    for u in range(3):
        # session 1: 3 events 5 min apart
        for i in range(3):
            rows.append((u, t0 + timedelta(minutes=5 * i + u), "click", 1.0))
        # session 2: starts 2h later, 2 events
        for i in range(2):
            rows.append(
                (u, t0 + timedelta(hours=2, minutes=3 * i + u), "view", 2.0)
            )
        # session 3: single event 5h in
        rows.append((u, t0 + timedelta(hours=5, minutes=u), "click", 0.5))
        # sentinel: far future, closes session 3
        rows.append((u, t0 + timedelta(days=30), "flush", 0.0))
    return rows


def test_streamed_sessions_equal_batch(spark, tmp_path):
    from fornax_spark.operators.sessions import sessionize
    from fornax_spark.streaming.stateful import sessionize_stream

    rows = sorted(_events(), key=lambda r: r[1])
    # slice into 4 time-contiguous chunks = 4 micro-batches (streams
    # deliver roughly time-ordered data; the watermark bounds disorder —
    # a gap sessionizer is not defined under arbitrary time travel)
    src = tmp_path / "events_src"
    src.mkdir()
    step = (len(rows) + 3) // 4
    for i in range(4):
        chunk = rows[i * step : (i + 1) * step]
        if chunk:
            spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
                str(src / f"part{i}")
            )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "part*"))
    )
    out = sessionize_stream(stream, gap_minutes=30, use_timeout=False)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }

    # batch ground truth over the REAL events (sentinels excluded: their
    # sessions are still open in the stream)
    batch_df = spark.createDataFrame(
        [r for r in rows if r[2] != "flush"], SCHEMA
    )
    want = {
        (r["user_id"], r["session_id"]): (
            r["n_events"],
            r["start_us"],
            r["end_us"],
        )
        for r in sessionize(batch_df, gap_minutes=30)
        .select(
            "user_id",
            F.col("session_id").cast("long").alias("session_id"),
            "n_events",
            F.unix_micros(F.col("start_ts").cast("timestamp")).alias("start_us"),
            F.unix_micros(F.col("end_ts").cast("timestamp")).alias("end_us"),
        )
        .collect()
    }
    assert got == want
    assert len(got) == 9  # 3 users x 3 real sessions


def test_late_in_gap_event_in_later_batch(spark, tmp_path):
    """An event that is LATE across micro-batches (t < open session's end,
    but inside the gap) must extend the session, not regress its end —
    streamed output still equals the batch sessionizer, which sees all
    events globally sorted."""
    from fornax_spark.operators.sessions import sessionize
    from fornax_spark.streaming.stateful import sessionize_stream

    t0 = datetime(2024, 1, 1)
    # delivery order: t0 and t0+10m arrive first, THEN t0+5m (late,
    # in-gap), then a post-gap event opens session 2, then a flush
    # sentinel closes it.  With the pre-fix code the late event set
    # e=t0+5m, so the t0+2h comparison used a regressed end.
    batches = [
        [(0, t0, "c", 1.0), (0, t0 + timedelta(minutes=10), "c", 1.0)],
        [(0, t0 + timedelta(minutes=5), "c", 1.0)],  # late, in-gap
        [(0, t0 + timedelta(hours=2), "c", 1.0)],
        [(0, t0 + timedelta(days=30), "flush", 0.0)],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, chunk in enumerate(batches):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            str(src / f"p{i}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "p*"))
    )
    out = sessionize_stream(stream, gap_minutes=30, use_timeout=False)
    q = (
        out.writeStream.format("memory")
        .queryName("late_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_late"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in spark.sql("SELECT * FROM late_out").collect()
    }
    real = [r for chunk in batches for r in chunk if r[2] != "flush"]
    want = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in sessionize(spark.createDataFrame(real, SCHEMA), gap_minutes=30)
        .select(
            "user_id",
            F.col("session_id").cast("long").alias("session_id"),
            "n_events",
            F.unix_micros(F.col("start_ts").cast("timestamp")).alias("start_us"),
            F.unix_micros(F.col("end_ts").cast("timestamp")).alias("end_us"),
        )
        .collect()
    }
    assert got == want
    # the late event joined session 1: 3 events, end = t0+10m (not +5m)
    assert got[(0, 1)][0] == 3


def test_pre_gap_late_event_emits_earlier_session(spark, tmp_path):
    """ADVICE r3: a late event OLDER than the open session's start minus
    the gap is a separate EARLIER session in batch semantics — the
    stream must emit it as its own closed session(s) and renumber the
    still-open session past them, keeping stream == batch. Covers one
    pre-session (user 0) and two gap-separated pre-sessions (user 1)."""
    from fornax_spark.operators.sessions import sessionize
    from fornax_spark.streaming.stateful import sessionize_stream

    t0 = datetime(2024, 1, 1)
    batches = [
        [
            (0, t0 + timedelta(hours=1), "c", 1.0),
            (0, t0 + timedelta(hours=1, minutes=5), "c", 1.0),
            (1, t0 + timedelta(hours=2), "c", 1.0),
        ],
        [
            # user 0: one pre-gap late event (t0 < open start - 30m)
            (0, t0, "c", 1.0),
            # user 1: two pre-gap late events, 1h apart -> TWO earlier
            # sessions, open session renumbered by 2
            (1, t0, "c", 1.0),
            (1, t0 + timedelta(hours=0, minutes=2), "c", 1.0),
            (1, t0 + timedelta(hours=1), "c", 1.0),
        ],
        [
            (0, t0 + timedelta(hours=3), "c", 1.0),
            (1, t0 + timedelta(hours=4), "c", 1.0),
        ],
        [(0, t0 + timedelta(days=30), "flush", 0.0),
         (1, t0 + timedelta(days=30), "flush", 0.0)],
    ]
    src = tmp_path / "pregap_src"
    src.mkdir()
    for i, chunk in enumerate(batches):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.parquet(
            str(src / f"p{i}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "p*"))
    )
    out = sessionize_stream(stream, gap_minutes=30, use_timeout=False)
    q = (
        out.writeStream.format("memory")
        .queryName("pregap_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_pregap"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in spark.sql("SELECT * FROM pregap_out").collect()
    }
    real = [r for chunk in batches for r in chunk if r[2] != "flush"]
    want = {
        (r["user_id"], r["session_id"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in sessionize(spark.createDataFrame(real, SCHEMA), gap_minutes=30)
        .select(
            "user_id",
            F.col("session_id").cast("long").alias("session_id"),
            "n_events",
            F.unix_micros(F.col("start_ts").cast("timestamp")).alias("start_us"),
            F.unix_micros(F.col("end_ts").cast("timestamp")).alias("end_us"),
        )
        .collect()
    }
    assert got == want
    # user 1: pre-sessions took ids 1, 2; the open session became 3
    assert got[(1, 1)][0] == 2 and got[(1, 2)][0] == 1 and got[(1, 3)][0] == 1


def test_session_numbering_survives_timeout(spark, tmp_path):
    """After a session is closed by the event-time TIMEOUT path, the
    user's next session must continue the cumsum numbering (sid=2), not
    restart at 1 and collide with the already-emitted id."""
    from fornax_spark.streaming.stateful import sessionize_stream

    t0 = datetime(2024, 1, 1)
    rows = [
        (0, t0, "c", 1.0),  # user 0 session 1, then idle
        (1, t0 + timedelta(hours=2), "c", 1.0),
        (1, t0 + timedelta(hours=9), "c", 1.0),  # watermark -> 8h, s1 times out
        (0, t0 + timedelta(hours=10), "c", 1.0),  # user 0 session 2
        (1, t0 + timedelta(hours=20), "c", 1.0),
        (1, t0 + timedelta(hours=30), "c", 1.0),  # watermark -> 29h, s2 times out
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, r in enumerate(rows):  # one event per micro-batch
        spark.createDataFrame([r], SCHEMA).coalesce(1).write.parquet(
            str(src / f"p{i}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "p*"))
    )
    out = sessionize_stream(
        stream, gap_minutes=30, watermark="1 hour", use_timeout=True
    )
    q = (
        out.writeStream.format("memory")
        .queryName("renumber_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_num"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in spark.sql("SELECT * FROM renumber_out").collect()
    }
    assert got[(0, 1)] == 1
    assert (0, 2) in got, f"second session must be sid=2, got {sorted(got)}"
    assert got[(0, 2)] == 1


def test_event_time_timeout_closes_idle_sessions(spark, tmp_path):
    """A user with no further events still gets their session emitted
    once ANOTHER user's events push the watermark past the idle
    deadline — the event-time-timeout path."""
    from datetime import datetime, timedelta

    from fornax_spark.streaming.stateful import sessionize_stream

    t0 = datetime(2024, 1, 1)
    rows = [
        (0, t0, "c", 1.0),
        (0, t0 + timedelta(minutes=5), "c", 1.0),  # user 0 goes idle
        (1, t0 + timedelta(hours=2), "c", 1.0),
        (1, t0 + timedelta(hours=9), "c", 1.0),  # watermark -> 8h
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, r in enumerate(rows):  # one event per micro-batch
        spark.createDataFrame([r], SCHEMA).coalesce(1).write.parquet(
            str(src / f"p{i}")
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "p*"))
    )
    out = sessionize_stream(
        stream, gap_minutes=30, watermark="1 hour", use_timeout=True
    )
    q = (
        out.writeStream.format("memory")
        .queryName("timeout_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in spark.sql("SELECT * FROM timeout_out").collect()
    }
    # user 0's only session closed by TIMEOUT (they never spoke again);
    # user 1's first session closed by their own later event
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 1
