"""Semantics tests for gap-based sessionization (operators/sessionize).
(Cross-engine parity vs the identical DuckDB window formulation runs
in test_library_oracle_parity.py::events_sessionize.)"""

from datetime import datetime, timedelta

from renet2_spark.operators.sessionize import sessionize

SCHEMA = "eid int, ts timestamp, user_id string"


def t(s):
    return datetime(2024, 1, 1) + timedelta(seconds=s)


def test_sessionize_gap_boundaries(spark):
    ev = spark.createDataFrame(
        [
            (1, t(0), "a"),
            (2, t(100), "a"),    # gap 100 == gap_seconds: SAME session
            (3, t(201), "a"),    # gap 101 > 100: new session
            (4, t(0), "b"),      # keys are independent
            (5, t(1000), "b"),
        ],
        SCHEMA,
    )
    got = {
        r["eid"]: r["session_no"]
        for r in sessionize(ev, by=("user_id",), gap_seconds=100).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 2}


def test_sessionize_numeric_time_axis(spark):
    """Works on plain numeric time axes too (offsets, epoch ints)."""
    ev = spark.createDataFrame(
        [(1, 0, "a"), (2, 5, "a"), (3, 100, "a")],
        "eid int, ts long, user_id string",
    )
    got = {
        r["eid"]: r["session_no"]
        for r in sessionize(ev, by=("user_id",), gap_seconds=10).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2}


def test_sessionize_matches_bruteforce_random(spark):
    """Seeded randomized anchor vs a sequential per-key scan."""
    import random

    rng = random.Random(20240817)
    rows = [
        (i, t(rng.randint(0, 50_000)), rng.choice("abc"))
        for i in range(300)
    ]
    gap = 400
    got = {
        r["eid"]: r["session_no"]
        for r in sessionize(
            spark.createDataFrame(rows, SCHEMA),
            by=("user_id",),
            gap_seconds=gap,
        ).collect()
    }
    expected = {}
    bykey: dict = {}
    for eid, ts, k in rows:
        bykey.setdefault(k, []).append((ts, eid))
    for k, evs in bykey.items():
        evs.sort()  # (ts, eid) — matches the operator's tie-break
        sn, prev = 0, None
        for ts, eid in evs:
            if prev is None or (ts - prev).total_seconds() > gap:
                sn += 1
            expected[eid] = sn
            prev = ts
    assert got == expected


def test_stream_session_counts_matches_batch_sessions(spark, tmp_path):
    """Streaming session_window counterpart: sessions emit exactly
    once as the watermark passes their close, and the closed sessions'
    (user, start, n_events) equal the batch sessionize() grouping over
    the same rows."""
    import datetime as dt

    from pyspark.sql import functions as F

    from renet2_spark.streaming.incremental import stream_session_counts

    indir, outdir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    )
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def write(rows):
        spark.createDataFrame(
            rows, "event_id bigint, ts timestamp, user_id bigint"
        ).coalesce(1).write.mode("append").parquet(indir)

    b1 = [
        (1, t0, 1),
        (2, t0 + dt.timedelta(minutes=10), 1),   # same session (gap 10)
        (3, t0 + dt.timedelta(minutes=120), 1),  # new session
        (4, t0, 2),
    ]
    write(b1)
    stream_session_counts(spark, indir, outdir, ckpt)
    got1 = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.read.parquet(outdir).collect()
    }
    # watermark after b1 = t0+120m - 60m: the two t0 sessions (closing
    # t0+40m / t0+30m) emitted; user 1's t0+120m session still open
    assert got1 == {(1, t0): 2, (2, t0): 1}

    # a far-future row advances the watermark and flushes it
    write([(5, t0 + dt.timedelta(minutes=600), 2)])
    stream_session_counts(spark, indir, outdir, ckpt)
    got2 = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in spark.read.parquet(outdir).collect()
    }
    assert got2[(1, t0 + dt.timedelta(minutes=120))] == 1

    # closed streaming sessions == batch sessionize grouping on the
    # same rows (the late flusher's own session is still open)
    from renet2_spark.operators.sessionize import sessionize

    batch = (
        sessionize(
            spark.createDataFrame(
                b1, "event_id bigint, ts timestamp, user_id bigint"
            ),
            on="ts",
            by=("user_id",),
            gap_seconds=1800,
        )
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.count("*").alias("n_events"),
        )
    )
    expected = {
        (r["user_id"], r["session_start"]): r["n_events"]
        for r in batch.collect()
    }
    assert got2 == expected
