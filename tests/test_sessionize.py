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
