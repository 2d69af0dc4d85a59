"""Semantics tests for the as-of join (operators/asof): directionality,
exact-match toggle, tolerance, left-outer NULLs, key isolation.
(Cross-engine parity vs DuckDB's native ASOF JOIN runs in
test_library_oracle_parity.py::events_asof.)"""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from renet2_spark.operators.asof import asof_join

LSCHEMA = "lid int, ts timestamp, k string"
RSCHEMA = "rid int, ts timestamp, k string, v double"


def t(m):
    return datetime(2024, 1, 1, 0, m)


def _fixture(spark):
    left = spark.createDataFrame(
        [
            (1, t(5), "a"),   # after r10/r12? -> most recent prior
            (2, t(10), "a"),  # exactly at r2's ts
            (3, t(1), "a"),   # before everything -> NULL
            (4, t(30), "b"),  # other key: only r3 eligible
        ],
        LSCHEMA,
    )
    right = spark.createDataFrame(
        [
            (10, t(2), "a", 1.0),
            (11, t(4), "a", 2.0),
            (12, t(10), "a", 3.0),
            (13, t(3), "b", 4.0),
            (14, t(50), "b", 5.0),  # future: ineligible backward
        ],
        RSCHEMA,
    )
    return left, right


def test_asof_backward_exact_and_nulls(spark):
    left, right = _fixture(spark)
    got = {
        r["lid"]: (r["r_rid"], r["r_v"])
        for r in asof_join(left, right, on="ts", by=("k",)).collect()
    }
    assert got[1] == (11, 2.0)      # latest ts <= 00:05 is r11 @00:04
    assert got[2] == (12, 3.0)      # exact match allowed by default
    assert got[3] == (None, None)   # nothing earlier -> left-outer NULL
    assert got[4] == (13, 4.0)      # key-isolated; r14 is in the future


def test_asof_backward_no_exact(spark):
    left, right = _fixture(spark)
    got = {
        r["lid"]: r["r_rid"]
        for r in asof_join(
            left, right, on="ts", by=("k",), allow_exact_matches=False
        ).collect()
    }
    assert got[2] == 11  # r12 @10:00 excluded, falls back to r11


def test_asof_forward(spark):
    left, right = _fixture(spark)
    got = {
        r["lid"]: r["r_rid"]
        for r in asof_join(
            left, right, on="ts", by=("k",), direction="forward"
        ).collect()
    }
    assert got[3] == 10   # earliest ts >= 00:01
    assert got[1] == 12   # earliest ts >= 00:05
    assert got[4] == 14   # b-key future row
    assert got[2] == 12   # exact forward match


def test_asof_tolerance_voids_stale_matches(spark):
    left, right = _fixture(spark)
    got = {
        r["lid"]: r["r_rid"]
        for r in asof_join(
            left,
            right,
            on="ts",
            by=("k",),
            tolerance=F.expr("INTERVAL 2 MINUTES"),
        ).collect()
    }
    assert got[1] == 11          # 1 minute old: within tolerance
    assert got[4] is None        # r13 is 27 minutes old: voided
    assert got[2] == 12          # age 0


def test_asof_deterministic_tie_break(spark):
    """Two right rows at the identical (key, ts): the carried match is
    the largest right tuple — stable across partitionings."""
    left = spark.createDataFrame([(1, t(9), "a")], LSCHEMA)
    right = spark.createDataFrame(
        [(20, t(9), "a", 1.0), (21, t(9), "a", 2.0)], RSCHEMA
    )
    for nparts in (1, 7):
        got = asof_join(
            left.repartition(nparts), right.repartition(nparts),
            on="ts", by=("k",),
        ).collect()
        assert (got[0]["r_rid"], got[0]["r_v"]) == (21, 2.0)


def test_asof_matches_pandas_merge_asof_random(spark):
    """Seeded randomized anchor: asof_join equals pandas.merge_asof
    on random per-key event streams (backward, exact matches allowed,
    unique (key, ts) so the pandas tie semantics cannot diverge)."""
    import random

    import pandas as pd

    rng = random.Random(20240817)
    ts_pool = rng.sample(range(1, 100_000), 400)
    lrows = [
        (i, datetime(2024, 1, 1) + timedelta(seconds=ts_pool[i]),
         rng.choice("abc"))
        for i in range(200)
    ]
    rrows = [
        (i, datetime(2024, 1, 1) + timedelta(seconds=ts_pool[200 + i]),
         rng.choice("abc"), float(i))
        for i in range(200)
    ]
    got = {
        r["lid"]: r["r_rid"]
        for r in asof_join(
            spark.createDataFrame(lrows, LSCHEMA),
            spark.createDataFrame(rrows, RSCHEMA),
            on="ts",
            by=("k",),
        ).collect()
    }
    lpd = pd.DataFrame(lrows, columns=["lid", "ts", "k"]).sort_values("ts")
    rpd = pd.DataFrame(
        rrows, columns=["rid", "ts", "k", "v"]
    ).sort_values("ts")
    m = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="backward")
    expected = {
        int(row.lid): (None if pd.isna(row.rid) else int(row.rid))
        for row in m.itertuples()
    }
    assert got == expected
