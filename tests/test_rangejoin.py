"""Semantics tests for the binned range join (operators/rangejoin):
half-open overlap, multi-bin dedup, negative bounds, empty intervals,
key isolation. (Cross-engine parity vs DuckDB's range-predicate join
runs in test_library_oracle_parity.py::events_range.)"""

from renet2_spark.operators.rangejoin import range_join

LSCHEMA = "lid int, k string, start long, end long"
RSCHEMA = "rid int, k string, start long, end long"


def _pairs(df):
    return {(r["lid"], r["r_rid"]) for r in df.collect()}


def test_range_join_halfopen_and_multibin_dedup(spark):
    left = spark.createDataFrame(
        [
            (1, "a", 0, 1000),    # spans many bins vs r10 -> ONE row
            (2, "a", 1000, 1100), # touches lid=1's end: no self-rel here
            (3, "a", 5000, 5010),
        ],
        LSCHEMA,
    )
    right = spark.createDataFrame(
        [
            (10, "a", 500, 1500),  # overlaps 1 (500..1000) and 2
            (11, "a", 1100, 1200), # adjacent to 2 (end==start): NO match
            (12, "a", 5009, 6000), # 1-point overlap with 3
        ],
        RSCHEMA,
    )
    got = _pairs(range_join(left, right, by=("k",), bin_width=100))
    assert got == {(1, 10), (2, 10), (3, 12)}


def test_range_join_multibin_pair_emitted_once(spark):
    left = spark.createDataFrame([(1, "a", 0, 10_000)], LSCHEMA)
    right = spark.createDataFrame([(10, "a", 0, 10_000)], RSCHEMA)
    rows = range_join(left, right, by=("k",), bin_width=7).collect()
    assert len(rows) == 1  # 1429 shared bins, exactly one output row


def test_range_join_negative_bounds_and_keys(spark):
    left = spark.createDataFrame(
        [(1, "a", -250, -50), (2, "b", -250, -50)], LSCHEMA
    )
    right = spark.createDataFrame(
        [(10, "a", -100, 0), (11, "a", -1000, -251)], RSCHEMA
    )
    got = _pairs(range_join(left, right, by=("k",), bin_width=60))
    # floor-binning, not cast-truncation: -100..-50 overlap found; the
    # disjoint r11 and the other key's lid=2 produce nothing
    assert got == {(1, 10)}


def test_range_join_empty_intervals_drop(spark):
    left = spark.createDataFrame([(1, "a", 5, 5)], LSCHEMA)
    right = spark.createDataFrame([(10, "a", 0, 100)], RSCHEMA)
    assert range_join(left, right, by=("k",), bin_width=10).count() == 0


def test_range_join_no_by_key(spark):
    left = spark.createDataFrame([(1, "a", 0, 10)], LSCHEMA)
    right = spark.createDataFrame([(10, "zzz", 5, 15)], RSCHEMA)
    got = _pairs(range_join(left, right, bin_width=4))
    assert got == {(1, 10)}


def test_range_join_matches_bruteforce_random(spark):
    """Seeded randomized anchor: the binned equi-join equals the naive
    O(n*m) overlap enumeration on random intervals, across bin widths
    that are smaller than / comparable to / larger than the spans."""
    import random

    rng = random.Random(20240817)
    left = [
        (i, rng.choice("ab"), s := rng.randint(-500, 500),
         s + rng.randint(0, 300))
        for i in range(120)
    ]
    right = [
        (i, rng.choice("ab"), s := rng.randint(-500, 500),
         s + rng.randint(0, 300))
        for i in range(120)
    ]
    expected = {
        (l[0], r[0])
        for l in left
        for r in right
        if l[1] == r[1] and l[2] < r[3] and r[2] < l[3]
    }
    ldf = spark.createDataFrame(left, LSCHEMA)
    rdf = spark.createDataFrame(right, RSCHEMA)
    for w in (7, 100, 1000):
        got = _pairs(range_join(ldf, rdf, by=("k",), bin_width=w))
        assert got == expected, f"bin_width={w}"


def test_range_join_fractional_bounds(spark):
    """r7 ADVICE fix: fractional (incl. fractional NEGATIVE) bounds
    bin on true floors of the raw value — (-1.5,-0.2) vs (-0.9,-0.3)
    truly overlap and must be emitted exactly once (the old
    cast-truncation binning silently dropped this pair), and the
    first-shared-bin dedup rule must agree with the fan-out."""
    left = spark.createDataFrame(
        [(1, "a", -1.5, -0.2), (2, "a", 0.25, 0.75), (3, "a", 2.5, 7.5)],
        "lid int, k string, start double, end double",
    )
    right = spark.createDataFrame(
        [
            (10, "a", -0.9, -0.3),   # overlaps 1 (old binning dropped it)
            (11, "a", 0.5, 0.6),     # inside 2
            (12, "a", -0.2, 0.25),   # adjacent to 1 AND 2: no match
            (13, "a", 7.4, 9.0),     # 0.1-wide overlap with 3
        ],
        "rid int, k string, start double, end double",
    )
    got = _pairs(range_join(left, right, by=("k",), bin_width=1))
    assert got == {(1, 10), (2, 11), (3, 13)}
    # multi-bin fractional pair emitted exactly once
    rows = range_join(left, right, by=("k",), bin_width=1).collect()
    assert len(rows) == 3
