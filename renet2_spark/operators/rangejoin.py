"""Range (interval-overlap) join — the second temporal operator
Spark's DataFrame API lacks a first-class form of (the naive
formulation is a theta-join that degenerates to a broadcast
nested-loop or a cartesian product).

Formulation: bin both sides onto a fixed-width grid, explode each
interval onto the bins it touches, EQUI-join on (key, bin), refine
with the exact overlap predicate, and drop the duplicate matches an
interval pair produces when it spans several shared bins by keeping
only the pair's FIRST shared bin (the standard dedup-free trick: a
pair's first shared bin is unique, so no distinct/shuffle is spent on
dedup). Catalyst then plans a plain shuffled/broadcast HASH join on
(key, bin) instead of a nested loop.

100 TB shape: the explode fan-out is interval_span / bin_width per
row — pick bin_width near the median interval length so the fan-out
is a small constant; the equi-join shuffles on (key, bin), so even a
single hot key spreads across its time bins (better than the asof
window, which concentrates a key in one task). Degenerate inputs
(an interval spanning the whole corpus) fan out to n_bins rows — cap
via pre-splitting long intervals upstream or a larger bin_width;
accounting stays observable because the fan-out IS the exploded row
count. Parity vs DuckDB's range-predicate join in
tests/test_library_oracle_parity.py (events windows fixture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: tuple[str, ...] | list[str] = (),
    left_bounds: tuple[str, str] = ("start", "end"),
    right_bounds: tuple[str, str] = ("start", "end"),
    bin_width: int = 60,
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner interval-overlap join: pairs (l, r) sharing every `by`
    key with half-open overlap l.start < r.end AND r.start < l.end.
    Bounds columns must be numeric (epoch seconds, offsets, ...) —
    fractional bounds are supported (r7 ADVICE fix: bins are true
    floors of the RAW value, so e.g. (-1.5, -0.2) bins correctly;
    previously a cast-truncation toward zero ran first and fractional
    negative bounds could mis-bin and silently drop overlaps).
    `bin_width` is in the same unit. Output: left columns + right
    columns prefixed with `right_prefix`."""
    ls, le = left_bounds
    rs, re_ = right_bounds
    by = list(by)

    def lo_bin(c):
        # first bin touched: floor(start / width) on the raw value
        return F.floor(F.col(c) / F.lit(bin_width)).cast("long")

    def hi_bin(c):
        # last bin touched by the half-open end: ceil(end/width) - 1.
        # Identical to floor((end-1)/width) for integral ends, and
        # correct (no truncation) for fractional ones; e > s guarantees
        # hi >= lo, so the sequence is never descending.
        return (F.ceil(F.col(c) / F.lit(bin_width)) - 1).cast("long")

    def binned(df: DataFrame, s: str, e: str, tag: str) -> DataFrame:
        # empty intervals bin nowhere
        return df.filter(F.col(e) > F.col(s)).select(
            "*",
            F.explode(F.sequence(lo_bin(s), hi_bin(e))).alias(f"__bin_{tag}"),
        )

    lb = binned(left, ls, le, "l")
    rb = binned(right, rs, re_, "r").select(
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns],
        "__bin_r",
    )
    prs = f"{right_prefix}{rs}"
    pre = f"{right_prefix}{re_}"
    cond = [F.col(c) == F.col(f"{right_prefix}{c}") for c in by] + [
        F.col("__bin_l") == F.col("__bin_r")
    ]
    overlap = (F.col(ls) < F.col(pre)) & (F.col(prs) < F.col(le))
    # keep only the pair's FIRST shared bin: no distinct needed
    # (same lo_bin expression as the explode, so the rule and the
    # fan-out can never disagree — the r7 ADVICE failure mode)
    first_shared = F.greatest(lo_bin(ls), lo_bin(prs))
    out_cols = [*left.columns, *[f"{right_prefix}{c}" for c in right.columns]]
    return (
        lb.join(rb, cond)
        .filter(overlap & (F.col("__bin_l") == first_shared))
        .select(*out_cols)
    )
