"""Gap-based sessionization — assign each event a session id that
closes when the key goes quiet for longer than `gap` (the classic
event-stream operator; clickstream sessions, device uptime episodes,
conversation threading).

Formulation: per-key window, `lag(ts)` marks session STARTS (gap
exceeded or first event), a running SUM of the start flags numbers
the sessions — two window functions over ONE key-partitioned sort,
no join, no explode, whole-stage-codegen throughout.

100 TB shape: one exchange on the key; within-key ORDER BY ts is an
external sort (spills). Like every per-key ordered computation a
single pathologically hot key serializes its own history into one
task — the standard escape is pre-bucketing by (key, coarse time
bucket) and stitching boundary sessions. Parity vs an identical
DuckDB window formulation in tests/test_library_oracle_parity.py;
the streaming-native equivalent for unbounded inputs is
session_window() in Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] | list[str] = ("user_id",),
    gap_seconds: int = 1800,
    session_col: str = "session_no",
) -> DataFrame:
    """Adds `session_col`: 1-based session number per `by` key, a new
    session starting whenever the time since the key's previous event
    exceeds `gap_seconds` (a gap of exactly gap_seconds stays in the
    same session). Ties on `on` within a key are ordered
    deterministically by the remaining columns before numbering."""
    by = list(by)
    others = [c for c in events.columns if c not in by and c != on]
    order = [F.col(on).asc()] + [F.col(c).asc() for c in others]
    w = Window.partitionBy(*by).orderBy(*order)
    # timestamp/timestamp_ntz -> fractional epoch seconds (gap is a
    # DIFFERENCE, so the zone interpretation of ntz cancels); numeric
    # axes pass through
    if dict(events.dtypes)[on].startswith("timestamp"):
        tsec = F.unix_micros(F.col(on).cast("timestamp")) / F.lit(1e6)
    else:
        tsec = F.col(on).cast("double")
    prev = F.lag(tsec).over(w)
    is_start = (
        prev.isNull() | (tsec - prev > F.lit(float(gap_seconds)))
    ).cast("long")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.select(
        "*",
        F.sum(is_start).over(wsum).cast("long").alias(session_col),
    )
