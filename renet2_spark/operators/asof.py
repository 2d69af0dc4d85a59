"""As-of (most-recent-prior) join — a temporal operator Spark's
DataFrame API lacks natively, expressed as a composition of built-in
ops so Catalyst/Tungsten still own the physical plan (the task class:
enrich each event with the latest earlier observation from another
stream, per key — quotes-to-trades, config-to-request, view-to-click).

Formulation (the standard scalable one): tag both inputs, unionByName,
ONE shuffle on the key, and a per-key window that carries the last
right-side row forward (`last(..., ignorenulls=True)` over rows
UNBOUNDED PRECEDING..CURRENT). No per-key loop, no range self-join,
no row-at-a-time python. At 100 TB: the single exchange partitions by
the join key; within-key ORDER BY ts sorts each partition (Spark's
external sort spills — a year-long key history is fine); a key so hot
its full history dominates one task is the same skew class as any
windowed computation and time-bucketing the window (join on
(key, bucket), patch bucket boundaries) is the documented escape
hatch. Semantics pinned against DuckDB's native ASOF JOIN in
tests/test_library_oracle_parity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: tuple[str, ...] | list[str] = ("user_id",),
    right_prefix: str = "r_",
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tolerance: Column | None = None,
) -> DataFrame:
    """Left as-of join: every left row gains the right row with the
    largest right.on <= left.on (direction='backward'; 'forward' takes
    the smallest right.on >= left.on) within the same `by` key, or
    NULLs if none exists (left-outer semantics, matching DuckDB
    `ASOF LEFT JOIN`). Right columns come back prefixed with
    `right_prefix` (the `on`/`by` columns included, so the matched
    timestamp is observable). allow_exact_matches=False excludes a
    right row at exactly left.on. `tolerance` (an interval Column,
    e.g. F.expr("INTERVAL 5 MINUTES")) voids matches older (backward)
    / newer (forward) than left.on - / + tolerance.

    Ties: several right rows sharing (by, on) are resolved
    deterministically by the LARGEST remaining right column tuple in
    BOTH directions (the window orders the payload ascending and
    last() picks the maximum regardless of the ts direction — r7
    ADVICE docstring fix; behavior unchanged and pinned by the parity
    tests) — callers needing a specific tie-break should pre-dedupe,
    as with pandas merge_asof.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    lcols = left.columns
    rcols = [c for c in right.columns]
    payload = F.struct(*[F.col(f"__r_{c}").alias(c) for c in rcols])

    # right rows must sort BEFORE an equal-ts left row iff exact
    # matches count (backward; mirrored for forward) — the _side
    # ordering encodes allow_exact_matches with zero extra predicates
    side_right = 0 if allow_exact_matches else 2
    tagged_r = right.select(
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        F.lit(side_right).alias("__side"),
    ).withColumns(
        {c: F.col(f"__r_{c}") for c in by + [on]}
    )
    tagged_l = left.select(
        *lcols,
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in rcols],
        F.lit(1).alias("__side"),
    )
    u = tagged_l.unionByName(tagged_r, allowMissingColumns=True)

    # payload joins the ordering so ties among right rows sharing
    # (by, on) resolve deterministically (last() takes the largest
    # remaining right tuple); left rows carry NULL there and their
    # relative order cannot matter (their payload is ignored)
    ts_order = F.col(on).asc() if direction == "backward" else F.col(on).desc()
    w = (
        Window.partitionBy(*by)
        .orderBy(ts_order, F.col("__side").asc(), payload.asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last(
        F.when(F.col("__side") != 1, payload), ignorenulls=True
    ).over(w)
    out = (
        u.withColumn("__m", carried)
        .filter(F.col("__side") == 1)
        .select(
            *lcols,
            *[
                F.col("__m").getField(c).alias(f"{right_prefix}{c}")
                for c in rcols
            ],
        )
    )
    if tolerance is not None:
        mts = F.col(f"{right_prefix}{on}")
        if direction == "backward":
            keep = mts >= F.col(on) - tolerance
        else:
            keep = mts <= F.col(on) + tolerance
        out = out.select(
            *lcols,
            *[
                F.when(keep, F.col(f"{right_prefix}{c}"))
                .otherwise(F.lit(None).cast(right.schema[c].dataType))
                .alias(f"{right_prefix}{c}")
                for c in rcols
            ],
        )
    return out
