"""Merge-style as-of join — the time-series lookup Spark lacks natively.

For every left ("probe") row, attach the single right ("quote") row with
the greatest quote time <= probe time (direction="backward"; "forward"
is the mirror: smallest quote time >= probe time), per join key.

The reference has no time semantics at all (its ordering concern is
stream position, `bits/put.go:86-93`); this operator exists for the
training-data-pipeline surface (event attribution, feature as-of
lookups). Semantics follow the public `pandas.merge_asof` contract
(backward/forward, tolerance, allow_exact_matches=True).

Scale design — why not a range join: an inequality join in Spark plans
as BroadcastNestedLoopJoin (O(|L|x|R|) per key). Instead both sides are
tagged and unioned, shuffled ONCE on the join key, sorted by
(time, tag) within partitions, and the last quote payload is carried
forward with `last(..., ignorenulls=True)` over an unbounded-preceding
running window — O((|L|+|R|) log) per key group, no pair explosion,
exactly one Exchange (plan-asserted in tests/test_asof_range.py). The
quote payload travels as ONE struct column so genuinely-NULL payload
fields cannot make the carry skip backwards to an older quote.

Ties: at equal (key, time) the quote sorts before the probe, so an
exact-time quote is eligible (allow_exact_matches). Multiple quotes at
the same (key, time) are ordered by `tiebreak` (the greatest wins in
backward mode); pass a unique column for deterministic output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_T = "__asof_t"
_TAG = "__asof_is_probe"
_TB = "__asof_tb"
_R = "__asof_r"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    *,
    direction: str = "backward",
    tolerance_sec: float | None = None,
    tiebreak: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join. Returns every left row with the matched right
    payload columns appended (NULL when no quote qualifies). Right
    columns whose names collide with left's get `suffix` appended.

    tolerance_sec: maximum |probe_time - quote_time| in (fractional)
    seconds; farther matches are nulled out, the left row is kept.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    payload_cols = [c for c in right.columns if c not in on]
    if right_time not in payload_cols:
        raise ValueError("right_time must not be a join key")

    tb = (
        F.col(tiebreak)
        if tiebreak is not None
        else F.monotonically_increasing_id()
    )
    probes = left.select(
        *left.columns,
        F.col(left_time).alias(_T),
        F.lit(1).alias(_TAG),
        F.lit(None).cast("long").alias(_TB),
    )
    quotes = right.select(
        *on,
        F.col(right_time).alias(_T),
        F.lit(0).alias(_TAG),
        tb.cast("long").alias(_TB),
        F.struct(*[F.col(c) for c in payload_cols]).alias(_R),
    )
    merged = probes.unionByName(quotes, allowMissingColumns=True)

    if direction == "backward":
        order = [F.col(_T).asc(), F.col(_TAG).asc(), F.col(_TB).asc()]
    else:
        order = [F.col(_T).desc(), F.col(_TAG).asc(), F.col(_TB).desc()]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(_R, F.last(_R, ignorenulls=True).over(w))

    out = carried.where(F.col(_TAG) == 1)
    if tolerance_sec is not None:
        rt = F.col(f"{_R}.{right_time}")
        if dict(left.dtypes)[left_time].startswith("timestamp"):
            # TIMESTAMP_NTZ can't cast to a numeric epoch under Spark 4
            # ANSI; interval bounds keep microsecond precision.
            tol = F.expr(f"INTERVAL '{float(tolerance_sec)}' SECOND")
            within = (rt >= F.col(_T) - tol) & (rt <= F.col(_T) + tol)
        else:
            gap = F.abs(F.col(_T) - rt)
            within = gap <= F.lit(float(tolerance_sec))
        out = out.withColumn(_R, F.when(within, F.col(_R)))

    taken = set(left.columns)
    exprs = [F.col(c) for c in left.columns]
    for c in payload_cols:
        name = c + suffix if c in taken else c
        exprs.append(F.col(f"{_R}.{c}").alias(name))
    return out.select(*exprs)
