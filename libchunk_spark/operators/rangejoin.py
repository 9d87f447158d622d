"""Bucketized time-range join — equi-join re-expression of an
interval predicate.

`probe ⋈ quote ON key AND quote_time IN (probe_time+lo, probe_time+hi]`
planned naively is a BroadcastNestedLoopJoin (the only physical
strategy Spark has for non-equi conditions) — O(|P|x|Q|) per key and a
broadcast of a whole side; a scale-killer at 10^12 rows. The standard
re-expression (used by every production range-join engine, e.g.
Databricks' range-join bin optimization) is:

  1. assign every quote to ONE time bucket of width `bucket_sec`
     (floor(epoch/bucket));
  2. explode every probe to the small, fixed set of buckets its
     (lo, hi] window can overlap;
  3. shuffle equi-join on (key, bucket) — hash/sort-merge, skew-safe,
     AQE-eligible;
  4. re-apply the exact interval predicate on full-precision
     timestamps to discard bucket-edge false candidates.

Each quote lands in exactly one bucket, so no post-join dedup is
needed. The plan is asserted free of BroadcastNestedLoopJoin /
CartesianProduct in tests/test_asof_range.py.

No reference counterpart (the reference has no time axis); this is
training-pipeline surface (windowed feature counts, near-time event
correlation).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__rj_bucket"


def bucketed_range_join(
    probe: DataFrame,
    quote: DataFrame,
    on: list[str],
    probe_time: str,
    quote_time: str,
    *,
    lo_sec: float,
    hi_sec: float,
    bucket_sec: int = 3600,
    lo_open: bool = True,
    suffix: str = "_q",
) -> DataFrame:
    """Inner-join probe rows to quote rows with the same `on` keys and
    `quote_time - probe_time` in (lo_sec, hi_sec] (closed-closed when
    lo_open=False). Returns probe columns + quote columns (collisions
    suffixed; join keys keep their names). Interval filtering is exact
    (full timestamp precision); buckets only bound the candidate set.
    """
    if hi_sec < lo_sec:
        raise ValueError("hi_sec must be >= lo_sec")

    # Bucket epochs come from integer-truncated unix_timestamp; with
    # e' = floor(epoch(probe)) the candidate quote buckets are exactly
    # floor((e'+floor(lo))/w) .. floor((e'+ceil(hi))/w) — a superset of
    # the real-valued (lo, hi] window because floor(epoch(quote)) lies
    # in [e'+floor(lo), e'+ceil(hi)] whenever the quote qualifies.
    p_epoch = F.unix_timestamp(F.col(probe_time))
    q_epoch = F.unix_timestamp(F.col(quote_time))
    first = F.floor((p_epoch + F.lit(int(math.floor(lo_sec)))) / bucket_sec)
    last = F.floor((p_epoch + F.lit(int(math.ceil(hi_sec)))) / bucket_sec)
    probes = probe.withColumn(_B, F.explode(F.sequence(first, last)))
    quotes = quote.withColumn(_B, F.floor(q_epoch / bucket_sec))

    taken = set(probe.columns)
    renamed = quotes.select(
        _B,
        *on,
        *[
            F.col(c).alias(c + suffix if c in taken else c)
            for c in quote.columns
            if c not in on
        ],
    )
    # Exact residual predicate on full-precision timestamps (interval
    # arithmetic keeps microseconds; TIMESTAMP_NTZ cannot be cast to a
    # numeric epoch under Spark 4 ANSI).
    qt = quote_time + suffix if quote_time in taken else quote_time
    lo_bound = F.col(probe_time) + F.expr(f"INTERVAL '{float(lo_sec)}' SECOND")
    hi_bound = F.col(probe_time) + F.expr(f"INTERVAL '{float(hi_sec)}' SECOND")
    lo_pred = F.col(qt) > lo_bound if lo_open else F.col(qt) >= lo_bound
    return (
        probes.join(renamed, on=[_B, *on], how="inner")
        .where(lo_pred & (F.col(qt) <= hi_bound))
        .drop(_B)
    )
