"""Salted two-phase aggregation — explicit skew mitigation for
low-cardinality / heavy-hitter group keys.

A `groupBy(key)` over a key with few distinct values (here: 5 event
types over 10^12 events) concentrates each group's ENTIRE row volume
on one reduce task; map-side partial aggregation hides this for simple
aggregates but not for `countDistinct` (distinct values must co-locate)
or for high-cardinality intermediate state. The classic fix is salting:

  phase 1: groupBy(key, salt) where salt = hash(disjointing column) % n
           — n-way parallel partial aggregates per hot key;
  phase 2: groupBy(key) folding the partials — n small rows per key.

`countDistinct(d)` stays EXACT because the salt is derived from the
distinct-counted column itself: every value of d lands in exactly one
salt bucket, so per-bucket distinct counts are disjoint and sum
cleanly (the same disjointness argument as a two-level distinct
aggregation rewrite).

No reference counterpart (the reference has no aggregation); this is
the skew-handling surface SURVEY.md §2.2 promises for 100 TB groupBys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_agg(
    df: DataFrame,
    keys: list[str],
    *,
    salt_from: str,
    n_salts: int = 64,
    count_alias: str = "n",
    sum_col: str | None = None,
    sum_alias: str = "sum_value",
    distinct_alias: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregate: per `keys`, a row count, optionally
    `sum(sum_col)`, and optionally an EXACT `countDistinct(salt_from)`
    (aliased `distinct_alias`). The salt is `xxhash64(salt_from) %
    n_salts`, so distinct counts over `salt_from` partition cleanly
    across salt buckets.
    """
    partial_aggs = [F.count("*").alias("__pn")]
    if sum_col is not None:
        partial_aggs.append(F.sum(sum_col).alias("__psum"))
    if distinct_alias is not None:
        partial_aggs.append(
            F.countDistinct(F.col(salt_from)).alias("__pdist")
        )
    partial = (
        df.withColumn(
            _SALT, F.pmod(F.xxhash64(F.col(salt_from)), F.lit(n_salts))
        )
        .groupBy(*keys, _SALT)
        .agg(*partial_aggs)
    )

    final_aggs = [F.sum("__pn").alias(count_alias)]
    if sum_col is not None:
        final_aggs.append(F.sum("__psum").alias(sum_alias))
    if distinct_alias is not None:
        final_aggs.append(F.sum("__pdist").alias(distinct_alias))
    return partial.groupBy(*keys).agg(*final_aggs)
