"""Scale-adaptive parquet scans.

A parquet row group is the unit of scan parallelism: the sf driver tables
are single-file, single-row-group parquet, so a plain scan is ONE task and
everything up to the first shuffle (gram explode, per-gram md5, signature
UDFs, broadcast matmuls) runs single-threaded regardless of cores. The
session default spark.sql.files.maxPartitionBytes=128m cannot split a
single row group, so the fix must be an explicit repartition — applied
only when the input is too small to carry the parallelism by itself.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# matches the session default spark.sql.files.maxPartitionBytes=128m
MAX_PARTITION_BYTES = 128 * 1024 * 1024

# Floor: don't spread a scan whose resulting partitions would be under
# 32 KiB — at that size the exchange + task-scheduling overhead (a few
# hundred ms on local mode) exceeds the single-threaded compute on the
# whole input, and the count-visible cost of trivial consumers doubles
# for nothing. Both bounds derive from input size and core count; the
# spread engages exactly in the window where one row group is too big
# for one core but too small to split.
MIN_SPREAD_PARTITION_BYTES = 32 * 1024


def _input_bytes(path: str) -> int | None:
    try:
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _dirs, files in os.walk(path)
                for f in files
            )
        return os.path.getsize(path)
    except OSError:
        return None


def read_parallel(spark: SparkSession, path: str) -> DataFrame:
    """Parquet scan with scale-adaptive map-side parallelism (opt guide
    §2.4/§6.1): when the input is too small for the scan itself to split
    into >= defaultParallelism tasks (bytes < cores * maxPartitionBytes —
    and single-row-group files never split at all), round-robin
    repartition the scanned rows across 2*cores so the map-heavy
    derivations above the scan parallelize. At real scale the condition is
    false (multi-GB, many-file inputs already carry the parallelism) and
    no exchange is added — the knob derives from input size and core
    count, never a constant tuned to one machine."""
    df = spark.read.parquet(path)
    size = _input_bytes(path)
    par = spark.sparkContext.defaultParallelism
    n = 2 * par
    if (
        size is not None
        and size < par * MAX_PARTITION_BYTES
        and size >= n * MIN_SPREAD_PARTITION_BYTES
    ):
        return df.repartition(n)
    return df
