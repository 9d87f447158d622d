"""SparkSession factory with scale-appropriate defaults.

Settings chosen for the 100 TB target (AQE, skew-join handling, Arrow UDF
batching) but runnable on local[N]. Shuffle partitions default to 2x cores
locally; on a real cluster set spark.sql.shuffle.partitions to ~2-3x total
executor cores (or leave AQE coalescing to shrink them).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "libchunk_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = int(master[master.index("[") + 1 : -1]) if "[" in master else cpus
        shuffle_partitions = max(2 * n, 8) if master.startswith("local") else 200
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # content columns can be large; keep Arrow batches modest so the
        # chunker UDF's concat buffer stays cache/memory friendly
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # deterministic epoch math for timestamp columns (oracle parity)
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
