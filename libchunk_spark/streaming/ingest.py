"""Incremental corpus ingest via Structured Streaming.

The reference streams unbounded stdin with bounded memory
(/root/reference/vendor/github.com/restic/chunker/chunker.go:202-327,
bits/put.go:51-77 backpressure); the pipeline analog is micro-batch ingest
of newly-arrived corpus files: readStream → foreachBatch(split + anti-join
against the existing chunk index + idempotent append).

No cross-batch Spark state is needed — the chunk-index table itself is the
state (idempotent-put semantics, bits/bits.go:51-52), so a crashed batch
replays safely.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from libchunk_spark.chunker.rabin import ChunkerConfig
from libchunk_spark.operators.split import split

CORPUS_SCHEMA = (
    "file_id long, repo string, path string, commit string, "
    "lang string, content string"
)


def start_ingest(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    checkpoint_dir: str,
    cfg: ChunkerConfig,
    keys_path: str | None = None,
):
    """Stream corpus parquet files from source_dir into the chunk index.

    Returns the StreamingQuery. Each micro-batch:
      1. split (chunk + key) the new rows;
      2. left-anti join new chunk keys against the existing index
         (bits.Move skip semantics — never rewrite a stored chunk);
      3. append the survivors; append per-file key lists.
    """

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        res = split(batch, cfg, keep_payload=True)
        new_rows = res.chunk_index
        if os.path.exists(index_path):
            existing = batch.sparkSession.read.parquet(index_path).select("k")
            new_rows = new_rows.join(F.broadcast(existing), "k", "left_anti")
        new_rows.write.mode("append").parquet(index_path)
        if keys_path:
            res.file_keys.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(keys_path)

    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_stats_stream(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    out_path: str,
    watermark: str = "2 hours",
):
    """Structured Streaming windowed aggregation over the events table:
    1-hour tumbling windows with a watermark for late data, complete on
    availableNow. Batch-equivalent: queries.q_event_window_stats — counts
    and sums match it exactly once the stream drains (verified in tests);
    the user column is `approx_users` (HLL sketch, append-mode-compatible
    state), deliberately named differently from the batch twin's exact
    `n_users` because the values may differ."""
    events = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string"
        )
        .parquet(source_dir)
    )
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            (F.unix_timestamp("w.start") / 3600).cast("long").alias("hour_bucket"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_path)
        .start()
    )
