"""Incremental aggregation maintenance (materialized-view pattern):
a corpus-global n-gram document-frequency table maintained under a
stream, as batch-keyed DELTA partitions plus periodic COMPACTION — the
streaming twin of queries.q_top_ngrams (Lee et al. frequency mining).

This is a different streaming shape from the repo's other operators
(windowed aggs, stateful sessionization, stream-static joins, cluster
maintenance): an UNWINDOWED global aggregate kept current without ever
re-reading history per trigger.

State layout under `state_dir`:
  deltas/batch=<id>/   (ngram, n_docs) distinct-doc counts of that batch
  base/upto=<id>/      compacted totals covering all batches <= id

Per trigger (cost O(batch), never O(history)):
  1. batch docs -> distinct (doc, gram) -> groupBy gram count — map-side
     explode + ONE partial-agg shuffle on the gram key;
  2. the delta OVERWRITES deltas/batch=<id> — an at-least-once replay
     rewrites the same partition (idempotent, the repo's standard
     batch-keyed-write discipline);
  3. every `compact_every` batches, newest base (upto < id) + deltas in
     (upto, id] fold into base/upto=<id> (groupBy sum). Compaction never
     deletes deltas — a replayed compaction re-reads exactly the same
     inputs and overwrites the same base partition, so it is idempotent
     too. Garbage collection is explicit (`vacuum_deltas`): only deltas
     covered by the SECOND-newest base are removed, because the newest
     base's compaction may still be replayed and must find its inputs.

Reader (`read_topgrams`): newest base + deltas above it -> groupBy sum
-> deterministic (count desc, gram asc) top-n. Deltas at or below the
base's upto are EXCLUDED by the batch filter, so a crash between base
commit and anything else can never double-count.

Counting assumption (stated, tested): each document arrives in exactly
one micro-batch (file streams deliver a file once), so per-batch
DISTINCT-doc counts sum to the global distinct-doc count.

Scale: the base rewrite is O(vocabulary) every compact_every batches —
amortized O(vocab/compact_every) per trigger, against the naive
alternatives of either rewriting O(vocab) per trigger or making readers
sum O(#batches) delta files. Both knobs are explicit.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from libchunk_spark.streaming.ingest import CORPUS_SCHEMA


def _word5_gram_counts(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(ngram, n_docs) — DISTINCT containing-doc counts, the exact gram
    definition of queries.q_top_ngrams (word 5-grams, array_distinct per
    doc)."""
    t = F.split(F.col(text_col), " ")
    grams = F.when(
        F.size(t) >= 5,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 5),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, 5)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(F.col(id_col), F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n_docs"))
    )


def _base_uptos(state_dir: str) -> list[int]:
    root = os.path.join(state_dir, "base")
    if not os.path.isdir(root):
        return []
    out = []
    for d in os.listdir(root):
        m = re.fullmatch(r"upto=(\d+)", d)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _delta_batches(state_dir: str) -> list[int]:
    root = os.path.join(state_dir, "deltas")
    if not os.path.isdir(root):
        return []
    out = []
    for d in os.listdir(root):
        m = re.fullmatch(r"batch=(\d+)", d)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _totals(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """Newest base + deltas above it, summed. None when no state yet."""
    uptos = _base_uptos(state_dir)
    parts = []
    upto = -1
    if uptos:
        upto = uptos[-1]
        parts.append(
            spark.read.parquet(os.path.join(state_dir, f"base/upto={upto}"))
        )
    for b in _delta_batches(state_dir):
        if b > upto:
            parts.append(
                spark.read.parquet(os.path.join(state_dir, f"deltas/batch={b}"))
            )
    if not parts:
        return None
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df.groupBy("ngram").agg(F.sum("n_docs").cast("long").alias("n_docs"))


def read_topgrams(spark: SparkSession, state_dir: str, n: int = 20) -> DataFrame:
    """Current top-n repeated n-grams — same deterministic ordering as
    q_top_ngrams (count desc, gram asc)."""
    totals = _totals(spark, state_dir)
    if totals is None:
        return spark.createDataFrame([], "ngram string, n_docs long")
    return totals.orderBy(F.desc("n_docs"), F.asc("ngram")).limit(n)


def vacuum_deltas(state_dir: str) -> list[int]:
    """Remove delta partitions covered by the SECOND-newest base (the
    newest base's compaction may still replay and needs its inputs).
    Returns the removed batch ids."""
    uptos = _base_uptos(state_dir)
    if len(uptos) < 2:
        return []
    safe_upto = uptos[-2]
    removed = []
    for b in _delta_batches(state_dir):
        if b <= safe_upto:
            shutil.rmtree(os.path.join(state_dir, f"deltas/batch={b}"))
            removed.append(b)
    return removed


def start_topgrams_maintenance(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    compact_every: int = 4,
    id_col: str = "file_id",
    text_col: str = "content",
):
    """Stream corpus parquet files from source_dir, maintaining the
    global gram-count state (module docstring). Returns the
    StreamingQuery (availableNow trigger)."""

    def process_batch(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        ss = batch.sparkSession
        delta = _word5_gram_counts(batch, id_col, text_col)
        delta.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"deltas/batch={batch_id}")
        )
        if (batch_id + 1) % compact_every == 0:
            # deterministic inputs on replay: newest base STRICTLY below
            # this batch id + the deltas in between
            uptos = [u for u in _base_uptos(state_dir) if u < batch_id]
            parts = []
            upto = -1
            if uptos:
                upto = uptos[-1]
                parts.append(
                    ss.read.parquet(os.path.join(state_dir, f"base/upto={upto}"))
                )
            for b in _delta_batches(state_dir):
                if upto < b <= batch_id:
                    parts.append(
                        ss.read.parquet(
                            os.path.join(state_dir, f"deltas/batch={b}")
                        )
                    )
            df = parts[0]
            for p in parts[1:]:
                df = df.unionByName(p)
            (
                df.groupBy("ngram")
                .agg(F.sum("n_docs").cast("long").alias("n_docs"))
                .write.mode("overwrite")
                .parquet(os.path.join(state_dir, f"base/upto={batch_id}"))
            )

    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(source_dir)
    )
    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
