"""Incremental aggregation maintenance (streaming/aggmaint.py): the
maintained gram-count state must equal the batch answer after any number
of triggers, survive restarts, compact, and vacuum safely."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from libchunk_spark.fixtures import corpus_to_spark, generate_corpus
from libchunk_spark.streaming.aggmaint import (
    _base_uptos,
    _delta_batches,
    _word5_gram_counts,
    read_topgrams,
    start_topgrams_maintenance,
    vacuum_deltas,
)


def _batch_top(spark, df, n=20):
    return [
        (r["ngram"], r["n_docs"])
        for r in _word5_gram_counts(df, "file_id", "content")
        .orderBy(F.desc("n_docs"), F.asc("ngram"))
        .limit(n)
        .collect()
    ]


def _stream_top(spark, state, n=20):
    return [
        (r["ngram"], r["n_docs"]) for r in read_topgrams(spark, state, n).collect()
    ]


def test_maintained_topgrams_equal_batch_and_survive_restart(spark, tmp_path):
    src = str(tmp_path / "incoming")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    rows = generate_corpus(n_files=60, seed=21)
    df = corpus_to_spark(spark, rows).select(
        "file_id", "repo", "path", "commit", "lang", "content"
    )
    # 6 single-file source drops -> 6 micro-batches (maxFilesPerTrigger=1)
    for i in range(6):
        df.where(
            (F.col("file_id") % 6 == i)
        ).coalesce(1).write.mode("overwrite").parquet(f"{src}/part{i}")

    q = start_topgrams_maintenance(spark, f"{src}/*", state, ckpt, compact_every=3)
    q.awaitTermination(180)

    full = df
    assert _stream_top(spark, state) == _batch_top(spark, full)
    # compaction fired (6 batches, compact_every=3 -> bases at 2 and 5)
    assert _base_uptos(state), "no compaction happened"

    # restart with NEW files only: state folds them in, still == batch
    df2 = (
        corpus_to_spark(spark, generate_corpus(n_files=20, seed=22))
        .select("file_id", "repo", "path", "commit", "lang", "content")
        .withColumn("file_id", F.col("file_id") + 10_000)
    )
    df2.coalesce(1).write.mode("overwrite").parquet(f"{src}/part_new")
    q = start_topgrams_maintenance(spark, f"{src}/*", state, ckpt, compact_every=3)
    q.awaitTermination(180)
    assert _stream_top(spark, state) == _batch_top(spark, full.unionByName(df2))


def test_vacuum_preserves_answer(spark, tmp_path):
    src = str(tmp_path / "incoming")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    df = corpus_to_spark(spark, generate_corpus(n_files=48, seed=23)).select(
        "file_id", "repo", "path", "commit", "lang", "content"
    )
    for i in range(8):
        df.where(F.col("file_id") % 8 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/part{i}")
    q = start_topgrams_maintenance(spark, f"{src}/*", state, ckpt, compact_every=3)
    q.awaitTermination(180)

    before = _stream_top(spark, state)
    uptos = _base_uptos(state)
    assert len(uptos) >= 2, uptos  # bases at 2 and 5 (8 batches)
    removed = vacuum_deltas(state)
    # only deltas covered by the SECOND-newest base may go
    assert removed and all(b <= uptos[-2] for b in removed)
    assert _stream_top(spark, state) == before
    # deltas above the newest base survive (they are the live tail)
    assert all(b > uptos[-2] for b in _delta_batches(state))
