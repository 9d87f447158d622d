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


# ---------------------------------------------------------- dir-Merkle twin


def _docs_df(spark, n, seed, id_offset=0):
    """documents-shaped frame with planted exact duplicates (every 5th doc
    repeats doc 0's text) spread over sources/dirs."""
    rows = [
        (
            i + id_offset,
            f"text body {seed} {'shared' if i % 5 == 0 else i}",
            f"src{i % 3}",
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _merkle_rows(df):
    return sorted(
        (r["source"], r["dirname"], r["n_files"], r["merkle"])
        for r in df.collect()
    )


def _batch_merkle(spark, docs, tmp_path, tag):
    """q_dir_merkle on the accumulated corpus (written as a documents
    table), projected to the maintained columns."""
    from libchunk_spark import queries as Q

    sf = str(tmp_path / f"batchview_{tag}")
    docs.coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return _merkle_rows(
        Q.q_dir_merkle(spark, sf).select("source", "dirname", "n_files", "merkle")
    )


def test_maintained_dir_merkle_equals_batch_and_survives_restart(
    spark, tmp_path
):
    from libchunk_spark.streaming.aggmaint import (
        read_dir_merkle,
        start_dir_merkle_maintenance,
    )

    src = str(tmp_path / "incoming")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    docs = _docs_df(spark, 60, seed=31)
    for i in range(5):
        docs.where(F.col("doc_id") % 5 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/part{i}")

    q = start_dir_merkle_maintenance(spark, f"{src}/*", state, ckpt)
    q.awaitTermination(180)
    assert _merkle_rows(read_dir_merkle(spark, state)) == _batch_merkle(
        spark, docs, tmp_path, "a"
    )

    # restart folding NEW docs in: touched dirs re-root, untouched dirs
    # carry forward, and the answer still equals the batch query
    docs2 = _docs_df(spark, 12, seed=32, id_offset=10_000)
    docs2.coalesce(1).write.mode("overwrite").parquet(f"{src}/part_new")
    q = start_dir_merkle_maintenance(spark, f"{src}/*", state, ckpt)
    q.awaitTermination(180)
    assert _merkle_rows(read_dir_merkle(spark, state)) == _batch_merkle(
        spark, docs.unionByName(docs2), tmp_path, "b"
    )


def test_dir_merkle_recompute_prunes_untouched_buckets(spark, tmp_path):
    """The per-trigger recompute must read ONLY the dbucket partitions the
    batch touched: PartitionFilters on dbucket at the files scan, batch
    keys broadcast (semi-join) rather than shuffling the store, and the
    root recompute touches no text column (file-level state only)."""
    from libchunk_spark.streaming.aggmaint import (
        _dir_files,
        _touched_roots,
    )

    files_root = str(tmp_path / "files")
    all_files = _dir_files(_docs_df(spark, 60, seed=33), 16)
    all_files.write.partitionBy("dbucket").parquet(f"{files_root}/batch=0")

    batch = _dir_files(_docs_df(spark, 4, seed=34, id_offset=200), 16)
    touched = batch.select("source", "dirname", "dbucket").distinct().collect()
    keys = [(r["source"], r["dirname"]) for r in touched]
    buckets = sorted({r["dbucket"] for r in touched})
    assert len(buckets) < 16  # pruning is real: most buckets untouched
    roots = _touched_roots(spark, files_root, keys, buckets, upto_batch=0)
    plan = roots._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "dbucket" in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "text" not in plan, plan
    got = {(r["source"], r["dirname"]) for r in roots.collect()}
    assert got == set(keys)
