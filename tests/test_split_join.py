"""Round-trip, missing-key, corruption and dedup-skip tests.

Mirrors the reference suite (SURVEY.md §5): split→join identity
(bits/get_test.go:182-191), unknown key → error (get_test.go:77-84),
corruption detection (get_test.go:117-142), move dedup-skip
(bits/move_test.go:68-79).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from libchunk_spark.config import CORPUS_PIPELINE_CONFIG as CFG
from libchunk_spark.fixtures import corpus_to_spark, generate_corpus
from libchunk_spark.operators.assemble import (
    NoSuchKeyError,
    assemble,
    assert_round_trip,
)
from libchunk_spark.operators.move import move
from libchunk_spark.operators.split import split


@pytest.fixture(scope="module")
def corpus(spark):
    rows = generate_corpus(n_files=60, seed=11)
    return corpus_to_spark(spark, rows).cache()


@pytest.fixture(scope="module")
def split_result(corpus):
    res = split(corpus, CFG.chunk)
    res.chunks.cache().count()
    res.chunk_index.cache().count()
    res.file_keys.cache().count()
    return res


def test_round_trip_sha256_invariant(split_result):
    """split → chunk_index → join/fetch → reassemble == original, per row."""
    result = assemble(split_result.file_keys, split_result.chunk_index)
    assert_round_trip(result)  # raises on violation
    assert result.assembled.where(~F.col("ok")).count() == 0


def test_chunk_index_unique_keys(split_result):
    idx = split_result.chunk_index
    assert idx.count() == idx.select("k").distinct().count()


def test_multi_chunk_files_exist(split_result):
    """Config must actually exercise multi-chunk reassembly ordering."""
    assert split_result.file_keys.where(F.col("n_chunks") >= 3).count() > 0


def test_missing_key_detected(split_result):
    """Deleting index rows → NoSuchKeyError (ErrNoSuchKey analog)."""
    victim = split_result.chunk_index.limit(1).select("k")
    broken = split_result.chunk_index.join(victim, "k", "left_anti")
    result = assemble(split_result.file_keys, broken)
    assert result.missing.count() > 0
    with pytest.raises(NoSuchKeyError):
        assert_round_trip(result)


def test_corrupted_chunk_detected(split_result):
    """Zeroing one chunk payload → sha256 invariant violation
    (reference: authentication failed, bits/get_test.go:117-142)."""
    victim_k = split_result.chunk_index.first()["k"]
    corrupted = split_result.chunk_index.withColumn(
        "chunk",
        F.when(
            F.col("k") == F.lit(victim_k),
            F.expr("cast(repeat(chr(0), length) as binary)"),
        ).otherwise(F.col("chunk")),
    )
    result = assemble(split_result.file_keys, corrupted)
    assert result.missing.count() == 0  # key still resolves...
    with pytest.raises(AssertionError):
        assert_round_trip(result)  # ...but content integrity fails


def test_remote_fallback(split_result, spark):
    """Keys absent locally are fetched from the remote store
    (multi-store probe, bits/get.go:36-47)."""
    half = split_result.chunk_index.where(F.crc32(F.col("k")) % 2 == 0)
    other = split_result.chunk_index.where(F.crc32(F.col("k")) % 2 == 1)
    result = assemble(split_result.file_keys, half, remote_index=other)
    assert_round_trip(result)


def test_move_skips_indexed_keys(split_result):
    """Second push with an index transfers strictly fewer keys
    (bits/move_test.go:68-79)."""
    empty_remote = split_result.chunk_index.select("k").limit(0)
    first = move(split_result.chunk_index, empty_remote)
    n_first = first.pushed.count()
    # remote now has 60% of keys
    remote = split_result.chunk_index.sample(0.6, seed=2).select("k")
    second = move(split_result.chunk_index, remote)
    n_second = second.pushed.count()
    assert n_second < n_first
    assert second.skipped_count == n_first - n_second


def test_exact_duplicates_share_key_lists(split_result, corpus):
    """libchunk-exact semantics: identical content ⇒ identical key arrays."""
    dup_groups = (
        split_result.file_keys.join(corpus.select("file_id", "kind"), "file_id")
        .where(F.col("kind") == "exact")
        .count()
    )
    assert dup_groups > 0
    shared = (
        split_result.file_keys.groupBy("content_sha256")
        .agg(F.countDistinct(F.to_json(F.struct("keys"))).alias("variants"))
        .where(F.col("variants") > 1)
        .count()
    )
    assert shared == 0


def test_empty_content_file_round_trips(spark):
    """Empty stream -> zero keys -> reassembles to empty (reference EOF path)."""
    tiny = spark.createDataFrame(
        [(1, "x"), (2, "")], "file_id long, content string"
    )
    res = split(tiny, CFG.chunk)
    assert res.file_keys.count() == 2
    assert res.file_keys.where("file_id = 2").first()["n_chunks"] == 0
    assert_round_trip(assemble(res.file_keys, res.chunk_index))


def test_reference_scale_round_trip(spark):
    """Real reference constants (512KiB/8MiB/20 bits) on multi-MB files:
    the production-sized path through Spark, not just the kernel."""
    import numpy as np

    from libchunk_spark.chunker.rabin import ChunkerConfig

    rng = np.random.default_rng(17)
    rows = []
    for i in range(6):
        size = int(rng.integers(1 << 20, 9 << 20))  # 1-9 MiB
        body = rng.integers(32, 127, size, dtype=np.uint8)
        rows.append((i, body.tobytes().decode("ascii")))
    big = spark.createDataFrame(rows, "file_id long, content string").repartition(6)
    res = split(big, ChunkerConfig(), keep_payload=True)
    fk = res.file_keys.collect()
    assert any(r["n_chunks"] >= 2 for r in fk)  # >8MiB files must split
    assert_round_trip(assemble(res.file_keys, res.chunk_index))
