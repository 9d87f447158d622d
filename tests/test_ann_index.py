"""Persisted IVFADC index (operators/ann_index.py): the persisted path
must reproduce the in-memory operator exactly, round-trip its trained
arrays, and prune un-probed cell partitions at the file level."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from libchunk_spark.operators.ann_index import (
    build_ivfpq_index,
    index_topk,
    load_index_arrays,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _queries(spark):
    return _emb(spark).where(F.col("vec_id") < 6)


def test_persisted_index_reproduces_in_memory_operator(spark, tmp_path):
    """Training is deterministic (hash-mod samples + seeded rng), so the
    persisted index must give BIT-IDENTICAL top-k to pq_topk_ivf with the
    same params — equality, not just a recall floor."""
    from libchunk_spark.operators.pq import pq_topk_ivf

    emb = _emb(spark)
    path = str(tmp_path / "ivfpq")
    meta = build_ivfpq_index(emb, path)
    assert meta["n_cells"] == 16 and meta["dim"] % meta["m"] == 0

    got = sorted(
        tuple(r) for r in index_topk(spark, path, _queries(spark), k=5).collect()
    )
    want = sorted(
        tuple(r) for r in pq_topk_ivf(emb, _queries(spark), k=5).collect()
    )
    assert got == want and got


def test_index_arrays_round_trip(spark, tmp_path):
    from libchunk_spark.operators.pq import pq_train
    from libchunk_spark.operators.similarity import train_centroids

    emb = _emb(spark)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, path)
    centroids, books, meta = load_index_arrays(spark, path)
    assert np.array_equal(centroids, train_centroids(emb, 16, 8, 7))
    assert np.array_equal(books, pq_train(emb, m=8, n_codes=64, iters=10, seed=7))
    assert books.shape == (meta["m"], meta["n_codes"], meta["dim"] // meta["m"])


def test_extend_appends_under_frozen_arrays(spark, tmp_path):
    """Growing corpus: build on the first half, extend with the second —
    queries against the extended index must equal queries against an index
    BUILT from the first half whose partitions were fed the SAME frozen
    encodings of the union (i.e. extension changes coverage, never the
    quantizer). New vectors must actually be retrievable."""
    from libchunk_spark.operators.ann_index import extend_ivfpq_index

    emb = _emb(spark)
    old = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)

    # extended index
    p1 = str(tmp_path / "ext")
    build_ivfpq_index(old, p1)
    extend_ivfpq_index(new, p1)

    # independent reference: build on old, then OVERWRITE coverage with a
    # one-pass union encoding under the same loaded (frozen) arrays
    import os

    from libchunk_spark.operators.ann_index import load_index_arrays
    from libchunk_spark.operators.pq import pq_encode
    from libchunk_spark.operators.similarity import ivf_assign

    p2 = str(tmp_path / "ref")
    build_ivfpq_index(old, p2)
    centroids, books, meta = load_index_arrays(spark, p2)
    cells = ivf_assign(emb, centroids, nprobe=meta["index_probe"]).select(
        "vec_id", "cell"
    )
    pq_encode(emb, books).join(cells, "vec_id").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(os.path.join(p2, "codes"))
    emb.select("vec_id", "embedding").join(cells, "vec_id").write.mode(
        "overwrite"
    ).partitionBy("cell").parquet(os.path.join(p2, "vectors"))

    q = _queries(spark)
    got = sorted(tuple(r) for r in index_topk(spark, p1, q, k=5).collect())
    ref = sorted(tuple(r) for r in index_topk(spark, p2, q, k=5).collect())
    assert got == ref and got
    # coverage: every union vector landed in the extended index (codes AND
    # rerank vectors), in the same cells the frozen assignment dictates
    n_union = emb.count()
    codes = spark.read.parquet(str(tmp_path / "ext" / "codes"))
    vecs = spark.read.parquet(str(tmp_path / "ext" / "vectors"))
    assert codes.select("vec_id").distinct().count() == n_union
    assert vecs.select("vec_id").distinct().count() == n_union
    ref_codes = spark.read.parquet(str(tmp_path / "ref" / "codes"))
    assert (
        codes.select("vec_id", "cell").exceptAll(
            ref_codes.select("vec_id", "cell")
        ).count()
        == 0
    )


def test_query_prunes_unprobed_cell_partitions(spark, tmp_path):
    """Both big scans (ADC codes + rerank vectors) must carry cell
    PartitionFilters — the probed-cell isin prunes FILES, so per-query
    cost is the probed slice, never the full table."""
    emb = _emb(spark)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, path)
    one_query = _emb(spark).where(F.col("vec_id") == 3)
    df = index_topk(spark, path, one_query, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("PartitionFilters") >= 2, plan
    assert "cell" in plan, plan
    # one query at nprobe=2 probes exactly 2 of the 16 cells
    assert "cell#" in plan and " IN (" in plan or "INSET" in plan.upper(), plan
    rows = df.collect()
    assert rows and all(r["rank"] <= 5 for r in rows)
