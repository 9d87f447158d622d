"""Embedding similarity: brute-force baseline vs IVF ANN recall."""

from __future__ import annotations

import pytest

from libchunk_spark.operators.similarity import brute_force_pairs, ivf_pairs

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_brute_force_symmetric_and_thresholded(emb):
    pairs = brute_force_pairs(emb, 0.3).collect()
    assert pairs
    for r in pairs[:50]:
        assert r["a"] < r["b"]
        assert r["sim"] >= 0.3


def test_ivf_recall_against_brute_force(emb):
    exact = {(r["a"], r["b"]) for r in brute_force_pairs(emb, 0.3).collect()}
    approx = {(r["a"], r["b"]) for r in ivf_pairs(emb, 0.3, n_cells=8, nprobe=3).collect()}
    assert approx <= exact or not exact  # subset: exact cosine within cells
    recall = len(approx & exact) / len(exact) if exact else 1.0
    assert recall >= 0.9, f"IVF recall {recall:.3f}"


def test_ivf_deterministic(emb):
    a = sorted((r["a"], r["b"]) for r in ivf_pairs(emb, 0.3, n_cells=8).collect())
    b = sorted((r["a"], r["b"]) for r in ivf_pairs(emb, 0.3, n_cells=8).collect())
    assert a == b
