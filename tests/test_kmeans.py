"""Distributed k-means|| training (operators/kmeans.py): determinism,
objective improvement, and the IVF recall contract with the parallel
trainer swapped in."""

from __future__ import annotations

import numpy as np
import pytest

from libchunk_spark.operators.kmeans import (
    kmeans_parallel_init,
    lloyd_distributed,
    spherical_inertia,
    train_centroids_parallel,
)
from libchunk_spark.operators.similarity import brute_force_pairs, ivf_pairs

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_parallel_training_deterministic(emb):
    a = train_centroids_parallel(emb, 8, seed=3)
    b = train_centroids_parallel(emb, 8, seed=3)
    assert a.shape == (8, 64)
    np.testing.assert_allclose(a, b)


def test_distributed_lloyd_improves_inertia(emb):
    init = kmeans_parallel_init(emb, 8, seed=5)
    before = spherical_inertia(emb, init)
    after = spherical_inertia(emb, lloyd_distributed(emb, init, iters=2))
    assert after <= before + 1e-9, (before, after)


def test_ivf_recall_with_parallel_trainer(emb):
    """The SCALE.md known-limit closure must not cost recall: IVF pairs
    with k-means||-trained centroids keep the 0.9 floor vs brute force
    (same contract as the sampled trainer's test)."""
    exact = {(r["a"], r["b"]) for r in brute_force_pairs(emb, 0.3).collect()}
    approx = {
        (r["a"], r["b"])
        for r in ivf_pairs(
            emb, 0.3, n_cells=8, nprobe=3, train="parallel"
        ).collect()
    }
    assert approx <= exact or not exact  # exact cosine within cells
    recall = len(approx & exact) / len(exact) if exact else 1.0
    assert recall >= 0.9, f"IVF(parallel train) recall {recall:.3f}"


def test_unknown_train_mode_rejected(emb):
    with pytest.raises(ValueError, match="train mode"):
        ivf_pairs(emb, 0.3, n_cells=8, train="nope").collect()
