"""Distributed spherical k-means training: k-means|| initialization
(Bahmani, Moseley, Vattani, Kumar, Vassilvitskii — "Scalable k-means++",
VLDB 2012) plus optional DataFrame-native Lloyd refinement.

Closes the limit named in SCALE.md: `similarity.train_centroids` collects
an O(n_cells * 64) hash-mod sample to the driver — right up to ~10^5
cells, but at very large n_cells the sample itself outgrows the driver.
Here every corpus-sized pass stays distributed:

* each k-means|| round scores all points against the BROADCAST candidate
  set (vectorized mapInPandas, cosine) and samples with probability
  min(1, l * d2 / phi) — the draw comes from xxhash64(vec_id, round,
  seed), so sampling is deterministic, partition-order independent, and
  needs no RNG state;
* candidate weights (nearest-candidate population counts) aggregate
  map-side;
* only the O(l * rounds) candidate set ever reaches the driver, where a
  tiny WEIGHTED Lloyd reduces it to k centroids (the paper's final step);
* optional distributed Lloyd refinement of the full corpus: assignment
  reuses `similarity.ivf_assign` (broadcast centroids, nprobe=1); the
  update aggregates per-(cell, dim) sums via posexplode — shuffle volume
  is rows*dim AFTER map-side partial aggregation, and only the (k, dim)
  centroid matrix is collected per iteration.

Metric: spherical (cosine), matching `ivf_assign`'s cell assignment; for
unit vectors Euclidean d^2 = 2*(1 - cos), so d2 = 1 - max_cos is the
same sampling distribution up to the oversampling constant.

Scale: per round, two corpus scans (phi aggregate + sample filter) — the
distance frame is recomputed rather than cached, because at 10^12 rows a
cache IS the problem. Total corpus passes: 2*rounds + 1 (weights)
+ iters (refinement), each map-only against broadcast state.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_MOD = 1 << 30


def _d2_frame(emb: DataFrame, cand: np.ndarray) -> DataFrame:
    """(vec_id, d2) — cosine distance to the nearest current candidate."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(cand, dtype=np.float64))

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        cn = np.sqrt((c * c).sum(axis=1)) + 1e-12
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["embedding"].map(np.asarray)).astype(np.float64)
            vn = np.sqrt((v * v).sum(axis=1)) + 1e-12
            best = ((v @ c.T) / np.outer(vn, cn)).max(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "d2": 1.0 - best}
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        score, "vec_id long, d2 double"
    )


def _uniform_hash(round_idx: int, seed: int):
    """Deterministic u ~ U[0,1) per (vec_id, round, seed) — no RNG state,
    no partition-order dependence."""
    h = F.xxhash64(F.col("vec_id"), F.lit(round_idx), F.lit(seed))
    return F.pmod(h, F.lit(_HASH_MOD)).cast("double") / F.lit(float(_HASH_MOD))


def kmeans_parallel_init(
    emb: DataFrame,
    k: int,
    rounds: int = 4,
    oversample: int | None = None,
    seed: int = 7,
    final_iters: int = 8,
) -> np.ndarray:
    """k-means|| init: d^2-sampling rounds, then weighted Lloyd over the
    candidate set on the driver. Returns a (k, dim) centroid matrix.

    Driver memory is O(l * rounds * dim) — independent of corpus size
    (each round is additionally hard-capped at 8*l; the cap and the
    initial seed pick order by xxhash64(vec_id, seed) rather than raw
    vec_id — ADVICE r06: a binding vec_id-ordered cap kept only the
    lowest ids, biasing the d^2-sample toward low ids and always seeding
    from the min-id vector, weakening the paper's approximation guarantee
    in degenerate-phi cases; the hash order is an unbiased deterministic
    subsample)."""
    l = 2 * k if oversample is None else oversample
    first = (
        emb.orderBy(F.xxhash64(F.col("vec_id"), F.lit(seed)), F.col("vec_id"))
        .limit(1)
        .collect()
    )
    if not first:
        raise ValueError("kmeans_parallel_init: empty input")
    cand = [np.asarray(first[0]["embedding"], dtype=np.float64)]

    for r in range(rounds):
        cmat = np.stack(cand)
        d2 = _d2_frame(emb, cmat)
        phi = d2.agg(F.sum("d2").alias("phi")).collect()[0]["phi"] or 0.0
        if phi <= 1e-12:
            break  # every point sits on a candidate already
        picked = (
            d2.withColumn("u", _uniform_hash(r, seed))
            .where(F.col("u") * phi < F.lit(float(l)) * F.col("d2"))
            .select("vec_id")
            .join(emb.select("vec_id", "embedding"), "vec_id")
            .orderBy(
                F.xxhash64(F.col("vec_id"), F.lit(seed), F.lit(r)),
                F.col("vec_id"),
            )
            .limit(8 * l)
            .collect()
        )
        cand.extend(
            np.asarray(row["embedding"], dtype=np.float64) for row in picked
        )

    cmat = np.stack(cand)
    # distributed weights: population count of each candidate's cell
    from libchunk_spark.operators.similarity import ivf_assign

    counts = (
        ivf_assign(emb, cmat, nprobe=1)
        .groupBy("cell")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    weights = np.zeros(len(cand), dtype=np.float64)
    for row in counts:
        weights[row["cell"]] = row["n"]
    return _weighted_spherical_lloyd(cmat, weights, k, final_iters, seed)


def _weighted_spherical_lloyd(
    mat: np.ndarray, weights: np.ndarray, k: int, iters: int, seed: int
) -> np.ndarray:
    """Tiny weighted Lloyd over the candidate set (driver-side — the
    candidate set is O(k), never the corpus)."""
    rng = np.random.default_rng(seed)
    k = min(k, len(mat))
    p = weights + 1e-9
    idx = rng.choice(len(mat), size=k, replace=False, p=p / p.sum())
    centroids = mat[idx].copy()
    vn = np.sqrt((mat * mat).sum(axis=1)) + 1e-12
    for _ in range(iters):
        cn = np.sqrt((centroids * centroids).sum(axis=1)) + 1e-12
        cell = np.argmax((mat @ centroids.T) / np.outer(vn, cn), axis=1)
        for c in range(k):
            sel = cell == c
            w = weights[sel]
            if w.sum() > 0:
                centroids[c] = (mat[sel] * w[:, None]).sum(axis=0) / w.sum()
    return centroids


def lloyd_distributed(
    emb: DataFrame, centroids: np.ndarray, iters: int = 2
) -> np.ndarray:
    """Full-corpus Lloyd refinement with distributed assignment AND
    update: per-(cell, dim) sums via posexplode aggregate map-side; only
    the (k, dim) centroid matrix reaches the driver each iteration."""
    from libchunk_spark.operators.similarity import ivf_assign

    centroids = np.asarray(centroids, dtype=np.float64).copy()
    k, dim = centroids.shape
    for _ in range(iters):
        stats = (
            ivf_assign(emb, centroids, nprobe=1)
            .select("cell", F.posexplode("embedding").alias("dim", "val"))
            .groupBy("cell", "dim")
            .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        sums = np.zeros((k, dim))
        counts = np.zeros(k)
        for row in stats:
            sums[row["cell"], row["dim"]] = row["s"]
            counts[row["cell"]] = row["n"]
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
    return centroids


def train_centroids_parallel(
    emb: DataFrame,
    n_cells: int,
    rounds: int = 4,
    seed: int = 7,
    lloyd_iters: int = 2,
) -> np.ndarray:
    """Drop-in alternative to `similarity.train_centroids` whose every
    corpus-sized pass is distributed (see module docstring); pass
    lloyd_iters=0 to skip the full-corpus refinement."""
    centroids = kmeans_parallel_init(emb, n_cells, rounds=rounds, seed=seed)
    if lloyd_iters > 0:
        centroids = lloyd_distributed(emb, centroids, iters=lloyd_iters)
    return centroids


def spherical_inertia(emb: DataFrame, centroids: np.ndarray) -> float:
    """Mean cosine distance to the nearest centroid (distributed)."""
    row = (
        _d2_frame(emb, np.asarray(centroids, dtype=np.float64))
        .agg(F.avg("d2").alias("inertia"))
        .collect()[0]
    )
    return float(row["inertia"])
