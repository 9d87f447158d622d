"""Embedding similarity search: brute-force baseline + IVF scale path.

* brute_force_pairs — exact cosine pairs via broadcast NumPy matmul blocks
  (also exposed as the driver query `cosine_pairs`); the ground truth.
* ivf_index / ivf_search — inverted-file ANN: deterministic seeded k-means
  centroids (Lloyd iterations as DataFrame aggs), vectors assigned to their
  nearest centroid cell, queries probe `nprobe` nearest cells only. At
  cluster scale the centroid table is tiny (broadcast) and each cell is a
  partition-pruned slice; probe cost is |cells probed| / |cells| of brute
  force.

All NumPy math runs inside mapInPandas over Arrow batches (no per-row
Python); assignments/joins are DataFrame ops.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Hard ceiling on rows the brute-force baseline may pull to the driver.
# 200k × 128-dim float64 ≈ 200 MB broadcast — the outer edge of sane.
BRUTE_FORCE_MAX_ROWS = 200_000


def _collect_matrix(
    emb: DataFrame, max_rows: int = BRUTE_FORCE_MAX_ROWS
) -> tuple[np.ndarray, np.ndarray]:
    rows = emb.select("vec_id", "embedding").limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"brute-force path refuses > {max_rows} vectors (driver collect "
            "would not survive at scale) — use ivf_pairs or the sign-LSH "
            "bucketed path (queries.q_ann_signlsh) instead"
        )
    rows.sort(key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


def brute_force_pairs(
    emb: DataFrame, threshold: float, max_rows: int = BRUTE_FORCE_MAX_ROWS
) -> DataFrame:
    """All (a < b) pairs with cosine >= threshold; broadcast blocked matmul.

    Honestly labeled the O(n^2) baseline: refuses inputs over `max_rows`
    (the scale paths are ivf_pairs / sign-LSH buckets)."""
    spark = emb.sparkSession
    ids, mat = _collect_matrix(emb, max_rows)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["embedding"].map(np.asarray)).astype(np.float64)
            vn = np.sqrt((v * v).sum(axis=1))
            sims = np.round((v @ b_mat.T) / np.outer(vn, b_norms), 4)
            a_ids = pdf["vec_id"].to_numpy()
            li, ri = np.nonzero(
                (sims >= threshold) & (a_ids[:, None] < b_ids[None, :])
            )
            yield pd.DataFrame({"a": a_ids[li], "b": b_ids[ri], "sim": sims[li, ri]})

    return emb.select("vec_id", "embedding").mapInPandas(
        block, "a long, b long, sim double"
    )


def scored_candidates(
    emb: DataFrame,
    queries: DataFrame,
    max_rows: int = BRUTE_FORCE_MAX_ROWS,
) -> DataFrame:
    """(q, cand, sim) for every query row against every other vector.

    The retrieval shape: only the (small) query subset streams through the
    matmul, the candidate side is the broadcast matrix — output is
    |queries| x n, not n^2. At cluster scale the broadcast side becomes the
    IVF/sign-LSH-pruned candidate set; ranking happens downstream.
    """
    spark = emb.sparkSession
    ids, mat = _collect_matrix(emb, max_rows)
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["embedding"].map(np.asarray)).astype(np.float64)
            vn = np.sqrt((v * v).sum(axis=1))
            sims = np.round((v @ b_mat.T) / np.outer(vn, b_norms), 4)
            q_ids = pdf["vec_id"].to_numpy()
            li, ri = np.nonzero(q_ids[:, None] != b_ids[None, :])  # no self
            yield pd.DataFrame(
                {"q": q_ids[li], "cand": b_ids[ri], "sim": sims[li, ri]}
            )

    return queries.select("vec_id", "embedding").mapInPandas(
        block, "q long, cand long, sim double"
    )


def train_centroids(
    emb: DataFrame, n_cells: int, iters: int = 5, seed: int = 7
) -> np.ndarray:
    """Deterministic seeded Lloyd k-means on (a sample of) the vectors.

    Centroid update runs as a DataFrame aggregation (assignment via
    mapInPandas + groupBy avg), so training scales with executors; only the
    (n_cells, dim) centroid matrix ever reaches the driver.
    """
    spark = emb.sparkSession
    # deterministic distributed sample: hash-mod filter, no global sort and
    # no partition-order dependence (xxhash64 of vec_id is stable everywhere)
    want = n_cells * 64
    total = emb.count()
    if total > want:
        mod = max(total // want, 1)
        sample = emb.where(F.pmod(F.xxhash64("vec_id"), F.lit(mod)) == 0)
    else:
        sample = emb
    sample = sample.select("vec_id", "embedding")
    ids, mat = _collect_matrix(sample)
    rng = np.random.default_rng(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)]

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(centroids)

        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            c = bc.value
            cn = np.sqrt((c * c).sum(axis=1)) + 1e-12
            for pdf in batches:
                if not len(pdf):
                    continue
                v = np.stack(pdf["embedding"].map(np.asarray)).astype(np.float64)
                vn = np.sqrt((v * v).sum(axis=1)) + 1e-12
                cell = np.argmax((v @ c.T) / np.outer(vn, cn), axis=1)
                out = pd.DataFrame(v)
                out.columns = [f"d{i}" for i in range(v.shape[1])]
                out.insert(0, "cell", cell.astype(np.int64))
                yield out

        dim = centroids.shape[1]
        schema = "cell long, " + ", ".join(f"d{i} double" for i in range(dim))
        assigned = sample.mapInPandas(assign, schema)
        means = (
            assigned.groupBy("cell")
            .agg(*[F.avg(f"d{i}").alias(f"d{i}") for i in range(dim)])
            .collect()
        )
        new_c = centroids.copy()
        for r in means:
            new_c[int(r["cell"])] = [r[f"d{i}"] for i in range(dim)]
        centroids = new_c
    return centroids


def ivf_assign(
    emb: DataFrame, centroids: np.ndarray, nprobe: int = 1
) -> DataFrame:
    """(vec_id, cell, embedding) rows — each vector in its `nprobe`
    nearest-centroid cells (multi-probe recovers near-boundary pairs that
    single assignment misses)."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        cn = np.sqrt((c * c).sum(axis=1)) + 1e-12
        k = min(nprobe, c.shape[0])
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.stack(pdf["embedding"].map(np.asarray)).astype(np.float64)
            vn = np.sqrt((v * v).sum(axis=1)) + 1e-12
            sims = (v @ c.T) / np.outer(vn, cn)
            top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
            ids = pdf["vec_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, k),
                    "cell": top.ravel().astype(np.int64),
                    "embedding": pdf["embedding"].iloc[
                        np.repeat(np.arange(len(pdf)), k)
                    ].to_numpy(),
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id long, cell long, embedding array<float>"
    )


def ivf_pairs(
    emb: DataFrame,
    threshold: float,
    n_cells: int = 16,
    iters: int = 4,
    seed: int = 7,
    nprobe: int = 3,
) -> DataFrame:
    """ANN cosine pairs: exact cosine within each (multi-probed) IVF cell.

    Cost drops from n^2 to nprobe^2 * sum of per-cell squares; recall rises
    with nprobe (pairs split across cells are recovered when their cells
    overlap). Cells are processed via repartition("cell") + applyInPandas so
    each cell's matmul is local to one task; duplicate pairs from multi-
    probe are removed with dropDuplicates.
    """
    centroids = train_centroids(emb, n_cells, iters, seed)
    assigned = ivf_assign(emb, centroids, nprobe=nprobe)

    def per_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(columns=["a", "b", "sim"]).astype(
                {"a": "int64", "b": "int64", "sim": "float64"}
            )
        v = np.stack(pdf["embedding"].map(np.asarray)).astype(np.float64)
        n = np.sqrt((v * v).sum(axis=1)) + 1e-12
        sims = np.round((v @ v.T) / np.outer(n, n), 4)
        ids = pdf["vec_id"].to_numpy()
        li, ri = np.nonzero((sims >= threshold) & (ids[:, None] < ids[None, :]))
        return pd.DataFrame({"a": ids[li], "b": ids[ri], "sim": sims[li, ri]})

    return (
        # explicit count: AQE would coalesce this small-bytes shuffle and
        # serialize the CPU-bound per-cell matmuls
        assigned.repartition(n_cells, "cell")
        .groupBy("cell")
        .applyInPandas(per_cell, "a long, b long, sim double")
        .dropDuplicates(["a", "b"])
    )
