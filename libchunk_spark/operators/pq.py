"""Product quantization (PQ) — compressed-domain top-k retrieval.

At 100 TB scale the raw embedding table (64-dim float32 = 256 B/vector)
cannot be rescanned per query batch; PQ (Jégou, Douze, Schmid: "Product
Quantization for Nearest Neighbor Search", public) compresses each vector to
`m` one-byte codes (m=8 → 32x smaller) and scores queries against the codes
with asymmetric distance computation (ADC): per query, one (m, n_codes)
lookup table of partial inner products; per candidate, a sum of m table
lookups — no float vector ever touched at scan time.

Pipeline shape (everything distributed except bounded driver state):
  1. pq_train   — per-subspace Lloyd k-means on a bounded hash-mod sample
                  (O(n_codes*64) rows driver-side at any corpus scale, same
                  policy as similarity.train_centroids);
  2. pq_encode  — mapInPandas argmax over the broadcast codebooks: the
                  persistent, scannable artifact is (vec_id, codes);
  3. pq_topk    — queries' ADC LUTs broadcast (gated — retrieval batches are
                  small by nature), one mapInPandas pass over the codes
                  emits each partition's per-query shortlist, a window
                  collapses to the global shortlist, and the TRUE embeddings
                  of shortlist survivors only (shortlist*|q| rows, not the
                  corpus) are joined back for an exact re-rank with the same
                  (sim desc, cand asc) semantics as queries.q_topk_similar.

Vectors are L2-normalized before training/encoding, so ADC inner product
approximates cosine; the exact re-rank makes the emitted sims exact.

Reference tie-in: like the chunk index replacing payload rescans
(bits/store/bolt.go Put-once), the code table is the small derived artifact
that makes the big one cold.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from libchunk_spark.operators.similarity import _collect_matrix, _round4

# ADC LUTs are (|q|, m, n_codes) float64 on every executor — bound |q|.
MAX_QUERY_BATCH = 10_000


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / (np.sqrt((mat * mat).sum(axis=1, keepdims=True)) + 1e-12)


def pq_train(
    emb: DataFrame, m: int = 8, n_codes: int = 64, iters: int = 10, seed: int = 7
) -> np.ndarray:
    """(m, n_codes, dim/m) codebooks from per-subspace Lloyd k-means on a
    bounded deterministic sample of the (normalized) vectors."""
    want = n_codes * 64
    total = emb.count()
    if total > want:
        mod = max(total // want, 1)
        sample = emb.where(F.pmod(F.xxhash64("vec_id"), F.lit(mod)) == 0)
    else:
        sample = emb
    _, mat = _collect_matrix(
        sample.select("vec_id", "embedding"), max_rows=max(want * 2, 1024)
    )
    mat = _normalize(mat)
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    sub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_codes, sub))
    for j in range(m):
        x = mat[:, j * sub : (j + 1) * sub]
        k = min(n_codes, len(x))
        c = x[rng.choice(len(x), size=k, replace=False)]
        for _ in range(iters):
            d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d, axis=1)
            for ci in np.unique(a):  # empty cells keep their old centroid
                c[ci] = x[a == ci].mean(axis=0)
        books[j, :k] = c
        if k < n_codes:  # tiny corpora: pad with copies (never selected twice)
            books[j, k:] = c[0]
    return books


def pq_encode(emb: DataFrame, codebooks: np.ndarray) -> DataFrame:
    """(vec_id, codes array<int>) — the compressed, scannable artifact."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = bc.value
        m, _, sub = books.shape
        for pdf in batches:
            if not len(pdf):
                continue
            v = _normalize(
                np.stack(pdf["embedding"].map(np.asarray)).astype(np.float64)
            )
            codes = np.empty((len(v), m), dtype=np.int32)
            for j in range(m):
                x = v[:, j * sub : (j + 1) * sub]
                d = ((x[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "codes": list(codes)}
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        enc, "vec_id long, codes array<int>"
    )


def pq_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int,
    m: int = 8,
    n_codes: int = 64,
    shortlist: int = 32,
    iters: int = 10,
    seed: int = 7,
) -> DataFrame:
    """(q, cand, sim, rank) top-k by exact cosine over a PQ-ADC shortlist.

    Scan cost per candidate is m table lookups over the 32x-compressed code
    table; only shortlist*|q| true vectors are ever re-read. Recall is
    driver-checked (queries.q_topk_pq) with the same floor pattern as
    q_topk_ivf — ADC error only hurts if a true top-k member misses the
    shortlist entirely.
    """
    from pyspark.sql import Window

    spark = emb.sparkSession
    books = pq_train(emb, m=m, n_codes=n_codes, iters=iters, seed=seed)
    codes = pq_encode(emb, books)

    q_ids, q_mat = _collect_matrix(
        queries.select("vec_id", "embedding"), max_rows=MAX_QUERY_BATCH
    )
    qn = _normalize(q_mat)
    sub = q_mat.shape[1] // m
    # LUT[q, j, c] = <query subvector j, codebook j centroid c>
    luts = np.stack(
        [qn[:, j * sub : (j + 1) * sub] @ books[j].T for j in range(m)], axis=1
    )
    bc = spark.sparkContext.broadcast((q_ids, luts))
    top_r = shortlist

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, l = bc.value
        nq = len(ids)
        # cap the (|q|, chunk) score matrix: at the 10k-query gate a full
        # 10k-row Arrow batch would be an 800 MB transient per task
        chunk = max(1, (1 << 22) // max(nq, 1))  # ~32 MB of float64
        for pdf in batches:
            if not len(pdf):
                continue
            c_all = np.stack(pdf["codes"].map(np.asarray))  # (n, m)
            id_all = pdf["vec_id"].to_numpy()
            for s in range(0, len(c_all), chunk):
                c = c_all[s : s + chunk]
                cand_ids = id_all[s : s + chunk]
                # approx[q, i] = sum_j LUT[q, j, c[i, j]]
                approx = np.zeros((nq, len(c)))
                for j in range(l.shape[1]):
                    approx += l[:, j, :][:, c[:, j]]
                approx[ids[:, None] == cand_ids[None, :]] = -np.inf  # no self
                r = min(top_r, approx.shape[1])
                top = np.argpartition(-approx, r - 1, axis=1)[:, :r]
                qi = np.repeat(np.arange(nq), r)
                ci = top.ravel()
                keep = np.isfinite(approx[qi, ci])
                yield pd.DataFrame(
                    {
                        "q": ids[qi[keep]],
                        "cand": cand_ids[ci[keep]],
                        "approx": approx[qi, ci][keep],
                    }
                )

    per_part = codes.mapInPandas(score, "q long, cand long, approx double")
    w_s = Window.partitionBy("q").orderBy(F.desc("approx"), F.asc("cand"))
    short = (
        per_part.withColumn("r", F.row_number().over(w_s))
        .where(F.col("r") <= top_r)
        .select("q", "cand")
    )

    # exact re-rank: true embeddings of the shortlist only
    qe = spark.sparkContext.broadcast({int(i): qn[n] for n, i in enumerate(q_ids)})

    def rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame(columns=["q", "cand", "sim"]).astype(
                {"q": "int64", "cand": "int64", "sim": "float64"}
            )
        qv = np.stack([qe.value[int(x)] for x in pdf["q"]])
        cv = _normalize(
            np.stack(pdf["embedding"].map(np.asarray)).astype(np.float64)
        )
        sim = _round4((qv * cv).sum(axis=1))
        return pd.DataFrame(
            {"q": pdf["q"].to_numpy(), "cand": pdf["cand"].to_numpy(), "sim": sim}
        )

    joined = short.join(
        emb.select(F.col("vec_id").alias("cand"), "embedding"), "cand"
    )
    scored = joined.mapInPandas(
        lambda it: (rerank(pdf) for pdf in it), "q long, cand long, sim double"
    )
    w = Window.partitionBy("q").orderBy(F.desc("sim"), F.asc("cand"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q", "cand", "sim", "rank")
    )
