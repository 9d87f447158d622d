"""Brute-force reference oracle (small-scale only).

Exact pairwise Jaccard over the same content-defined shingle sets the
pipeline uses, thresholded, then union-find — ground-truth dup-pairs and
cluster assignments "at the same shingle/signature config" (BASELINE.json).
The Go reference has no clustering; identity semantics are pinned by the
shared chunking config, and this oracle is the brute-force instantiation of
that config (SURVEY.md §7 step 3). O(n^2) — use <= ~1000 files.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from libchunk_spark.config import PipelineConfig
from libchunk_spark.functions.signatures import jaccard, shingle_hashes_batch


class UnionFind:
    def __init__(self, ids: list[int]):
        self.parent = {i: i for i in ids}

    def find(self, x: int) -> int:
        p = self.parent
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if ra > rb:
                ra, rb = rb, ra
            self.parent[rb] = ra  # min-root convention


@dataclass
class OracleResult:
    pairs: set[tuple[int, int]]  # (a, b), a < b, jaccard >= threshold
    components: dict[int, int]  # file_id -> component (min file_id in cluster)
    jaccards: dict[tuple[int, int], float]


def oracle_dup_pairs(
    file_ids: list[int], contents: list[bytes], cfg: PipelineConfig
) -> OracleResult:
    """Exact dup-pairs + components for (file_ids, contents)."""
    sets = shingle_hashes_batch(contents, cfg.shingle)
    n = len(file_ids)
    pairs: set[tuple[int, int]] = set()
    jac: dict[tuple[int, int], float] = {}
    uf = UnionFind(list(file_ids))
    for i in range(n):
        si = sets[i]
        for j in range(i + 1, n):
            v = jaccard(si, sets[j])
            if v >= cfg.jaccard_threshold:
                a, b = sorted((file_ids[i], file_ids[j]))
                pairs.add((a, b))
                jac[(a, b)] = v
                uf.union(a, b)
    comps = {f: uf.find(f) for f in file_ids}
    return OracleResult(pairs, comps, jac)


def pair_recall(
    candidate_components: dict[int, int], oracle: OracleResult
) -> float:
    """Fraction of oracle dup-pairs that land in the same pipeline component."""
    if not oracle.pairs:
        return 1.0
    hit = sum(
        1
        for (a, b) in oracle.pairs
        if candidate_components.get(a) is not None
        and candidate_components.get(a) == candidate_components.get(b)
    )
    return hit / len(oracle.pairs)
