#!/usr/bin/env python
"""Micro-benchmark: partition-local contraction kernel, dict union-find vs
vectorized min-label propagation -> BENCH/local_contract_micro.json.

VERDICT r05 next #5 acceptance: the NumPy kernel (_contract_block) vs the
per-edge Python dict loop it replaced, on the edge shapes the CC pre-pass
actually sees (near-clique LSH band edges — the motivating shape — plus
adversarial long-diameter chains and sparse random pairs). Pure kernel
timing, no Spark — the kernels are exactly what mapInPandas runs per
block.

Both kernels must induce the SAME component partition (asserted per
shape; exact roots may differ — the vectorized kernel's canonical root is
first-appearance order, the dict loop's is the min id, and downstream
only consumes connectivity).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from libchunk_spark.operators.components import _contract_block  # noqa: E402


def dict_union_find(a: np.ndarray, b: np.ndarray):
    """The replaced round-5 kernel, verbatim semantics (min-rooted
    union-find with path compression, per-edge Python loop) — kept here as
    the micro-bench baseline only."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    nodes: set[int] = set()
    for x, y in zip(a, b):
        x, y = int(x), int(y)
        nodes.add(x)
        nodes.add(y)
        rx, ry = find(x), find(y)
        if rx == ry:
            continue
        if rx < ry:
            parent[ry] = rx
        else:
            parent[rx] = ry
    out_a, out_b = [], []
    for n in nodes:
        r = find(n)
        if r != n:
            out_a.append(r)
            out_b.append(n)
    return np.array(out_a, dtype=np.int64), np.array(out_b, dtype=np.int64)


def make_edges(shape: str, n_edges: int, rng: np.random.Generator):
    """Edge sets modeled on what the CC pre-pass sees from LSH bands."""
    if shape == "cliques":
        # near-clique band edges: k-cliques of k=64 until n_edges reached
        k = 64
        per = k * (k - 1) // 2
        blocks = max(1, n_edges // per)
        ii, jj = np.triu_indices(k, 1)
        base = rng.choice(blocks * k * 10, size=blocks, replace=False) * 1000
        a = (base[:, None] + ii[None, :]).ravel()
        b = (base[:, None] + jj[None, :]).ravel()
    elif shape == "chains":
        # long paths: worst case for label propagation depth
        n = n_edges
        perm = rng.permutation(n + 1).astype(np.int64)
        a, b = perm[:-1], perm[1:]
    else:  # random sparse pairs
        a = rng.integers(0, n_edges * 2, size=n_edges, dtype=np.int64)
        b = rng.integers(0, n_edges * 2, size=n_edges, dtype=np.int64)
        keep = a != b
        a, b = a[keep], b[keep]
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return lo.astype(np.int64), hi.astype(np.int64)


def stars_to_partition(roots: np.ndarray, members: np.ndarray, all_nodes) -> set:
    """Component sets induced by a star forest (roots are canonical but
    arbitrary per kernel — only the PARTITION must agree)."""
    groups: dict = {}
    assign = dict(zip(members.tolist(), roots.tolist()))
    for n in all_nodes:
        groups.setdefault(assign.get(n, n), set()).add(n)
    return {frozenset(g | {r}) for r, g in groups.items()}


def main() -> None:
    rng = np.random.default_rng(42)
    results = {}
    for shape, n_edges in [
        ("cliques", 2_000_000),
        ("chains", 1_000_000),
        ("random", 2_000_000),
    ]:
        # partition equality on a smaller instance of the same shape (the
        # driver-side set-of-frozensets comparison is O(n) Python; timing
        # below uses the full arrays)
        sa, sb = make_edges(shape, n_edges // 20, rng)
        all_nodes = set(np.concatenate([sa, sb]).tolist())
        assert stars_to_partition(
            *_contract_block(sa, sb), all_nodes
        ) == stars_to_partition(
            *dict_union_find(sa, sb), all_nodes
        ), f"kernel mismatch on {shape}"

        a, b = make_edges(shape, n_edges, rng)

        _contract_block(a, b)  # warm (allocator, import)
        vec_sec = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            _contract_block(a, b)
            vec_sec = min(vec_sec, time.perf_counter() - t0)

        dict_sec = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            dict_union_find(a, b)
            dict_sec = min(dict_sec, time.perf_counter() - t0)

        results[shape] = {
            "n_edges": int(len(a)),
            "dict_sec": round(dict_sec, 3),
            "vec_sec": round(vec_sec, 4),
            "dict_edges_per_sec": round(len(a) / dict_sec),
            "vec_edges_per_sec": round(len(a) / vec_sec),
            "speedup": round(dict_sec / vec_sec, 1),
        }
        print(json.dumps({shape: results[shape]}))

    out = {
        "kernel": "_contract_block (Boruvka contraction: argsort+reduceat "
        "grouped min, pointer jumping, edge-list contraction per round) "
        "vs per-edge dict union-find",
        "stat": "best-of-2 dict, best-of-3 vec (warmed), same arrays",
        "shapes": results,
        "min_speedup": min(r["speedup"] for r in results.values()),
        "cliques_speedup": results["cliques"]["speedup"],
        "note": "cliques are the shape the pre-pass exists for (LSH band "
        "near-cliques); chains/random are adversarial diameter shapes",
        "gate_10x_cliques": results["cliques"]["speedup"] >= 10,
        "gate_10x_all": min(r["speedup"] for r in results.values()) >= 10,
    }
    with open(os.path.join(REPO, "BENCH", "local_contract_micro.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(
        json.dumps(
            {
                "min_speedup": out["min_speedup"],
                "cliques_speedup": out["cliques_speedup"],
            }
        )
    )


if __name__ == "__main__":
    main()
