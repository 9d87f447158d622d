"""Shingle hashing, MinHash and SimHash kernels (NumPy, shared by the Spark
UDFs and the brute-force oracle so both sides see the identical config).

MinHash family: affine permutations of Z_2^64, h -> a*h + b (mod 2^64) with
odd a — a bijection on the 64-bit shingle-hash space (standard practice, cf.
Broder '97 resemblance + Spark MinHashLSH's affine family). Deterministic
from SignatureConfig.seed.

SimHash (Charikar '02): 64-bit, unit weights over shingle hashes.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np

from libchunk_spark.chunker.rabin import ChunkerConfig, chunk_batch
from libchunk_spark.config import SignatureConfig


@lru_cache(maxsize=8)
def minhash_params(num_perms: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 2**63, size=num_perms, dtype=np.uint64) * 2 + 1  # odd
    b = rng.integers(0, 2**63, size=num_perms, dtype=np.uint64)
    return a, b


def shingle_hashes(content: bytes, shingle_cfg: ChunkerConfig) -> np.ndarray:
    """Content-defined shingle set of one payload as uint64 hashes.

    Shingles are the pieces cut by the fine-grained Rabin chunker (the
    pipeline's re-expression of libchunk's content-defined chunk identity,
    bits/config.go:42-44); each piece is identified by an 8-byte blake2b of
    its bytes. Returns the *distinct* hashes (a set, as MinHash requires).
    """
    return shingle_hashes_batch([content], shingle_cfg)[0]


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized uint64 avalanche."""
    x = x ^ (x >> np.uint64(30))
    x = x * np.uint64(0xBF58476D1CE4E5B9)
    x = x ^ (x >> np.uint64(27))
    x = x * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def shingle_hashes_batch(
    payloads: list[bytes], shingle_cfg: ChunkerConfig
) -> list[np.ndarray]:
    """Shingle identity = mix(cut_fp, length, byte_sum) per piece, fully
    vectorized (no per-shingle hashing loop). The three signals are all
    functions of the shingle's content: the 53-bit Rabin digest of its
    trailing window, its exact length, and its exact byte sum — a collision
    needs all three equal, which only perturbs Jaccard estimates at
    negligible rates (the same function is the oracle's, so recall
    comparisons are exact either way)."""
    all_chunks = chunk_batch(payloads, shingle_cfg)
    out: list[np.ndarray] = []
    for data, chunks in zip(payloads, all_chunks):
        k = len(chunks)
        if k == 0:
            out.append(np.empty(0, dtype=np.uint64))
            continue
        arr64 = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        starts = np.fromiter((c.start for c in chunks), np.int64, k)
        lengths = np.fromiter((c.length for c in chunks), np.uint64, k)
        fps = np.fromiter((c.cut_fp for c in chunks), np.uint64, k)
        sums = np.add.reduceat(arr64, starts)  # chunks partition the payload
        h = _mix64(fps ^ _mix64(lengths ^ _mix64(sums)))
        out.append(np.unique(h))
    return out


_EMPTY_SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)


# Shingle-block size for the signature reductions: bounds the transient
# (block, num_perms)/(block, bits) matrices to a fixed ~64 MiB regardless of
# payload size (a 64 MB file with 64-byte shingles has ~1M shingles — the
# unblocked formulation allocated ~1 GB per row inside the executor UDF).
_SIG_BLOCK = 65536


def minhash_signature(hashes: np.ndarray, cfg: SignatureConfig) -> np.ndarray:
    """MinHash signature, shape (num_perms,) uint64. Empty set -> all-max."""
    a, b = minhash_params(cfg.num_perms, cfg.seed)
    acc = np.full(cfg.num_perms, _EMPTY_SENTINEL, dtype=np.uint64)
    for i in range(0, hashes.size, _SIG_BLOCK):
        # (block, num_perms) wrapped affine; min over shingles in the block
        m = hashes[i : i + _SIG_BLOCK, None] * a[None, :] + b[None, :]
        np.minimum(acc, m.min(axis=0), out=acc)
    return acc


def simhash(hashes: np.ndarray, cfg: SignatureConfig) -> int:
    """64-bit SimHash over shingle hashes (unit weights)."""
    if hashes.size == 0:
        return 0
    shifts = np.arange(cfg.simhash_bits, dtype=np.uint64)
    agg = np.zeros(cfg.simhash_bits, dtype=np.int64)
    for i in range(0, hashes.size, _SIG_BLOCK):
        blk = hashes[i : i + _SIG_BLOCK]
        bits = (blk[:, None] >> shifts[None, :]) & np.uint64(1)
        agg += 2 * bits.astype(np.int64).sum(axis=0) - len(blk)
    sig = np.uint64(0)
    for i in range(cfg.simhash_bits):
        if agg[i] > 0:
            sig |= np.uint64(1) << np.uint64(i)
    return int(sig)


def simhash_batch(hash_sets: list[np.ndarray], cfg: SignatureConfig) -> np.ndarray:
    return np.array([simhash(h, cfg) for h in hash_sets], dtype=np.uint64)


def band_hashes(sig: np.ndarray, cfg: SignatureConfig) -> np.ndarray:
    """LSH band hashes, shape (bands,) uint64: blake2b of each band's rows."""
    r = cfg.rows_per_band
    out = np.empty(cfg.bands, dtype=np.uint64)
    sig_be = sig.astype(">u8")
    for i in range(cfg.bands):
        h = hashlib.blake2b(sig_be[i * r : (i + 1) * r].tobytes() + bytes([i]),
                            digest_size=8).digest()
        out[i] = int.from_bytes(h, "big")
    return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique uint64 hash arrays."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0
