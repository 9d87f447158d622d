"""Chunker golden-fixture + property tests.

Mirrors the reference test strategy (SURVEY.md §5):
* null-byte golden fixture — portable expected output from
  /root/reference/vendor/github.com/restic/chunker/chunker_test.go:64-69;
* invariant checks (cut mask, min/max bounds, concat == input) from
  chunker_test.go:195-220;
* determinism (TestChunkerReset, chunker_test.go:151-158);
* cross-check against an independent byte-at-a-time simulator of the
  published rolling-hash state machine.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from libchunk_spark.chunker import gf2
from libchunk_spark.chunker.rabin import (
    KIB,
    Chunk,
    ChunkerConfig,
    chunk_batch,
    chunk_bytes,
)

POL = gf2.DEFAULT_POL


def slow_chunks(data: bytes, cfg: ChunkerConfig) -> list[Chunk]:
    """Independent byte-at-a-time simulator of the published CDC semantics.

    Deliberately written from the *specification* (windowed Rabin digest,
    pre-skip, min/max, EOF flush) rather than vectorized, to cross-check the
    NumPy kernel. O(n * window) — tests only.
    """
    w, n = cfg.window, len(data)
    mask = cfg.splitmask
    chunks: list[Chunk] = []
    s = 0
    while s < n:
        pre = cfg.min_size - w
        # window state: marker byte 0x01 then hashed bytes, oldest first
        window: list[int] = [1]
        digest = gf2.pmod(1, cfg.pol)
        cut = None
        add = min(pre, n - s)
        pos = s + pre
        while pos < n:
            b = data[pos]
            window.append(b)
            if len(window) > w:
                window.pop(0)
            # recompute digest from scratch over the current window (slow!)
            acc = 0
            for i, wb in enumerate(window):
                acc ^= wb << (8 * (len(window) - 1 - i))
            digest = gf2.pmod(acc, cfg.pol)
            add += 1
            pos += 1
            if add < cfg.min_size:
                continue
            if (digest & mask) == 0 or add >= cfg.max_size:
                cut = (pos - 1, digest)
                break
        if cut is not None:
            q, fp = cut
            chunks.append(Chunk(s, q - s + 1, fp))
            s = q + 1
        else:
            chunks.append(Chunk(s, n - s, digest if n - s > 0 else 1))
            s = n
    return chunks


def test_polynomial_is_irreducible_degree_53():
    assert gf2.deg(POL) == 53
    assert gf2.irreducible(POL)
    assert not gf2.irreducible(POL ^ 1 ^ POL % 2 | 4)  # a composite neighbour


def test_null_byte_golden_fixture():
    """4*MinSize zero bytes → exactly 4 chunks of MinSize, known sha256.

    Portable golden from chunker_test.go:64-69 (reference constants:
    min=512KiB, avg_bits=20). H(64 zero bytes) == 0 → cut at every eligible
    position → exact-MinSize chunks.
    """
    cfg = ChunkerConfig()  # reference defaults
    data = bytes(4 * cfg.min_size)
    chunks = chunk_bytes(data, cfg)
    assert len(chunks) == 4
    expected_sha = "07854d2fef297a06ba81685e660c332de36d5d18d546927d30daad6d7fda1541"
    for i, c in enumerate(chunks):
        assert c.start == i * cfg.min_size
        assert c.length == cfg.min_size
        assert c.cut_fp == 0  # all-zero window hashes to 0
        payload = data[c.start : c.start + c.length]
        assert hashlib.sha256(payload).hexdigest() == expected_sha


@pytest.mark.parametrize("seed", [0, 1, 7])
def test_matches_scalar_simulator(seed):
    cfg = ChunkerConfig(min_size=64, max_size=512, avg_bits=6)
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, size=5000, dtype=np.uint8).tobytes()
    fast = chunk_bytes(data, cfg)
    slow = slow_chunks(data, cfg)
    assert fast == slow


def test_matches_scalar_simulator_text():
    cfg = ChunkerConfig(min_size=128, max_size=1024, avg_bits=7)
    rng = np.random.default_rng(99)
    words = ["def", "return", "class", "import", "spam", "x", "foo_bar", "\n"]
    data = " ".join(rng.choice(words, size=3000)).encode()
    assert chunk_bytes(data, cfg) == slow_chunks(data, cfg)


def test_invariants_random_inputs():
    cfg = ChunkerConfig(min_size=256, max_size=2048, avg_bits=8)
    rng = np.random.default_rng(42)
    for size in [0, 1, 63, 64, 255, 256, 257, 5000, 40000]:
        data = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        chunks = chunk_bytes(data, cfg)
        if size == 0:
            assert chunks == []
            continue
        # concat(chunks) covers input exactly, in order
        assert chunks[0].start == 0
        assert sum(c.length for c in chunks) == size
        for a, b in zip(chunks, chunks[1:]):
            assert b.start == a.start + a.length
        for c in chunks[:-1]:
            assert cfg.min_size <= c.length <= cfg.max_size
            if c.length < cfg.max_size:  # non-forced cut → mask holds
                assert c.cut_fp & cfg.splitmask == 0
        assert chunks[-1].length <= cfg.max_size


def test_determinism_and_reset():
    """Same input chunked twice → identical output (TestChunkerReset)."""
    cfg = ChunkerConfig(min_size=64, max_size=256, avg_bits=5)
    data = np.random.default_rng(3).integers(0, 256, 4000, dtype=np.uint8).tobytes()
    assert chunk_bytes(data, cfg) == chunk_bytes(data, cfg)


def test_min_chunk_count_9x_max():
    """>= 2 chunks when input exceeds max_size (bits/put_test.go:24-29 analog)."""
    cfg = ChunkerConfig(min_size=64, max_size=256, avg_bits=5)
    data = np.random.default_rng(5).integers(0, 256, 9 * 256, dtype=np.uint8).tobytes()
    assert len(chunk_bytes(data, cfg)) >= 2


def test_eof_partial_digest_tiny_inputs():
    cfg = ChunkerConfig(min_size=64, max_size=256, avg_bits=5)
    for size in [1, 10, 63, 64, 100, 127]:
        data = bytes(range(size % 251)) * (size // max(size % 251, 1) + 1)
        data = data[:size]
        assert chunk_bytes(data, cfg) == slow_chunks(data, cfg)


def test_batch_2d_path_matches_per_row():
    cfg = ChunkerConfig(min_size=64, max_size=256, avg_bits=5)
    rng = np.random.default_rng(11)
    payloads = [
        rng.integers(0, 256, size=int(sz), dtype=np.uint8).tobytes()
        for sz in rng.integers(0, 2000, size=40)
    ] + [b"", b"x"]
    batched = chunk_batch(payloads, cfg)
    per_row = [chunk_bytes(p, cfg) for p in payloads]
    assert batched == per_row


def test_large_input_forced_cuts_only():
    """avg_bits so high no natural cut fires → forced max_size cuts."""
    cfg = ChunkerConfig(min_size=64, max_size=128, avg_bits=30)
    data = np.random.default_rng(8).integers(0, 256, 1000, dtype=np.uint8).tobytes()
    chunks = chunk_bytes(data, cfg)
    for c in chunks[:-1]:
        assert c.length == 128
    assert chunk_bytes(data, cfg) == slow_chunks(data, cfg)


def test_random_polynomial_generation():
    """GenerateSecret analog: seeded random irreducible degree-53 polys."""
    p1 = gf2.random_polynomial(1)
    p2 = gf2.random_polynomial(2)
    assert p1 != p2
    for p in (p1, p2):
        assert gf2.deg(p) == 53
        assert gf2.irreducible(p)
    assert gf2.random_polynomial(1) == p1  # deterministic
    # a fresh polynomial drives the chunker end-to-end
    cfg = ChunkerConfig(pol=p1, min_size=64, max_size=256, avg_bits=5)
    data = bytes(range(256)) * 8
    chunks = chunk_bytes(data, cfg)
    assert sum(c.length for c in chunks) == len(data)
    assert chunk_bytes(data, cfg) == slow_chunks(data, cfg)
