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


# chunker_test.go:37-61 — 23 chunks of 32 MiB seeded Go math/rand data,
# pol 0x3DA3358B4DC173, window 64, avg 1<<20, min 1<<19, max 1<<23.
GOLDEN_32MIB = [
    (2163460, 0x000B98D4CDF00000, "4b94cb2cf293855ea43bf766731c74969b91aa6bf3c078719aabdd19860d590d"),
    (643703, 0x000D4E8364D00000, "5727a63c0964f365ab8ed2ccf604912f2ea7be29759a2b53ede4d6841e397407"),
    (1528956, 0x0015A25C2EF00000, "a73759636a1e7a2758767791c69e81b69fb49236c6929e5d1b654e06e37674ba"),
    (1955808, 0x00102A8242E00000, "c955fb059409b25f07e5ae09defbbc2aadf117c97a3724e06ad4abd2787e6824"),
    (2222372, 0x00045DA878000000, "6ba5e9f7e1b310722be3627716cf469be941f7f3e39a4c3bcefea492ec31ee56"),
    (2538687, 0x00198A8179900000, "8687937412f654b5cfe4a82b08f28393a0c040f77c6f95e26742c2fc4254bfde"),
    (609606, 0x001D4E8D17100000, "5da820742ff5feb3369112938d3095785487456f65a8efc4b96dac4be7ebb259"),
    (1205738, 0x000A7204DD600000, "cc70d8fad5472beb031b1aca356bcab86c7368f40faa24fe5f8922c6c268c299"),
    (959742, 0x00183E71E1400000, "4065bdd778f95676c92b38ac265d361f81bff17d76e5d9452cf985a2ea5a4e39"),
    (4036109, 0x001FEC043C700000, "b9cf166e75200eb4993fc9b6e22300a6790c75e6b0fc8f3f29b68a752d42f275"),
    (1525894, 0x000B1574B1500000, "2f238180e4ca1f7520a05f3d6059233926341090f9236ce677690c1823eccab3"),
    (1352720, 0x00018965F2E00000, "afd12f13286a3901430de816e62b85cc62468c059295ce5888b76b3af9028d84"),
    (811884, 0x00155628AA100000, "42d0cdb1ee7c48e552705d18e061abb70ae7957027db8ae8db37ec756472a70a"),
    (1282314, 0x001909A0A1400000, "819721c2457426eb4f4c7565050c44c32076a56fa9b4515a1c7796441730eb58"),
    (1318021, 0x001CCEB980000000, "842eb53543db55bacac5e25cb91e43cc2e310fe5f9acc1aee86bdf5e91389374"),
    (948640, 0x0011F7A470A00000, "b8e36bf7019bb96ac3fb7867659d2167d9d3b3148c09fe0de45850b8fe577185"),
    (645464, 0x00030CE2D9400000, "5584bd27982191c3329f01ed846bfd266e96548dfa87018f745c33cfc240211d"),
    (533758, 0x0004435C53C00000, "4da778a25b72a9a0d53529eccfe2e5865a789116cb1800f470d8df685a8ab05d"),
    (1128303, 0x0000C48517800000, "08c6b0b38095b348d80300f0be4c5184d2744a17147c2cba5cc4315abf4c048f"),
    (800374, 0x000968473F900000, "820284d2c8fd243429674c996d8eb8d3450cbc32421f43113e980f516282c7bf"),
    (2453512, 0x001E197C92600000, "5fa870ed107c67704258e5e50abe67509fb73562caf77caa843b5f243425d853"),
    (2651975, 0x000AE6C868000000, "181347d2bbec32bef77ad5e9001e6af80f6abcf3576549384d334ee00c1988d8"),
    (237392, 0x0000000000000001, "fcd567f5d866357a8e299fd5b2359bb2c8157c30395229c4e9b0a353944a7978"),
]


def test_golden_32mib_fixture():
    """The reference's primary golden vector, bit-exact end to end.

    Regenerates chunker_test.go:117-123's payload (Go math/rand seeded 23,
    reimplemented from the public algorithm in tests/go_rand.py) and asserts
    every (start, length, cut_fp, sha256) of chunker_test.go:37-61. This
    closes the common-mode risk of validating only against our own scalar
    simulator (which shares gf2.py with the production kernel).
    """
    from go_rand import go_get_random

    data = go_get_random(23, 32 * 1024 * 1024)
    cfg = ChunkerConfig(pol=0x3DA3358B4DC173)
    chunks = chunk_bytes(data, cfg)
    assert len(chunks) == len(GOLDEN_32MIB)
    pos = 0
    for i, ((length, cut_fp, digest), c) in enumerate(zip(GOLDEN_32MIB, chunks)):
        assert c.start == pos, f"chunk {i} start"
        assert c.length == length, f"chunk {i} length"
        assert c.cut_fp == cut_fp, f"chunk {i} cut_fp"
        payload = data[c.start : c.start + c.length]
        assert hashlib.sha256(payload).hexdigest() == digest, f"chunk {i} sha"
        pos += c.length
    assert pos == len(data)


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
