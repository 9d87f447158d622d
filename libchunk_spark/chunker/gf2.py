"""GF(2) polynomial arithmetic for the Rabin rolling hash.

Re-derives (from first principles, against the published restic chunker
semantics — reference: /root/reference/vendor/github.com/restic/chunker/
polynomials.go:16-251 and chunker.go:145-196) the lookup tables needed to
evaluate the windowed Rabin fingerprint *vectorized* instead of byte-at-a-time.

Key algebraic fact used throughout: the reference digest update
(`chunker.go:275-296`) is GF(2)-linear in the window bytes, so the digest of a
full 64-byte window equals the XOR of 64 independent per-position byte
contributions:

    H(b_0 .. b_63) = XOR_j  T[j][b_j],   T[j][b] = (b * x^(8*(63-j))) mod P

This turns the rolling hash into 64 NumPy table-gathers + XOR — no per-byte
Python, no sequential state.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

# Polynomial used by every reference test fixture
# (/root/reference/vendor/github.com/restic/chunker/chunker_test.go:29,
#  /root/reference/bits/types_test.go:25-30 — first 8 bytes of the test secret).
DEFAULT_POL = 0x3DA3358B4DC173

WINDOW_SIZE = 64  # chunker.go:14


def deg(x: int) -> int:
    """Degree of the GF(2) polynomial x (-1 for the zero polynomial)."""
    return x.bit_length() - 1


def pmod(x: int, p: int) -> int:
    """x mod p over GF(2)[x]."""
    dp = deg(p)
    dx = deg(x)
    while dx >= dp:
        x ^= p << (dx - dp)
        dx = deg(x)
    return x


def pmulmod(a: int, b: int, p: int) -> int:
    """(a * b) mod p over GF(2)[x]."""
    acc = 0
    while b:
        low = b & -b
        acc ^= a << deg(low)
        b ^= low
    return pmod(acc, p)


def pgcd(a: int, b: int) -> int:
    while b:
        a, b = b, pmod(a, b)
    return a


def ppowmod(a: int, n: int, p: int) -> int:
    """a^n mod p over GF(2)[x] (square-and-multiply)."""
    r = 1
    a = pmod(a, p)
    while n:
        if n & 1:
            r = pmulmod(r, a, p)
        a = pmulmod(a, a, p)
        n >>= 1
    return r


def irreducible(p: int) -> bool:
    """Ben-Or irreducibility test over GF(2) (polynomials.go:243-251)."""
    for i in range(1, deg(p) // 2 + 1):
        # x^(2^i) - x mod p ; in GF(2) subtraction is XOR
        q = ppowmod(2, 2**i, p) ^ 2
        if pgcd(p, q) != 1:
            return False
    return True


@lru_cache(maxsize=16)
def window_tables32(pol: int, window: int = WINDOW_SIZE) -> np.ndarray:
    """Low 32 bits of window_tables — the cut test (digest & splitmask == 0,
    avg_bits <= 32) only needs the low bits, and narrow accumulators cut
    the cache traffic of the hot scan loop (matters when many executor
    threads share L3)."""
    return window_tables(pol, window).astype(np.uint32)


@lru_cache(maxsize=16)
def window_tables16(pol: int, window: int = WINDOW_SIZE) -> np.ndarray:
    """Low 16 bits — enough for the cut test when avg_bits <= 16."""
    return window_tables(pol, window).astype(np.uint16)


@lru_cache(maxsize=16)
def window_tables(pol: int, window: int = WINDOW_SIZE) -> np.ndarray:
    """Per-position contribution tables, shape (window, 256) uint64.

    T[j][b] = (b * x^(8*(window-1-j))) mod pol — the digest contribution of
    byte value b sitting at window position j (j=0 oldest). Mirrors the role
    of the reference's cached out/mod tables (chunker.go:34-37,145-196) but
    reshaped for vectorized evaluation.
    """
    t = np.zeros((window, 256), dtype=np.uint64)
    for j in range(window):
        shift = 8 * (window - 1 - j)
        for b in range(256):
            t[j, b] = pmod(b << shift, pol)
    return t


@lru_cache(maxsize=16)
def paired_window_tables(
    pol: int, window: int = WINDOW_SIZE, bits: int = 16
) -> np.ndarray:
    """Byte-PAIR contribution tables, shape (window//2, 65536).

    T2[j][b1*256 + b2] = T[2j][b1] ^ T[2j+1][b2] — one gather covers two
    window bytes, halving the hot loop's take count. Each 65536-entry table
    (128 KiB at uint16) streams through one np.take call at a time, so the
    working set per gather stays L2-resident; truncation to the low `bits`
    commutes with XOR, so narrow paired tables test the splitmask exactly
    like the narrow single-byte tables.
    """
    t = window_tables(pol, window)
    if bits == 16:
        t = t.astype(np.uint16)
    elif bits == 32:
        t = t.astype(np.uint32)
    return (t[0::2][:, :, None] ^ t[1::2][:, None, :]).reshape(
        window // 2, 65536
    )


def partial_digest(pol: int, hashed: bytes, window: int = WINDOW_SIZE) -> int:
    """Digest state after hashing < window bytes from a fresh chunker reset.

    The reference resets with ``digest = slide(0, 1)`` (chunker.go:124-141),
    i.e. a marker byte 0x01 precedes the data in the window. For k < window
    hashed bytes the closed form is:

        digest = (x^(8k)  XOR  sum_i c_i * x^(8*(k-i)))  mod pol

    Used only for EOF partial chunks shorter than min_size (rare path).
    """
    k = len(hashed)
    assert k < window
    acc = 1 << (8 * k)
    for i, c in enumerate(hashed, start=1):
        acc ^= c << (8 * (k - i))
    return pmod(acc, pol)


def random_polynomial(seed: int, degree: int = 53) -> int:
    """Random irreducible polynomial of the given degree (GenerateSecret
    analog: bits/secret.go:63-82 + polynomials.go:183-219 use a random
    degree-53 irreducible poly as the chunking scope). Deterministic from
    seed; rejection-samples with the Ben-Or test."""
    rng = __import__("numpy").random.default_rng(seed)
    while True:
        bits = int(rng.integers(0, 1 << (degree - 1), dtype=np.uint64))
        p = (1 << degree) | bits | 1  # monic, constant term set
        if irreducible(p):
            return p
