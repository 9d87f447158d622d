"""Pure-Python/NumPy reimplementation of Go math/rand's rngSource.

Needed to regenerate the reference chunker's primary golden fixture:
vendor/github.com/restic/chunker/chunker_test.go:117-123 (getRandom) builds
32 MiB from rand.New(rand.NewSource(23)).Uint32(), and chunker_test.go:37-61
pins 23 exact (Length, CutFP, sha256) triples over it.

Go's rngSource (src/math/rand/rng.go, public BSD-licensed algorithm) is an
additive lagged-Fibonacci generator: 607-element int64 vec with taps 607/273,
b_n = b_{n-607} + b_{n-273} (mod 2^64). Seeding runs a Lehmer LCG
(seedrand: x -> 48271*x mod 2^31-1 via Schrage) and XORs each element with
rngCooked[i] — the generator state after 7.8e12 iterations from srand(1)
(Go repo gen_cooked.go). We do NOT iterate 7.8e12 times: the recurrence is
linear, so t^N mod f(t)=t^607 - t^334 - 1 (coefficients mod 2^64) jumps the
state in ~86 polynomial multiplications (~0.1 s).

Validation: with the derived rngCooked, seed 1 reproduces Go's canonical
first Int63 values (5577006791947779410, 8674665223082153551,
6129484611666145821) — asserted in derive_rng_cooked().
"""

from __future__ import annotations

import numpy as np

M31 = (1 << 31) - 1
MASK64 = (1 << 64) - 1
MASK63 = (1 << 63) - 1
LEN, TAP = 607, 273
N_COOKED = 7_800_000_000_000  # gen_cooked.go iteration count

_GO1_INT63 = (5577006791947779410, 8674665223082153551, 6129484611666145821)


def _seedrand(x: int) -> int:
    """Lehmer LCG step, Schrage's method (rng.go seedrand)."""
    hi, lo = divmod(x, 44488)
    x = 48271 * lo - 3399 * hi
    return x + M31 if x < 0 else x


def _seed_chain(seed: int, shifts: tuple[int, int], cooked=None) -> list[int]:
    """Shared seeding loop: gen_cooked.go srand (shifts 20/10, no XOR) and
    rng.go Seed (shifts 40/20, XOR rngCooked) differ only in these params."""
    vec = [0] * LEN
    x = seed % M31
    if x < 0:
        x += M31
    if x == 0:
        x = 89482311
    for i in range(-20, LEN):
        x = _seedrand(x)
        if i >= 0:
            u = (x << shifts[0]) & MASK64
            x = _seedrand(x)
            u ^= (x << shifts[1]) & MASK64
            x = _seedrand(x)
            u ^= x
            if cooked is not None:
                u ^= cooked[i]
            vec[i] = u
    return vec


# --- jump-ahead machinery: coefficients of t^n mod (t^607 - t^334 - 1) ----
# basis: t^j <-> b_{j-607}; initial b_{j-607} lives in vec slot (333-j) % 607
# (tap/feed walk: slot overwritten at step n is (333-n) % 607).


def _polymul_mod(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    c = np.convolve(a, b)  # uint64 wraparound IS the mod-2^64 arithmetic
    with np.errstate(over="ignore"):
        for d in range(len(c) - 1, LEN - 1, -1):
            cd = c[d]
            if cd:
                c[d - LEN + 334] += cd
                c[d - LEN] += cd
                c[d] = 0
    return c[:LEN].copy()


def _t_pow(n: int) -> np.ndarray:
    result = np.zeros(LEN, dtype=np.uint64)
    result[0] = 1
    base = np.zeros(LEN, dtype=np.uint64)
    base[1] = 1
    while n:
        if n & 1:
            result = _polymul_mod(result, base)
        base = _polymul_mod(base, base)
        n >>= 1
    return result


def _mul_by_t(p: np.ndarray) -> np.ndarray:
    q = np.empty_like(p)
    q[1:] = p[:-1]
    q[0] = 0
    top = p[LEN - 1]
    if top:
        with np.errstate(over="ignore"):
            q[334] += top
            q[0] += top
    return q


def _jump_state(vec0: list[int], n_steps: int) -> list[int]:
    """vec array contents after n_steps tap/feed iterations from vec0."""
    binit = np.array([vec0[(333 - j) % LEN] for j in range(LEN)], dtype=np.uint64)
    final = [0] * LEN
    p = _t_pow(n_steps)  # coefficients of b_{n_steps-607}
    with np.errstate(over="ignore"):
        for n in range(n_steps - LEN, n_steps):
            final[(333 - n) % LEN] = int((p * binit).sum())
            p = _mul_by_t(p)
    return final


_cooked_cache: list[int] | None = None


def derive_rng_cooked() -> list[int]:
    """rngCooked = 63-bit-masked state after 7.8e12 steps from srand(1)."""
    global _cooked_cache
    if _cooked_cache is None:
        vec0 = _seed_chain(1, (20, 10))
        cooked = [v & MASK63 for v in _jump_state(vec0, N_COOKED)]
        got = go_rand_uint64(1, 3, cooked=cooked)
        assert tuple(int(v) & MASK63 for v in got) == _GO1_INT63, (
            "derived rngCooked fails Go's canonical seed-1 Int63 sequence"
        )
        _cooked_cache = cooked
    return _cooked_cache


def go_rand_uint64(seed: int, n: int, cooked: list[int] | None = None) -> np.ndarray:
    """First n Uint64 outputs of rand.New(rand.NewSource(seed)) — vectorized.

    The tap/feed walk linearizes to b_k = b_{k-607} + b_{k-273} over the
    flattened sequence, so blocks of <=273 values vectorize cleanly.
    """
    if cooked is None:
        cooked = derive_rng_cooked()
    vec = _seed_chain(seed, (40, 20), cooked=cooked)
    arr = np.empty(LEN + n, dtype=np.uint64)
    arr[:LEN] = [vec[(333 - j) % LEN] for j in range(LEN)]
    with np.errstate(over="ignore"):
        i = LEN
        end = LEN + n
        while i < end:
            m = min(TAP, end - i)
            arr[i : i + m] = arr[i - LEN : i - LEN + m] + arr[i - TAP : i - TAP + m]
            i += m
    return arr[LEN:]


def go_get_random(seed: int, count: int) -> bytes:
    """chunker_test.go getRandom: count bytes from Uint32() little-endian."""
    n32 = (count + 3) // 4
    u64 = go_rand_uint64(seed, n32)
    u32 = ((u64 & MASK63) >> np.uint64(31)).astype(np.uint32)
    return u32.astype("<u4").tobytes()[:count]
