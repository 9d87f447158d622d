"""ICWS weighted-MinHash estimator guards (functions/signatures.py).

Per the r6 hard-won rule, recall floors and shared-construction oracles do
NOT validate a sketch: these tests measure the estimator against exact
weighted Jaccard computed by independent arithmetic, plus the degeneracy
probes that would have caught the r6 demo-perm defect class (a family
whose samples ignore the randomness reads est ~ 1.0 for any same-support
pair and fails the weight-sensitivity probe below)."""

from __future__ import annotations

import numpy as np
import pytest

from libchunk_spark.functions.signatures import icws_samples

SEED = 0x1C3517


def _wjac(d1: dict, d2: dict) -> float:
    keys = set(d1) | set(d2)
    mn = sum(min(d1.get(k, 0), d2.get(k, 0)) for k in keys)
    mx = sum(max(d1.get(k, 0), d2.get(k, 0)) for k in keys)
    return mn / mx


def _sam(d: dict, k: int = 512, seed: int = SEED) -> np.ndarray:
    return icws_samples(
        np.array(list(d), dtype=np.uint64),
        np.array(list(d.values()), dtype=np.float64),
        k,
        seed,
    )


def _est(d1: dict, d2: dict, k: int = 512) -> float:
    return float(np.mean(_sam(d1, k) == _sam(d2, k)))


def _random_pairs(n_pairs: int = 30):
    rng = np.random.default_rng(7)
    for _ in range(n_pairs):
        n = int(rng.integers(5, 60))
        base = {
            int(h): int(w)
            for h, w in zip(
                rng.integers(0, 2**63, n), rng.integers(1, 20, n)
            )
        }
        d2 = dict(base)
        for key in list(d2):
            r = rng.random()
            if r < 0.2:
                del d2[key]
            elif r < 0.5:
                d2[key] = int(rng.integers(1, 20))
        for h in rng.integers(0, 2**63, int(rng.integers(0, 10))):
            d2[int(h)] = int(rng.integers(1, 20))
        yield base, d2


def test_multi_pair_calibration_vs_exact_weighted_jaccard():
    """est (K=512) vs exact J_w over 30 random weighted-set pairs spanning
    the similarity range; bounds ~2x over measured (mae 0.0143, maxerr
    0.0432, bias -0.0032)."""
    errs = np.array([_est(a, b) - _wjac(a, b) for a, b in _random_pairs()])
    assert float(np.abs(errs).mean()) <= 0.03
    assert float(np.abs(errs).max()) <= 0.09
    assert abs(float(errs.mean())) <= 0.02


def test_weight_sensitivity_same_support():
    """Degeneracy probe: identical element SUPPORT but very different
    weights must read est ~ J_w, far from 1.0. A family whose samples
    collapse to the unweighted argmin (the r6 defect class, lifted to
    the weighted setting) reads ~1.0 here."""
    rng = np.random.default_rng(11)
    elems = rng.integers(0, 2**63, 40)
    a = {int(h): 1 for h in elems}
    b = {int(h): 10 for h in elems}
    j = _wjac(a, b)  # = 0.1 exactly
    est = _est(a, b)
    assert j == pytest.approx(0.1)
    assert abs(est - j) <= 0.06, f"weight-insensitive family? est={est}"


def test_identical_and_disjoint_sets():
    rng = np.random.default_rng(13)
    a = {int(h): int(w) for h, w in zip(rng.integers(0, 2**63, 30),
                                        rng.integers(1, 9, 30))}
    b = {int(h): int(w) for h, w in zip(rng.integers(0, 2**63, 30),
                                        rng.integers(1, 9, 30))}
    assert _est(a, dict(a)) == 1.0
    assert _est(a, b) == 0.0  # disjoint supports never share a sample


def test_sample_diversity_within_one_set():
    """Samples across k must vary (many distinct argmin winners) — the
    all-perms-are-one-permutation failure reads ONE repeated sample."""
    rng = np.random.default_rng(17)
    d = {int(h): int(w) for h, w in zip(rng.integers(0, 2**63, 50),
                                        rng.integers(1, 20, 50))}
    s = _sam(d, k=128)
    assert len(set(s.tolist())) >= 25


def test_determinism_and_seed_separation():
    rng = np.random.default_rng(19)
    d = {int(h): int(w) for h, w in zip(rng.integers(0, 2**63, 20),
                                        rng.integers(1, 9, 20))}
    assert np.array_equal(_sam(d), _sam(d))
    assert not np.array_equal(_sam(d, seed=SEED), _sam(d, seed=SEED + 1))


def test_empty_set_sentinel():
    s = icws_samples(np.array([], dtype=np.uint64), np.array([], float), 16, SEED)
    assert s.shape == (16,) and (s == -1).all()
