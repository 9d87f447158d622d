"""CTPH fuzzy digests (operators/ctph.py): digest invariants, exact-dup
identity, CDC local-edit robustness, and the unrelated-pair floor — on
synthetic files large enough for the production 7-gram precondition."""

from __future__ import annotations

import numpy as np
import pytest

from libchunk_spark.chunker.rabin import ChunkerConfig
from libchunk_spark.fixtures import _gen_base
from libchunk_spark.operators.ctph import (
    CTPH_MAX_CODES,
    ctph_digests,
    ctph_pairs,
)

CFG = ChunkerConfig(min_size=64, max_size=128, avg_bits=4)


def _corpus(spark):
    rng = np.random.default_rng(23)
    a = _gen_base(rng, "py", 200, False)  # ~6 KB -> dozens of chunk codes
    b_parts = a.split("\n")
    mid = len(b_parts) // 2
    spliced = b_parts[:mid] + ["inserted = line(1, 2)  # local edit"] + b_parts[mid:]
    b = "\n".join(spliced)  # one local insertion
    c = _gen_base(rng, "py", 200, False)  # unrelated, same size
    d = a  # byte-identical copy
    huge = _gen_base(rng, "py", 2000, False)  # > CTPH_MAX_CODES chunks
    return spark.createDataFrame(
        [(0, a), (1, b), (2, c), (3, d), (4, huge)],
        "file_id long, content string",
    )


@pytest.fixture(scope="module")
def digests(spark):
    df = ctph_digests(_corpus(spark), CFG)
    return {r.file_id: r.digest for r in df.collect()}


def test_digest_invariants(digests):
    import re

    for d in digests.values():
        assert len(d) <= CTPH_MAX_CODES
        assert re.fullmatch(r"[A-Za-z0-9_-]*", d)
    # the 2000-line file must hit the cap exactly
    assert len(digests[4]) == CTPH_MAX_CODES
    # files of ~200 lines must clear the production 7-gram precondition
    assert len(digests[0]) >= 20


def test_exact_copy_shares_the_digest(digests):
    assert digests[0] == digests[3]


def test_local_edit_keeps_digest_similarity_high(spark, digests):
    """CDC re-sync: one inserted line perturbs O(1) chunks, so digest
    edit distance stays small relative to digest length."""
    df = ctph_digests(_corpus(spark), CFG)
    pairs = {(r.a, r.b): r.sim for r in ctph_pairs(df).collect()}
    assert (0, 1) in pairs, "locally-edited pair missed the 7-gram precondition"
    assert pairs[(0, 1)] >= 0.6
    assert pairs[(0, 3)] == 1.0  # identical chunk sequences
    assert (0, 2) not in pairs  # unrelated same-size file stays below floor
    assert (1, 2) not in pairs


def test_digest_determinism(spark, digests):
    again = {r.file_id: r.digest for r in ctph_digests(_corpus(spark), CFG).collect()}
    assert again == digests
