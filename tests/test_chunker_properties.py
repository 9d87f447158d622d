"""Property-based chunker tests (hypothesis) — no Spark needed.

Complements the golden fixtures: for arbitrary byte strings and scaled
configs, the vectorized chunker must satisfy the CDC contract
(chunker.go:295 semantics) and agree with itself across batch layouts.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from libchunk_spark.chunker.rabin import ChunkerConfig, chunk_batch, chunk_bytes

CFG = ChunkerConfig(min_size=64, max_size=512, avg_bits=6)

payload = st.binary(min_size=0, max_size=4096)


@settings(max_examples=200, deadline=None)
@given(payload)
def test_partition_invariants(data: bytes):
    chunks = chunk_bytes(data, CFG)
    if not data:
        assert chunks == []
        return
    assert chunks[0].start == 0
    assert sum(c.length for c in chunks) == len(data)
    for a, b in zip(chunks, chunks[1:]):
        assert b.start == a.start + a.length
    for c in chunks[:-1]:
        assert CFG.min_size <= c.length <= CFG.max_size
        if c.length < CFG.max_size:
            assert c.cut_fp & CFG.splitmask == 0


@settings(max_examples=200, deadline=None)
@given(payload)
def test_cuts_are_content_local(data: bytes):
    """Appending a suffix never changes cuts that ended >= max_size before
    the end of the original data (CDC locality — the dedup property)."""
    chunks = chunk_bytes(data, CFG)
    extended = chunk_bytes(data + b"SUFFIX" * 10, CFG)
    stable = [c for c in chunks if c.start + c.length + CFG.max_size <= len(data)]
    assert extended[: len(stable)] == stable


@settings(max_examples=50, deadline=None)
@given(st.lists(payload, min_size=0, max_size=12))
def test_batch_equals_per_row(payloads: list[bytes]):
    assert chunk_batch(payloads, CFG) == [chunk_bytes(p, CFG) for p in payloads]


@settings(max_examples=100, deadline=None)
@given(payload, st.integers(min_value=0, max_value=4095))
def test_concat_cut_independence(data: bytes, split_at: int):
    """Chunking is a pure function of bytes: the same bytes embedded in a
    batch at any position produce the same relative cuts."""
    split_at = min(split_at, len(data))
    other = data[:split_at]
    res = chunk_batch([other, data, b"x" * 65], CFG)
    assert res[1] == chunk_bytes(data, CFG)
