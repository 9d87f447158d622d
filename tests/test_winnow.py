"""Robust winnowing (operators/winnow.py) vs a direct-from-paper Python
reference, plus the paper's guarantee theorem on planted substrings.

Chain of evidence: hypothesis drives the REFERENCE implementation hard
(guarantee property, many examples, no JVM in the loop); one seeded
equality test then pins the Spark array-expression implementation to the
reference bit-for-bit, including short/empty-document edge cases.
"""

from __future__ import annotations

import hashlib
import random
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from libchunk_spark.operators.winnow import (
    POS_MOD,
    WINNOW_K,
    WINNOW_W,
    winnow_fingerprints,
    winnow_selected,
)

ALPHA = string.ascii_lowercase + " "


def ref_winnow(text: str, k: int = WINNOW_K, w: int = WINNOW_W) -> set[int]:
    """Schleimer et al. §5.2 robust winnowing, executed literally: slide a
    w-window over the k-gram hashes, keep each window's minimal hash with
    rightmost tie-break, via the same (hash asc, pos desc) packed encoding
    the Spark expression uses."""
    n = max(len(text) - k + 1, 1)
    encs = []
    for i in range(1, n + 1):  # 1-based positions, like F.sequence(1, n)
        gram = text[i - 1 : i - 1 + k]
        h = int(hashlib.md5(gram.encode()).hexdigest()[:10], 16)
        encs.append(h * POS_MOD + (POS_MOD - 1 - (i % POS_MOD)))
    m = len(encs)
    sel = set()
    for j in range(min(w, m), m + 1):
        lo = max(j - w, 0)
        sel.add(min(encs[lo:j]))
    return sel


def ref_fps(text: str) -> set[int]:
    return {e >> 20 for e in ref_winnow(text)}


def _random_docs() -> list[str]:
    rng = random.Random(0xC0DE)
    docs = ["", "a", "short", "exactly8", "elevenchars"]  # < k, = k, = t edges
    for ln in [12, 20, 40, 80, 200, 400]:
        for _ in range(4):
            docs.append("".join(rng.choice(ALPHA) for _ in range(ln)))
    # a planted-substring pair (common run well over t = w + k - 1 = 11)
    core = "def put(chunk): return sha256(chunk)"
    docs.append("AAA " + core + " tail one")
    docs.append("zzzz " + core + " other suffix")
    return docs


def test_winnow_selected_matches_reference(spark):
    docs = _random_docs()
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id int, text string"
    )
    rows = df.select("doc_id", winnow_selected("text").alias("sel")).collect()
    got = {r["doc_id"]: set(r["sel"]) for r in rows}
    for i, d in enumerate(docs):
        assert got[i] == ref_winnow(d), f"doc {i!r}: {d!r}"


def test_winnow_fingerprints_rows(spark):
    docs = _random_docs()
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id int, text string"
    )
    rows = winnow_fingerprints(df).collect()
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, d in enumerate(docs):
        assert got.get(i, set()) == ref_fps(d)
    # the planted pair shares fingerprints (guarantee, through Spark)
    a, b = len(docs) - 2, len(docs) - 1
    assert got[a] & got[b]


def test_pipeline_winnow_edge_source(spark, tmp_path_factory):
    """run_pipeline(with_winnow=True): winnow containment edges join the
    union, clustering still covers every file, and dup-pair recall vs the
    brute-force oracle cannot drop (extra edges only ever merge clusters).
    Note: like with_containment, the flag is not part of the stage
    fingerprint — resuming a catalog with different edge-source flags
    reuses the cached cand_pairs stage (fresh catalog per flag set)."""
    from libchunk_spark.config import CORPUS_PIPELINE_CONFIG as CFG
    from libchunk_spark.fixtures import corpus_to_spark, generate_corpus
    from libchunk_spark.oracle import oracle_dup_pairs, pair_recall
    from libchunk_spark.pipeline import run_pipeline
    from libchunk_spark.sources.catalog import StageCatalog

    rows = generate_corpus(n_files=60, seed=11)
    corpus = corpus_to_spark(spark, rows).cache()
    oracle = oracle_dup_pairs(
        [r.file_id for r in rows],
        [r.content.encode() for r in rows],
        CFG,
    )

    base = run_pipeline(
        corpus, CFG,
        StageCatalog(root=str(tmp_path_factory.mktemp("winnow_off"))),
        with_containment=False,
    )
    withw = run_pipeline(
        corpus, CFG,
        StageCatalog(root=str(tmp_path_factory.mktemp("winnow_on"))),
        with_containment=False, with_winnow=True,
    )
    srcs = {r["source"] for r in withw.edges.select("source").distinct().collect()}
    assert "winnow" in srcs
    assert withw.components.count() == corpus.count()

    def assignment(res):
        return {
            r["file_id"]: r["component"] for r in res.components.collect()
        }

    r_base = pair_recall(assignment(base), oracle)
    r_with = pair_recall(assignment(withw), oracle)
    assert r_with >= r_base


def test_winnow_xxhash64_selection_matches_reference_windowing(spark):
    """Production hasher (xxhash64): the hash primitive is Spark's own
    intrinsic (not ours to re-verify), so the reference chain pins the
    SELECTION logic — extract the per-gram encodings from Spark, run the
    literal §5.2 windowing over them in Python, and require the Spark
    array-expression selection to match per document."""
    import pyspark.sql.functions as F

    from libchunk_spark.operators.winnow import winnow_encs

    docs = _random_docs()
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id int, text string"
    )
    rows = df.select(
        "doc_id",
        winnow_encs(F.col("text"), hasher="xxhash64").alias("encs"),
        winnow_selected("text", hasher="xxhash64").alias("sel"),
    ).collect()
    for r in rows:
        encs, m = list(r["encs"]), len(r["encs"])
        want = set()
        for j in range(min(WINNOW_W, m), m + 1):
            want.add(min(encs[max(j - WINNOW_W, 0) : j]))
        assert set(r["sel"]) == want, f"doc {r['doc_id']}"
        # packing invariant: 40-bit hash + 23 position bits (ADVICE r06
        # widened the xxhash64 path's POS_BITS) fill a signed long exactly
        from libchunk_spark.operators.winnow import POS_BITS_BY_HASHER

        bits = 40 + POS_BITS_BY_HASHER["xxhash64"]
        assert bits <= 63
        assert all(0 <= e < 1 << bits for e in encs)


def test_winnow_xxhash64_guarantee_on_planted_pair(spark):
    """The SIGMOD 2003 guarantee is hash-agnostic: the planted >= t-char
    common substring shares a selected fingerprint under the production
    xxhash64 construction too."""
    docs = _random_docs()
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id int, text string"
    )
    rows = winnow_fingerprints(df, hasher="xxhash64").collect()
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    a, b = len(docs) - 2, len(docs) - 1
    assert got[a] & got[b]
    # and the two hashers select DIFFERENT fingerprint values (i.e. the
    # hasher switch is actually live, not silently falling back to md5)
    md5_fps = {fp for r in winnow_fingerprints(df).collect() for fp in [r["fp"]]}
    xx_fps = {fp for s in got.values() for fp in s}
    assert md5_fps != xx_fps


@settings(max_examples=200, deadline=None)
@given(
    prefix_a=st.text(ALPHA, max_size=30),
    suffix_a=st.text(ALPHA, max_size=30),
    prefix_b=st.text(ALPHA, max_size=30),
    suffix_b=st.text(ALPHA, max_size=30),
    shared=st.text(ALPHA, min_size=WINNOW_W + WINNOW_K - 1, max_size=60),
)
def test_guarantee_shared_substring_shares_fingerprint(
    prefix_a, suffix_a, prefix_b, suffix_b, shared
):
    """Theorem (SIGMOD 2003): any common substring of length >= t = w+k-1
    is witnessed by at least one shared selected fingerprint hash."""
    da = prefix_a + shared + suffix_a
    db = prefix_b + shared + suffix_b
    assert ref_fps(da) & ref_fps(db)


@settings(max_examples=100, deadline=None)
@given(doc=st.text(ALPHA, max_size=120))
def test_reference_density_and_bounds(doc):
    """Every selected enc is a real k-gram hash at a real position, and at
    least one fingerprint is always selected (even for the empty doc)."""
    sel = ref_winnow(doc)
    assert sel
    n = max(len(doc) - WINNOW_K + 1, 1)
    legal = set()
    for i in range(1, n + 1):
        gram = doc[i - 1 : i - 1 + WINNOW_K]
        h = int(hashlib.md5(gram.encode()).hexdigest()[:10], 16)
        legal.add(h * POS_MOD + (POS_MOD - 1 - (i % POS_MOD)))
    assert sel <= legal
