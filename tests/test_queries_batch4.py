"""Targeted tests for the round-6 batch-4 queries (oracle parity itself is
covered for every registry entry by test_entry.py).

* word_entropy — bounded by [0, log2(n_words)]; zero iff one distinct word.
* shard_plan — cluster co-location: a dup component never straddles shards,
  and the audit's doc count reconciles with the corpus.
* curation_decisions — final_keep is exactly the conjunction of the three
  gates, eval docs are out of scope, and both verdicts occur.
* doc_len_histogram — buckets partition the corpus and bound their members.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from libchunk_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_word_entropy_bounds(spark):
    ent = Q.q_word_entropy(spark, SF)
    stats = Q.q_repetition_stats(spark, SF).select("doc_id", "n_words")
    joined = ent.join(stats, "doc_id").collect()
    assert len(joined) == 500
    for r in joined:
        assert 0.0 <= r["word_entropy"] <= math.log2(r["n_words"]) + 1e-9
    # uniform-ish word salad should not be degenerate: some entropy > 1 bit
    assert any(r["word_entropy"] > 1.0 for r in joined)


def test_word_entropy_zero_iff_single_distinct_word(spark, tmp_path):
    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            (1, "same same same same", "en", "s", 19),
            (2, "two distinct words here", "en", "s", 23),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    rows = {r["doc_id"]: r["word_entropy"] for r in Q.q_word_entropy(spark, d).collect()}
    assert rows[1] == 0.0
    assert rows[2] == 2.0  # 4 equally-frequent words -> log2(4)


def test_shard_plan_colocates_clusters_and_reconciles(spark):
    comp = Q.q_components(spark, SF)
    shard = F.substring(F.sha2(F.col("component").cast("string"), 256), 1, 1)
    per_comp = (
        comp.select("component", shard.alias("shard"))
        .groupBy("component")
        .agg(F.countDistinct("shard").alias("n_shards"))
        .agg(F.max("n_shards").alias("mx"))
        .collect()[0]["mx"]
    )
    assert per_comp == 1  # no component straddles shards
    plan = Q.q_shard_plan(spark, SF).collect()
    assert sum(r["n_docs"] for r in plan) == 500
    assert 1 <= len(plan) <= Q.N_SHARDS_HEX
    n_comp = comp.select("component").distinct().count()
    assert sum(r["n_clusters"] for r in plan) == n_comp


def test_curation_decisions_conjunction_and_scope(spark):
    cur = Q.q_curation_decisions(spark, SF)
    rows = cur.collect()
    # eval docs (doc_id % 97 == 0) are out of scope
    assert all(r["doc_id"] % 97 != 0 for r in rows)
    assert len(rows) == 500 - len([i for i in range(500) if i % 97 == 0])
    for r in rows:
        assert r["final_keep"] == (
            r["quality_keep"] and r["dedup_keep"] and not r["contaminated"]
        )
    kept = [r for r in rows if r["final_keep"]]
    assert 0 < len(kept) < len(rows)  # both verdicts occur


def test_doc_len_histogram_partitions_and_bounds(spark):
    rows = Q.q_doc_len_histogram(spark, SF).collect()
    assert sum(r["n_docs"] for r in rows) == 500
    for r in rows:
        b = r["len_bucket"]
        assert 2**b <= max(r["min_chars"], 1)
        assert max(r["max_chars"], 1) < 2 ** (b + 1)
        assert r["min_chars"] <= r["max_chars"]
        assert r["n_docs"] * r["min_chars"] <= r["total_chars"]


def test_audit_composites_checkpoint_fed_equals_recompute(spark):
    """VERDICT r06 next #4: feeding the audit composites a precomputed
    components table (the checkpoint path bench + run_pipeline use) must
    reproduce the registry default (recompute) exactly, for all four
    seam consumers."""
    sf = "/root/testdata/sf0.01"
    comp = Q.q_components(spark, sf).localCheckpoint()
    for qfn in (
        Q.q_cluster_stats,
        Q.q_shard_plan,
        Q.q_dedup_verdicts,
        Q.q_curation_decisions,
    ):
        fed = sorted(tuple(r) for r in qfn(spark, sf, components_source=comp).collect())
        ref = sorted(tuple(r) for r in qfn(spark, sf).collect())
        assert fed == ref and len(ref) > 0, qfn.__name__


def test_dup_substrings_refuses_scale_input(spark):
    """VERDICT r06 next #7: the per-char window hasher enforces its
    sf-scale-only contract loudly, pointing at the chunk-granularity
    production twin — same policy as similarity.brute_force_pairs."""
    import pytest

    with pytest.raises(ValueError, match="chunk_dup_spans"):
        Q.q_dup_substrings(spark, SF, max_bytes=10)
    # default threshold comfortably admits the test corpora
    assert Q.q_dup_substrings(spark, SF).count() > 0
