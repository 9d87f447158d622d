"""Targeted tests for the round-6 batch-3 queries (oracle parity itself is
covered for every registry entry by test_entry.py).

* lsh_eval_metrics — the north-star dup-pair recall >= 0.99 contract,
  asserted on the driver corpus itself.
* edit_sim_pairs — the length-gap prefilter is exact-preserving (the
  unfiltered computation returns the same pair set).
* dir_merkle — identical directories (same contents, same order) share a
  Merkle root; order or content changes break it.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from libchunk_spark import queries as Q


def test_lsh_eval_recall_floor_for_demo_config(spark):
    """The metric query audits the SQL-expressible DEMO LSH config
    (16 perms / 4 bands — the oracle must reproduce the sketch, so the
    128-perm production UDF config can't be used here). Measured 1.00 at
    sf0.001, sf0.01 AND sf0.1 after the perm-family fix (mod 2^31-1,
    genuinely min-wise — the earlier 0.96 reading included a truth pair
    the order-correlated family missed; see minhash_calibration) — floor
    0.9 with margin. The production config's north-star >= 0.99 floor is
    pinned separately in test_recall.py (measured 1.00)."""
    row = Q.q_lsh_eval_metrics(spark, "/root/testdata/sf0.01").collect()[0]
    assert row["tp"] + row["fn"] > 0  # ground truth is non-trivial
    assert row["recall"] >= 0.9, row
    # consistency: counts reconcile with the component queries
    n_truth = Q.q_ngram_jaccard_pairs(spark, "/root/testdata/sf0.01").count()
    n_cand = Q.q_lsh_band_pairs(spark, "/root/testdata/sf0.01").count()
    assert row["tp"] + row["fn"] == n_truth
    assert row["tp"] + row["fp"] == n_cand


def test_edit_sim_length_prefilter_is_exact_preserving(spark):
    """|len_a - len_b| <= (1-t)*max(len) is implied by edit_sim >= t
    (length gap lower-bounds Levenshtein distance), so the prefiltered
    query must return exactly the pairs the unfiltered computation keeps."""
    sf = "/root/testdata/sf0.01"
    got = {
        (r["a"], r["b"], r["dist"], r["edit_sim"])
        for r in Q.q_edit_sim_pairs(spark, sf).collect()
    }
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text", F.length("text").alias("ln")
    )
    unfiltered = (
        Q.q_lsh_band_pairs(spark, sf)
        .join(
            docs.select(
                F.col("doc_id").alias("a"),
                F.col("text").alias("ta"),
                F.col("ln").alias("la"),
            ),
            "a",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("b"),
                F.col("text").alias("tb"),
                F.col("ln").alias("lb"),
            ),
            "b",
        )
        .withColumn("dist", F.levenshtein("ta", "tb").cast("long"))
        .withColumn(
            "edit_sim",
            F.round(1 - F.col("dist") / F.greatest("la", "lb"), 4),
        )
        .where(F.col("edit_sim") >= Q.EDIT_SIM_THRESHOLD)
    )
    want = {
        (r["a"], r["b"], r["dist"], r["edit_sim"])
        for r in unfiltered.collect()
    }
    assert got == want and got  # identical AND non-trivial


def test_cluster_stats_reconciles_with_edges_and_components(spark):
    """Every candidate edge is intra-cluster by construction (components
    are BUILT from these edges), so the per-cluster edge counts must sum
    to the total edge count, every density lies in (0, 1], and every
    non-singleton component appears exactly once."""
    sf = "/root/testdata/sf0.01"
    rows = Q.q_cluster_stats(spark, sf).collect()
    assert rows
    n_edges_total = Q.q_lsh_band_pairs(spark, sf).count()
    assert sum(r["n_edges"] for r in rows) == n_edges_total
    assert all(0 < r["density"] <= 1.0 for r in rows)
    assert all(r["n_edges"] >= r["n_docs"] - 1 for r in rows)  # connected
    comps = len(set(r["component"] for r in rows))
    assert comps == len(rows)


def _write_docs(spark, tmp_path, rows):
    path = os.path.join(str(tmp_path), "planted")
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    return path


def test_dir_merkle_identical_dirs_share_root(spark, tmp_path):
    """Planted corpus: r1/dir0 and r2/dir0 hold the same two file contents
    in the same doc_id order -> same Merkle root (dedup by one group-by on
    the root, location-independent). r3/dir0 holds them in SWAPPED order ->
    different root (the tree hash is ordered, like a real directory
    manifest). All six files' contents appear >= 2 times -> fully shared."""
    fan = Q.DIR_FANOUT
    rows = [
        (0 * fan, "content A", "r1"),
        (1 * fan, "content B", "r1"),
        (2 * fan, "content A", "r2"),
        (3 * fan, "content B", "r2"),
        (4 * fan, "content B", "r3"),  # swapped order
        (5 * fan, "content A", "r3"),
    ]
    path = _write_docs(spark, tmp_path, rows)
    out = {
        r["source"]: r for r in Q.q_dir_merkle(spark, path).collect()
    }
    assert set(out) == {"r1", "r2", "r3"}
    assert all(r["dirname"] == 0 and r["n_files"] == 2 for r in out.values())
    assert out["r1"]["merkle"] == out["r2"]["merkle"]
    assert out["r1"]["merkle"] != out["r3"]["merkle"]
    assert all(r["n_shared"] == 2 for r in out.values())


def test_clone_type2_canon_udf_equals_old_expression(spark):
    """VERDICT r06 next #3: the O(tokens) factorize-based canonicalization
    must be byte-identical to the r6 O(tokens^2) array_position-in-
    transform expression — on the driver corpus AND on adversarial token
    shapes (repeats before/after, duplicate-then-new, empty tokens from
    double/trailing/leading spaces, empty string, single token)."""
    from libchunk_spark.functions.udfs import make_type2_canon_udf

    tricky = [
        (0, "a b a"),
        (1, "a a b"),
        (2, "x y x"),
        (3, "a  b"),        # double space -> empty middle token
        (4, "a b "),        # trailing space -> empty last token
        (5, " a b"),        # leading space -> empty first token
        (6, ""),            # empty text -> one empty token
        (7, "solo"),
        (8, "t t t t t"),
        (9, "p q r q p r p"),
    ]
    docs = spark.createDataFrame(tricky, "doc_id long, text string").unionByName(
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .select("doc_id", "text")
        .withColumn("doc_id", F.col("doc_id") + 1000)
    )
    t = F.split(F.col("text"), " ")
    old = F.concat_ws(
        " ", F.transform(t, lambda x: F.array_position(t, x).cast("string"))
    )
    new = make_type2_canon_udf()(F.col("text"))
    bad = (
        docs.select("doc_id", old.alias("old"), new.alias("new"))
        .where(F.col("old") != F.col("new"))
        .collect()
    )
    assert bad == [], f"canon mismatch on {bad[:5]}"


def test_clone_type2_long_doc_linear_smoke(spark):
    """A 100k-token doc (10^10 comparisons under the old expression — would
    crawl for minutes in one task) must canonicalize in seconds on the new
    path, matching a pure-python first-occurrence reference."""
    import time

    import numpy as np

    from libchunk_spark.functions.udfs import make_type2_canon_udf

    rng = np.random.default_rng(4)
    toks = rng.integers(0, 5000, 100_000).astype(str).tolist()
    text = " ".join(toks)
    first: dict[str, int] = {}
    want = []
    for i, tok in enumerate(toks):
        first.setdefault(tok, i + 1)
        want.append(str(first[tok]))
    t0 = time.time()
    got = (
        spark.createDataFrame([(1, text)], "doc_id long, text string")
        .select(make_type2_canon_udf()(F.col("text")).alias("canon"))
        .collect()[0]["canon"]
    )
    took = time.time() - t0
    assert got == " ".join(want)
    assert took < 30, f"100k-token canonicalization took {took:.1f}s"
