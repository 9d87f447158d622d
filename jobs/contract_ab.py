#!/usr/bin/env python
"""Contraction on/off A/B -> BENCH/contract_ab_r6.json.

VERDICT r05 next #3: `components` and `pipeline_cluster` moved +29% in
round 5 — the only operator whose code changed that round was the CC
contraction pre-pass. Round 6 replaced the pre-pass kernel entirely
(vectorized _contract_block); this measures, IN ONE SESSION with
interleaved arms, whether the pre-pass pays for itself at bench scale:

  arm A  connected_components(contract=True)   (production default)
  arm B  connected_components(contract=False)  (pre-pass skipped)

on both bench workloads: the sf0.1 documents band edges (the `components`
driver query's input) and the 60k-file synthetic corpus pipeline edges
(the `pipeline_cluster` phase's input, built once outside the timed
region). Interleaved A/B/A/B..., best-of-N per arm — host drift lands on
both arms.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> None:
    from pyspark.sql import functions as F

    from libchunk_spark import queries as Q
    from libchunk_spark.config import CORPUS_PIPELINE_CONFIG as CCFG
    from libchunk_spark.fixtures import generate_corpus_fast
    from libchunk_spark.operators.components import connected_components
    from libchunk_spark.operators.fused import chunk_and_sign
    from libchunk_spark.operators.lsh import (
        minhash_candidate_edges,
        simhash_candidate_edges,
    )
    from libchunk_spark.operators.sign import sign
    from libchunk_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_AB_REPEATS", "3"))

    spark = get_spark(app="contract-ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    warm = spark.createDataFrame(
        [(i, "warm up text " * 20) for i in range(cpus * 8)],
        "file_id long, content string",
    ).repartition(cpus)
    sign(warm, CCFG).agg(F.sum("n_shingles")).collect()

    # workload 1: the `components` driver query's edges (sf0.1 documents)
    doc_edges = Q.q_lsh_band_pairs(spark, sf_dir).select("a", "b").localCheckpoint()
    doc_nodes = (
        Q._docs(spark, sf_dir)
        .select(F.col("doc_id").alias("file_id"))
        .localCheckpoint()
    )

    # workload 2: the `pipeline_cluster` phase's edges (60k-file corpus),
    # built ONCE outside the timed region exactly as bench.py builds them
    rows = generate_corpus_fast(60000, seed=42)
    corpus = (
        spark.createDataFrame(rows, "file_id long, content string")
        .repartition(cpus * 2)
        .cache()
    )
    corpus.count()
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="contract_ab_")
    fused_path = os.path.join(tmp, "fused")
    chunk_and_sign(corpus, CCFG).write.mode("overwrite").parquet(fused_path)
    fused = spark.read.parquet(fused_path)
    sigs = fused.where(F.col("pos") == 0).select(
        "file_id", "minhash", "simhash", "bands", "n_shingles"
    )
    pipe_edges = (
        minhash_candidate_edges(sigs, CCFG)
        .unionByName(simhash_candidate_edges(sigs, CCFG))
        .localCheckpoint()
    )
    pipe_nodes = corpus.select("file_id").localCheckpoint()

    workloads = {
        "components_sf": (doc_edges, doc_nodes),
        "pipeline_cluster_60k": (pipe_edges, pipe_nodes),
    }
    results: dict[str, dict] = {w: {"on": [], "off": []} for w in workloads}
    counts: dict[str, dict] = {}
    try:
        for rep in range(repeats):
            for wname, (edges, nodes) in workloads.items():
                for arm, flag in (("on", True), ("off", False)):
                    t0 = time.time()
                    n = (
                        connected_components(
                            edges, all_nodes=nodes, contract=flag
                        )
                        .select("component")
                        .distinct()
                        .count()
                    )
                    sec = round(time.time() - t0, 3)
                    results[wname][arm].append(sec)
                    counts.setdefault(wname, {})[arm] = n
                    print(json.dumps({"rep": rep, "workload": wname,
                                      "contract": flag, "sec": sec,
                                      "n_clusters": n}))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    summary = {}
    for wname, arms in results.items():
        assert counts[wname]["on"] == counts[wname]["off"], (
            wname, counts[wname])  # identical clustering both arms
        on, off = min(arms["on"]), min(arms["off"])
        summary[wname] = {
            "contract_on_best": on,
            "contract_off_best": off,
            "on_over_off": round(on / off, 3),
            "n_clusters": counts[wname]["on"],
            "raw": arms,
        }
    out = {
        "design": "one session, interleaved on/off arms, best-of-%d" % repeats,
        "sf_dir": sf_dir,
        "cpus": cpus,
        "workloads": summary,
    }
    with open(os.path.join(REPO, "BENCH", "contract_ab_r6.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({w: {k: v for k, v in s.items() if k != "raw"}
                      for w, s in summary.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
