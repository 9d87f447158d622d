#!/usr/bin/env python
"""Winnow gram-hasher A/B (md5 vs xxhash64) -> BENCH/winnow_hash_ab_r6.json.

The per-gram hash dominates winnowing's fingerprint stage (one hash per
character position). The oracle-checked registry queries must keep the
portable md5 construction (DuckDB runs the identical expression), but the
production pipeline edge source (winnow_candidate_edges) has no
cross-engine oracle, so round 6 switched its default to Spark's codegen'd
xxhash64 intrinsic. This job measures what that switch buys, in ONE
session with interleaved arms (host drift lands on both):

  arm md5       winnow_fingerprints(..., hasher="md5")
  arm xxhash64  winnow_fingerprints(..., hasher="xxhash64")

on two workloads: the sf0.1 documents table (the registry query's input)
and the 60k-file synthetic source-code corpus (the pipeline's input,
built once outside the timed region). Timed action = count() of the
distinct (id, fp) rows — selection ends in .distinct(), so the count
forces every hash; nothing is pruned.
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
    from libchunk_spark.operators.sign import sign
    from libchunk_spark.operators.winnow import winnow_fingerprints
    from libchunk_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_AB_REPEATS", "3"))

    spark = get_spark(app="winnow-hash-ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    warm = spark.createDataFrame(
        [(i, "warm up text " * 20) for i in range(cpus * 8)],
        "file_id long, content string",
    ).repartition(cpus)
    sign(warm, CCFG).agg(F.sum("n_shingles")).collect()

    docs = (
        Q._docs(spark, sf_dir)
        .select(F.col("doc_id").alias("id"), F.col("text").alias("txt"))
        .repartition(cpus)
        .cache()
    )
    docs.count()
    rows = generate_corpus_fast(60000, seed=42)
    corpus = (
        spark.createDataFrame(rows, "file_id long, content string")
        .select(F.col("file_id").alias("id"), F.col("content").alias("txt"))
        .repartition(cpus * 2)
        .cache()
    )
    corpus.count()

    workloads = {"documents_sf": docs, "corpus_60k": corpus}
    results: dict[str, dict] = {w: {"md5": [], "xxhash64": []} for w in workloads}
    counts: dict[str, dict] = {}
    for rep in range(repeats):
        for wname, df in workloads.items():
            for hasher in ("md5", "xxhash64"):
                t0 = time.time()
                n = winnow_fingerprints(
                    df, id_col="id", text_col="txt", hasher=hasher
                ).count()
                sec = round(time.time() - t0, 3)
                results[wname][hasher].append(sec)
                counts.setdefault(wname, {})[hasher] = n
                print(json.dumps({"rep": rep, "workload": wname,
                                  "hasher": hasher, "sec": sec, "fp_rows": n}))

    summary = {}
    for wname, arms in results.items():
        md5, xx = min(arms["md5"]), min(arms["xxhash64"])
        summary[wname] = {
            "md5_best": md5,
            "xxhash64_best": xx,
            "speedup": round(md5 / xx, 2),
            "fp_rows": counts[wname],
            "raw": arms,
        }
    out = {
        "design": "one session, interleaved hasher arms, best-of-%d" % repeats,
        "sf_dir": sf_dir,
        "cpus": cpus,
        "workloads": summary,
    }
    with open(os.path.join(REPO, "BENCH", "winnow_hash_ab_r6.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({w: {k: v for k, v in s.items() if k != "raw"}
                      for w, s in summary.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
