#!/usr/bin/env python
"""Build a driver-scale timing dataset (sf1.0-like) from sf0.1.

The driver's round-end MEASUREMENT runs at a larger, driver-generated sf
(BENCH_r07: sf=1.0 — 10x documents/embeddings), which we cannot read. For
optimization validation we synthesize /tmp/sfbig with the same table
shapes at 10x rows:

* documents: sf0.1 docs tiled 10x; replica k>0 prefixes every token with
  "r{k}" so gram sets are DISJOINT across replicas — near-dup structure
  (and so candidate-pair volume) scales ~linearly with docs, like a real
  corpus of 10x the families, instead of exploding quadratically the way
  verbatim tiling would. doc_id offset 100000*k preserves the %2/%10
  parity classes several queries split snapshots on.
* embeddings: originals + 9 replicas drawn N(mean, std) per-dim from the
  originals' empirical moments (near-orthogonal, realistic ANN bucket
  spread), vec_id offset 100000*k, labels resampled.
* all other tables: copied from sf0.1 (their queries are sub-second and
  not optimization targets).

Timing-only artifact: never used by the driver, tests, or bench.py.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SFBIG_DIR", "/tmp/sfbig")
REPLICAS = int(os.environ.get("SFBIG_REPLICAS", "10"))
OFF = 100_000


def main() -> None:
    os.makedirs(DST, exist_ok=True)

    docs = pq.read_table(f"{SRC}/documents.parquet")
    doc_id = docs.column("doc_id").to_numpy()
    text = docs.column("text").to_pylist()
    lang = docs.column("lang").to_pylist()
    source = docs.column("source").to_pylist()

    out_id, out_text, out_lang, out_src = [], [], [], []
    for k in range(REPLICAS):
        if k == 0:
            rep_text = text
        else:
            pre = f"r{k}"
            rep_text = [
                " ".join(f"{pre}{w}" for w in t.split(" ")) for t in text
            ]
        out_id.extend((doc_id + OFF * k).tolist())
        out_text.extend(rep_text)
        out_lang.extend(lang)
        out_src.extend(source)
    n_chars = [len(t) for t in out_text]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "text": pa.array(out_text, pa.string()),
                "lang": pa.array(out_lang, pa.string()),
                "source": pa.array(out_src, pa.string()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        ),
        f"{DST}/documents.parquet",
    )
    print(f"documents: {len(out_id)} rows")

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = emb.column("vec_id").to_numpy()
    mat = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    labels = emb.column("label").to_numpy()
    mu, sd = mat.mean(axis=0), mat.std(axis=0)
    rng = np.random.default_rng(8)

    ids, mats, labs = [vec_id], [mat], [labels]
    for k in range(1, REPLICAS):
        ids.append(vec_id + OFF * k)
        mats.append(
            (mu + sd * rng.standard_normal(mat.shape)).astype(np.float32)
        )
        labs.append(rng.choice(labels, size=len(labels)))
    allmat = np.concatenate(mats)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.concatenate(ids), pa.int64()),
                "embedding": pa.array(
                    list(allmat), pa.list_(pa.float32())
                ),
                "label": pa.array(
                    np.concatenate(labs).astype(np.int32), pa.int32()
                ),
            }
        ),
        f"{DST}/embeddings.parquet",
    )
    print(f"embeddings: {len(allmat)} rows")

    for f in os.listdir(SRC):
        if f in ("documents.parquet", "embeddings.parquet", "_DONE"):
            continue
        shutil.copy(os.path.join(SRC, f), os.path.join(DST, f))
    open(os.path.join(DST, "_DONE"), "w").close()
    print(f"done -> {DST}")


if __name__ == "__main__":
    main()
