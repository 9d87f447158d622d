"""Deterministic synthetic source-code corpus with planted duplicate structure.

Shape fixed by BASELINE.json input_hint:
    (repo string, path string, commit string, lang string, content string)

Planted structure (FIXTURES.md §1), all seeded — no external data:
* exact duplicates   — identical content under different (repo, path);
* near-duplicates    — k-edit line mutations at 1–10% edit ratio (MinHash);
* fuzzy duplicates   — identifier renames (SimHash);
* containment        — file A embedded verbatim inside larger file B;
* boilerplate skew   — one license header shared by ~30% of files
                       (exercises band-bucket skew handling).

Ground truth: `family` column — files mutated from the same base file share
a family id (the generator's intent; the *oracle* in oracle.py defines the
measured truth via exact Jaccard at the pipeline's shingle config).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

LANGS = ["py", "go", "js", "java", "c"]
_EXT = {"py": "py", "go": "go", "js": "js", "java": "java", "c": "c"}

_KEYWORDS = {
    "py": ["def", "return", "class", "import", "for", "if", "else", "with", "yield"],
    "go": ["func", "return", "type", "import", "for", "if", "else", "go", "defer"],
    "js": ["function", "return", "class", "import", "for", "if", "else", "const", "let"],
    "java": ["void", "return", "class", "import", "for", "if", "else", "public", "static"],
    "c": ["int", "return", "struct", "include", "for", "if", "else", "static", "void"],
}

_LICENSE = (
    "// Copyright (c) 2016 The Synthetic Authors. All rights reserved.\n"
    "// Use of this source code is governed by a BSD-style license that can\n"
    "// be found in the LICENSE file of this repository tree.\n\n"
)


@dataclass
class CorpusRow:
    file_id: int
    repo: str
    path: str
    commit: str
    lang: str
    content: str
    family: int  # generator ground-truth: base-file lineage
    kind: str  # base | exact | near | fuzzy | container


def _identifiers(rng: np.random.Generator, n: int) -> list[str]:
    syll = ["foo", "bar", "baz", "qux", "data", "node", "hash", "key", "buf",
            "pos", "len", "idx", "tmp", "val", "ctx", "cfg", "out", "err"]
    return [
        f"{syll[rng.integers(len(syll))]}_{syll[rng.integers(len(syll))]}{rng.integers(100)}"
        for _ in range(n)
    ]


def _gen_line(rng: np.random.Generator, lang: str, idents: list[str]) -> str:
    kw = _KEYWORDS[lang]
    shape = rng.integers(4)
    a = idents[rng.integers(len(idents))]
    b = idents[rng.integers(len(idents))]
    c = idents[rng.integers(len(idents))]
    k = kw[rng.integers(len(kw))]
    if shape == 0:
        return f"{k} {a}({b}, {c}) {{"
    if shape == 1:
        return f"    {a} = {b}.{c}({int(rng.integers(1000))})"
    if shape == 2:
        return f"    {k} {a} < {b} && {c} != {int(rng.integers(100))}"
    return f"    {k} {a}[{int(rng.integers(64))}] ^ {b}"


def _gen_base(rng: np.random.Generator, lang: str, n_lines: int, boiler: bool) -> str:
    idents = _identifiers(rng, 12)
    lines = [_gen_line(rng, lang, idents) for _ in range(n_lines)]
    head = _LICENSE if boiler else ""
    return head + "\n".join(lines) + "\n"


def _mutate_lines(rng: np.random.Generator, content: str, edit_ratio: float) -> str:
    """k-edit near-duplicate: insert/delete/replace whole lines."""
    lines = content.split("\n")
    idents = _identifiers(rng, 8)
    n_edits = max(1, int(len(lines) * edit_ratio))
    for _ in range(n_edits):
        op = rng.integers(3)
        i = int(rng.integers(len(lines)))
        if op == 0 and len(lines) > 4:
            del lines[i]
        elif op == 1:
            lines.insert(i, _gen_line(rng, "py", idents))
        else:
            lines[i] = _gen_line(rng, "py", idents)
    return "\n".join(lines)


def _rename_identifiers(rng: np.random.Generator, content: str) -> str:
    """Fuzzy duplicate: token-level identifier rewrites (SimHash target)."""
    tokens = content.split(" ")
    new = _identifiers(rng, 4)
    # rename the most frequent space-delimited alnum tokens
    from collections import Counter

    freq = Counter(t for t in tokens if t.replace("_", "").isalnum() and len(t) > 3)
    mapping = {old: new[i % len(new)] for i, (old, _) in enumerate(freq.most_common(4))}
    return " ".join(mapping.get(t, t) for t in tokens)


def generate_corpus(
    n_files: int = 200,
    seed: int = 42,
    min_lines: int = 20,
    max_lines: int = 400,
    dup_fraction: float = 0.45,
    boiler_fraction: float = 0.3,
) -> list[CorpusRow]:
    """Seeded corpus with ~dup_fraction of rows derived from earlier bases."""
    rng = np.random.default_rng(seed)
    rows: list[CorpusRow] = []
    bases: list[CorpusRow] = []
    for i in range(n_files):
        lang = LANGS[int(rng.integers(len(LANGS)))]
        repo = f"org{int(rng.integers(7))}/repo{int(rng.integers(50))}"
        name = f"src/pkg{int(rng.integers(20))}/mod{int(rng.integers(99))}.{_EXT[lang]}"
        commit = "".join(f"{b:02x}" for b in rng.integers(0, 256, 20, dtype=np.uint8))
        make_dup = bases and rng.random() < dup_fraction
        if not make_dup:
            n_lines = int(rng.integers(min_lines, max_lines))
            content = _gen_base(rng, lang, n_lines, rng.random() < boiler_fraction)
            row = CorpusRow(i, repo, name, commit, lang, content, family=i, kind="base")
            bases.append(row)
        else:
            base = bases[int(rng.integers(len(bases)))]
            kind = ["exact", "near", "fuzzy", "container"][int(rng.integers(4))]
            if kind == "exact":
                content = base.content
            elif kind == "near":
                ratio = float(rng.uniform(0.01, 0.10))
                content = _mutate_lines(rng, base.content, ratio)
            elif kind == "fuzzy":
                content = _rename_identifiers(rng, base.content)
            else:  # container: base embedded verbatim in new filler
                filler = _gen_base(rng, base.lang, int(rng.integers(10, 60)), False)
                cutpos = len(filler) // 2
                content = filler[:cutpos] + base.content + filler[cutpos:]
            row = CorpusRow(i, repo, name, commit, base.lang, content,
                            family=base.family, kind=kind)
        rows.append(row)
    return rows


def corpus_to_spark(spark, rows: list[CorpusRow]):
    """Corpus rows as a DataFrame in input_hint shape (+ file_id, family, kind)."""
    return spark.createDataFrame(
        [
            (r.file_id, r.repo, r.path, r.commit, r.lang, r.content, r.family, r.kind)
            for r in rows
        ],
        "file_id long, repo string, path string, commit string, lang string, "
        "content string, family long, kind string",
    )


def documents_as_corpus(spark, sf_dir: str):
    """Driver `documents` table mapped to the corpus shape (FIXTURES.md §6).

    Scans via read_parallel: the single-row-group file otherwise feeds the
    signature UDF one partition (single-task map side)."""
    from pyspark.sql import functions as F

    from libchunk_spark.scan import read_parallel

    return (
        read_parallel(spark, f"{sf_dir}/documents.parquet")
        .select(
            F.col("doc_id").alias("file_id"),
            F.col("source").alias("repo"),
            F.col("doc_id").cast("string").alias("path"),
            F.lit("-").alias("commit"),
            F.col("lang"),
            F.col("text").alias("content"),
        )
    )


def generate_corpus_fast(
    n_files: int,
    seed: int = 42,
    min_lines: int = 40,
    max_lines: int = 240,
    vocab_lines: int = 20000,
    dup_fraction: float = 0.3,
) -> "list[tuple[int, str]]":
    """Large benchmark corpus, vectorized: (file_id, content) tuples.

    Files are sampled from a shared line vocabulary (realistic cross-file
    shingle overlap); dup_fraction of files reuse an earlier file's line
    index array with a few perturbations (near-duplicate structure). Orders
    of magnitude faster than generate_corpus — used for throughput/scaling
    benchmarks where ground truth isn't needed.
    """
    rng = np.random.default_rng(seed)
    idents = _identifiers(rng, 40)
    vocab = np.array(
        [_gen_line(rng, LANGS[i % len(LANGS)], idents) for i in range(2000)]
        * (vocab_lines // 2000 + 1),
        dtype=object,
    )[:vocab_lines]
    out: list[tuple[int, str]] = []
    kept: list[np.ndarray] = []
    for i in range(n_files):
        if kept and rng.random() < dup_fraction:
            base = kept[int(rng.integers(len(kept)))]
            idx = base.copy()
            for _ in range(max(1, len(idx) // 50)):
                idx[int(rng.integers(len(idx)))] = int(rng.integers(vocab_lines))
        else:
            n = int(rng.integers(min_lines, max_lines))
            idx = rng.integers(0, vocab_lines, size=n)
            kept.append(idx)
        out.append((i, "\n".join(vocab[idx]) + "\n"))
    return out
