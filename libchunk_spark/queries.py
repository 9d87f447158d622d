"""Driver-contract queries: Spark implementation + DuckDB oracle SQL pairs.

Every entry here is one operator/capability from SURVEY.md §2 (or a
training-data pipeline op layered on top), expressed twice:

* a Spark DataFrame program over /root/testdata/sf*/ parquet tables;
* the equivalent ANSI SQL for DuckDB, sharing the exact same constants
  (MinHash permutations, stopword lists, thresholds) so value hashes match.

Column-name parity matters: the driver sorts columns by name and hashes
values, so every computed column is aliased identically on both sides.
Chunker-dependent queries (content-defined cuts) cannot be expressed in SQL
and are registered without an oracle (rows-only check).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from libchunk_spark.config import DOCS_CONFIG
from libchunk_spark.operators.assemble import assemble
from libchunk_spark.operators.split import split
from libchunk_spark.scan import read_parallel

# ---------------------------------------------------------------- constants

# Affine MinHash over h31 = h mod 2^31: mh = (a*h31 + b) mod P61.
# Constants deterministic (seeded) and baked into both Spark and SQL sides.
# Perm-field modulus: 2^31-1 (Mersenne prime). Gram hashes reduce into
# [0, p) FIRST, so a*h+b (< 2^62, int64-safe in both engines) wraps mod p
# ~a times per evaluation — a genuinely min-wise universal family. The
# previous modulus (2^61-1) over 31-bit inputs almost never wrapped, so
# every "permutation" preserved raw-hash order and the 16 perms were one
# permutation in disguise: any two docs sharing their minimum-hash gram
# read est = 1.0 regardless of true Jaccard. Caught by the
# minhash_calibration audit query (mean |est - jac| was 0.645; honest
# perms read ~0.02).
MH_PRIME = 2147483647  # 2^31 - 1
N_PERMS_SQL = 16
BAND_ROWS_SQL = 4  # -> 4 bands


def _perm_constants() -> list[tuple[int, int, int]]:
    """(perm, a, b) — tiny deterministic LCG so both engines share
    literals; a in [1, p-1] (never 0 mod p), b in [0, p)."""
    out = []
    x = 0x5EC12E7
    for i in range(N_PERMS_SQL):
        x = (1103515245 * x + 12345) % (1 << 31)
        a = (x % (MH_PRIME - 1)) + 1
        x = (1103515245 * x + 12345) % (1 << 31)
        b = x % MH_PRIME
        out.append((i, a, b))
    return out


STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]

# crude n-gram language-ID marker words (deterministic heuristic, both sides)
LANG_MARKERS = {
    "en": ["the", "and", "is"],
    "de": ["der", "und", "ist"],
    "fr": ["le", "et", "est"],
}

NGRAM_JACCARD_THRESHOLD = 0.2
COSINE_THRESHOLD = 0.3  # ~99th pct of the driver embeddings' pair sims


def _docs(spark: SparkSession, sf_dir: str, spread: bool = True) -> DataFrame:
    """spread=False skips the scan-parallelism repartition (see _emb):
    right for queries whose map side is trivial (length stats, per-doc
    sha, rank windows) or whose driver-visible count() is join-eliminated
    down to the scan — there the spread exchange is pure added cost, while
    gram/signature/UDF consumers win 2-10x from it."""
    if not spread:
        return spark.read.parquet(f"{sf_dir}/documents.parquet")
    return read_parallel(spark, f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str, spread: bool = True) -> DataFrame:
    """spread=False skips the scan-parallelism repartition: right for
    consumers whose FIRST operation is itself a shuffle (e.g. the sign-LSH
    bucket window) — there the spread just moves the payload twice
    (measured +36% on ann_signlsh at 10x scale), while map-heavy consumers
    (matmul/encode UDFs) win big from it."""
    if not spread:
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return read_parallel(spark, f"{sf_dir}/embeddings.parquet")


def _docs_corpus(
    spark: SparkSession, sf_dir: str, spread: bool = True
) -> DataFrame:
    return _docs(spark, sf_dir, spread=spread).select(
        F.col("doc_id").alias("file_id"), F.col("text").alias("content")
    )


# ------------------------------------------------------------ text helpers

def _tokens():
    return F.split(F.col("text"), " ")


def _grams3_of(t: Column) -> Column:
    """word 3-gram array (distinct), empty when < 3 tokens, built from an
    ALREADY-MATERIALIZED token-array column. Catalyst performs no common-
    subexpression elimination inside higher-order-function lambdas, so if
    `t` is the inline split(text) expression the transform lambda re-splits
    the ENTIRE text once per gram — O(tokens^2) characters per doc (the
    winnowing O(n^2) md5 lesson, CLAUDE.md). Callers stage the token array
    with _gram_rows; the multiply-referenced non-cheap alias also blocks
    CollapseProject from fusing the split back into the lambda."""
    return F.when(
        F.size(t) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 3),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, 3)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _grams3():
    """Single-expression word-3gram array (tests/short texts only — in a
    query use _gram_rows: this inline form re-splits per gram, see
    _grams3_of)."""
    return _grams3_of(_tokens())


def _gram_rows(df: DataFrame, *cols: str) -> DataFrame:
    """(cols..., gram) exploded distinct word-3grams of df.text with the
    token array staged as its own projection first (split runs once per
    doc, not once per gram)."""
    staged = df.select(*cols, _tokens().alias("_t"))
    return staged.select(
        *cols, F.explode(_grams3_of(F.col("_t"))).alias("gram")
    )

# portable 60-bit gram hash: first 15 hex chars of md5 (identical in DuckDB)
def _h60(col):
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


_SQL_GRAMS3 = """
    SELECT doc_id, array_to_string(t[i:i+2], ' ') AS gram
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
    GROUP BY doc_id, gram
"""

_SQL_H60 = "CAST(('0x' || substr(md5(gram), 1, 15)) AS UBIGINT)::BIGINT"


# ----------------------------------------------------------------- queries


def q_exact_dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups by content sha256 (libchunk whole-stream identity)."""
    return (
        _docs(spark, sf_dir, spread=False)
        .groupBy(F.sha2(F.encode("text", "UTF-8"), 256).alias("content_sha"))
        .agg(
            F.count("*").alias("n_files"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


SQL_EXACT_DUP_GROUPS = """
SELECT sha256(text) AS content_sha,
       count(*) AS n_files,
       min(doc_id) AS min_doc_id
FROM documents
GROUP BY 1
"""


def q_round_trip_sha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full split→index→join→reassemble; output must equal sha256(text).

    The DuckDB oracle computes sha256(text) directly — matching hashes prove
    the whole put/get path end-to-end (bits/get_test.go:182-191 analog).
    """
    corpus = _docs_corpus(spark, sf_dir)
    # materialize=False: A/B'd neutral here (5.2 s vs 5.3 s at 10x scale)
    # — the assembly join dominates, and storing chunk payloads costs as
    # much as the second chunker pass saves (containment_pairs, whose
    # derived corpus is 4x-instantiated, is where materialize pays).
    res = split(corpus, DOCS_CONFIG.chunk)
    ar = assemble(res.file_keys, res.chunk_index)
    return ar.assembled.select(
        F.col("file_id").alias("doc_id"),
        F.col("reassembled_sha256").alias("content_sha"),
    )


SQL_ROUND_TRIP_SHA = "SELECT doc_id, sha256(text) AS content_sha FROM documents"


def q_move_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keys to push = local content keys minus remote index (bits.Move).

    Remote := docs with doc_id % 3 == 0 (already pushed); key = content sha.
    """
    docs = _docs(spark, sf_dir).withColumn(
        "k", F.sha2(F.encode("text", "UTF-8"), 256)
    )
    local = docs.where(F.col("doc_id") % 3 != 0).select("k").distinct()
    remote = docs.where(F.col("doc_id") % 3 == 0).select("k").distinct()
    return local.join(F.broadcast(remote), "k", "left_anti")


SQL_MOVE_SKIP = """
SELECT DISTINCT sha256(text) AS k
FROM documents WHERE doc_id % 3 <> 0
  AND sha256(text) NOT IN (SELECT sha256(text) FROM documents WHERE doc_id % 3 = 0)
"""


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality ratios (training-data text analysis)."""
    toks = _tokens()
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.length("text").alias("n_chars_q"),
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).alias(
            "n_stopwords"
        ),
        F.round(
            F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
            / F.size(toks),
            4,
        ).alias("stop_ratio"),
    )


SQL_TOKEN_STATS = f"""
SELECT doc_id,
       length(text) AS n_chars_q,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_filter(string_split(text, ' '),
           t -> list_contains({STOPWORDS!r}, t))) AS n_stopwords,
       round(len(list_filter(string_split(text, ' '),
           t -> list_contains({STOPWORDS!r}, t)))
           / CAST(len(string_split(text, ' ')) AS DOUBLE), 4) AS stop_ratio
FROM documents
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID heuristic (same CASE logic both sides)."""
    toks = _tokens()

    def marker_count(markers: list[str]):
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    counts = {lang: marker_count(m) for lang, m in LANG_MARKERS.items()}
    pred = (
        F.when(
            (counts["en"] >= counts["de"]) & (counts["en"] >= counts["fr"]), "en"
        )
        .when(counts["de"] >= counts["fr"], "de")
        .otherwise("fr")
    )
    return _docs(spark, sf_dir).select("doc_id", pred.alias("lang_pred"))


def _sql_marker_count(markers: list[str]) -> str:
    return (
        f"len(list_filter(string_split(text, ' '), t -> list_contains({markers!r}, t)))"
    )


SQL_LANG_ID = f"""
SELECT doc_id,
  CASE
    WHEN {_sql_marker_count(LANG_MARKERS['en'])} >= {_sql_marker_count(LANG_MARKERS['de'])}
     AND {_sql_marker_count(LANG_MARKERS['en'])} >= {_sql_marker_count(LANG_MARKERS['fr'])} THEN 'en'
    WHEN {_sql_marker_count(LANG_MARKERS['de'])} >= {_sql_marker_count(LANG_MARKERS['fr'])} THEN 'de'
    ELSE 'fr'
  END AS lang_pred
FROM documents
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint = min 60-bit hash over char 8-grams (winnowing-lite)."""
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length("text") - 7, F.lit(1))),
                    lambda i: F.col("text").substr(i, F.lit(8)),
                )
            ).alias("gram"),
        )
        .groupBy("doc_id")
        .agg(F.min(_h60(F.col("gram"))).alias("fingerprint"))
    )


SQL_DOC_FINGERPRINT = f"""
SELECT doc_id, min({_SQL_H60}) AS fingerprint
FROM (
  SELECT doc_id, substr(text, i, 8) AS gram
  FROM documents, LATERAL (SELECT unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS i)
)
GROUP BY doc_id
"""


# grams appearing in more than this many documents are excluded from the
# Jaccard computation on BOTH engines (license-header boilerplate shared by
# thousands of docs would otherwise make the gram self-join quadratic).
NGRAM_DF_CAP = 64


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3gram Jaccard pairs >= threshold over df-capped grams.

    Semantics: Jaccard over the gram sets restricted to grams with document
    frequency <= NGRAM_DF_CAP — identical restriction in the DuckDB oracle,
    so values match. The cap bounds the gram self-join: no gram can fan out
    to more than cap^2/2 pairs, killing the boilerplate blowup at scale.

    The cap is a window count over the gram partition (not a groupBy+join):
    one exchange on gram that the l/r self-join then REUSES (ReusedExchange
    in the plan), so the expensive gram explosion is computed once, not four
    times.
    """
    from pyspark.sql import Window

    grams_all = _gram_rows(_docs(spark, sf_dir), "doc_id")
    # _grams3 is array_distinct per doc, so count over the gram partition
    # == document frequency
    grams = (
        grams_all.withColumn(
            "df", F.count("*").over(Window.partitionBy("gram"))
        )
        .where(F.col("df") <= NGRAM_DF_CAP)
        .drop("df")
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    l = grams.alias("l")
    r = grams.alias("r")
    inter = (
        l.join(r, "gram")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(
            F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b")
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("nb")), "b")
        .withColumn(
            "jac",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ),
        )
        .where(F.col("jac") >= NGRAM_JACCARD_THRESHOLD)
        .select("a", "b", "jac")
    )


SQL_NGRAM_JACCARD_PAIRS = f"""
WITH grams_all AS ({_SQL_GRAMS3}),
grams AS (
  SELECT doc_id, gram FROM grams_all
  WHERE gram IN (SELECT gram FROM grams_all GROUP BY gram
                 HAVING count(*) <= {NGRAM_DF_CAP})
),
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
  FROM grams l JOIN grams r ON l.gram = r.gram AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT a, b,
       round(inter / CAST(na.sz + nb.sz - inter AS DOUBLE), 4) AS jac
FROM inter
JOIN sizes na ON na.doc_id = a
JOIN sizes nb ON nb.doc_id = b
WHERE round(inter / CAST(na.sz + nb.sz - inter AS DOUBLE), 4) >= {NGRAM_JACCARD_THRESHOLD}
"""


NGRAM_CONTAINMENT_THRESHOLD = 0.8


def q_ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric n-gram containment pairs: max-containment
    |A∩B| / min(|A|, |B|) >= threshold over the same df-capped word-3gram
    sets as q_ngram_jaccard_pairs.

    Catches the quote-inclusion / partial-copy cases symmetric Jaccard
    misses: a short doc fully embedded in a long one has containment 1.0
    but Jaccard ~ |A|/|B|. Same bounded gram self-join (df cap reused as a
    window count), so the plan's cost envelope is identical to the Jaccard
    query; only the denominator changes.
    """
    from pyspark.sql import Window

    grams_all = _gram_rows(_docs(spark, sf_dir), "doc_id")
    grams = (
        grams_all.withColumn(
            "df", F.count("*").over(Window.partitionBy("gram"))
        )
        .where(F.col("df") <= NGRAM_DF_CAP)
        .drop("df")
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    l = grams.alias("l")
    r = grams.alias("r")
    inter = (
        l.join(r, "gram")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(
            F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b")
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("nb")), "b")
        .withColumn(
            "cont",
            F.round(F.col("inter") / F.least("na", "nb"), 4),
        )
        .where(F.col("cont") >= NGRAM_CONTAINMENT_THRESHOLD)
        .select("a", "b", "cont")
    )


SQL_NGRAM_CONTAINMENT_PAIRS = f"""
WITH grams_all AS ({_SQL_GRAMS3}),
grams AS (
  SELECT doc_id, gram FROM grams_all
  WHERE gram IN (SELECT gram FROM grams_all GROUP BY gram
                 HAVING count(*) <= {NGRAM_DF_CAP})
),
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS inter
  FROM grams l JOIN grams r ON l.gram = r.gram AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT a, b,
       round(inter / CAST(least(na.sz, nb.sz) AS DOUBLE), 4) AS cont
FROM inter
JOIN sizes na ON na.doc_id = a
JOIN sizes nb ON nb.doc_id = b
WHERE round(inter / CAST(least(na.sz, nb.sz) AS DOUBLE), 4) >= {NGRAM_CONTAINMENT_THRESHOLD}
"""


def _minhash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per doc with all N_PERMS_SQL mins as columns (mh0..mh15).

    The fastest JVM-only MinHash shape: one groupBy(doc_id) with 16 min()
    aggregates — no 16x row explosion through the shuffle and no perms join
    (the constants fold into the expressions). Map-side partial aggregation
    reduces each partition to one row per doc before the wire.
    """
    grams = _gram_rows(_docs(spark, sf_dir), "doc_id")
    h31 = (_h60(F.col("gram")) % F.lit(MH_PRIME)).alias("h31")
    aggs = [
        F.min(
            (F.lit(a) * F.col("h31") + F.lit(b)) % F.lit(MH_PRIME)
        ).alias(f"mh{i}")
        for i, a, b in _perm_constants()
    ]
    # sz = |distinct gram set| (grams are per-doc distinct already): a
    # 17th aggregate in the SAME shuffle, so calibration consumers get
    # set sizes without a second gram explode
    aggs.append(F.count("*").alias("sz"))
    return grams.select("doc_id", h31).groupBy("doc_id").agg(*aggs)


def q_minhash_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side MinHash signatures with portable md5 gram hashes.

    Built-in-operator formulation (the production path is the vectorized
    UDF in operators/sign.py): wide 16-aggregate groupBy, then stack() back
    to the (doc_id, perm, mh) shape the oracle emits.
    """
    wide = _minhash_wide(spark, sf_dir)
    stack = "stack({n}, {pairs}) as (perm, mh)".format(
        n=N_PERMS_SQL,
        pairs=", ".join(f"{i}, mh{i}" for i in range(N_PERMS_SQL)),
    )
    return wide.selectExpr("doc_id", stack)


def _sql_minhash_core() -> str:
    perm_rows = ", ".join(f"({i}, {a}, {b})" for i, a, b in _perm_constants())
    return f"""
WITH grams AS ({_SQL_GRAMS3}),
hashes AS (SELECT doc_id, {_SQL_H60} % {MH_PRIME} AS h31 FROM grams),
perms(perm, a, b) AS (VALUES {perm_rows})
SELECT doc_id, perm, min((a * h31 + b) % {MH_PRIME}) AS mh
FROM hashes CROSS JOIN perms
GROUP BY doc_id, perm
"""


SQL_MINHASH = _sql_minhash_core()


def q_lsh_band_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding over the SQL-portable MinHash → candidate pairs.

    Band signatures come straight off the wide MinHash row (md5 of the
    band's mins in perm order — byte-identical to the oracle's
    string_agg ... ORDER BY perm), so the whole path is ONE aggregation
    shuffle + the band-bucket self-join; no collect_list re-aggregation.
    """
    bands = _band_sigs(spark, sf_dir)
    l, r = bands.alias("l"), bands.alias("r")
    return (
        l.join(r, ["band", "band_sig"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )


SQL_LSH_BAND_PAIRS = f"""
WITH mh AS ({_sql_minhash_core()}),
bands AS (
  SELECT doc_id, CAST(floor(perm / {BAND_ROWS_SQL}) AS BIGINT) AS band,
         md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY perm)) AS band_sig
  FROM mh GROUP BY doc_id, 2
)
SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
FROM bands l JOIN bands r ON l.band = r.band AND l.band_sig = r.band_sig
WHERE l.doc_id < r.doc_id
"""


# Pairs must agree on >= this many whole band signatures to clear the
# supershingle tier (Henzinger's B-similarity >= 2 rule).
MIN_SHARED_BANDS = 2


def _band_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band, band_sig) — one md5 signature per band off the wide
    MinHash row; shared by q_lsh_band_pairs and q_supershingle_pairs."""
    return _band_sigs_of(_minhash_wide(spark, sf_dir))


def _band_sigs_of(wide: DataFrame) -> DataFrame:
    """band signatures from an existing wide-MinHash frame (callers that
    also join the mh columns checkpoint `wide` once and derive both)."""
    n_bands = N_PERMS_SQL // BAND_ROWS_SQL
    sigs = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col(f"mh{b * BAND_ROWS_SQL + r}").cast("string")
                    for r in range(BAND_ROWS_SQL)
                ],
            )
        )
        for b in range(n_bands)
    ]
    return wide.select(
        "doc_id", F.posexplode(F.array(*sigs)).alias("band", "band_sig")
    )


def q_supershingle_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-tier near-dup pairs: >= MIN_SHARED_BANDS whole band
    signatures agree (Broder's super-shingle construction, SEQUENCES 1997;
    the agreement->=2 decision rule is Henzinger's B-similarity, SIGIR
    2006 "Finding near-duplicate web pages").

    Banding (q_lsh_band_pairs) is the RECALL tier: one agreeing band makes
    a candidate, and at 100 TB the candidate volume is what you pay for.
    The supershingle tier upgrades candidates to near-certain duplicates
    WITHOUT touching the documents again: the same (band, band_sig)
    self-join, then a count per pair — pairs agreeing on >= 2 of the 4
    band signatures. P[band agrees] = j^4, so the >= 2-of-4 rule
    concentrates sharply around j ~ 0.7+: a verdict cheap enough to run
    inline with candidate generation (the band exchange is computed once
    and reused by both join sides — plan-asserted), precise enough that
    what clears it can skip the edit-distance/winnowing verify stage
    entirely. At scale this is the cheapest shuffle-free-beyond-banding
    precision upgrade there is: no new shuffle key, no second pass over
    text, one tiny (a, b) aggregation over rows the candidate join already
    produced.
    """
    bands = _band_sigs(spark, sf_dir)
    l, r = bands.alias("l"), bands.alias("r")
    return (
        l.join(r, ["band", "band_sig"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .agg(F.count("*").alias("n_shared_bands"))
        .where(F.col("n_shared_bands") >= MIN_SHARED_BANDS)
    )


SQL_SUPERSHINGLE_PAIRS = f"""
WITH mh AS ({_sql_minhash_core()}),
bands AS (
  SELECT doc_id, CAST(floor(perm / {BAND_ROWS_SQL}) AS BIGINT) AS band,
         md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY perm)) AS band_sig
  FROM mh GROUP BY doc_id, 2
)
SELECT l.doc_id AS a, r.doc_id AS b,
       CAST(count(*) AS BIGINT) AS n_shared_bands
FROM bands l JOIN bands r ON l.band = r.band AND l.band_sig = r.band_sig
WHERE l.doc_id < r.doc_id
GROUP BY 1, 2
HAVING count(*) >= {MIN_SHARED_BANDS}
"""


def q_simhash32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash from md5 gram hashes — JVM/SQL portable formulation.

    One groupBy(doc_id) with 32 folded vote-sum aggregates (no 32x bit-row
    explosion through the shuffle; map-side partial agg reduces each
    partition to one row per doc), then the sign bits assemble in a single
    projection. Same math as the oracle's unnest(range(32)) formulation.
    """
    grams = _gram_rows(_docs(spark, sf_dir), "doc_id")
    hashed = grams.select("doc_id", _h60(F.col("gram")).alias("h"))
    votes = [
        F.sum(
            F.when(F.expr(f"shiftright(h, {b}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(32)
    ]
    wide = hashed.groupBy("doc_id").agg(*votes)
    sig = None
    for b in range(32):
        term = F.when(
            F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return wide.select("doc_id", sig.alias("simhash32"))


SQL_SIMHASH32 = f"""
WITH grams AS ({_SQL_GRAMS3}),
hashes AS (SELECT doc_id, {_SQL_H60} AS h FROM grams),
bits AS (
  SELECT doc_id, b,
         sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM hashes, LATERAL (SELECT unnest(range(0, 32)) AS b)
  GROUP BY doc_id, b
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash32
FROM bits GROUP BY doc_id
"""
# NOTE: DuckDB integer sum() returns HUGEINT (int128); pandas renders HUGEINT
# as float so the driver's value hash diverges from Spark's LongType even when
# values are identical. Every integer sum() in an oracle MUST be cast BIGINT.


# Manku et al. WWW'07 blocked Hamming search: to find every signature pair
# within Hamming distance k, split the signature into k+1 blocks — two sigs
# within distance k must agree EXACTLY on at least one block (pigeonhole),
# so candidate generation is k+1 equality joins instead of an all-pairs
# Hamming scan. Demo constants sized to the 32-bit SQL-portable simhash;
# the production 64-bit path is operators/lsh.py::simhash_candidate_edges
# (same pigeonhole, star-fallback for identical-sig floods).
SIMHASH_BLOCKS = 4
HAMMING_RADIUS = SIMHASH_BLOCKS - 1  # pigeonhole bound for 4 blocks
_SIMHASH_BLOCK_BITS = 32 // SIMHASH_BLOCKS
_SIMHASH_BLOCK_MASK = (1 << _SIMHASH_BLOCK_BITS) - 1


def q_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with simhash32 Hamming distance <= HAMMING_RADIUS,
    found via Manku's blocked equality joins (never an all-pairs scan).

    Plan shape for 100 TB: the exploded (block, value) table shuffles ONCE
    and both self-join sides reuse that exchange (plan-asserted); the
    Hamming verify is a JVM bit_count over the candidate rows only. Block
    width must scale with corpus cardinality (8-bit blocks saturate at
    ~thousands of docs); production uses the 64-bit signature with wider
    blocks and a star fallback for identical-sig floods
    (operators/lsh.py:105). Completeness is exact by pigeonhole — unlike
    MinHash banding there is no recall distribution, so this is the
    precision tier for Charikar-sketch dedup (ref: libchunk's exact-key
    dedup generalized to near-dup bit sketches)."""
    sigs = q_simhash32(spark, sf_dir)
    blocks = sigs.select(
        "doc_id",
        "simhash32",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.expr(
                            f"shiftright(simhash32, {i * _SIMHASH_BLOCK_BITS})"
                            f" & {_SIMHASH_BLOCK_MASK}"
                        ).alias("val"),
                    )
                    for i in range(SIMHASH_BLOCKS)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "simhash32", F.col("bv.blk").alias("blk"), F.col("bv.val").alias("val"))
    l, r = blocks.alias("l"), blocks.alias("r")
    ham = F.expr("bit_count(sa ^ sb)").cast("long")
    return (
        l.join(r, ["blk", "val"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            F.col("l.simhash32").alias("sa"),
            F.col("r.simhash32").alias("sb"),
        )
        .select("a", "b", ham.alias("hamming"))
        .where(F.col("hamming") <= HAMMING_RADIUS)
        .distinct()
    )


SQL_SIMHASH_HAMMING_PAIRS = f"""
WITH sigs AS ({SQL_SIMHASH32}),
blocks AS (
  SELECT doc_id, simhash32, blk,
         (simhash32 >> (blk * {_SIMHASH_BLOCK_BITS})) & {_SIMHASH_BLOCK_MASK} AS val
  FROM sigs, LATERAL (SELECT unnest(range(0, {SIMHASH_BLOCKS})) AS blk)
)
SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
       CAST(bit_count(xor(l.simhash32, r.simhash32)) AS BIGINT) AS hamming
FROM blocks l JOIN blocks r ON l.blk = r.blk AND l.val = r.val
WHERE l.doc_id < r.doc_id
  AND bit_count(xor(l.simhash32, r.simhash32)) <= {HAMMING_RADIUS}
"""


def q_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the LSH candidate pairs.

    Spark runs the iterative large-star/small-star operator; DuckDB verifies
    with a recursive-CTE transitive closure — same cluster assignments.
    """
    from libchunk_spark.operators.components import connected_components

    edges = q_lsh_band_pairs(spark, sf_dir)
    nodes = _docs(spark, sf_dir).select(F.col("doc_id").alias("file_id"))
    comp = connected_components(edges, all_nodes=nodes)
    return comp.select(F.col("file_id").alias("doc_id"), "component")


def q_components_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental clustering: yesterday's assignment + today's delta edges
    must equal the full-batch answer — exercised end-to-end and checked
    against the same recursive-CTE oracle as `components`.

    The growing-corpus production shape (operators.components.
    update_components): the "old" corpus is the even doc_ids, clustered
    alone; the "new" batch is the odd doc_ids, whose candidate edges (every
    pair touching an odd doc) are folded into the existing assignment as
    star edges ∪ delta — no old edge is re-derived or re-read. At 10^12
    files this replaces a full re-cluster with work proportional to
    |old vertices| + |delta edges|.
    """
    from libchunk_spark.operators.components import (
        connected_components,
        update_components,
    )

    pairs = q_lsh_band_pairs(spark, sf_dir).select("a", "b")
    docs = _docs(spark, sf_dir).select(F.col("doc_id").alias("file_id"))
    old_nodes = docs.where(F.col("file_id") % 2 == 0)
    new_nodes = docs.where(F.col("file_id") % 2 == 1)
    old_edges = pairs.where((F.col("a") % 2 == 0) & (F.col("b") % 2 == 0))
    delta_edges = pairs.where((F.col("a") % 2 == 1) | (F.col("b") % 2 == 1))
    base = connected_components(old_edges, all_nodes=old_nodes)
    final = update_components(base, delta_edges, new_nodes=new_nodes)
    return final.select(F.col("file_id").alias("doc_id"), "component")


SQL_COMPONENTS = f"""
WITH RECURSIVE pairs AS ({SQL_LSH_BAND_PAIRS}),
edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT d.doc_id,
       least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS component
FROM documents d LEFT JOIN reach r ON r.a = d.doc_id
GROUP BY d.doc_id
"""


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine similarity pairs >= threshold over embeddings.

    Delegates to operators.similarity.brute_force_pairs: broadcast NumPy
    matrix, vectorized per-partition matmul blocks. Honestly the O(n^2)
    baseline — it refuses inputs over BRUTE_FORCE_MAX_ROWS (the scale paths
    are ann_ivf / ann_signlsh).
    """
    from libchunk_spark.operators.similarity import brute_force_pairs

    return brute_force_pairs(_emb(spark, sf_dir), COSINE_THRESHOLD)


SQL_COSINE_TOPK = f"""
SELECT l.vec_id AS a, r.vec_id AS b,
       round(list_cosine_similarity(l.embedding::DOUBLE[], r.embedding::DOUBLE[]), 4) AS sim
FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
WHERE round(list_cosine_similarity(l.embedding::DOUBLE[], r.embedding::DOUBLE[]), 4) >= {COSINE_THRESHOLD}
"""


def q_ann_signlsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via sign-pattern LSH buckets + exact cosine re-rank (scale path).

    Bucket = sign bits of the first 8 dims; candidates share a bucket.
    Delegates to operators.similarity.signlsh_pairs — the intra-bucket
    self-join is bounded by a bucket-size cap with star-edge degradation
    (linear, observable), so a hot sign pattern can no longer go quadratic.
    The cap exceeds the driver table sizes, so the oracle (which enumerates
    all intra-bucket pairs) stays byte-equal at sf0.01/0.1. The brute-force
    q_cosine_topk is the baseline this approximates.
    """
    from libchunk_spark.operators.similarity import signlsh_pairs

    return signlsh_pairs(
        _emb(spark, sf_dir, spread=False), COSINE_THRESHOLD, n_bits=8,
        n_tables=1, bucket_cap=4096,
    )


SQL_ANN_SIGNLSH = f"""
WITH b AS (
  SELECT vec_id, embedding,
         array_to_string(list_transform(embedding[1:8],
             x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket
  FROM embeddings
)
SELECT l.vec_id AS a, r.vec_id AS b,
       round(list_cosine_similarity(l.embedding::DOUBLE[], r.embedding::DOUBLE[]), 4) AS sim
FROM b l JOIN b r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
WHERE round(list_cosine_similarity(l.embedding::DOUBLE[], r.embedding::DOUBLE[]), 4) >= {COSINE_THRESHOLD}
"""


def emb_edge_pairs(emb: DataFrame, source: str = "brute") -> DataFrame:
    """(a, b) cosine-threshold edges from a pluggable generator.

    "brute" = exact O(n^2) baseline (oracle byte-equality, gated at 200k
    rows); "ivf" / "signlsh" = the ANN scale paths — the swap a 100 TB run
    makes is this one argument, exercised by tests/test_similarity.py's
    verdict-agreement test rather than claimed in prose."""
    from libchunk_spark.operators.similarity import (
        brute_force_pairs,
        ivf_pairs,
        signlsh_pairs,
    )

    if source == "brute":
        return brute_force_pairs(emb, COSINE_THRESHOLD).select("a", "b")
    if source == "ivf":
        return ivf_pairs(emb, COSINE_THRESHOLD, n_cells=8, nprobe=3).select(
            "a", "b"
        )
    if source == "signlsh":
        # code length follows the threshold: COSINE_THRESHOLD=0.3 is a ~72°
        # angle (per-bit collision ~0.6), so long codes never collide — 4
        # bits x 8 tables reaches 0.956 verdict agreement at sf0.01; for
        # high-sim near-dup thresholds prefer 8+ bits (see
        # tests/test_similarity.py::test_signlsh_multi_table_recall)
        return signlsh_pairs(
            emb, COSINE_THRESHOLD, n_bits=4, n_tables=8, bucket_cap=1024
        ).select("a", "b")
    raise ValueError(f"unknown edge source {source!r}")


def q_emb_dedup_verdicts(
    spark: SparkSession, sf_dir: str, edges: str = "brute"
) -> DataFrame:
    """Embedding-cosine near-dup dedup: threshold pairs → connected
    components → min-id representative election (SemDeDup-style verdict
    table over the embedding modality). The exact ("brute") pair set keeps
    the DuckDB oracle byte-equal; at 100 TB pass edges="ivf"/"signlsh" and
    the rest of the plan is unchanged (agreement pytest in
    tests/test_similarity.py)."""
    from libchunk_spark.operators.components import connected_components

    emb = _emb(spark, sf_dir)
    nodes = emb.select(F.col("vec_id").alias("file_id"))
    comp = connected_components(
        emb_edge_pairs(emb, edges), all_nodes=nodes
    )
    return comp.select(
        F.col("file_id").alias("vec_id"),
        "component",
        (F.col("file_id") == F.col("component")).alias("keep"),
    )


SQL_EMB_DEDUP_VERDICTS = f"""
WITH RECURSIVE pairs AS (
  SELECT l.vec_id AS a, r.vec_id AS b
  FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
  WHERE round(list_cosine_similarity(l.embedding::DOUBLE[], r.embedding::DOUBLE[]), 4) >= {COSINE_THRESHOLD}
),
edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
)
SELECT v.vec_id,
       least(v.vec_id, coalesce(min(r.b), v.vec_id)) AS component,
       v.vec_id = least(v.vec_id, coalesce(min(r.b), v.vec_id)) AS keep
FROM embeddings v LEFT JOIN reach r ON r.a = v.vec_id
GROUP BY v.vec_id
"""


def q_crossmodal_dup_flags(
    spark: SparkSession, sf_dir: str, emb_edges: str = "brute"
) -> DataFrame:
    """Cross-modal dedup triage: per doc, does the TEXT signal (MinHash-LSH
    candidate pair) and/or the EMBEDDING signal (cosine pair over the
    aligned vec_id) flag it as a near-dup — and do both agree?

    Multi-signal consensus is how production dedup pipelines suppress
    single-modality false positives; here both signals are exact/bounded so
    the DuckDB oracle is byte-equal. vec_id is 1:1 with doc_id in the driver
    tables. At 100 TB pass emb_edges="ivf"/"signlsh" (see emb_edge_pairs).
    """
    docs = _docs(spark, sf_dir).select("doc_id")
    tp = q_lsh_band_pairs(spark, sf_dir)
    text_ids = (
        tp.select(F.col("a").alias("doc_id"))
        .unionByName(tp.select(F.col("b").alias("doc_id")))
        .distinct()
        .withColumn("text_dup", F.lit(True))
    )
    ep = emb_edge_pairs(_emb(spark, sf_dir), emb_edges)
    emb_ids = (
        ep.select(F.col("a").alias("doc_id"))
        .unionByName(ep.select(F.col("b").alias("doc_id")))
        .distinct()
        .withColumn("emb_dup", F.lit(True))
    )
    return (
        docs.join(F.broadcast(text_ids), "doc_id", "left")
        .join(F.broadcast(emb_ids), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_dup", F.lit(False)).alias("text_dup"),
            F.coalesce("emb_dup", F.lit(False)).alias("emb_dup"),
        )
        .withColumn("consensus", F.col("text_dup") & F.col("emb_dup"))
    )


SQL_CROSSMODAL_DUP_FLAGS = f"""
WITH lsh AS ({SQL_LSH_BAND_PAIRS}),
text_ids AS (SELECT a AS doc_id FROM lsh UNION SELECT b FROM lsh),
emb AS (
  SELECT l.vec_id AS a, r.vec_id AS b
  FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
  WHERE round(list_cosine_similarity(l.embedding::DOUBLE[], r.embedding::DOUBLE[]), 4) >= {COSINE_THRESHOLD}
),
emb_ids AS (SELECT a AS doc_id FROM emb UNION SELECT b FROM emb)
SELECT d.doc_id,
       d.doc_id IN (SELECT doc_id FROM text_ids) AS text_dup,
       d.doc_id IN (SELECT doc_id FROM emb_ids) AS emb_dup,
       d.doc_id IN (SELECT doc_id FROM text_ids)
       AND d.doc_id IN (SELECT doc_id FROM emb_ids) AS consensus
FROM documents d
"""


TOPK_K = 3


def q_topk_similar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k similarity search: for each query vector (vec_id % 50 == 0),
    the K most-cosine-similar other vectors, rank ties broken by vec_id.

    Rank semantics (row_number window over the exact scores) rather than a
    threshold — the retrieval shape of embedding search. Only the query
    subset streams through the matmul (|queries| x n scored rows, not n^2);
    at scale the broadcast candidate side comes from the IVF/sign-LSH prune
    and the ranking window is unchanged.
    """
    from pyspark.sql import Window

    from libchunk_spark.operators.similarity import scored_candidates

    emb = _emb(spark, sf_dir)
    scored = scored_candidates(emb, emb.where(F.col("vec_id") % 50 == 0))
    w = Window.partitionBy("q").orderBy(F.desc("sim"), F.asc("cand"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOPK_K)
        .select("q", "cand", "sim", "rank")
    )


SQL_TOPK_SIMILAR = f"""
WITH scored AS (
  SELECT l.vec_id AS q, r.vec_id AS cand,
         round(list_cosine_similarity(l.embedding::DOUBLE[], r.embedding::DOUBLE[]), 4) AS sim
  FROM embeddings l JOIN embeddings r ON l.vec_id <> r.vec_id
  WHERE l.vec_id % 50 = 0
)
SELECT q, cand, sim, CAST(rank AS INT) AS rank FROM (
  SELECT q, cand, sim,
         row_number() OVER (PARTITION BY q ORDER BY sim DESC, cand ASC) AS rank
  FROM scored
)
WHERE rank <= {TOPK_K}
"""


TOPK_IVF_RECALL_FLOOR = 0.9


def _topk_recall_contract(spark, sf_dir, approx_fn) -> DataFrame:
    """(n_exact, recall_ok) scaffolding shared by the IVF/PQ/IVFADC
    contracts: materialize the exact ranking and the approximate (q, cand)
    set as CONCURRENT driver-thread jobs (guide §2.6 — they are
    independent until the recall semi-join, and each feeds two consumers),
    then join."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        f_exact = ex.submit(
            lambda: q_topk_similar(spark, sf_dir)
            .select("q", "cand")
            .localCheckpoint()
        )
        f_approx = ex.submit(lambda: approx_fn().localCheckpoint())
        exact, approx = f_exact.result(), f_approx.result()
    hits = exact.join(approx, ["q", "cand"], "left_semi").agg(
        F.count("*").alias("n_hit")
    )
    return (
        exact.agg(F.count("*").alias("n_exact"))
        .crossJoin(hits)
        .select(
            "n_exact",
            (
                F.col("n_hit") >= TOPK_IVF_RECALL_FLOOR * F.col("n_exact")
            ).alias("recall_ok"),
        )
    )


def q_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-probed top-k retrieval, value-checked against the exact ranking.

    The IVF ranking itself is not SQL-expressible (seeded k-means), but its
    contract is — emit (n_exact, recall_ok) where n_exact is the exact
    top-k row count (SQL-computable: the q_topk_similar ranking) and
    recall_ok asserts the IVF ranking recovers >= TOPK_IVF_RECALL_FLOOR of
    the exact (q, cand) hits. Same contract pattern as q_ann_ivf.
    """
    from libchunk_spark.operators.similarity import topk_ivf

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") % 50 == 0)
    # measured recall 1.000 at sf0.01 / 0.958 at sf0.1 — comfortable margin
    # over the 0.9 floor (index_probe=2 soft assignment does the heavy
    # lifting; see topk_ivf docstring)
    return _topk_recall_contract(
        spark,
        sf_dir,
        lambda: topk_ivf(emb, queries, k=TOPK_K, n_cells=8, nprobe=5).select(
            "q", "cand"
        ),
    )


SQL_TOPK_IVF = f"""
WITH scored AS (
  SELECT l.vec_id AS q, r.vec_id AS cand,
         round(list_cosine_similarity(l.embedding::DOUBLE[], r.embedding::DOUBLE[]), 4) AS sim
  FROM embeddings l JOIN embeddings r ON l.vec_id <> r.vec_id
  WHERE l.vec_id % 50 = 0
),
topk AS (
  SELECT q, cand FROM (
    SELECT q, cand,
           row_number() OVER (PARTITION BY q ORDER BY sim DESC, cand ASC) AS rank
    FROM scored
  ) WHERE rank <= {TOPK_K}
)
SELECT count(*) AS n_exact, true AS recall_ok FROM topk
"""


def q_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized top-k retrieval, value-checked like q_topk_ivf.

    The compressed-domain path: vectors live as m=16 one-byte-ish codes
    (16x smaller than float32), queries scan the code table via ADC lookup
    tables, and only the shortlist's true vectors are re-read for an exact
    re-rank. Contract: (n_exact, recall_ok) with recall vs the exact
    ranking >= TOPK_IVF_RECALL_FLOOR (measured 1.000 at sf0.01 / 0.983 at
    sf0.1 for m=16, n_codes=64, shortlist=64)."""
    from libchunk_spark.operators.pq import pq_topk

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") % 50 == 0)
    return _topk_recall_contract(
        spark,
        sf_dir,
        lambda: pq_topk(
            emb, queries, k=TOPK_K, m=16, n_codes=64, shortlist=64
        ).select("q", "cand"),
    )


def q_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC top-k retrieval (cell-pruned PQ scan), value-checked like
    q_topk_ivf / q_topk_pq.

    The 100 TB composition: codes are IVF-cell-assigned, each query's ADC
    scan touches only its nprobe probed cells — O(probed cells) per query
    batch instead of pq_topk's O(corpus codes) — and the exact re-rank makes
    the emitted sims exact. Contract: (n_exact, recall_ok) with recall vs
    the exact ranking >= TOPK_IVF_RECALL_FLOOR."""
    from libchunk_spark.operators.pq import pq_topk_ivf

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") % 50 == 0)
    return _topk_recall_contract(
        spark,
        sf_dir,
        lambda: pq_topk_ivf(
            emb, queries, k=TOPK_K, m=16, n_codes=64, shortlist=64,
            n_cells=8, nprobe=5,
        ).select("q", "cand"),
    )


def q_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking invariants per doc, value-checked.

    Chunk *boundaries* are not SQL-expressible, but their invariants are:
    `total_bytes` (sum of chunk lengths) must equal the oracle's
    strlen(text), and `bounds_ok` asserts Spark-side that every chunk is
    <= max_size, at most one chunk (the tail) is < min_size, and the chunk
    count covers ceil(total/max_size); the oracle emits `true`. Mirrors the
    reference's chunk-count bound test (bits/put_test.go:24-29)."""
    cfg = DOCS_CONFIG.chunk
    corpus = _docs_corpus(spark, sf_dir, spread=False)
    res = split(corpus, cfg, keep_payload=False)
    per = res.chunks.groupBy("file_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("length").cast("long").alias("total_bytes"),
        F.max("length").alias("max_len"),
        F.sum(
            F.when(F.col("length") < cfg.min_size, 1).otherwise(0)
        ).alias("n_undersized"),
    )
    return (
        corpus.select("file_id")
        .join(per, "file_id", "left")
        .select(
            F.col("file_id").alias("doc_id"),
            F.coalesce("total_bytes", F.lit(0)).alias("total_bytes"),
            F.coalesce(
                (F.col("max_len") <= cfg.max_size)
                & (F.col("n_undersized") <= 1)
                & (
                    F.col("n_chunks")
                    >= F.ceil(F.col("total_bytes") / cfg.max_size)
                ),
                F.lit(True),  # zero-chunk (empty) docs vacuously hold
            ).alias("bounds_ok"),
        )
    )


SQL_CHUNK_STATS = """
SELECT doc_id, strlen(text) AS total_bytes, true AS bounds_ok
FROM documents
"""


def q_dedup_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-index dedup effectiveness, value-checked via its invariants:
    corpus byte total must equal the oracle's sum(strlen(text)), doc count
    must match, and `ratio_ok` asserts Spark-side that
    1 <= distinct_keys <= total_chunks and every non-empty doc produced at
    least one chunk; the oracle emits `true`."""
    corpus = _docs_corpus(spark, sf_dir)
    res = split(corpus, DOCS_CONFIG.chunk, keep_payload=False)
    stats = res.chunks.agg(
        F.count("*").alias("total_chunks"),
        F.countDistinct("k").alias("distinct_keys"),
        F.sum("length").cast("long").alias("total_bytes"),
    )
    docs = corpus.agg(
        F.count("*").alias("n_docs"),
        F.sum((F.length("content") > 0).cast("int")).alias("n_nonempty"),
    )
    return stats.crossJoin(docs).select(
        "n_docs",
        F.coalesce("total_bytes", F.lit(0)).alias("total_bytes"),
        (
            (F.col("distinct_keys") >= F.least(F.lit(1), F.col("n_nonempty")))
            & (F.col("distinct_keys") <= F.col("total_chunks"))
            & (F.col("total_chunks") >= F.col("n_nonempty"))
        ).alias("ratio_ok"),
    )


SQL_DEDUP_RATIO = """
SELECT count(*) AS n_docs,
       CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
       true AS ratio_ok
FROM documents
"""




def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters per doc: fraction of the
    most frequent word, fraction of the most frequent word-bigram, and the
    mass of words occurring more than once. Training pipelines drop docs
    above thresholds on these before dedup even runs; identical math on
    both engines keeps the oracle byte-equal."""
    words = _docs(spark, sf_dir, spread=False).select(
        "doc_id", F.explode(_tokens()).alias("w")
    )
    wstats = (
        words.groupBy("doc_id", "w")
        .count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("n_words"),
            F.max("count").alias("top_w"),
            F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(0)).alias(
                "dup_w"
            ),
        )
    )
    t = F.col("_t")
    bigrams = _docs(spark, sf_dir, spread=False).select(
        "doc_id", _tokens().alias("_t")
    ).select(
        "doc_id",
        F.explode(
            F.when(
                F.size(t) >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - 2),
                    lambda i: F.concat_ws(" ", F.slice(t, i + 1, 2)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("b"),
    )
    bstats = (
        bigrams.groupBy("doc_id", "b")
        .count()
        .groupBy("doc_id")
        .agg(F.sum("count").alias("n_bigrams"), F.max("count").alias("top_b"))
    )
    return (
        wstats.join(bstats, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            F.round(F.col("top_w") / F.col("n_words"), 4).alias("top_word_frac"),
            F.round(F.col("top_b") / F.col("n_bigrams"), 4).alias(
                "top_bigram_frac"
            ),
            F.round(F.col("dup_w") / F.col("n_words"), 4).alias("dup_word_frac"),
        )
    )


SQL_REPETITION_STATS = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2),
ws AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, max(c) AS top_w,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup_w
  FROM wc GROUP BY 1
),
bigrams AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS b
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       LATERAL (SELECT unnest(range(1, len(t))) AS i)
  WHERE len(t) >= 2
),
bc AS (SELECT doc_id, b, count(*) AS c FROM bigrams GROUP BY 1, 2),
bs AS (SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_b FROM bc GROUP BY 1)
SELECT ws.doc_id, ws.n_words,
       round(top_w / CAST(n_words AS DOUBLE), 4) AS top_word_frac,
       round(top_b / CAST(n_bigrams AS DOUBLE), 4) AS top_bigram_frac,
       round(dup_w / CAST(n_words AS DOUBLE), 4) AS dup_word_frac
FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
"""


def q_quality_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality gate composed from the repetition metrics:
    keep a doc iff it is long enough and not repetition-dominated
    (n_words >= 20, top_word_frac <= 0.12, dup_word_frac <= 0.9 —
    thresholds chosen to split this corpus's distribution, exercising both
    verdicts). The pre-dedup drop pass of an LLM training pipeline; same
    math on both engines keeps the oracle byte-equal."""
    r = q_repetition_stats(spark, sf_dir)
    return r.select(
        "doc_id",
        (
            (F.col("n_words") >= 20)
            & (F.col("top_word_frac") <= 0.12)
            & (F.col("dup_word_frac") <= 0.9)
        ).alias("keep"),
    )


SQL_QUALITY_VERDICTS = f"""
WITH r AS ({SQL_REPETITION_STATS})
SELECT doc_id,
       (n_words >= 20 AND top_word_frac <= 0.12 AND dup_word_frac <= 0.9)
       AS keep
FROM r
"""


DECONTAM_W = 5  # word-shingle width; production pipelines use ~13 tokens


def q_decontam_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-vs-eval decontamination: flag every training doc that
    shares at least one `DECONTAM_W`-word shingle with the held-out eval
    set (docs with doc_id % 97 == 0 stand in for a benchmark suite).

    The canonical pre-training hygiene pass (n-gram overlap decontamination
    as used for GPT-3/PaLM-style training sets, from the public
    descriptions). Scale shape: eval sets are tiny relative to the corpus,
    so the distinct eval-shingle set BROADCASTS and the corpus side is one
    map-side semi-join over exploded shingles — no shuffle of the training
    corpus at any size; the contaminated-doc set collapses with a distinct
    on doc_id (bounded by corpus row count, not shingle count).
    """
    docs = _docs(spark, sf_dir, spread=False)
    w = DECONTAM_W
    # token array staged as a column: the slice lambda must not re-split
    # the text per shingle (no CSE inside HOF lambdas, see _grams3_of)
    staged = docs.select("doc_id", _tokens().alias("_t"))
    t = F.col("_t")
    grams = staged.select(
        "doc_id",
        F.explode(
            F.when(
                F.size(t) >= w,
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - w),
                    lambda i: F.concat_ws(" ", F.slice(t, i + 1, w)),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("g"),
    )
    is_eval = F.col("doc_id") % 97 == 0
    eval_grams = grams.where(is_eval).select("g").distinct()
    hits = (
        grams.where(~is_eval)
        .join(F.broadcast(eval_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(True))
    )
    return (
        docs.where(~is_eval)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("hit", F.lit(False)).alias("contaminated")
        )
    )


SQL_DECONTAM_FLAGS = f"""
WITH grams AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4] AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       LATERAL (SELECT unnest(range(1, len(t) - {DECONTAM_W - 2})) AS i)
  WHERE len(t) >= {DECONTAM_W}
),
eval_grams AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
SELECT d.doc_id,
       d.doc_id IN (
         SELECT DISTINCT doc_id FROM grams
         WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM eval_grams)
       ) AS contaminated
FROM documents d WHERE d.doc_id % 97 <> 0
"""


# Semantic (embedding-space) decontamination threshold. COSINE_THRESHOLD
# (0.3) is ~the 99th percentile of this corpus's pair sims, so flags are
# non-empty but selective at sf0.01.
SEM_DECONTAM_THRESHOLD = COSINE_THRESHOLD


def q_semantic_decontam_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination — the paraphrase-contamination twin
    of q_decontam_flags: flag every corpus vector whose max cosine to the
    held-out eval embedding set (vec_id % 50 == 0, the pseudo-eval subset
    the topk contracts use) reaches SEM_DECONTAM_THRESHOLD. N-gram overlap
    misses reworded benchmark leakage; embedding similarity is the
    published countermeasure, and a curation pipeline runs BOTH gates.

    Scale shape (operators/similarity.py::max_sim_to_set): eval benchmarks
    are tiny relative to the corpus, so the eval matrix BROADCASTS (bounded
    by the same guard as brute_force_pairs) and the corpus side streams
    through one map-only Arrow-batched matmul — zero shuffles at any
    corpus size, exact answer (no recall floor needed), mirroring
    q_decontam_flags' broadcast-the-eval-side discipline."""
    from libchunk_spark.operators.similarity import max_sim_to_set

    emb = _emb(spark, sf_dir)
    is_eval = F.col("vec_id") % 50 == 0
    scored = max_sim_to_set(
        emb.where(~is_eval), emb.where(is_eval), out_col="max_eval_sim"
    )
    return scored.select(
        "vec_id",
        "max_eval_sim",
        (F.col("max_eval_sim") >= SEM_DECONTAM_THRESHOLD).alias("contaminated"),
    )


SQL_SEMANTIC_DECONTAM_FLAGS = f"""
WITH ev AS (
  SELECT embedding FROM embeddings WHERE vec_id % 50 = 0
),
sims AS (
  SELECT c.vec_id,
         max(round(list_cosine_similarity(
               c.embedding::DOUBLE[], e.embedding::DOUBLE[]), 4)) AS max_eval_sim
  FROM embeddings c, ev e
  WHERE c.vec_id % 50 <> 0
  GROUP BY c.vec_id
)
SELECT vec_id, max_eval_sim,
       max_eval_sim >= {SEM_DECONTAM_THRESHOLD} AS contaminated
FROM sims
"""


def q_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting (words / numbers / punctuation runs).

    Same RE2-compatible pattern on both engines (kept free of Java/RE2
    dialect divergence: no lookarounds, no \\w classes).
    """
    pat = "[a-z]+|[0-9]+|[^a-z0-9 ]"
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
    )


SQL_REGEX_TOKENS = """
SELECT doc_id,
       len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens
FROM documents
"""


IVF_RECALL_FLOOR = 0.9


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed ANN, value-checked against the exact pair set in-Spark.

    The IVF pair list itself is not SQL-expressible (seeded k-means), but
    its *contract* is: emit (n_brute, recall_ok) where n_brute is the exact
    threshold-pair count (SQL-computable) and recall_ok asserts IVF recall
    >= IVF_RECALL_FLOOR vs that exact set. The oracle independently computes
    n_brute and expects recall_ok = true, so the driver value-checks both
    the exact baseline and the ANN recall floor.
    """
    from libchunk_spark.operators.similarity import brute_force_pairs, ivf_pairs

    emb = _emb(spark, sf_dir)
    brute = brute_force_pairs(emb, COSINE_THRESHOLD).select("a", "b")
    ivf = ivf_pairs(emb, COSINE_THRESHOLD, n_cells=8).select("a", "b")
    stats = brute.join(ivf, ["a", "b"], "left_semi").agg(
        F.count("*").alias("n_hit")
    )
    return (
        brute.agg(F.count("*").alias("n_brute"))
        .crossJoin(stats)
        .select(
            "n_brute",
            (F.col("n_hit") >= IVF_RECALL_FLOOR * F.col("n_brute")).alias(
                "recall_ok"
            ),
        )
    )


SQL_ANN_IVF = f"""
SELECT count(*) AS n_brute, true AS recall_ok
FROM embeddings l JOIN embeddings r ON l.vec_id < r.vec_id
WHERE round(list_cosine_similarity(l.embedding::DOUBLE[], r.embedding::DOUBLE[]), 4) >= {COSINE_THRESHOLD}
"""




def _containment_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived corpus with planted containment: base file g = concat of docs
    [5g, 5g+5) ordered by doc_id; composite 100000+g = base || ' ' ||
    reverse(base). Every base is verbatim-contained in its composite (as a
    prefix), nothing else contains anything (reverse ensures a composite
    never contains a different base unless the bases themselves collide)."""
    docs = _docs(spark, sf_dir)
    base = docs.groupBy(
        F.floor(F.col("doc_id") / 5).cast("long").alias("file_id")
    ).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "text"))),
                lambda s: s.text,
            ),
        ).alias("content")
    )
    comp = base.select(
        (F.col("file_id") + 100000).alias("file_id"),
        F.concat_ws(" ", "content", F.reverse("content")).alias("content"),
    )
    # explicit width: the groupBy's AQE-coalesced output (2 partitions for a
    # few MB) would starve the chunker UDF downstream; fixed counts are
    # exempt from AQE coalescing
    par = spark.sparkContext.defaultParallelism
    return base.unionByName(comp).repartition(par, "file_id")


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring containment: chunk-key candidates + suffix-array verify.

    Exercises operators/containment.py end-to-end (the generalization of
    libchunk's content addressing, bits/config.go:42-44, to cross-file
    containment). Candidate generation is chunk-key sharing — a base file's
    chunks reappear verbatim in its composite because CDC cut points are
    content-local and the base is the composite's PREFIX (cut decisions
    depend only on bytes since the last cut, so the prefix's cuts are
    guaranteed identical — no probabilistic resync needed). The suffix-array
    pass then verifies actual substring containment, so the result equals
    DuckDB's position()-over-all-pairs oracle exactly.

    Recall assumptions (candidate generation is evidence-based, not
    exhaustive): equality with the oracle requires every base to share >= 1
    sub-cap chunk key with its composite. A single-chunk base (its only cut
    EOF-forced, key never recurring) or a base whose every key exceeds
    key_freq_cap would be missed. Both are structurally impossible here —
    bases concatenate 5 docs (>= ~750 bytes vs max_size 256, so >= 3 chunks;
    asserted in tests/test_containment.py) and each base's interior keys
    recur exactly once (in its composite), far under the 256 cap.
    """
    from libchunk_spark.operators.containment import (
        containment_candidates,
        verify_containment,
    )

    corpus = _containment_corpus(spark, sf_dir).localCheckpoint()
    res = split(corpus, DOCS_CONFIG.chunk, materialize=True)
    cands = containment_candidates(
        res.chunks, res.file_keys, containment_frac=0.3, key_freq_cap=256
    )
    return verify_containment(cands, corpus).select("a", "b")


SQL_CONTAINMENT_PAIRS = """
WITH base AS (
  SELECT CAST(floor(doc_id / 5) AS BIGINT) AS file_id,
         string_agg(text, ' ' ORDER BY doc_id) AS content
  FROM documents GROUP BY 1
),
corpus AS (
  SELECT file_id, content FROM base
  UNION ALL
  SELECT file_id + 100000, content || ' ' || reverse(content) FROM base
)
SELECT l.file_id AS a, r.file_id AS b
FROM corpus l JOIN corpus r
  ON l.file_id < r.file_id
 AND (position(l.content IN r.content) > 0
   OR position(r.content IN l.content) > 0)
"""


def q_dedup_verdicts(
    spark: SparkSession, sf_dir: str, components_source: DataFrame | None = None
) -> DataFrame:
    """End-to-end dedup decision table: LSH components + representative
    election (longest content, min doc_id tiebreak) -> keep/drop per doc.
    components_source: see q_cluster_stats — checkpoint-fed at scale,
    recompute for the oracle."""
    from libchunk_spark.operators.dedup import dedup_verdicts

    comp = (
        components_source
        if components_source is not None
        else q_components(spark, sf_dir)
    ).select(F.col("doc_id").alias("file_id"), "component")
    corpus = _docs_corpus(spark, sf_dir)
    return dedup_verdicts(comp, corpus, policy="longest").select(
        F.col("file_id").alias("doc_id"), "component", "keep"
    )


SQL_DEDUP_VERDICTS = f"""
WITH comp AS ({SQL_COMPONENTS})
SELECT d.doc_id, c.component,
       (row_number() OVER (PARTITION BY c.component
                           ORDER BY length(d.text) DESC, d.doc_id ASC)) = 1 AS keep
FROM documents d JOIN comp c ON c.doc_id = d.doc_id
"""




def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_event_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation over the event stream table
    (the batch oracle for the Structured Streaming windowed-agg test)."""
    return (
        _events(spark, sf_dir)
        .groupBy(
            F.floor(F.unix_timestamp("ts") / 3600).alias("hour_bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


SQL_EVENT_WINDOW_STATS = """
SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events
GROUP BY 1, 2
"""


def q_event_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-event detection: identical (user_id, event_type, props)
    payloads (exact dedup over a non-text modality)."""
    return (
        _events(spark, sf_dir)
        .groupBy("user_id", "event_type", "props")
        .agg(F.count("*").alias("n"), F.min("event_id").alias("first_event"))
        .where(F.col("n") > 1)
    )


SQL_EVENT_DUPS = """
SELECT user_id, event_type, props, count(*) AS n, min(event_id) AS first_event
FROM events GROUP BY 1, 2, 3 HAVING count(*) > 1
"""


def q_event_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-ization: per-user sessions split at >30 min gaps (lag +
    running sum window functions — SURVEY.md §2 Part B window coverage)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = _events(spark, sf_dir).withColumn(
        "new_session",
        F.when(
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
            > 1800,
            1,
        )
        .otherwise(0)
        .cast("int"),
    )
    sessions = flagged.withColumn(
        "session_idx",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event"),
    )


SQL_EVENT_SESSIONS = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, event_id,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx, count(*) AS n_events, min(event_id) AS first_event
FROM sessions GROUP BY 1, 2
"""




def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (grouped aggregates with derived
    measures) over lineitem — classic relational agg coverage."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").where(
        F.col("l_shipdate") <= F.lit("1998-09-02")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY 1, 2
"""


def q_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + aggregation (customer ⋈ orders ⋈ lineitem): revenue by
    market segment — broadcast/sort-merge join coverage."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


SQL_SEGMENT_REVENUE = """
SELECT c_mktsegment,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — seedless, content-independent,
    reproducible across engines and corpus growth: keep a doc iff the first
    byte of sha256(doc_id) falls under its stratum's rate (en 25%, other
    langs 50%). Map-only at any scale (no shuffle, no RNG state); the same
    doc is in or out of the sample forever, so incremental pipeline runs
    never resample. Standard down-sampling op for training-data curation
    (reference has no analog; training-pipeline extension)."""
    bucket = F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 2)
    rate = F.when(F.col("lang") == "en", F.lit("40")).otherwise(F.lit("80"))
    return (
        _docs(spark, sf_dir, spread=False)
        .where(bucket < rate)
        .select("doc_id", "lang", bucket.alias("sample_bucket"))
    )


SQL_SAMPLE_STRATIFIED = """
SELECT doc_id, lang,
       substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2) AS sample_bucket
FROM documents
WHERE substr(sha256(CAST(doc_id AS VARCHAR)), 1, 2)
      < (CASE WHEN lang = 'en' THEN '40' ELSE '80' END)
"""


def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level repeated 5-gram mining (Lee et al., "Deduplicating
    Training Data Makes Language Models Better" — the frequency-mining
    half): word 5-grams counted by DISTINCT containing doc, top 20 with
    deterministic (count desc, ngram asc) tie-break. Scale shape: explode
    is map-side, the groupBy count is a partial-aggregate shuffle on the
    gram key, top-k is a TakeOrdered — no all-pairs anywhere."""
    t = F.col("_t")
    grams = F.when(
        F.size(t) >= 5,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(t) - 5),
                lambda i: F.concat_ws(" ", F.slice(t, i + 1, 5)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        _docs(spark, sf_dir)
        # token array staged: the slice lambda must not re-split the text
        # per 5-gram (no CSE inside HOF lambdas, see _grams3_of)
        .select("doc_id", _tokens().alias("_t"))
        .select("doc_id", F.explode(grams).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("ngram"))
        .limit(20)
    )


SQL_TOP_NGRAMS = """
SELECT ngram, CAST(count(*) AS BIGINT) AS n_docs
FROM (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS ngram
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i)
)
GROUP BY ngram
ORDER BY n_docs DESC, ngram ASC
LIMIT 20
"""


def q_event_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles of event value per event_type (p50 /
    p95) — the distribution-sketch aggregation a data pipeline uses for
    drift monitoring and outlier gates. Spark's `percentile` and DuckDB's
    `quantile_cont` share the same continuous-interpolation definition
    (rank (n-1)*q), so the oracle is value-exact. Scale shape: a plain
    groupBy aggregate; exact percentiles sort within each group — at
    10^12 rows swap in approx_percentile with a documented error bound
    (the SQL contract stays the same shape)."""
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
    )


SQL_EVENT_QUANTILES = """
SELECT event_type,
       count(*) AS n,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(max(value), 4) AS max_value
FROM events
GROUP BY 1
"""


def q_top_docs_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: the 3 longest documents of each source (window
    row_number with a deterministic (n_chars desc, doc_id asc) tie-break)
    — the 'best exemplars per domain' selection a curation pipeline runs
    after quality scoring. Scale shape: one shuffle on the group key; the
    window is rank-truncated per partition (row_number + filter), never a
    global sort."""
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    return (
        _docs(spark, sf_dir, spread=False)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select("source", "rank", "doc_id", "n_chars")
    )


SQL_TOP_DOCS_PER_SOURCE = """
SELECT source, rank, doc_id, n_chars FROM (
  SELECT source, doc_id, n_chars,
         CAST(row_number() OVER (
           PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
         ) AS INT) AS rank
  FROM documents
) WHERE rank <= 3
"""


def q_event_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: attribute each purchase event to the user's most
    recent preceding click/view (last-touch attribution). Spark has no
    native as-of join; `operators/asof.py` re-expresses it as ONE
    shuffle on user_id + a sorted running-window carry — no pair
    explosion, no BroadcastNestedLoopJoin (plan-asserted in tests).
    Oracle: DuckDB's native ASOF LEFT JOIN."""
    from libchunk_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    quotes = ev.where(F.col("event_type").isin("click", "view")).select(
        "user_id",
        "ts",
        F.col("event_id").alias("src_event"),
        F.col("event_type").alias("src_type"),
    )
    joined = asof_join(
        purchases,
        quotes,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        tiebreak="src_event",
    )
    return joined.select("purchase_id", "user_id", "src_event", "src_type")


SQL_EVENT_ASOF_ATTRIBUTION = """
SELECT p.event_id AS purchase_id, p.user_id,
       v.event_id AS src_event, v.event_type AS src_type
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN
     (SELECT * FROM events WHERE event_type IN ('click', 'view')) v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""


def q_event_range_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: per purchase, how many clicks the same user made
    in the preceding hour (ts in (purchase_ts - 1h, purchase_ts]).
    `operators/rangejoin.py` turns the non-equi predicate — which Spark
    would otherwise plan as a BroadcastNestedLoopJoin — into a bucketed
    equi-join on (user_id, hour_bucket) + an exact residual filter.
    Zero-click purchases are kept via a left join back to the probe
    side."""
    from libchunk_spark.operators.rangejoin import bucketed_range_join

    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("click_ts")
    )
    pairs = bucketed_range_join(
        purchases,
        clicks,
        on=["user_id"],
        probe_time="ts",
        quote_time="click_ts",
        lo_sec=-3600.0,
        hi_sec=0.0,
        bucket_sec=3600,
    )
    counts = pairs.groupBy("purchase_id").agg(
        F.count("*").alias("clicks_1h")
    )
    return (
        purchases.join(counts, on="purchase_id", how="left")
        .select(
            "purchase_id",
            "user_id",
            F.coalesce(F.col("clicks_1h"), F.lit(0))
            .cast("long")
            .alias("clicks_1h"),
        )
    )


SQL_EVENT_RANGE_COUNTS = """
SELECT p.event_id AS purchase_id, p.user_id,
       CAST(count(c.ts) AS BIGINT) AS clicks_1h
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
  ON c.user_id = p.user_id
 AND c.ts > p.ts - INTERVAL 3600 SECOND
 AND c.ts <= p.ts
GROUP BY 1, 2
"""


def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (grouping-sets coverage, SURVEY.md §2.2
    aggregations): order count + revenue by (priority, status), with
    per-priority subtotals and a grand total. Subtotal NULLs are
    coalesced to 'ALL' on both sides so row identity is hash-stable.
    Catalyst expands the rollup into a single Expand + one shuffle —
    no extra pass per grouping set."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce(F.col("o_orderpriority"), F.lit("ALL")).alias(
                "priority"
            ),
            F.coalesce(F.col("o_orderstatus"), F.lit("ALL")).alias(
                "status"
            ),
            "n_orders",
            "revenue",
        )
    )


SQL_REVENUE_ROLLUP = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


def q_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated aggregation: per event_type (5 heavy-hitter keys
    over the whole table — the canonical skewed groupBy), row count,
    sum(value), and an EXACT distinct-user count, computed with the
    two-phase salted plan in `operators/skew.py` (salt =
    hash(user_id) % 64, so countDistinct(user_id) partitions cleanly
    across salt buckets). Oracle: the plain one-phase GROUP BY —
    equality IS the correctness claim."""
    from libchunk_spark.operators.skew import salted_agg

    out = salted_agg(
        _events(spark, sf_dir),
        keys=["event_type"],
        salt_from="user_id",
        n_salts=64,
        count_alias="n_events",
        sum_col="value",
        sum_alias="sum_value",
        distinct_alias="n_users",
    )
    return out.select(
        "event_type",
        "n_events",
        F.round(F.col("sum_value"), 4).alias("sum_value"),
        "n_users",
    )


SQL_SALTED_SKEW_AGG = """
SELECT event_type, count(*) AS n_events,
       round(sum(value), 4) AS sum_value,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY 1
"""


def q_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar-function coverage (SURVEY.md §2.2 scalar functions):
    parse the event `props` JSON payload with a typed `from_json` schema
    (JVM-side Jackson parse inside whole-stage codegen — never a Python
    UDF) and aggregate the extracted field per event type. At 100 TB the
    parse is map-side and the shuffle carries only 5 grouped rows of
    partial aggregates."""
    ev = _events(spark, sf_dir).withColumn(
        "k_val", F.from_json("props", "k INT").getField("k")
    )
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.min("k_val").cast("long").alias("min_k"),
        F.max("k_val").cast("long").alias("max_k"),
        F.sum(F.when(F.col("k_val") > 50, 1).otherwise(0))
        .cast("long")
        .alias("n_high"),
    )


SQL_PROPS_JSON_STATS = """
SELECT event_type, count(*) AS n,
       CAST(min(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
         AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
         AS max_k,
       CAST(sum(CASE WHEN CAST(json_extract(props, '$.k') AS INTEGER) > 50
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high
FROM events GROUP BY 1
"""


# ----------------------------------------------------------------- registry

# --------------------------------------------------- winnowing fingerprints

# Winnowed-fingerprint doc-frequency cap (same boilerplate-bounding role as
# NGRAM_DF_CAP) and the match-score threshold that flags a near-dup pair.
WINNOW_DF_CAP = 64
WINNOW_SCORE_THRESHOLD = 0.5


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust winnowing fingerprint summary per document (Schleimer et al.
    SIGMOD 2003; operators/winnow.py). Selection is MAP-ONLY — array
    higher-order functions over the text column, zero shuffle — so at
    10^12 files this is a pure scan-side projection; only the tiny per-doc
    summary aggregates here (and it folds into the same projection:
    no groupBy at all)."""
    from libchunk_spark.operators.winnow import winnow_encs, winnow_from_encs

    # staged projections: each expensive alias is referenced 2+ times by
    # the next step, which blocks CollapseProject — the md5 gram hashing
    # runs exactly once per doc (plan-asserted in tests/test_winnow.py;
    # the fused single-expression form re-hashes per window: O(n^2) md5)
    return (
        _docs(spark, sf_dir, spread=False)
        .select("doc_id", winnow_encs(F.col("text")).alias("_encs"))
        .select("doc_id", winnow_from_encs(F.col("_encs")).alias("_sel"))
        .select(
            "doc_id",
            F.size("_sel").cast("long").alias("n_sel"),
            F.array_distinct(
                F.transform("_sel", lambda e: F.shiftright(e, 20))
            ).alias("_fps"),
        )
        .select(
            "doc_id",
            "n_sel",
            F.size("_fps").cast("long").alias("n_fp"),
            F.array_min("_fps").alias("min_fp"),
        )
    )


# Shared oracle CTE: the window-function formulation of robust winnowing —
# per-window min of enc = h40*2^20 + (2^20-1 - pos%2^20) ties to the
# RIGHTMOST minimal hash exactly like the Spark array_min over the same
# encoding. i >= least(w, m) keeps one whole-doc window for short docs.
_SQL_WINNOW_FPS = """
grams AS (
  SELECT doc_id, i,
         CAST(('0x' || substr(md5(substr(text, i, 8)), 1, 10)) AS UBIGINT)::BIGINT * 1048576
           + (1048575 - (i % 1048576)) AS enc
  FROM documents, LATERAL (SELECT unnest(range(1, greatest(length(text) - 7, 1) + 1)) AS i)
),
wmins AS (
  SELECT doc_id, i,
         min(enc) OVER (PARTITION BY doc_id ORDER BY i
                        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS enc_min,
         count(*) OVER (PARTITION BY doc_id) AS m
  FROM grams
),
sel AS (SELECT DISTINCT doc_id, enc_min FROM wmins WHERE i >= least(4, m)),
fps AS (SELECT DISTINCT doc_id, (enc_min >> 20) AS fp FROM sel)
"""

SQL_WINNOW_FINGERPRINTS = f"""
WITH {_SQL_WINNOW_FPS}
SELECT s.doc_id,
       (SELECT count(*) FROM sel WHERE sel.doc_id = s.doc_id) AS n_sel,
       count(*) AS n_fp,
       min(fp) AS min_fp
FROM fps s
GROUP BY s.doc_id
"""


def q_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed-fingerprint near-dup pairs: docs sharing selected
    fingerprints, scored by containment shared/min(|A|,|B|) >= 0.5.

    Scale shape mirrors q_ngram_jaccard_pairs: ONE exchange on fp computes
    the document-frequency cap (window count) and is REUSED by both sides
    of the self-join, so the gram explosion runs once; the df-cap bounds
    any fingerprint's fan-out to <= cap^2/2 pairs (license-header
    boilerplate fingerprints are dropped on both engines identically)."""
    from libchunk_spark.operators.winnow import winnow_pair_scores

    return winnow_pair_scores(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text",
        df_cap=WINNOW_DF_CAP, materialize=True,
    ).where(F.col("score") >= WINNOW_SCORE_THRESHOLD)


SQL_WINNOW_PAIRS = f"""
WITH {_SQL_WINNOW_FPS},
capped AS (
  SELECT doc_id, fp FROM fps
  QUALIFY count(*) OVER (PARTITION BY fp) <= {WINNOW_DF_CAP}
),
-- sizes from the UNCAPPED sets (ADVICE r06): capped-out boilerplate must
-- not shrink a doc's denominator and inflate its containment score
sizes AS (SELECT doc_id, count(*) AS sz FROM fps GROUP BY 1),
pairs AS (
  SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS shared
  FROM capped l JOIN capped r ON l.fp = r.fp AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT a, b, shared,
       round(shared / CAST(least(na.sz, nb.sz) AS DOUBLE), 4) AS score
FROM pairs
JOIN sizes na ON na.doc_id = a
JOIN sizes nb ON nb.doc_id = b
WHERE round(shared / CAST(least(na.sz, nb.sz) AS DOUBLE), 4) >= {WINNOW_SCORE_THRESHOLD}
"""


# ------------------------------------------------- code-clone / text batch 2


def q_clone_type2_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 code-clone groups via alpha-renaming: every token is replaced
    by the index of its FIRST occurrence in the document ("a b a" and
    "x y x" both canonicalize to "1 2 1"), the classic identifier-
    abstraction used by Type-2 clone detectors; groups = sha256 of the
    canonical pattern. Catches renamed copies that exact sha-dedup misses.

    Scale: canonicalization is a map-only vectorized pandas UDF, O(tokens)
    per doc via pd.factorize + first-occurrence index (the r6 expression —
    array_position inside transform — rescanned the token array per token,
    O(tokens^2): 10^10 comparisons in one task for a 100k-token doc;
    VERDICT r06 next #3). Byte-identical canon pattern, so the DuckDB
    oracle is untouched (equality pinned old-vs-new + vs a pure-python
    reference in tests/test_queries_batch3.py). The only shuffle is the
    group-size window on the 32-byte canon_sha — the same crypto-key,
    skew-free shuffle discipline as exact_dup_groups."""
    from pyspark.sql import Window

    from libchunk_spark.functions.udfs import make_type2_canon_udf

    canon = make_type2_canon_udf()(F.col("text"))
    return (
        _docs(spark, sf_dir, spread=False)
        .select("doc_id", F.sha2(canon, 256).alias("canon_sha"))
        .withColumn(
            "group_size",
            F.count("*").over(Window.partitionBy("canon_sha")).cast("long"),
        )
        .withColumn("is_clone", F.col("group_size") > 1)
    )


SQL_CLONE_TYPE2_GROUPS = """
WITH canon AS (
  SELECT doc_id,
         sha256(array_to_string(list_transform(string_split(text, ' '),
                x -> list_position(string_split(text, ' '), x)), ' ')) AS canon_sha
  FROM documents
)
SELECT doc_id, canon_sha,
       count(*) OVER (PARTITION BY canon_sha) AS group_size,
       count(*) OVER (PARTITION BY canon_sha) > 1 AS is_clone
FROM canon
"""


def q_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repo-level (source-level) similarity: exact Jaccard between the
    per-source DISTINCT word-3gram sets — the aggregate-container analog
    of doc near-dup (fork / vendored-copy detection between repos).

    Scale: per-gram fan-out in the self-join is bounded by the number of
    SOURCES containing the gram (<= |sources|, orders of magnitude below
    doc count); the distinct() partial-aggregates map-side before the
    gram shuffle. At very large source counts the same NGRAM_DF_CAP
    discipline (or per-source MinHash via operators/sign.py) bounds it."""
    grams = _gram_rows(_docs(spark, sf_dir), "source").distinct()
    sizes = grams.groupBy("source").agg(F.count("*").alias("sz"))
    inter = (
        grams.alias("l")
        .join(grams.alias("r"), "gram")
        .where(F.col("l.source") < F.col("r.source"))
        .groupBy(
            F.col("l.source").alias("src_a"), F.col("r.source").alias("src_b")
        )
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("source").alias("src_a"), F.col("sz").alias("na")),
            "src_a",
        )
        .join(
            sizes.select(F.col("source").alias("src_b"), F.col("sz").alias("nb")),
            "src_b",
        )
        .select(
            "src_a",
            "src_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4
            ).alias("jac"),
        )
    )


SQL_SOURCE_SIMILARITY = f"""
WITH grams AS (
  SELECT DISTINCT source, array_to_string(t[i:i+2], ' ') AS gram
  FROM (SELECT source, string_split(text, ' ') AS t FROM documents),
       LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
),
sizes AS (SELECT source, count(*) AS sz FROM grams GROUP BY 1),
inter AS (
  SELECT l.source AS src_a, r.source AS src_b, count(*) AS inter
  FROM grams l JOIN grams r ON l.gram = r.gram AND l.source < r.source
  GROUP BY 1, 2
)
SELECT src_a, src_b,
       round(inter / CAST(na.sz + nb.sz - inter AS DOUBLE), 4) AS jac
FROM inter
JOIN sizes na ON na.source = src_a
JOIN sizes nb ON nb.source = src_b
"""


TFIDF_TOP_K = 3


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-k terms by tf-idf (keyword extraction for corpus
    analysis). Ranking uses tf/df — IEEE division of exact integers, so
    the order is bit-identical across engines (ln() is last-ulp libm-
    dependent and only appears in the REPORTED tfidf value, after
    round(4)); ties break on the term string.

    Scale: two partial-agg shuffles (doc-term tf, term df); the df table
    is word-vocabulary-sized (distinct words ≪ corpus bytes) and
    broadcasts; N_docs is a 1-row broadcast. No window over the corpus —
    the row_number window partitions by doc_id, which is the same key the
    tf aggregation just shuffled on (no extra exchange)."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir, spread=False)
    terms = docs.select("doc_id", F.explode(_tokens()).alias("term"))
    tfc = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfc = terms.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    nd = docs.select(F.countDistinct("doc_id").alias("nd"))
    w = Window.partitionBy("doc_id").orderBy(
        (F.col("tf") / F.col("df")).desc(), F.col("term")
    )
    return (
        tfc.join(F.broadcast(dfc), "term")
        .crossJoin(F.broadcast(nd))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= TFIDF_TOP_K)
        .withColumn(
            "tfidf", F.round(F.col("tf") * F.log(F.col("nd") / F.col("df")), 4)
        )
        .select("doc_id", "term", "rnk", "tfidf")
    )


SQL_TFIDF_TOP_TERMS = f"""
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tfc AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
dfc AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
nd AS (SELECT count(DISTINCT doc_id) AS nd FROM documents),
ranked AS (
  SELECT doc_id, term, tf, df,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tf / CAST(df AS DOUBLE) DESC, term) AS rnk
  FROM tfc JOIN dfc USING (term)
)
SELECT doc_id, term, CAST(rnk AS BIGINT) AS rnk,
       round(tf * ln(nd / CAST(df AS DOUBLE)), 4) AS tfidf
FROM ranked, nd WHERE rnk <= {TFIDF_TOP_K}
"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational pivot: per-day event counts and value sums spread across
    one column pair per event type (Catalyst PivotFirst — a single
    aggregation, NOT one pass per type). The pivot value list is explicit,
    which is also the 100 TB rule: an unlisted pivot forces a distinct-
    values pre-query over the full fact table."""
    piv = (
        _events(spark, sf_dir)
        .groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", EVENT_TYPES)
        .agg(
            # count(*) is rejected inside a Pivot aggregate (Spark 4)
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("value"),
        )
    )
    cols = [F.col("day")]
    for t in EVENT_TYPES:
        cols.append(F.coalesce(F.col(f"{t}_n"), F.lit(0)).cast("long").alias(f"{t}_n"))
        cols.append(F.col(f"{t}_value"))
    return piv.select(*cols)


_PIVOT_COLS = ",\n  ".join(
    f"count(*) FILTER (event_type = '{t}') AS {t}_n,\n"
    f"  round(sum(value) FILTER (event_type = '{t}'), 4) AS {t}_value"
    for t in EVENT_TYPES
)

SQL_EVENT_TYPE_PIVOT = f"""
SELECT CAST(ts AS DATE) AS day,
  {_PIVOT_COLS}
FROM events GROUP BY 1
"""


APPROX_DISTINCT_RSD = 0.05  # HLL++ target relative standard deviation
APPROX_DISTINCT_BOUND = 0.15  # contract: |approx-exact|/exact within 3*rsd


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based distinct counting contract: HyperLogLog++
    (approx_count_distinct) per event type, value-checked against the
    exact count with a 3-sigma relative-error bound. The query RETURNS the
    exact count plus the bound verdict, so the oracle (exact distinct +
    `true`) red-flags any sketch regression — the same contract-oracle
    pattern as the ANN recall floors.

    Scale: this is THE distinct-count operator at 100 TB — HLL sketches
    merge map-side (constant memory per partition) where countDistinct
    shuffles every distinct value; the exact twin here is the test
    harness, not the production path."""
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_exact"),
            F.approx_count_distinct("user_id", rsd=APPROX_DISTINCT_RSD).alias(
                "approx"
            ),
        )
        .select(
            "event_type",
            "n_exact",
            (
                F.abs(F.col("approx") - F.col("n_exact")) / F.col("n_exact")
                <= APPROX_DISTINCT_BOUND
            ).alias("approx_ok"),
        )
    )


SQL_APPROX_DISTINCT_USERS = """
SELECT event_type, count(DISTINCT user_id) AS n_exact, true AS approx_ok
FROM events GROUP BY 1
"""


ROLLING_WINDOW_SEC = 3600


def q_event_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding RANGE-frame window: per event, count and value-sum of the
    same user's events in the trailing hour (event-time RANGE frame, not
    ROWS — equal timestamps all enter the frame, late-data-dedup safe).
    Completes the window-function coverage beyond ROWS frames.

    Scale: one shuffle on user_id (the same key every per-user window in
    the repo shuffles on); frame evaluation is a per-partition sorted
    sweep with a sliding aggregate — O(n) per user."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-ROLLING_WINDOW_SEC, 0)
    )
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("roll_n"),
        F.round(F.sum("value").over(w), 4).alias("roll_value"),
    )


SQL_EVENT_ROLLING_STATS = f"""
SELECT event_id, user_id,
       count(*) OVER w AS roll_n,
       round(sum(value) OVER w, 4) AS roll_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
             RANGE BETWEEN {ROLLING_WINDOW_SEC} PRECEDING AND CURRENT ROW)
"""


def q_order_late_shipment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped EXISTS: per order priority, how many orders have at
    least one lineitem shipped > 60 days after the order date. The
    correlated EXISTS plans as a LEFT SEMI join — each order counted at
    most once no matter how many late lineitems it has, and the probe
    side never duplicates rows (the at-scale reason EXISTS beats
    join+distinct).

    Scale: semi-join shuffles on the order key (uniform); the extra
    non-equi conjunct (shipdate vs orderdate+60d) evaluates inside the
    join, not as a post-filter on a fanned-out join product."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ),
        "left_semi",
    )
    totals = o.groupBy("o_orderpriority").agg(F.count("*").alias("n_orders"))
    lates = late.groupBy("o_orderpriority").agg(F.count("*").alias("n_late"))
    return (
        totals.join(lates, "o_orderpriority", "left")
        .select(
            "o_orderpriority",
            "n_orders",
            F.coalesce("n_late", F.lit(0)).cast("long").alias("n_late"),
        )
    )


SQL_ORDER_LATE_SHIPMENT = """
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(sum(CASE WHEN EXISTS (
           SELECT 1 FROM lineitem l
           WHERE l.l_orderkey = o.o_orderkey
             AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
         THEN 1 ELSE 0 END) AS BIGINT) AS n_late
FROM orders o GROUP BY 1
"""


def q_lsh_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-star dup-pair recall metric as a first-class auditable
    query: LSH candidate pairs vs the exact df-capped word-3gram-Jaccard
    ground truth (>= NGRAM_JACCARD_THRESHOLD), returning one row of
    tp / fp / fn / precision / recall.

    This is the measurement a dedup pipeline MUST keep running at sample
    scale: the north rule's "dup-pair recall >= 0.99" is a number someone
    has to compute, and computing it is itself a join-shaped workload.
    Scale shape: the ground-truth side is the expensive exact all-pairs
    (df-capped, so bounded) — run this on a stratified SAMPLE of the
    corpus at 10^12 files (sample_stratified is the companion operator),
    never on the full corpus; the metric estimate converges at sample
    sizes a single executor can verify. The three aggregates reuse one
    scan each and the tp join is pair-key equi — no new blowup beyond
    the ground truth itself.
    """
    # each side feeds the tp join AND its own count — without a
    # checkpoint the whole ngram / banding pipeline runs twice per side.
    # The two materializations are independent, so they run as concurrent
    # driver-thread jobs (guide §2.6): the cheaper banding side back-fills
    # executors the exact side's stage tails leave idle.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        f_truth = ex.submit(
            lambda: q_ngram_jaccard_pairs(spark, sf_dir)
            .select("a", "b")
            .localCheckpoint()
        )
        f_cand = ex.submit(
            lambda: q_lsh_band_pairs(spark, sf_dir)
            .select("a", "b")
            .localCheckpoint()
        )
        truth, cand = f_truth.result(), f_cand.result()
    tp = truth.join(cand, ["a", "b"]).agg(F.count("*").alias("tp"))
    nt = truth.agg(F.count("*").alias("n_truth"))
    nc = cand.agg(F.count("*").alias("n_cand"))
    return (
        tp.crossJoin(nt)
        .crossJoin(nc)
        .select(
            "tp",
            (F.col("n_cand") - F.col("tp")).alias("fp"),
            (F.col("n_truth") - F.col("tp")).alias("fn"),
            F.round(F.col("tp") / F.col("n_cand"), 4).alias("prec"),
            F.round(F.col("tp") / F.col("n_truth"), 4).alias("recall"),
        )
    )


SQL_LSH_EVAL_METRICS = f"""
WITH truth AS (SELECT a, b FROM ({SQL_NGRAM_JACCARD_PAIRS})),
cand AS ({SQL_LSH_BAND_PAIRS}),
tp AS (SELECT CAST(count(*) AS BIGINT) AS tp
       FROM truth JOIN cand USING (a, b)),
nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand)
SELECT tp, n_cand - tp AS fp, n_truth - tp AS fn,
       round(tp / CAST(n_cand AS DOUBLE), 4) AS prec,
       round(tp / CAST(n_truth AS DOUBLE), 4) AS recall
FROM tp, nt, nc
"""


EDIT_SIM_THRESHOLD = 0.6


def q_edit_sim_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance verification of LSH candidate pairs — the rerank /
    verify stage after banding: normalized Levenshtein similarity
    1 - dist/max(len) >= threshold, computed ONLY on the bounded
    candidate set (never all-pairs).

    Exact-preserving cost ladder (each rung provably drops only pairs
    the final rounded predicate rejects; the 1e-4 guard absorbs the
    round-to-4 boundary at any text length):
      1. length-gap prefilter |la-lb| <= (1-t+1e-4)*max — O(1), the gap
         lower-bounds edit distance;
      2. thresholded kernel levenshtein(ta, tb, k) with per-row
         k = floor((1-t+1e-4)*max)+1 — early-exits as soon as the
         distance provably exceeds k (O(k*n) not O(n^2); the bulk of
         false candidates exit in the first rows of the DP band);
      3. the exact rounded predicate on the surviving handful.
    Catalyst does NOT CSE a filter's expression into the project (the
    lambda-CSE rule's operator-level cousin), so the filter rung uses
    the CHEAP thresholded form (plus an equality short-circuit for
    exact-dup candidates) and only survivors pay a second (still
    thresholded, still tiny) evaluation in the projection. Same-session
    measurement at sf0.1/local[32]: 13.5 s naive full-kernel
    filter+project -> 8.4-8.9 s (the residual is dominated by the
    shared LSH-candidate subtree, ~5 s in that window; the kernel
    itself dropped ~2.5x). The
    doc-side joins are plain equi-joins on doc_id (no fan-out beyond
    the candidate list). Mirrors the reference's verify-before-claim
    discipline (bits/get.go:59-62 length-checks before decrypt).
    """
    guard = 1 - EDIT_SIM_THRESHOLD + 1e-4
    pairs = q_lsh_band_pairs(spark, sf_dir)
    docs = _docs(spark, sf_dir).select(
        "doc_id", "text", F.length("text").alias("ln")
    )
    j = (
        pairs.join(
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
        .withColumn("mx", F.greatest("la", "lb"))
        .where(F.abs(F.col("la") - F.col("lb")) <= guard * F.col("mx"))
        .withColumn("k", (F.floor(guard * F.col("mx")) + 1).cast("int"))
        # equality short-circuits before the DP kernel: exact-dup texts are
        # a large slice of LSH candidates and cost O(n), not O(k*n)
        .where(
            (F.col("ta") == F.col("tb"))
            | (F.expr("levenshtein(ta, tb, k)") != -1)
        )
        .withColumn(
            "dist",
            F.when(F.col("ta") == F.col("tb"), F.lit(0))
            .otherwise(F.expr("levenshtein(ta, tb, k)"))
            .cast("long"),
        )
        .withColumn(
            "edit_sim", F.round(1 - F.col("dist") / F.col("mx"), 4)
        )
        .where(F.col("edit_sim") >= EDIT_SIM_THRESHOLD)
    )
    return j.select("a", "b", "dist", "edit_sim")


SQL_EDIT_SIM_PAIRS = f"""
WITH cand AS ({SQL_LSH_BAND_PAIRS}),
j AS (
  SELECT cand.a, cand.b,
         da.text AS ta, db.text AS tb,
         length(da.text) AS la, length(db.text) AS lb
  FROM cand
  JOIN documents da ON da.doc_id = cand.a
  JOIN documents db ON db.doc_id = cand.b
  WHERE abs(length(da.text) - length(db.text))
        <= (1 - {EDIT_SIM_THRESHOLD} + 1e-4)
           * greatest(length(da.text), length(db.text))
)
SELECT a, b, CAST(levenshtein(ta, tb) AS BIGINT) AS dist,
       round(1 - levenshtein(ta, tb) / CAST(greatest(la, lb) AS DOUBLE), 4)
         AS edit_sim
FROM j
WHERE round(1 - levenshtein(ta, tb) / CAST(greatest(la, lb) AS DOUBLE), 4)
      >= {EDIT_SIM_THRESHOLD}
"""


DIR_FANOUT = 16  # synthetic directory derivation (FIXTURES.md §6: path=doc_id)


def merkle_root_agg():
    """Aggregate expression for a directory's Merkle root: sha256 over the
    doc_id-ordered per-file content hashes (columns doc_id, h). Shared by
    the batch query and the streaming maintenance twin
    (streaming/aggmaint.py) so their roots agree by construction."""
    return F.sha2(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("doc_id", "h"))),
                lambda s: s["h"],
            ),
            "",
        ),
        256,
    )


def q_dir_merkle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merkle subtree identity: content-addressable DIRECTORY hashes —
    per (repo=source, dir) the sha256 over the doc_id-ordered per-file
    content hashes, plus how many of the dir's files share content with
    any other file in the corpus.

    This is libchunk's K-key idea (bits/bits.go:70, sha256 content
    address) lifted one level up the tree: identical directories get
    identical Merkle roots regardless of location, so whole vendored /
    forked subtrees dedup by a single group-by on the root — the same
    reason the reference dedups chunks by K. Directories are synthesized
    deterministically (dir = doc_id % DIR_FANOUT) since the driver table
    maps path=doc_id (fixtures.documents_as_corpus).

    Scale shape: two shuffles — one on content hash (df counts; crypto
    keys, skew-free) and one on (repo, dir). The ordered fold is
    collect_list bounded by files-per-directory; at 10^12 files a
    pathological million-file directory rolls up hierarchically
    (path-component levels), each level the same bounded groupBy.
    """
    files = _docs(spark, sf_dir, spread=False).select(
        "source",
        (F.col("doc_id") % DIR_FANOUT).alias("dirname"),
        "doc_id",
        F.sha2("text", 256).alias("h"),
    )
    hc = files.groupBy("h").agg(F.count("*").alias("cnt"))
    return (
        files.join(hc, "h")
        .groupBy("source", "dirname")
        .agg(
            F.count("*").alias("n_files"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_shared"),
            merkle_root_agg().alias("merkle"),
        )
        .select("source", "dirname", "n_files", "n_shared", "merkle")
    )


SQL_DIR_MERKLE = f"""
WITH files AS (
  SELECT source, doc_id % {DIR_FANOUT} AS dirname, doc_id, sha256(text) AS h
  FROM documents
),
hc AS (SELECT h, count(*) AS cnt FROM files GROUP BY h)
SELECT source, dirname,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(count(*) FILTER (WHERE cnt > 1) AS BIGINT) AS n_shared,
       sha256(string_agg(h, '' ORDER BY doc_id)) AS merkle
FROM files JOIN hc USING (h)
GROUP BY source, dirname
"""


def q_cluster_stats(
    spark: SparkSession, sf_dir: str, components_source: DataFrame | None = None
) -> DataFrame:
    """Cluster-quality audit: per non-singleton component its size, its
    intra-cluster candidate-edge count, and edge density
    n_edges / (n_docs choose 2) — the dashboard a dedup operator reads to
    spot over-merged clusters (huge + sparse = a chain of borderline
    bands glued transitively) before acting on verdicts.

    Scale shape: one equi-join + two grouped counts (operators/audit.py —
    skew hits a count cell, not a pair shuffle). components_source lets
    callers feed the CHECKPOINTED components stage instead of re-paying
    the CC loop (VERDICT r06 next #4; bench + run_pipeline do); the
    registry default recomputes so the DuckDB oracle sees one
    self-contained plan. Equality pinned in tests/test_queries_batch4.py.
    """
    from libchunk_spark.operators.audit import cluster_stats

    comp = (
        components_source
        if components_source is not None
        else q_components(spark, sf_dir)
    )
    edges = q_lsh_band_pairs(spark, sf_dir)
    return cluster_stats(comp, edges, id_col="doc_id")


SQL_CLUSTER_STATS = f"""
WITH comp AS (SELECT * FROM ({SQL_COMPONENTS})),
cand AS ({SQL_LSH_BAND_PAIRS}),
sizes AS (SELECT component, CAST(count(*) AS BIGINT) AS n_docs
          FROM comp GROUP BY 1),
ec AS (SELECT c.component, CAST(count(*) AS BIGINT) AS n_edges
       FROM cand p JOIN comp c ON c.doc_id = p.a GROUP BY 1)
SELECT component, n_docs,
       coalesce(n_edges, 0) AS n_edges,
       round(coalesce(n_edges, 0) / (n_docs * (n_docs - 1) / 2.0), 4)
         AS density
FROM sizes LEFT JOIN ec USING (component)
WHERE n_docs >= 2
"""


APPROX_QUANTILE_ACCURACY = 10000
APPROX_QUANTILE_BAND = 0.02  # quantile-rank tolerance around each target


def q_approx_event_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-sketch contract: percentile_approx (Greenwald-Khanna
    style, rank error <= n/accuracy) per event type, value-checked
    against the exact quantile BAND [q-0.02, q+0.02] — the approx p50
    must land between the exact p48 and p52. Returns the exact p50/p95
    plus the band verdict, so the oracle (exact + `true`) red-flags any
    sketch regression — the same contract-oracle pattern as
    approx_distinct_users and the ANN recall floors. The rank-error
    guarantee at accuracy=10000 is ~200x tighter than the band: no
    knife edge.

    Scale: the sketch is THE quantile operator at 100 TB — constant
    memory per partition, merge map-side; the exact twin is the harness.
    """
    qs = [0.5, 0.95]
    band = APPROX_QUANTILE_BAND
    exact_cols = [
        F.round(F.expr(f"percentile(value, {q})"), 4).alias(
            f"p{int(q * 100)}"
        )
        for q in qs
    ]
    lo_hi = [
        c
        for q in qs
        for c in (
            F.expr(f"percentile(value, {q - band})").alias(f"lo{int(q*100)}"),
            F.expr(f"percentile(value, {q + band})").alias(f"hi{int(q*100)}"),
        )
    ]
    approx = F.expr(
        f"percentile_approx(value, array({', '.join(str(q) for q in qs)}), "
        f"{APPROX_QUANTILE_ACCURACY})"
    ).alias("ap")
    agged = (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(*exact_cols, *lo_hi, approx)
    )
    ok = None
    for i, q in enumerate(qs):
        c = (F.col("ap")[i] >= F.col(f"lo{int(q*100)}")) & (
            F.col("ap")[i] <= F.col(f"hi{int(q*100)}")
        )
        ok = c if ok is None else (ok & c)
    return agged.select(
        "event_type", "p50", "p95", ok.alias("approx_ok")
    )


SQL_APPROX_EVENT_QUANTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       true AS approx_ok
FROM events GROUP BY 1
"""


def q_cross_source_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate-leakage matrix: for each unordered source
    pair, how many verified near-duplicate document pairs (exact
    df-capped 3-gram Jaccard >= threshold) straddle it — the
    split-leakage audit (train/test, or corpus/eval) run at container
    granularity before any split is trusted. Companion to decontam_flags
    (document-level, known eval set); on the driver corpus 24 of the 25
    verified dup pairs straddle sources, which is exactly the situation
    this matrix exists to expose.

    Scale shape: the pair generator is the already-bounded exact-Jaccard
    query (df-capped gram self-join); the source lookups are equi-joins
    on doc_id; the output is |sources|^2-bounded — tiny at any corpus
    size. At 10^12 files swap the generator for the LSH candidate pairs
    (same columns) to audit at sketch precision instead of exact cost.
    """
    pairs = q_ngram_jaccard_pairs(spark, sf_dir)
    src = _docs(spark, sf_dir).select("doc_id", "source")
    return (
        pairs.join(
            src.select(F.col("doc_id").alias("a"), F.col("source").alias("sa")),
            "a",
        )
        .join(
            src.select(F.col("doc_id").alias("b"), F.col("source").alias("sb")),
            "b",
        )
        .where(F.col("sa") != F.col("sb"))
        .select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_dup_pairs"))
    )


SQL_CROSS_SOURCE_DUPS = f"""
WITH p AS ({SQL_NGRAM_JACCARD_PAIRS})
SELECT least(da.source, db.source) AS src_a,
       greatest(da.source, db.source) AS src_b,
       CAST(count(*) AS BIGINT) AS n_dup_pairs
FROM p
JOIN documents da ON da.doc_id = p.a
JOIN documents db ON db.doc_id = p.b
WHERE da.source <> db.source
GROUP BY 1, 2
"""


def q_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon word-entropy per document — the information-density quality
    signal (low-entropy docs are boilerplate/template spam; training
    pipelines gate on it alongside the Gopher repetition filters).

    H = log2(n) - sum(c*log2(c))/n over per-word counts c, computed from
    the integer count table so both engines do the identical float math.
    Scale shape: one (doc_id, word) partial-agg shuffle then a doc_id agg —
    the same two-level shape as repetition_stats; map-side combine keeps
    shuffle rows ~= distinct (doc, word), never corpus tokens.
    """
    words = _docs(spark, sf_dir, spread=False).select("doc_id", F.explode(_tokens()).alias("w"))
    wc = words.groupBy("doc_id", "w").count()
    return (
        wc.groupBy("doc_id")
        .agg(
            F.sum("count").alias("n"),
            F.sum(F.col("count") * F.log2("count")).alias("clog"),
        )
        .select(
            "doc_id",
            F.round(F.log2("n") - F.col("clog") / F.col("n"), 4).alias(
                "word_entropy"
            ),
        )
    )


SQL_WORD_ENTROPY = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
wc AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2)
SELECT doc_id,
       round(log2(CAST(sum(c) AS DOUBLE))
             - sum(c * log2(c)) / CAST(sum(c) AS DOUBLE), 4) AS word_entropy
FROM wc GROUP BY doc_id
"""


N_SHARDS_HEX = 16  # one shard per leading sha256 hex nibble of the cluster id


def q_shard_plan(
    spark: SparkSession, sf_dir: str, components_source: DataFrame | None = None
) -> DataFrame:
    """Cluster-aware output sharding: every doc of a dup cluster lands in
    the SAME shard (shard = first sha256 hex nibble of its component id),
    so downstream per-shard jobs can re-verify / re-cluster locally with
    zero cross-shard dup edges. Emits the balance audit per shard
    (clusters, docs, bytes) that a writer would use to size output files.

    Scale: sha256 of the cluster id is skew-free by construction (a
    billion-doc mega-cluster still maps to ONE shard — by design, dup
    closure must stay co-located; the balance audit is what surfaces it).
    The shard agg is a 16-group rollup after a doc_id-keyed broadcast-able
    join of components against doc sizes (operators/audit.py).
    components_source: see q_cluster_stats — checkpoint-fed at scale,
    recompute for the oracle.
    """
    from libchunk_spark.operators.audit import shard_plan

    comp = (
        components_source
        if components_source is not None
        else q_components(spark, sf_dir)
    )
    docs = _docs(spark, sf_dir).select("doc_id", "n_chars")
    return shard_plan(comp, docs, id_col="doc_id")


SQL_SHARD_PLAN = f"""
WITH comp AS ({SQL_COMPONENTS})
SELECT substr(sha256(CAST(c.component AS VARCHAR)), 1, 1) AS shard,
       CAST(count(DISTINCT c.component) AS BIGINT) AS n_clusters,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars
FROM comp c JOIN documents d ON d.doc_id = c.doc_id
GROUP BY 1
"""


def q_curation_decisions(
    spark: SparkSession, sf_dir: str, components_source: DataFrame | None = None
) -> DataFrame:
    """The end-to-end corpus-curation decision table: one row per training
    doc with each gate's verdict and the final keep — quality (Gopher
    repetition filters), near-dup dedup (LSH components + representative
    election), eval decontamination (shared 5-gram) — the table an LLM
    data pipeline materializes last and audits forever after.

    Composition, not recomputation: reuses the three gate queries as
    subplans; Catalyst fuses the shared `documents` scans. Eval docs
    (doc_id % 97 == 0) are out of scope — they are the benchmark, not
    training data. Scale: three doc_id-keyed equi-joins over tables
    already partitioned by doc_id upstream; the gates themselves carry
    their own scale stories (see their docstrings). components_source
    flows to the dedup gate — checkpoint-fed at scale, recompute for
    the oracle (q_cluster_stats docstring).
    """
    quality = q_quality_verdicts(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("quality_keep")
    )
    dedup = q_dedup_verdicts(
        spark, sf_dir, components_source=components_source
    ).select("doc_id", F.col("keep").alias("dedup_keep"))
    contam = q_decontam_flags(spark, sf_dir)
    return (
        contam.join(quality, "doc_id")
        .join(dedup, "doc_id")
        .select(
            "doc_id",
            "quality_keep",
            "dedup_keep",
            "contaminated",
            (
                F.col("quality_keep")
                & F.col("dedup_keep")
                & ~F.col("contaminated")
            ).alias("final_keep"),
        )
    )


SQL_CURATION_DECISIONS = f"""
WITH q AS ({SQL_QUALITY_VERDICTS}),
dd AS ({SQL_DEDUP_VERDICTS}),
ct AS ({SQL_DECONTAM_FLAGS})
SELECT ct.doc_id,
       q.keep AS quality_keep,
       dd.keep AS dedup_keep,
       ct.contaminated,
       (q.keep AND dd.keep AND NOT ct.contaminated) AS final_keep
FROM ct
JOIN q ON q.doc_id = ct.doc_id
JOIN dd ON dd.doc_id = ct.doc_id
"""


def q_doc_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2-bucketed document-length histogram — the corpus-shape
    monitoring query every ingest run emits (drift in the length
    distribution is the first symptom of a bad crawl or a broken
    extractor). Map-side bucket + 1 tiny agg; trivially 100 TB-safe.
    """
    bucket = F.floor(F.log2(F.greatest(F.col("n_chars"), F.lit(1)))).cast(
        "int"
    )
    return (
        _docs(spark, sf_dir, spread=False)
        .select(bucket.alias("len_bucket"), "n_chars")
        .groupBy("len_bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


SQL_DOC_LEN_HISTOGRAM = """
SELECT CAST(floor(log2(greatest(n_chars, 1))) AS INT) AS len_bucket,
       CAST(count(*) AS BIGINT) AS n_docs,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
"""


DUP_SUBSTR_L = 30  # minimum duplicated-run length (chars) worth deduping


DUP_SUBSTR_MAX_BYTES = 256_000_000  # ~256 MB of text; sf0.1 is ~18 MB


def q_dup_substrings(
    spark: SparkSession, sf_dir: str, max_bytes: int = DUP_SUBSTR_MAX_BYTES
) -> DataFrame:
    """Exact substring-level dedup accounting (Lee et al., "Deduplicating
    Training Data Makes Language Models Better" — the ExactSubstr half;
    top_ngrams is the frequency-mining half): for every document, the
    merged maximal spans of text whose every L-char window also occurs
    elsewhere in the corpus (L = 30 chars here; the paper uses 50 BPE
    tokens). Emits per-doc (n_dup_spans, dup_chars, dup_frac) — the table
    a training pipeline thresholds to CUT repeated passages rather than
    drop whole near-dup docs.

    Shape: stride-1 L-char window hashes per doc (md5 — the DuckDB oracle
    runs the identical expression), one partial-agg shuffle on the window
    hash to find repeated windows (count >= 2, within- OR cross-doc, as in
    the paper), a semi-join back to positions, then classic
    gaps-and-islands span merging per doc (windows [p, p+L-1] merge while
    the next start is <= prev start + L).

    Scale: shuffle volume is one (hash, pos) pair per character — bounded
    and skew-free (window hashes are near-unique), but proportional to
    corpus bytes. At 10^12 files the production form of this op runs over
    the content-defined CHUNK table (operators/fused.py's keys ARE
    deduplicated variable-length substrings — dedup_ratio / containment
    already account at chunk granularity); this per-char exact variant is
    the in-cluster verifier / small-corpus auditor, with L and an optional
    stride as the cost levers. Reference analog: libchunk dedups identical
    chunk content via K-key identity (/root/reference/bits/chunks.go) —
    this query is the same identity idea pushed to exact character spans.
    The guard below enforces the sf-scale-only contract the docstring
    used to merely state (VERDICT r06 next #7), the same loud-refusal
    policy as similarity.brute_force_pairs.
    """
    L = DUP_SUBSTR_L
    d = _docs(spark, sf_dir, spread=False)
    total = d.agg(F.sum("n_chars")).collect()[0][0] or 0  # bounded artifact
    if total > max_bytes:
        raise ValueError(
            f"dup_substrings hashes one {L}-char window PER CHARACTER and "
            f"refuses corpora over {max_bytes:,} chars ({total:,} given) — "
            "use chunk_dup_spans, the content-defined chunk-granularity "
            "production twin, at scale"
        )
    # array of md5 window hashes, THEN posexplode — keeps the expensive
    # hash in its own projected column (the lambda-CSE rule: never
    # recompute an expensive expression per explode row)
    whs = F.transform(
        F.sequence(F.lit(1), F.length("text") - (L - 1)),
        lambda i: F.md5(F.col("text").substr(i, F.lit(L))),
    )
    wins = (
        d.where(F.col("n_chars") >= L)
        .select("doc_id", F.posexplode(whs).alias("pos0", "wh"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "wh")
    )
    dup_wh = (
        wins.groupBy("wh").agg(F.count("*").alias("c")).where("c >= 2").select("wh")
    )
    hits = wins.join(dup_wh, "wh").select("doc_id", "pos")
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    grp = (
        hits.withColumn(
            "brk",
            F.when(F.col("pos") - F.lag("pos").over(w) > L, 1).otherwise(0),
        )
        .withColumn("g", F.sum("brk").over(w))
    )
    spans = grp.groupBy("doc_id", "g").agg(
        F.min("pos").alias("s"), (F.max("pos") + (L - 1)).alias("e")
    )
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_spans"),
        F.sum(F.col("e") - F.col("s") + 1).alias("dup_chars"),
    )
    return (
        d.select("doc_id", "n_chars")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
            F.coalesce("dup_chars", F.lit(0)).alias("dup_chars"),
            F.round(
                F.coalesce("dup_chars", F.lit(0)) / F.col("n_chars"), 4
            ).alias("dup_frac"),
        )
    )


SQL_DUP_SUBSTRINGS = f"""
WITH wins AS (
  SELECT doc_id, pos, md5(substr(text, CAST(pos AS INT), {DUP_SUBSTR_L})) AS wh
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, n_chars - {DUP_SUBSTR_L - 1})) AS pos
        FROM documents WHERE n_chars >= {DUP_SUBSTR_L})
),
dup AS (SELECT wh FROM wins GROUP BY wh HAVING count(*) >= 2),
hits AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (wh)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
              > {DUP_SUBSTR_L} THEN 1 ELSE 0 END AS brk
  FROM hits
),
grps AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS g
  FROM isl
),
spans AS (
  SELECT doc_id, g, min(pos) AS s, max(pos) + {DUP_SUBSTR_L - 1} AS e
  FROM grps GROUP BY 1, 2
),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
         CAST(sum(e - s + 1) AS BIGINT) AS dup_chars
  FROM spans GROUP BY 1
)
SELECT d.doc_id,
       coalesce(p.n_dup_spans, 0) AS n_dup_spans,
       coalesce(p.dup_chars, 0) AS dup_chars,
       round(coalesce(p.dup_chars, 0) / CAST(d.n_chars AS DOUBLE), 4)
         AS dup_frac
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


BM25_K1 = 1.2
BM25_B = 0.75
BM25_N_TERMS = 5  # score the 5 highest-df terms (deterministic probe set)
BM25_TOP_DOCS = 10


def q_bm25_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval scoring — top 10 documents for each of the 5
    highest-document-frequency terms (the deterministic probe set a
    corpus-owned relevance surface can always compute; a real serve path
    substitutes user query terms). Lucene-style idf = ln(1 + (N-df+0.5)/
    (df+0.5)); dl = whitespace token count; k1=1.2, b=0.75.

    Cross-engine determinism: the per-term RANKING never touches ln() —
    idf is constant within a term partition, so rank orders by the
    idf-free core tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)) (a ratio of exact
    integers and literals: bit-identical IEEE math in Spark and DuckDB),
    with doc_id as tie-break; ln enters only the reported 4-dp rounded
    score (same trick as tfidf_top_terms).

    Scale: tf table = one (doc, term) partial-agg shuffle filtered to the
    5 probe terms (a broadcast semi-join in the general case); df/avgdl
    are tiny broadcast scalars; top-k per term is a 5-partition window —
    no all-pairs, no full-corpus sort.
    """
    d = _docs(spark, sf_dir)
    toks = d.select(
        "doc_id", F.explode(_tokens()).alias("term"), F.size(_tokens()).alias("dl")
    )
    # document frequency + the 5-term probe set
    df_t = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    probe = df_t.orderBy(F.desc("df"), F.asc("term")).limit(BM25_N_TERMS)
    # corpus scalars (one row, broadcast)
    scalars = d.select(
        F.count("*").alias("nd"),
        F.avg(F.size(_tokens())).alias("avgdl"),
    )
    tf = (
        toks.join(F.broadcast(probe), "term")
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"), F.first("df").alias("df"))
    )
    core = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("term").orderBy(F.desc("core"), F.asc("doc_id"))
    return (
        tf.crossJoin(F.broadcast(scalars))
        .withColumn("core", core)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= BM25_TOP_DOCS)
        .select(
            "term",
            F.col("rk").alias("rank"),
            "doc_id",
            "tf",
            F.round(
                F.log(
                    1
                    + (F.col("nd") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                )
                * F.col("core"),
                4,
            ).alias("bm25"),
        )
    )


SQL_BM25_TOP_DOCS = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
         len(string_split(text, ' ')) AS dl
  FROM documents
),
df_t AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
probe AS (SELECT term, df FROM df_t ORDER BY df DESC, term ASC
          LIMIT {BM25_N_TERMS}),
scalars AS (
  SELECT count(*) AS nd, avg(len(string_split(text, ' '))) AS avgdl
  FROM documents
),
tf AS (
  SELECT t.term, t.doc_id, count(*) AS tf, min(t.dl) AS dl, min(p.df) AS df
  FROM toks t JOIN probe p USING (term)
  GROUP BY 1, 2
),
scored AS (
  SELECT term, doc_id, tf, df, dl,
         (tf * ({BM25_K1} + 1)) / (tf + {BM25_K1} * (1 - {BM25_B} +
           {BM25_B} * dl / s.avgdl)) AS core,
         s.nd AS nd
  FROM tf, scalars s
),
ranked AS (
  SELECT term, doc_id, tf, df, core, nd,
         row_number() OVER (PARTITION BY term
                            ORDER BY core DESC, doc_id ASC) AS rk
  FROM scored
)
SELECT term, CAST(rk AS INT) AS rank, doc_id, tf,
       round(ln(1 + (nd - df + 0.5) / (df + 0.5)) * core, 4) AS bm25
FROM ranked WHERE rk <= {BM25_TOP_DOCS}
"""


PASSAGE_TOKENS = 64  # tokens per passage window
PASSAGE_STRIDE = 48  # window start step (64-48 = 16-token overlap)


def q_passage_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style passage extraction: fixed-size token windows (64 tokens,
    stride 48 — trailing overlap so no token is orphaned at a boundary)
    with a content sha256 per passage. This is the table an embedding /
    retrieval pipeline materializes from a curated corpus; the passage
    sha doubles as the idempotency key for incremental re-embedding
    (unchanged passages keep their key — the same content-addressable
    identity idea as libchunk's K-keys, /root/reference/bits/chunks.go,
    at passage granularity).

    Shape: pure map-side — tokenize, slice windows from the token array,
    explode; no shuffle at all (the engine's cheapest possible op class:
    trivially 100 TB-safe, parallel in the scan).

    The last window is the one starting at the final stride step that
    still has unseen tokens: starts = 0, 48, 96, ... < n_tokens, each
    window = min(64, remaining) tokens — short docs yield exactly one
    window of all their tokens.
    """
    return passages_of(_docs(spark, sf_dir))


def passages_of(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, passage_idx, start_token, passage_tokens, passage_sha) for a
    documents-shaped frame — the reusable core of q_passage_windows,
    shared with the streaming maintainer
    (streaming/aggmaint.py::start_passage_maintenance) so batch and
    maintained tables agree by construction."""
    t = F.col("_t")
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.ceil((F.size(t) - PASSAGE_TOKENS) / PASSAGE_STRIDE), F.lit(0)
        ).cast("int")
        * PASSAGE_STRIDE,
        F.lit(PASSAGE_STRIDE),
    )
    wins = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(t, s + 1, PASSAGE_TOKENS))
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            # staged token array: the window lambda must not re-split the
            # text per passage (no CSE inside HOF lambdas, _grams3_of)
            F.split(F.col(text_col), " ").alias("_t"),
        )
        .select(
            "doc_id",
            F.size(t).alias("n_tokens"),
            F.posexplode(wins).alias("pidx", "passage"),
        )
        .select(
            "doc_id",
            F.col("pidx").cast("int").alias("passage_idx"),
            (F.col("pidx") * PASSAGE_STRIDE).cast("int").alias("start_token"),
            F.least(
                F.lit(PASSAGE_TOKENS),
                F.col("n_tokens") - F.col("pidx") * PASSAGE_STRIDE,
            ).cast("int").alias("passage_tokens"),
            F.sha2(F.col("passage"), 256).alias("passage_sha"),
        )
    )


SQL_PASSAGE_WINDOWS = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
),
wins AS (
  SELECT doc_id, n_tokens,
         unnest(generate_series(
           0,
           greatest(CAST(ceil((n_tokens - {PASSAGE_TOKENS})
                              / {PASSAGE_STRIDE}.0) AS BIGINT), 0)
             * {PASSAGE_STRIDE},
           {PASSAGE_STRIDE})) AS start_token,
         toks
  FROM base
)
SELECT doc_id,
       CAST(start_token / {PASSAGE_STRIDE} AS INT) AS passage_idx,
       CAST(start_token AS INT) AS start_token,
       CAST(least({PASSAGE_TOKENS}, n_tokens - start_token) AS INT)
         AS passage_tokens,
       sha256(array_to_string(
         toks[CAST(start_token + 1 AS INT):
              CAST(start_token + {PASSAGE_TOKENS} AS INT)], ' '))
         AS passage_sha
FROM wins
"""


def chunk_dup_detail(corpus: DataFrame, cfg) -> DataFrame:
    """(file_id, total_bytes, n_chunks, n_dup_spans, dup_bytes) — per-file
    duplicated-byte accounting over the content-defined chunk table: a
    chunk key occurring >= 2 times anywhere is duplicated; consecutive dup
    chunks (by pos) merge into spans. The reusable core of
    q_chunk_dup_spans; targeted pytests assert the quantitative CDC
    re-sync guarantees on planted partial copies."""
    from pyspark.sql import Window

    res = split(corpus, cfg, keep_payload=False)
    ch = res.chunks.select("file_id", "pos", "length", "k")
    dup_keys = (
        ch.groupBy("k").agg(F.count("*").alias("c")).where("c >= 2").select("k")
    )
    hits = ch.join(dup_keys, "k").select("file_id", "pos", "length")
    w = Window.partitionBy("file_id").orderBy("pos")
    spans = (
        hits.withColumn(
            "brk",
            F.when(F.col("pos") - F.lag("pos").over(w) > 1, 1).otherwise(0),
        )
        .withColumn("g", F.sum("brk").over(w))
        .groupBy("file_id", "g")
        .agg(F.sum("length").alias("span_bytes"))
        .groupBy("file_id")
        .agg(
            F.count("*").alias("n_dup_spans"),
            F.sum("span_bytes").cast("long").alias("dup_bytes"),
        )
    )
    totals = ch.groupBy("file_id").agg(
        F.sum("length").cast("long").alias("total_bytes"),
        F.count("*").alias("n_chunks"),
    )
    return totals.join(spans, "file_id", "left").select(
        "file_id",
        "total_bytes",
        "n_chunks",
        F.coalesce("n_dup_spans", F.lit(0)).alias("n_dup_spans"),
        F.coalesce("dup_bytes", F.lit(0)).alias("dup_bytes"),
    )


def q_chunk_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity ExactSubstr accounting — the PRODUCTION form of
    dup_substrings at 10^12-file scale: duplicated-byte accounting over
    the content-defined CHUNK table instead of per-character windows.
    Shuffle volume drops from one row per character to one row per chunk
    (KBs of payload per row), and the chunk keys are the sha256 K-keys
    libchunk already materializes (/root/reference/bits/chunks.go) — the
    dedup index IS the dup-span index. A key appearing >= 2 times marks
    duplicated bytes; consecutive dup chunks in a doc merge into spans
    (CDC boundary re-sync makes shared runs contiguous at chunk level,
    which is the property that lets content-defined chunking find shared
    content across shifted copies at all).

    Invariant oracle (chunk boundaries aren't SQL-expressible — same
    pattern as chunk_stats): output columns the oracle CAN compute
    (total_bytes == strlen(text); is_exact_dup == text occurs >= 2x) plus
    dup_ok, which Spark asserts from the chunk side: 0 <= dup_bytes <=
    total_bytes, span bounds (n_dup_spans * min-1-chunk <= dup chunks),
    and the identity contract — an exact-dup doc chunked deterministically
    is 100% chunk-duplicated. dup_frac/span detail are pinned by the
    targeted pytests (planted partial copies) rather than the SQL oracle.
    """
    corpus = _docs_corpus(spark, sf_dir)
    detail = chunk_dup_detail(corpus, DOCS_CONFIG.chunk)
    from pyspark.sql import Window

    exact = _docs(spark, sf_dir).select(
        F.col("doc_id").alias("file_id"),
        (
            F.count("*").over(Window.partitionBy(F.sha2("text", 256))) >= 2
        ).alias("is_exact_dup"),
    )
    per = detail.join(exact, "file_id")
    return per.select(
        F.col("file_id").alias("doc_id"),
        "total_bytes",
        "is_exact_dup",
        (
            (F.col("dup_bytes") >= 0)
            & (F.col("dup_bytes") <= F.col("total_bytes"))
            & (F.col("n_dup_spans") <= F.col("dup_bytes"))  # spans are >=1 byte
            & (~F.col("is_exact_dup") | (F.col("dup_bytes") == F.col("total_bytes")))
        ).alias("dup_ok"),
    )


SQL_CHUNK_DUP_SPANS = """
SELECT doc_id, strlen(text) AS total_bytes,
       count(*) OVER (PARTITION BY md5(text)) >= 2 AS is_exact_dup,
       true AS dup_ok
FROM documents
"""


BAND_SKEW_CAP = 8  # bucket-size cap the allpairs generator degrades at


def q_band_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-skew audit over the LSH band buckets — the operational
    query behind the north rule's "explicit repartitioning on band-hash
    keys to keep shuffle skew bounded": per band, the (band, band_sig)
    bucket-size distribution (max, exact p99), how many buckets exceed
    the allpairs cap (those degrade to star edges), and the exact
    candidate-pair volume sum(c*(c-1)/2) each band would emit — the
    shuffle-cost predictor a pipeline watches to re-tune band width /
    caps / salting before a mega-cluster melts an executor.

    Scale: bucket sizes are ONE partial-agg shuffle on (band, band_sig) —
    the same key the candidate join shuffles on, so at scale the exchange
    is shared — and the report itself is n_bands rows. The p99 uses exact
    interpolated percentile (== DuckDB quantile_cont, parity proven by
    event_quantiles); production would swap percentile_approx at the
    approx_event_quantiles contract.
    """
    wide = _minhash_wide(spark, sf_dir)
    n_bands = N_PERMS_SQL // BAND_ROWS_SQL
    sigs = [
        F.md5(
            F.concat_ws(
                ",",
                *[
                    F.col(f"mh{b * BAND_ROWS_SQL + r}").cast("string")
                    for r in range(BAND_ROWS_SQL)
                ],
            )
        )
        for b in range(n_bands)
    ]
    bands = wide.select(
        "doc_id", F.posexplode(F.array(*sigs)).alias("band", "band_sig")
    )
    sizes = bands.groupBy("band", "band_sig").agg(F.count("*").alias("c"))
    return (
        sizes.groupBy("band")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("c").cast("long").alias("n_docs"),
            F.max("c").alias("max_bucket"),
            F.round(F.expr("percentile(c, 0.99D)"), 4).alias("p99_bucket"),
            F.sum(
                F.when(F.col("c") > BAND_SKEW_CAP, 1).otherwise(0)
            ).cast("long").alias("n_over_cap"),
            F.sum(F.floor(F.col("c") * (F.col("c") - 1) / 2))
            .cast("long")
            .alias("cand_pairs"),
        )
        .select(
            F.col("band").cast("int").alias("band"),
            "n_buckets",
            "n_docs",
            "max_bucket",
            "p99_bucket",
            "n_over_cap",
            "cand_pairs",
        )
    )


SQL_BAND_SKEW_REPORT = f"""
WITH mh AS ({_sql_minhash_core()}),
bands AS (
  SELECT doc_id, CAST(floor(perm / {BAND_ROWS_SQL}) AS BIGINT) AS band,
         md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY perm)) AS band_sig
  FROM mh GROUP BY doc_id, 2
),
sizes AS (SELECT band, band_sig, count(*) AS c FROM bands GROUP BY 1, 2)
SELECT CAST(band AS INT) AS band,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(c) AS BIGINT) AS n_docs,
       CAST(max(c) AS BIGINT) AS max_bucket,
       round(quantile_cont(c, 0.99), 4) AS p99_bucket,
       CAST(sum(CASE WHEN c > {BAND_SKEW_CAP} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_over_cap,
       CAST(sum(c * (c - 1) // 2) AS BIGINT) AS cand_pairs
FROM sizes GROUP BY band
"""


def q_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signature-quality calibration audit: over the LSH candidate pairs,
    compare the MinHash Jaccard ESTIMATE (fraction of agreeing perms,
    k/16 — exactly representable) against the EXACT Jaccard of the same
    uncapped distinct-3-gram sets the signatures were built from, and
    emit one row of (n_pairs, mean_abs_err, max_abs_err, bias). This is
    the measurement behind the north rule's "same shingle/signature
    config" clause: recall (lsh_eval_metrics) says the bands catch the
    pairs; calibration says the signature WIDTH is sized right (E[err] ~
    1/sqrt(n_perms)) before anyone trusts est-based thresholds.

    Scale: the candidate set is the bounded LSH output; the exact side is
    one gram equi-join restricted to candidate docs — at 10^12 files this
    runs on the stratified sample (sample_stratified), same policy as
    lsh_eval_metrics. Estimates join as ONE wide row per doc (mh0..mh15,
    no 16x explosion).
    """
    # ONE wide-MinHash pass: the band self-join and both est-join sides
    # exchange on different keys ((band, band_sig) / a / b), so without a
    # checkpoint the gram-explode + md5 + 16-min aggregation subplan runs
    # three times (no exchange reuse across different partitionings).
    wide = _minhash_wide(spark, sf_dir).localCheckpoint()
    bands = _band_sigs_of(wide)
    l, r = bands.alias("l"), bands.alias("r")
    pairs = (
        l.join(r, ["band", "band_sig"])
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )  # == q_lsh_band_pairs over the same wide frame
    wa = wide.select(
        F.col("doc_id").alias("a"),
        *[F.col(f"mh{i}").alias(f"xa{i}") for i in range(N_PERMS_SQL)],
    )
    wb = wide.select(
        F.col("doc_id").alias("b"),
        *[F.col(f"mh{i}").alias(f"xb{i}") for i in range(N_PERMS_SQL)],
    )
    agree = sum(
        F.when(F.col(f"xa{i}") == F.col(f"xb{i}"), 1).otherwise(0)
        for i in range(N_PERMS_SQL)
    )
    est = (
        pairs.join(wa, "a")
        .join(wb, "b")
        .select("a", "b", (agree / F.lit(N_PERMS_SQL)).alias("est"))
    )
    # exact Jaccard over the SAME sets the signature hashed: uncapped
    # distinct 3-grams (ngram_jaccard_pairs df-caps; the signature does
    # not, so the calibration must not either)
    grams = _gram_rows(_docs(spark, sf_dir), "doc_id")
    # |gram set| comes off the checkpointed wide row (same count as a
    # groupBy over grams — _minhash_wide aggregates the identical distinct
    # gram stream), so the explode runs only for the intersection join
    # (whose l/r sides share one exchange on gram).
    sizes = wide.select("doc_id", "sz")
    l, r = grams.alias("l"), grams.alias("r")
    inter = (
        l.join(r, "gram")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .agg(F.count("*").alias("i"))
    )
    scored = (
        est.join(inter, ["a", "b"], "left")
        .join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("nb")), "b")
        .select(
            "est",
            (
                F.coalesce("i", F.lit(0))
                / (F.col("na") + F.col("nb") - F.coalesce("i", F.lit(0)))
            ).alias("jac"),
        )
    )
    return scored.agg(
        F.count("*").alias("n_pairs"),
        F.round(F.avg(F.abs(F.col("est") - F.col("jac"))), 4).alias("mean_abs_err"),
        F.round(F.max(F.abs(F.col("est") - F.col("jac"))), 4).alias("max_abs_err"),
        F.round(F.avg(F.col("est") - F.col("jac")), 4).alias("bias"),
    )


SQL_MINHASH_CALIBRATION = f"""
WITH mh AS ({_sql_minhash_core()}),
bands AS (
  SELECT doc_id, CAST(floor(perm / {BAND_ROWS_SQL}) AS BIGINT) AS band,
         md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY perm)) AS band_sig
  FROM mh GROUP BY doc_id, 2
),
pairs AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r ON l.band = r.band AND l.band_sig = r.band_sig
  WHERE l.doc_id < r.doc_id
),
est AS (
  SELECT p.a, p.b,
         sum(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END)
           / CAST({N_PERMS_SQL} AS DOUBLE) AS est
  FROM pairs p
  JOIN mh ma ON ma.doc_id = p.a
  JOIN mh mb ON mb.doc_id = p.b AND mb.perm = ma.perm
  GROUP BY 1, 2
),
grams AS ({_SQL_GRAMS3}),
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
inter AS (
  SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS i
  FROM grams l JOIN grams r ON l.gram = r.gram AND l.doc_id < r.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT e.est,
         coalesce(i.i, 0)
           / CAST(na.sz + nb.sz - coalesce(i.i, 0) AS DOUBLE) AS jac
  FROM est e
  LEFT JOIN inter i ON i.a = e.a AND i.b = e.b
  JOIN sizes na ON na.doc_id = e.a
  JOIN sizes nb ON nb.doc_id = e.b
)
SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       round(avg(abs(est - jac)), 4) AS mean_abs_err,
       round(max(abs(est - jac)), 4) AS max_abs_err,
       round(avg(est - jac), 4) AS bias
FROM scored
"""


def q_passage_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental re-embedding delta on content-addressed passage
    identity: given an old corpus snapshot (doc_id % 10 != 0) and a new
    one (doc_id % 10 != 1 — deterministic stand-ins for two ingest
    snapshots), classify every distinct passage_sha as added / removed /
    unchanged. The 'added' set is EXACTLY the embedding work an
    incremental pipeline schedules; 'unchanged' passages keep their
    embeddings by key — the same content-addressable skip libchunk's
    indexed move performs on chunk K-keys
    (/root/reference/bits/move.go), lifted to passage granularity.

    Shape: distinct-sha per side (one partial-agg shuffle each, crypto
    keys so skew-free), then anti/semi joins on the sha — Spark's set-op
    plans; the DuckDB oracle states the same thing as EXCEPT/INTERSECT.
    At 10^12 files both sides are passage tables the pipeline already
    materializes; the delta never touches text.
    """
    p = q_passage_windows(spark, sf_dir).select("doc_id", "passage_sha")
    # each snapshot feeds three set operations (anti x2 / semi); without a
    # checkpoint the passage-extraction pipeline re-runs per consumer.
    # The two snapshot materializations are independent -> concurrent
    # driver-thread jobs (guide §2.6).
    from concurrent.futures import ThreadPoolExecutor

    def _snap(excl: int):
        return (
            p.where(F.col("doc_id") % 10 != excl)
            .select("passage_sha").distinct().localCheckpoint()
        )

    with ThreadPoolExecutor(2) as ex:
        f_old, f_new = ex.submit(_snap, 0), ex.submit(_snap, 1)
        old, new = f_old.result(), f_new.result()
    added = new.join(old, "passage_sha", "left_anti").agg(
        F.count("*").alias("n_shas")
    ).select(F.lit("added").alias("change"), "n_shas")
    removed = old.join(new, "passage_sha", "left_anti").agg(
        F.count("*").alias("n_shas")
    ).select(F.lit("removed").alias("change"), "n_shas")
    unchanged = new.join(old, "passage_sha", "left_semi").agg(
        F.count("*").alias("n_shas")
    ).select(F.lit("unchanged").alias("change"), "n_shas")
    return added.unionAll(removed).unionAll(unchanged)


SQL_PASSAGE_DELTA = f"""
WITH p AS ({SQL_PASSAGE_WINDOWS}),
old AS (SELECT DISTINCT passage_sha FROM p WHERE doc_id % 10 != 0),
new AS (SELECT DISTINCT passage_sha FROM p WHERE doc_id % 10 != 1)
SELECT 'added' AS change, CAST(count(*) AS BIGINT) AS n_shas
FROM (SELECT passage_sha FROM new EXCEPT SELECT passage_sha FROM old)
UNION ALL
SELECT 'removed' AS change, CAST(count(*) AS BIGINT) AS n_shas
FROM (SELECT passage_sha FROM old EXCEPT SELECT passage_sha FROM new)
UNION ALL
SELECT 'unchanged' AS change, CAST(count(*) AS BIGINT) AS n_shas
FROM (SELECT passage_sha FROM new INTERSECT SELECT passage_sha FROM old)
"""


# Contract bounds for the PRODUCTION 128-perm calibration (margins over
# measured sf0.01/sf0.1 values; see tests/test_recall.py for the
# corpus-level twin with tighter bounds).
MINHASH_PROD_MIN_PAIRS = 10
MINHASH_PROD_MAE_MAX = 0.05
MINHASH_PROD_MAXERR_MAX = 0.25
MINHASH_PROD_BIAS_BAND = 0.05


def q_minhash_calibration_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration audit for the PRODUCTION 128-perm affine MinHash family
    (functions/signatures.py::minhash_signature, a*h+b mod 2^64 odd-a) —
    the VERDICT r06 follow-through on "recall floors alone do NOT validate
    a sketch": the SQL-demo family shipped five rounds with est==1.0 for
    any pair sharing the argmin gram because its perms never wrapped, and
    the production family's only estimator evidence was a single pair at
    ±0.12 tolerance.

    Over the production LSH candidate pairs of the documents corpus,
    compare the signature estimate (fraction of agreeing perms) against
    the EXACT Jaccard of the same content-defined shingle sets the
    signatures reduced (both computed in Spark; the chunker is not
    SQL-expressible). Emits the recall-floor-style contract row: n_docs
    (SQL-anchored) plus verdicts n_pairs_ok / mae_ok / maxerr_ok /
    bias_ok. Measured: sf0.01 n=21 pairs, mae 0.0277, maxerr 0.0547,
    bias +0.0098; sf0.1 n=212, mae 0.0318, maxerr 0.1295, bias +0.0044 —
    bounds carry ~2x margin at both scales (no knife-edge floors). The
    small positive bias is band-selection conditioning (pairs exist
    BECAUSE some bands agree), shared with q_minhash_calibration.

    Scale: pairs are the bounded LSH output; the exact side explodes
    shingles only for docs appearing in a pair (semi-join prune) and
    equi-joins on the 64-bit shingle hash — skew-free crypto-ish keys.
    """
    corpus, scored = _minhash_prod_scored(
        spark, sf_dir, lambda x, y: F.when(x == y, 1).otherwise(0)
    )
    agg = scored.agg(
        F.count("*").alias("n_pairs"),
        F.avg(F.abs(F.col("est") - F.col("jac"))).alias("mae"),
        F.max(F.abs(F.col("est") - F.col("jac"))).alias("maxerr"),
        F.avg(F.col("est") - F.col("jac")).alias("bias"),
    )
    return (
        corpus.agg(F.count("*").alias("n_docs"))
        .crossJoin(agg)
        .select(
            "n_docs",
            (F.col("n_pairs") >= MINHASH_PROD_MIN_PAIRS).alias("n_pairs_ok"),
            (F.col("mae") <= MINHASH_PROD_MAE_MAX).alias("mae_ok"),
            (F.col("maxerr") <= MINHASH_PROD_MAXERR_MAX).alias("maxerr_ok"),
            (F.abs(F.col("bias")) <= MINHASH_PROD_BIAS_BAND).alias("bias_ok"),
        )
    )


def _minhash_prod_scored(spark, sf_dir, agree_fn, correction=None):
    """Shared est-vs-exact scaffolding for production-signature calibration
    contracts: (corpus, scored) where scored has one row per LSH candidate
    pair with `est` (fraction of agreeing perms under `agree_fn`, passed
    through `correction` if given) and `jac` (exact Jaccard of the same
    content-defined shingle sets, semi-join-pruned to candidate docs)."""
    from libchunk_spark.config import DOCS_CONFIG
    from libchunk_spark.fixtures import documents_as_corpus
    from libchunk_spark.functions.udfs import (
        SHINGLE_ROWS_SCHEMA,
        make_shingle_rows_generator,
    )
    from libchunk_spark.operators.lsh import minhash_candidate_edges
    from libchunk_spark.operators.sign import sign

    corpus = documents_as_corpus(spark, sf_dir)
    # materialize the signature pass once: sigs feeds the candidate edges
    # AND both est-join sides, whose exchanges hash on different keys
    # (band_sig / a / b) so exchange reuse never dedupes them — without
    # the checkpoint the signature UDF re-runs once per instantiation
    # (3x measured). Bounded: one row per doc (128 longs + bands).
    sigs = sign(corpus, DOCS_CONFIG).localCheckpoint()
    pairs = (
        minhash_candidate_edges(sigs, DOCS_CONFIG)
        .select("a", "b")
        .localCheckpoint()  # reused by est AND cand_docs (different keys)
    )
    nperm = DOCS_CONFIG.signature.num_perms
    ma = sigs.select(F.col("file_id").alias("a"), F.col("minhash").alias("ma"))
    mb = sigs.select(F.col("file_id").alias("b"), F.col("minhash").alias("mb"))
    agree = F.aggregate(
        F.zip_with("ma", "mb", agree_fn),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    raw = agree / F.lit(nperm)
    est = (
        pairs.join(ma, "a")
        .join(mb, "b")
        .select("a", "b", (correction(raw) if correction else raw).alias("est"))
    )
    cand_docs = (
        pairs.select(F.col("a").alias("file_id"))
        .unionAll(pairs.select(F.col("b").alias("file_id")))
        .distinct()
    )
    sh = (
        corpus.join(cand_docs, "file_id", "left_semi")
        .select("file_id", "content")
        .mapInPandas(
            make_shingle_rows_generator(DOCS_CONFIG.shingle), SHINGLE_ROWS_SCHEMA
        )
        # sizes exchanges on file_id, the self-join on sh — no reuse
        # between them, so the shingle UDF would run the candidate docs
        # twice; one bounded materialization (candidate docs only).
        .localCheckpoint()
    )
    sizes = sh.groupBy("file_id").agg(F.count("*").alias("sz"))
    inter = (
        sh.select(F.col("file_id").alias("a"), "sh")
        .join(sh.select(F.col("file_id").alias("b"), "sh"), "sh")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("i"))
    )
    scored = (
        est.join(inter, ["a", "b"], "left")
        .join(sizes.select(F.col("file_id").alias("a"), F.col("sz").alias("na")), "a")
        .join(sizes.select(F.col("file_id").alias("b"), F.col("sz").alias("nb")), "b")
        .select(
            "est",
            (
                F.coalesce("i", F.lit(0))
                / (F.col("na") + F.col("nb") - F.coalesce("i", F.lit(0)))
            ).alias("jac"),
        )
    )
    return corpus, scored


SQL_MINHASH_CALIBRATION_PROD = """
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       true AS n_pairs_ok, true AS mae_ok, true AS maxerr_ok, true AS bias_ok
FROM documents
"""


# b-bit MinHash (Li & Koenig, WWW 2010 / CACM 2011): store only the lowest
# b bits of each of the 128 production perms — 32x smaller signatures at
# b=2 (the first-order storage cost at 10^12 docs) — and correct the
# collision inflation: E[agree] = C + (1-C)*J with C ~= 1/2^b for ~uniform
# min-hash values, so J_hat = (agree_frac - C)/(1 - C). Variance rises by
# ~1/(1-C)^2 vs the full-width estimator; bounds below are measured (sf0.01
# n=21: mae 0.0652, maxerr 0.275, bias -0.013; sf0.1 n=212: mae 0.0738,
# maxerr 0.365, bias -0.007 — ~2.3x the full-width family's mae, the
# quantified cost of the 32x storage cut) with ~2x margin, alongside the
# full-family contract so the two estimators' error budgets stay
# side-by-side.
BBIT_B = 2
BBIT_COLLISION = 1.0 / (1 << BBIT_B)
BBIT_MIN_PAIRS = 10
BBIT_MAE_MAX = 0.15
BBIT_MAXERR_MAX = 0.55
BBIT_BIAS_BAND = 0.04


def q_bbit_minhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration contract for b-bit MinHash over the PRODUCTION 128-perm
    family: agreement counted on the lowest BBIT_B bits only (int64
    bitwiseAND — sign-safe on two's complement), estimator corrected for
    random collisions per Li & Koenig, compared against the exact Jaccard
    of the same content-defined shingle sets (shared scaffolding with
    q_minhash_calibration_prod — same LSH candidate pairs, same semi-join
    prune, same contract row shape).

    Why it exists: at 10^12 files the signature TABLE is the storage cost
    (128 x 8 bytes/doc = 1 TB/10^9 docs); b=2 cuts it 32x. The contract
    quantifies what that buys back in estimator error so the trade is a
    measured one, per the "recall floors alone do NOT validate a sketch"
    rule."""
    mask = F.lit((1 << BBIT_B) - 1)
    c = BBIT_COLLISION
    corpus, scored = _minhash_prod_scored(
        spark,
        sf_dir,
        lambda x, y: F.when(x.bitwiseAND(mask) == y.bitwiseAND(mask), 1).otherwise(0),
        correction=lambda raw: (raw - F.lit(c)) / F.lit(1.0 - c),
    )
    agg = scored.agg(
        F.count("*").alias("n_pairs"),
        F.avg(F.abs(F.col("est") - F.col("jac"))).alias("mae"),
        F.max(F.abs(F.col("est") - F.col("jac"))).alias("maxerr"),
        F.avg(F.col("est") - F.col("jac")).alias("bias"),
    )
    return (
        corpus.agg(F.count("*").alias("n_docs"))
        .crossJoin(agg)
        .select(
            "n_docs",
            (F.col("n_pairs") >= BBIT_MIN_PAIRS).alias("n_pairs_ok"),
            (F.col("mae") <= BBIT_MAE_MAX).alias("mae_ok"),
            (F.col("maxerr") <= BBIT_MAXERR_MAX).alias("maxerr_ok"),
            (F.abs(F.col("bias")) <= BBIT_BIAS_BAND).alias("bias_ok"),
        )
    )


SQL_BBIT_MINHASH_CALIBRATION = """
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       true AS n_pairs_ok, true AS mae_ok, true AS maxerr_ok, true AS bias_ok
FROM documents
"""


# ------------------------------------------------- weighted (multiset) ops

WJAC_DF_CAP = 64  # gram document-frequency cap (same role as NGRAM_DF_CAP)
WJAC_THRESHOLD = 0.4


def _grams3_all_of(t: Column) -> Column:
    """word 3-gram array WITH repeats (the multiset _grams3_of distincts),
    from an already-materialized token-array column (see _grams3_of)."""
    return F.when(
        F.size(t) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(t) - 3),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _grams3_all():
    """single-expression multiset-3gram form (tests/short texts only —
    re-splits per gram, see _grams3_of)"""
    return _grams3_all_of(_tokens())


def _tf_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tok, tf) 3-gram occurrence counts restricted to grams
    appearing in <= WJAC_DF_CAP documents.

    The weighted space is the word-3-GRAM multiset, not raw tokens: a
    document-frequency cap on single words stops working as the corpus
    grows (every word's df scales with corpus size, so at sf0.1 virtually
    all tokens cap out and the pair set collapses to empty — measured),
    while a content-bearing gram's df tracks its duplicate family, the
    same scale argument q_ngram_jaccard_pairs already rides. The df cap
    is a window count over the gram partition so the gram explosion is
    exchanged ONCE and the downstream self-join reuses it."""
    from pyspark.sql import Window

    tf = (
        _docs(spark, sf_dir)
        .select("doc_id", _tokens().alias("_t"))
        .select("doc_id", F.explode(_grams3_all_of(F.col("_t"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    return (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("tok")))
        .where(F.col("df") <= WJAC_DF_CAP)
        .drop("df")
    )


def _weighted_pair_scores(tf: DataFrame) -> DataFrame:
    """(a, b, na, nb, wmin, wjac) multiset-Jaccard scores over co-token
    pairs of a (doc_id, tok, tf) table: wjac = sum(min tf)/sum(max tf),
    with sum(max) = na + nb - sum(min) so only the intersection joins."""
    sizes = tf.groupBy("doc_id").agg(F.sum("tf").alias("sz"))
    l, r = tf.alias("l"), tf.alias("r")
    inter = (
        l.join(r, "tok")
        .where(F.col("l.doc_id") < F.col("r.doc_id"))
        .groupBy(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .agg(F.sum(F.least("l.tf", "r.tf")).alias("wmin"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("na")), "a")
        .join(sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("nb")), "b")
        .withColumn(
            "wjac",
            F.round(
                F.col("wmin") / (F.col("na") + F.col("nb") - F.col("wmin")), 4
            ),
        )
    )


def q_weighted_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted (multiset) Jaccard pairs >= threshold over word-3-gram
    occurrence counts: J_w = sum_g min(tf_a, tf_b) / sum_g max(tf_a, tf_b),
    restricted to grams with document frequency <= WJAC_DF_CAP (identical
    restriction in the oracle). q_ngram_jaccard_pairs treats a gram seen
    once and fifty times identically; the weighted form is the standard
    refinement for repetition-aware near-dup scoring (code files repeat
    boilerplate lines), and it is the exact quantity the ICWS sketch of
    wminhash_calibration estimates.

    Scale shape: identical cost envelope to q_ngram_jaccard_pairs — the df
    cap bounds every gram's fan-out before the self-join, sum(max) is
    derived from per-doc sizes so only the intersection shuffles, and the
    capped tf table's exchange is reused by both join sides."""
    return (
        # NOT checkpointed: A/B'd 5.7 s lazy vs 6.4 s checkpointed at 10x
        # scale — the tf re-instantiation for sizes is cheaper than
        # materializing the 2.6M-row tf table (contrast wminhash_
        # calibration, where THREE consumers flip the trade).
        _weighted_pair_scores(_tf_capped(spark, sf_dir))
        .where(F.col("wjac") >= WJAC_THRESHOLD)
        .select("a", "b", "wjac")
    )


_SQL_GRAM_OCCURRENCES = """
    SELECT doc_id, array_to_string(t[i:i+2], ' ') AS tok
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
"""

_SQL_TF_CAPPED = f"""
  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
  FROM ({_SQL_GRAM_OCCURRENCES}) u
  GROUP BY doc_id, tok
  HAVING tok IN (
    SELECT tok
    FROM (SELECT DISTINCT doc_id, tok FROM ({_SQL_GRAM_OCCURRENCES}) v) w
    GROUP BY tok HAVING count(*) <= {WJAC_DF_CAP})
"""

SQL_WEIGHTED_JACCARD_PAIRS = f"""
WITH tf AS ({_SQL_TF_CAPPED}),
sizes AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS sz FROM tf GROUP BY 1),
inter AS (
  SELECT l.doc_id AS a, r.doc_id AS b,
         CAST(sum(least(l.tf, r.tf)) AS BIGINT) AS wmin
  FROM tf l JOIN tf r ON l.tok = r.tok AND l.doc_id < r.doc_id
  GROUP BY 1, 2
)
SELECT a, b,
       round(wmin / CAST(na.sz + nb.sz - wmin AS DOUBLE), 4) AS wjac
FROM inter
JOIN sizes na ON na.doc_id = a
JOIN sizes nb ON nb.doc_id = b
WHERE round(wmin / CAST(na.sz + nb.sz - wmin AS DOUBLE), 4) >= {WJAC_THRESHOLD}
"""


# Exact-threshold all-pairs join (Bayardo et al. WWW'07). 0.5 is dyadic, so
# t*|d| is exact in binary on both engines and the prefix/size-ratio
# boundaries can never disagree cross-engine (candidates are a verified
# superset either way, but exactness keeps the candidate COUNTS comparable
# too). Must stay high enough that pruning is meaningful — prefix length
# grows as (1-t)|d|.
ALLPAIRS_THRESHOLD = 0.5


def q_allpairs_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every doc pair with exact 3-gram-set Jaccard >= 0.5 — no df cap, no
    sketch, recall 1.0 by construction (operators/allpairs.py implements
    Bayardo's prefix-filtering argument).

    Role in the dedup ladder: q_ngram_jaccard_pairs / LSH banding are the
    probabilistic high-recall tiers; this is the EXACT tier for the
    threshold regime (t >= ~0.5) where prefix pruning bites — the operator
    a curation pipeline uses when a guaranteed-complete duplicate list at a
    contractual threshold matters more than the sketch pass's speed. The
    prefix table (rarest-first token ranking) is the only thing the
    self-join shuffles; verification is row-local array_intersect over the
    candidate pairs."""
    from libchunk_spark.operators.allpairs import allpairs_jaccard

    toks = (
        _gram_rows(_docs(spark, sf_dir), "doc_id")
        .withColumnRenamed("gram", "tok")
        # the operator instantiates the token table under FIVE different
        # keys (per-doc sizes, per-token df, the ranked join, and both
        # verify-side collect_set aggregations) — exchange reuse dedupes
        # none of them, so the gram explode would run ~5x.
        .localCheckpoint()
    )
    return allpairs_jaccard(toks, ALLPAIRS_THRESHOLD).select("a", "b", "jac")


SQL_ALLPAIRS_JACCARD = f"""
WITH toks AS (
  SELECT doc_id, gram AS tok FROM ({_SQL_GRAMS3}) g
),
sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM toks GROUP BY doc_id),
dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY tok),
ranked AS (
  SELECT t.doc_id, t.tok, s.sz,
         row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.tok) AS rn
  FROM toks t JOIN dfreq d USING (tok) JOIN sizes s USING (doc_id)
),
prefix AS (
  SELECT doc_id, tok, sz FROM ranked
  WHERE rn <= sz - CAST(ceil({ALLPAIRS_THRESHOLD} * sz) AS BIGINT) + 1
),
cand AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b, l.sz AS na, r.sz AS nb
  FROM prefix l JOIN prefix r ON l.tok = r.tok
  WHERE l.doc_id < r.doc_id
    AND r.sz >= {ALLPAIRS_THRESHOLD} * l.sz
    AND l.sz >= {ALLPAIRS_THRESHOLD} * r.sz
),
inter AS (
  SELECT c.a, c.b, c.na, c.nb, CAST(count(*) AS BIGINT) AS i
  FROM cand c
  JOIN toks ta ON ta.doc_id = c.a
  JOIN toks tb ON tb.doc_id = c.b AND tb.tok = ta.tok
  GROUP BY c.a, c.b, c.na, c.nb
)
SELECT a, b, round(i / (na + nb - i), 4) AS jac
FROM inter
WHERE round(i / (na + nb - i), 4) >= {ALLPAIRS_THRESHOLD}
"""


# ICWS contract bounds — ~2x margin over measured values at BOTH scales
# (sf0.01: n=29 pairs, mae 0.0199, maxerr 0.0375, bias -0.0001;
#  sf0.1:  n=589,      mae 0.0271, maxerr 0.1319, bias +0.0008)
ICWS_K = 32
ICWS_SEED = 0x1C3517
ICWS_CAL_MIN = 0.05  # calibration pair floor on exact wjac
ICWS_MIN_PAIRS = 10
ICWS_MAE_MAX = 0.05
ICWS_MAXERR_MAX = 0.25
ICWS_BIAS_BAND = 0.03


def q_wminhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration contract for the ICWS weighted-MinHash sketch (Ioffe
    2010): over the co-token pairs with exact weighted Jaccard >=
    ICWS_CAL_MIN, compare the sketch estimate (fraction of agreeing
    packed samples, K=32) against the exact multiset Jaccard of the SAME
    df-capped tf sets, and emit the recall-floor-style contract row:
    n_docs (SQL-anchored) + n_pairs_ok / mae_ok / maxerr_ok / bias_ok.

    Discipline note (hard-won, r6): the sketch's randomness is DERIVED
    from splitmix64 mixing, so a shared-construction oracle would be
    blind to a degenerate family — this contract measures est against an
    exact quantity computed by independent arithmetic, and
    tests/test_recall.py adds pure-Python planted-pair mae bounds plus a
    sample-diversity guard (the r6 defect class — all samples collapsing
    to one effective permutation — reads est ~ 1.0 here and fails mae_ok).

    Scale: the token hashing (xxhash64) is JVM-side; the ICWS argmin is
    one Arrow-batched pandas UDF over per-doc (hash, tf) arrays — map-only
    after the tf aggregation; the exact side is the bounded df-capped
    token self-join shared with q_weighted_jaccard_pairs."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from libchunk_spark.functions.signatures import icws_samples

    # tf feeds the checkpointed pair pipeline and BOTH icws sample sides
    # (sa/sb) — three instantiations on different keys without this
    tf = _tf_capped(spark, sf_dir).localCheckpoint()
    grouped = (
        tf.select("doc_id", F.xxhash64("tok").alias("th"), "tf")
        .groupBy("doc_id")
        .agg(F.collect_list("th").alias("ths"), F.collect_list("tf").alias("tfs"))
    )

    def _icws_fn(ths, tfs):
        import numpy as np

        return pd.Series(
            [
                icws_samples(
                    np.asarray(h, dtype=np.int64).view(np.uint64),
                    np.asarray(w, dtype=np.float64),
                    ICWS_K,
                    ICWS_SEED,
                )
                for h, w in zip(ths, tfs)
            ]
        )

    # real annotation objects: the module's `from __future__ import
    # annotations` would stringify inline hints, and PySpark resolves
    # string hints against module globals where pd is not imported
    _icws_fn.__annotations__ = {
        "ths": pd.Series, "tfs": pd.Series, "return": pd.Series,
    }
    icws_udf = pandas_udf(_icws_fn, "array<long>")

    pairs = (
        _weighted_pair_scores(tf)
        .where(F.col("wjac") >= ICWS_CAL_MIN)
        .select("a", "b", "wjac")
        # reused by cand_docs AND the est join (different keys, no
        # exchange reuse): without this the whole weighted-pair pipeline
        # runs twice. Bounded: pairs past the wjac floor.
        .localCheckpoint()
    )
    # sample ONLY candidate docs (semi-join prune, the prod-calibration
    # shape): Catalyst instantiates the sampling subplan once per join
    # side, so restricting it to the bounded candidate set keeps the
    # duplicated Arrow UDF work O(candidates), not O(corpus)
    cand_docs = (
        pairs.select(F.col("a").alias("doc_id"))
        .unionAll(pairs.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    sam = (
        grouped.join(cand_docs, "doc_id", "left_semi")
        .select("doc_id", icws_udf("ths", "tfs").alias("s"))
        # NOT checkpointed: the sa/sb joins instantiate this twice, but
        # the semi-join prune keeps each instance O(candidates) (plan-
        # asserted in tests/test_queries_batch6.py) and the checkpointed
        # `pairs` above already removed the dominant duplication.
    )
    agree = F.aggregate(
        F.zip_with("sa", "sb", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    scored = (
        pairs.join(sam.select(F.col("doc_id").alias("a"), F.col("s").alias("sa")), "a")
        .join(sam.select(F.col("doc_id").alias("b"), F.col("s").alias("sb")), "b")
        .select((agree / F.lit(ICWS_K)).alias("est"), "wjac")
    )
    agg = scored.agg(
        F.count("*").alias("n_pairs"),
        F.avg(F.abs(F.col("est") - F.col("wjac"))).alias("mae"),
        F.max(F.abs(F.col("est") - F.col("wjac"))).alias("maxerr"),
        F.avg(F.col("est") - F.col("wjac")).alias("bias"),
    )
    return (
        _docs(spark, sf_dir)
        .agg(F.count("*").alias("n_docs"))
        .crossJoin(agg)
        .select(
            "n_docs",
            (F.col("n_pairs") >= ICWS_MIN_PAIRS).alias("n_pairs_ok"),
            (F.col("mae") <= ICWS_MAE_MAX).alias("mae_ok"),
            (F.col("maxerr") <= ICWS_MAXERR_MAX).alias("maxerr_ok"),
            (F.abs(F.col("bias")) <= ICWS_BIAS_BAND).alias("bias_ok"),
        )
    )


SQL_WMINHASH_CALIBRATION = """
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       true AS n_pairs_ok, true AS mae_ok, true AS maxerr_ok, true AS bias_ok
FROM documents
"""


def q_clone_type1_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-1 code-clone groups: exact copies modulo layout — line
    comments stripped ((//|#) to end of line, the corpus's two comment
    styles), whitespace runs collapsed to one space, ends trimmed; groups
    = sha256 of the normalized text. The classic clone taxonomy's first
    tier (Type-2 = + identifier renames, q_clone_type2_groups; Type-3 =
    + edits, winnow/edit_sim ladder). Catches reformatted copies that
    byte-exact sha dedup misses — the most common clone class in
    vendored/reformatted code.

    Scale: map-only normalization (two JVM regex passes, whole-stage
    codegen) + the crypto-key group window — exact_dup_groups' shuffle
    discipline. Explicit char classes ([ \\t\\r\\n]) instead of \\s so the
    Java and RE2 engines agree byte-for-byte."""
    from pyspark.sql import Window

    canon = F.trim(
        F.regexp_replace(
            F.regexp_replace("text", r"(//|#)[^\n]*", ""),
            r"[ \t\r\n]+",
            " ",
        )
    )
    return (
        _docs(spark, sf_dir, spread=False)
        .select("doc_id", F.sha2(F.encode(canon, "UTF-8"), 256).alias("canon_sha"))
        .withColumn(
            "group_size",
            F.count("*").over(Window.partitionBy("canon_sha")).cast("long"),
        )
        .withColumn("is_clone", F.col("group_size") > 1)
    )


SQL_CLONE_TYPE1_GROUPS = """
WITH canon AS (
  SELECT doc_id,
         sha256(trim(regexp_replace(regexp_replace(text,
                '(//|#)[^\\n]*', '', 'g'), '[ \\t\\r\\n]+', ' ', 'g')))
           AS canon_sha
  FROM documents
)
SELECT doc_id, canon_sha,
       count(*) OVER (PARTITION BY canon_sha) AS group_size,
       count(*) OVER (PARTITION BY canon_sha) > 1 AS is_clone
FROM canon
"""


# CTPH contract bounds: sf0.01 measured values recorded in the docstring
CTPH_MIN_PAIRS = 5
CTPH_MIN_SIM = 0.5


def q_ctph_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract row for the CTPH (ssdeep-style) fuzzy digests
    (operators/ctph.py): digests built from the production chunk config's
    K-keys over the documents corpus, pairs scored at min_sim=0.5. The
    chunker is not SQL-expressible, so like chunk_stats /
    minhash_calibration_prod the oracle anchors n_docs and the verdicts
    are Spark-computed invariants:

    * n_pairs_ok   — the corpus's planted near-dup families produce at
                     least CTPH_MIN_PAIRS digest pairs;
    * sim_bounds_ok— every reported sim in [min_sim, 1];
    * digest_ok    — every digest <= CTPH_MAX_CODES chars of base64url;
    * exact_ok     — every byte-identical file pair (equal content sha)
                     that meets the ngram precondition scores sim = 1.0
                     (identical bytes => identical chunk sequence; the
                     round-trip invariant lifted to digests).

    Scale: digests come from ONE group-by over the existing chunk table
    (order as data); candidates join on df-capped digest 7-grams; scoring
    is levenshtein over <= 128-char strings. tests/test_ctph.py adds the
    planted local-edit robustness checks (CDC re-sync keeps digest
    similarity high under small splices)."""
    from libchunk_spark.config import DOCS_CONFIG
    from libchunk_spark.fixtures import documents_as_corpus
    from libchunk_spark.operators.ctph import (
        CTPH_MAX_CODES,
        ctph_digests,
        ctph_pairs,
    )

    # digest granularity proportional to the corpus: the sf documents are
    # ~0.5 KB toys, so the fine shingle config (~80 B pieces -> ~6-code
    # digests) with a 3-gram precondition is the scaled-down analog of
    # the production put-path chunk table (~30-100 codes, ngram 7)
    corpus = documents_as_corpus(spark, sf_dir)
    # dig feeds the pair grams, dig_agg and the exact-pair length probe;
    # pairs feeds pair_agg and exact_agg — all on different keys, so
    # without checkpoints the chunker+digest subtree runs 3x and the
    # levenshtein pair pipeline 2x. Both frames are tiny (<= 128-char
    # digest / scored pair rows).
    dig = ctph_digests(corpus, DOCS_CONFIG.shingle).localCheckpoint()
    pairs = ctph_pairs(dig, min_sim=CTPH_MIN_SIM, ngram=3).localCheckpoint()
    pair_agg = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.min("sim").alias("min_sim"),
        F.max("sim").alias("max_sim"),
    )
    dig_agg = dig.agg(
        F.max(F.length("digest")).alias("max_len"),
        F.sum(
            F.when(F.col("digest").rlike("^[A-Za-z0-9_-]*$"), 0).otherwise(1)
        ).alias("bad_alpha"),
    )
    sha = corpus.select(
        "file_id", F.sha2(F.encode("content", "UTF-8"), 256).alias("sha")
    )
    exact_pairs = (
        sha.alias("l")
        .join(sha.alias("r"), "sha")
        .where(F.col("l.file_id") < F.col("r.file_id"))
        .join(
            dig.select(F.col("file_id").alias("lid"), F.length("digest").alias("dl")),
            F.col("l.file_id") == F.col("lid"),
        )
        .where(F.col("dl") >= 3)  # below the ngram floor no pair forms
        .select(
            F.col("l.file_id").alias("a"), F.col("r.file_id").alias("b")
        )
    )
    exact_agg = (
        exact_pairs.join(pairs, ["a", "b"], "left")
        .agg(
            F.sum(
                F.when(F.coalesce("sim", F.lit(0.0)) < 1.0, 1).otherwise(0)
            ).alias("bad_exact")
        )
    )
    return (
        _docs(spark, sf_dir)
        .agg(F.count("*").alias("n_docs"))
        .crossJoin(pair_agg)
        .crossJoin(dig_agg)
        .crossJoin(exact_agg)
        .select(
            "n_docs",
            (F.col("n_pairs") >= CTPH_MIN_PAIRS).alias("n_pairs_ok"),
            F.coalesce(
                (F.col("min_sim") >= CTPH_MIN_SIM) & (F.col("max_sim") <= 1.0),
                F.col("n_pairs") == 0,  # vacuously true, n_pairs_ok flags it
            ).alias("sim_bounds_ok"),
            (
                (F.col("max_len") <= CTPH_MAX_CODES) & (F.col("bad_alpha") == 0)
            ).alias("digest_ok"),
            (F.coalesce("bad_exact", F.lit(0)) == 0).alias("exact_ok"),
        )
    )


SQL_CTPH_CONTRACT = """
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       true AS n_pairs_ok, true AS sim_bounds_ok, true AS digest_ok,
       true AS exact_ok
FROM documents
"""


# ----------------------------------------------------- rename detection

RENAME_SIM_THRESHOLD = 0.3  # edited-rename floor (3-gram Jaccard, git -M)


def q_rename_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Git-style rename/move detection between two corpus snapshots:
    odd doc_ids stand in for paths present only in the OLD snapshot
    (deleted), even doc_ids for paths present only in the NEW one (added)
    — the same deterministic snapshot convention as q_passage_delta.
    A deleted/added pair with identical content sha256 is an exact rename
    (git's -M100); a pair with df-capped 3-gram Jaccard >= threshold and
    DIFFERENT shas is an edited rename (git's similarity detection, with
    the repo's gram machinery instead of git's line-hash heuristic).
    Output: (old_id, new_id, kind, sim), sim = 1.0 for exact.

    operators/renames.py carries the production form over the (repo,
    path, commit, content) corpus shape — path-set anti-joins, winnowed
    fingerprints for the fuzzy tier; this query is its oracle-checked
    documents-table twin. The exact tier is corpus-truth-dependent: the
    sf0.01 documents table has NO exact dup groups at all, so the tier is
    empty there (the union stays non-empty via 'edited'); at sf0.1 it
    yields 4 pairs, and the operator pytest plants exact renames so the
    tier never ships on emptiness.

    Scale shape: the exact tier joins on sha256 (skew-free crypto keys);
    the fuzzy tier reuses the df-capped gram self-join envelope of
    q_ngram_jaccard_pairs, restricted old-side x new-side."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).select(
        "doc_id", "text", F.sha2(F.encode("text", "UTF-8"), 256).alias("sha")
    )
    old = docs.where(F.col("doc_id") % 2 == 1)
    new = docs.where(F.col("doc_id") % 2 == 0)
    exact = (
        old.select(F.col("doc_id").alias("old_id"), "sha")
        .join(new.select(F.col("doc_id").alias("new_id"), "sha"), "sha")
        .select(
            "old_id",
            "new_id",
            F.lit("exact").alias("kind"),
            F.lit(1.0).alias("sim"),
        )
    )
    # gram rows carry only (doc_id, gram): shuffling the 64-char sha with
    # every gram row tripled the exploded row width for a per-PAIR filter
    # — the sha comparison moves to a post-aggregation join against the
    # tiny (doc_id, sha) map instead (identical result: osha/nsha is
    # constant within a pair, so filtering pairs after counting equals
    # filtering rows before).
    grams_all = _gram_rows(docs, "doc_id")
    grams = (
        grams_all.withColumn(
            "df", F.count("*").over(Window.partitionBy("gram"))
        )
        .where(F.col("df") <= NGRAM_DF_CAP)
        .drop("df")
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    go = grams.where(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("old_id"), "gram"
    )
    ga = grams.where(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("new_id"), "gram"
    )
    shas = docs.select("doc_id", "sha")
    inter = (
        go.join(ga, "gram")
        .groupBy("old_id", "new_id")
        .agg(F.count("*").alias("i"))
        .join(
            shas.select(F.col("doc_id").alias("old_id"), F.col("sha").alias("osha")),
            "old_id",
        )
        .join(
            shas.select(F.col("doc_id").alias("new_id"), F.col("sha").alias("nsha")),
            "new_id",
        )
        .where(F.col("osha") != F.col("nsha"))
        .select("old_id", "new_id", "i")
    )
    edited = (
        inter.join(
            sizes.select(F.col("doc_id").alias("old_id"), F.col("sz").alias("na")),
            "old_id",
        )
        .join(
            sizes.select(F.col("doc_id").alias("new_id"), F.col("sz").alias("nb")),
            "new_id",
        )
        .withColumn(
            "sim",
            F.round(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")), 4),
        )
        .where(F.col("sim") >= RENAME_SIM_THRESHOLD)
        .select("old_id", "new_id", F.lit("edited").alias("kind"), "sim")
    )
    return exact.unionAll(edited)


SQL_RENAME_CANDIDATES = f"""
WITH docs AS (
  SELECT doc_id, text, sha256(text) AS sha FROM documents
),
exact AS (
  SELECT o.doc_id AS old_id, n.doc_id AS new_id,
         'exact' AS kind, CAST(1.0 AS DOUBLE) AS sim
  FROM docs o JOIN docs n ON o.sha = n.sha
  WHERE o.doc_id % 2 = 1 AND n.doc_id % 2 = 0
),
grams_all AS (
  SELECT g.doc_id, d.sha, g.gram
  FROM ({_SQL_GRAMS3}) g JOIN docs d ON d.doc_id = g.doc_id
),
grams AS (
  SELECT doc_id, sha, gram FROM grams_all
  WHERE gram IN (SELECT gram FROM grams_all GROUP BY gram
                 HAVING count(*) <= {NGRAM_DF_CAP})
),
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
inter AS (
  SELECT o.doc_id AS old_id, n.doc_id AS new_id, count(*) AS i
  FROM grams o JOIN grams n ON o.gram = n.gram
  WHERE o.doc_id % 2 = 1 AND n.doc_id % 2 = 0 AND o.sha != n.sha
  GROUP BY 1, 2
),
edited AS (
  SELECT old_id, new_id, 'edited' AS kind,
         round(i / CAST(na.sz + nb.sz - i AS DOUBLE), 4) AS sim
  FROM inter
  JOIN sizes na ON na.doc_id = old_id
  JOIN sizes nb ON nb.doc_id = new_id
  WHERE round(i / CAST(na.sz + nb.sz - i AS DOUBLE), 4)
        >= {RENAME_SIM_THRESHOLD}
)
SELECT * FROM exact UNION ALL SELECT * FROM edited
"""


# Registry order is load-bearing: the driver's correctness gate checks the
# FIRST 50 entries in insertion order (CORRECTNESS_r06 stopped at exactly
# dict position 50, leaving the 20 newest queries ungated — VERDICT r06
# next #1). Policy: the least-proven queries (newest, or whose
# implementation changed this round) sit INSIDE the first-50 window;
# queries rotate to the tail only once they have at least one prior-round
# driver-green row AND pytest coverage. tests/test_entry.py still runs the
# driver-style DuckDB parity check over ALL entries every suite run, so
# tail queries keep local oracle-parity evidence even while rotated out.
QUERIES = {
    # -- core dedup / chunker invariants (north rule; keep driver-gated) --
    "exact_dup_groups": (q_exact_dup_groups, SQL_EXACT_DUP_GROUPS),
    "round_trip_sha": (q_round_trip_sha, SQL_ROUND_TRIP_SHA),
    "move_skip": (q_move_skip, SQL_MOVE_SKIP),
    "minhash": (q_minhash_sql, SQL_MINHASH),
    "lsh_band_pairs": (q_lsh_band_pairs, SQL_LSH_BAND_PAIRS),
    # NEW round 7 (late): b-bit MinHash storage-trade contract (simhash32 —
    # r06-green, unchanged, transitively exercised by simhash_hamming_pairs
    # — rotated to the tail)
    "bbit_minhash_calibration": (
        q_bbit_minhash_calibration, SQL_BBIT_MINHASH_CALIBRATION,
    ),
    "components": (q_components, SQL_COMPONENTS),
    # incremental update must reproduce the batch answer exactly
    "components_incremental": (q_components_incremental, SQL_COMPONENTS),
    "dedup_verdicts": (q_dedup_verdicts, SQL_DEDUP_VERDICTS),
    "cosine_pairs": (q_cosine_topk, SQL_COSINE_TOPK),
    "ann_signlsh": (q_ann_signlsh, SQL_ANN_SIGNLSH),
    "ann_ivf": (q_ann_ivf, SQL_ANN_IVF),  # recall-floor contract vs exact set
    # NEW round 7 (late): Manku blocked-Hamming simhash pairs + Bayardo
    # exact-threshold all-pairs join — inside the gated window; the two
    # r06-green, implementation-untouched queries emb_dedup_verdicts and
    # topk_similar rotated to the tail in their place.
    "simhash_hamming_pairs": (q_simhash_hamming_pairs, SQL_SIMHASH_HAMMING_PAIRS),
    "allpairs_jaccard": (q_allpairs_jaccard, SQL_ALLPAIRS_JACCARD),
    # NEW round 7 (late): embedding-space decontamination (ngram_jaccard_pairs
    # — green since r01, implementation untouched — rotated to the tail)
    "semantic_decontam_flags": (
        q_semantic_decontam_flags, SQL_SEMANTIC_DECONTAM_FLAGS,
    ),
    "topk_ivf": (q_topk_ivf, SQL_TOPK_IVF),  # recall-floor contract
    "topk_pq": (q_topk_pq, SQL_TOPK_IVF),  # same exact-ranking oracle/floor
    "topk_ivfpq": (q_topk_ivfpq, SQL_TOPK_IVF),  # IVFADC, same contract
    "containment_pairs": (q_containment_pairs, SQL_CONTAINMENT_PAIRS),
    # chunk boundaries are not SQL-expressible, but their byte-total and
    # bound invariants are — value-checked contracts (VERDICT r02 item 4)
    "chunk_stats": (q_chunk_stats, SQL_CHUNK_STATS),
    "dedup_ratio": (q_dedup_ratio, SQL_DEDUP_RATIO),
    # -- NEW round 7 (inside the gated window; three r06-green queries
    # rotated to the tail in their place per the rotation policy below) --
    "weighted_jaccard_pairs": (
        q_weighted_jaccard_pairs, SQL_WEIGHTED_JACCARD_PAIRS,
    ),
    # contract oracle (n_docs anchor + verdicts), like minhash_calibration_prod
    "wminhash_calibration": (q_wminhash_calibration, SQL_WMINHASH_CALIBRATION),
    "rename_candidates": (q_rename_candidates, SQL_RENAME_CANDIDATES),
    "clone_type1_groups": (q_clone_type1_groups, SQL_CLONE_TYPE1_GROUPS),
    # contract oracle (n_docs anchor + invariant verdicts; chunker not SQL)
    "ctph_contract": (q_ctph_contract, SQL_CTPH_CONTRACT),
    # NEW round 7: Broder/Henzinger supershingle precision tier (>=2 bands);
    # winnow_fingerprints (r06-green, unchanged this round) rotated to the
    # tail to keep the window at 50
    "supershingle_pairs": (q_supershingle_pairs, SQL_SUPERSHINGLE_PAIRS),
    "winnow_pairs": (q_winnow_pairs, SQL_WINNOW_PAIRS),
    # implementation de-quadratized round 7 — must stay driver-gated
    "clone_type2_groups": (q_clone_type2_groups, SQL_CLONE_TYPE2_GROUPS),
    # -- round-6 additions, first driver-gated round 7 (VERDICT r06 #1) --
    # contract oracle (exact count + bound verdict), like the recall floors
    "approx_distinct_users": (q_approx_distinct_users, SQL_APPROX_DISTINCT_USERS),
    "event_rolling_stats": (q_event_rolling_stats, SQL_EVENT_ROLLING_STATS),
    "order_late_shipment": (q_order_late_shipment, SQL_ORDER_LATE_SHIPMENT),
    # the north-star recall metric, itself oracle-audited
    "lsh_eval_metrics": (q_lsh_eval_metrics, SQL_LSH_EVAL_METRICS),
    "edit_sim_pairs": (q_edit_sim_pairs, SQL_EDIT_SIM_PAIRS),
    "dir_merkle": (q_dir_merkle, SQL_DIR_MERKLE),
    "cluster_stats": (q_cluster_stats, SQL_CLUSTER_STATS),
    # contract oracle (exact quantiles + band verdict)
    "approx_event_quantiles": (
        q_approx_event_quantiles, SQL_APPROX_EVENT_QUANTILES,
    ),
    "cross_source_dups": (q_cross_source_dups, SQL_CROSS_SOURCE_DUPS),
    "word_entropy": (q_word_entropy, SQL_WORD_ENTROPY),
    "shard_plan": (q_shard_plan, SQL_SHARD_PLAN),
    "curation_decisions": (q_curation_decisions, SQL_CURATION_DECISIONS),
    "doc_len_histogram": (q_doc_len_histogram, SQL_DOC_LEN_HISTOGRAM),
    "dup_substrings": (q_dup_substrings, SQL_DUP_SUBSTRINGS),
    "bm25_top_docs": (q_bm25_top_docs, SQL_BM25_TOP_DOCS),
    "passage_windows": (q_passage_windows, SQL_PASSAGE_WINDOWS),
    "chunk_dup_spans": (q_chunk_dup_spans, SQL_CHUNK_DUP_SPANS),
    "band_skew_report": (q_band_skew_report, SQL_BAND_SKEW_REPORT),
    "minhash_calibration": (q_minhash_calibration, SQL_MINHASH_CALIBRATION),
    # NEW round 7: est-vs-exact contract on the PRODUCTION 128-perm family
    "minhash_calibration_prod": (
        q_minhash_calibration_prod, SQL_MINHASH_CALIBRATION_PROD,
    ),
    "passage_delta": (q_passage_delta, SQL_PASSAGE_DELTA),
    # ---------------- driver-gate window boundary (50) ----------------
    # Tail: >= 1 prior driver-green row (CORRECTNESS_r01..r06) + pytest +
    # the all-registry DuckDB parity test. Rotate back in when touched.
    "event_asof_attribution": (
        q_event_asof_attribution, SQL_EVENT_ASOF_ATTRIBUTION,
    ),
    "event_range_counts": (q_event_range_counts, SQL_EVENT_RANGE_COUNTS),
    "winnow_fingerprints": (q_winnow_fingerprints, SQL_WINNOW_FINGERPRINTS),
    "revenue_rollup": (q_revenue_rollup, SQL_REVENUE_ROLLUP),
    "salted_skew_agg": (q_salted_skew_agg, SQL_SALTED_SKEW_AGG),
    "ngram_containment_pairs": (
        q_ngram_containment_pairs, SQL_NGRAM_CONTAINMENT_PAIRS,
    ),
    "token_stats": (q_token_stats, SQL_TOKEN_STATS),
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "doc_fingerprint": (q_doc_fingerprint, SQL_DOC_FINGERPRINT),
    "event_window_stats": (q_event_window_stats, SQL_EVENT_WINDOW_STATS),
    "event_dups": (q_event_dups, SQL_EVENT_DUPS),
    "event_sessions": (q_event_sessions, SQL_EVENT_SESSIONS),
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "segment_revenue": (q_segment_revenue, SQL_SEGMENT_REVENUE),
    "regex_tokens": (q_regex_tokens, SQL_REGEX_TOKENS),
    "decontam_flags": (q_decontam_flags, SQL_DECONTAM_FLAGS),
    "quality_verdicts": (q_quality_verdicts, SQL_QUALITY_VERDICTS),
    "repetition_stats": (q_repetition_stats, SQL_REPETITION_STATS),
    "crossmodal_dup_flags": (q_crossmodal_dup_flags, SQL_CROSSMODAL_DUP_FLAGS),
    "sample_stratified": (q_sample_stratified, SQL_SAMPLE_STRATIFIED),
    "top_ngrams": (q_top_ngrams, SQL_TOP_NGRAMS),
    "event_quantiles": (q_event_quantiles, SQL_EVENT_QUANTILES),
    "top_docs_per_source": (q_top_docs_per_source, SQL_TOP_DOCS_PER_SOURCE),
    "props_json_stats": (q_props_json_stats, SQL_PROPS_JSON_STATS),
    "event_type_pivot": (q_event_type_pivot, SQL_EVENT_TYPE_PIVOT),
    "source_similarity": (q_source_similarity, SQL_SOURCE_SIMILARITY),
    "tfidf_top_terms": (q_tfidf_top_terms, SQL_TFIDF_TOP_TERMS),
    # rotated out round 7 (late): r06-green, implementations untouched this
    # round; test_entry.py still parity-checks them every suite run
    "emb_dedup_verdicts": (q_emb_dedup_verdicts, SQL_EMB_DEDUP_VERDICTS),
    "topk_similar": (q_topk_similar, SQL_TOPK_SIMILAR),
    "ngram_jaccard_pairs": (q_ngram_jaccard_pairs, SQL_NGRAM_JACCARD_PAIRS),
    "simhash32": (q_simhash32, SQL_SIMHASH32),
}
