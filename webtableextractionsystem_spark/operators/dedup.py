"""Deduplication family over the documents table: exact (hash-groupBy),
MinHash+LSH (shingle -> minhash -> band -> bucket-join), SimHash, n-gram
Jaccard.

Design for 100 TB:

* Everything is built-in DataFrame expressions (whole-stage codegen) —
  shingling via ``transform``/``sequence``/``slice`` higher-order
  functions, hashing via ``md5`` — no Python UDFs anywhere.
* MinHash: one md5-derived 32-bit base hash per shingle (identical in
  both engines) + per-seed affine permutations mod a >2^32 prime, folded
  as explode -> groupBy(min); at cluster scale you'd swap the base hash
  for xxhash64 — the algebra is unchanged.
* LSH candidate generation is the scale path: band-key equi-join
  (shuffle on band hash) instead of the O(n^2) cross join; the n-gram
  Jaccard verifier runs only on LSH survivors (or a bounded id range in
  the oracle-checked query).
* Exact dedup = window over fingerprint — at scale a groupBy(fp) with
  min(doc_id) broadcast back; the window form keeps one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .textstats import load_documents

SHINGLE_K = 3
N_SEEDS = 8          # minhash permutations
BAND_ROWS = 2        # seeds per LSH band -> 4 bands
JACCARD_MAX_ID = 200  # bounded id range for the oracle-checked pair query


def _tokens():
    return F.split(F.trim(F.col("text")), r"\s+")


def _shingles(k: int = SHINGLE_K):
    toks = _tokens()
    n = F.size(toks)
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def _shingles_sql(k: int = SHINGLE_K) -> str:
    return (
        rf"CASE WHEN len(toks) >= {k} THEN "
        rf"list_distinct([array_to_string(toks[i:i+{k - 1}], ' ') "
        rf"FOR i IN range(1, len(toks)-{k}+2)]) "
        rf"ELSE [] END"
    )


# ---------------------------------------------------------------------------
# exact dedup (prefix-fingerprint variant so the synthetic corpus actually
# collides; full-text exact dedup is the same query with the full md5)
# ---------------------------------------------------------------------------

def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    fp = F.md5(F.concat_ws(" ", F.slice(_tokens(), 1, 5)))
    w = Window.partitionBy("fp")
    return (
        load_documents(spark, sf_dir)
        .select("doc_id", fp.alias("fp"))
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("is_dup", F.col("doc_id") != F.col("canonical_id"))
    )


EXACT_DEDUP_SQL = r"""
SELECT doc_id, fp,
       min(doc_id) OVER (PARTITION BY fp) AS canonical_id,
       doc_id <> min(doc_id) OVER (PARTITION BY fp) AS is_dup
FROM (SELECT doc_id,
             md5(array_to_string(regexp_split_to_array(trim(text), '\s+')[1:5], ' ')) AS fp
      FROM documents)
"""


# ---------------------------------------------------------------------------
# MinHash signatures
# ---------------------------------------------------------------------------

# MinHash via ONE base hash per shingle (md5 prefix -> 32-bit int, shared
# with the DuckDB oracle) and per-seed affine transforms (a*h + b) mod P —
# the classic k-permutation construction. 8x less hashing than hashing
# per (seed, shingle), and the explode -> groupBy(min) shape parallelizes
# regardless of input file count and is immune to CollapseProject
# re-inlining the hash tree into every output column.
MINHASH_P = 4294967311  # prime > 2^32: no aliasing of the 32-bit base hashes
SEED_PARAMS = [(2 * s + 3, 1000003 * (s + 1) % MINHASH_P)
               for s in range(N_SEEDS)]


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_documents(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    exploded = docs.select(
        "doc_id", F.explode_outer(_shingles()).alias("sh")
    ).select(
        "doc_id",
        F.when(
            F.col("sh").isNotNull(),
            F.conv(F.substring(F.md5("sh"), 1, 8), 16, 10).cast("long"),
        ).alias("h"),
    )
    aggs = [
        F.min((F.col("h") * F.lit(a) + F.lit(b)) % MINHASH_P)
        .alias(f"mh{s}")
        for s, (a, b) in enumerate(SEED_PARAMS)
    ]
    return exploded.groupBy("doc_id").agg(*aggs)


def minhash_sql() -> str:
    mh = ",\n       ".join(
        f"min((h * {a} + {b}) % {MINHASH_P}) AS mh{s}"
        for s, (a, b) in enumerate(SEED_PARAMS)
    )
    return rf"""
SELECT doc_id,
       {mh}
FROM (
  SELECT doc_id,
         CAST('0x' || substring(md5(u.sh), 1, 8) AS BIGINT) AS h
  FROM (SELECT doc_id, {_shingles_sql()} AS shingles
        FROM (SELECT doc_id, text,
                     regexp_split_to_array(trim(text), '\s+') AS toks
              FROM documents)),
       LATERAL (SELECT unnest(CASE WHEN len(shingles) = 0
                                   THEN [NULL]::VARCHAR[]
                                   ELSE shingles END) AS sh) u
)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# LSH banding + candidate pairs
# ---------------------------------------------------------------------------

def lsh_band_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the aggregate in minhash_signatures is itself a projection-collapse
    # barrier, so band structs reference the materialized mh columns —
    # no persist needed for the single-consumer band-keys query
    sig = minhash_signatures(spark, sf_dir)
    n_bands = N_SEEDS // BAND_ROWS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[F.col(f"mh{b * BAND_ROWS + r}") for r in range(BAND_ROWS)],
                    )
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    # docs with < SHINGLE_K tokens have NULL signatures (empty shingle
    # set); they must emit NO bands — otherwise concat_ws collapses the
    # NULLs into a shared md5('') band key and every short doc becomes a
    # spurious near-dup candidate of every other
    return (
        sig.where(F.col("mh0").isNotNull())
        .select("doc_id", F.explode(bands).alias("bk"))
        .select("doc_id", "bk.band", "bk.band_key")
    )


def lsh_band_keys_sql() -> str:
    n_bands = N_SEEDS // BAND_ROWS
    rows = []
    for b in range(n_bands):
        concat = " || '|' || ".join(
            f"mh{b * BAND_ROWS + r}" for r in range(BAND_ROWS)
        )
        rows.append(
            f"SELECT doc_id, {b} AS band, md5({concat}) AS band_key "
            f"FROM sig WHERE mh0 IS NOT NULL"
        )
    return (
        "WITH sig AS (" + minhash_sql() + ")\n" + "\nUNION ALL\n".join(rows)
    )


def lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs sharing any band key — the scale path for near-dup candidate
    generation (equi-join on band_key, NOT a cross join).

    The band keys are persisted before the self-join so the
    shingle+hash+aggregate subtree runs once instead of once per side
    (Spark plans self-joins as two scans of the subtree). At warehouse
    scale this boundary is a written signatures table, which is how a
    100 TB near-dup pass stages anyway. The cache is session-scoped: the
    driver gate runs each query once; long-lived callers doing repeated
    dedup passes should stage signatures to a table instead."""
    bk = lsh_band_keys(spark, sf_dir).persist()
    a = bk.alias("a")
    b = bk.alias("b")
    return (
        a.join(b, ["band", "band_key"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def lsh_candidate_pairs_sql() -> str:
    return f"""
WITH bk AS ({lsh_band_keys_sql()})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bk a JOIN bk b ON a.band = b.band AND a.band_key = b.band_key
WHERE a.doc_id < b.doc_id
"""


# ---------------------------------------------------------------------------
# SimHash (16-bit, md5-derived token hashes, frequency-weighted)
# ---------------------------------------------------------------------------

N_SIMHASH_BITS = 16


def _bit_test(bit: int):
    # single-arg factory, NOT `lambda t, b=b`: pyspark infers lambda arity
    # from the signature, and a default arg flips it into the two-arg
    # (element, index) form with the closure silently shadowed
    def f(t):
        h = F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("int")
        return F.shiftright(h, bit).bitwiseAND(1) == 1

    return f


def simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _tokens()
    expr = F.lit(0)
    n = F.size(toks)
    for b in range(N_SIMHASH_BITS):
        ones = F.size(F.filter(toks, _bit_test(b)))
        bit = (ones * 2 > n).cast("int")
        expr = expr + (bit * (1 << b))
    return load_documents(spark, sf_dir).select(
        "doc_id", expr.cast("int").alias("simhash16")
    )


def simhash_sql() -> str:
    terms = []
    for b in range(N_SIMHASH_BITS):
        ones = (
            rf"len([t FOR t IN toks IF "
            rf"(CAST(concat('0x', substring(md5(t), 1, 4)) AS INTEGER) >> {b}) & 1 = 1])"
        )
        terms.append(f"(CASE WHEN {ones} * 2 > len(toks) THEN {1 << b} ELSE 0 END)")
    return rf"""
SELECT doc_id, CAST({' + '.join(terms)} AS INTEGER) AS simhash16
FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents)
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard verification on a bounded id range
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_documents(spark, sf_dir) \
        .where(F.col("doc_id") < JACCARD_MAX_ID) \
        .select("doc_id", _shingles().alias("sh"))
    a = docs.alias("a")
    b = docs.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    return (
        a.crossJoin(b)
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            inter.alias("n_common"),
            union.alias("n_union"),
        )
        .where(F.col("n_common") > 0)
    )


def ngram_jaccard_sql() -> str:
    return rf"""
WITH d AS (
  SELECT doc_id, {_shingles_sql()} AS sh
  FROM (SELECT doc_id, text, regexp_split_to_array(trim(text), '\s+') AS toks
        FROM documents WHERE doc_id < {JACCARD_MAX_ID})
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.sh, b.sh)) AS INTEGER) AS n_common,
       CAST(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)) AS INTEGER) AS n_union
FROM d a, d b
WHERE a.doc_id < b.doc_id
  AND len(list_intersect(a.sh, b.sh)) > 0
"""
