"""MinHash + LSH banded near-duplicate detection, and exact n-gram Jaccard.

Reference surface: near-dup text dedup via simhash banding
(`/root/reference/deva/utils/simhash.py:247-341` — 64-bit fingerprints,
4 key-chunks, Hamming <= k). This module is the MinHash/LSH counterpart a
training-data pipeline needs; functions/simhash.py covers the simhash one.

Portable-hash design: the per-permutation hash of a shingle is the MD5 hex
digest of ``"{seed}:{shingle}"`` and the MinHash value is the
*lexicographic minimum* digest string. MD5 is identical everywhere, and
string MIN avoids any hex→int conversion differences between engines — so
the DuckDB oracle reproduces the Spark result exactly.

Scale notes: everything is per-row array algebra (shingle → transform →
array_min) until the band self-join, which shuffles only
(band_key, doc_id) pairs — bands are 16-byte digests, so the join input is
tiny relative to the corpus. The candidate verify step re-joins signatures
per pair. No cross join anywhere; complexity is driven by bucket collision
counts, the standard LSH cost model.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from deva_spark.functions.text import word_shingles

NUM_HASHES = 12
BAND_SIZE = 3  # => 4 bands; collision prob for jaccard s: 1-(1-s^3)^4


def minhash_signature(text: Column, num_hashes: int = NUM_HASHES) -> Column:
    """array<string> MinHash signature (one lexicographic-min MD5 per seed).

    Built as ONE nested transform over a seeds array (`transform(seq, j ->
    array_min(transform(shingles, s -> md5(j:s))))`) rather than N sibling
    transforms: sibling lambdas sharing a variable name can get their bound
    literals conflated by the analyzer (observed: seed components shuffled),
    while nested lambdas with distinct variable names are safe — and this
    shape mirrors the SQL oracle exactly.
    """
    sh = word_shingles(text, 3)
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.transform(
        seeds,
        lambda j: F.array_min(
            F.transform(sh, lambda s: F.md5(F.concat(j.cast("string"), F.lit(":"), s)))
        ),
    )


def _signature_py(text: str, num_hashes: int = NUM_HASHES) -> list[str] | None:
    """Python twin of :func:`minhash_signature` — byte-identical output.

    ``str.split()`` == trim + split-on-whitespace-runs, matching the
    ``\\s+`` regex split of the column expression and the SQL oracle.
    """
    if text is None:
        return None
    ws = text.split()
    if len(ws) < 3:
        return None
    # encode each shingle once (not once per seed) and concat byte prefixes
    # — this inner loop runs |shingles| × num_hashes times per document
    sb = [" ".join(ws[i : i + 3]).encode() for i in range(len(ws) - 2)]
    md5 = hashlib.md5
    return [
        min(md5(p + s).hexdigest() for s in sb)
        for p in (f"{j}:".encode() for j in range(num_hashes))
    ]


# Arrow-batched signature computation: one pass over each document (the
# column-expression version re-evaluates the shingle array once per seed
# inside the nested lambda — 12× the work; observed 114 s → ~6 s at sf0.1).
@pandas_udf(ArrayType(StringType()))
def minhash_signature_udf(texts: pd.Series) -> pd.Series:
    return texts.map(_signature_py)


def signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    # Repartition before the UDF: a single-file corpus arrives in a handful
    # of row-group splits, which would starve the Arrow worker pool; spread
    # the CPU-bound hashing over every core/executor.
    spark = docs.sparkSession
    return (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select(
            F.col(id_col).alias("doc_id"),
            minhash_signature_udf(F.col(text_col)).alias("sig"),
        )
        .filter(F.col("sig").isNotNull())
    )


def lsh_candidate_pairs(sigs: DataFrame, band_size: int = BAND_SIZE) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become a candidate pair."""
    num_bands = NUM_HASHES // band_size
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[F.col("sig")[b * band_size + i] for i in range(band_size)],
                            )
                        ).alias("bkey"),
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.bkey").alias("bkey"))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, ["band", "bkey"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )


def near_duplicates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_matches: int = 6,
) -> DataFrame:
    """MinHash near-dup pairs: LSH candidates whose signatures agree on at
    least ``min_matches`` of the NUM_HASHES components (estimated Jaccard
    >= min_matches/NUM_HASHES). Output: (id_a, id_b, est_sim)."""
    # Persist the signatures: they feed the band explosion AND both sides of
    # the verify join — without this the 12×|shingles| MD5 evaluation runs
    # three times (observed 191 s → ~8 s at sf0.1). At cluster scale this is
    # a materialized signature table (write once, join many).
    sigs = signatures(docs, id_col, text_col).persist()
    sigs.count()  # eager: referenced by bands + both verify-join sides
    cands = lsh_candidate_pairs(sigs)
    sa = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    matches = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    )
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_match", matches)
        .filter(F.col("n_match") >= min_matches)
        .select(
            "id_a",
            "id_b",
            F.round(F.col("n_match").cast("double") / F.lit(float(NUM_HASHES)), 4).alias(
                "est_sim"
            ),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    pct_threshold: int = 30,
    df_cap: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join via an inverted shingle index:
    explode distinct shingles, join docs sharing one, count common shingles,
    keep pairs with jaccard >= pct_threshold % (integer cross-multiplied —
    no float boundary). Output: (id_a, id_b, jaccard).

    Scale: the join key is a shingle string shared by few docs (stopword-only
    shingles are the skew risk — AQE skew-join splits those buckets); the
    pair aggregation shuffles (id_a, id_b) pairs only.

    ``df_cap``: prefix-filtering for corpus scale — shingles appearing in
    more than ``df_cap`` documents are dropped from the CANDIDATE join
    (they generate the quadratic blowup while carrying almost no
    similarity signal), then every surviving candidate pair is re-scored
    EXACTLY against the full shingle sets. Precision stays exact; recall
    misses only pairs whose overlap is entirely high-df shingles.
    """
    # Persisted: the exploded shingle index feeds the self-join twice plus
    # the per-doc size aggregate. The join key is the 64-bit xxhash of the
    # shingle, not the string itself: the shuffle moves 8-byte keys instead
    # of full n-grams (collision probability ~(distinct shingles)^2 / 2^64 —
    # negligible), which is what makes this join survive a corpus-scale run.
    from deva_spark.functions.text import distinct_word_shingles_udf

    spark = docs.sparkSession
    sh = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode(distinct_word_shingles_udf(F.col(text_col))).alias("s"),
        )
        .select("doc_id", F.xxhash64("s").alias("sh"))
        .persist()
    )
    # Materialize the cache eagerly: the plan references `sh` four times
    # (both join sides + two size lookups); without a barrier one job races
    # to compute the subtree 4× before any partition lands in cache
    # (observed 8 s vs 1 s). Cluster-scale equivalent: stage the shingle
    # index to a table once, then join against it.
    sh.count()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), "sh")
    b = sh.select(F.col("doc_id").alias("id_b"), "sh")
    if df_cap is None:
        common = (
            a.join(b, "sh")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
    else:
        # candidates from the low-df index only…
        rare = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("dfc")).filter(
            F.col("dfc") <= df_cap
        )
        a_r = a.join(rare.select("sh"), "sh")
        b_r = b.join(rare.select("sh"), "sh")
        cands = (
            a_r.join(b_r, "sh")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        # …then EXACT re-scoring of each candidate over the full sets
        common = (
            cands.join(a, "id_a")
            .join(b, ["id_b", "sh"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
    na = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    return (
        # sizes has one row per doc — small enough that AQE picks a broadcast
        # at test scale, but at corpus scale it's a shuffle join on doc id;
        # don't force a broadcast hint here.
        common.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("union_n", F.col("na") + F.col("nb") - F.col("common"))
        .filter(F.col("common") * 100 >= F.col("union_n") * pct_threshold)
        .select(
            "id_a",
            "id_b",
            F.round(F.col("common").cast("double") / F.col("union_n").cast("double"), 4).alias(
                "jaccard"
            ),
        )
    )
