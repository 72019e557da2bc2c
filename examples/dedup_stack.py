"""Dedup-stack demo: every tier over one corpus, side by side.

The engine ships five complementary dedup tiers — each catches a class
the others miss:

  exact          md5 fingerprint groups          (byte-identical docs)
  jaccard        n-gram resemblance pairs        (shuffled/edited copies)
  containment    asymmetric |A∩B|/|A| pairs      (quotes / supersets)
  simhash        hamming-banded fingerprints     (small perturbations)
  semdedup       cluster-partitioned cosine      (semantic rephrasings)

plus transitive cluster resolution (graphs.canonical_assignments) to
pick one survivor per connected near-dup component.

Run: python examples/dedup_stack.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from deva_spark.functions import minhash as mh
from deva_spark.functions import simhash as sh
from deva_spark.functions import text as T
from deva_spark.functions import vectors as V
from deva_spark.operators.graphs import canonical_assignments
from deva_spark.session import get_spark, read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-dedup", cpus=8)
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")

    exact_groups = (
        docs.groupBy(T.fingerprint(F.col("text")).alias("fp"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )
    print("exact dup groups:", exact_groups.count())

    jac = mh.ngram_jaccard_pairs(docs, pct_threshold=30)
    print("jaccard pairs (>=30%):", jac.count())

    shingles = (
        docs.select("doc_id", T.words(F.col("text")).alias("_ws"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(T.shingles_from_words(F.col("_ws"), n=5))
            ).alias("_s"),
        )
        .select("doc_id", F.xxhash64("_s").alias("_sh"))
    )
    cont = mh.containment_pairs(shingles, pct_threshold=30)
    print("containment pairs (either direction >=30%):", cont.count())

    near = sh.near_duplicates(docs, max_hamming=3)
    print("simhash pairs (hamming <=3):", near.count())

    sem = V.semdedup_pairs(emb, n_clusters=16, threshold=0.3)
    print("semdedup pairs (cos >=0.3 within cluster):", sem.count())

    # the Lloyd-refined tier (the SemDeDup paper's k-means-first shape):
    # same pair-join anatomy, density-tracking clusters
    sem_r = V.semdedup_pairs(emb, n_clusters=16, threshold=0.3, refine=True)
    print("semdedup pairs, refined centroids:", sem_r.count())

    clusters = canonical_assignments(jac.select("id_a", "id_b"))
    survivors = clusters.filter(F.col("is_canonical"))
    print(
        "jaccard clusters:",
        clusters.select("cluster_id").distinct().count(),
        "| survivors:",
        survivors.count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
