"""Similarity & dedup demo — near-duplicate detection three ways plus
vector search, on the synthetic corpus.

Run: python examples/similarity_search.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from deva_spark.functions import minhash as mh
from deva_spark.functions import simhash as sh
from deva_spark.functions import vectors as V
from deva_spark.session import get_spark, read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-similarity", cpus=8)
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")

    print("MinHash LSH near-duplicates (est. Jaccard >= 0.5):")
    mh.near_duplicates(docs).orderBy("id_a", "id_b").show(5)

    print("SimHash near-duplicates (Hamming <= 3 of 48 bits):")
    sh.near_duplicates(docs).orderBy("id_a", "id_b").show(5)

    print("Exact n-gram Jaccard (>= 30%, df-capped candidate join):")
    mh.ngram_jaccard_pairs(docs, df_cap=100).orderBy("id_a", "id_b").show(5)

    qs = emb.filter(F.col("vec_id") < 3)
    print("Cosine top-3 (brute force):")
    V.brute_force_topk(emb, qs, k=3).orderBy("qid", "rnk").show(9)

    print("Cosine top-3 (multi-table hyperplane LSH, approximate):")
    V.lsh_bucketed_topk(emb, qs, k=3).orderBy("qid", "rnk").show(9)

    # the compressed end of the stack: IVF partitions the corpus, PQ
    # shrinks each cell's payload to m one-byte-ish codes, ADC scores
    # codes against a per-query distance table, and an exact-rerank tail
    # over the bounded shortlist buys quantization recall back
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        path = f"{tmp}/ivfpq"
        V.ivfpq_stage(emb, path, n_cells=8, m=8, n_codes=32)
        print("Cosine top-3 (IVF-PQ codes + exact rerank):")
        V.ivfpq_search(
            spark, path, qs, k=3, n_probe=4, rerank_vectors=emb
        ).orderBy("qid", "rnk").show(9)


if __name__ == "__main__":
    main()
