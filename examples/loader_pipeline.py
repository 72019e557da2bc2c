"""Pretraining-loader pipeline demo: curated corpus -> packed batches.

Composes the round-4/5 loader operators end to end:

  curate (gate + exact dedup + LSH near-dup)
    -> top-p token-mass trim per source      (sampling.top_p_by_group)
    -> deterministic train/val/test split    (hash split, x40 semantics)
    -> mixture report + KMV distinct sources (aggregates.kmv_distinct)

Run: python examples/loader_pipeline.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from deva_spark.operators.aggregates import kmv_distinct
from deva_spark.operators.sampling import top_p_by_group
from deva_spark.plans.corpus import curate
from deva_spark.session import get_spark, read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-loader", cpus=8)
    docs = read_table(spark, sf_dir, "documents")

    curated, _ = curate(docs, min_quality=40.0, lang="en", with_report=False)
    curated = curated.join(
        docs.select("doc_id", "source"), "doc_id"
    )

    # cap each source at 80% of its token mass (drop the long tail)
    trimmed = curated.transform(
        top_p_by_group(["source"], "n_tokens", p_pct=80, order_tiebreak="doc_id")
    )

    # deterministic split: stable under reruns and partitioning
    split = trimmed.withColumn(
        "split",
        F.when(F.pmod(F.xxhash64("doc_id"), 100) < 90, "train")
        .when(F.pmod(F.xxhash64("doc_id"), 100) < 95, "val")
        .otherwise("test"),
    )

    print("split sizes / token budgets:")
    split.groupBy("split").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_tokens").alias("tokens"),
    ).orderBy("split").show()

    print("distinct sources per split (KMV sketch, k=64):")
    split.transform(kmv_distinct("source", keys=["split"], k=64)).orderBy(
        "split"
    ).show()


if __name__ == "__main__":
    main()
