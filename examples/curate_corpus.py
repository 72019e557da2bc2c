"""Training-corpus curation demo — the north-star pipeline end to end.

Run: python examples/curate_corpus.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

from deva_spark.plans.corpus import curate
from deva_spark.session import get_spark, read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-curate", cpus=8)
    docs = read_table(spark, sf_dir, "documents")

    curated, rep = curate(docs, min_quality=40.0, lang="en")
    print("curation funnel:")
    print(f"  input docs        : {rep.input_docs}")
    print(f"  after quality/lang: {rep.after_quality}")
    print(f"  after exact dedup : {rep.after_exact_dedup}")
    print(f"  after near-dup    : {rep.after_near_dedup}")
    print(f"  surviving tokens  : {rep.surviving_tokens}")
    curated.show(5, truncate=60)


if __name__ == "__main__":
    main()
