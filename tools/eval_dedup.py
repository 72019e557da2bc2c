"""Dedup-tier evaluation: measured precision/recall of each APPROXIMATE
text tier against exact n-gram-Jaccard ground truth — "measure, don't
guess" applied to the tier choice itself. A pipeline picking MinHash
bands or SimHash Hamming radii should know what each buys on ITS corpus;
this prints the table (and per-tier candidate counts, the cost proxy).

Usage: python tools/eval_dedup.py [sf_dir] [jaccard_pct_threshold]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deva_spark.functions import minhash as mh  # noqa: E402
from deva_spark.functions import simhash as sh  # noqa: E402
from deva_spark.functions.substring import substring_dup_pairs  # noqa: E402
from deva_spark.session import get_spark, read_table  # noqa: E402


def pr(predicted: set, truth: set) -> tuple[float, float]:
    if not predicted:
        return (1.0, 0.0 if truth else 1.0)
    tp = len(predicted & truth)
    return (
        round(tp / len(predicted), 3),
        round(tp / len(truth), 3) if truth else 1.0,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    pct = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("eval-dedup", cpus=8)
    docs = read_table(spark, sf_dir, "documents")

    truth = {
        (r.id_a, r.id_b)
        for r in mh.ngram_jaccard_pairs(docs, pct_threshold=pct).collect()
    }
    print(f"ground truth: {len(truth)} pairs with exact 3-gram "
          f"Jaccard >= {pct}% at {sf_dir}")

    tiers: dict[str, set] = {}
    tiers["minhash-lsh (est>=0.5)"] = {
        (r.id_a, r.id_b) for r in mh.near_duplicates(docs).collect()
    }
    tiers["simhash (hamming<=3)"] = {
        (r.id_a, r.id_b) for r in sh.near_duplicates(docs).collect()
    }
    tiers["substring (>=8-word run)"] = {
        (r.id_a, r.id_b) for r in substring_dup_pairs(docs).collect()
    }

    print(f"{'tier':<28} {'pairs':>6} {'precision':>10} {'recall':>8}")
    for name, pred in tiers.items():
        p, r = pr(pred, truth)
        print(f"{name:<28} {len(pred):>6} {p:>10} {r:>8}")
    print(
        "\nreading: precision = of the tier's reported pairs, how many are"
        f"\ntrue >= {pct}%-Jaccard near-dups; recall = how many true pairs"
        "\nthe tier surfaces. The substring tier detects a DIFFERENT"
        "\ncriterion (long shared runs) by design — its 'misses' are"
        "\nratio-diluted docs and its 'extras' are boilerplate shares the"
        "\nJaccard bar cannot see (the x74 blind-spot demonstration)."
    )
    spark.stop()


if __name__ == "__main__":
    main()
