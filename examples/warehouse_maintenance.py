"""Warehouse-maintenance day: the physical-layout and planning ring.

A scheduled maintenance job over the fact tables, demonstrating how the
layout/skew/stats operators compose: ANALYZE collects planner stats,
z-order relayouts the 2-D scan path (with the pyarrow footer audit as
evidence), a bloom bitmap stages for the repeated dim-filtered join, the
skewed fact-dim join routes through the measured planner, and the
curated output exports as deterministic training shards.

Run: python examples/warehouse_maintenance.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from deva_spark.operators.joins import bloom_prune, build_bloom_bitmap
from deva_spark.operators.skew import auto_join, key_share
from deva_spark.plans import stats as ts
from deva_spark.session import get_spark, read_table
from deva_spark.sources.layout import (
    rowgroup_prune_stats,
    write_zordered,
)
from deva_spark.sources.writers import write_training_shards


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("example-warehouse", cpus=8)
    li = read_table(spark, sf_dir, "lineitem")
    ev = read_table(spark, sf_dir, "events")

    with tempfile.TemporaryDirectory() as tmp:
        # 1. ANALYZE: one pass, persisted sidecar — the numbers every
        #    later decision reads
        li_path = f"{tmp}/lineitem"
        li.write.parquet(li_path)
        st = ts.write_table_stats(
            spark.read.parquet(li_path), li_path,
            columns=["l_quantity", "l_extendedprice", "l_orderkey"],
        )
        print(f"stats: {st['rows']} rows, "
              f"quantity ndv~{st['columns']['l_quantity']['ndv']}, "
              f"price range {st['columns']['l_extendedprice']['min']}"
              f"..{st['columns']['l_extendedprice']['max']}")

        # 2. layout: z-order the 2-D scan path; footer audit proves the
        #    multiplicative pruning the engine's skipping will exploit
        z_path = f"{tmp}/lineitem_z"
        write_zordered(
            li, z_path, ["l_quantity", "l_extendedprice"],
            bits=10, n_files=8, row_group_bytes=1 << 18,
        )
        box = {"l_quantity": (10.0, 15.0),
               "l_extendedprice": (20_000.0, 40_000.0)}
        surv, total = rowgroup_prune_stats(z_path, box)
        print(f"z-order: {surv}/{total} row groups survive the 2-D box")
        agg_row = (
            spark.read.parquet(z_path)
            .filter(
                F.col("l_quantity").between(10, 15)
                & F.col("l_extendedprice").between(20_000, 40_000)
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()[0]
        )
        print(f"box scan over the relayout: {agg_row.n} rows")

        # 3. skew probe + measured join: events' 5-type join key is
        #    extreme skew; the planner sees it and salts
        print("hot keys on events.event_type:")
        key_share(ev, ["event_type"], top=3).show()
        dim = ev.select("event_type").distinct().withColumn(
            "w", F.length("event_type").cast("bigint")
        )
        joined, strategy = auto_join(
            ev, dim, "event_type", broadcast_rows=0, sample_fraction=0.2
        )
        print(f"auto_join picked: {strategy} "
              f"(dim declared unbroadcastable to show the skew path)")
        joined.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        ).orderBy("event_type").show()

        # 4. staged bloom: the BUILDING-segment filter repeats nightly,
        #    so its 8 KB bitmap is an artifact, not a per-query job
        cust = read_table(spark, sf_dir, "customer").filter(
            F.col("c_mktsegment") == "BUILDING"
        )
        bitmap = build_bloom_bitmap(cust, "c_custkey", n_bits=1 << 14)
        orders = read_table(spark, sf_dir, "orders")
        pruned = bloom_prune(orders, "o_custkey", bitmap)
        print(f"bloom prune: {orders.count()} orders -> "
              f"{pruned.count()} candidates before the exact join")

        # 5. export: deterministic training shards of the curated slice
        shards = f"{tmp}/shards"
        write_training_shards(
            pruned.select("o_orderkey", "o_totalprice"),
            shards, n_shards=4, id_col="o_orderkey",
        )
        n = spark.read.parquet(shards).select("_shard").distinct().count()
        print(f"exported {n} deterministic shards")

    spark.stop()


if __name__ == "__main__":
    main()
