"""Pipe DSL demo — the reference's `>>` dataflow style on Spark plans.

Run: python examples/pipe_dsl.py [sf_dir]

Reference style this mirrors (`/root/reference/deva/examples/`,
`pipe.py` doctests): data >> op >> op >> sink, lazily composed.
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from deva_spark.operators import aggregates as agg
from deva_spark.operators import core as C
from deva_spark.plans import P
from deva_spark.plans.pipe import to_pandas
from deva_spark.session import get_spark, read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("example-pipe", cpus=8)
    orders = read_table(spark, sf_dir, "orders")

    # stream >> filter >> group-agg >> sort >> sink   (all one lazy plan)
    result = (
        P(orders)
        >> C.where(F.col("o_totalprice") > 100_000)
        >> agg.group_agg(
            ["o_orderpriority"],
            {"n": F.count(F.lit(1)), "avg_price": F.round(F.avg("o_totalprice"), 2)},
        )
        >> C.order_by("o_orderpriority")
        >> to_pandas
    )
    print(result.to_string(index=False))

    # '>> "name"' registers a named view (NS namespace analog)
    P(orders) >> "orders_v"
    print("\nvia SQL over the named view:")
    spark.sql("SELECT COUNT(*) AS n FROM orders_v").show()


if __name__ == "__main__":
    main()
