"""Benchmark: one timed pass over the full query suite.

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Env:
  SPARK_GRAFT_SF_DIR  data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  BENCH_BASELINE=1    also time DuckDB on the oracle SQL (stderr table)
  BENCH_QUERIES       comma-separated subset to run

Timing excludes one JVM/session warm-up action (BASELINE.md contract).
Each query fully materializes its result to the driver via the columnar
path (``toPandas`` / Arrow); the DuckDB baseline materializes the same way
(``.df()``) so the comparison is engine-vs-engine, not serializer overhead.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deva_spark.session import get_spark  # noqa: E402
from deva_spark import queries as Q  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else 0.0
    only = os.environ.get("BENCH_QUERIES")
    names = [n for n in Q.SPARK_QUERIES if not only or n in set(only.split(","))]

    spark = get_spark("deva-spark-bench")
    # Warm-up: JVM + parquet footer caches, excluded from timing.
    Q.SPARK_QUERIES["q03_group_agg"](spark, sf_dir).collect()

    per: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        Q.SPARK_QUERIES[name](spark, sf_dir).toPandas()
        per[name] = round(time.perf_counter() - t0, 3)
        # Drop persisted intermediates (similarity queries cache signature
        # tables); leftover cache blocks slow later queries via GC pressure.
        spark.catalog.clearCache()
        spark._jvm.System.gc()

    total = round(sum(per.values()), 3)

    if os.environ.get("BENCH_BASELINE") == "1":
        import duckdb

        from deva_spark.session import TABLES

        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        base: dict[str, float] = {}
        for name in names:
            if name not in Q.ORACLE_SQL:
                continue
            t0 = time.perf_counter()
            con.execute(Q.ORACLE_SQL[name]).df()
            base[name] = round(time.perf_counter() - t0, 3)
        btotal = round(sum(base.values()), 3)
        print(
            f"# duckdb baseline total={btotal}s; per-query:"
            + json.dumps(base),
            file=sys.stderr,
        )
        for name in sorted(per, key=lambda n: -per[n]):
            print(
                f"# {name}: spark={per[name]}s duckdb={base.get(name, float('nan'))}s",
                file=sys.stderr,
            )

    print(
        json.dumps(
            {
                "metric": "suite_total_wall",
                "value": total,
                "unit": "sec",
                "queries": per,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
