"""Streaming-drain benchmark panel (VERDICT r10 #5).

The 10 streaming drains are excluded from bench.py's throughput suite
because each timed pass would re-pay Structured Streaming bootstrap
(scheduler + checkpoint + source discovery) per query per pass — that's
startup latency, not data-plane throughput. This panel measures exactly
that end-to-end drain cost ON PURPOSE, once per drain, so the streaming
tier has a standing perf number and a regression guard:

  * per drain: median wall-clock of BENCH_STREAM_RUNS (default 3) full
    Trigger.AvailableNow drains — source discovery, every micro-batch,
    state-store maintenance, and result materialization included;
  * reference: the same rows at rest through the drain's own DuckDB
    batch oracle (the bench.py convention), giving a load-matched
    batch-vs-stream ratio per drain;
  * untimed warm-up first (JVM + chunk staging + codegen caches), like
    bench.py's warm pass.

Prints ONE JSON line and writes BENCH_STREAM.json at the repo root:
{"metric": "stream_drain_suite", "value": total_stream_sec,
 "unit": "sec", "drains": {name: {"stream": s, "oracle": o}}, "sf": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS, BENCH_STREAM_RUNS.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from deva_spark import queries as Q  # noqa: E402
from deva_spark.session import TABLES, get_spark  # noqa: E402

DRAINS = [
    "x33_streaming_tumbling",
    "x34_streaming_sessions",
    "x35_streaming_running_sum",
    "x36_streaming_zscore",
    "x38_stream_interval_join",
    "x49_streaming_first_seen",
    "x63_streaming_trending",
    "x69_streaming_funnel",
    "x71_streaming_retention",
    "x78_streaming_incremental_dedup",
]


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    mid = len(xs) // 2
    return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2


def _loadavg() -> float:
    # 1-minute load at run START — same attribution field the other
    # three panels carry (VERDICT r12 "wrong" #2: the suite drifted
    # 21.9 s -> 25.0 s with no code change to the drains and this panel
    # alone recorded no load, so the drift needed forensics instead of
    # a glance; it also lets the ≤30 s pytest bound distinguish a real
    # regression from a loaded machine)
    try:
        return round(os.getloadavg()[0], 1)
    except OSError:  # platform without getloadavg
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else 0.0
    n_runs = int(os.environ.get("BENCH_STREAM_RUNS", "3"))
    spark = get_spark("deva-spark-bench-stream")

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    # untimed warm-up: JVM, parquet footers, chunk staging (cached per
    # session), whole-stage codegen
    for name in DRAINS:
        Q.SPARK_QUERIES[name](spark, sf_dir).collect()

    drains: dict[str, dict[str, float]] = {}
    loads: list[float] = []
    for name in DRAINS:
        stream_times = []
        load0 = _loadavg()
        loads.append(load0)
        for _ in range(n_runs):
            t0 = time.perf_counter()
            Q.SPARK_QUERIES[name](spark, sf_dir).toPandas()
            stream_times.append(time.perf_counter() - t0)
        oracle_times = []
        sql = Q.ORACLE_SQL.get(name)
        for _ in range(n_runs):
            t0 = time.perf_counter()
            if sql:
                con.execute(sql).df()
            oracle_times.append(time.perf_counter() - t0)
        drains[name] = {
            "stream": round(_median(stream_times), 3),
            "oracle": round(_median(oracle_times), 3),
            "load": load0,
        }
        print(f"# {name}: {drains[name]}", file=sys.stderr)

    total = round(sum(d["stream"] for d in drains.values()), 3)
    out = {
        "metric": "stream_drain_suite",
        "value": total,
        "unit": "sec",
        "drains": drains,
        "runs": n_runs,
        "sf": sf,
        "load": [min(loads), max(loads)],
        "load_end": _loadavg(),
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BENCH_STREAM.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
