#!/usr/bin/env python
"""Benchmark runner: times the headline TPC-H-adapted queries.

Prints ONE JSON line:
  {"metric": "tpch_22_total", "value": N, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": ...}

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  BENCH_PLAN=1        also print df.explain(formatted) per query to stderr
  BENCH_REPEAT        timing iterations per query (default 1, report min)

Counterpart of the reference's `benchmark-parquet` CLI
(/root/reference/src/main.rs:59-113) and benchmark_vs_duckdb.py.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("BENCH_REPEAT", "2"))
    show_plan = os.environ.get("BENCH_PLAN") == "1"

    from iceberg_query_engine_spark.queries import tpch
    from iceberg_query_engine_spark.session import get_spark

    spark = get_spark(app_name="bench")
    # warm the JVM, codegen paths (incl. decimal agg), parquet footers
    tpch.q6(spark, sf_dir).collect()
    tpch.q1(spark, sf_dir).collect()

    times: dict[str, float] = {}
    for name in sorted(tpch.QUERIES, key=lambda q: int(q[1:])):
        fn = tpch.QUERIES[name]
        best = float("inf")
        for _ in range(repeat):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.collect()
            best = min(best, time.perf_counter() - t0)
        if show_plan:
            print(f"=== {name} ===", file=sys.stderr)
            fn(spark, sf_dir).explain(mode="formatted")
        times[name] = round(best, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "tpch_22_total",
                "value": round(sum(times.values()), 4),
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
