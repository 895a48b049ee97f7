#!/usr/bin/env python
"""r9 optimization probe: isolate + time catalog queries (guide §1).

Times each named query with the noop sink (computes every column, no
collect-to-driver cost), BENCH-style min-of-N, and optionally writes
`.explain("formatted")` to plans/r09/<name>_<tag>.txt.

Usage:
  python data/opt_probe_r9.py [--repeat N] [--plans TAG] [--collect] q1 dedup_pipeline ...
  (no names = the full BENCH_EXTRAS list)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    repeat, plan_tag, use_collect = 3, None, False
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--repeat":
            repeat = int(args[i + 1]); i += 2
        elif a == "--plans":
            plan_tag = args[i + 1]; i += 2
        elif a == "--collect":
            use_collect = True; i += 1
        else:
            names.append(a); i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from iceberg_query_engine_spark.queries import catalog, tpch
    from iceberg_query_engine_spark.session import get_spark, tune_for_corpus

    spark = get_spark(app_name="opt-probe-r9")
    tune_for_corpus(spark, sf_dir)
    # warm exactly like bench.py
    tpch.q6(spark, sf_dir).collect()
    tpch.q1(spark, sf_dir).collect()

    all_q = catalog.all_queries()
    if not names:
        from bench import BENCH_EXTRAS

        names = list(BENCH_EXTRAS)

    plan_dir = os.path.join(os.path.dirname(__file__), "..", "plans", "r09")
    if plan_tag:
        os.makedirs(plan_dir, exist_ok=True)

    import gc

    out: dict[str, float] = {}
    for name in names:
        fn = all_q[name]
        spark.sparkContext.setJobDescription(f"opt-probe:{name}")
        best, walls = float("inf"), []
        for _ in range(repeat):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if use_collect:
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            w = time.perf_counter() - t0
            walls.append(round(w, 3))
            best = min(best, w)
        out[name] = round(best, 4)
        print(f"{name}: min {best:.3f}  walls {walls}", file=sys.stderr)
        if plan_tag:
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, sf_dir).explain(mode="formatted")
            with open(os.path.join(plan_dir, f"{name}_{plan_tag}.txt"), "w") as f:
                f.write(buf.getvalue())
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        gc.collect()
    print(json.dumps({"sf_dir": sf_dir, "repeat": repeat, "noop": not use_collect,
                      "times": out}))


if __name__ == "__main__":
    main()
