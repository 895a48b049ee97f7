"""Experiment cell (r7): full-22 same-machine DuckDB floor at sf10.

exp_q9_duck_floor_r7 calibrated q9 (5.05 s here vs the 2.4 s published
point). This cell completes the table: ALL 22 of the reference's own
query texts, DuckDB 32-thread, on the SAME sf10 parquet the Spark
bench reads — so the Spark-vs-baseline comparison can be read as
(engine gap on this machine) x (this machine vs the baseline box),
query by query, instead of a single cross-machine ratio.

Run:  python data/exp_duck_floor_22_r7.py    (repo root)
Writes data/exp_duck_floor_22_r7.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEAT = int(os.environ.get("EXP_REPEAT", "3"))
OUT = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "exp_duck_floor_22_r7.json"
)
TABLES = [
    "part", "supplier", "partsupp", "orders",
    "lineitem", "nation", "region", "customer",
]


def main() -> None:
    import duckdb

    from iceberg_query_engine_spark.queries import tpch_full
    from iceberg_query_engine_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    data_dir = tpch_full.ensure_full_data(spark, "sf10", layout="flat")
    spark.stop()

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in TABLES:
        p = os.path.join(data_dir, f"{t}.parquet")
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    results: dict[str, dict] = {}
    for qn in range(1, 23):
        sql = tpch_full.QUERY_TEXTS[qn]
        runs = []
        for _ in range(REPEAT):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(round(time.perf_counter() - t0, 3))
        results[f"q{qn}"] = {
            "runs": runs,
            "median": round(statistics.median(runs), 3),
            "best": round(min(runs), 3),
        }
        print(f"duckdb q{qn}: {results[f'q{qn}']}", file=sys.stderr)
    total_median = round(sum(r["median"] for r in results.values()), 3)
    total_best = round(sum(r["best"] for r in results.values()), 3)
    payload = {
        "experiment": "tpch22_sf10_duckdb_same_machine_floor",
        "threads": 32,
        "repeat": REPEAT,
        "total_median": total_median,
        "total_best": total_best,
        "results": results,
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"total_median": total_median, "total_best": total_best}))


if __name__ == "__main__":
    main()
