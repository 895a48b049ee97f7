"""Experiment cell (r7, verdict #2): where does q1@sf10 time go, and
what is the floor on THIS machine?

The r6 verdict's carried weak mark compares Spark q1@sf10 (1.09-1.23 s)
against the reference's single-operator morsel microbench (502 ms) and
its vectorized research path (250-265 ms) — numbers measured on the
reference's own NVMe box. This cell decomposes q1 into measurable
layers on the CURRENT machine and data so the gap attribution is
evidence, not guesswork:

  A  q1 exactly as bench_scale runs it (bucketed catalog table,
     tune_for_corpus confs, median of 5)
  B  q1 over the flat parquet directory (same session)
  C  decode floor: sum() every q1 input column, no groupBy
     (the parquet scan + filter without aggregation-by-key)
  D  narrow floor: count + one-column sum (near-pure scan)
  E  twolevel-hashmap agg toggles (verdict's suggested knob)
  F  DuckDB 1-thread... no — DuckDB ALL-cores on the same parquet:
     the same-machine analog of BASELINE's 89-180 ms NVMe number

Run:  python data/exp_q1_sf10_floor_r7.py   (from the repo root)
Writes data/exp_q1_sf10_floor_r7.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEAT = 5
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "exp_q1_sf10_floor_r7.json")


def timed(fn, repeat=REPEAT):
    runs = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        runs.append(round(time.perf_counter() - t0, 4))
    return {"median": round(statistics.median(runs), 4), "runs": runs}


def main() -> None:
    from iceberg_query_engine_spark.queries import tpch_full
    from iceberg_query_engine_spark.session import get_spark, tune_for_corpus

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
            "spark.io.compression.codec": "zstd",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    data_dir = tpch_full.ensure_full_data(spark, "sf10", layout="bucketed")
    warehouse_db = os.path.dirname(tpch_full.warehouse_table_dir("sf10", "lineitem"))
    tune_for_corpus(
        spark, data_dir, cpus=cpus,
        extra_dirs=[warehouse_db] if os.path.isdir(warehouse_db) else None,
    )
    tpch_full.register_catalog_layout(spark, data_dir, "sf10")
    q1 = tpch_full.QUERY_TEXTS[1]
    flat = spark.read.parquet(os.path.join(data_dir, "lineitem.parquet"))
    flat.createOrReplaceTempView("lineitem_flat")

    results: dict[str, dict] = {}

    # warm: JIT, footers, page cache
    spark.sql(q1).collect()
    spark.sql(q1).collect()

    results["A_q1_bucketed"] = timed(lambda: spark.sql(q1).collect())
    results["B_q1_flat"] = timed(
        lambda: spark.sql(q1.replace("lineitem", "lineitem_flat")).collect()
    )
    decode_sql = """
      select count(*) c, sum(l_quantity) a, sum(l_extendedprice) b,
             sum(l_discount) d, sum(l_tax) e,
             sum(length(l_returnflag)) f, sum(length(l_linestatus)) g
      from lineitem_flat where l_shipdate <= date '1998-09-02'
    """
    results["C_decode_all_q1_cols"] = timed(lambda: spark.sql(decode_sql).collect())
    narrow_sql = """
      select count(*) c, sum(l_quantity) a
      from lineitem_flat where l_shipdate <= date '1998-09-02'
    """
    results["D_narrow_scan"] = timed(lambda: spark.sql(narrow_sql).collect())

    for flag in ("true", "false"):
        spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", flag)
        results[f"E_q1_twolevel_{flag}"] = timed(lambda: spark.sql(q1).collect())
    spark.conf.set("spark.sql.codegen.aggregate.map.twolevel.enabled", "true")

    # DuckDB, all cores, same parquet files, same query text
    import duckdb

    con = duckdb.connect()
    con.execute(f"set threads={cpus}")
    con.execute(
        "create view lineitem as select * from read_parquet("
        f"'{os.path.join(data_dir, 'lineitem.parquet', '*.parquet')}')"
    )
    con.execute(q1).fetchall()  # warm
    results["F_duckdb_same_parquet"] = timed(lambda: con.execute(q1).fetchall())

    payload = {
        "experiment": "q1_sf10_floor",
        "cpus": cpus,
        "repeat": REPEAT,
        "results": results,
    }
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
