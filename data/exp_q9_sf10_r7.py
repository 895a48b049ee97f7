"""Experiment cell (r7, verdict #3): q9@sf10 join-strategy A/B on the
rewritten (semi-join-pushdown) text.

The r6 verdict confirmed the rewrite's plan is minimal-exchange (part
scanned exactly twice, ONE fact-scale exchange) and Catalyst already
prunes the semi subquery's `f.*` to the 6 needed lineitem columns at
the scan (ReadSchema-verified) — the 'narrower projection' lever the
verdict proposed is a no-op. What remains on the irreducible
lineitem↔partsupp exchange is the JOIN ALGORITHM: SMJ pays a sort of
the ~18M-row semi-filtered lineitem stream; a shuffled-hash join
builds on the 8M-row partsupp side instead. The r5 global
--prefer-hash sweep HURT q9, but that flipped every join in the
query; this cell targets ONLY the partsupp join via a hint.

Variants (median of 3, fresh GC between runs):
  A  rewritten q9 as shipped (baseline)
  B  + SHUFFLE_HASH(partsupp) on the partsupp semi-subquery alias
  C  + MERGE(partsupp) explicit (sanity: should equal A)
  D  unrewritten q9 (the standing OFF leg, for the round's A/B record)

Run:  python data/exp_q9_sf10_r7.py    (repo root)
Writes data/exp_q9_sf10_r7.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEAT = int(os.environ.get("EXP_REPEAT", "3"))
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "exp_q9_sf10_r7.json")


def main() -> None:
    from iceberg_query_engine_spark.plans.rewrites import apply_rewrites
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

    base = tpch_full.QUERY_TEXTS[9]
    rewritten = apply_rewrites(base)
    # hint goes in the OUTER query block so it names the subquery alias
    hinted_sh = rewritten.replace(
        "SELECT\n    n_name",
        "SELECT /*+ SHUFFLE_HASH(partsupp) */\n    n_name", 1
    )
    hinted_mj = rewritten.replace(
        "SELECT\n    n_name",
        "SELECT /*+ MERGE(partsupp) */\n    n_name", 1
    )
    assert hinted_sh != rewritten and hinted_mj != rewritten

    variants = {
        "A_rewrite_baseline": rewritten,
        "B_shuffle_hash_partsupp": hinted_sh,
        "C_merge_partsupp": hinted_mj,
        "D_unrewritten": base,
    }
    results: dict[str, dict] = {}
    spark.sql(rewritten).collect()  # warm
    baseline_rows = sorted(map(str, spark.sql(rewritten).collect()))
    for name, sql in variants.items():
        runs = []
        rows = None
        for _ in range(REPEAT):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            rows = spark.sql(sql).collect()
            runs.append(round(time.perf_counter() - t0, 3))
        assert sorted(map(str, rows)) == baseline_rows, f"{name}: result drift"
        results[name] = {
            "median": round(statistics.median(runs), 3),
            "best": min(runs),
            "runs": runs,
        }
        print(f"{name}: {results[name]}", file=sys.stderr)

    payload = {"experiment": "q9_sf10_join_strategy", "cpus": cpus,
               "repeat": REPEAT, "results": results}
    with open(OUT, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
