"""Timing cells round 2: blooms fully OFF for q5/q21/q8/q9 at sf100.
(Baseline with blooms on is the committed sweep; cap64m cells measured
in exp_bloom_sf100.)"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
from iceberg_query_engine_spark.session import get_spark, tune_for_corpus
from iceberg_query_engine_spark.queries import tpch_full

CPUS = 32
spark = get_spark(
    master=f"local[{CPUS}]",
    shuffle_partitions=2 * CPUS,
    extra_conf={
        "spark.sql.join.preferSortMergeJoin": "true",
        "spark.driver.memory": "24g",
        "spark.io.compression.codec": "zstd",
    },
)
spark.sparkContext.setLogLevel("ERROR")
sf_name = "sf100"
data_dir = tpch_full.ensure_full_data(spark, sf_name)
warehouse_db = os.path.dirname(tpch_full.warehouse_table_dir(sf_name, "lineitem"))
tune_for_corpus(
    spark, data_dir, cpus=CPUS,
    extra_dirs=[warehouse_db] if os.path.isdir(warehouse_db) else None,
)
tpch_full.register_catalog_layout(spark, data_dir, sf_name)
spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")

results = {}
for n in (5, 8, 9, 21):
    runs = []
    for _ in range(2):
        spark.sparkContext._jvm.System.gc()
        t1 = time.perf_counter()
        spark.sql(tpch_full.QUERY_TEXTS[n]).collect()
        runs.append(round(time.perf_counter() - t1, 3))
    results[f"off.q{n}"] = runs
    print(f"off q{n:<3} {runs}", file=sys.stderr, flush=True)
print(json.dumps(results))
