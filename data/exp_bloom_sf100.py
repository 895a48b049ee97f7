"""One-off sf100 experiment: bloom creation-side policies on q14/q12/q9/q17.

Hypothesis (from the q14 plan read): creationSideThreshold scaled to
total//20 = 1.54 GB admits the month-filtered lineitem subtree as a
bloom CREATION side (a full 600M-row rescan) to filter the 40x smaller
part/orders scans — backwards at sf100 (q14 69x, q12 19x for 10x data).
Measure three policies; guards q9/q17 are the queries the scaled
thresholds were introduced FOR at sf10.
"""
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
applied = tune_for_corpus(
    spark, data_dir, cpus=CPUS,
    extra_dirs=[warehouse_db] if os.path.isdir(warehouse_db) else None,
)
print(f"tune: {applied}", file=sys.stderr)
tpch_full.register_catalog_layout(spark, data_dir, sf_name)

SCALED = applied["spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"]
POLICIES = {
    "cap64m": {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": str(64 * 1024 * 1024),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": SCALED,
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    },
    "cap256m": {
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": str(256 * 1024 * 1024),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": SCALED,
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    },
    "off": {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "false",
    },
}
QUERIES = [14, 12, 17, 9]
REPEAT = 2

results = {}
for pname, conf in POLICIES.items():
    for k, v in conf.items():
        spark.conf.set(k, v)
    for n in QUERIES:
        runs = []
        for _ in range(REPEAT):
            spark.sparkContext._jvm.System.gc()
            t1 = time.perf_counter()
            spark.sql(tpch_full.QUERY_TEXTS[n]).collect()
            runs.append(round(time.perf_counter() - t1, 3))
        results[f"{pname}.q{n}"] = runs
        print(f"{pname:>8} q{n:<3} {runs}", file=sys.stderr)
    # reset policy keys so the next variant starts clean
    for k in conf:
        spark.conf.unset(k)

print(json.dumps(results))
