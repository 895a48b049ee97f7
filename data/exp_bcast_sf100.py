"""sf100 experiment: memory-aware autoBroadcastJoinThreshold.

At sf10 the winning q9 plan BROADCAST the filtered part table (est
under the 64 MB threshold); at sf100 the same filtered part (CBO est
256-512 MB) exceeds the fixed 64 MB and the plan degrades to an SMJ
exchange + (pre-fix) a fact-rescan bloom. A 512 MB threshold on a
24 GB heap is the memory-aware scale-invariant choice; census which
plans change, then time q9 plus the heavyweights as guards.
"""
import json
import os
import re
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

# census: which queries' broadcast-join count changes at 512m
def bcast_count(n):
    plan = spark.sql(tpch_full.QUERY_TEXTS[n])._jdf.queryExecution().sparkPlan().toString()
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoop", plan))

changed = []
for n in range(1, 23):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    b64 = bcast_count(n)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(512 * 1024 * 1024))
    b512 = bcast_count(n)
    if b64 != b512:
        changed.append((f"q{n}", b64, b512))
print(f"census changed: {changed}", file=sys.stderr, flush=True)

spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(512 * 1024 * 1024))
results = {"census_changed": changed}
to_time = [9] + sorted({int(q.lstrip("q")) for q, _, _ in changed} - {9})
for n in to_time:
    runs = []
    for _ in range(2):
        spark.sparkContext._jvm.System.gc()
        t1 = time.perf_counter()
        spark.sql(tpch_full.QUERY_TEXTS[n]).collect()
        runs.append(round(time.perf_counter() - t1, 3))
    results[f"b512.q{n}"] = runs
    print(f"b512 q{n:<3} {runs}", file=sys.stderr, flush=True)
print(json.dumps(results))
