"""sf100: AQE-runtime-only broadcast threshold (actual sizes, not CBO
ests) at 512m while planning threshold stays 64m. q9 + guards."""
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
data_dir = tpch_full.ensure_full_data(spark, "sf100")
warehouse_db = os.path.dirname(tpch_full.warehouse_table_dir("sf100", "lineitem"))
tune_for_corpus(spark, data_dir, cpus=CPUS,
                extra_dirs=[warehouse_db] if os.path.isdir(warehouse_db) else None)
tpch_full.register_catalog_layout(spark, data_dir, "sf100")
spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", str(512 * 1024 * 1024))

results = {}
for n, reps in ((9, 2), (20, 1), (5, 1), (18, 1)):
    runs = []
    for _ in range(reps):
        spark.sparkContext._jvm.System.gc()
        t1 = time.perf_counter()
        spark.sql(tpch_full.QUERY_TEXTS[n]).collect()
        runs.append(round(time.perf_counter() - t1, 3))
    results[f"aqe512.q{n}"] = runs
    print(f"aqe512 q{n:<3} {runs}", file=sys.stderr, flush=True)
print(json.dumps(results))
