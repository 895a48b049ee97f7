"""Explain-only census: which runtime bloom filters exist in q14/q12/q17/q9
at each creationSideThreshold. No execution — reads plans only."""
import os
import re
import sys

sys.path.insert(0, "/root/repo")
from iceberg_query_engine_spark.session import get_spark, tune_for_corpus
from iceberg_query_engine_spark.queries import tpch_full

CPUS = 8
spark = get_spark(
    master=f"local[{CPUS}]",
    shuffle_partitions=16,
    extra_conf={"spark.driver.memory": "8g"},
)
spark.sparkContext.setLogLevel("ERROR")
sf_name = "sf100"
data_dir = tpch_full.ensure_full_data(spark, sf_name)
warehouse_db = os.path.dirname(tpch_full.warehouse_table_dir(sf_name, "lineitem"))
applied = tune_for_corpus(
    spark, data_dir, cpus=32,
    extra_dirs=[warehouse_db] if os.path.isdir(warehouse_db) else None,
)
tpch_full.register_catalog_layout(spark, data_dir, sf_name)

M = 1024 * 1024
for cap in (10 * M, 64 * M, 128 * M, 256 * M, 512 * M, 1541259549):
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", str(cap))
    for n in (14, 12, 17, 9, 5, 21, 3, 8):
        plan = spark.sql(tpch_full.QUERY_TEXTS[n])._jdf.queryExecution().optimizedPlan().toString()
        blooms = re.findall(r"bloom_filter_agg\((\w+)", plan)
        print(f"cap={cap//M:>5}m q{n:<3} blooms_on={sorted(set(blooms))}")
