"""Dump .explain('formatted') for the r10-touched queries.

Usage: python data/dump_plans_r10.py <repo_root> <suffix> [extra_env]
Writes plans/r10/<query>_<suffix>.txt under /root/repo (always).
"""

import os
import sys

root, suffix = sys.argv[1], sys.argv[2]
sys.path.insert(0, root)
os.chdir(root)

from pyspark.sql import SparkSession  # noqa: E402

OUT = "/root/repo/plans/r10"
SF = "/root/testdata/sf0.1"

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .getOrCreate()
)

from iceberg_query_engine_spark.plans.introspect import formatted_plan  # noqa: E402
from iceberg_query_engine_spark.queries import (  # noqa: E402
    dedup_suite,
    events_suite,
    operators_suite,
    similarity_suite,
    text_suite,
)

_ = dedup_suite  # dedup_simhash reverted to the r9 shape — no dump pair

QUERIES = {
    "sim_knn_clusters": similarity_suite.sim_knn_clusters,
    "sim_knn_clusters_cheap": similarity_suite.sim_knn_clusters_cheap,
    "sim_knn_graph_recall": similarity_suite.sim_knn_graph_recall,
    "ev_window_funnel": events_suite.ev_window_funnel,
    "text_kl_divergence": text_suite.text_kl_divergence,
    "op_bloom_semi_join": operators_suite.op_bloom_semi_join,
    "text_bloom_filter": text_suite.text_bloom_filter,
}

os.makedirs(OUT, exist_ok=True)
for name, fn in QUERIES.items():
    try:
        plan = formatted_plan(fn(spark, SF))
    except Exception as exc:  # pragma: no cover
        plan = f"ERROR: {exc}"
    with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
        f.write(plan)
    print(name, suffix, "ok")
