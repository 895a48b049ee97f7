"""Time one query in a fresh session: python data/ab_time_r10.py <root> <query> <n>
Prints JSON: {"root":..., "query":..., "times":[...], "spin": s}
"""

import json
import os
import sys
import time

root, query, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
sys.path.insert(0, root)
os.chdir(root)


def spin():
    t0 = time.perf_counter()
    s = 0
    for i in range(20_000_000):
        s += i * i
    return round(time.perf_counter() - t0, 3)


sp = spin()
from iceberg_query_engine_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="ab")
from iceberg_query_engine_spark.queries import catalog  # noqa: E402

SF = "/root/testdata/sf0.1"
fn = catalog.all_queries()[query]
# JVM warmup on an unrelated cheap query
catalog.all_queries()["text_token_freq"](spark, SF).collect()
times = []
for _ in range(n):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn(spark, SF).collect()
    times.append(round(time.perf_counter() - t0, 3))
print(json.dumps({"root": root, "query": query, "times": times, "spin": sp}))
