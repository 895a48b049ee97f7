"""One-off scale probe: the multimodal binary path at 500k images.

The committed mm_* queries cap at doc_id < 100 because their DuckDB
oracles replay the pixel math closed-form (oracle cost, not engine
cost). This experiment lifts the cap over data/gen/sf10 — generating
the media table for all 500k documents (real BMP/PPM bytes) — and
times (a) full-corpus decode + per-image stats and (b) full-corpus
dHash dedup, using the SAME suite kernels. Records one JSON line.

Run: python data/exp_mm_scale.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from iceberg_query_engine_spark.queries import multimodal_suite as mm  # noqa: E402
from iceberg_query_engine_spark.session import get_spark  # noqa: E402

spark = get_spark(master="local[32]", shuffle_partitions=64,
                  extra_conf={"spark.driver.memory": "24g"})
spark.sparkContext.setLogLevel("ERROR")
gen = os.path.join(os.path.dirname(os.path.abspath(__file__)), "gen", "sf10")

t0 = time.perf_counter()
path = mm.ensure_media_data(spark, gen)  # builds 500k-image table once
n = spark.read.parquet(path).count()
gen_s = round(time.perf_counter() - t0, 2)

results = {"n_images": n, "media_gen_or_load_s": gen_s}
media = spark.read.parquet(path).select("doc_id", "payload")

# (a) decode + stats over every image — reuse the suite's decode kernel
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from iceberg_query_engine_spark.operators import multimodal as mmops  # noqa: E402


def stats(batches):
    for pdf in batches:
        out = {"doc_id": [], "mean_px": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            px = mmops.decode_image(bytes(payload))
            out["doc_id"].append(int(doc_id))
            out["mean_px"].append(float(px.mean()))
        yield pd.DataFrame(out)


t1 = time.perf_counter()
agg = (
    media.mapInPandas(stats, "doc_id long, mean_px double")
    .agg(F.count(F.lit(1)).alias("n"), F.avg("mean_px").alias("m"))
    .collect()
)
results["decode_stats_s"] = round(time.perf_counter() - t1, 2)
results["decode_rows"] = agg[0]["n"]


def dhash(batches):
    for pdf in batches:
        out = {"doc_id": [], "dhash": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            px = mmops.resize_nearest(
                mmops.decode_image(bytes(payload)), 8, 8
            ).astype(np.int64)
            gray = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
            bits = gray[:, :-1] > gray[:, 1:]
            hval = 0
            for j, b in enumerate(bits.flatten()):
                if b:
                    hval |= 1 << j
            out["doc_id"].append(int(doc_id))
            out["dhash"].append(hval)
        yield pd.DataFrame(out)


t2 = time.perf_counter()
groups = (
    media.mapInPandas(dhash, "doc_id long, dhash long")
    .groupBy("dhash")
    .agg(F.count(F.lit(1)).alias("n"))
    .count()
)
results["phash_dedup_s"] = round(time.perf_counter() - t2, 2)
results["distinct_hashes"] = groups
print(json.dumps(results))
