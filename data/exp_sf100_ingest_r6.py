"""Round-6 sf100 re-ingest: one fact at a time within the disk budget.

r5's sf100 warehouse was reclaimed between rounds; rebuilding flat +
bucketed for all three facts simultaneously needs ~50 GB transient
(this VM has ~41 free). Sequence per fact: generate flat → bucketed
write (shuffle-free past BUCKET_SHUFFLE_MAX_BYTES) → ANALYZE →
reclaim_flat deletes the flat copy. Peak = all-flat (27 GB) shrinking
as each bucketed copy (~ same size) replaces its flat.

Run: python data/exp_sf100_ingest_r6.py
"""

from __future__ import annotations

import os
import sys
import time

from iceberg_query_engine_spark.queries import tpch_full
from iceberg_query_engine_spark.session import get_spark, tune_for_corpus


def main() -> int:
    spark = get_spark(
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "24g"),
            "spark.io.compression.codec": "zstd",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = os.path.join(tpch_full.FULL_DATA_ROOT, "sf100")
    os.makedirs(out, exist_ok=True)

    # dims first (tiny, mostly committed already)
    dims = [t for t in tpch_full.FULL_TABLES if t not in tpch_full.BUCKET_SPECS]
    missing_dims = {
        t for t in dims if not os.path.exists(os.path.join(out, f"{t}.parquet"))
    }
    if missing_dims:
        t0 = time.time()
        tpch_full.generate_tpch_full(spark, 100, out, single_file=False, only=missing_dims)
        print(f"dims {sorted(missing_dims)}: {time.time() - t0:.0f}s", file=sys.stderr)

    buckets = None
    for t in ("lineitem", "orders", "partsupp"):
        if tpch_full._warehouse_has("sf100", t):
            print(f"{t}: bucketed copy already present", file=sys.stderr)
            continue
        flat = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(flat):
            t0 = time.time()
            tpch_full.generate_tpch_full(spark, 100, out, single_file=False, only={t})
            print(f"generate {t}: {time.time() - t0:.0f}s", file=sys.stderr)
        if t == "lineitem" or buckets is None:
            # size the bucket count while a fact's flat copy exists;
            # one count for ALL facts (mismatched counts defeat the
            # exchange-free co-bucketed joins — ADVICE r5)
            buckets = tpch_full.pick_bucket_count(out) if t == "lineitem" else 128
        tune_for_corpus(spark, out)
        t0 = time.time()
        tpch_full.register_catalog_layout(
            spark, out, "sf100", buckets=buckets, only={t}, reclaim_flat=True
        )
        print(
            f"bucket+analyze+reclaim {t}: {time.time() - t0:.0f}s "
            f"(buckets={buckets})",
            file=sys.stderr,
        )
    # attach the dimensions to the catalog db too
    tpch_full.register_catalog_layout(spark, out, "sf100", buckets=buckets)
    print("sf100 warehouse ready", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
