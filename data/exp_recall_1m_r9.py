"""r9 experiment: DIRECT multi-probe recall at 1M (and 5M) vectors via
sampled ground truth — the r8 verdict's #1 ask (the one load-bearing
unmeasured claim: ~0.69 extrapolated at P=24; P≈48–64 predicted to
restore ≥0.85 by the √2-per-doubling rule).

Method: ~1000 seeded sample queries (vec_id % (n//1000) == 7).
  * Exact ground truth: the blocked-grid kernel with the SAMPLE as the
    left frame and the full corpus as the right frame
    (_knn_join_frames) — 1e9 pairs at 1M instead of the 1e12 full
    self-join (~minutes, not hours). Same kernel, same rounding, same
    tie-break as the production join.
  * Graph answer per P: the multi-probe machinery with the LEFT side
    restricted to the sampled ids. The per-cell kernel computes each
    left row's top-k independently against the full m-indexed right
    side, so the sampled rows' neighbor lists are BIT-IDENTICAL to the
    full build's — at ~|sample|/n of the pairwise cost. One probe
    assignment pass at P_max is shared across the whole P grid.
Recall@3 = |graph ∩ exact| / |exact| over the sampled l_ids.

Writes exp_recall_1m_r9.json: recall at P=24 (the shipping operating
point), the measured P that reaches ≥0.85, and the single-probe basis
point, at 1M and 5M vectors.

Usage: python data/exp_recall_1m_r9.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_query_engine_spark.session import get_spark

OUT = os.path.join(os.path.dirname(__file__), "exp_recall_1m_r9.json")
GEN_ROOT = os.path.join(os.path.dirname(__file__), "gen")
K = 3
M_IDX = 3  # KNN_IDX_PROBES
P_GRID = (1, 24, 34, 48, 64, 96, 128)  # 1 = the single-probe basis
P_MAX = max(P_GRID)
POINTS = [("sf20", 1_000_000, (1, 24, 34, 48, 64, 96, 128)),
          ("sf100", 5_000_000, (1, 24, 48, 96, 128))]


def main() -> None:
    spark = get_spark(app_name="exp_recall_1m_r9")
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from iceberg_query_engine_spark.functions.vector import (
        knn_join_fn,
        top_probe_centroids_udf,
    )
    from iceberg_query_engine_spark.queries.similarity_suite import (
        _as_double,
        _grid_blocks,
        _knn_join_frames,
        _sqrt_centroids,
    )
    from iceberg_query_engine_spark.queries.tpch import tables

    out: dict = {
        "metric": "multiprobe_recall_sampled_ground_truth",
        "design": "m=3 index probes; sampled left side (~1000 queries); "
        "exact truth via the blocked-grid kernel sample-vs-corpus",
        "points": [],
    }
    for name, n, p_grid in POINTS:
        sf_dir = os.path.join(GEN_ROOT, name)
        (embeddings,) = tables(spark, sf_dir, "embeddings")
        e = embeddings.select(
            "vec_id", _as_double(F.col("embedding")).alias("v")
        )
        stride = n // 1000
        sample = e.filter(F.col("vec_id") % stride == 7)
        row: dict = {"corpus": name, "n_vectors": n, "sample_stride": stride}

        # ---- exact sampled ground truth --------------------------------
        t0 = time.time()
        exact = (
            _knn_join_frames(sample, e, 1, _grid_blocks(n), k=K, ordered=False)
            .select("l_id", "n_id")
            .localCheckpoint()
        )
        n_exact = exact.count()
        row["exact"] = {"secs": round(time.time() - t0, 2), "edges": n_exact}
        print(name, "exact", row["exact"], flush=True)

        # ---- one probe-assignment pass at P_MAX, shared ----------------
        t0 = time.time()
        centroids = _sqrt_centroids(e)
        rows = centroids.collect()  # K≈√n centroids: MBs
        kernel = top_probe_centroids_udf(
            np.array([r.cv for r in rows]),
            np.array([r.c_id for r in rows]),
            max(M_IDX, P_MAX),
        ).asNondeterministic()
        probed = e.withColumn("probes", kernel(F.col("v"))).localCheckpoint()
        row["assign_secs"] = round(time.time() - t0, 2)
        row["n_centroids"] = len(rows)
        print(name, "assigned", row["assign_secs"], "s,", len(rows), "cells",
              flush=True)

        # ---- graph answer per P over the sampled left side -------------
        run = knn_join_fn(K)
        sample_ids = F.col("vec_id") % stride == 7
        row["recall_by_p"] = {}
        for p in p_grid:
            m = 1 if p == 1 else M_IDX  # p=1 is the single-probe basis
            t0 = time.time()
            left = probed.filter(sample_ids).select(
                F.col("vec_id").alias("l_id"),
                F.col("v").alias("lv"),
                F.explode(F.slice("probes", 1, p)).alias("cluster"),
            )
            right = probed.select(
                F.col("vec_id").alias("n_id"),
                "v",
                F.explode(F.slice("probes", 1, m)).alias("cluster"),
            )
            partial = (
                left.groupBy("cluster")
                .cogroup(right.groupBy("cluster"))
                .applyInPandas(run, "l_id bigint, n_id bigint, cosine double")
            )
            w = Window.partitionBy("l_id").orderBy(
                F.col("cosine").desc(), F.col("n_id")
            )
            dup = F.coalesce(F.lag("n_id").over(w) == F.col("n_id"), F.lit(False))
            graph = (
                partial.withColumn("dup", dup)
                .filter(~F.col("dup"))
                .withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= K)
                .select("l_id", "n_id")
            )
            hit = exact.join(graph, ["l_id", "n_id"], "semi").count()
            rec = round(hit / n_exact, 4)
            row["recall_by_p"][str(p)] = {
                "recall": rec,
                "secs": round(time.time() - t0, 2),
            }
            print(name, f"P={p} m={m}", rec, flush=True)
        out["points"].append(row)
        spark.catalog.clearCache()
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
