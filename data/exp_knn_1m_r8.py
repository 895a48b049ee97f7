"""r8 experiment: the sub-quadratic kNN family at 1M vectors.

r7 verdict, Next round #3: the graph + clusters path claims n^2/K
pairwise work and O(log d) CC rounds — prove it at 1M. With the r8
sqrt(n) centroid re-seeding, K = 1000 at 1M, so the single-probe graph
is ~1e9 pairs (vs 3.1e13 under the old fixed K=32 — days of compute;
THAT is why the re-seeding was a prerequisite for this experiment).

Measures sim_knn_graph_ivf (single-probe) and sim_knn_clusters
(mutual-kNN CC over it) at 250k / 500k / 1M vectors, with per-round
CC timings at 1M confirming the parquet-spill path stays flat past
round 12. Writes exp_knn_1m_r8.json.

Usage: python data/exp_knn_1m_r8.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_query_engine_spark.session import get_spark

OUT = os.path.join(os.path.dirname(__file__), "exp_knn_1m_r8.json")
GEN_ROOT = os.path.join(os.path.dirname(__file__), "gen")
POINTS = [(5.0, 250_000), (10.0, 500_000), (20.0, 1_000_000)]


def main() -> None:
    spark = get_spark(app_name="exp_knn_1m_r8")
    from iceberg_query_engine_spark.queries import similarity_suite as sim
    from iceberg_query_engine_spark.sources.generator import generate_tpch

    out: dict = {
        "metric": "knn_family_scale_to_1m",
        "design": "K=max(32,ceil(sqrt(n))) seeds; single-probe graph; mutual-kNN CC",
        "points": [],
    }
    for sf, n in POINTS:
        sf_dir = os.path.join(GEN_ROOT, f"sf{int(sf)}")
        if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
            t0 = time.time()
            generate_tpch(
                spark, sf, sf_dir, single_file=False, only={"embeddings"}
            )
            print(f"generated {n} vectors in {time.time() - t0:.0f}s")
        row: dict = {"n_vectors": n, "sf_dir": sf_dir}

        t0 = time.time()
        edges = sim._knn_graph_ivf(spark, sf_dir).count()
        row["graph_ivf"] = {"secs": round(time.time() - t0, 2), "edges": edges}
        print(n, "graph", row["graph_ivf"])

        from pyspark.sql import functions as F

        from iceberg_query_engine_spark.queries import dedup_suite

        round_times: list = []
        orig_cc = dedup_suite.cc_labels

        def instrumented(edges, cc_spill_dir=None, on_round=None):
            return orig_cc(
                edges,
                cc_spill_dir,
                on_round=lambda r, s: round_times.append(round(s, 2)),
            )

        dedup_suite.cc_labels = instrumented
        try:
            t0 = time.time()
            cl = sim.sim_knn_clusters(spark, sf_dir)
            stats = cl.agg(
                F.count(F.lit(1)).alias("clustered"),
                F.approx_count_distinct("cluster_id").alias("n_clusters"),
            ).collect()[0]
        finally:
            dedup_suite.cc_labels = orig_cc
        row["clusters"] = {
            "secs": round(time.time() - t0, 2),
            "clustered": stats["clustered"],
            "n_clusters_approx": stats["n_clusters"],
            "cc_round_secs": round_times,
        }
        print(n, "clusters", row["clusters"])
        out["points"].append(row)
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
