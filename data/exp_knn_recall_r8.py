"""r8 experiment: IVF kNN-graph recall fix measured at 50k vectors.

The r7 verdict's #1 ask: raise sim_knn_graph_recall's multi-probe
recall from 0.433 to >= 0.8 at 50k with the cost ratio measured.
Design change under test: sqrt(n) centroid re-seeding + index-side
top-KNN_IDX_PROBES cell assignment + query-side KNN_QUERY_PROBES
probes (similarity_suite._knn_graph_multiprobe).

Usage: python data/exp_knn_recall_r8.py  (writes exp_knn_recall_r8.json)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_query_engine_spark.session import get_spark

SF_DIR = os.environ.get("KNN_SF_DIR", "data/gen/sf1")  # 50k vectors
OUT = os.path.join(os.path.dirname(__file__), "exp_knn_recall_r8.json")


def main() -> None:
    spark = get_spark(app_name="exp_knn_recall_r8")
    from iceberg_query_engine_spark.queries import similarity_suite as sim

    out: dict = {
        "metric": "sim_knn_graph_recall_50k",
        "sf_dir": SF_DIR,
        "design": {
            "centroids": "max(32, ceil(sqrt(n)))",
            "idx_probes": sim.KNN_IDX_PROBES,
            "query_probes": sim.KNN_QUERY_PROBES,
        },
    }

    # cost: exact blocked join vs the multiprobe graph vs single-probe
    for name, fn in (
        ("exact_join", lambda: sim._knn_join(spark, SF_DIR, ordered=False)),
        ("graph_single", lambda: sim._knn_graph_ivf(spark, SF_DIR)),
        ("graph_multiprobe", lambda: sim._knn_graph_multiprobe(spark, SF_DIR)),
    ):
        runs = []
        for _ in range(2):
            t0 = time.time()
            n = fn().count()
            runs.append(round(time.time() - t0, 2))
        out[name] = {"runs_s": runs, "rows": n}

    t0 = time.time()
    row = sim.sim_knn_graph_recall(spark, SF_DIR).collect()[0].asDict()
    out["recall_gate"] = {"time_s": round(time.time() - t0, 2), **row}
    out["note"] = (
        "hash-random 64-dim vectors (near-worst-case for IVF: cosine "
        "sigma=1/sqrt(dim), no cluster structure); r7 baseline was "
        "recall 0.164 single / 0.433 multiprobe (m=1,P=4,K=32 fixed)"
    )
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
