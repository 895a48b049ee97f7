"""r9 experiment: incremental vs rebuild cost of the corpus scrub.

r8 verdict, Next round #3: dedup_pipeline_delta composes the existing
pieces so a landing batch gets dispositions without recomputing the
kept corpus's ledger. Measure the stateless delta (last 10% of doc_ids
as the batch) against the full dedup_pipeline rebuild at sf10
(500k docs) and sf100 (5M docs). Writes exp_pipeline_delta_r9.json.

Expectation: the delta still pays the corpus band/hash map passes
(stateless form, the sim_knn_graph_delta convention), so the win is
bounded by the shuffle/CC/pair work it skips, not the scan; the
stored-table deployment removes the scans too.

Usage: python data/exp_pipeline_delta_r9.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_query_engine_spark.session import get_spark, tune_for_corpus

OUT = os.path.join(os.path.dirname(__file__), "exp_pipeline_delta_r9.json")
GEN_ROOT = os.path.join(os.path.dirname(__file__), "gen")
POINTS = [("sf10", 500_000), ("sf100", 5_000_000)]


def main() -> None:
    spark = get_spark(app_name="exp_pipeline_delta_r9")
    from pyspark.sql import functions as F

    from iceberg_query_engine_spark.queries import dedup_suite as ds

    out: dict = {
        "metric": "pipeline_delta_vs_rebuild",
        "design": "stateless delta: batch = last 10% of doc_ids; "
        "keep-old-ids dedup; affected-band pruning via broadcast semi-join",
        "points": [],
    }
    for name, n_docs in POINTS:
        sf_dir = os.path.join(GEN_ROOT, name)
        tune_for_corpus(spark, sf_dir)
        row: dict = {"corpus": name, "n_docs": n_docs}

        t0 = time.time()
        delta = ds.dedup_pipeline_delta(spark, sf_dir)
        dstat = {
            r.status: r.n
            for r in delta.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        row["delta"] = {
            "secs": round(time.time() - t0, 2),
            "batch_rows": sum(dstat.values()),
            "statuses": dstat,
        }
        print(name, "delta", row["delta"], flush=True)
        spark.catalog.clearCache()

        t0 = time.time()
        full = ds.dedup_pipeline(spark, sf_dir)
        fstat = {
            r.status: r.n
            for r in full.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        row["rebuild"] = {
            "secs": round(time.time() - t0, 2),
            "rows": sum(fstat.values()),
            "statuses": fstat,
        }
        row["delta_over_rebuild"] = round(
            row["delta"]["secs"] / row["rebuild"]["secs"], 3
        )
        print(name, "rebuild", row["rebuild"], row["delta_over_rebuild"], flush=True)
        spark.catalog.clearCache()
        out["points"].append(row)
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
