"""r9 experiment: steady-state landing cost of the STREAMING scrub
(stream_dedup_pipeline) — does per-batch wall stay flat as the overlay
grows?

The stream scrubs the last 10% of doc_ids in `chunks` sequential
micro-batches against base index + overlay, absorbing each batch after
disposition. The risk unique to the streaming deployment is
COMPOUNDING: batch k probes an overlay holding k-1 batches of hashes /
bands / shingles (appended parquet, unpruned), so if the per-batch
wall trends upward across the run, the deployment needs overlay
compaction more often than the nightly rebuild. This measures the
per-batch walls at two corpus sizes with 10 landing chunks each.

Reference points (committed): the ONE-batch indexed delta floors from
exp_pipeline_delta_idx_r9.json / exp_pipeline_delta_idx2_r9.json —
~8-12 s per batch at 500k docs, ~29-35 s at 5M (corpus-columnar-I/O
bound below 10k-doc batches).

Usage: python data/exp_stream_scrub_r9.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_query_engine_spark.session import get_spark, tune_for_corpus

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "exp_stream_scrub_r9.json")
POINTS = [("sf10", 500_000), ("sf100", 5_000_000)]
CHUNKS = 10


def main() -> int:
    from iceberg_query_engine_spark.queries.dedup_suite import (
        PIPE_DELTA_SPLIT,
        _pipeline_delta_index_dir,
    )
    from iceberg_query_engine_spark.streaming.scrub import stream_dedup_pipeline

    spark = get_spark()
    rows_out = []
    for name, n_docs in POINTS:
        sf_dir = os.path.join(HERE, "gen", name)
        if not os.path.exists(os.path.join(sf_dir, "documents.parquet")):
            print(f"{name}: corpus missing, skipping", flush=True)
            continue
        tune_for_corpus(spark, sf_dir)
        t = int(PIPE_DELTA_SPLIT * n_docs)
        t0 = time.time()
        _pipeline_delta_index_dir(spark, sf_dir, t)
        idx_secs = round(time.time() - t0, 2)

        timings: list[dict] = []
        t0 = time.time()
        led = stream_dedup_pipeline(spark, sf_dir, chunks=CHUNKS, timings=timings)
        statuses = {
            r["status"]: r["count"]
            for r in led.groupBy("status").count().collect()
        }
        total = round(time.time() - t0, 2)
        n_led = sum(statuses.values())
        assert n_led == n_docs - t, (n_led, n_docs - t)
        batch_walls = [b["secs"] for b in timings]
        row = {
            "corpus": name,
            "n_docs": n_docs,
            "chunks": CHUNKS,
            "batch_docs": (n_docs - t) // CHUNKS,
            "index_build_secs": idx_secs,
            "stream_total_secs": total,
            "batch_secs": batch_walls,
            "first_to_last_ratio": round(
                batch_walls[-1] / batch_walls[0], 3
            )
            if batch_walls
            else None,
            "statuses": statuses,
        }
        print(json.dumps(row), flush=True)
        rows_out.append(row)

    out = {
        "metric": "stream_scrub_steady_state",
        "design": (
            "stream_dedup_pipeline with 10 landing chunks; per-batch wall "
            "from the sink hook; flat batch_secs across the run = overlay "
            "growth does not compound (the absorb-as-you-land deployment "
            "holds between index rebuilds)"
        ),
        "points": rows_out,
    }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", OUT, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
