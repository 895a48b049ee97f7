#!/usr/bin/env python
"""r9 optimization: per-stage/job breakdown of one catalog query.

Runs the named query (noop sink) in a UI-enabled session and prints the
job/stage wall-clock breakdown + SQL-node metrics from the UI REST API
(guide §7.1 — where does the time go: scheduling, shuffle, compute?).

Usage: python data/opt_sqlmetrics_r9.py <query> [sf_dir] [repeat]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from iceberg_query_engine_spark.queries import catalog, tpch
    from iceberg_query_engine_spark.session import get_spark, tune_for_corpus

    spark = get_spark(
        app_name=f"sqlmetrics-{name}",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"},
    )
    tune_for_corpus(spark, sf_dir)
    tpch.q6(spark, sf_dir).collect()
    tpch.q1(spark, sf_dir).collect()

    fn = catalog.all_queries()[name]
    walls = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
    # mark: everything after this jobId belongs to the LAST run
    sc = spark.sparkContext

    def api(path: str):
        base = f"http://localhost:4099/api/v1/applications/{sc.applicationId}"
        with urllib.request.urlopen(base + path) as r:
            return json.load(r)

    jobs = api("/jobs")
    # jobs of the final run: take the most recent len-unknown — report all
    # jobs with submission time in the last wall window
    jobs = sorted(jobs, key=lambda j: j["submissionTime"])
    print(f"query={name} walls={walls}")
    print("--- last-run jobs (most recent first) ---")
    from datetime import datetime, timezone

    def ts(s):
        return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").replace(
            tzinfo=timezone.utc
        )

    recent = jobs[-12:]
    tot_job = 0.0
    for j in recent:
        dur = (
            ts(j["completionTime"]).timestamp() - ts(j["submissionTime"]).timestamp()
            if j.get("completionTime")
            else -1
        )
        tot_job += max(dur, 0)
        print(
            f"job {j['jobId']}: {dur*1000:.0f} ms  stages={j['stageIds']}  "
            f"desc={str(j.get('description'))[:60]}"
        )
    print(f"sum job wall: {tot_job:.3f} s of {walls[-1]} s elapsed "
          f"(gap = driver/planning/AQE)")
    print("--- stages of those jobs ---")
    sids = sorted({s for j in recent for s in j["stageIds"]})
    for s in api("/stages?status=complete"):
        if s["stageId"] not in sids:
            continue
        print(
            f"stage {s['stageId']}: {s['executorRunTime']} ms run, "
            f"{s['numCompleteTasks']} tasks, "
            f"in={s['inputBytes']} sh_r={s['shuffleReadBytes']} "
            f"sh_w={s['shuffleWriteBytes']} "
            f"name={s['name'][:70]}"
        )


if __name__ == "__main__":
    main()
