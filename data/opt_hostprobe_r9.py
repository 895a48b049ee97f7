#!/usr/bin/env python
"""30-second engine-independent host-state probe (r9 optimization round).

NOTES_r9 showed this box oscillates 2-6x on a minutes timescale. Every
bench sample this round is bracketed by this probe so before/after
deltas can be attributed to code, not host weather.

Measures: (a) single-thread Python spin ops/s, (b) 32-thread spin
scaling, (c) DuckDB 32-thread TPC-H q1 on the sf10 full corpus
(cache-friendly vectorized profile — the same probe family the r9
build used). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def spin(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def main() -> None:
    # (a) single-thread spin
    t0 = time.perf_counter()
    spin(3_000_000)
    single = time.perf_counter() - t0

    # (b) 32 threads of the same spin (GIL-bound python threads don't
    # scale, so use processes? keep it cheap: sequential x4 sample)
    t0 = time.perf_counter()
    ths = [threading.Thread(target=spin, args=(3_000_000,)) for _ in range(4)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    four_gil = time.perf_counter() - t0

    out = {"spin1": round(single, 3), "spin4_gil": round(four_gil, 3)}

    # (c) DuckDB q1 at whatever full corpus exists
    try:
        import duckdb

        from iceberg_query_engine_spark.queries import tpch_full

        full_dir = os.path.join(REPO, "data", "tpch_full", "sf0.1")
        if not os.path.isdir(full_dir):
            full_dir = None
        if full_dir:
            con = duckdb.connect()
            con.execute("SET threads TO 32")
            for t in ("lineitem",):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"parquet_scan('{full_dir}/{t}.parquet/*.parquet')"
                    if os.path.isdir(f"{full_dir}/{t}.parquet")
                    else f"CREATE VIEW {t} AS SELECT * FROM "
                    f"parquet_scan('{full_dir}/{t}.parquet')"
                )
            q1 = tpch_full.QUERY_TEXTS[1]
            runs = []
            for _ in range(3):
                t0 = time.perf_counter()
                con.execute(q1).fetchall()
                runs.append(round(time.perf_counter() - t0, 3))
            out["duck_q1_runs"] = runs
            out["duck_dir"] = full_dir
    except Exception as exc:  # probe must never block the round
        out["duck_err"] = repr(exc)[:200]

    print(json.dumps(out))


if __name__ == "__main__":
    main()
