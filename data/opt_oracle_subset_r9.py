#!/usr/bin/env python
"""r9-opt session-4 helper: full-value oracle compare for a SUBSET of
catalog queries (the same `testing.compare` the sweep and driver use),
at one or more scale factors. Used to prove result-identity of each
restructured query before it lands.

Usage: python data/opt_oracle_subset_r9.py q1 op_bloom_semi_join ... \
         [--sf /root/testdata/sf0.001 --sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    sfs: list[str] = []
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sfs.append(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1
    if not sfs:
        sfs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    import __spark_entry__ as e
    from pyspark.sql import SparkSession

    from iceberg_query_engine_spark.testing import compare, duck_connect

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    qs, osql = e.queries(), e.oracle_sql()
    n_fail = 0
    for sf in sfs:
        con = duck_connect(sf)
        for name in names:
            r = compare(name, qs[name](spark, sf), osql[name], sf, con)
            status = "OK " if r.ok else "FAIL"
            print(f"{status} {name} @ {os.path.basename(sf)} "
                  f"spark={r.spark_rows} duck={r.duck_rows}"
                  + ("" if r.ok else f"  {r.detail[:300]}"))
            if not r.ok:
                n_fail += 1
    print(f"done: {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
