"""Extension join operators Spark lacks as builtins: as-of and range.

The reference has neither (SURVEY.md §2.3: hash joins only, "no
sort-merge, no range/as-of join") — these are surplus operators a
time-series/training pipeline needs, built from shuffle-friendly
primitives:

- as-of join: the union-and-carry-forward construction — tag both
  streams, union, one shuffle on the key, per-partition sort, carry
  the latest right payload forward with last(ignorenulls). O(n log n)
  per key group, no range cross-product, AQE-skew-safe. This is the
  standard scalable formulation (vs. the naive range join whose
  worst case is quadratic).
- range join: bucketize the range dimension so the join becomes an
  equi-join on (key, bucket); residual range predicate filters the
  few in-bucket false positives. At 100 TB the bucket key shuffles
  uniformly; no nested-loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts (per key). Returns left columns + right_cols
    (null when no prior right row exists)."""
    lt = left.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(left_ts))
    rt = right.withColumn("__side", F.lit(0)).withColumn("__ts", F.col(right_ts))
    # align schemas: left payload nulls on right rows and vice versa
    for c in right_cols:
        lt = lt.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    for c in right_cols:
        rt = rt.withColumn(f"__r_{c}", F.col(c))
    lcols = [c for c in left.columns]
    lt_sel = lt.select(
        F.col(key).alias("__k"), "__ts", "__side", *[F.col(c).alias(f"__l_{c}") for c in lcols],
        *[f"__r_{c}" for c in right_cols],
    )
    rt_sel = rt.select(
        F.col(key).alias("__k"), "__ts", "__side",
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
        *[f"__r_{c}" for c in right_cols],
    )
    u = lt_sel.unionByName(rt_sel)
    # right rows sort before left rows at equal ts → asof is inclusive (>=)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "__side",
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in right_cols],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


def range_join_bucketed(
    fact: DataFrame,
    ranges: DataFrame,
    fact_val: str,
    range_start: str,
    range_end: str,
    bucket_width: Column,
    extra_key: list[str] | None = None,
) -> DataFrame:
    """Equi-join on (key, bucket) + residual range filter. `ranges`
    rows must span ≤ bucket_width so each range lands in ≤2 buckets
    (exploded); general spans would explode per covered bucket."""
    fb = fact.withColumn("__b", F.floor(F.col(fact_val).cast("double") / bucket_width))
    rb = ranges.withColumn(
        "__bs",
        F.sequence(
            F.floor(F.col(range_start).cast("double") / bucket_width),
            F.floor(F.col(range_end).cast("double") / bucket_width),
        ),
    ).withColumn("__b", F.explode("__bs")).drop("__bs")
    on = [fb["__b"] == rb["__b"]] + [fb[k] == rb[k] for k in (extra_key or [])]
    j = fb.join(rb, on)
    return j.filter(
        (fb[fact_val] >= rb[range_start]) & (fb[fact_val] < rb[range_end])
    )
