"""Skew-mitigation operators: salted aggregation and salted broadcast join.

At 100 TB a handful of hot keys (one user, one null-ish default, one
viral document) can pin a single reducer. Two standard remedies, both
semantics-preserving (oracle-checkable):

- salted two-phase aggregation: groupBy (key, salt) partial-aggregate
  → groupBy key final-aggregate. The hot key's rows spread over
  `n_salts` reducers in phase 1; phase 2 merges n_salts tiny rows.
  (This generalizes Spark's map-side partial agg to *reducer*-side
  splitting for extreme skew / high-cardinality-distinct cases.)
- replicated (salted) join: explode the small side n_salts times with
  a salt column, salt the big side by hash — every big-side row still
  meets its match exactly once. AQE's skew-join handles moderate skew
  automatically; this is the explicit tool for extreme cases.

The salt is deterministic (hash of secondary columns, not rand()) so
results are reproducible run-to-run — a data-pipeline requirement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(cols: list[str], n_salts: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    salt_cols: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: output_name -> (agg_kind, input_col); agg_kind ∈
    {sum, count, min, max} (mergeable aggregates decompose exactly;
    avg callers use sum+count).
    """
    partial_exprs = []
    final_exprs = []
    for name, (kind, col) in aggs.items():
        p = f"__p_{name}"
        if kind == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(name))
        elif kind == "count":
            partial_exprs.append(F.count(col).alias(p))
            final_exprs.append(F.sum(p).cast("bigint").alias(name))
        elif kind == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(name))
        elif kind == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(name))
        else:
            raise ValueError(f"non-mergeable aggregate: {kind}")
    salted = df.withColumn("__salt", _salt(salt_cols, n_salts))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Replicate the small side across n_salts salts; the big side picks
    one deterministic salt per row → equi-join on (key, salt) spreads a
    hot key over n_salts tasks."""
    small_rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(key), F.lit(42)), F.lit(n_salts))
    )
    return big_salted.join(small_rep, [key, "__salt"]).drop("__salt")
