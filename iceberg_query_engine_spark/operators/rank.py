"""Distributed exact global ranking — the scale-safe replacement for
``Window.orderBy(...)`` with no partitionBy.

An unpartitioned window moves EVERY row through one task (Spark's own
``WARN WindowExec: No Partition Defined``); fine at 10^4 rows, a hard
single-thread stall at 10^8+. The reference engine never hits this
because its window operator is single-node anyway; on a cluster the
equivalent must be a range-partitioned two-pass rank:

  pass 1  repartitionByRange over the sort key (sampled range
          boundaries, balanced shards), localCheckpoint so both
          consumers below see the identical layout;
  pass 2a per-shard row counts -> per-shard rank offsets (bounded
          collect: numPartitions rows, same class as the K=32
          centroid collects elsewhere in this repo);
  pass 2b per-shard ``row_number`` (window PARTITIONED by the shard
          id -- every shard ranks in its own task) + its shard's
          offset = the exact global rank.

Because the caller supplies a strict total order (tie-broken to a
unique key), the result is bit-identical to the single-partition
``row_number``/``ntile`` it replaces, so the DuckDB oracles replay
unchanged. This is the same trick Spark itself uses inside
``SparkContext.zipWithIndex`` and what Delta's OPTIMIZE ZORDER does
via ``range_partition_id``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Below this many ESTIMATED input bytes (Catalyst optimized-plan stats,
# no job launched) the two-pass machinery's fixed costs — the range
# exchange's sampling job, the eager localCheckpoint, the offsets
# collect — dominate the work itself: op_zorder's three ntile passes
# cost 2.86 s at sf0.1 vs ~0.7 s for the degenerate form (BENCH_r06).
# Below the gate we run the SAME algorithm with ONE shard: repartition(1)
# + a window PARTITIONED by the shard id — bit-identical output
# (tests/test_rank.py::test_gate_parity), still never an unpartitioned
# Window node, and exactly what the big path plans when n_part == 1.
# Catalyst's estimate is conservative upward for aggregates (propagates
# the CHILD size), so a derived frame over a big fact stays on the
# range path — the scale-safe direction to be wrong in.
_SMALL_INPUT_MAX_BYTES = 64 << 20


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate in bytes — free (no job).
    Unknown/huge estimates read as 'big' so the gate fails toward the
    distributed path."""
    try:
        # py4j hands scala BigInt back as a Python int already
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()  # noqa: SLF001
        )
    except Exception:  # noqa: BLE001 — any JVM hiccup → assume big
        return 1 << 62


def _as_columns(order_cols) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in order_cols]


def _pick_partitions(df: DataFrame, num_partitions: int | None) -> int:
    if num_partitions is not None:
        return num_partitions
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))


def _is_small(df: DataFrame, small_threshold_bytes: int | None) -> bool:
    thr = (
        _SMALL_INPUT_MAX_BYTES
        if small_threshold_bytes is None
        else small_threshold_bytes
    )
    return thr > 0 and _plan_size_bytes(df) < thr


def _one_shard(df: DataFrame, pid_c: str) -> DataFrame:
    """The n_part == 1 degenerate layout: one round-robin exchange
    (upstream stages keep their parallelism — unlike coalesce(1), which
    would collapse the producing stage to one task too)."""
    return df.repartition(1).withColumn(pid_c, F.spark_partition_id())


def ranked_by_range(
    df: DataFrame,
    order_cols,
    out: str = "rn",
    num_partitions: int | None = None,
    checkpoint: bool = True,
    small_threshold_bytes: int | None = None,
) -> tuple[DataFrame, int]:
    """Exact global ``row_number`` over ``order_cols`` without a
    single-partition window. Returns ``(df + out column, total rows)``.

    ``order_cols`` must define a strict total order (unique tie-break
    key) — identical contract to the ``row_number().over(orderBy(...))``
    it replaces. Helper columns are dropped before return.

    ``small_threshold_bytes``: estimated-input-bytes gate below which
    the one-shard degenerate path runs (see ``_SMALL_INPUT_MAX_BYTES``);
    ``0`` forces the range path (tests), ``None`` the module default.
    """
    cols = _as_columns(order_cols)
    pid_c = f"__{out}_pid"
    loc_c = f"__{out}_loc"
    if _is_small(df, small_threshold_bytes):
        part = _one_shard(df, pid_c)
        w = Window.partitionBy(pid_c).orderBy(*cols)
        ranked = part.withColumn(out, F.row_number().over(w).cast("long"))
        return ranked.drop(pid_c), df.count()
    n_part = _pick_partitions(df, num_partitions)

    part = df.repartitionByRange(n_part, *cols).withColumn(
        pid_c, F.spark_partition_id()
    )
    if checkpoint:
        # Both consumers (counts collect + ranking query) must see the
        # SAME shard layout; checkpoint also avoids recomputing the
        # upstream lineage once per consumer.
        part = part.localCheckpoint(eager=True)

    counts = {
        row[pid_c]: row["cnt"]
        for row in part.groupBy(pid_c).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    total = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    if offsets:
        off_map = F.create_map(
            *[lit for pid, off in offsets.items() for lit in (F.lit(pid), F.lit(off))]
        )
    else:
        off_map = F.create_map()
    w = Window.partitionBy(pid_c).orderBy(*cols)
    ranked = part.withColumn(loc_c, F.row_number().over(w)).withColumn(
        out,
        (
            F.col(loc_c).cast("long")
            # keys provably present (same checkpointed data computed the
            # map); try_ keeps ANSI sessions (the driver's mode) safe.
            + F.coalesce(F.try_element_at(off_map, F.col(pid_c)), F.lit(0))
        ),
    )
    return ranked.drop(pid_c, loc_c), total


def cumsum_by_range(
    df: DataFrame,
    order_cols,
    value_col: str,
    out: str = "running",
    num_partitions: int | None = None,
    checkpoint: bool = True,
    rank_out: str | None = None,
    small_threshold_bytes: int | None = None,
) -> DataFrame:
    """Exact global running total over ``order_cols`` without a
    single-partition window — the cumulative-sum twin of
    :func:`ranked_by_range` (per-shard SUM offsets instead of COUNT
    offsets; pass 2 is a per-shard cumulative window + its shard's
    prefix sum).

    ``value_col`` must be EXACT-ADDITIVE (integer or decimal): the
    shard totals are accumulated in a different order than a serial
    scan, so only order-independent addition keeps the result
    bit-identical to the ``SUM() OVER (ORDER BY ...)`` it replaces
    (floats would drift at the ulp level and can flip a rounded 4th
    decimal ~1e9 rows in). Cast upstream: ``col.cast("decimal(18,2)")``.

    ``rank_out``: also emit the exact global ``row_number`` under that
    name — FUSED into the same shuffle/checkpoint/offsets-collect (a
    separate ranked_by_range call would pay the range exchange twice).
    """
    cols = _as_columns(order_cols)
    pid_c = f"__{out}_pid"
    if _is_small(df, small_threshold_bytes):
        part = _one_shard(df, pid_c)
        w_small = (
            Window.partitionBy(pid_c)
            .orderBy(*cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        run = part.withColumn(out, F.sum(value_col).over(w_small))
        if rank_out is not None:
            run = run.withColumn(
                rank_out,
                F.row_number()
                .over(Window.partitionBy(pid_c).orderBy(*cols))
                .cast("long"),
            )
        return run.drop(pid_c)
    n_part = _pick_partitions(df, num_partitions)

    part = df.repartitionByRange(n_part, *cols).withColumn(
        pid_c, F.spark_partition_id()
    )
    if checkpoint:
        part = part.localCheckpoint(eager=True)

    stats = {
        row[pid_c]: (row["s"], row["c"])
        for row in part.groupBy(pid_c)
        .agg(F.sum(value_col).alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    offsets: dict[int, object] = {}
    rank_offsets: dict[int, int] = {}
    acc: object = 0
    racc = 0
    for pid in sorted(stats):
        offsets[pid] = acc
        rank_offsets[pid] = racc
        s, c = stats[pid]
        acc += s if s is not None else 0
        racc += c

    def _mk_map(d):
        if not d:
            return F.create_map()
        return F.create_map(
            *[lit for pid, off in d.items() for lit in (F.lit(pid), F.lit(off))]
        )

    off_map = _mk_map(offsets)
    w = (
        Window.partitionBy(pid_c)
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = part.withColumn(
        out,
        F.sum(value_col).over(w)
        + F.coalesce(F.try_element_at(off_map, F.col(pid_c)), F.lit(0)),
    )
    if rank_out is not None:
        roff_map = _mk_map(rank_offsets)
        run = run.withColumn(
            rank_out,
            F.row_number().over(Window.partitionBy(pid_c).orderBy(*cols)).cast("long")
            + F.coalesce(F.try_element_at(roff_map, F.col(pid_c)), F.lit(0)),
        )
    return run.drop(pid_c)


def ntile_by_range(
    df: DataFrame,
    n_buckets: int,
    order_cols,
    out: str = "bucket",
    num_partitions: int | None = None,
    checkpoint: bool = True,
    small_threshold_bytes: int | None = None,
) -> DataFrame:
    """Exact ``ntile(n_buckets)`` over a global order, distributed.

    SQL ntile fills the first ``n mod B`` buckets with ``n div B + 1``
    rows and the rest with ``n div B``; given the exact global rank
    from :func:`ranked_by_range` the bucket is closed-form integer
    arithmetic (validated against ``F.ntile`` in tests/test_rank.py).
    """
    cols = _as_columns(order_cols)
    if _is_small(df, small_threshold_bytes):
        # One shard → native ntile over the shard-id-partitioned window:
        # no offsets collect and no count job at all.
        pid_c = f"__{out}_pid"
        part = _one_shard(df, pid_c)
        w_small = Window.partitionBy(pid_c).orderBy(*cols)
        return part.withColumn(out, F.ntile(n_buckets).over(w_small)).drop(pid_c)
    rn_c = f"__{out}_rn"
    ranked, total = ranked_by_range(
        df,
        order_cols,
        out=rn_c,
        num_partitions=num_partitions,
        checkpoint=checkpoint,
        small_threshold_bytes=0,  # gate decided above; don't re-count
    )
    q, r = divmod(total, n_buckets)
    rn = F.col(rn_c)
    if q == 0:
        bucket = rn
    else:
        head = r * (q + 1)
        bucket = F.when(rn <= head, ((rn + q) / (q + 1)).cast("long")).otherwise(
            r + ((rn - head + q - 1) / q).cast("long")
        )
    return ranked.withColumn(out, bucket.cast("int")).drop(rn_c)
