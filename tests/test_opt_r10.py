"""r10-opt focused tests (r9 verdict 'Next round' items):

- broadcast_if_small: the hint exists only below the source-size gate
  (#2 — an unconditional F.broadcast on an unbounded-cardinality frame
  loses the planner's sort-merge fallback at 100 TB), and the three
  gated queries keep their BroadcastHashJoin at test scale.
- persist_if_large unpersist contract (#6): a gated query leaves no
  persisted RDDs once release_gated_persists() runs — the hook any
  long-lived session calls between queries (bench.py does per repeat).
- dedup_simhash respread (#4): MEASURED A NET LOSS at every corpus
  size tried (sf0.1 and a 75k-doc corpus with oversized buckets) —
  the vote stage's work is PAIR_BUCKET_CAP-bounded, so the extra
  exchange has nothing to amortize; reverted to the r9 shape
  (evidence in OPTIMIZATION_r10.md). No test — no change shipped.
- sim_knn_graph_recall shared probe pass (#5): probes[0] of the
  multi-probe kernel IS the nearest-centroid assignment (bit-identical
  cluster ids), so the shared-pass recall equals the standalone ops'.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_query_engine_spark.plans import introspect as pi
from iceberg_query_engine_spark.queries import (
    dedup_suite,
    events_suite,
    operators_suite,
    similarity_suite,
    text_suite,
)
from iceberg_query_engine_spark.queries.tpch import (
    _GATED_PERSISTS,
    broadcast_if_small,
    persist_if_large,
    release_gated_persists,
    tables,
)


# ---------------------------------------------------------------- broadcast
def test_broadcast_hint_only_below_gate(spark, sf_smoke, monkeypatch):
    (lineitem,) = tables(spark, sf_smoke, "lineitem")
    frame = lineitem.select("l_orderkey").distinct()
    hinted = broadcast_if_small(frame, sf_smoke, "lineitem")
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    monkeypatch.setenv("SPARK_GRAFT_BROADCAST_HINT_MAX_BYTES", "1")
    unhinted = broadcast_if_small(frame, sf_smoke, "lineitem")
    analyzed = unhinted._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed
    # unknown source size: safe side is NO hint
    assert (
        "ResolvedHint"
        not in broadcast_if_small(frame, sf_smoke, "no_such_table")
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )


def test_gated_queries_keep_broadcast_join_at_test_scale(spark, sf_smoke):
    """At sf defaults (sources ≪ 1 GB) the gate keeps the hint, so the
    flagged joins still build broadcast sides — the r9 plans hold."""
    for fn in (
        events_suite.ev_window_funnel,
        text_suite.text_kl_divergence,
        operators_suite.op_bloom_semi_join,
    ):
        assert pi.broadcast_count(fn(spark, sf_smoke)) >= 1, fn.__name__


def test_malformed_env_falls_back(spark, sf_smoke, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE_MIN_BYTES", "not-a-number")
    (lineitem,) = tables(spark, sf_smoke, "lineitem")
    # must not raise; sf0.001 lineitem ≪ 256 MB default → gate off
    df = persist_if_large(lineitem.select("l_orderkey"), sf_smoke, "lineitem")
    assert df.storageLevel.useMemory is False


# ---------------------------------------------------------------- unpersist
def test_release_gated_persists_drops_caches(spark, sf_smoke, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE_MIN_BYTES", "1")
    (lineitem,) = tables(spark, sf_smoke, "lineitem")
    df = persist_if_large(lineitem.select("l_orderkey"), sf_smoke, "lineitem")
    assert df.storageLevel.useMemory  # gate fired
    df.count()  # materialize
    assert release_gated_persists() >= 1
    assert not _GATED_PERSISTS
    assert df.storageLevel.useMemory is False  # no persisted RDD remains


# ------------------------------------------------------ shared probe pass
def test_probe_top1_is_nearest_assignment(spark, sf_smoke):
    """probes[0] == nearest_centroid_udf bucket for every vector — the
    bit-identity sim_knn_graph_recall's shared pass rests on."""
    from iceberg_query_engine_spark.queries.similarity_suite import (
        KNN_IDX_PROBES,
        KNN_QUERY_PROBES,
        _probed_frame,
        _sqrt_assignment,
    )

    probed = _probed_frame(
        spark, sf_smoke, max(KNN_IDX_PROBES, KNN_QUERY_PROBES)
    )
    top1 = {r.vec_id: r.c for r in probed.select(
        "vec_id", F.col("probes")[0].alias("c")).collect()}
    assigned, _ = _sqrt_assignment(spark, sf_smoke)
    ref = {r.vec_id: r.cluster for r in assigned.select(
        "vec_id", "cluster").collect()}
    assert top1 == ref


def test_clusters_size_via_window_single_labels_pass(spark, sf_smoke):
    """cluster_size is attached with one label-keyed window, not a
    groupBy(label)+join-back: the materialized labels frame is consumed
    ONCE and no cluster-count-sized frame rides a second join (r10,
    guide §2.4 — measured 1.14x at sf0.1, plan pinned here)."""
    for fn in (
        similarity_suite.sim_knn_clusters_cheap,
        dedup_suite.dedup_clusters,
    ):
        plan = pi.formatted_plan(fn(spark, sf_smoke))
        assert plan.count(") Window") == 1, fn.__name__
        # the join-back shape put a size-attach join ABOVE the labels;
        # the window form has none (at sf0.1 the labels ExistingRDD
        # drops 4→2 and dedup_clusters loses 2 SortMergeJoins —
        # plans/r10/{sim_knn_clusters,dedup_clusters}_{before,after}.txt)
        for join_op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
            assert join_op not in plan, (fn.__name__, join_op)


def test_recall_single_probe_pass(spark, sf_smoke):
    """The recall gate's plan carries the probe kernel's materialized
    frame (ExistingRDD) and no second nearest-centroid Arrow pass."""
    df = similarity_suite.sim_knn_graph_recall(spark, sf_smoke)
    plan = pi.formatted_plan(df)
    # nearest_centroid_udf's struct output would appear as a second
    # distinct ArrowEvalPython producing `_a`; the shared pass leaves
    # only the per-cell kernels (FlatMapGroupsInPandas/CoGroup).
    assert "ArrowEvalPython" not in plan
