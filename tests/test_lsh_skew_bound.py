"""LSH banding under pathological skew: over-cap buckets STAR-expand —
bounded task work AND the boilerplate family is caught (r8 verdict,
Next round #5 + the r9 mitigation; companion of
data/exp_dedup_skew_r9.py which measures the same at 200k docs).

A boilerplate family — identical token SET, rotated order, so every
member lands in the SAME band buckets but is not an exact dup — is the
adversarial real-crawl case: with full expansion one bucket of f docs
is f(f-1)/2 verified pairs in ONE task. The contract under test:

  1. over-cap buckets produce exactly hub-star pairs: O(bn) per
     bucket, never C(bn,2) — the family expands linearly,
  2. the star expansion is NOT silent — the observe metric reports the
     star-capped band rows,
  3. the family IS caught: every member pairs with the hub at J=1.0,
     so dedup_clusters-style consumers collapse it to one component
     (previously the bucket was dropped and all f docs sailed through),
  4. docs outside over-cap buckets are unaffected.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

from iceberg_query_engine_spark.queries.dedup_suite import (
    CLUSTER_BAND_SIZE,
    CLUSTER_CAP,
    N_HASHES,
    _lsh_candidate_pairs,
)

N_FAMILY = 400  # one boilerplate family, 16x the cap
N_NORMAL = 200
N_BANDS = N_HASHES // CLUSTER_BAND_SIZE


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


def test_star_bounds_family_and_reports(spark, skew_docs):
    obs = Observation("skew_cap_test")
    pairs = _lsh_candidate_pairs(
        skew_docs, CLUSTER_BAND_SIZE, CLUSTER_CAP, observation=obs
    )
    fam = (
        pairs.filter(
            (F.col("a.doc_id") < N_FAMILY) & (F.col("b.doc_id") < N_FAMILY)
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
        .collect()
    )
    m = obs.get
    # identical token set -> identical signature -> the family fills the
    # same N_BANDS buckets, all 16x over the cap: every family band row
    # is star-capped and visible
    assert m["rows_star_capped"] >= N_FAMILY * N_BANDS
    # linear, not quadratic: exactly hub->member pairs, hub = min id (0)
    assert len(fam) == N_FAMILY - 1
    assert all(a == 0 and 0 < b < N_FAMILY for a, b in fam)
    # J(member, hub) = 1.0 (same token set): all pairs verify -> the
    # family collapses into one cluster downstream instead of escaping


def test_docs_outside_overcap_buckets_unaffected(spark, skew_docs):
    """Candidates among normal docs are identical with and without the
    family present — the star cap is local to the hot buckets."""
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
