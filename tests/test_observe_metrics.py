"""The bucket-cap drops are observable, not silent (r4 verdict #5).

Both capping paths — the pairwise PAIR_BUCKET_CAP guard and the LSH
band-bucket caps — surface `rows_dropped_by_cap` (pairwise path) /
`rows_star_capped` (LSH path, r9: over-cap buckets star-expand instead
of dropping) / `rows_total`
through Dataset.observe so an operator at corpus scale can route
over-cap sources to the LSH path instead of discovering the gap in
the output. Tests drive the REAL production expressions by threading
a pyspark Observation through the same helpers the queries call.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Observation

from iceberg_query_engine_spark.queries.dedup_suite import (
    PAIR_BUCKET_CAP,
    _cap_buckets,
    _lsh_candidate_pairs,
)


def test_pairwise_cap_metric_counts_dropped_rows(spark):
    # one hot key over the cap (all dropped), one small key (kept)
    hot = spark.range(PAIR_BUCKET_CAP + 10).select(F.lit("hot").alias("k"))
    cold = spark.range(3).select(F.lit("cold").alias("k"))
    obs = Observation("cap")
    out = _cap_buckets(hot.unionAll(cold), "k", observation=obs)
    assert out.count() == 3  # only the cold bucket survives
    m = obs.get
    assert m["rows_total"] == PAIR_BUCKET_CAP + 13
    assert m["rows_dropped_by_cap"] == PAIR_BUCKET_CAP + 10


def test_pairwise_cap_metric_zero_at_test_scale(spark, sf_oracle):
    # the driver corpus never trips the cap — metric must say so
    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    obs = Observation("cap0")
    out = _cap_buckets(docs.select("doc_id", "source"), "source", observation=obs)
    n = out.count()
    m = obs.get
    assert m["rows_dropped_by_cap"] == 0
    assert m["rows_total"] == n


def test_lsh_band_cap_metric(spark, sf_oracle):
    """cap=1 forces every multi-doc band bucket over the cap: those
    buckets STAR-expand (r9 — hub = min doc_id vs each member, O(bn)
    pairs instead of C(bn,2)) and the observe metric counts the
    star-capped band rows, while singletons (no pair to lose) stay
    uncounted."""
    import pyspark.sql.functions as SF

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet").limit(200)
    obs = Observation("lsh_cap")
    pairs = _lsh_candidate_pairs(docs, band_size=2, cap=1, observation=obs)
    rows = pairs.select(
        SF.col("a.doc_id").alias("a_id"), SF.col("b.doc_id").alias("b_id")
    ).collect()
    m = obs.get
    assert m["rows_total"] > 0
    assert 0 < m["rows_star_capped"] < m["rows_total"]
    # every over-cap bucket contributes only hub/sub-hub-anchored
    # pairs, so the pair count is bounded by 2x the star-capped row
    # count (O(bn), not C(bn,2)) and every pair is (hub < member)
    assert 0 < len(rows) <= 2 * m["rows_star_capped"]
    assert all(a < b for a, b in rows)
