"""r9 experiment: LSH/banding under pathological near-dup skew.

r8 verdict, Next round #5: every dedup scale point so far used
generator corpora with benign duplicate distribution; a real crawl has
boilerplate families (one template × 10^5-10^6 near-identical pages).
This builds a 200k-doc corpus where ONE family (identical token SET,
rotated token order → not exact dups, Jaccard 1.0) holds 10% of all
docs — so each of its LSH band buckets holds ~20k docs (vs the cap of
25) — plus a uniform control corpus of the same size/shape.

Measures, writing exp_dedup_skew_r9.json:
  * dedup_minhash_lsh / dedup_clusters / dedup_pipeline walls on the
    skewed corpus vs the uniform control — bounded means the skew run
    stays within noise of the control (the per-bucket cap kills the
    quadratic in-bucket expansion; without it the family alone is
    2·10^8 verified pairs in ONE task).
  * the cap's observe metric (band rows excluded) — the drop is
    visible to an operator, not silent.
  * the recall consequence, honestly: family near-dups found by the
    capped LSH path (expected 0 — the family's buckets all exceed the
    cap) and family statuses in the pipeline ledger. This is the cost
    of the cap that a star-expansion mitigation would recover.

Usage: python data/exp_dedup_skew_r9.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_query_engine_spark.session import get_spark

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "exp_dedup_skew_r9.json")
GEN_ROOT = os.path.join(HERE, "gen")
N_DOCS = 200_000
FAMILY_MOD = 10  # doc_id % 10 == 3 -> boilerplate family (10%)
DOC_TOKS = 60


def _gen(spark, path: str, with_family: bool) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    base = spark.range(N_DOCS).select(F.col("id").alias("doc_id"))
    # normal doc: 60 pseudo-random vocab words keyed on (doc_id, pos)
    normal = F.transform(
        F.sequence(F.lit(1), F.lit(DOC_TOKS)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("doc_id") * 1000 + i), F.lit(50_000)),
        ),
    )
    # boilerplate: ONE fixed token set, rotated by doc_id AND prefixed
    # with three doc_id-keyed DUPLICATE tokens (base-60 digits), so the
    # token SET — hence the minhash signature and every band key — is
    # identical across the family while each TEXT is unique (60^3
    # combos for 20k docs): the exact stage catches nothing and the
    # LSH path is the only one that could
    boiler_base = F.transform(
        F.sequence(F.lit(1), F.lit(DOC_TOKS)),
        lambda i: F.concat(F.lit("boiler"), i),
    )
    rot = (F.col("doc_id") % DOC_TOKS).cast("int") + 1
    d1 = ((F.col("doc_id") / DOC_TOKS).cast("long") % DOC_TOKS).cast("int") + 1
    d2 = (
        (F.col("doc_id") / (DOC_TOKS * DOC_TOKS)).cast("long") % DOC_TOKS
    ).cast("int") + 1
    boiler = F.concat(
        F.array(
            F.element_at(boiler_base, d1), F.element_at(boiler_base, d2)
        ),
        F.slice(boiler_base, rot, F.lit(DOC_TOKS)),
        F.slice(boiler_base, F.lit(1), rot - 1),
    )
    is_fam = F.lit(with_family) & (F.col("doc_id") % FAMILY_MOD == 3)
    toks = F.when(is_fam, boiler).otherwise(normal)
    source = (
        F.when(F.col("doc_id") % 50 == 17, F.lit("src0"))  # 2% eval split
        .when(is_fam, F.lit("src5"))
        .otherwise(
            F.concat(
                F.lit("src"), (F.pmod(F.xxhash64("doc_id"), F.lit(8)) + 1)
            )
        )
    )
    df = base.select(
        "doc_id",
        source.alias("source"),
        F.array_join(toks, " ").alias("text"),
    )
    df.repartition(16).write.mode("overwrite").parquet(path)


def main() -> None:
    spark = get_spark(app_name="exp_dedup_skew_r9")
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from iceberg_query_engine_spark.queries import dedup_suite as ds
    from iceberg_query_engine_spark.queries.tpch import tables

    skew_dir = os.path.join(GEN_ROOT, "skew")
    ctrl_dir = os.path.join(GEN_ROOT, "skew_ctrl")
    _gen(spark, os.path.join(skew_dir, "documents.parquet"), with_family=True)
    _gen(spark, os.path.join(ctrl_dir, "documents.parquet"), with_family=False)

    out: dict = {
        "metric": "lsh_banding_skew_stress",
        "corpus": {
            "n_docs": N_DOCS,
            "family_docs": N_DOCS // FAMILY_MOD,
            "family_shape": "identical token set, rotated order + doc-keyed "
            "duplicate-token prefix (J=1.0, every text unique)",
        },
        "runs": {},
    }

    for tag, d in (("skew", skew_dir), ("control", ctrl_dir)):
        runs: dict = {}
        for opname in ("dedup_minhash_lsh", "dedup_clusters", "dedup_pipeline"):
            t0 = time.time()
            df = getattr(ds, opname)(spark, d)
            n = df.count()
            runs[opname] = {"secs": round(time.time() - t0, 2), "rows": n}
            print(tag, opname, runs[opname], flush=True)
            spark.catalog.clearCache()
        out["runs"][tag] = runs

    # cap visibility + post-cap bucket bound on the skewed corpus
    (documents,) = tables(spark, skew_dir, "documents")
    obs = Observation("skew_cap")
    pairs = ds._lsh_candidate_pairs(
        documents, ds.CLUSTER_BAND_SIZE, ds.CLUSTER_CAP, observation=obs
    )
    n_cand = pairs.count()
    out["cap_metrics"] = {k: int(v) for k, v in obs.get.items()}
    out["cap_metrics"]["candidate_pairs"] = n_cand
    # structural bound: after the cap no bucket exceeds CLUSTER_CAP, so
    # no task's in-bucket expansion exceeds cap^2 pairs
    bands = ds._band_rows(documents, ds.CLUSTER_BAND_SIZE)
    sizes = bands.groupBy("band").agg(F.count(F.lit(1)).alias("bn"))
    out["bucket_stats"] = {
        "max_bucket": sizes.agg(F.max("bn")).collect()[0][0],
        "buckets_over_cap": sizes.filter(
            F.col("bn") > ds.CLUSTER_CAP
        ).count(),
    }

    # the honest recall consequence: family near-dups found by the
    # capped path, and family ledger statuses
    fam = F.col("doc_id") % FAMILY_MOD == 3
    led = ds.dedup_pipeline(spark, skew_dir)
    fam_status = {
        r.status: r.n
        for r in led.filter(fam)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    out["family_pipeline_statuses"] = fam_status
    print(json.dumps(out, indent=1))
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
