"""Vectorized embedding math: Arrow-batched numpy kernels.

Spark's higher-order functions (zip_with/aggregate) evaluate lambdas
interpreted, per element — fine for small arrays, ~100µs per 64-dim
cosine. For similarity search over millions of pairs that's the
bottleneck, so the hot path is a pandas UDF: Arrow hands the batch to
numpy, the dot products run as one BLAS-backed matmul-like operation
(~100× faster), exactly the "vectorized Pandas UDF" escape hatch the
reference's COSINE_SIMILARITY surface maps to at scale
(/root/reference/src/planner/logical_expr.rs:327-328).

Numerical note: numpy reduces with pairwise summation while the
interpreted fold is sequential; results agree to ~1e-14 relative,
so oracle comparisons round cosines to 6 decimals (already the suite
convention).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def cosine_similarity(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batched cosine similarity between two array<numeric> columns."""
    ma = np.vstack([np.asarray(x, dtype=np.float64) for x in a])
    mb = np.vstack([np.asarray(x, dtype=np.float64) for x in b])
    dots = np.einsum("ij,ij->i", ma, mb)
    na = np.sqrt(np.einsum("ij,ij->i", ma, ma))
    nb = np.sqrt(np.einsum("ij,ij->i", mb, mb))
    return pd.Series(dots / (na * nb))


@pandas_udf("double")
def dot_product(a: pd.Series, b: pd.Series) -> pd.Series:
    ma = np.vstack([np.asarray(x, dtype=np.float64) for x in a])
    mb = np.vstack([np.asarray(x, dtype=np.float64) for x in b])
    return pd.Series(np.einsum("ij,ij->i", ma, mb))


@pandas_udf("double")
def l2_norm(a: pd.Series) -> pd.Series:
    ma = np.vstack([np.asarray(x, dtype=np.float64) for x in a])
    return pd.Series(np.sqrt(np.einsum("ij,ij->i", ma, ma)))


def nearest_centroid_udf(centroid_vecs: np.ndarray, centroid_ids: np.ndarray):
    """Factory: pandas UDF mapping a vector column to its nearest
    centroid `struct<bucket bigint, c_cos double>` (argmax rounded
    cosine, tie → lowest centroid id).

    The K×dim centroid matrix is captured in the UDF closure (collected
    once — K centroids are a few KB at any corpus size), so assignment
    is ONE Arrow pass over the corpus: each vector crosses the channel
    once and meets all K centroids inside one vectorized numpy kernel.
    The previous shape — broadcast-join the centroid table then a
    pairwise cosine UDF — pushed n×K (vector, centroid) pairs through
    Arrow: ~160 GB of duplicated vectors at 5M docs × K=32, measured
    221 s vs ~20 s for this kernel at the same scale (r5 sf100 sweep).

    Determinism: the dot/norm sums accumulate dimension-by-dimension in
    strict left-to-right order — bit-identical to a sequential fold
    (DuckDB's `list_aggregate(.., 'sum')`, Spark's `F.aggregate`) and
    independent of Arrow batch size. A BLAS matmul is NOT: its blocked
    summation order varies with the batch's row count, which moved
    borderline cosines across the round(·,6) boundary and flipped
    downstream aggregates between runs (caught by the sim_kmeans
    oracle). The per-dimension loop is 64 vectorized (n×K) FMAs — same
    asymptotics as the matmul, no channel duplication.

    Tie semantics match the DuckDB oracle: rows are rounded to 6
    decimals first; np.argmax returns the FIRST maximum and the
    centroid matrix is ordered by ascending id → lowest id wins ties.
    """
    c = np.ascontiguousarray(centroid_vecs, dtype=np.float64)
    ids = np.asarray(centroid_ids, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    c, ids = c[order], ids[order]
    k, dim = c.shape
    cn2 = np.zeros(k)
    for i in range(dim):  # sequential fold, same order as the oracle
        cn2 += c[:, i] * c[:, i]
    cn = np.sqrt(cn2)

    @pandas_udf("struct<bucket: bigint, c_cos: double>")
    def nearest(v: pd.Series) -> pd.DataFrame:
        m = np.vstack([np.asarray(x, dtype=np.float64) for x in v])
        n = m.shape[0]
        dots = np.zeros((n, k))
        vn2 = np.zeros(n)
        for i in range(dim):  # strict left-to-right accumulation
            col = m[:, i]
            dots += col[:, None] * c[None, :, i]
            vn2 += col * col
        cos = np.round(dots / (np.sqrt(vn2)[:, None] * cn[None, :]), 6)
        idx = np.argmax(cos, axis=1)  # first max = lowest id on ties
        return pd.DataFrame(
            {"bucket": ids[idx], "c_cos": cos[np.arange(len(idx)), idx]}
        )

    return nearest
