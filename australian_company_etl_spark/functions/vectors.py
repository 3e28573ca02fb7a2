"""Vector math — JVM expression path + Arrow/Pandas vectorized path.

The JVM path (`cosine_expr`) folds with `zip_with`/`aggregate`: exact,
deterministic summation order (matches the DuckDB oracle), but Spark runs
higher-order lambdas interpreted — fine at 64 dims, linear cost in width.

The Pandas-UDF path (`cosine_pandas_udf`) ships both columns through Arrow
and does one numpy matmul per batch — the wide-vector (≥ 512-dim) choice:
per-batch O(rows·dim) SIMD instead of per-element interpreted eval. Its
float summation order differs (numpy pairwise), so use it where a 1e-12
tolerance is acceptable — ranking, thresholding — not where bit-exact
oracle parity is required.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def cosine_expr(a: Column, b: Column) -> Column:
    """JVM cosine: deterministic sequential fold (oracle-parity path)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


@pandas_udf(DoubleType())
def cosine_pandas_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine: one numpy matmul per batch (wide-vector path)."""
    ma = np.stack(a.to_numpy())
    mb = np.stack(b.to_numpy())
    dots = np.einsum("ij,ij->i", ma, mb)
    norms = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    return pd.Series(dots / norms)


@pandas_udf(DoubleType())
def dot_pandas_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    ma = np.stack(a.to_numpy())
    mb = np.stack(b.to_numpy())
    return pd.Series(np.einsum("ij,ij->i", ma, mb))
