"""Arrow-batched Python operators — the sanctioned escape hatch.

Everything else in this engine is JVM expressions (whole-stage codegen);
these are the two shapes Python is allowed to take when it genuinely has to
run (custom science code, C-extension libraries):

- ``applyInPandas`` (grouped map): whole group → one pandas DataFrame →
  user function → DataFrame out.  One shuffle on the group key, Arrow both
  directions, never row-at-a-time.
- ``pandas_udf`` (scalar vectorized): column chunks as pandas/numpy arrays
  inside an otherwise-JVM plan.

Both are parity-tested against pure-JVM twins (tests/test_pandas_ops.py) —
the JVM path stays the default; these exist so the escape hatch is proven,
not guessed, when a real workload needs numpy/scipy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def groupwise_zscore(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group z-score via applyInPandas: each group arrives as ONE pandas
    frame (mean/std with numpy), sorted by ``id_col`` inside the function so
    the float summation order — and thus the result — is reproducible across
    partitionings.  ddof=1 (sample std, matches stddev_samp).

    Groups must fit in executor memory — that is the applyInPandas contract;
    for unbounded groups use the JVM window twin (mean/stddev over
    Window.partitionBy), which is also the parity oracle in tests.
    """
    out_schema = T.StructType(
        [
            T.StructField(group_col, T.StringType()),
            T.StructField(id_col, T.LongType()),
            T.StructField(value_col, T.DoubleType()),
            T.StructField("zscore", T.DoubleType()),
        ]
    )

    def z(pdf):
        import numpy as np

        pdf = pdf.sort_values(id_col)
        v = pdf[value_col].to_numpy(dtype="float64")
        mu = float(np.mean(v))
        sd = float(np.std(v, ddof=1)) if len(v) > 1 else 0.0
        pdf = pdf.copy()
        pdf["zscore"] = np.round((v - mu) / sd, 6) if sd > 0 else 0.0
        return pdf[[group_col, id_col, value_col, "zscore"]]

    return df.select(group_col, id_col, value_col).groupBy(group_col).applyInPandas(
        z, schema=out_schema
    )


def cosine_pandas_udf():
    """Scalar vectorized pandas_udf computing cosine(vec, vec) over Arrow
    batches with numpy — the Python twin of ``similarity.cosine`` (JVM
    zip_with/aggregate).  Returns a Column-producing callable."""

    @F.pandas_udf(T.DoubleType())
    def _cos(a, b):
        import numpy as np
        import pandas as pd

        def one(x, y):
            xa = np.asarray(x, dtype="float64")
            ya = np.asarray(y, dtype="float64")
            na, nb = np.sqrt(xa @ xa), np.sqrt(ya @ ya)
            if na == 0.0 or nb == 0.0:
                return None
            return round(float(xa @ ya / (na * nb)), 6)

        return pd.Series([one(x, y) for x, y in zip(a, b)])

    return _cos
