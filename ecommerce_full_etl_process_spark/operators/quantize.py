"""Embedding quantization for large-scale vector corpora (beyond-reference,
BASELINE.json north star: the storage/bandwidth lever for 100 TB embedding
tables — int8 cuts an ANN index's footprint 4× and is the standard first
step before IVF/PQ serving).

Symmetric per-vector int8 quantization: ``scale = max(|v|)/127``,
``q_i = round(v_i / scale)`` ∈ [-127, 127], reconstruction ``q_i * scale``.
Everything is row-local higher-order-function math over the array column —
a pure map stage, no shuffle, no UDF, which is exactly the shape that
scales to any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: guards zero vectors: scale keeps a tiny floor so q = round(0/eps) = 0
SCALE_FLOOR = 1e-12


def quantize_int8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Per-vector int8 quantization with quality accounting.

    Returns (id, dim, scale, rmse, max_q): the quantization scale, the
    root-mean-square reconstruction error, and the largest |quantized|
    level (≤ 127 by construction — asserted by tests, and a cheap corpus
    health check in production). Floats are widened to double BEFORE any
    arithmetic so the math is engine-portable; outputs are rounded to 6
    decimals for cross-engine hash stability.
    """
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.greatest(maxabs, F.lit(SCALE_FLOOR)) / F.lit(127.0)
    sq_err = F.aggregate(
        F.transform(
            v, lambda x: F.pow(x - F.round(x / scale, 0) * scale, F.lit(2.0))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    max_q = F.array_max(
        F.transform(v, lambda x: F.abs(F.round(x / scale, 0)).cast("int"))
    )
    return df.select(
        F.col(id_col),
        F.size(v).alias("dim"),
        F.round(scale, 6).alias("scale"),
        F.round(F.sqrt(sq_err / F.size(v)), 6).alias("rmse"),
        max_q.alias("max_q"),
    )
