"""Vector math over ``array<float|double>`` embedding columns.

Built-in higher-order functions (zip_with / aggregate) keep the dot
product JVM-side — no Python serialization per row. At 100 TB the
brute-force path shuffles nothing (broadcast query side); the LSH
bucketed path in ``operators.similarity`` bounds the candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return vec.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
