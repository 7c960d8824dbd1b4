"""Skew mitigation for shuffled equi-joins: key salting.

AQE's skew-join splitting (enabled in ``session.get_spark``) handles
most runtime skew transparently; explicit salting remains the tool
when one join key dominates so heavily that even split partitions
bottleneck (the classic power-law key in a 100 TB fact⋈fact join), or
when AQE is unavailable (streaming micro-batch plans).

Mechanics: the skewed (large) side gets a uniform random-ish salt in
[0, factor) appended to its key; the small-but-not-broadcastable side
is replicated ``factor`` times, once per salt value. The join key
becomes (key, salt) — each original hot partition fans out to
``factor`` shuffle partitions. Salt here is derived deterministically
from a row fingerprint (md5 of all columns) rather than ``rand()`` so
repeated runs produce identical partitioning — determinism policy of
this repo (tests, oracle replays).

Cost model: replication multiplies the small side's shuffle volume by
``factor``; choose factor ≈ (hot-key rows / target partition rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long


def with_salt(df: DataFrame, num_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, num_salts) from a full-row fingerprint."""
    fingerprint = md5_long(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns])
    )
    return df.withColumn(salt_col, (fingerprint % num_salts).cast("int"))


def replicate(df: DataFrame, num_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Cross the dataframe with the salt domain (explode, not a join)."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``on`` with the hot side salted
    and the other side replicated. Result equals ``skewed.join(other,
    on, how)`` for inner/left joins (each skewed row meets each match
    exactly once — its own salt value)."""
    assert how in ("inner", "left"), "salting preserves inner/left semantics"
    s = with_salt(skewed, num_salts)
    r = replicate(other, num_salts)
    out = s.join(r, on + ["_salt"], how)
    return out.drop("_salt")
