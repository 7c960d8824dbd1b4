"""Cross-engine/cross-path agreement of the Rabin-Karp rolling hash:
the interpreted column expression, the unrolled fixed-length
expression, the Arrow-batched Python fold, and the DuckDB oracle form
must all produce the identical value — including non-ASCII codepoints
and the empty string."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from near_real_time_data_warehouse_prototype_for_metro_shopping_store_in_pakistan_spark.functions.text import (
    ROLL_BASE,
    ROLL_MOD,
    rolling_hash,
    rolling_hash_fixed,
)

rng = random.Random(42)
ALPHABETS = [
    "abcdefghij XYZ.,!?",
    "äöüßéèêç ñ",
    "中文测试漢字",
    "αβγδε абвгд",
]
STRINGS = [""] + [
    "".join(rng.choice(a) for _ in range(rng.randint(1, 40)))
    for a in ALPHABETS
    for _ in range(8)
]


def _py(s: str) -> int:
    acc = 0
    for c in s:
        acc = (acc * ROLL_BASE + ord(c)) % ROLL_MOD
    return acc


def _duck(s: str) -> int:
    r = duckdb.sql(
        f"""SELECT coalesce(list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(generate_series(1, length(s)),
                           i -> CAST(unicode(s[i]) AS BIGINT))),
            (acc, c) -> (acc * {ROLL_BASE} + c) % {ROLL_MOD}), 0)
            FROM (SELECT ? AS s)""",
        params=[s],
    ).fetchone()
    return r[0]


def test_rolling_hash_cross_engine(spark):
    df = spark.createDataFrame([(s,) for s in STRINGS], "s string")
    got = {r.s: r.h for r in df.select("s", rolling_hash(F.col("s")).alias("h")).collect()}
    for s in STRINGS:
        expected = _py(s)
        assert got[s] == expected, f"spark expr != python for {s!r}"
        assert _duck(s) == expected, f"duckdb != python for {s!r}"


def test_rolling_hash_fixed_matches_general(spark):
    fixed_len = 5
    samples = [s for s in STRINGS if len(s) >= fixed_len]
    df = spark.createDataFrame(
        [(s[:fixed_len],) for s in samples], "s string"
    )
    rows = df.select(
        "s",
        rolling_hash(F.col("s")).alias("general"),
        rolling_hash_fixed(F.col("s"), fixed_len).alias("fixed"),
    ).collect()
    assert rows
    for r in rows:
        assert r.general == r.fixed == _py(r.s)
