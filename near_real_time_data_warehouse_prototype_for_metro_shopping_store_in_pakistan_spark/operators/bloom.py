"""Seen-key Bloom filter as pure Spark column expressions.

Purpose: let the insert-if-absent sinks (operators/sinks.py) prove
most incoming keys NOVEL without touching the accumulated table. The
anti-join sink's per-batch cost is dominated by reading the existing
table's keys (partition-pruned, but still a data scan); a Bloom over
every admitted key answers "definitely not seen" from a metadata-scale
bit table, so only the "maybe seen" residue — replayed rows plus the
false-positive rate — pays for the scan+join. On an append-mostly
100 TB stream that turns the seen-side scan from per-batch into
per-replayed-row.

Exactness is preserved by construction: a Bloom has no false
negatives, so every key it clears is genuinely absent, and every key
it flags still goes through the exact anti-join. A saturated filter
(n_keys far beyond ``m_bits``) degrades to flagging everything — the
sink then behaves exactly like the plain anti-join backend, never
incorrectly.

Representation: ONE row of ``m_bits/64`` longs (``words
array<long>``), e.g. 128 KiB at the default 2^20 bits — metadata
scale, stored as a single-row parquet next to the table and
broadcast into the membership check. Both build and check are JVM
column expressions end to end (seeded ``xxhash64`` probes,
``bit_or`` aggregation, ``element_at`` + shift tests): no Python in
the row path, no shuffle beyond one ``m/64``-key aggregate.

Spark exposes no SQL-level ``bloom_filter_agg``/``might_contain``
(they are internal runtime-filter expressions), hence this
from-parts build on the public API.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_DEFAULT_BITS = 1 << 20  # 16 Ki words = 128 KiB
BLOOM_K = 5  # probes per key; ~1% fpp near n = m/10


def _key_sql(key_cols: list[str]) -> str:
    """Serialize the (possibly NULL-bearing, multi-column) key to one
    string for hashing. concat_ws drops NULLs — two distinct keys that
    collapse to the same serialization merely collide in the filter,
    which costs a join, never correctness."""
    casts = ", ".join(f"cast({c} as string)" for c in key_cols)
    return f"concat_ws('\\u0001', {casts})"


def _probe_sql(key_sql: str, seed: int, m_bits: int) -> str:
    """Bit position of probe ``seed`` for the serialized key — the
    SINGLE definition both the build and the check compile against."""
    return f"pmod(xxhash64({seed}, {key_sql}), {m_bits})"


def bloom_words(
    df: DataFrame, key_cols: list[str], m_bits: int = BLOOM_DEFAULT_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """ONE dense single-row (words array<long>, m_bits, k, n_keys)
    Bloom of ``df``'s keys. Explode to k bit positions per row, OR
    per word (map-side combinable, ≤ m/64 distinct keys), then
    densify in a final 1-row aggregate."""
    key = _key_sql(key_cols)
    pos = df.select(
        F.explode(
            F.array(*[F.expr(_probe_sql(key, i, m_bits)) for i in range(k)])
        ).alias("idx")
    )
    words = pos.select(
        F.expr("idx div 64").alias("w"),
        F.expr("shiftleft(1L, CAST(idx % 64 AS INT))").alias("m"),
    ).groupBy("w").agg(F.expr("bit_or(m)").alias("bits"))
    n_words = m_bits // 64
    n_keys = df.select(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    dense = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("w"), F.col("bits")))
        ).alias("mp")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("mp"), i.cast("long")), F.lit(0).cast("long")
            ),
        ).alias("words")
    )
    return dense.crossJoin(F.broadcast(n_keys)).select(
        "words",
        F.lit(m_bits).cast("long").alias("m_bits"),
        F.lit(k).cast("long").alias("k"),
        F.col("n").cast("long").alias("n_keys"),
    )


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Element-wise OR of two same-shape blooms; n_keys adds (an upper
    bound — shared keys double-count, which only ever makes the
    saturation estimate conservative)."""
    av = a.select(
        F.col("words").alias("_aw"), "m_bits", "k",
        F.col("n_keys").alias("_an"),
    )
    bv = b.select(
        F.col("words").alias("_bw"), F.col("n_keys").alias("_bn")
    )
    return av.crossJoin(F.broadcast(bv)).select(
        F.zip_with("_aw", "_bw", lambda x, y: x.bitwiseOR(y)).alias("words"),
        "m_bits",
        "k",
        (F.col("_an") + F.col("_bn")).alias("n_keys"),
    )


def with_maybe_seen(
    df: DataFrame,
    key_cols: list[str],
    bloom: DataFrame,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """``df`` plus a boolean ``out_col``: False = key PROVABLY absent
    from the bloom'd set; True = maybe present (exact check required).
    The bloom rides in as a broadcast single-row cross join; all k
    probes are JVM expressions against its words array."""
    row = bloom.select(
        F.col("words").alias("__bw"),
        F.col("m_bits").alias("__bm"),
        F.col("k").alias("__bk"),
    )
    m_bits, k = bloom.select("m_bits", "k").first()
    key = _key_sql(key_cols)
    checks = " AND ".join(
        f"((element_at(__bw, CAST({_probe_sql(key, i, m_bits)} div 64 AS INT)"
        f" + 1) & shiftleft(1L, CAST({_probe_sql(key, i, m_bits)} % 64"
        f" AS INT))) != 0)"
        for i in range(int(k))
    )
    return (
        df.crossJoin(F.broadcast(row))
        .withColumn(out_col, F.expr(checks))
        .drop("__bw", "__bm", "__bk")
    )
