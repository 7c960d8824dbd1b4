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

Representation: SPARSE — one row per 64-bit word with any bit set:
``(w, bits)`` plus constant meta columns, ≤ m_bits/64 rows (≤ 16 Ki
rows at the default 2^20 bits). Build is ONE map-side-combinable
``bit_or`` aggregate; merge is an outer join on ``w``; the
membership check is k broadcast-hash-joins of the probe word indices
against the word relation (a probe word with no row has no bits set
⇒ key definitely absent). Two earlier drafts were measured
quadratically worse and are kept out by construction: densifying the
words into one array row costs O(n_words²) in a single-row
``transform``+map-lookup, and shipping a dense array into the check
— by cross join (the array copied into EVERY probe row) or as a
16k-element literal (k×16k expression nodes, codegen blowup) — made
the check slower than the table scan it replaces. Sparse + broadcast
joins keeps both sides metadata-scale.

Spark exposes no SQL-level ``bloom_filter_agg``/``might_contain``
(they are internal runtime-filter expressions), hence this
from-parts build on the public API.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_DEFAULT_BITS = 1 << 20  # up to 16 Ki sparse words
BLOOM_K = 5  # probes per key; ~1% fpp near n = m/10


def _serialized_key(key_cols: list[str]) -> Column:
    """The (possibly NULL-bearing, multi-column) key as one string for
    hashing. concat_ws drops NULLs — two distinct keys that collapse
    to the same serialization merely collide in the filter, which
    costs a join, never correctness."""
    return F.concat_ws(
        "\u0001", *[F.col(c).cast("string") for c in key_cols]
    )


def _probe_positions(
    key_cols: list[str], m_bits: int, k: int
) -> list[Column]:
    """Bit position of each of the k probes — the SINGLE definition
    both the build and the check are compiled from."""
    key = _serialized_key(key_cols)
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(m_bits)) for i in range(k)
    ]


def _with_meta(words: DataFrame, m_bits: int, k: int, n_keys: int) -> DataFrame:
    return words.select(
        "w",
        "bits",
        F.lit(m_bits).cast("long").alias("m_bits"),
        F.lit(k).cast("long").alias("k"),
        F.lit(n_keys).cast("long").alias("n_keys"),
    )


def bloom_words(
    df: DataFrame, key_cols: list[str], m_bits: int = BLOOM_DEFAULT_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Sparse Bloom of ``df``'s keys: (w, bits, m_bits, k, n_keys),
    one row per set word, built by one map-side-combinable ``bit_or``
    aggregate over the k exploded probe positions."""
    pos = df.select(
        F.explode(F.array(*_probe_positions(key_cols, m_bits, k))).alias(
            "idx"
        )
    )
    words = pos.select(
        F.expr("idx div 64").alias("w"),
        F.expr("shiftleft(1L, CAST(idx % 64 AS INT))").alias("m"),
    ).groupBy("w").agg(F.expr("bit_or(m)").alias("bits"))
    # sentinel row (w=-1, bits=0): probe indices are pmod-non-negative
    # so it never matches a check join, and it guarantees the meta
    # columns survive an EMPTY key set — without it, a zero-key batch
    # bloom has no rows, bloom_meta falls back to the module defaults,
    # and merging it into a live (auto-grown or custom-sized) filter
    # raises the shape-mismatch guard
    sentinel = df.sparkSession.createDataFrame(
        [(-1, 0)], "w long, bits long"
    )
    return _with_meta(words.unionByName(sentinel), m_bits, k, df.count())


def bloom_meta(bloom: DataFrame) -> tuple[int, int, int]:
    """(m_bits, k, n_keys) — constant across rows (the sentinel row
    guarantees at least one); module defaults with n_keys = 0 only
    for a legacy/foreign relation with no rows at all."""
    row = bloom.select("m_bits", "k", "n_keys").first()
    if row is None:
        return BLOOM_DEFAULT_BITS, BLOOM_K, 0
    return int(row["m_bits"]), int(row["k"]), int(row["n_keys"])


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Word-wise OR of two same-shape sparse blooms (outer join on
    ``w``); n_keys adds (an upper bound — shared keys double-count,
    which only ever makes the saturation estimate conservative)."""
    am, ak, an = bloom_meta(a)
    bm, bk, bn = bloom_meta(b)
    if (am, ak) != (bm, bk):
        raise ValueError(
            f"cannot merge blooms of different shape: "
            f"(m_bits={am}, k={ak}) vs (m_bits={bm}, k={bk})"
        )
    merged = (
        a.select("w", F.col("bits").alias("_ab"))
        .join(
            b.select("w", F.col("bits").alias("_bb")), ["w"], "full_outer"
        )
        .select(
            "w",
            F.coalesce("_ab", F.lit(0))
            .bitwiseOR(F.coalesce("_bb", F.lit(0)))
            .alias("bits"),
        )
    )
    return _with_meta(merged, am, ak, an + bn)


def with_maybe_seen(
    df: DataFrame,
    key_cols: list[str],
    bloom: DataFrame,
    out_col: str = "maybe_seen",
) -> DataFrame:
    """``df`` plus a boolean ``out_col``: False = key PROVABLY absent
    from the bloom'd set; True = maybe present (exact check required).
    k broadcast-hash-joins of the probe word indices against the
    sparse word relation."""
    m_bits, k, _ = bloom_meta(bloom)
    # the word relation is ≤ m_bits/64 rows (~16 B each): hint the
    # broadcast only while that bound stays comfortably inside an
    # executor (≤ 2^28 bits ≈ 64 MB) — an auto-grown multi-billion-key
    # filter is bigger, and forcing its broadcast would OOM; past the
    # bound the joins fall to AQE's choice (shuffle join on the word
    # index, still key-bounded)
    def _side(rel):
        return F.broadcast(rel) if m_bits <= (1 << 28) else rel

    out = df
    cond = None
    for i, idx in enumerate(_probe_positions(key_cols, m_bits, k)):
        out = out.withColumn(f"__bw{i}", F.shiftright(idx, 6)).join(
            _side(
                bloom.select(
                    F.col("w").alias(f"__bw{i}"),
                    F.col("bits").alias(f"__bb{i}"),
                )
            ),
            [f"__bw{i}"],
            "left",
        )
        c = (
            F.getbit(F.coalesce(F.col(f"__bb{i}"), F.lit(0)), idx % 64)
            == F.lit(1)
        )
        cond = c if cond is None else (cond & c)
    return out.withColumn(out_col, cond).drop(
        *[f"__bw{i}" for i in range(k)], *[f"__bb{i}" for i in range(k)]
    )
