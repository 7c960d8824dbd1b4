"""Greedy sequence packing: assemble documents into fixed-capacity
token bins ("packs") for training-batch construction.

Packing is inherently sequential — each pack's contents depend on
every earlier decision — so the scalable form shards the corpus first
(deterministic hash sharding) and packs each shard independently:
sequential WITHIN a shard, embarrassingly parallel ACROSS shards. The
per-shard loop runs as an Arrow-batched ``applyInPandas`` (one pass,
no Python-per-row overhead beyond the numpy loop); everything before
it is JVM column expressions.

Determinism: shard = md5(doc_id)-keyed, pack order = doc_id order, so
the plan is a pure function of the data — an interrupted 100 TB run
re-packs identically, and a DuckDB recursive CTE replays the exact
same greedy walk for the oracle gate.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_long, token_count

# Each shard owns a million-pack id range: pack_id = shard * 1e6 + the
# shard-local pack index. A shard exceeding a million packs needs a
# wider stride, asserted in the loop rather than silently wrapped.
PACKS_PER_SHARD_STRIDE = 1_000_000

def _pack_schema(docs, id_col: str) -> str:
    """Output schema with the id field TYPED FROM THE INPUT (string
    chunk keys pack as well as long doc ids — same id-generality fix
    as ngram_decontaminate)."""
    id_type = docs.schema[id_col].dataType.simpleString()
    return (
        f"doc_id {id_type}, shard int, pack_id long, "
        "n_tokens int, pack_pos int"
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_count_col: str | None = None,
    token_mode: str = "ws",
) -> DataFrame:
    """Assign every doc to a (shard, pack) so that each pack's token
    total stays <= ``capacity`` wherever possible.

    Greedy first-fit in doc-id order within each hash shard: a doc
    that no longer fits the open pack closes it and starts the next
    one. A single doc larger than ``capacity`` becomes its own
    (overflowing) pack — packing never splits or drops documents;
    truncation is a separate, explicit pipeline stage if wanted.

    ``token_count_col`` names a precomputed per-doc token count column
    on ``docs`` — the hook for TOKENIZER-denominated packing (e.g.
    ``operators.bpe.bpe_token_counts``'s ``n_bpe_tokens``, joined on
    by the caller), since whitespace counts mis-size natural-text
    packs by 1.3-2× against the BPE units a training run actually
    consumes. Default stays the whitespace count.

    Returns (doc_id, shard, pack_id, n_tokens, pack_pos) where
    ``pack_pos`` is the doc's 0-based position inside its pack.
    """
    n_tok = (
        F.col(token_count_col)
        if token_count_col is not None
        else token_count(F.col(text_col), token_mode)
    )
    sized = docs.select(
        F.col(id_col).alias("doc_id"),
        (
            md5_long(F.concat(F.col(id_col).cast("string"), F.lit("|pack")))
            % n_shards
        )
        .cast("int")
        .alias("shard"),
        n_tok.cast("int").alias("n_tokens"),
    )

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        shard = int(pdf["shard"].iloc[0])
        packs, positions = [], []
        fill, pack_idx = capacity + 1, -1  # sentinel: first doc opens pack 0
        for t in pdf["n_tokens"].to_numpy():
            t = int(t)
            if fill + t > capacity:
                pack_idx += 1
                fill = t
            else:
                fill += t
            packs.append(pack_idx)
            positions.append(0)
        assert pack_idx < PACKS_PER_SHARD_STRIDE, "pack id stride overflow"
        out = pdf.assign(
            pack_id=[shard * PACKS_PER_SHARD_STRIDE + p for p in packs]
        )
        out["pack_pos"] = out.groupby("pack_id").cumcount()
        return out[["doc_id", "shard", "pack_id", "n_tokens", "pack_pos"]]

    return sized.groupBy("shard").applyInPandas(
        pack_shard, _pack_schema(docs, id_col)
    )
