"""Sequence packing: bin tokenized documents (or chunks) into
fixed-token-budget training sequences.

The padding-minimization step of every LLM training-data pipeline: a
trainer consumes fixed-length sequences (e.g. 2048 tokens), and feeding
it one short document per sequence wastes the budget on padding.
Packing assigns documents to "packs" so each pack's token total stays
within the budget and the average fill is high.

Distributed shape — the standard scale design, not a driver loop:

1. Shard documents by ``pmod(xxhash64(id), num_shards)`` — one shuffle,
   uniform shard sizes regardless of key clustering. Packing quality is
   per-shard, which is what production pipelines accept: bin packing is
   inherently sequential, so you parallelize across shards and pack
   greedily within each (the cross-shard quality loss is O(1 pack per
   shard) — negligible at any real shard count).
2. Pack each shard with BEST-FIT DECREASING inside ``applyInPandas``:
   docs sorted by (tokens desc, id), each placed into the open pack
   with the smallest sufficient remaining capacity (bisect on a sorted
   remainders list — O(n log n) per shard), else a new pack. BFD's
   fill guarantee matches FFD's 11/9·OPT + 6/9 bound and is
   deterministic given the sort, so pack ids are stable across runs
   and partitionings.
3. Pack ids are ``shard * 2^32 + local_index`` — globally unique
   without any cross-shard coordination.

Memory: one shard's (id, tokens) pairs must fit in one task — size
``num_shards`` so |docs| / num_shards stays in the low millions; the
text itself never moves, only the id→pack assignment comes back (join
the assignment to the corpus to materialize packed text downstream).

Oversize docs (tokens > budget) cannot be packed; ``on_oversize``
chooses ``"raise"`` (default — the upstream contract is that
``chunk_documents`` already bounded chunk sizes) or ``"isolate"``
(each oversize doc gets its own pack, the truncate-at-train-time
convention).
"""

from __future__ import annotations

from bisect import bisect_left, insort

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SHARD_STRIDE = 1 << 32


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    num_shards: int = 64,
    on_oversize: str = "raise",
) -> DataFrame:
    """Assign each row to a pack so that per-pack ``tokens_col`` sums
    never exceed ``budget``. Returns ``(id_col, tokens_col, pack_id)``
    with deterministic, globally-unique pack ids."""
    if on_oversize not in ("raise", "isolate"):
        raise ValueError(f"on_oversize must be raise|isolate, got {on_oversize!r}")
    budget = int(budget)
    id_field = df.schema[id_col]
    tok_field = df.schema[tokens_col]
    out_schema = (
        f"{id_col} {id_field.dataType.simpleString()}, "
        f"{tokens_col} {tok_field.dataType.simpleString()}, "
        "pack_id long"
    )
    oversize_raise = on_oversize == "raise"

    def _pack_shard(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        pdf = pdf.sort_values(
            [tokens_col, id_col], ascending=[False, True], kind="mergesort"
        )
        toks = pdf[tokens_col].to_list()
        if toks and toks[0] > budget:
            if oversize_raise:
                raise ValueError(
                    f"document with {toks[0]} tokens exceeds pack budget "
                    f"{budget}; chunk upstream or pass on_oversize='isolate'"
                )
        # Sorted list of (remaining_capacity, pack_local_id): best fit =
        # smallest remaining >= t. Ties on remaining break toward the
        # OLDEST pack (insort keeps insertion order stable only within
        # equal keys if we include pack id in the key — include it so
        # the choice is total-ordered and deterministic).
        remainders: list[tuple[int, int]] = []
        next_pack = 0
        assign = []
        for t in toks:
            if t > budget:  # on_oversize == "isolate"
                assign.append(next_pack)
                next_pack += 1
                continue
            i = bisect_left(remainders, (t, -1))
            if i < len(remainders):
                rem, pid = remainders.pop(i)
                assign.append(pid)
                if rem - t > 0:
                    insort(remainders, (rem - t, pid))
            else:
                assign.append(next_pack)
                if budget - t > 0:
                    insort(remainders, (budget - t, next_pack))
                next_pack += 1
        out = pdf[[id_col, tokens_col]].copy()
        out["pack_id"] = [shard * _SHARD_STRIDE + p for p in assign]
        return out

    shard = F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards)).alias("_shard")
    return (
        df.select(id_col, tokens_col, shard)
        .groupBy("_shard")
        .applyInPandas(_pack_shard, schema=out_schema)
    )


def pack_stats(packed: DataFrame, budget: int, tokens_col: str = "n_tokens") -> DataFrame:
    """Per-pack summary: doc count, token total, fill ratio — the
    packing-quality report (one hash-agg on pack_id)."""
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tokens_col).alias("tokens"),
        F.round(F.sum(tokens_col) / F.lit(float(budget)), 4).alias("fill"),
    )
