"""Sequence packing for training-data preparation.

Two tiers, matching the dedup family's baseline/scale-path split:

- ``pipeline_pack_sequences`` (plans/extension_queries.py) is the
  concat-then-chunk assignment — pure windowed arithmetic, SQL-expressible,
  oracle-verified. Documents may be SPLIT across chunk boundaries.
- :func:`ffd_pack` here is the no-split variant: first-fit-decreasing bin
  packing per shard, for pipelines that must keep each document contiguous
  (e.g. packing with attention-mask resets). FFD is inherently imperative —
  a loop carrying open-bin state — so it runs as a grouped-map
  ``applyInPandas``: one Arrow batch per shard, NumPy/pandas inside, no
  row-at-a-time Python. Shards pack independently, so at 100 TB the
  parallelism is the shard count and no state crosses executors.

The assignment is deterministic (sort by length desc, doc_id asc; first
fitting bin wins), so reruns and retries produce identical packings —
verified by property tests (every doc packed exactly once, no bin over
capacity, bin count within the FFD guarantee of optimal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = "doc_id long, shard long, n_toks long, bin_id long, oversize int"


def ffd_pack(
    docs: DataFrame,
    capacity: int = 512,
    n_shards: int = 32,
    id_col: str = "doc_id",
    tokens_col: str = "n_toks",
) -> DataFrame:
    """First-fit-decreasing packing of (id, token-count) rows into bins of
    ``capacity`` tokens, sharded by ``id % n_shards``.

    Documents longer than ``capacity`` get a dedicated bin and
    ``oversize=1`` (the caller decides whether to truncate or reject).
    Bin ids are dense per shard, assigned in first-opened order.
    """
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [tokens_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        bin_space: list[int] = []  # remaining capacity per open bin
        bin_ids = []
        oversize = []
        for n in pdf[tokens_col]:
            n = int(n)
            if n > capacity:
                bin_space.append(0)
                bin_ids.append(len(bin_space) - 1)
                oversize.append(1)
                continue
            for b, space in enumerate(bin_space):
                if space >= n:
                    bin_space[b] = space - n
                    bin_ids.append(b)
                    break
            else:
                bin_space.append(capacity - n)
                bin_ids.append(len(bin_space) - 1)
            oversize.append(0)
        out = pdf[[id_col, "shard", tokens_col]].copy()
        out["bin_id"] = pd.Series(bin_ids, dtype="int64")
        out["oversize"] = pd.Series(oversize, dtype="int32")
        return out

    with_shard = docs.select(
        F.col(id_col).cast("long").alias(id_col),
        (F.col(id_col) % n_shards).cast("long").alias("shard"),
        F.col(tokens_col).cast("long").alias(tokens_col),
    )
    return with_shard.groupBy("shard").applyInPandas(pack, schema=PACK_SCHEMA)
