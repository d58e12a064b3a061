"""Sorts, ranks, top-K (SURVEY.md §2.6).

The reference assigns rank by list position after an O(n²) ``indexOf``
(etl.dart:253, :347, :623). Here rank is ``row_number`` over a window —
**row_number, not rank**: ties get distinct sequential positions, matching
list-position semantics. Every window spec carries a deterministic
tiebreaker so results are stable across runs/engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def add_rank(
    df: DataFrame,
    order_by: list[Column],
    rank_name: str = "rank",
    partition_by: list[Column] | None = None,
) -> DataFrame:
    """W4 — rank assignment (etl.dart:249-255, :344-349, :620-624).

    A global window (no partition) is a single-reducer sort — fine for
    ranking-table sizes (≤ O(100k) rows). For 100 TB-scale ranking, pass
    ``partition_by`` (e.g. per world / per day) so the sort distributes.
    """
    w = Window.partitionBy(*(partition_by or [])).orderBy(*order_by)
    return df.withColumn(rank_name, F.row_number().over(w))


def add_missing_rank(
    df: DataFrame, order_by: list[Column], rank_name: str = "rank"
) -> DataFrame:
    """W4 guarded variant (etl.dart:249-255) — the guard is LIST-level, not
    per-row: if the first entry (in sort order) already carries a rank, the
    whole snapshot is returned untouched; otherwise EVERY row gets its
    list-position rank (overwriting any stragglers), exactly mirroring the
    reference's early-return-then-assign-all loop. One window pass: the
    first entry's rank is a first_value over the full frame.
    """
    w = Window.orderBy(*order_by)
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return df.withColumn(
        rank_name,
        F.when(
            F.first(F.col(rank_name)).over(wfull).isNotNull(), F.col(rank_name)
        ).otherwise(F.row_number().over(w)),
    )


def top_k(df: DataFrame, order_by: list[Column], k: int) -> DataFrame:
    """W6/S4 — top-K (etl.dart page caps :501, :544; cutoff :83).

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject: each partition
    keeps its local top-k heap, the driver merges — no full sort, no full
    shuffle. This is the scale-correct replacement for the reference's
    "scan 20 pages of a server-sorted stream".
    """
    return df.orderBy(*order_by).limit(k)


def multikey_sort(df: DataFrame, *cols: Column) -> DataFrame:
    """W1–W3 — global sort (etl.dart:88, :330, :339-342).

    Range-partitioned sort (sampled boundaries) — distributes at any scale.
    Note the engine treats output order as presentation-only; operators
    never depend on physical row order.
    """
    return df.orderBy(*cols)


# EWMA fixed-point smoothing factor: alpha = EWMA_NUM / EWMA_DEN. Shared
# with the generated DuckDB oracle (recursive-CTE fold over the identical
# recurrence) — one source of truth, same discipline as graph.PR_SCALE.
EWMA_NUM = 1
EWMA_DEN = 4


def ewma_int(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    x_col: str,
    out_col: str = "ewma_fp",
) -> DataFrame:
    """Per-key exponentially weighted moving average as an ORDERED INTEGER
    FOLD: v_1 = x_1, v_t = (EWMA_NUM·x_t + (EWMA_DEN−EWMA_NUM)·v_{t−1})
    div EWMA_DEN, returning (key, rn, x, ewma_fp) for every input row.

    Why a fold and not a window expression: the floor division INSIDE each
    step makes the recurrence non-linear, so there is no closed-form
    window/`aggregate()` expression — this is the honest shape of any
    stateful per-key smoother (EWMA, Kalman-style filters, token-bucket
    accounting). It runs as a repartition-on-key + sortWithinPartitions +
    mapInPandas fold over contiguous key runs (carrying state across Arrow
    batch splits), with a NumPy int64 loop inside — per-key work is
    inherently sequential (the recurrence), but keys parallelize
    perfectly, which is the same distribution story as any keyed stateful
    operator at 100 TB. No driver-side anything.

    Exactness: x must be non-negative (callers pin with greatest(x, 0)) so
    NumPy/Python floor division equals the oracle's BIGINT `//`
    truncation; integer state never touches IEEE floats, so the fold is
    bit-identical across engines and arrival orders (the sort inside the
    group is by `order_cols`, which callers make a total order).
    """
    cols = [key_col, *order_cols, x_col]
    mul = EWMA_DEN - EWMA_NUM
    # one hash shuffle on the key + a partition-local sort, then ONE Arrow
    # pass folding contiguous key runs — not applyInPandas per key, whose
    # per-group Arrow round trip costs ~2 ms/key (measured 2.8 s for 1.5k
    # keys at sf0.1; this shape is ~3×+ cheaper and result-identical).
    # Arrow may split a partition into several batches mid-key
    # (maxRecordsPerBatch), so the fold carries (key, rn, v) across
    # batches inside the iterator.
    src = (
        df.select(*cols)
        .repartition(F.col(key_col))
        .sortWithinPartitions(key_col, *order_cols)
    )

    def fold_runs(batches):
        import numpy as np
        import pandas as pd

        prev_key = None
        prev_rn = 0
        prev_v = 0
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            keys = pdf[key_col].to_numpy()
            x = pdf[x_col].to_numpy()
            rn = np.empty(n, dtype=np.int64)
            v = np.empty(n, dtype=np.int64)
            for i in range(n):
                if keys[i] != prev_key:
                    prev_key = keys[i]
                    prev_rn = 1
                    prev_v = x[i]
                else:
                    prev_rn += 1
                    prev_v = (EWMA_NUM * x[i] + mul * prev_v) // EWMA_DEN
                rn[i] = prev_rn
                v[i] = prev_v
            yield pd.DataFrame(
                {key_col: keys, "rn": rn, x_col: x, out_col: v}
            )

    schema = f"{key_col} long, rn long, {x_col} long, {out_col} long"
    return src.mapInPandas(fold_runs, schema=schema)
