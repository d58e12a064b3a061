"""Sort-clustered parquet writes — data skipping via min/max statistics
(SURVEY.md §4.3 family, beside bucketing.py).

Bucketing co-locates JOIN keys; clustering orders SCAN keys. A 100 TB fact
table queried by key range (user, day, document id) should be written
range-clustered: rows globally range-partitioned on the cluster key, sorted
within each partition, and capped per file. Every parquet file and row
group then covers a narrow, pairwise-disjoint key interval, so a pushed
predicate (``PushedFilters`` in the scan) skips whole row groups — the
engine-agnostic poor-man's index that makes a key-range query read
megabytes instead of the full table.

Single-dimension clustering only: lexicographic multi-column sort gives the
leading column perfect disjointness and later columns almost none (the
Z-order / Hilbert-curve trade — a real table format's OPTIMIZE ZORDER; out
of scope here, the leading-key form covers the reference's access patterns,
which are all eq/range on one key).

``cluster_stats`` reads ONLY parquet footers (no data pages) to audit the
layout — the same metadata the reader's row-group skipping consults.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clustered_write(
    df: DataFrame,
    path: str,
    cluster_col: str,
    target_rows_per_file: int = 1_000_000,
    n_ranges: int | None = None,
) -> None:
    """Write ``df`` range-clustered on ``cluster_col``.

    ``repartitionByRange`` samples the key distribution and assigns each
    task a contiguous key interval (skew-resistant: heavy keys get their
    own ranges), ``sortWithinPartitions`` orders rows inside it so row
    groups subdivide the interval, and ``maxRecordsPerFile`` bounds file
    size by rows, not task count. ``n_ranges`` overrides the partition
    count (default: session shuffle partitions) — size it so a range
    ~= a few files at ``target_rows_per_file``.
    """
    if n_ranges is not None:
        df = df.repartitionByRange(n_ranges, F.col(cluster_col))
    else:
        df = df.repartitionByRange(F.col(cluster_col))
    (
        df.sortWithinPartitions(cluster_col)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
        .parquet(path)
    )


def cluster_stats(path: str, col: str) -> list[tuple[str, object, object]]:
    """Per-file (file, min, max) of ``col`` from parquet FOOTERS only —
    the metadata row-group skipping consults. Sorted by min."""
    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, name))
        idx = md.schema.to_arrow_schema().get_field_index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((name, lo, hi))
    return sorted(out, key=lambda t: (t[1] is None, t[1]))


# ---------------------------------------------------------------------------
# Z-order clustering: two-dimensional data skipping
# ---------------------------------------------------------------------------

#: bits per dimension in the interleave — 16 gives 65536 distinct cells
#: per axis, far below float precision loss and well above file count
Z_BITS = 16


def zvalue(a: str, b: str, a_min: int, a_max: int, b_min: int, b_max: int):
    """Morton/Z-order key for two integer columns (by NAME): min-max
    normalize each dimension to Z_BITS bits with exact integer `div`,
    then interleave the bits (a takes the odd positions). Pure integer
    Column arithmetic — 2*Z_BITS shift-and-add terms, all inside
    whole-stage codegen.

    The lexicographic sort clustered_write uses gives the LEADING column
    perfect file disjointness and the second column none; sorting by the
    interleaved key makes every file cover a small axis-aligned RECTANGLE
    in (a, b) space, so pushed predicates on EITHER column skip row
    groups — the poor-man's OPTIMIZE ZORDER for engines without a table
    format. Bounds arrive as Python ints (one footer/agg read at the
    caller), so the normalization constant-folds."""
    scale = (1 << Z_BITS) - 1

    def norm(name, lo, hi):
        if hi <= lo:
            return F.lit(0).cast("long")
        # divide-first binning: (v - lo) div step with step precomputed in
        # Python keeps every intermediate <= the column's own range — the
        # multiply-first form ((v-lo)*scale div range) overflows BIGINT
        # once the range passes 2^47
        step = (hi - lo) // scale + 1
        return F.expr(f"(CAST({name} AS BIGINT) - {lo}) div {step}")

    na, nb = norm(a, a_min, a_max), norm(b, b_min, b_max)
    z = F.lit(0).cast("long")
    for i in range(Z_BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(na, i) % 2, 2 * i + 1)
            + F.shiftleft(F.shiftright(nb, i) % 2, 2 * i)
        )
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    target_rows_per_file: int = 1_000_000,
    n_ranges: int | None = None,
) -> None:
    """clustered_write on the interleaved Z-key of (col_a, col_b): one
    tiny bounds aggregate (4 scalars to the driver — metadata-sized, the
    same class as the compaction partition listing), then range-partition
    + sort on the computed __z column, dropped before writing rows."""
    lo_a, hi_a, lo_b, hi_b = (
        df.agg(
            F.min(col_a).cast("long"),
            F.max(col_a).cast("long"),
            F.min(col_b).cast("long"),
            F.max(col_b).cast("long"),
        ).first()
    )
    if lo_a is None or lo_b is None:
        # empty input (or all-NULL keys): the bounds row is NULLs and there
        # is nothing to cluster — write the frame as-is so the sink still
        # materializes a valid (empty) dataset instead of a TypeError
        df.write.mode("overwrite").option(
            "maxRecordsPerFile", target_rows_per_file
        ).parquet(path)
        return
    z = zvalue(col_a, col_b, lo_a, hi_a, lo_b, hi_b)
    zdf = df.withColumn("__z", z)
    if n_ranges is not None:
        zdf = zdf.repartitionByRange(n_ranges, F.col("__z"))
    else:
        zdf = zdf.repartitionByRange(F.col("__z"))
    (
        zdf.sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
        .parquet(path)
    )
