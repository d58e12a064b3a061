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
