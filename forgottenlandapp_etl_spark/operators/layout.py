"""Data-layout operators: Z-order (Morton) clustering for scan pruning.

The 100 TB story: parquet/Delta data skipping works off per-file (and
per-row-group) min/max statistics. A table queried by TWO independent keys
can't be sorted to serve both — but interleaving the keys' bits (the
Z-order / Morton curve, the same layout `OPTIMIZE ZORDER BY` builds in
lakehouse engines) keeps BOTH keys' per-file ranges narrow, so either
predicate prunes most files. The curve math is pure integer bit
arithmetic — one Column expression, no UDF, no shuffle — and the cluster
assignment is `repartitionByRange` on the z-value at write time.

Everything here is exact integer math shared with the DuckDB oracle via
one term table (``morton_terms``), so the layout decision itself is
hash-verified cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits taken from each key (low bits; keys are masked first). 16+16 keeps
#: the interleaved value comfortably inside a signed 64-bit long.
MORTON_BITS = 16


def morton_terms(bits: int = MORTON_BITS) -> list[tuple[int, int, int]]:
    """The (source, src_bit, dst_bit) table both engines render from.

    source 0 = first key (even destination bits), source 1 = second key
    (odd destination bits).
    """
    out = []
    for i in range(bits):
        out.append((0, i, 2 * i))
        out.append((1, i, 2 * i + 1))
    return out


def zvalue(a: Column, b: Column, bits: int = MORTON_BITS) -> Column:
    """Morton-interleave the low ``bits`` of two non-negative longs."""
    terms = [
        F.shiftleft(
            F.shiftright([a, b][src].cast("long"), src_bit).bitwiseAND(F.lit(1)),
            dst_bit,
        )
        for src, src_bit, dst_bit in morton_terms(bits)
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zvalue_sql(a: str, b: str, bits: int = MORTON_BITS) -> str:
    """The IDENTICAL interleave as DuckDB SQL, from the same term table."""
    parts = [
        f"((({[a, b][src]} >> {src_bit}) & 1) << {dst_bit})"
        for src, src_bit, dst_bit in morton_terms(bits)
    ]
    return "(" + " + ".join(parts) + ")"


def zorder_bucket_stats(
    df: DataFrame, key_a: str, key_b: str, bucket_bits: int, bits: int = MORTON_BITS
) -> DataFrame:
    """Per-Z-bucket clustering statistics — the data-skipping proof.

    Both keys are first min/max-scaled into the full ``bits``-wide domain
    (one tiny global agg, broadcast back — the same rank-space mapping
    production Z-order does so keys of different magnitudes fill the curve
    evenly at ANY scale factor). Buckets are the top ``bucket_bits`` of
    the interleaved value (exactly the file boundaries
    ``repartitionByRange(z)`` + sorted write would produce for
    2^bucket_bits files). Emits each bucket's row count and BOTH keys'
    min/max — the ranges a reader's pruning would consult. One partial-agg
    shuffle on the bucket id; the z-value itself is a pure Column.
    """
    a, b = F.col(key_a), F.col(key_b)
    mm = df.agg(
        F.min(a).cast("long").alias("mna"),
        F.max(a).cast("long").alias("mxa"),
        F.min(b).cast("long").alias("mnb"),
        F.max(b).cast("long").alias("mxb"),
    )
    # exact integer min/max scaling: ((x - min) * (2^bits - 1)) div span —
    # `div`, never floor of a double ratio (bit-exactness discipline)
    sa = F.expr(
        f"(({key_a} - mna) * {(1 << bits) - 1}) div greatest(1, mxa - mna)"
    )
    sb = F.expr(
        f"(({key_b} - mnb) * {(1 << bits) - 1}) div greatest(1, mxb - mnb)"
    )
    z = zvalue(sa, sb, bits)
    bucket = F.shiftright(z, 2 * bits - bucket_bits)
    return (
        df.crossJoin(F.broadcast(mm))
        .select(
            bucket.alias("bucket"),
            F.col(key_a).alias("a"),
            F.col(key_b).alias("b"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("a").alias("min_a"),
            F.max("a").alias("max_a"),
            F.min("b").alias("min_b"),
            F.max("b").alias("max_b"),
        )
    )


def zorder_layout(
    df: DataFrame, key_a: str, key_b: str, n_files: int, bits: int = MORTON_BITS
) -> DataFrame:
    """The write-side layout: range-partition by z-value, sort within.

    Returns the DataFrame arranged so a parquet write yields ``n_files``
    files whose per-file min/max of BOTH keys are tight — no computation
    beyond the interleave, one range shuffle (sampled boundaries), the
    standard `OPTIMIZE ZORDER` execution shape.
    """
    z = zvalue(F.col(key_a), F.col(key_b), bits).alias("__z")
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
