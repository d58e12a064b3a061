"""Deterministic ~N× scale tier above an existing testdata dir (r6 verdict
item 2: measure, don't extrapolate, the scaling curve).

Replicates every table N times with DISJOINT key ranges (copy i shifts each
surrogate key by i·(max_key+1)), preserving the base tier's value
distributions exactly while growing data volume linearly — the same
scale-up model TPC-H itself uses (more keys, same shapes). Two transforms
keep the scale-up honest for the content tiers:

- documents.text gets a per-copy LETTER-ROTATION cipher (one
  F.translate): within-copy duplicate/shingle structure is preserved
  byte-for-byte (copy 0 is the identity), but cross-copy n-grams all
  differ, so dedup/LSH entries don't see an artificial 10-way duplicate
  of every document (which would inflate band-bucket pair counts
  quadratically in the copy count and poison the measured exponent).
  Text LENGTH, whitespace layout, and token boundaries are untouched.
- embeddings.embedding gets a per-copy DIMENSION PERMUTATION (copy 0
  identity): norms and component marginals are preserved exactly, but
  cross-copy cosine similarity drops to random-vector levels, so
  near-dup and LSH tiers see 10× more vectors, not 10 clones of each.

region/nation stay fixed (dimensions). Timestamps/dates are unchanged:
time-bucketed groups keep their count and grow 10× in size — the
natural model for "same workload, more traffic".

Determinism: every transform is a pure function of (row, copy index) —
no RNG at generation time (permutations/ciphers are seeded module
constants), so two runs produce identical CONTENT (file split may
differ; the pytest compares order-insensitive table hashes).

Usage: python tools/gen_scale_tier.py [BASE_DIR] [OUT_DIR] [COPIES]
Defaults: /root/testdata/sf0.1 -> /root/repo/.scaledata/sf1 x10
"""
from __future__ import annotations

import random
import string
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EMB_DIM = 64
_ALPHA = string.ascii_lowercase + string.ascii_uppercase + string.digits


def _rot(s: str, i: int) -> str:
    return s[i % len(s):] + s[: i % len(s)]


def cipher_alphabet(copy: int) -> tuple[str, str]:
    """Per-copy substitution: rotate each character class independently.
    Copy 0 is the identity, so the base tier is a literal subset."""
    lo = _rot(string.ascii_lowercase, copy)
    up = _rot(string.ascii_uppercase, copy)
    dg = _rot(string.digits, copy)
    return _ALPHA, lo + up + dg


def dim_permutation(copy: int) -> list[int]:
    """Per-copy dimension permutation (copy 0 identity), seeded constant."""
    perm = list(range(EMB_DIM))
    if copy:
        random.Random(1000 + copy).shuffle(perm)
    return perm


def _max_key(spark, path: str, col: str) -> int:
    v = spark.read.parquet(path).agg(F.max(col)).first()[0]
    return int(v) if v is not None else 0


def _replicate(df: DataFrame, copies: int) -> DataFrame:
    """Explode each row into `copies` rows tagged __c = 0..copies-1."""
    return df.withColumn(
        "__c", F.explode(F.array(*[F.lit(i) for i in range(copies)]))
    )


def _shift(col: str, stride: int):
    return (F.col(col) + F.col("__c").cast("long") * F.lit(stride)).alias(col)


def generate(base: str, out: str, copies: int = 10) -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("gen-scale-tier")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    strides = {
        "customer": _max_key(spark, f"{base}/customer.parquet", "c_custkey") + 1,
        "orders": _max_key(spark, f"{base}/orders.parquet", "o_orderkey") + 1,
        "part": _max_key(spark, f"{base}/part.parquet", "p_partkey") + 1,
        "supplier": _max_key(spark, f"{base}/supplier.parquet", "s_suppkey") + 1,
        "events": _max_key(spark, f"{base}/events.parquet", "event_id") + 1,
        "users": _max_key(spark, f"{base}/events.parquet", "user_id") + 1,
        "documents": _max_key(spark, f"{base}/documents.parquet", "doc_id") + 1,
        "embeddings": _max_key(spark, f"{base}/embeddings.parquet", "vec_id") + 1,
    }

    def w(df: DataFrame, name: str, parts: int) -> None:
        other = [c for c in df.columns if c != "__c"]
        (
            df.select(*other)
            .repartition(parts)
            .write.mode("overwrite")
            .parquet(f"{out}/{name}.parquet")
        )

    # fixed dimensions: copy through untouched
    for t in ("region", "nation"):
        spark.read.parquet(f"{base}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")

    c = _replicate(spark.read.parquet(f"{base}/customer.parquet"), copies)
    w(
        c.select(
            _shift("c_custkey", strides["customer"]),
            "c_name", "c_nationkey", "c_acctbal", "c_mktsegment", "__c",
        ),
        "customer", 4,
    )

    s = _replicate(spark.read.parquet(f"{base}/supplier.parquet"), copies)
    w(
        s.select(
            _shift("s_suppkey", strides["supplier"]),
            "s_name", "s_nationkey", "s_acctbal", "__c",
        ),
        "supplier", 2,
    )

    p = _replicate(spark.read.parquet(f"{base}/part.parquet"), copies)
    w(
        p.select(
            _shift("p_partkey", strides["part"]),
            "p_name", "p_brand", "p_type", "p_size", "p_retailprice", "__c",
        ),
        "part", 4,
    )

    o = _replicate(spark.read.parquet(f"{base}/orders.parquet"), copies)
    w(
        o.select(
            _shift("o_orderkey", strides["orders"]),
            _shift("o_custkey", strides["customer"]),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
            "__c",
        ),
        "orders", 8,
    )

    li = _replicate(spark.read.parquet(f"{base}/lineitem.parquet"), copies)
    w(
        li.select(
            _shift("l_orderkey", strides["orders"]),
            _shift("l_partkey", strides["part"]),
            _shift("l_suppkey", strides["supplier"]),
            "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
            "l_tax", "l_returnflag", "l_linestatus", "l_shipdate", "__c",
        ),
        "lineitem", 16,
    )

    ev = _replicate(spark.read.parquet(f"{base}/events.parquet"), copies)
    w(
        ev.select(
            _shift("event_id", strides["events"]),
            "ts",
            _shift("user_id", strides["users"]),
            "event_type", "value", "props", "__c",
        ),
        "events", 8,
    )

    d = _replicate(spark.read.parquet(f"{base}/documents.parquet"), copies)
    # flat per-copy cipher lookup (same depth-constant rationale as the
    # embeddings permutation below; alphabets are alnum-only, quote-safe)
    dsts_sql = "array(" + ", ".join(
        f"'{cipher_alphabet(i)[1]}'" for i in range(copies)
    ) + ")"
    text = F.expr(f"translate(text, '{_ALPHA}', element_at({dsts_sql}, __c + 1))")
    w(
        d.select(
            _shift("doc_id", strides["documents"]),
            text.alias("text"),
            "lang", "source", "n_chars", "__c",
        ),
        "documents", 8,
    )

    e = _replicate(spark.read.parquet(f"{base}/embeddings.parquet"), copies)
    # one literal copies×EMB_DIM permutation table + a transform() lookup:
    # the earlier per-copy nested-when chain was O(copies) expression DEPTH
    # and blew whole-stage codegen at the 100-copy (second-decade) tier;
    # this form is depth-constant and produces identical content (the 10x
    # tier's pytest-pinned table hashes are unchanged)
    perms_sql = "array(" + ", ".join(
        "array(" + ", ".join(str(p) for p in dim_permutation(i)) + ")"
        for i in range(copies)
    ) + ")"
    vec = F.expr(
        f"transform(element_at({perms_sql}, __c + 1),"
        " i -> element_at(embedding, i + 1))"
    )
    w(
        e.select(
            _shift("vec_id", strides["embeddings"]),
            vec.alias("embedding"),
            "label", "__c",
        ),
        "embeddings", 8,
    )
    print(f"wrote {copies}x tier of {base} to {out}")


if __name__ == "__main__":
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scaledata/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    generate(base, out, n)
