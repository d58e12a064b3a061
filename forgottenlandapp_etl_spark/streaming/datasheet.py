"""Streaming maintenance of the per-source corpus datasheet
(operators/curation.corpus_datasheet) — continuous corpus monitoring.

The production shape: documents land continuously; the release card
(volume, corpus-wide duplication attribution, language mix) must stay
current without nightly recomputation. Two MERGEABLE state relations are
maintained as parquet delta appends per micro-batch:

- ``(fp, source) → (n, ntok, nchar)`` — md5-fingerprint partial sums.
  Everything the card needs from documents is additive over this
  relation, INCLUDING retroactive duplication: a doc counted unique
  flips to duplicate the moment its twin lands in a later batch, because
  dup attribution is derived at READ time (Σ n per source over fps whose
  corpus-wide total ≥ 2), never frozen at arrival time.
- ``(source, lang) → n`` — the language mix.

Exactly-once discipline — the batchId-keyed idempotent append (the
canonical foreachBatch recipe, complementing the repo's other two
patterns: dynamic-partition-overwrite upsert in streaming/online.py and
min-idempotent appends in streaming/dedup.py): every delta row carries
its ``batch_id``; foreachBatch is at-least-once, so a replayed batch
appends byte-identical rows again, and the read side collapses replays
with a group-by over ``(batch_id, keys)`` taking MAX of each measure —
identical duplicates merge, then batches SUM. Proven by a test that
writes the same batch twice and asserts the card is unchanged, and by
the oracle: the drained card hash-equals the BATCH datasheet SQL, so
incremental maintenance ≡ full recomputation at any micro-batch
granularity.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: document-stream schema (matches the documents test table)
DOC_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def write_deltas(
    batch: DataFrame, batch_id: int, fp_dir: str, lang_dir: str
) -> None:
    """Append one micro-batch's two delta relations, batchId-keyed.

    Each delta is pre-aggregated (one row per key per batch), so a
    replayed batch appends byte-identical rows — exactly what the
    read-time ``(batch_id, keys)`` MAX-collapse absorbs.
    """
    toks = F.size(
        F.filter(F.split(F.col("text"), " "), lambda x: F.length(x) > 0)
    )
    base = batch.select(
        F.lit(batch_id).alias("batch_id"),
        F.col("source"),
        F.col("lang"),
        F.md5(F.col("text")).alias("fp"),
        F.length("text").alias("nchar"),
        toks.alias("ntok"),
    )
    d1 = base.groupBy("batch_id", "fp", "source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ntok").alias("ntok"),
        F.sum("nchar").alias("nchar"),
    )
    d2 = base.groupBy("batch_id", "source", "lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    d1.write.mode("append").parquet(fp_dir)
    d2.write.mode("append").parquet(lang_dir)


def datasheet_from_deltas(
    spark: SparkSession, fp_dir: str, lang_dir: str
) -> DataFrame:
    """Assemble the card from the accumulated deltas.

    Replay collapse first (MAX per (batch_id, keys) — identical replayed
    rows merge), then SUM across batches; dup attribution is derived
    from the corpus-wide fp totals at read time, so late-arriving twins
    retroactively flip their earlier copies to duplicates. Output
    columns match operators/curation.corpus_datasheet exactly.
    """
    d1 = (
        spark.read.parquet(fp_dir)
        .groupBy("batch_id", "fp", "source")
        .agg(
            F.max("n").alias("n"),
            F.max("ntok").alias("ntok"),
            F.max("nchar").alias("nchar"),
        )
        .groupBy("fp", "source")
        .agg(
            F.sum("n").alias("n"),
            F.sum("ntok").alias("ntok"),
            F.sum("nchar").alias("nchar"),
        )
    )
    totals = d1.groupBy("fp").agg(F.sum("n").alias("total"))
    per = (
        d1.join(totals, "fp")
        .groupBy("source")
        .agg(
            F.sum("n").cast("long").alias("n_docs"),
            F.sum("ntok").cast("long").alias("n_tokens"),
            F.sum("nchar").cast("long").alias("n_chars"),
            F.sum(F.when(F.col("total") >= 2, F.col("n")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_dup_docs"),
        )
    )
    d2 = (
        spark.read.parquet(lang_dir)
        .groupBy("batch_id", "source", "lang")
        .agg(F.max("n").alias("n"))
        .groupBy("source", "lang")
        .agg(F.sum("n").alias("lcnt"))
    )
    # NULL lang is NOT a language (countDistinct semantics, matching the
    # batch card and the DuckDB oracle's COUNT(DISTINCT lang)): the
    # NULL-lang delta group counts toward nothing in the mix — n_langs
    # counts only non-NULL groups and the top_lang rank excludes NULLs
    # (ranking a NULL group would also hit the Spark-NULLS-FIRST vs
    # DuckDB-NULLS-LAST ASC divergence). LEFT join keeps an all-NULL
    # source's volume row (top_lang NULL, share 0).
    langs = d2.groupBy("source").agg(
        F.count(F.when(F.col("lang").isNotNull(), F.lit(1)))
        .cast("long")
        .alias("n_langs")
    )
    w = Window.partitionBy("source").orderBy(F.col("lcnt").desc(), F.col("lang"))
    top = (
        d2.where(F.col("lang").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "source",
            F.col("lang").alias("top_lang"),
            F.col("lcnt").alias("top_lang_docs"),
        )
    )
    return (
        per.join(F.broadcast(langs), "source")
        .join(F.broadcast(top), "source", "left")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_chars",
            "n_dup_docs",
            F.expr("(n_dup_docs * 1000000) div n_docs").alias("dup_rate_fp"),
            "n_langs",
            "top_lang",
            F.expr(
                "(coalesce(top_lang_docs, 0) * 1000000) div n_docs"
            ).alias("top_lang_share_fp"),
        )
    )


def stream_corpus_datasheet(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> DataFrame:
    """Maintain the corpus card over a document stream and drain it.

    Documents are staged as ``n_files`` doc_id-ordered range files with
    ascending mtimes (deterministic micro-batch order, same mechanics as
    streaming/dedup) and drained with maxFilesPerTrigger=1; each batch
    appends its batchId-keyed deltas; the returned card is assembled
    from the accumulated state and hash-equals the batch datasheet — the
    result is invariant to the batch slicing because every path through
    the deltas is a sum of per-doc contributions plus a read-time dup
    derivation.
    """
    from .ts import input_bytes, sized_state_partitions, stage_ordered_ranges

    path = os.path.join(sf_dir, "documents.parquet")
    src = tempfile.mkdtemp(prefix="stream_docs_")
    fp_dir = tempfile.mkdtemp(prefix="card_fp_")
    lang_dir = tempfile.mkdtemp(prefix="card_lang_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    _PARTS_CONF = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(_PARTS_CONF, None)
    try:
        # distributed range-split staging (no driver materialization)
        stage_ordered_ranges(spark, path, src, n_files)

        spark.conf.set(
            _PARTS_CONF, str(sized_state_partitions(spark, input_bytes(path)))
        )
        stream = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda b, bid: None
                if b.isEmpty()
                else write_deltas(b, bid, fp_dir, lang_dir)
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return datasheet_from_deltas(spark, fp_dir, lang_dir).localCheckpoint(
            eager=True
        )
    finally:
        if prev_parts is None:
            spark.conf.unset(_PARTS_CONF)
        else:
            spark.conf.set(_PARTS_CONF, prev_parts)
        for d in (src, fp_dir, lang_dir, ckpt):
            shutil.rmtree(d, ignore_errors=True)
