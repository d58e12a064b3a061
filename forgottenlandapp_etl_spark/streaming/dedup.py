"""Streaming deduplication (SURVEY.md §2.9 extension): the continuous-
ingestion form of the batch dedup tiers in operators/dedup.py.

The shape a 100 TB training-data pipeline actually runs: documents/events
land continuously; exact duplicates must be dropped ON ARRIVAL (before the
expensive downstream stages), not in a nightly batch pass. Structured
Streaming's ``dropDuplicatesWithinWatermark`` keeps one state entry per key
and — unlike plain ``dropDuplicates`` — EVICTS state once the watermark
passes a key's event time, so state is bounded by the key-arrival rate ×
watermark horizon instead of growing with corpus lifetime.

Output determinism: only the KEY columns are emitted (never the arbitrary
surviving row), so the result set equals the batch ``SELECT DISTINCT`` and
is oracle-comparable even though which physical row survives a race is not.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .ts import staged_events_stream


def _drain_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """availableNow drain through the memory sink → standalone DataFrame.

    Same lifecycle discipline as online.stream_events_daily_counts: the
    memory-sink table and checkpoint dir are released after materializing,
    so repeated invocations (gate, bench) don't accumulate session state.
    """
    spark = stream_df.sparkSession
    qname = f"{name}_{uuid.uuid4().hex[:8]}"
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    try:
        q = (
            stream_df.writeStream.outputMode("append")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # JVM-side materialization: localCheckpoint pins the memory-sink
        # rows into block storage so the DataFrame outlives the temp view
        # WITHOUT a driver→Python→JVM row round trip (the old
        # collect+createDataFrame cost ~1-2 s on a 100k-row drain)
        out = spark.table(qname).localCheckpoint(eager=True)
    finally:
        spark.catalog.dropTempView(qname)
        shutil.rmtree(ckpt, ignore_errors=True)
    return out


def stream_dedup_event_keys(
    spark: SparkSession, sf_dir: str, watermark: str = "1 day"
) -> DataFrame:
    """Streaming key-dedup over the events stream: first sighting of each
    (day, user_id, event_type) key is emitted, repeats within the watermark
    horizon are dropped, and state for days older than the watermark is
    evicted as event time advances.

    This is ingestion-time dedup (at-least-once delivery → effectively-once
    downstream): the streaming equivalent of batch ``SELECT DISTINCT``,
    which is exactly what the oracle checks. Emitting keys only keeps the
    output deterministic under arrival races.
    """
    with staged_events_stream(spark, sf_dir) as stream:
        keyed = (
            stream.withWatermark("ets", watermark)
            .select(
                F.to_date("ets").cast("string").alias("day"),
                "user_id",
                "event_type",
                "ets",
            )
            .dropDuplicatesWithinWatermark(["day", "user_id", "event_type"])
            .select("day", "user_id", "event_type")
        )
        return _drain_to_memory(keyed, "stream_dedup")


def stream_distinct_user_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming per-day distinct-user estimation via the integer-HLL
    registers (operators/sketches.py) — the sketch answer to Spark's
    hard restriction that streaming aggregations cannot contain
    COUNT(DISTINCT), and the bounded-state alternative to
    dropDuplicatesWithinWatermark when only the COUNT is needed:

    - stream_dedup_keys holds one state row PER DISTINCT KEY inside the
      watermark horizon (the price of emitting the keys themselves);
    - this holds exactly m register rows per open day window — constant
      per window regardless of arrival rate, because rho-max is an
      ordinary partial-aggregatable MAX the streaming agg state machine
      already knows how to fold incrementally.

    The drained (day, bucket, rho) registers are the SAME relation the
    batch build produces (streaming fold order cannot matter — max is
    commutative), so the post-drain estimate hash-matches the batch
    oracle; the ALL row is MAX-merged from the daily registers without
    touching the events again."""
    from ..operators import sketches
    from ..operators.dedup import token_hash
    from .online import drain_events_stream

    def transform(stream: DataFrame) -> DataFrame:
        h = token_hash(F.col("user_id").cast("string"))
        return (
            # explicit null-event-time drop (r7 adversarial-corpus rule)
            stream.where(F.col("ets").isNotNull())
            .withWatermark("ets", "1 day")
            .groupBy(
                F.window("ets", "1 day").alias("w"),
                sketches.hll_bucket(h).alias("bucket"),
            )
            .agg(F.max(sketches.hll_rho(h)).alias("rho"))
            .select(
                F.to_date(F.col("w.start")).cast("string").alias("day"),
                "bucket",
                "rho",
            )
        )

    regs = drain_events_stream(spark, sf_dir, transform, "stream_distinct_hll")
    merged = sketches.merge_hll_registers(
        regs.select(F.lit("ALL").alias("day"), "bucket", "rho"), ["day"]
    )
    return sketches.hll_estimate(regs, ["day"]).unionAll(
        sketches.hll_estimate(merged, ["day"])
    )


def stream_neardup_minhash(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> DataFrame:
    """Streaming NEAR-dup detection: an incrementally-maintained MinHash-LSH
    band index, probed and extended per micro-batch.

    The continuous form of the batch LSH tier (operators/dedup.py): each
    arriving micro-batch of documents (1) computes its banded signatures,
    (2) probes them against the accumulated band index — any equal band key
    means an earlier document is a near-dup candidate, (3) checks for
    intra-batch collisions the same way (smaller doc_id = "earlier"), and
    (4) appends its own bands to the index. A flagged document reports its
    SMALLEST earlier partner, so the drained result equals the batch LSH
    candidate relation aggregated as ``MIN(id_a) GROUP BY id_b`` — which is
    exactly the DuckDB oracle: incremental index maintenance is proven
    equivalent to the batch rebuild, the property that makes it safe to run
    on a 100 TB landing stream instead of re-deduping the corpus nightly.

    Mechanics: documents are staged as ``n_files`` doc_id-ordered range
    files with ascending mtimes (the file source processes in mtime order)
    and drained with maxFilesPerTrigger=1, so batch order — and therefore
    "earlier" — is deterministic. The band index and the flag log are
    parquet append dirs inside foreachBatch; both writes are min-idempotent
    (a replayed batch appends duplicate bands and duplicate flags, and
    every consumer is a MIN over them), which is what makes the
    at-least-once foreachBatch contract safe here. At scale the index is a
    real table bucketed by band key; the probe is then a bucket-local join.
    """
    import os

    from ..operators import dedup as ops_dedup
    from .ts import input_bytes, sized_state_partitions, stage_ordered_ranges

    path = os.path.join(sf_dir, "documents.parquet")
    src = tempfile.mkdtemp(prefix="stream_docs_")
    store = tempfile.mkdtemp(prefix="lsh_bands_")
    results = tempfile.mkdtemp(prefix="lsh_flags_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    _PARTS_CONF = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(_PARTS_CONF, None)
    try:
        # distributed range-split staging (no driver materialization);
        # ascending mtimes pin the micro-batch order to ascending doc_id
        stage_ordered_ranges(spark, path, src, n_files)

        spark.conf.set(
            _PARTS_CONF, str(sized_state_partitions(spark, input_bytes(path)))
        )

        def apply_batch(batch: DataFrame, batch_id: int) -> None:
            sess = batch.sparkSession
            # map-side signatures (minhash_signatures_arrays): the per-batch
            # band build plans zero Exchange before the probe joins — the
            # old shape shuffled the exploded shingle relation twice per
            # micro-batch (distinct + groupBy)
            sa = ops_dedup.shingle_arrays(
                batch.select("doc_id", "text"), "doc_id", "text", n=3
            )
            bands = ops_dedup.band_table(
                ops_dedup.minhash_signatures_arrays(sa, "doc_id"), "doc_id"
            ).persist()
            intra = (
                bands.alias("a")
                .join(
                    bands.alias("b"),
                    (F.col("a.bk") == F.col("b.bk"))
                    & (F.col("b.doc_id") < F.col("a.doc_id")),
                )
                .select(
                    F.col("a.doc_id").alias("doc_id"),
                    F.col("b.doc_id").alias("partner"),
                )
            )
            hits = intra
            if any(
                not f.startswith(("_", ".")) for f in os.listdir(store)
            ):
                prev = sess.read.parquet(store)
                # p.doc_id < a.doc_id: a no-op on the normal path (earlier
                # batches always carry smaller doc_ids under the
                # doc_id-ordered staging) but REQUIRED for replay
                # idempotency — a replayed batch finds its OWN bands
                # already in the index (appended before the checkpoint
                # committed) and would otherwise flag docs against
                # themselves or same-batch later ids, diverging from the
                # batch oracle's MIN(earlier partner).
                hits = hits.unionAll(
                    bands.alias("a")
                    .join(
                        prev.alias("p"),
                        (F.col("a.bk") == F.col("p.bk"))
                        & (F.col("p.doc_id") < F.col("a.doc_id")),
                    )
                    .select(
                        F.col("a.doc_id").alias("doc_id"),
                        F.col("p.doc_id").alias("partner"),
                    )
                )
            flagged = hits.groupBy("doc_id").agg(
                F.min("partner").alias("first_dup_of")
            )
            # NO coalesce(1) here: coalesce after a shuffle collapses the
            # reduce stage itself to one task (measured 53 s -> 23 s at the
            # 10x tier when removed). File count per append is already
            # bounded by sized_state_partitions; a production deployment
            # compacts the band store on a cadence instead.
            flagged.write.mode("append").parquet(results)
            bands.write.mode("append").parquet(store)
            bands.unpersist()

        stream = (
            spark.readStream.schema(
                "doc_id BIGINT, text STRING, lang STRING, "
                "source STRING, n_chars BIGINT"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        if any(not f.startswith(("_", ".")) for f in os.listdir(results)):
            out = (
                spark.read.parquet(results)
                .groupBy("doc_id")
                .agg(F.min("first_dup_of").alias("first_dup_of"))
                .localCheckpoint(eager=True)
            )
        else:  # no near-dups anywhere: schema-stable empty result
            out = spark.createDataFrame(
                [], "doc_id bigint, first_dup_of bigint"
            )
        return out
    finally:
        if prev_parts is None:
            spark.conf.unset(_PARTS_CONF)
        else:
            spark.conf.set(_PARTS_CONF, prev_parts)
        for d in (src, store, results, ckpt):
            shutil.rmtree(d, ignore_errors=True)


#: bucket count of the streaming LSH index table; every micro-batch probe
#: and append clusters on this layout, so the accumulated index is NEVER
#: reshuffled (it is corpus-sized at steady state — the side that grows)
LSH_INDEX_BUCKETS = 32

#: document-stream schema shared by the near-dup drains
_DOC_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def _band_key_table(batch: DataFrame) -> DataFrame:
    """(doc_id, bk) band table with the band-key struct flattened to an
    injective '|'-joined string — bucketBy cannot cluster on a struct;
    equality (and therefore the candidate set) is unchanged."""
    from ..operators import dedup as ops_dedup

    rows = len(ops_dedup.MINHASH_COEFFS) // ops_dedup.LSH_BANDS
    sa = ops_dedup.shingle_arrays(
        batch.select("doc_id", "text"), "doc_id", "text", n=3
    )
    b = ops_dedup.band_table(
        ops_dedup.minhash_signatures_arrays(sa, "doc_id"), "doc_id"
    )
    key = F.concat_ws(
        "|", F.col("bk.band"), *[F.col(f"bk.r{j}") for j in range(rows)]
    )
    return b.select("doc_id", key.alias("bk"))


def neardup_bucketed_batch_fn(
    results: str,
    index_table: str,
    index_path: str,
    n_buckets: int = LSH_INDEX_BUCKETS,
):
    """The foreachBatch body of the bucketed near-dup index, exposed as a
    factory so the checkpoint-recovery and replay tests can drive it
    directly (a replayed batch — the at-least-once contract — must leave
    the MIN-folded result unchanged; see the probe join's
    strictly-earlier-partner guard)."""

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        sess = batch.sparkSession
        # cluster the batch onto the index's bucket layout ONCE; the
        # probe join and the append both reuse this exchange
        bands = (
            _band_key_table(batch)
            .repartition(n_buckets, F.col("bk"))
            .persist()
        )
        intra = (
            bands.alias("a")
            .join(
                bands.alias("b"),
                (F.col("a.bk") == F.col("b.bk"))
                & (F.col("b.doc_id") < F.col("a.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_id"),
                F.col("b.doc_id").alias("partner"),
            )
        )
        hits = intra
        if sess.catalog.tableExists(index_table):
            prev = sess.table(index_table)  # bucketed: no Exchange side
            # strictly-earlier partners only: on a foreachBatch replay
            # the index already holds this batch's own bands
            hits = hits.unionAll(
                bands.alias("a")
                .join(
                    prev.alias("p"),
                    (F.col("a.bk") == F.col("p.bk"))
                    & (F.col("p.doc_id") < F.col("a.doc_id")),
                )
                .select(
                    F.col("a.doc_id").alias("doc_id"),
                    F.col("p.doc_id").alias("partner"),
                )
            )
        flagged = hits.groupBy("doc_id").agg(
            F.min("partner").alias("first_dup_of")
        )
        flagged.write.mode("append").parquet(results)
        (
            bands.write.mode("append")
            .format("parquet")
            .bucketBy(n_buckets, "bk")
            .sortBy("bk")
            .option("path", index_path)
            .saveAsTable(index_table)
        )
        bands.unpersist()

    return apply_batch


def drain_neardup_bucketed(spark: SparkSession, src: str, ckpt: str, batch_fn) -> None:
    """One availableNow drain of the staged document files through the
    bucketed per-batch function; each call is its own StreamingQuery whose
    process ends at completion, so a SECOND call over the same checkpoint
    IS the kill/restart path (offset log + committed index resume)."""
    stream = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def fold_neardup_results(spark: SparkSession, results: str) -> DataFrame:
    """MIN-fold the appended flag log into (doc_id, first_dup_of) — the
    replay-insensitive consumer every write in this module is shaped for."""
    import os

    if any(not f.startswith(("_", ".")) for f in os.listdir(results)):
        return (
            spark.read.parquet(results)
            .groupBy("doc_id")
            .agg(F.min("first_dup_of").alias("first_dup_of"))
            .localCheckpoint(eager=True)
        )
    return spark.createDataFrame([], "doc_id bigint, first_dup_of bigint")


def stream_neardup_minhash_bucketed(
    spark: SparkSession,
    sf_dir: str,
    n_files: int = 4,
    n_buckets: int = LSH_INDEX_BUCKETS,
) -> DataFrame:
    """PRODUCTION serve path of the streaming near-dup LSH index — the
    bucketed form the flat-index entry's docstring promises ("at scale the
    index is a real table bucketed by band key; the probe is then a
    bucket-local join").

    Same contract as :func:`stream_neardup_minhash` (drained result ≡ the
    batch LSH candidate relation folded as MIN(earlier partner) per
    flagged doc — one oracle for both forms proves bucketed incremental
    maintenance ≡ flat incremental maintenance ≡ full rebuild), different
    physical layout:

    - the index is a BUCKETED catalog table hash-clustered on the band
      key (``sources/bucketing.py`` discipline, append-mode): every
      micro-batch's bands are repartitioned to the index's bucket layout
      ONCE and appended in place;
    - the probe join reads the bucket metadata, so the ACCUMULATED index
      side plans with no Exchange — each batch shuffles only ITSELF onto
      the index layout. The index is the side that grows (corpus-sized at
      steady state); never reshuffling it is what keeps per-batch cost
      proportional to the batch, not the corpus — the flat-index form
      re-reads and re-shuffles the whole store every batch, which is
      exactly the constant the r9 bench flagged.

    The band-key struct is carried as an injective '|'-joined string
    (bucketBy cannot cluster on a struct); equality — and therefore the
    candidate set — is unchanged. Both stores stay min-idempotent, so
    foreachBatch's at-least-once replay contract is safe, as before.
    """
    import os

    from .ts import input_bytes, sized_state_partitions, stage_ordered_ranges

    path = os.path.join(sf_dir, "documents.parquet")
    src = tempfile.mkdtemp(prefix="stream_docs_")
    store = tempfile.mkdtemp(prefix="lsh_bucketed_")
    results = tempfile.mkdtemp(prefix="lsh_flags_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    index_table = f"lsh_band_index_{uuid.uuid4().hex[:8]}"
    index_path = os.path.join(store, "index")
    _PARTS_CONF = "spark.sql.shuffle.partitions"
    prev_parts = spark.conf.get(_PARTS_CONF, None)
    try:
        stage_ordered_ranges(spark, path, src, n_files)

        spark.conf.set(
            _PARTS_CONF, str(sized_state_partitions(spark, input_bytes(path)))
        )
        drain_neardup_bucketed(
            spark,
            src,
            ckpt,
            neardup_bucketed_batch_fn(
                results, index_table, index_path, n_buckets
            ),
        )
        return fold_neardup_results(spark, results)
    finally:
        if prev_parts is None:
            spark.conf.unset(_PARTS_CONF)
        else:
            spark.conf.set(_PARTS_CONF, prev_parts)
        try:
            spark.sql(f"DROP TABLE IF EXISTS {index_table}")
        except Exception:
            pass
        for d in (src, store, results, ckpt):
            shutil.rmtree(d, ignore_errors=True)
