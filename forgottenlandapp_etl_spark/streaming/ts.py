"""Shared event-time decode for every streaming file source.

Round-2 post-mortem: each streaming module independently forced the events
stream schema to ``ts BIGINT`` and decoded with ``ts div 1000`` — correct
only for the legacy INT64(NANOS) parquet encoding. The driver's testdata
carries ``ts`` as TIMESTAMP(MICROS, isAdjustedToUTC=false), so the int64
micros were mis-divided and every event collapsed onto 1970-01-20: one day
window swallowed the whole table (stream_daily_counts 150 vs 4006 rows).
The batch path was immune because catalog.table() guards the conversion
with a dtype check (catalog.py:48-51); the streaming paths didn't.

This module is the single place streaming readers get their schema and
event-time column from, with the same probe-then-decode discipline:

- :func:`events_stream_schema` inspects the parquet FOOTER (pyarrow, no
  Spark job) and emits ``ts BIGINT`` only when the file really is int64;
  otherwise ``ts TIMESTAMP``. Watermarks require TimestampType —
  TIMESTAMP_NTZ is rejected by EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE — and
  with the session timezone pinned to UTC (session.py) the TIMESTAMP read
  of NTZ micros is wall-clock-identical to the batch/DuckDB view.
- :func:`event_time` converts whatever arrived into a TimestampType column,
  guarded by the actual stream dtype, mirroring catalog.table().
- :func:`staged_events_stream` is the one context manager every drain uses:
  stage the single-file table behind a symlink dir (the file source needs a
  directory; a real deployment streams a landing dir), read with the probed
  schema, and expose the decoded event time as ``ets``.

Equivalence tests in tests/test_streaming.py assert the decoded days fall
inside the data's real date range so a decode regression can never again
"pass" by comparing two identically-wrong pipelines.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import tempfile
from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: non-ts columns of the events table, shared by every reader
_EVENTS_REST = (
    "user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
)


def ts_is_int64(parquet_path: str, col: str = "ts") -> bool:
    """True when the parquet file physically stores ``col`` as an integer
    (the legacy INT64 nanos encoding). Footer-only read — no Spark job;
    directory datasets probe their first part file (one writer, one
    physical schema per dataset)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    probe = parquet_path
    if os.path.isdir(parquet_path):
        parts = sorted(
            f for f in os.listdir(parquet_path) if f.endswith(".parquet")
        )
        if parts:
            probe = os.path.join(parquet_path, parts[0])
    field = pq.read_schema(probe).field(col)
    return pa.types.is_integer(field.type)


def events_stream_schema(parquet_path: str) -> str:
    """readStream schema for the events table, probed from the file footer.

    int64 files keep ``ts BIGINT`` (decoded by :func:`event_time`);
    timestamp files read straight into TIMESTAMP so watermarks apply
    directly.
    """
    ts_type = "BIGINT" if ts_is_int64(parquet_path) else "TIMESTAMP"
    return f"event_id BIGINT, ts {ts_type}, {_EVENTS_REST}"


def event_time(stream: DataFrame, col: str = "ts") -> Column:
    """TimestampType event-time column, decoded per the ACTUAL dtype.

    Same guard as catalog.table(): only a bigint column gets the
    nanos→micros division; a timestamp column passes through untouched.
    """
    dtype = dict(stream.dtypes).get(col)
    if dtype == "bigint":
        return F.timestamp_micros(F.expr(f"`{col}` div 1000"))
    if dtype in ("timestamp", "timestamp_ntz"):
        return F.col(col).cast("timestamp")
    raise TypeError(
        f"column {col!r} has dtype {dtype!r}; expected bigint or timestamp"
    )


#: target state-store volume per shuffle partition when sizing a stateful
#: drain (see sized_state_partitions)
STATE_PARTITION_TARGET_BYTES = 8 << 20


def input_bytes(path: str) -> int:
    """Total data bytes of a parquet file OR directory. ``os.path.getsize``
    on a directory returns the directory inode (~4 KB) — which would size a
    terabyte landing dir at the 4-partition floor — so directories are
    walked and their non-hidden files summed."""
    if not os.path.isdir(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.startswith(("_", ".")):
                continue
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def sized_state_partitions(spark: SparkSession, input_bytes: int) -> int:
    """Shuffle-partition count for a STATEFUL streaming query, sized by
    input volume instead of core count.

    Unlike batch shuffles — where AQE coalesces small partitions at
    runtime — streaming state stores are instantiated one per shuffle
    partition per stateful operator AT QUERY START and keep that layout
    for the checkpoint's lifetime; a stream-stream join holds FOUR stores
    per partition. Profiled on the sf0.1 drain (tools/profile_streaming.py):
    at 32 partitions the outer-join spends 60-89 s of cumulative task time
    purely in state-store commits (128 store instance lifecycles per
    micro-batch) for 11.2 s wall; at 4-8 partitions the same query is
    2.5-3.7 s with identical output. The rule: one partition per
    ~8 MB of input, floored at 4 (parallelism safety), capped at the
    session's configured shuffle partitions — so a 100 TB landing
    directory still gets the full cluster-sized layout and only
    fixture-scale drains shed the per-instance overhead.
    """
    try:
        configured = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        configured = 200
    by_bytes = -(-max(input_bytes, 1) // STATE_PARTITION_TARGET_BYTES)  # ceil
    return max(4, min(configured, by_bytes)) if configured >= 4 else configured


def stage_ordered_ranges(
    spark: SparkSession,
    path: str,
    src: str,
    n_files: int,
    order_col: str = "doc_id",
) -> int:
    """Stage a parquet table as ``n_files`` order_col-ordered range files
    with ascending mtimes under ``src`` — the deterministic micro-batch
    fixture every document-stream entry drains — WITHOUT materializing the
    corpus on the driver.

    The split is a distributed ``repartitionByRange`` write: range
    partition i holds strictly smaller ``order_col`` values than partition
    i+1, and Spark's part-file names sort by partition id, so renaming the
    sorted listing and stamping ascending mtimes (the file source
    processes oldest-first) preserves the "earlier file ⇒ smaller ids"
    contract the streaming dedup entries rely on. A 100 TB landing dir
    therefore stages at cluster parallelism; the previous fixture's
    ``pyarrow.dataset(...).to_table()`` pulled the WHOLE dataset into one
    driver Arrow allocation before slicing (multi-GB at sf10, impossible
    at corpus scale). Returns the staged file count (range partitioning
    may yield fewer than ``n_files`` on tiny inputs — empty ranges write
    no file)."""
    out = tempfile.mkdtemp(prefix="stage_ranges_")
    try:
        (
            spark.read.parquet(path)
            .repartitionByRange(n_files, F.col(order_col))
            .write.mode("overwrite")
            .parquet(out)
        )
        parts = sorted(
            f
            for f in os.listdir(out)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        for i, f in enumerate(parts):
            dst = os.path.join(src, f"part-{i:04d}.parquet")
            shutil.move(os.path.join(out, f), dst)
            # 60 s mtime spacing dwarfs filesystem timestamp granularity
            os.utime(dst, (1_000_000_000 + i * 60,) * 2)
        return len(parts)
    finally:
        shutil.rmtree(out, ignore_errors=True)


@contextlib.contextmanager
def staged_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> Iterator[DataFrame]:
    """File-source stream over the events table with decoded ``ets``.

    Yields the streaming DataFrame (original columns + ``ets`` TIMESTAMP);
    the symlink staging dir lives for the duration of the with-block — run
    the (blocking) availableNow drain inside it. The session's shuffle
    partitions are scoped DOWN to :func:`sized_state_partitions` for the
    duration of the block (state stores are laid out one per shuffle
    partition at query start — the conf is restored on exit and batch
    plans elsewhere never see it)."""
    path = os.path.join(sf_dir, "events.parquet")
    schema = events_stream_schema(path)
    _NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"
    _PARTS_CONF = "spark.sql.shuffle.partitions"
    prev_nanos: str | None = None
    needs_nanos = "ts BIGINT" in schema
    if needs_nanos:
        # legacy nanos files need the session-level reader escape hatch;
        # snapshot it so batch TIMESTAMP(NANOS) reads later in the same
        # session aren't silently re-decoded as long
        prev_nanos = spark.conf.get(_NANOS_CONF, None)
        spark.conf.set(_NANOS_CONF, "true")
    prev_parts = spark.conf.get(_PARTS_CONF, None)
    spark.conf.set(
        _PARTS_CONF, str(sized_state_partitions(spark, input_bytes(path)))
    )
    src = tempfile.mkdtemp(prefix="stream_src_")
    if os.path.isdir(path):
        # multi-file dataset (e.g. the 10x scale tier): the file stream
        # source does NOT traverse subdirectories of its input path, so a
        # dir symlink would list zero files — flatten to per-file links
        for f in sorted(os.listdir(path)):
            if f.endswith(".parquet"):
                os.symlink(os.path.join(path, f), os.path.join(src, f))
    else:
        os.symlink(path, os.path.join(src, "events.parquet"))
    try:
        reader = spark.readStream.schema(schema)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        stream = reader.parquet(src)
        yield stream.withColumn("ets", event_time(stream))
    finally:
        shutil.rmtree(src, ignore_errors=True)
        if prev_parts is None:
            spark.conf.unset(_PARTS_CONF)
        else:
            spark.conf.set(_PARTS_CONF, prev_parts)
        if needs_nanos:
            if prev_nanos is None:
                spark.conf.unset(_NANOS_CONF)
            else:
                spark.conf.set(_NANOS_CONF, prev_nanos)
