"""Atomic-visibility audit of the non-compaction sinks (r6 verdict item
5): a reader concurrent with overwrite_latest / upsert_partitions /
retention_keep_only must never observe a missing table, a half-deleted
partition, or a mix of generations — it always reads exactly one complete
table version. Crash-window variants pin the recovery contract the same
way test_export.py does for compaction."""

import os
import threading

import duckdb
import pytest
from pyspark.sql import functions as F

from forgottenlandapp_etl_spark.sources import sinks


def _read_all(path, pattern="*.parquet"):
    """Reader-side view via an INDEPENDENT engine (duckdb). The pointer
    contract: resolve the live pointer ONCE at scan start (exactly what a
    table format does with its metadata pointer), then scan that immutable
    generation — the one-generation grace keeps it alive through the scan.
    The resolved dir must exist and read as one complete version; under
    the old in-place overwrite this observed missing dirs, half-deleted
    partitions, and old/new file mixes."""
    real = os.path.realpath(path)
    if not os.path.isdir(real):
        raise FileNotFoundError(f"live pointer dangles: {path} -> {real}")
    con = duckdb.connect()
    try:
        return con.execute(
            f"SELECT * FROM '{real}/{pattern}'"
        ).fetchall()
    finally:
        con.close()


class _HammerReader(threading.Thread):
    """Tight read loop; records every violation of the caller's invariant
    instead of raising (assertion happens on the main thread)."""

    def __init__(self, path, pattern, check):
        super().__init__(daemon=True)
        self.path, self.pattern, self.check = path, pattern, check
        self.stop = threading.Event()
        self.violations = []
        self.reads = 0

    def run(self):
        while not self.stop.is_set():
            try:
                rows = _read_all(self.path, self.pattern)
            except Exception as exc:  # missing table IS a violation
                self.violations.append(f"read error: {exc}")
                continue
            self.reads += 1
            err = self.check(rows)
            if err:
                self.violations.append(err)


def test_overwrite_latest_reader_never_sees_partial(spark, tmp_path):
    """Concurrent reader across 12 overwrites: every read returns N rows
    all carrying ONE write's value — never empty, never mixed."""
    path = str(tmp_path / "t")
    n = 50
    df0 = spark.range(n).select(F.col("id"), F.lit(0).alias("ver"))
    sinks.overwrite_latest(df0, path)

    def check(rows):
        if len(rows) != n:
            return f"saw {len(rows)} rows, want {n}"
        vers = {r[1] for r in rows}
        if len(vers) != 1:
            return f"mixed generations in one read: {sorted(vers)}"
        return None

    r = _HammerReader(path, "*.parquet", check)
    r.start()
    try:
        for ver in range(1, 13):
            sinks.overwrite_latest(
                spark.range(n).select(F.col("id"), F.lit(ver).alias("ver")), path
            )
    finally:
        r.stop.set()
        r.join(10)
    assert r.reads > 0
    assert r.violations == [], r.violations[:5]
    assert {x[1] for x in _read_all(path)} == {12}


def test_upsert_reader_never_sees_half_deleted_partition(spark, tmp_path):
    """The item-5 headline case: while one partition is repeatedly
    dynamic-overwritten, a concurrent reader must always see (a) the
    untouched partition complete and (b) the hot partition as exactly one
    complete version — Spark's in-place dynamic overwrite fails this."""
    path = str(tmp_path / "t")
    keep_n, hot_n = 40, 30
    keep = spark.range(keep_n).select(
        F.col("id"), F.lit(-1).alias("ver"), F.lit("keep").alias("part")
    )
    hot0 = spark.range(hot_n).select(
        F.col("id"), F.lit(0).alias("ver"), F.lit("hot").alias("part")
    )
    sinks.upsert_partitions(keep.union(hot0), path, ("part",))

    def check(rows):
        ks = [r for r in rows if r[2] == "keep"]
        hs = [r for r in rows if r[2] == "hot"]
        if len(ks) != keep_n:
            return f"untouched partition half-visible: {len(ks)}/{keep_n}"
        if len(hs) != hot_n:
            return f"hot partition half-visible: {len(hs)}/{hot_n}"
        vers = {r[1] for r in hs}
        if len(vers) != 1:
            return f"hot partition mixes versions: {sorted(vers)}"
        return None

    r = _HammerReader(path, "*/*.parquet", check)
    r.start()
    try:
        for ver in range(1, 11):
            sinks.upsert_partitions(
                spark.range(hot_n).select(
                    F.col("id"), F.lit(ver).alias("ver"), F.lit("hot").alias("part")
                ),
                path,
                ("part",),
            )
    finally:
        r.stop.set()
        r.join(10)
    assert r.reads > 0
    assert r.violations == [], r.violations[:5]
    final = spark.read.parquet(path)
    assert final.where("part = 'keep'").count() == keep_n
    assert {x["ver"] for x in final.where("part = 'hot'").collect()} == {10}


def test_retention_reader_never_sees_missing_table(spark, tmp_path):
    """retention_keep_only used to have a window where ``path`` did not
    exist between its two renames; under the pointer scheme a hammering
    reader must never error or see a partial row set."""
    path = str(tmp_path / "t")
    data = [(i, f"d{1 + i % 3}") for i in range(30)]
    sinks.upsert_partitions(
        spark.createDataFrame(data, "v long, date string"), path, ("date",)
    )

    valid_counts = {30, 10}  # before retention / after retention

    def check(rows):
        if len(rows) not in valid_counts:
            return f"partial table: {len(rows)} rows"
        return None

    r = _HammerReader(path, "*/*.parquet", check)
    r.start()
    try:
        for _ in range(4):
            sinks.retention_keep_only(
                spark, path, F.col("date") == "d1", ("date",)
            )
            sinks.upsert_partitions(
                spark.createDataFrame(data, "v long, date string"), path, ("date",)
            )
    finally:
        r.stop.set()
        r.join(10)
    assert r.reads > 0
    assert r.violations == [], r.violations[:5]


def test_upsert_preserves_concurrent_append_to_untouched_partition(spark, tmp_path):
    """An appender landing in an UNTOUCHED partition between the upsert's
    write and its publish must survive: the untouched-partition listing
    runs after the hook, so the appended file hardlinks across."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(i, "keep") for i in range(5)] + [(i, "hot") for i in range(5)],
        "v long, part string",
    )
    sinks.upsert_partitions(base, path, ("part",))

    def racing_appender():
        sinks.insert_snapshot(
            spark.createDataFrame([(900, "keep")], "v long, part string"),
            path,
            ("part",),
        )

    sinks.upsert_partitions(
        spark.createDataFrame([(100 + i, "hot") for i in range(5)], "v long, part string"),
        path,
        ("part",),
        _before_publish=racing_appender,
    )
    rows = {(r["v"], r["part"]) for r in spark.read.parquet(path).collect()}
    assert (900, "keep") in rows, "concurrent append to untouched partition lost"
    assert {v for v, p in rows if p == "hot"} == {100, 101, 102, 103, 104}
    assert {v for v, p in rows if p == "keep"} == {0, 1, 2, 3, 4, 900}


def test_crash_at_pointer_swap_leaves_old_table_complete(spark, tmp_path, monkeypatch):
    """Crash injected at the atomic swap itself: the live table must still
    read as the complete OLD version, and the next successful write must
    converge (no debris double-read)."""
    path = str(tmp_path / "t")
    sinks.overwrite_latest(
        spark.range(20).select(F.col("id"), F.lit(0).alias("ver")), path
    )

    real_replace = os.replace

    def boom(src, dst):
        raise OSError("injected crash at pointer swap")

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(OSError, match="injected"):
        sinks.overwrite_latest(
            spark.range(20).select(F.col("id"), F.lit(1).alias("ver")), path
        )
    monkeypatch.setattr(os, "replace", real_replace)
    rows = spark.read.parquet(path).collect()
    assert len(rows) == 20 and {r["ver"] for r in rows} == {0}
    sinks.overwrite_latest(
        spark.range(20).select(F.col("id"), F.lit(2).alias("ver")), path
    )
    rows = spark.read.parquet(path).collect()
    assert len(rows) == 20 and {r["ver"] for r in rows} == {2}


def test_recovery_repoints_to_highest_committed_generation(spark, tmp_path):
    """Crash that loses the pointer (between legacy rename and symlink, or
    symlink deletion): the next read/write recovers the highest COMMITTED
    generation; an uncommitted (markerless) build is never promoted."""
    path = str(tmp_path / "t")
    sinks.overwrite_latest(
        spark.range(10).select(F.col("id"), F.lit(0).alias("ver")), path
    )
    sinks.overwrite_latest(
        spark.range(10).select(F.col("id"), F.lit(1).alias("ver")), path
    )
    # simulate: pointer lost + an uncommitted half-built generation
    os.remove(path)
    half = sinks._gen_dir(path, 7)
    os.makedirs(half)
    with open(os.path.join(half, "part-junk.parquet"), "w") as fh:
        fh.write("not parquet")
    sinks._recover_pointer(path)
    rows = spark.read.parquet(path).collect()
    assert len(rows) == 10 and {r["ver"] for r in rows} == {1}
    # a subsequent write proceeds normally and supersedes everything
    sinks.overwrite_latest(
        spark.range(10).select(F.col("id"), F.lit(9).alias("ver")), path
    )
    assert {r["ver"] for r in spark.read.parquet(path).collect()} == {9}


def test_legacy_real_directory_migrates_in_place(spark, tmp_path):
    """Tables written before the pointer scheme are plain directories; the
    first pointer-era write migrates them and preserves semantics."""
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "d1"), (2, "d2")], "v long, date string"
    ).write.partitionBy("date").parquet(path)
    assert not os.path.islink(path)
    sinks.upsert_partitions(
        spark.createDataFrame([(20, "d2")], "v long, date string"), path, ("date",)
    )
    assert os.path.islink(path)
    rows = {(r["v"], r["date"]) for r in spark.read.parquet(path).collect()}
    assert rows == {(1, "d1"), (20, "d2")}


def test_upsert_multilevel_keeps_sibling_leaf_partitions(spark, tmp_path):
    """r7-advice regression (medium): with multi-level partition_cols
    (routes.py's ("period","date") exp-gain shape), upserting
    period=p1/date=d2 must NOT drop the sibling leaf period=p1/date=d1 —
    the old top-level touched-set skipped the whole period=p1 subtree."""
    path = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "p1", "d1"), (2, "p1", "d2"), (3, "p2", "d1")],
        "v long, period string, date string",
    )
    sinks.upsert_partitions(base, path, ("period", "date"))
    sinks.upsert_partitions(
        spark.createDataFrame([(20, "p1", "d2")], "v long, period string, date string"),
        path,
        ("period", "date"),
    )
    rows = {
        (r["v"], r["period"], r["date"])
        for r in spark.read.parquet(path).collect()
    }
    assert rows == {(1, "p1", "d1"), (20, "p1", "d2"), (3, "p2", "d1")}, (
        "sibling leaf partition lost under multi-level upsert"
    )
    # idempotent re-run converges to the same table
    sinks.upsert_partitions(
        spark.createDataFrame([(20, "p1", "d2")], "v long, period string, date string"),
        path,
        ("period", "date"),
    )
    assert {
        (r["v"], r["period"], r["date"])
        for r in spark.read.parquet(path).collect()
    } == rows


def test_legacy_migration_keeps_grace_copy_until_next_publish(spark, tmp_path):
    """r7-advice (low): the first pointer-era publish over a legacy real
    directory must keep the parked __legacy dir as the grace generation
    (in-flight pre-pointer readers), dropping it only at the NEXT publish."""
    path = str(tmp_path / "t")
    spark.range(5).select(F.col("id"), F.lit(0).alias("ver")).write.parquet(path)
    assert not os.path.islink(path)
    legacy = path + "__legacy"
    sinks.overwrite_latest(
        spark.range(5).select(F.col("id"), F.lit(1).alias("ver")), path
    )
    assert os.path.islink(path)
    assert os.path.isdir(legacy), "grace copy dropped inside the migrating publish"
    # the grace copy still reads as the complete pre-pointer table
    con = duckdb.connect()
    try:
        n = con.execute(f"SELECT count(*) FROM '{legacy}/*.parquet'").fetchone()[0]
    finally:
        con.close()
    assert n == 5
    sinks.overwrite_latest(
        spark.range(5).select(F.col("id"), F.lit(2).alias("ver")), path
    )
    assert not os.path.lexists(legacy), "grace copy must expire at the next publish"
    assert {r["ver"] for r in spark.read.parquet(path).collect()} == {2}


def test_streaming_upsert_crash_mid_publish_recovers_exactly_once(spark, tmp_path):
    """r7 verdict item 6 — the COMPOSED case crossing both recovery
    mechanisms: a foreachBatch partition-upsert stream is killed
    MID-PUBLISH (new generation fully written, pointer not yet swapped).
    The live table must still read as the complete previous generation;
    restarting the stream from the same checkpoint must replay the failed
    micro-batch through the pointer swap EXACTLY ONCE — the checkpoint
    replays the batch, the generation scheme makes the replay idempotent
    (the debris generation is simply overwritten) — and the drained table
    holds every row exactly once with no uncommitted debris left behind."""
    import pandas as pd

    from forgottenlandapp_etl_spark.sources import sinks as sk

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    # pre-existing committed table: the crash must not damage it
    sinks.upsert_partitions(
        spark.createDataFrame([(100, "d0"), (101, "d0")], "v long, day string"),
        out,
        ("day",),
    )
    pd.DataFrame({"v": [1, 2], "day": ["d1", "d1"]}).to_parquet(src / "f1.parquet")
    pd.DataFrame({"v": [3], "day": ["d2"]}).to_parquet(src / "f2.parquet")

    crashed = {"done": False}

    def run(inject_crash: bool) -> None:
        def upsert(batch_df, batch_id):
            if batch_df.isEmpty():
                return
            hook = None
            if inject_crash and not crashed["done"]:
                def hook():
                    crashed["done"] = True
                    raise RuntimeError("injected crash mid-publish")
            sinks.upsert_partitions(
                batch_df, out, ("day",), _before_publish=hook
            )

        q = (
            spark.readStream.schema("v long, day string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .writeStream.foreachBatch(upsert)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    with pytest.raises(Exception, match="injected crash"):
        run(inject_crash=True)
    assert crashed["done"]
    # mid-publish state: the live pointer still serves the COMPLETE old
    # generation (an independent engine reads it), debris gen uncommitted
    rows_mid = _read_all(out, "**/*.parquet")
    assert sorted(r[0] for r in rows_mid) == [100, 101]
    # restart from the same checkpoint: the failed batch replays through
    # the pointer swap exactly once, then the remaining file drains
    run(inject_crash=False)
    got = {(r["v"], r["day"]) for r in spark.read.parquet(out).collect()}
    assert got == {(100, "d0"), (101, "d0"), (1, "d1"), (2, "d1"), (3, "d2")}
    # no duplicate rows (exactly-once through the replay)
    assert spark.read.parquet(out).count() == 5
    # a single committed generation chain: no uncommitted debris beyond the
    # one grace generation the pointer scheme keeps by design
    gens = sk._list_gens(out)
    committed = [
        k for k in gens
        if os.path.exists(os.path.join(sk._gen_dir(out, k), sk._GEN_MARK))
    ]
    assert len(gens) <= 2 and committed, (gens, committed)
