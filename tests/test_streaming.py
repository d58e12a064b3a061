"""Streaming event-time decode regression guards (round-2 post-mortem).

Round 2's streaming readers forced ``ts BIGINT`` + ``div 1000`` on a
TIMESTAMP(MICROS) parquet column, collapsing every event onto 1970-01-20.
The old batch↔stream equivalence tests still passed because BOTH sides went
through the same wrong decode — only the DuckDB oracles caught it. These
tests close that hole two ways:

1. equivalence is asserted against the BATCH catalog path (catalog.table,
   which was always correct), not against a second streaming decode;
2. the decoded days are asserted to fall inside the data's REAL date range
   (TESTDATA.md: January 2024), so any future decode regression that shifts
   or collapses timestamps fails loudly instead of cancelling out.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from forgottenlandapp_etl_spark import catalog
from forgottenlandapp_etl_spark.streaming import online, ts
from forgottenlandapp_etl_spark.streaming.dedup import stream_dedup_event_keys


def test_events_schema_probe_matches_file(sf_dir):
    # the driver testdata carries ts as TIMESTAMP(MICROS); the probe must
    # NOT emit the legacy BIGINT decode path for it
    import os

    path = os.path.join(sf_dir, "events.parquet")
    assert not ts.ts_is_int64(path)
    assert "ts TIMESTAMP" in ts.events_stream_schema(path)


def test_event_time_decodes_both_encodings(spark, tmp_path):
    """int64-nanos and timestamp-micros files must decode to the SAME
    event time — the dtype guard, unit-level."""
    rows = [(1, "2024-01-05 12:30:00",), (2, "2024-03-01 00:00:01",)]
    base = spark.createDataFrame(rows, "event_id long, s string").select(
        "event_id", F.col("s").cast("timestamp").alias("tsv")
    )
    tsdir = str(tmp_path / "as_ts")
    base.select("event_id", F.col("tsv").alias("ts")).write.parquet(tsdir)
    nanodir = str(tmp_path / "as_int64")
    base.select(
        "event_id", (F.unix_micros("tsv") * 1000).alias("ts")
    ).write.parquet(nanodir)

    got = {}
    for d in (tsdir, nanodir):
        df = spark.read.parquet(d)
        decoded = df.select(
            "event_id", ts.event_time(df).cast("string").alias("ets")
        )
        got[d] = {r["event_id"]: r["ets"] for r in decoded.collect()}
    assert got[tsdir] == got[nanodir]
    assert got[tsdir][1] == "2024-01-05 12:30:00"


def test_stream_daily_counts_matches_batch_catalog(spark, sf_dir):
    """availableNow drain == the BATCH aggregate through catalog.table —
    the independent reference path that never had the decode bug."""
    streamed = online.stream_events_daily_counts(spark, sf_dir)
    got = {
        (r["day"], r["user_id"]): r["n_events"] for r in streamed.collect()
    }

    ev = catalog.table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(
            F.to_date("ts").cast("string").alias("day"), "user_id"
        ).agg(F.count(F.lit(1)).alias("n_events"))
    )
    want = {(r["day"], r["user_id"]): r["n_events"] for r in batch.collect()}
    assert got == want

    # the collapse signature: everything lands on one 1970 day. Real data
    # spans January 2024 (TESTDATA.md) — assert the decoded calendar agrees.
    days = sorted({d for d, _ in got})
    assert len(days) > 1
    assert days[0] >= "2024-01-01"
    assert days[-1] <= "2024-12-31"


def test_stream_dedup_days_in_real_range(spark, sf_dir):
    keys = stream_dedup_event_keys(spark, sf_dir)
    days = sorted({r["day"] for r in keys.select("day").distinct().collect()})
    assert len(days) > 1
    assert days[0] >= "2024-01-01" and days[-1] <= "2024-12-31"


def test_event_time_rejects_unknown_dtype(spark):
    df = spark.createDataFrame([(1, "x")], "event_id long, ts string")
    with pytest.raises(TypeError):
        ts.event_time(df)


def test_append_mode_drops_late_data_past_watermark(spark, tmp_path):
    """True watermark semantics, pinned end-to-end: an event arriving after
    the watermark passed its window is DROPPED from the aggregate (append
    mode), on-time events emit once their window closes, and still-open
    windows are withheld. Batch boundaries are made deterministic by
    running three availableNow drains over ONE checkpoint (the watermark
    persists in the checkpoint between runs — landing all files in a
    single drain would aggregate them in one batch with watermark 0):

      drain 1: events on Jan 5 (advance watermark to 11:00 Jan 5)
      drain 2: a LATE Jan 3 event (window long closed — must be dropped)
               plus an on-time 13:00 Jan 5 event
      drain 3: a Jan 7 event (pushes the watermark past Jan 5's window so
               it emits; Jan 7's own window stays open and is withheld)
    """
    import pyspark.sql.functions as F

    src = tmp_path / "polls"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    emitted = []

    def land(name, rows):
        df = spark.createDataFrame(rows, "event_id long, ts string").select(
            "event_id", F.col("ts").cast("timestamp").alias("ts")
        )
        df.coalesce(1).write.parquet(str(tmp_path / ("stage_" + name)))
        import glob
        import shutil

        part = glob.glob(str(tmp_path / ("stage_" + name) / "part-*.parquet"))[0]
        shutil.copy(part, str(src / (name + ".parquet")))

    def drain():
        stream = spark.readStream.schema("event_id long, ts timestamp").parquet(
            str(src)
        )
        agg = (
            stream.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 day").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.to_date(F.col("w.start")).cast("string").alias("day"), "n")
        )

        def sink(batch_df, batch_id):
            emitted.extend(
                (r["day"], r["n"]) for r in batch_df.collect()
            )

        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    land("f1", [(1, "2024-01-05 10:00:00"), (2, "2024-01-05 12:00:00")])
    drain()
    land("f2", [(3, "2024-01-03 09:00:00"), (4, "2024-01-05 13:00:00")])
    drain()
    land("f3", [(5, "2024-01-07 00:30:00")])
    drain()

    got = {}
    for day, n in emitted:
        got[day] = got.get(day, 0) + n
    # Jan 5 emitted with ONLY the on-time events (3, not 4 — the late Jan 3
    # row was dropped, not misfiled); no Jan 3 window; Jan 7 withheld (open)
    assert got == {"2024-01-05": 3}


def test_checkpoint_recovery_exactly_once(spark, sf_dir, tmp_path):
    """The production property of the reference's highest-traffic /online
    route (etl.dart:291-307, a 5-min cron): a CHECKPOINTED drain that is
    killed and restarted over a growing backlog, sinking through the
    idempotent K3 foreachBatch day-partition upsert, must land EXACTLY the
    one-shot batch aggregate — no loss (the restored state store carries
    the pre-kill counts) and no double count (the offset log never re-reads
    a committed file) — and a further drain with no new data must change
    nothing.

    Each online.run_stream call is its own StreamingQuery whose process
    exits at availableNow completion — drain 2 therefore IS the kill/restart
    path: it cold-starts from checkpointLocation's offset log + state store.
    """
    ev = catalog.table(spark, sf_dir, "events")
    polls = ev.select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        F.lit(5).cast("int").alias("minutes_per_poll"),
    )
    # time-ordered arrival: the first half of the calendar lands, the drain
    # runs and dies, then the rest arrives — the real cron-backlog shape
    lo, hi = polls.agg(F.min("ts"), F.max("ts")).collect()[0]
    # pin the kill point to MIDDAY of the middle day so at least one day's
    # counts are guaranteed to span both drains
    cut = (lo + (hi - lo) / 2).replace(hour=12, minute=0, second=0, microsecond=0)
    early = polls.where(F.col("ts") <= F.lit(cut))
    late = polls.where(F.col("ts") > F.lit(cut))

    def a5_semantics(df):
        # the batch source of truth: a5_poll_minutes (5 × polls per user-day)
        return {
            (r["day"], r["user_id"]): r["minutes"]
            for r in df.groupBy(
                F.to_date("ts").cast("string").alias("day"), "user_id"
            )
            .agg((F.count(F.lit(1)) * 5).cast("long").alias("minutes"))
            .collect()
        }
    want_early, want_all = a5_semantics(early), a5_semantics(polls)
    assert want_early and len(want_all) > len(want_early)
    # the recovery-sensitive case must exist: a day whose counts SPAN the
    # kill point — lost state undercounts it, a re-read double-counts it
    late_days = {d for (d, _) in a5_semantics(late)}
    assert {d for (d, _) in want_early} & late_days

    src, out, ckpt = (str(tmp_path / n) for n in ("polls", "daily", "ckpt"))
    early.coalesce(1).write.mode("append").parquet(src)
    online.run_stream(spark, src, out, ckpt)  # drain 1, then process "dies"

    def landed():
        return {
            (str(r["day"]), r["user_id"]): r["minutes"]
            for r in spark.read.parquet(out).collect()
        }

    assert landed() == want_early
    late.coalesce(1).write.mode("append").parquet(src)
    online.run_stream(spark, src, out, ckpt)  # restart from the checkpoint
    assert landed() == want_all
    online.run_stream(spark, src, out, ckpt)  # nothing new: must be a no-op
    assert landed() == want_all


def test_sized_state_partitions_bounds(spark):
    """SCALE.md rule 9: state partitions scale with input bytes — floored
    at 4, capped at the session's configured shuffle partitions (so a
    cluster-sized conf wins at cluster-sized inputs), and a sub-4 conf is
    respected verbatim."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        assert ts.sized_state_partitions(spark, 1) == 4
        assert ts.sized_state_partitions(spark, 2_000_000) == 4  # sf0.1 events
        assert ts.sized_state_partitions(spark, 100 << 20) == 13  # ceil(100/8)
        assert ts.sized_state_partitions(spark, 10 << 30) == 32  # conf-capped
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        assert ts.sized_state_partitions(spark, 10 << 30) == 2
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_staged_stream_scopes_and_restores_shuffle_conf(spark, sf_dir):
    """The sized layout applies only INSIDE the staging context: batch
    plans before/after see the session's own shuffle-partition conf."""
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with ts.staged_events_stream(spark, sf_dir):
        # the fixture events file is well under one 8 MB target, so the
        # sized layout is the floor: min(configured, 4)
        assert int(spark.conf.get(key)) == min(int(before), 4)
    assert spark.conf.get(key) == before


def test_input_bytes_walks_directories(tmp_path):
    """os.path.getsize on a directory returns the inode size (~4 KB) —
    input_bytes must sum the real data files so a multi-file landing dir
    doesn't collapse the state layout to the 4-partition floor."""
    import os

    d = tmp_path / "events.parquet"
    d.mkdir()
    for i in range(3):
        (d / f"part-{i}.parquet").write_bytes(b"x" * 10_000)
    (d / "_SUCCESS").write_bytes(b"")
    (d / ".crc").write_bytes(b"y" * 5_000)
    assert ts.input_bytes(str(d)) == 30_000  # hidden/_ files excluded
    f = tmp_path / "single.parquet"
    f.write_bytes(b"z" * 1234)
    assert ts.input_bytes(str(f)) == 1234


def test_stream_distinct_hll_registers_match_batch(spark, sf_dir):
    """The streaming HLL drain's register fold must equal the BATCH
    register build bit-for-bit (max is commutative — arrival order cannot
    matter), which is exactly why the streaming entry can share the batch
    entry's generated oracle. Also pins the state-bound claim: per day the
    register relation never exceeds m rows."""
    from forgottenlandapp_etl_spark.operators import sketches
    from forgottenlandapp_etl_spark.streaming.dedup import stream_distinct_user_hll

    streamed = {
        (r["day"], r["n_occupied"]): r["n_est"]
        for r in stream_distinct_user_hll(spark, sf_dir).collect()
    }

    ev = catalog.table(spark, sf_dir, "events").select(
        F.to_date("ts").cast("string").alias("day"),
        F.col("user_id").cast("string").alias("uk"),
    )
    regs = sketches.build_hll_registers(ev, "uk", ["day"])
    batch = sketches.hll_estimate(regs, ["day"]).unionAll(
        sketches.hll_estimate(
            sketches.merge_hll_registers(
                regs.select(F.lit("ALL").alias("day"), "bucket", "rho"), ["day"]
            ),
            ["day"],
        )
    )
    want = {(r["day"], r["n_occupied"]): r["n_est"] for r in batch.collect()}
    assert streamed == want
    days = sorted(d for d, _ in streamed if d != "ALL")
    assert days and days[0] >= "2024-01-01" and days[-1] <= "2024-12-31"
    assert all(n <= sketches.HLL_M for _, n in streamed)


def test_cdc_merge_is_batch_boundary_independent(spark, tmp_path):
    """The CDC snapshot is a pure function of the changelog SET: slicing it
    into micro-batches differently, delivering slices out of order, or
    replaying a slice (at-least-once delivery) all produce the identical
    snapshot — the property the foreachBatch merge's exactly-once claim
    rests on. Includes same-timestamp rows (event_id tiebreak) and a key
    whose delete is later overridden by a re-insert."""
    from forgottenlandapp_etl_spark.streaming import cdc

    schema = "key long, ts_us long, event_id long, is_delete boolean, value_cents long"
    rows = [
        (1, 1000, 1, False, 10),
        (1, 2000, 2, False, 20),   # key 1 live at 20
        (2, 1000, 3, False, 30),
        (2, 3000, 4, True, None),  # key 2 deleted
        (3, 1000, 5, True, None),
        (3, 1500, 6, False, 40),   # key 3 re-inserted after delete
        (4, 5000, 7, False, 50),
        (4, 5000, 8, False, 60),   # same ts: event_id 8 wins
        (5, 9000, 9, True, None),  # key 5 only ever a tombstone
    ]

    def snapshot(slices, name):
        path = str(tmp_path / name)
        for s in slices:
            cdc.merge_batch(spark.createDataFrame(s, schema), path, n_buckets=4)
        return sorted(
            map(tuple, spark.read.parquet(path).drop("bucket").collect())
        )

    one = snapshot([rows], "one")
    many = snapshot([rows[:3], rows[3:7], rows[7:]], "many")
    reordered = snapshot([rows[7:], rows[3:7], rows[:3]], "reordered")
    replayed = snapshot([rows[:5], rows[:5], rows[5:], rows[5:]], "replayed")
    assert one == many == reordered == replayed
    live = {r[0]: r[4] for r in one if not r[3]}
    assert live == {1: 20, 3: 40, 4: 60}
    tombstones = {r[0] for r in one if r[3]}
    assert tombstones == {2, 5}


def test_ivm_merge_batch_boundary_independent(spark, tmp_path):
    """The IVM correctness argument, tested directly: folding the same
    changelog through merge_delta under DIFFERENT micro-batch splits (one
    shot; row-by-row; lopsided 1/5; a replayed duplicate-free re-split)
    must land the identical view — SUM's associativity is the whole
    contract. Includes retractions that drive a group negative and a group
    that nets to exactly zero."""
    import pandas as pd

    from forgottenlandapp_etl_spark.streaming import ivm

    rows = [
        ("2024-03-01", "click", 1, 100),
        ("2024-03-01", "click", 1, 250),
        ("2024-03-01", "error", -1, -100),
        ("2024-03-01", "view", 1, 70),
        ("2024-03-02", "view", 1, 30),
        ("2024-03-02", "error", -1, -30),   # view group on 03-02 stays; error nets
        ("2024-03-02", "error", -1, -500),  # negative group
        ("2024-03-03", "purchase", 1, 999),
    ]
    schema = "day string, event_type string, dn long, dcents long"

    def run(splits):
        target = str(tmp_path / f"view_{len(splits)}_{splits[0][0][0]}")
        for chunk in splits:
            ivm.merge_delta(spark.createDataFrame(chunk, schema), target)
        got = {
            # str(): the day partition directory is type-inferred as DATE
            # on read-back; normalize for literal-key asserts
            (str(r["day"]), r["event_type"]): (r["n_events"], r["sum_cents"])
            for r in spark.read.parquet(target).collect()
        }
        return got

    one = run([rows])
    per_row = run([[r] for r in rows])
    lopsided = run([rows[:1], rows[1:6], rows[6:]])
    assert one == per_row == lopsided
    assert one[("2024-03-02", "error")] == (-2, -530)
    total_cents = sum(v[1] for v in one.values())
    assert total_cents == sum(r[3] for r in rows)


def test_bucketed_lsh_index_checkpoint_recovery(spark, sf_dir, tmp_path):
    """Kill-and-restart exactly-once for the BUCKETED streaming LSH index
    (mirrors the K3 upsert recovery test): drain part of the staged
    backlog, let the process "die" at availableNow completion, stage the
    rest, restart from the SAME checkpoint — the MIN-folded flags must
    equal the uninterrupted run's, a further drain with no new data must
    change nothing, and the recovered index table must hold exactly the
    batch band relation over the whole corpus (no lost and no duplicated
    appends)."""
    import os
    import shutil as sh
    import uuid

    from forgottenlandapp_etl_spark.streaming import dedup as sd
    from forgottenlandapp_etl_spark.streaming.ts import stage_ordered_ranges

    # uninterrupted reference run (the production entry itself)
    want = sorted(
        (r["doc_id"], r["first_dup_of"])
        for r in sd.stream_neardup_minhash_bucketed(
            spark, sf_dir, n_files=4
        ).collect()
    )
    assert want  # non-degenerate on the fixture corpus

    path = os.path.join(sf_dir, "documents.parquet")
    staged = tmp_path / "staged"
    staged.mkdir()
    stage_ordered_ranges(spark, path, str(staged), 4)
    files = sorted(os.listdir(staged))
    assert len(files) == 4
    src = tmp_path / "src"
    src.mkdir()
    results = tmp_path / "flags"
    results.mkdir()
    ckpt = str(tmp_path / "ckpt")
    index_table = f"lsh_recovery_{uuid.uuid4().hex[:8]}"
    fn = sd.neardup_bucketed_batch_fn(
        str(results), index_table, str(tmp_path / "index"), n_buckets=8
    )

    def fold():
        return sorted(
            (r["doc_id"], r["first_dup_of"])
            for r in sd.fold_neardup_results(spark, str(results)).collect()
        )

    try:
        for f in files[:2]:  # first half of the backlog arrives
            sh.copy2(staged / f, src / f)  # copy2 keeps the mtime order
        sd.drain_neardup_bucketed(spark, str(src), ckpt, fn)  # then "dies"
        for f in files[2:]:  # the rest arrives while down
            sh.copy2(staged / f, src / f)
        sd.drain_neardup_bucketed(spark, str(src), ckpt, fn)  # restart
        assert fold() == want
        sd.drain_neardup_bucketed(spark, str(src), ckpt, fn)  # no new data
        assert fold() == want
        idx = sorted(
            map(tuple, spark.table(index_table).collect())
        )
        full = sorted(
            map(
                tuple,
                sd._band_key_table(
                    catalog.table(spark, sf_dir, "documents")
                ).collect(),
            )
        )
        assert idx == full  # nothing lost, nothing double-appended
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {index_table}")


def test_bucketed_lsh_replayed_batch_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-running the SAME batch function
    (replay after a crash between the index append and the checkpoint
    commit) must leave the MIN-folded flags unchanged. This is exactly
    what the probe join's strictly-earlier-partner guard buys — on the
    replay the index already holds the batch's own bands, and without
    ``p.doc_id < a.doc_id`` a doc would match itself (partner == doc_id)
    or same-batch later ids and the fold would diverge."""
    import uuid

    from forgottenlandapp_etl_spark.streaming import dedup as sd

    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "wholly different content that shares no shingles with the rest"
    batch1 = spark.createDataFrame(
        [(0, text_a, "en", "s0", len(text_a)),
         (1, text_a, "en", "s0", len(text_a))],
        sd._DOC_SCHEMA,
    )
    batch2 = spark.createDataFrame(
        [(2, text_a, "en", "s1", len(text_a)),
         (3, text_b, "en", "s1", len(text_b))],
        sd._DOC_SCHEMA,
    )
    results = tmp_path / "flags"
    results.mkdir()
    index_table = f"lsh_replay_{uuid.uuid4().hex[:8]}"
    fn = sd.neardup_bucketed_batch_fn(
        str(results), index_table, str(tmp_path / "index"), n_buckets=4
    )

    def fold():
        return sorted(
            (r["doc_id"], r["first_dup_of"])
            for r in sd.fold_neardup_results(spark, str(results)).collect()
        )

    try:
        fn(batch1, 0)
        fn(batch2, 1)
        once = fold()
        assert once == [(1, 0), (2, 0)]  # exact dups flag to the earliest
        fn(batch2, 1)  # replay the last batch: index already has its bands
        assert fold() == once
        fn(batch1, 0)  # replay an EARLIER batch: the nastier case — the
        # index now also holds LATER docs' bands (2 matches 0/1's band
        # keys); the guard must keep 0 and 1 from flagging against 2
        assert fold() == once
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {index_table}")


def test_scd2_stream_replay_and_out_of_order(spark, tmp_path):
    """The two hazards of order-sensitive streaming maintenance, pinned:

    (a) REPLAY: re-running the same (batch, batch_id) pair must leave the
    interval store unchanged — the batch-keyed delta dir is rewritten,
    not double-appended, and the generation-pointer upsert republishes
    identical rows.

    (b) OUT-OF-ORDER ARRIVAL: a user's later-timestamped events landing
    in an EARLIER micro-batch (batch 2 carries ts 10..20, batch 3 carries
    ts 0..9 with a type that MERGES batch 2's two runs) must converge to
    the batch segmentation of the union — affected-key recomputation
    re-sorts the full history, where any per-batch run-stitching would
    keep the stale split."""
    import os

    from forgottenlandapp_etl_spark.streaming import scd2

    log_dir = str(tmp_path / "log")
    target = str(tmp_path / "intervals")

    def mk(rows):
        return spark.createDataFrame(
            rows, "user_id long, ts_us long, event_id long, event_type string"
        )

    def snap():
        return sorted(
            tuple(r)
            for r in spark.read.parquet(target)
            .select("user_id", "event_type", "from_us", "to_us", "n_events")
            .collect()
        )

    # batch 0: user 1 has runs A[10,20] B[30]
    b0 = [(1, 10, 100, "A"), (1, 20, 101, "A"), (1, 30, 102, "B")]
    scd2.apply_batch(mk(b0), 0, log_dir, target, n_buckets=4)
    once = snap()
    assert once == [(1, "A", 10, 20, 2), (1, "B", 30, 30, 1)]
    # (a) replay batch 0 byte-for-byte
    scd2.apply_batch(mk(b0), 0, log_dir, target, n_buckets=4)
    assert snap() == once
    # (b) late batch: ts 25 of type A lands AFTER batch 0 — it must
    # split nothing (A run is [10,20], B [30]) but a ts-5 B row plus a
    # ts-25 A row re-segment the middle of the history
    b1 = [(1, 5, 99, "B"), (1, 25, 103, "A")]
    scd2.apply_batch(mk(b1), 1, log_dir, target, n_buckets=4)
    assert snap() == [
        (1, "A", 10, 25, 3),   # ts-25 A joins the A run; B[30] stays
        (1, "B", 5, 5, 1),
        (1, "B", 30, 30, 1),
    ]
    # untouched-user isolation: user 2 in its own bucket, then a replay
    # of b1 must not touch user 2's rows
    scd2.apply_batch(mk([(2, 1, 200, "X")]), 2, log_dir, target, n_buckets=4)
    scd2.apply_batch(mk(b1), 1, log_dir, target, n_buckets=4)
    assert (2, "X", 1, 1, 1) in snap()
