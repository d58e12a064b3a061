"""Sink (K1–K4), nested-document codec (C7), route-pipeline, streaming, and
multimodal plumbing tests (SURVEY.md §5.2 plans 2/4: golden + idempotency).

These cover everything the DuckDB oracle gate can't: write-path semantics,
re-run idempotency, batch↔stream equivalence, and mapInPandas batch shapes.
"""

from __future__ import annotations

import hashlib
import os
import zlib

import pytest
from pyspark.sql import functions as F

from forgottenlandapp_etl_spark.operators import multimodal
from forgottenlandapp_etl_spark.pipelines.routes import ETLPipelines
from forgottenlandapp_etl_spark.sources import sinks
from forgottenlandapp_etl_spark.streaming import online


# ---------------------------------------------------------------------------
# fixtures: tiny domain snapshots (FIXTURES.md §2 edge cases)
# ---------------------------------------------------------------------------

SNAP_SCHEMA = "name string, vocation string, world string, level int, value long"


def snap(spark, rows):
    return spark.createDataFrame(rows, SNAP_SCHEMA)


DAY1 = [
    ("alice", "Knight", "Antica", 100, 5000),
    ("bob", "Druid", "Antica", 80, 4000),
    ("carol", "Paladin", "Secura", 60, 3000),
    ("dave", "None", "Secura", 25, 500),  # below level 30 → filtered
]
DAY2 = [
    ("alice", "Knight", "Antica", 101, 5600),  # +600
    ("bob", "Druid", "Antica", 80, 4000),  # +0 → dropped
    ("carol", "Paladin", "Secura", 61, 3100),  # +100
    ("erin", "Sorcerer", "Antica", 50, 2000),  # new → no diff row
]


# ---------------------------------------------------------------------------
# sinks K1–K4
# ---------------------------------------------------------------------------


def test_insert_snapshot_appends_partitions(spark, tmp_path):
    p = str(tmp_path / "t")
    df1 = spark.createDataFrame([("a", 1)], "k string, v int").withColumn(
        "date", F.lit("2024-01-01")
    )
    df2 = spark.createDataFrame([("b", 2)], "k string, v int").withColumn(
        "date", F.lit("2024-01-02")
    )
    sinks.insert_snapshot(df1, p)
    sinks.insert_snapshot(df2, p)
    back = spark.read.parquet(p)
    assert back.count() == 2
    # partition-dir values come back type-inferred (DateType here)
    assert sorted(str(r["date"]) for r in back.select("date").collect()) == [
        "2024-01-01",
        "2024-01-02",
    ]
    # physical layout: one directory per date partition (partition pruning)
    assert os.path.isdir(os.path.join(p, "date=2024-01-01"))


def test_overwrite_latest_replaces_state(spark, tmp_path):
    p = str(tmp_path / "t")
    sinks.overwrite_latest(spark.createDataFrame([(1,)], "v int"), p)
    sinks.overwrite_latest(spark.createDataFrame([(2,)], "v int"), p)
    assert [r["v"] for r in spark.read.parquet(p).collect()] == [2]


def test_upsert_partitions_is_idempotent_and_partial(spark, tmp_path):
    p = str(tmp_path / "t")
    d1 = spark.createDataFrame([("x", 1)], "k string, v int").withColumn(
        "date", F.lit("d1")
    )
    d2 = spark.createDataFrame([("y", 2)], "k string, v int").withColumn(
        "date", F.lit("d2")
    )
    sinks.upsert_partitions(d1, p)
    sinks.upsert_partitions(d2, p)
    # re-run day-1 with corrected value: only that partition is rewritten
    d1b = spark.createDataFrame([("x", 10)], "k string, v int").withColumn(
        "date", F.lit("d1")
    )
    sinks.upsert_partitions(d1b, p)
    got = {r["date"]: r["v"] for r in spark.read.parquet(p).collect()}
    assert got == {"d1": 10, "d2": 2}


def test_retention_keep_only(spark, tmp_path):
    p = str(tmp_path / "t")
    for d in ("d1", "d2", "d3"):
        sinks.insert_snapshot(
            spark.createDataFrame([(d, 1)], "k string, v int").withColumn(
                "date", F.lit(d)
            ),
            p,
        )
    sinks.retention_keep_only(spark, p, F.col("date") == "d3")
    assert [r["date"] for r in spark.read.parquet(p).collect()] == ["d3"]


def test_nested_document_roundtrip(spark):
    df = spark.createDataFrame(
        [("d1", "alice", 1), ("d1", "bob", 2), ("d2", "alice", 3)],
        "date string, name string, rank int",
    )
    doc = sinks.encode_nested_document(df, ("date",), ("name", "rank"))
    assert doc.count() == 2  # one row per snapshot date
    back = sinks.decode_nested_document(doc, "name string, rank int")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


# ---------------------------------------------------------------------------
# route pipelines: flagship diff + idempotency guards
# ---------------------------------------------------------------------------


@pytest.fixture()
def pipelines(spark, tmp_path):
    return ETLPipelines(spark, str(tmp_path / "wh"))


def test_exp_record_and_gain_flow(pipelines, spark):
    assert pipelines.exp_record(snap(spark, DAY1), "2024-01-01") is not None
    assert pipelines.exp_record(snap(spark, DAY2), "2024-01-02") is not None
    out = pipelines.exp_gain("2024-01-01", "2024-01-02", period="yesterday")
    rows = {r["name"]: (r["gain"], r["rank"]) for r in out.collect()}
    # positive gains only (F4), ranked desc by gain (W4); zero-gain bob and
    # new-name erin dropped; dave filtered by level
    assert rows == {"alice": (600, 1), "carol": (100, 2)}


def test_exp_record_idempotency_guard(pipelines, spark):
    assert pipelines.exp_record(snap(spark, DAY1), "2024-01-01") is not None
    assert pipelines.exp_record(snap(spark, DAY1), "2024-01-01") is None  # S6 guard


def test_exp_gain_retention_keeps_latest_per_period(pipelines, spark):
    day3 = [
        ("alice", "Knight", "Antica", 102, 6000),  # +400 over day 2
        ("carol", "Paladin", "Secura", 62, 3300),  # +200
    ]
    pipelines.exp_record(snap(spark, DAY1), "2024-01-01")
    pipelines.exp_record(snap(spark, DAY2), "2024-01-02")
    pipelines.exp_gain("2024-01-01", "2024-01-02", period="yesterday")
    pipelines.exp_record(snap(spark, day3), "2024-01-03")
    pipelines.exp_gain("2024-01-02", "2024-01-03", period="yesterday")
    dates = {
        str(r["date"])
        for r in pipelines._read("exp_gain").select("date").distinct().collect()
    }
    assert dates == {"2024-01-03"}  # K4: only the latest date per period


def test_online_time_daily_and_period(pipelines, spark):
    polls = spark.createDataFrame(
        [
            ("alice", 100, "Antica", 1),
            ("alice", 100, "Antica", 2),
            ("alice", 101, "Antica", 3),
            ("bob", 9, "Antica", 1),  # below level 10 → filtered
        ],
        "name string, level int, world string, poll_ts int",
    )
    daily = pipelines.register_online_players(polls, "2024-01-01")
    rows = {r["name"]: (r["time"], r["level"]) for r in daily.collect()}
    assert rows == {"alice": (15, 101)}  # 3 polls × 5 min; last level wins
    out = pipelines.online_time_period("2024-01-01", days=7, period="7days")
    assert {r["name"]: r["time"] for r in out.collect()} == {"alice": 15}
    # guard: second run is a no-op
    assert pipelines.online_time_period("2024-01-01", days=7, period="7days") is None


def test_rook_master_points(pipelines, spark):
    rankings = spark.createDataFrame(
        [
            ("experience", "alice", 1, 900),
            ("experience", "bob", 2, 800),
            ("fist", "alice", 3, 50),
            ("sword", "bob", 1, 70),
        ],
        "category string, name string, rank int, value long",
    )
    out = pipelines.rook_master(rankings, "2024-01-01")
    rows = {r["name"]: r["total_points"] for r in out.collect()}
    # points = 1000 - (rank - 1) per category, summed
    assert rows == {"alice": (1000 - 0) + (1000 - 2), "bob": (1000 - 1) + (1000 - 0)}


def test_calc_skill_points(pipelines):
    # value <= 10 → 0 tries below base skill (etl.dart:605 floor cases)
    assert pipelines.calc_skill_points("fist", 10) == 0
    assert pipelines.calc_skill_points("fist", None) == 0
    assert pipelines.calc_skill_points("fist", 11) > 0
    with pytest.raises(KeyError):
        pipelines.calc_skill_points("nonsense", 10)


# ---------------------------------------------------------------------------
# streaming: availableNow drain == batch aggregate
# ---------------------------------------------------------------------------


def test_stream_matches_batch(spark, tmp_path):
    polls = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, 5),
            (2, "2024-01-01 00:05:00", 1, 5),
            (3, "2024-01-01 23:59:00", 2, 5),
            (4, "2024-01-02 00:01:00", 1, 5),
        ],
        "event_id long, ts string, user_id long, minutes_per_poll int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "polls")
    polls.repartition(2).write.parquet(src)

    out = str(tmp_path / "daily")
    ckpt = str(tmp_path / "ckpt")
    online.run_stream(spark, src, out, ckpt)
    got = {
        (str(r["day"]), r["user_id"]): r["minutes"]
        for r in spark.read.parquet(out).collect()
    }
    assert got == {
        ("2024-01-01", 1): 10,
        ("2024-01-01", 2): 5,
        ("2024-01-02", 1): 5,
    }

    # re-running over the same checkpoint is a no-op (exactly-once)
    online.run_stream(spark, src, out, ckpt)
    again = {
        (str(r["day"]), r["user_id"]): r["minutes"]
        for r in spark.read.parquet(out).collect()
    }
    assert again == got


# ---------------------------------------------------------------------------
# multimodal plumbing
# ---------------------------------------------------------------------------


def test_media_features_match_python(spark):
    df = spark.createDataFrame([(1, "hello world"), (2, "abc")], "id long, txt string")
    media = multimodal.attach_media(df, "id", "txt")
    got = {r["media_id"]: r for r in multimodal.media_features(media).collect()}
    for mid, s in [(1, b"hello world"), (2, b"abc")]:
        assert got[mid]["sha256"] == hashlib.sha256(s).hexdigest()
        assert got[mid]["crc32"] == zlib.crc32(s)
        assert got[mid]["n_bytes"] == len(s)


def test_fake_decode_shape_and_determinism(spark):
    df = spark.createDataFrame([(1, "xyz")], "id long, txt string")
    media = multimodal.attach_media(df, "id", "txt")
    a = multimodal.fake_decode_media(media, side=4).collect()[0]
    assert (a["width"], a["height"], len(a["pixels"])) == (4, 4, 16)
    assert a["pixels"][:3] == [ord("x"), ord("y"), ord("z")]
    b = multimodal.fake_decode_media(media, side=4).collect()[0]
    assert a["pixels"] == b["pixels"]


def test_decode_media_unsupported_payload_fails_loudly(spark):
    """A payload no available decoder understands must fail the TASK with
    NotImplementedError — never silently fake pixels. (The raise moved
    from plan time to task time when the stdlib PPM/BMP branch landed:
    decodability is now a per-payload property, and on a real cluster the
    probe has to hold on executors anyway.)"""
    if multimodal._real_decoder_available():
        pytest.skip("codec present; Pillow decodes arbitrary formats")
    df = spark.createDataFrame([(1, "xyz")], "id long, txt string")
    media = multimodal.attach_media(df, "id", "txt")
    with pytest.raises(Exception, match="NotImplementedError|no codec"):
        multimodal.decode_media(media).collect()


def test_decode_media_stdlib_formats_real_roundtrip(spark):
    """The REAL decode path, exercised in THIS container (r5 verdict item
    6 — no Pillow needed): hand-packed binary PPM (P6), PGM (P5), and
    uncompressed bottom-up 24-bit BMP payloads flow through the Arrow
    batch stage; grayscale values asserted against the ITU-R 601-2 integer
    luma computed by hand, and the BMP (BGR, padded, bottom-up) must equal
    the PPM of the same logical image exactly. Nearest-neighbor resize
    checked as 2×2 → 4×4 block duplication."""
    import struct

    # logical 2×2 image, row-major: red, green / blue, white
    rgb = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]
    gray = [(299 * r + 587 * g + 114 * b) // 1000 for r, g, b in rgb]
    assert gray == [76, 149, 29, 255]

    ppm = b"P6\n# comment\n2 2\n255\n" + bytes(v for p in rgb for v in p)
    pgm = b"P5\n2 2\n255\n" + bytes(gray)
    # BMP: 14-byte file header, 40-byte info header, bottom-up rows,
    # BGR order, stride padded to 4 bytes (2*3 → 8)
    def bmp_row(px):
        raw = b"".join(bytes((b, g, r)) for r, g, b in px)
        return raw + b"\x00" * (8 - len(raw))

    raster = bmp_row(rgb[2:]) + bmp_row(rgb[:2])  # bottom row first
    bmp = (
        struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(raster), 0, 0, 0, 0)
        + raster
    )

    media = spark.createDataFrame(
        [
            (1, "image", "image/x-portable-pixmap", bytearray(ppm), len(ppm), "{}"),
            (2, "image", "image/x-portable-graymap", bytearray(pgm), len(pgm), "{}"),
            (3, "image", "image/bmp", bytearray(bmp), len(bmp), "{}"),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    out = {
        r["media_id"]: r
        for r in multimodal.decode_media(media, target_size=(2, 2)).collect()
    }
    if not multimodal._real_decoder_available():
        # stdlib branch: exact integer-luma equality, all three formats
        # agree on the same logical image
        assert out[1]["pixels"] == out[2]["pixels"] == out[3]["pixels"] == gray
    else:  # Pillow branch: same image, Pillow's own L conversion
        assert out[1]["pixels"] == out[3]["pixels"] and len(out[1]["pixels"]) == 4

    up = multimodal.decode_media(media, target_size=(4, 4)).collect()
    four = {r["media_id"]: r["pixels"] for r in up}
    if not multimodal._real_decoder_available():
        want = [
            gray[0], gray[0], gray[1], gray[1],
            gray[0], gray[0], gray[1], gray[1],
            gray[2], gray[2], gray[3], gray[3],
            gray[2], gray[2], gray[3], gray[3],
        ]
        assert four[1] == want
    assert all(len(p) == 16 for p in four.values())


def test_decode_media_real_codec_roundtrip(spark):
    """Real-codec tier: a genuine PNG payload decodes and resizes through
    the Arrow batch stage. Skips cleanly where no codec exists (this
    container); runs for real the moment Pillow is installed."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    img = PIL_Image.new("L", (3, 2))
    img.putdata([0, 60, 120, 180, 220, 255])
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", "image/png", bytearray(buf.getvalue()), len(buf.getvalue()), "{}")],
        multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.decode_media(media, target_size=(4, 4)).collect()[0]
    assert (out["width"], out["height"], len(out["pixels"])) == (4, 4, 16)
    assert all(0 <= p <= 255 for p in out["pixels"])


def test_frame_sample_counts(spark):
    text = "a" * 100  # 100 bytes → 7 chunks of 16 → frames at 0,4 → 2 frames
    df = spark.createDataFrame([(1, text)], "id long, txt string")
    media = multimodal.attach_media(df, "id", "txt", kind="video")
    frames = multimodal.frame_sample(media, every=4, frame_bytes=16).collect()
    assert len(frames) == 2
    assert sorted(f["frame_idx"] for f in frames) == [0, 1]
    assert len(frames[0]["frame_bytes"]) == 16


def test_stateful_accumulator_matches_batch(spark, tmp_path):
    """applyInPandasWithState accumulator: after draining all polls, the
    final per-user state equals the batch aggregate (count×5, last level)."""
    from forgottenlandapp_etl_spark.streaming import stateful

    polls = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, 10),
            (2, "2024-01-01 00:05:00", 1, 11),
            (3, "2024-01-01 00:05:00", 2, 50),
            (4, "2024-01-01 00:10:00", 1, 12),
        ],
        "event_id long, ts string, user_id long, level int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "polls")
    polls.coalesce(1).write.parquet(src)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, level int")
        .parquet(src)
    )
    out = stateful.accumulate_online_time(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("acc_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode: take the LAST emitted row per user
    rows = spark.sql(
        "SELECT user_id, minutes, level, n_polls FROM acc_test"
    ).collect()
    last = {}
    for r in rows:
        last[r["user_id"]] = (r["minutes"], r["level"], r["n_polls"])
    assert last == {1: (15, 12, 3), 2: (5, 50, 1)}


def test_add_missing_rank_guard_is_list_level(spark):
    """etl.dart:249-255: first entry ranked => whole list untouched; first
    entry unranked => EVERY row gets its list-position rank (stragglers
    overwritten)."""
    from forgottenlandapp_etl_spark.operators import windows

    order = [F.desc("value"), F.asc("name")]
    # all unranked -> positions 1..n
    df = spark.createDataFrame(
        [("a", 30, None), ("b", 20, None), ("c", 10, None)],
        "name string, value long, rank int",
    )
    got = {r["name"]: r["rank"] for r in windows.add_missing_rank(df, order).collect()}
    assert got == {"a": 1, "b": 2, "c": 3}
    # first (by sort) ranked -> untouched, even with null stragglers
    df = spark.createDataFrame(
        [("a", 30, 7), ("b", 20, None)], "name string, value long, rank int"
    )
    got = {r["name"]: r["rank"] for r in windows.add_missing_rank(df, order).collect()}
    assert got == {"a": 7, "b": None}
    # first unranked -> ALL overwritten, pre-existing later ranks included
    df = spark.createDataFrame(
        [("a", 30, None), ("b", 20, 99)], "name string, value long, rank int"
    )
    got = {r["name"]: r["rank"] for r in windows.add_missing_rank(df, order).collect()}
    assert got == {"a": 1, "b": 2}


def test_encode_nested_document_is_order_deterministic(spark):
    """The serialized ranking document must be byte-identical run-to-run
    regardless of partitioning (sort_array pins element order)."""
    from forgottenlandapp_etl_spark.sources import sinks as S

    rows = [("d1", i, f"p{i}") for i in range(1, 21)]
    a = spark.createDataFrame(rows, "date string, rank int, name string")
    b = spark.createDataFrame(list(reversed(rows)), "date string, rank int, name string").repartition(7)
    da = S.encode_nested_document(a, ("date",), ("rank", "name")).collect()[0]["data"]
    db = S.encode_nested_document(b, ("date",), ("rank", "name")).collect()[0]["data"]
    assert da == db
    assert '"rank":1' in da.split("},{")[0]


def test_retention_preserves_partition_layout(spark, tmp_path):
    """After retention, the table must still be partition-dir laid out so
    the next dynamic-partition upsert doesn't create a mixed layout."""
    import os as _os

    p = str(tmp_path / "t")
    for d in ("d1", "d2"):
        sinks.upsert_partitions(
            spark.createDataFrame([(d, 1)], "k string, v int").withColumn(
                "date", F.lit(d)
            ),
            p,
        )
    sinks.retention_keep_only(
        spark, p, F.col("date") == "d2", partition_cols=("date",)
    )
    assert _os.path.isdir(_os.path.join(p, "date=d2"))
    # follow-up upsert must not warn/mix: same partitioned layout
    sinks.upsert_partitions(
        spark.createDataFrame([("d3", 3)], "k string, v int").withColumn(
            "date", F.lit("d3")
        ),
        p,
    )
    got = {r["date"] for r in spark.read.parquet(p).select("date").collect()}
    assert got == {"d2", "d3"}


def test_snapshot_diff_duplicate_names_first_match(spark):
    """SURVEY §7.3 hard part 1 (etl.dart:234 firstWhere): on duplicate
    names in the build side, only the FIRST entry (lowest rank = list
    position) matches — a plain relational join would multiply rows AND
    use both values."""
    from forgottenlandapp_etl_spark.operators import joins as J

    yesterday = spark.createDataFrame(
        [("alice", 100, 1), ("alice", 50, 2), ("bob", 40, 3)],
        "name string, value long, rank int",
    )
    today = spark.createDataFrame(
        [("alice", 150, 1), ("bob", 45, 2)], "name string, value long, rank int"
    )
    out = J.snapshot_diff(
        today, yesterday, key="name", value="value", gain_name="gain",
        dedupe_order="rank",
    ).collect()
    got = {r["name"]: r["gain"] for r in out}
    assert len(out) == 2  # exactly one row per today entry, no multiplicity
    assert got == {"alice": 50, "bob": 5}  # vs first match (100), not second (50)


def test_snapshot_diff_null_values_dropped(spark):
    """F5 validity (etl.dart:243-247): null values on either side drop the
    pair entirely instead of coalescing to 0."""
    from forgottenlandapp_etl_spark.operators import joins as J

    yesterday = spark.createDataFrame(
        [("alice", None, 1), ("bob", 40, 2)], "name string, value long, rank int"
    )
    today = spark.createDataFrame(
        [("alice", 150, 1), ("bob", None, 2)], "name string, value long, rank int"
    )
    out = J.snapshot_diff(today, yesterday, dedupe_order="rank").collect()
    assert out == []


def test_append_mode_emits_only_watermark_closed_windows(spark, tmp_path):
    """Append output mode + watermark semantics: a day window is emitted
    once the watermark (max event time − 1 day) passes its end — and never
    re-emitted. Files arrive in two micro-batches; only day 1 closes."""
    days = [
        (1, "2024-01-01 01:00:00", 1),
        (2, "2024-01-01 02:00:00", 1),
        (3, "2024-01-02 01:00:00", 2),  # moves watermark past day-1 end? no: wm = 2024-01-01 01:00
        (4, "2024-01-03 05:00:00", 1),  # wm = 2024-01-02 05:00 > day-1 end -> closes day 1
    ]
    src = str(tmp_path / "src")
    import os as _os

    _os.makedirs(src)
    for i, row in enumerate(days):
        spark.createDataFrame(
            [row], "event_id long, ts string, user_id long"
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.to_date("w.start").cast("string").alias("day"), "user_id", "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("append_wm")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["day"], r["user_id"]): r["n"]
        for r in spark.sql("select * from append_wm").collect()
    }
    spark.catalog.dropTempView("append_wm")
    # only day 1 is closed by the final watermark (2024-01-02 05:00);
    # days 2 and 3 remain open state, not emitted
    assert got == {("2024-01-01", 1): 2}


def test_stateful_accumulator_tolerates_null_rows(spark, tmp_path):
    """A null-ts / null-event_id poll row counts toward minutes but must
    neither win the latest-level contest nor crash the query."""
    from forgottenlandapp_etl_spark.streaming import stateful

    polls = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, 50),
            (None, None, 1, None),  # malformed poll row
        ],
        "event_id long, ts string, user_id long, level int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "polls")
    polls.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, level int"
    ).parquet(src)
    q = (
        stateful.accumulate_online_time(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("acc_null_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from acc_null_test").collect()
    spark.catalog.dropTempView("acc_null_test")
    last = {r["user_id"]: (r["minutes"], r["level"], r["n_polls"]) for r in rows}
    assert last == {1: (10, 50, 2)}  # both rows counted; level from valid row


def test_stream_dedup_emits_each_key_once(spark, tmp_path):
    """dropDuplicatesWithinWatermark ingestion dedup: duplicated deliveries
    of the same (day, user, type) key must emit exactly one key row, and the
    emitted key set must equal the batch DISTINCT."""
    import uuid

    from forgottenlandapp_etl_spark.streaming import dedup as sdedup

    rows = []
    for i in range(6):
        # three deliveries of one logical key + three distinct keys
        rows.append((i, "2024-03-01 10:00:00", 1, "click", 1.0, "{}"))
    rows += [
        (10, "2024-03-01 11:00:00", 2, "view", 1.0, "{}"),
        (11, "2024-03-02 09:00:00", 1, "click", 1.0, "{}"),
    ]
    src = str(tmp_path / "events")
    (
        spark.createDataFrame(
            rows,
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string",
        )
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .coalesce(1)
        .write.parquet(src)
    )
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(src)
    keyed = (
        stream.withWatermark("ts", "1 day")
        .select(
            F.to_date("ts").cast("string").alias("day"),
            "user_id",
            "event_type",
            "ts",
        )
        .dropDuplicatesWithinWatermark(["day", "user_id", "event_type"])
        .select("day", "user_id", "event_type")
    )
    qname = f"sd_{uuid.uuid4().hex[:8]}"
    q = (
        keyed.writeStream.outputMode("append")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["day"], r["user_id"], r["event_type"])
        for r in spark.table(qname).collect()
    )
    spark.catalog.dropTempView(qname)
    assert got == [
        ("2024-03-01", 1, "click"),
        ("2024-03-01", 2, "view"),
        ("2024-03-02", 1, "click"),
    ]


def test_transform_with_state_user_stats(spark, sf_dir):
    """transformWithStateInPandas user stats must equal the batch aggregate.
    Skips where google.protobuf (the API's Python<->JVM state protocol
    dependency) is unavailable — the processor itself is environment-
    independent."""
    import pytest

    from forgottenlandapp_etl_spark import catalog
    from forgottenlandapp_etl_spark.streaming import transform_state

    if not transform_state.transform_state_available():
        with pytest.raises(NotImplementedError):
            transform_state.stream_user_stats(spark, sf_dir)
        pytest.skip("google.protobuf unavailable in this environment")
    got = {
        r["user_id"]: (r["n_events"], r["n_clicks"])
        for r in transform_state.stream_user_stats(spark, sf_dir).collect()
    }
    ev = catalog.table(spark, sf_dir, "events")
    batch = {
        r["user_id"]: (r["n"], r["c"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("c"),
        )
        .collect()
    }
    assert got == batch


def test_merge_rows_update_insert_keep_delete(spark):
    """merge_rows: matched rows take the source version, unmatched source
    rows insert, unmatched target rows survive, delete_condition drops
    matched rows — and a null join key matches null-safely."""
    from forgottenlandapp_etl_spark.sources import sinks

    target = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (None, "n", 99)],
        "id long, name string, v long",
    )
    source = spark.createDataFrame(
        [(2, "B", 200), (3, "c-del", -1), (4, "d", 40), (None, "N", 100)],
        "id long, name string, v long",
    )
    out = sinks.merge_rows(
        target, source, keys=("id",), delete_condition=F.col("s.v") < 0
    )
    got = {r["id"]: (r["name"], r["v"]) for r in out.collect()}
    assert got == {
        1: ("a", 10),      # target-only: kept
        2: ("B", 200),     # matched: source wins
        4: ("d", 40),      # source-only: inserted
        None: ("N", 100),  # null key matches null-safely, source wins
    }
    assert 3 not in got    # matched + delete_condition: dropped


def test_merge_rows_schema_mismatch_raises(spark):
    from forgottenlandapp_etl_spark.sources import sinks

    a = spark.createDataFrame([(1, "x")], "id long, name string")
    b = spark.createDataFrame([(1,)], "id long")
    import pytest

    with pytest.raises(ValueError, match="schemas differ"):
        sinks.merge_rows(a, b, keys=("id",))


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """A column added by a later snapshot must surface via mergeSchema with
    older rows null-filled — and partition pruning must survive the merged
    schema."""
    from forgottenlandapp_etl_spark.sources import sinks

    p = str(tmp_path / "snap")
    v1 = spark.createDataFrame(
        [(1, 10, "2024-01-01")], "k long, v long, date string"
    )
    sinks.insert_snapshot(v1, p)
    v2 = spark.createDataFrame(
        [(2, 20, 0.9, "2024-01-02")], "k long, v long, quality double, date string"
    )
    sinks.insert_snapshot(v2, p)

    out = sinks.read_snapshots(spark, p)
    assert set(out.columns) == {"k", "v", "quality", "date"}
    rows = {r["k"]: r for r in out.collect()}
    assert rows[1]["quality"] is None and rows[2]["quality"] == 0.9

    pruned = out.where(F.col("date") == "2024-01-02")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    import re as _re

    m = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "date" in m.group(1), plan[:1500]
    assert pruned.count() == 1


# ---------------------------------------------------------------------------
# observe()-based in-flight metrics
# ---------------------------------------------------------------------------


def test_observe_counts_during_write(spark, tmp_path):
    """Metrics are captured by the SAME job that writes the data — no
    second scan — and expectations gate the result."""
    from forgottenlandapp_etl_spark import observability

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, None, 7.5), (3, "c", None), (4, "d", 2.0)],
        "id long, name string, score double",
    )
    observed, obs = observability.observe_counts(
        df, null_cols=("name", "score"), bound_cols=("id",)
    )
    observed.write.mode("overwrite").parquet(str(tmp_path / "out"))
    m = obs.get
    assert m["rows"] == 4
    assert m["null_name"] == 1 and m["null_score"] == 1
    assert (m["min_id"], m["max_id"]) == (1, 4)
    # expectations: 25% nulls violates a 10% budget, passes at 30%
    with pytest.raises(ValueError, match="null_name"):
        observability.assert_expectations(obs, max_null_fraction=0.1)
    got = observability.assert_expectations(obs, max_null_fraction=0.3)
    assert got["rows"] == 4
