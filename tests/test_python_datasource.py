"""The Spark 4 Python DataSource tier (sources/python_datasource.py):
row-group partition planning, footer-stats pruning soundness, and the
end-to-end Arrow read path against the native parquet reader."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from forgottenlandapp_etl_spark.sources import python_datasource as pds


def _three_group_file(path: str) -> None:
    """doc_id 0..29 in three 10-row row groups: stats ranges [0,9],
    [10,19], [20,29]."""
    pdf = pd.DataFrame({"doc_id": range(30), "val": [i * 2 for i in range(30)]})
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), path, row_group_size=10)


class _Opts(dict):
    pass


def _reader(path, filters=()):
    r = pds.ArrowRowGroupReader(_Opts(path=path))
    if filters:
        returned = r.pushFilters(list(filters))
        # contract: every input filter comes back (pruning is an
        # optimization, Spark re-evaluates exactly)
        assert list(returned) == list(filters)
    return r


def test_partition_planning_and_stats_pruning(tmp_path):
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        StringContains,
    )

    f = str(tmp_path / "t.parquet")
    _three_group_file(f)
    assert pq.ParquetFile(f).num_row_groups == 3

    # no filters: one partition per row group
    assert [p.index for p in _reader(f).partitions()] == [0, 1, 2]
    # doc_id >= 20 prunes the first two groups
    assert [p.index for p in _reader(f, [GreaterThanOrEqual(("doc_id",), 20)]).partitions()] == [2]
    # doc_id > 19 likewise (strict boundary: hi=19 of group 1 fails > 19)
    assert [p.index for p in _reader(f, [GreaterThan(("doc_id",), 19)]).partitions()] == [2]
    # equality inside the middle group's range
    assert [p.index for p in _reader(f, [EqualTo(("doc_id",), 15)]).partitions()] == [1]
    # conjunction: AND of two filters intersects the surviving groups
    assert [
        p.index
        for p in _reader(
            f, [GreaterThanOrEqual(("doc_id",), 10), LessThan(("doc_id",), 20)]
        ).partitions()
    ] == [1]
    # contradictory range: nothing survives
    assert _reader(f, [GreaterThan(("doc_id",), 100)]).partitions() == []
    # unsupported filter class: ignored for pruning (all groups kept) but
    # still returned to Spark for exact evaluation
    r = pds.ArrowRowGroupReader(_Opts(path=f))
    flts = [StringContains(("doc_id",), "x")]
    assert list(r.pushFilters(flts)) == flts
    assert [p.index for p in r.partitions()] == [0, 1, 2]


def test_read_yields_exact_rowgroup_batches(tmp_path):
    f = str(tmp_path / "t.parquet")
    _three_group_file(f)
    r = _reader(f)
    got = []
    for p in r.partitions():
        for batch in r.read(p):
            got.extend(batch.to_pylist())
    assert [row["doc_id"] for row in got] == list(range(30))


def test_end_to_end_matches_native_reader(spark, sf_dir):
    """Reading documents through the custom source must equal the native
    parquet reader row-for-row, pushed filter applied — including when the
    pruning CANNOT help (single row group at fixture scale): soundness is
    'never changes results', not 'always prunes'."""
    pds.register(spark)
    path = f"{sf_dir}/documents.parquet"
    custom = (
        spark.read.format(pds.FORMAT_NAME)
        .option("path", path)
        .load()
        .where(F.col("n_chars") >= 200)
        .select("doc_id", "n_chars")
    )
    native = (
        spark.read.parquet(path)
        .where(F.col("n_chars") >= 200)
        .select("doc_id", "n_chars")
    )
    a = sorted((r["doc_id"], r["n_chars"]) for r in custom.collect())
    b = sorted((r["doc_id"], r["n_chars"]) for r in native.collect())
    assert a == b and len(a) > 0


def test_missing_path_option_raises(spark):
    with pytest.raises(Exception, match="path"):
        pds.ArrowRowGroupReader(_Opts())


def _replay_rows(reader, start, end):
    out = []
    for p in reader.partitions(start, end):
        for batch in reader.read(p):
            out.extend(
                (row["event_id"], row["user_id"], row["event_type"])
                for row in batch.to_pylist()
            )
    return out


def test_stream_reader_plans_executor_partitions(tmp_path):
    """The partition-planned protocol (r7 verdict item 1): a batch range
    spanning several row groups fans out into one InputPartition per
    row-group intersection (>1 task per micro-batch — the Simple reader's
    driver-side bottleneck removed), boundary slices land on the right
    groups, and the mod filter is applied executor-side in read()."""
    import pandas as pd

    f = str(tmp_path / "events.parquet")
    n = 100
    pd.DataFrame(
        {
            "event_id": range(n),
            "user_id": [i % 7 for i in range(n)],
            "event_type": [f"t{i % 3}" for i in range(n)],
        }
    ).to_parquet(f, row_group_size=10)
    r = pds.ParquetReplayStreamReader(_Opts(path=f, mod="2"))

    assert r.initialOffset() == {"v": 2, "pos": 0}
    assert r.latestOffset() == {"v": 2, "pos": n}
    parts = r.partitions({"v": 2, "pos": 0}, {"v": 2, "pos": n})
    assert len(parts) == 10, "one InputPartition per row group"
    # a sub-range crossing a group boundary: two partitions, exact slices
    sub = r.partitions({"v": 2, "pos": 15}, {"v": 2, "pos": 25})
    assert [(p.row_group, p.start, p.end) for p in sub] == [(1, 5, 10), (2, 0, 5)]
    # empty range (start == end) plans nothing — the idle-stream contract
    assert r.partitions({"v": 2, "pos": 40}, {"v": 2, "pos": 40}) == []
    rows = _replay_rows(r, {"v": 2, "pos": 0}, {"v": 2, "pos": n})
    assert rows[0] == (0, 0, "t0") and rows[1] == (2, 2, "t2")
    assert [x[0] for x in rows] == [i for i in range(n) if i % 2 == 0]


def test_stream_reader_recovery_replays_identical_slice(tmp_path):
    """Recovery determinism: a FRESH reader replaying the same (start,
    end) offset range through partitions()+read() produces the identical
    rows — the exactly-once story for checkpoint recovery."""
    import pandas as pd

    f = str(tmp_path / "events.parquet")
    n = 60
    pd.DataFrame(
        {"event_id": range(n), "user_id": [0] * n, "event_type": ["x"] * n}
    ).to_parquet(f, row_group_size=7)
    r = pds.ParquetReplayStreamReader(_Opts(path=f))
    r2 = pds.ParquetReplayStreamReader(_Opts(path=f))
    a = _replay_rows(r, {"v": 2, "pos": 13}, {"v": 2, "pos": 41})
    b = _replay_rows(r2, {"v": 2, "pos": 13}, {"v": 2, "pos": 41})
    assert a == b and [x[0] for x in a] == list(range(13, 41))
    # adjacent ranges partition the stream: no row lost or duplicated
    whole = _replay_rows(r, {"v": 2, "pos": 0}, {"v": 2, "pos": n})
    split = _replay_rows(r2, {"v": 2, "pos": 0}, {"v": 2, "pos": 29}) + _replay_rows(
        r2, {"v": 2, "pos": 29}, {"v": 2, "pos": n}
    )
    assert whole == split and len(whole) == n


def test_stream_reader_rejects_unversioned_offsets(tmp_path):
    """r8-advice: offsets changed meaning (post-filter counts -> raw
    positions) when the Simple reader was replaced, so a NONZERO offset
    without the v=2 marker must fail fast instead of silently resuming at
    the wrong rows. Position 0 is version-neutral and still accepted."""
    import pandas as pd

    f = str(tmp_path / "events.parquet")
    pd.DataFrame(
        {"event_id": range(20), "user_id": [0] * 20, "event_type": ["x"] * 20}
    ).to_parquet(f, row_group_size=5)
    r = pds.ParquetReplayStreamReader(_Opts(path=f))
    with pytest.raises(ValueError, match="version marker"):
        r.partitions({"pos": 7}, {"v": 2, "pos": 20})
    with pytest.raises(ValueError, match="discard the old checkpoint"):
        r.partitions({"v": 2, "pos": 0}, {"pos": 20})
    with pytest.raises(ValueError, match="version marker"):
        r.partitions({"v": 1, "pos": 7}, {"v": 2, "pos": 20})
    # pos=0 means "start of stream" in every version — accepted unversioned
    parts = r.partitions({"pos": 0}, {"v": 2, "pos": 20})
    assert len(parts) == 4
    rows = _replay_rows(r, {"pos": 0}, {"v": 2, "pos": 20})
    assert [x[0] for x in rows] == list(range(20))


def test_stream_reader_multi_file_directory(tmp_path):
    """Directory datasets (the 10x scale tier): the footer index
    concatenates sorted part files, so a batch range spans FILES as well
    as row groups — partitions carry the right file paths."""
    import pandas as pd

    d = tmp_path / "events_dir"
    d.mkdir()
    for i in range(3):
        pd.DataFrame(
            {
                "event_id": range(i * 20, (i + 1) * 20),
                "user_id": [0] * 20,
                "event_type": ["x"] * 20,
            }
        ).to_parquet(str(d / f"part-{i}.parquet"), row_group_size=10)
    r = pds.ParquetReplayStreamReader(_Opts(path=str(d)))
    assert r.latestOffset() == {"v": 2, "pos": 60}
    parts = r.partitions({"v": 2, "pos": 0}, {"v": 2, "pos": 60})
    assert len(parts) == 6 and len({p.file for p in parts}) == 3
    rows = _replay_rows(r, {"v": 2, "pos": 15}, {"v": 2, "pos": 45})
    assert [x[0] for x in rows] == list(range(15, 45))


def test_writer_round_trip_and_overwrite(spark, sf_dir, tmp_path):
    """df.write through the staged-commit writer: every row lands exactly
    once (task files are promoted only via commit messages), and
    mode('overwrite') replaces the previous contents atomically at commit
    time rather than truncating before the job runs."""
    from forgottenlandapp_etl_spark.sources import python_datasource as pds

    pds.register(spark)
    src = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tgt = str(tmp_path / "out")
    import os

    os.makedirs(tgt)
    src.write.format(pds.FORMAT_NAME).option("path", tgt).mode("append").save()
    got = spark.read.parquet(f"{tgt}/part-*.parquet")
    assert sorted(r["doc_id"] for r in got.select("doc_id").collect()) == sorted(
        r["doc_id"] for r in src.select("doc_id").collect()
    )
    assert not [f for f in os.listdir(tgt) if f.startswith(".staging")]

    # overwrite with a strict subset — old part files must all be gone
    sub = src.where("doc_id % 2 = 0")
    sub.write.format(pds.FORMAT_NAME).option("path", tgt).mode("overwrite").save()
    got2 = spark.read.parquet(f"{tgt}/part-*.parquet")
    assert got2.count() == sub.count() < src.count()


def test_writer_abort_leaves_target_untouched(spark, sf_dir, tmp_path):
    """A failing task must abort the whole write: the target keeps its
    previous contents bit-for-bit and staging is cleaned — the
    all-or-nothing visibility contract."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from forgottenlandapp_etl_spark.sources import python_datasource as pds

    pds.register(spark)
    src = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    tgt = str(tmp_path / "out")
    os.makedirs(tgt)
    src.write.format(pds.FORMAT_NAME).option("path", tgt).mode("append").save()
    before = sorted(os.listdir(tgt))

    @F.udf(returnType=LongType())
    def boom(x):
        raise RuntimeError("injected task failure")

    with _pytest.raises(Exception):
        src.select(boom("doc_id").alias("doc_id")).write.format(
            pds.FORMAT_NAME
        ).option("path", tgt).mode("overwrite").save()
    assert sorted(os.listdir(tgt)) == before  # no loss, no staging leftovers


def test_writer_empty_partitions(spark, tmp_path):
    """Empty input partitions stage nothing and commit cleanly (the
    writer's None-file commit message path)."""
    import os

    from forgottenlandapp_etl_spark.sources import python_datasource as pds

    pds.register(spark)
    df = spark.range(0).selectExpr("id AS doc_id").repartition(4)
    tgt = str(tmp_path / "out")
    os.makedirs(tgt)
    df.write.format(pds.FORMAT_NAME).option("path", tgt).mode("append").save()
    assert [f for f in os.listdir(tgt) if f.startswith("part-")] == []


def test_stream_writer_end_to_end_and_epoch_idempotence(spark, sf_dir, tmp_path):
    """The custom-source matrix's fourth quadrant: stream from the
    events_replay custom SOURCE into the arrow_rowgroups custom SINK,
    drain availableNow, and the committed files hold exactly the source
    rows with one _epoch marker per micro-batch. Then replay a commit
    with an already-markered batchId — the duplicate's staged files are
    dropped, not promoted (at-least-once delivery, exactly-once
    visibility)."""
    import json
    import os

    import pyarrow as pa

    from forgottenlandapp_etl_spark.sources import python_datasource as pds

    pds.register(spark)
    pds.register_stream(spark)
    tgt = str(tmp_path / "spool")
    os.makedirs(tgt)
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format(pds.STREAM_FORMAT_NAME)
        .option("path", f"{sf_dir}/events.parquet")
        .option("mod", "4")
        .load()
    )
    q = (
        stream.writeStream.format(pds.FORMAT_NAME)
        .option("path", tgt)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    markers = sorted(f for f in os.listdir(tgt) if f.startswith("_epoch-"))
    assert markers, os.listdir(tgt)
    committed = set()
    for m in markers:
        committed.update(json.load(open(os.path.join(tgt, m)))["files"])
    parts = {f for f in os.listdir(tgt) if f.endswith(".parquet")}
    assert parts == committed  # nothing visible that a marker doesn't own
    got = spark.read.parquet(f"{tgt}/epoch*.parquet")
    want = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where("event_id % 4 = 0")
        .select("event_id", "user_id", "event_type")
    )
    assert sorted(r["event_id"] for r in got.collect()) == sorted(
        r["event_id"] for r in want.collect()
    )
    assert not [f for f in os.listdir(tgt) if f.startswith(".stream-staging")] or all(
        not os.listdir(os.path.join(tgt, f))
        for f in os.listdir(tgt)
        if f.startswith(".stream-staging")
    )

    # direct epoch-replay: re-commit batch 0 with freshly staged files
    w = pds.ArrowSpoolStreamWriter({"path": tgt})
    tbl = pa.table({"event_id": pa.array([1], pa.int64())})
    msg = w.write(iter(tbl.to_batches()))
    before = sorted(os.listdir(tgt))
    w.commit([msg], 0)  # _epoch-0 already exists -> must be a no-op
    assert sorted(os.listdir(tgt)) == before
