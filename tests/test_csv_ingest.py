"""CSV landing-zone ingestion: PERMISSIVE capture + quarantine split."""

from __future__ import annotations

from forgottenlandapp_etl_spark.sources import csv_ingest

SCHEMA = "id BIGINT, name STRING, score DOUBLE"

GOOD = [
    "id,name,score",
    "1,alpha,0.5",
    "2,beta,1.25",
    "3,gamma,2.0",
]
BAD_TYPE = "4,delta,not_a_number"  # field-level parse failure
BAD_ARITY = "5,epsilon"  # missing column


def _land(tmp_path, lines):
    p = tmp_path / "landing"
    p.mkdir()
    (p / "part1.csv").write_text("\n".join(lines) + "\n")
    return str(p)


def test_permissive_captures_and_keeps_rows(spark, tmp_path):
    src = _land(tmp_path, GOOD + [BAD_TYPE, BAD_ARITY])
    df = csv_ingest.read_csv_landed(spark, src, SCHEMA)
    rows = {r["id"]: r for r in df.collect()}
    # every physical line survives the scan — nothing silently dropped
    assert len(rows) == 5
    # field-level failure: row kept, bad field nulled, raw line captured
    assert rows[4]["score"] is None
    assert rows[4]["_corrupt"] == BAD_TYPE
    assert rows[4]["name"] == "delta"
    # arity failure: captured the same way
    assert rows[5]["_corrupt"] == BAD_ARITY
    # clean rows carry no capture
    assert rows[1]["_corrupt"] is None and rows[1]["score"] == 0.5


def test_quarantine_split_and_write(spark, tmp_path):
    src = _land(tmp_path, GOOD + [BAD_TYPE, BAD_ARITY])
    q = str(tmp_path / "quarantine")
    good = csv_ingest.ingest_csv(spark, src, SCHEMA, quarantine_path=q)
    assert {r["id"] for r in good.collect()} == {1, 2, 3}
    assert "_corrupt" not in good.columns
    bad = spark.read.parquet(q)
    assert sorted(r["raw_line"] for r in bad.collect()) == sorted(
        [BAD_TYPE, BAD_ARITY]
    )


def test_quarantine_split_standalone(spark, tmp_path):
    # the public helper used WITHOUT ingest_csv: consuming the bad side —
    # a query referencing only the corrupt-record column — raises
    # UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN unless the scan
    # is cached, so quarantine_split must persist internally
    src = _land(tmp_path, GOOD + [BAD_TYPE, BAD_ARITY])
    df = csv_ingest.read_csv_landed(spark, src, SCHEMA)
    try:
        good, bad = csv_ingest.quarantine_split(df)
        assert sorted(r["raw_line"] for r in bad.collect()) == sorted(
            [BAD_TYPE, BAD_ARITY]
        )
        assert {r["id"] for r in good.collect()} == {1, 2, 3}
    finally:
        df.unpersist()  # the documented caller responsibility


def test_schema_declared_never_inferred(spark, tmp_path):
    # an all-numeric-looking name column must stay STRING per the declared
    # schema (inferSchema would flip it to BIGINT and break joins downstream)
    src = _land(tmp_path, ["id,name,score", "1,123,0.5"])
    df = csv_ingest.read_csv_landed(spark, src, SCHEMA)
    assert dict(df.dtypes)["name"] == "string"
    assert df.collect()[0]["name"] == "123"
