"""CSV landing-zone ingestion (SURVEY.md §2.1 family, beside json_ingest).

The reference ingests JSON only, but a production landing zone invariably
accumulates CSV drops too; this is the same PERMISSIVE discipline as
json_ingest applied to them: schema-declared reads (never inferSchema —
a sampling pass over 100 TB that can silently flip a column's type between
loads), malformed rows captured in a ``_corrupt`` column instead of
failing the scan, and an explicit quarantine split so bad rows land in a
reviewable sink while good rows flow on.

PERMISSIVE semantics worth knowing (and tested): a row whose FIELD fails
to parse keeps the row with that field nulled and the raw line in
``_corrupt``; a row with the wrong arity is likewise captured, not
dropped. DROPMALFORMED silently shrinks the dataset and FAILFAST kills a
100 TB job on row one — both are the wrong default for bulk landing data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt"


def read_csv_landed(
    spark: SparkSession,
    path: str,
    schema: str,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """Schema-declared PERMISSIVE CSV scan with corrupt capture.

    ``schema`` is the DATA schema; the ``_corrupt STRING`` capture column
    is appended here so callers declare only their real columns.
    """
    full = f"{schema}, {CORRUPT_COL} STRING"
    return (
        spark.read.schema(full)
        .option("header", "true" if header else "false")
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, bad): bad rows keep only the raw line for review.

    ``df`` is persisted HERE: Spark refuses to execute a query that
    references only the CSV corrupt-record column of an uncached scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — the column is
    populated during parsing, so a pruned re-scan couldn't reproduce it),
    and the ``bad`` side is exactly that query. Caching also makes the
    split one physical pass feeding both sides. The caller owns the cache
    lifetime: ``df.unpersist()`` after both sides are consumed
    (:func:`ingest_csv` does this).
    """
    df.persist()
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    return good, bad


def ingest_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    quarantine_path: str | None = None,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """The landing pipeline: scan → quarantine write (optional) → good rows.

    One scan feeds both sides (cached for the duration of the quarantine
    write, then released); the quarantine append is idempotent per landing
    batch only if callers partition ``quarantine_path`` by batch — the
    same contract as sinks.insert_snapshot.
    """
    df = read_csv_landed(spark, path, schema, header=header, sep=sep)
    good, bad = quarantine_split(df)  # persists df; released below
    try:
        if quarantine_path is not None:
            bad.write.mode("append").parquet(quarantine_path)
            # materialize good rows while the scan is still cached — the
            # caller gets a plan over the cache, and we can't know when
            # they'll run it, so copy to rows via localCheckpoint
            good = good.localCheckpoint(eager=True)
    finally:
        # the good side alone also references data columns, so it is safe
        # to execute against the released (uncached) scan
        df.unpersist()
    return good
