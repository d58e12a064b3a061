"""Streaming corpus quality filtering: the ingestion-time form of the
hashed linear classifier (operators/classifier.py).

Because the inline-weight scorer is a per-row array fold (no shuffle, no
state), the EXACT SAME column expression that scores the batch corpus runs
on the document stream — no watermark, no state store, append mode. This is
the shape a continuous training-data pipeline wants: documents are scored
and filtered ON ARRIVAL, before any expensive keyed stage, and the filter's
output is deterministically equal to the batch query the oracle checks.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import classifier
from .dedup import _drain_to_memory

DOCS_SCHEMA = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def stream_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the documents table as a stream through the classifier and
    keep only documents at or above threshold. File-source stream (staged
    symlink dir, as elsewhere), availableNow, append mode — stateless."""
    import shutil

    src = tempfile.mkdtemp(prefix="stream_src_")
    os.symlink(
        os.path.join(sf_dir, "documents.parquet"),
        os.path.join(src, "documents.parquet"),
    )
    try:
        stream = spark.readStream.schema(DOCS_SCHEMA).parquet(src)
        kept = classifier.hashed_score(stream, "doc_id", "text").where(
            F.col("keep")
        ).select("doc_id", "n_toks", "score")
        return _drain_to_memory(kept, "stream_quality_filter")
    finally:
        shutil.rmtree(src, ignore_errors=True)
