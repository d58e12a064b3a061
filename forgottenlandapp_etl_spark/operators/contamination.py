"""Benchmark decontamination for training corpora (SURVEY.md §7.6 family).

The standard eval-hygiene step an LLM data pipeline runs before training:
flag every corpus document that shares word-n-gram shingles with a held-out
benchmark/eval set, so contaminated documents can be dropped (or the overlap
audited) before the corpus ships.

Scale shape: the benchmark side is SMALL by construction (eval sets are
thousands of documents, the corpus is billions), so its distinct-shingle set
is broadcast — the corpus is scanned ONCE, shingled in a narrow map
(operators.dedup.shingles — explode, no shuffle), hit-tested against the
broadcast set with a hash lookup, and aggregated with a single shuffle on
doc_id. No corpus self-join, no second scan. At 100 TB this is the cheapest
possible shape: one pass + one keyed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import dedup


def contamination_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    flag_threshold: float = 0.2,
) -> DataFrame:
    """Per-corpus-document shingle overlap with the benchmark set.

    Returns one row per corpus document that has at least ``n`` tokens:
    ``(id, n_shingles, n_contaminated, contaminated_frac, is_contaminated)``
    where ``n_contaminated`` counts the document's distinct n-gram shingles
    that appear anywhere in the benchmark, ``contaminated_frac`` is the
    int/int ratio (deterministic cross-engine), and ``is_contaminated`` is
    1 when the fraction reaches ``flag_threshold`` (int, not bool, for
    cross-engine hash stability).

    One broadcast left join + one groupBy(id): documents shorter than n
    tokens yield no shingles and are absent, mirroring the SQL
    generate_series emptiness of the oracle.
    """
    c_sh = dedup.shingles(corpus, id_col, text_col, n)
    b_sh = (
        dedup.shingles(benchmark, id_col, text_col, n)
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    flagged = c_sh.join(F.broadcast(b_sh), "shingle", "left")
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("__hit").alias("n_contaminated"),
        (F.count("__hit").cast("double") / F.count(F.lit(1))).alias(
            "contaminated_frac"
        ),
        (
            (F.count("__hit").cast("double") / F.count(F.lit(1)))
            >= F.lit(flag_threshold)
        )
        .cast("int")
        .alias("is_contaminated"),
    )
