"""In-flight pipeline metrics via ``Dataset.observe`` — zero extra passes.

The DQ queries (plans/relational_queries.py dq_*) PROFILE a table with their
own scan; production pipelines also need metrics about the run itself —
rows written, nulls in critical columns, value bounds — without paying a
second scan of 100 TB. ``observe`` attaches accumulator-style aggregates to
the existing plan: the metrics are collected DURING the job that writes the
data, cost nothing beyond the expressions themselves, and arrive on the
driver when the action completes.

Only deterministic, commutative aggregates belong here (count/sum/min/max):
observe metrics are accumulated per-task and merged, and task retries can
double-count non-deterministic expressions — the same rule as Spark
accumulators. The helpers below stick to that subset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_counts(
    df: DataFrame,
    null_cols: tuple[str, ...] = (),
    bound_cols: tuple[str, ...] = (),
    name: str = "pipeline",
) -> tuple[DataFrame, Observation]:
    """Attach row/null/bound metrics to ``df``'s plan.

    Returns (observed_df, observation). Run any ACTION on the returned
    DataFrame (write, count, foreachBatch body), then read
    ``observation.get`` — a dict with ``rows``, ``null_<col>`` per null
    column, and ``min_<col>``/``max_<col>`` per bound column. Reading
    ``.get`` before an action blocks, by design.
    """
    metrics = [F.count(F.lit(1)).alias("rows")]
    for c in null_cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}")
        )
    for c in bound_cols:
        metrics.append(F.min(c).alias(f"min_{c}"))
        metrics.append(F.max(c).alias(f"max_{c}"))
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def assert_expectations(
    observation: Observation,
    min_rows: int = 1,
    max_null_fraction: float = 0.0,
) -> dict:
    """Validate a completed observation against write expectations:
    at least ``min_rows`` rows, and each observed ``null_*`` metric at or
    below ``max_null_fraction`` of rows. Raises ValueError naming every
    violated expectation (a pipeline should fail loudly BEFORE downstream
    consumers read a half-broken table). Returns the metrics dict."""
    m = observation.get
    bad = []
    if m["rows"] < min_rows:
        bad.append(f"rows={m['rows']} < min_rows={min_rows}")
    for k, v in m.items():
        if k.startswith("null_") and v > max_null_fraction * m["rows"]:
            bad.append(
                f"{k}={v} exceeds {max_null_fraction:.2%} of {m['rows']} rows"
            )
    if bad:
        raise ValueError("pipeline expectations violated: " + "; ".join(bad))
    return m
