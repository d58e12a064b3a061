"""Wider relational surface: temporal joins, multidimensional aggregates,
set operations, distribution statistics (SURVEY.md §2.4/§2.5/§2.7 notes —
operators absent from the reference but first-class in the engine).

Same conventions as reference_queries: decimal-sum discipline for doubles,
unique tiebreakers in every window, integer widths pinned on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import catalog
from ..functions.num import dsum
from ..operators import joins
from ..session import tune

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = name
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = oracle
        return wrapped

    return deco


def _t(spark, sf_dir, name):
    return catalog.table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# temporal joins
# ---------------------------------------------------------------------------


@query(
    "j7_asof_join",
    """
    SELECT c.event_id, c.user_id, e.value AS asof_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON c.user_id = e.user_id AND e.ts <= c.ts
    """,
)
def j7_asof_join(spark, sf_dir):
    """As-of join — each click gets the most recent prior error value for
    the same user. Implemented as the union+last-non-null window form (one
    shuffle on user_id), not a range join: |left|+|right| rows sorted once,
    never |left|×|right| candidates."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts", "value"
    )
    out = joins.asof_join(
        clicks, errors, on="user_id", value="value", tiebreak="event_id"
    )
    return out.select("event_id", "user_id", F.col("asof_value"))


@query(
    "j8_range_join",
    """
    SELECT l.event_id, CAST(COUNT(*) AS BIGINT) AS n_clicks
    FROM (SELECT * FROM events WHERE event_type = 'error') l
    JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id
     AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 2 HOUR
    GROUP BY 1
    """,
)
def j8_range_join(spark, sf_dir):
    """Interval join — clicks within 2 hours after each error, per user.
    The user_id equality keeps it a hash equi-join with the time band as a
    residual predicate (never a nested-loop cross product)."""
    ev = _t(spark, sf_dir, "events")
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    j = joins.range_join(errors, clicks, "user_id", "ts", "ts", "2 HOUR")
    return j.groupBy(F.col("l.event_id").alias("event_id")).agg(
        F.count(F.lit(1)).alias("n_clicks")
    )


# ---------------------------------------------------------------------------
# multidimensional aggregates
# ---------------------------------------------------------------------------


@query(
    "agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    """ROLLUP — hierarchical subtotals (flag, flag+status, grand total) in
    one pass; Spark expands grouping sets before the hash aggregate, so it
    still partial-aggregates map-side."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity").alias("sum_qty"),
    )


@query(
    "agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark, sf_dir):
    """CUBE — all 2^2 grouping combinations in one aggregate pass."""
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("sum_price"),
    )


@query(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS — per-flag and per-status marginals without
    the full cube."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
    ).agg(
        F.grouping_id().cast("int").alias("gid"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_distinct_count",
    """
    SELECT user_id,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    """,
)
def agg_distinct_count(spark, sf_dir):
    """COUNT(DISTINCT) per key — Spark expands to a two-phase aggregate
    (partial distinct then merge), no driver-side dedup."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query("agg_approx_distinct")
def agg_approx_distinct(spark, sf_dir):
    """approx_count_distinct (HyperLogLog++) per event_type — sketch-based,
    mergeable, constant memory per group at any scale. No SQL oracle: HLL
    estimates are engine-specific (rows-only check; the accuracy bound is
    asserted against the exact count in tests/test_extensions.py)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users")
    )


# ---------------------------------------------------------------------------
# set operations
# ---------------------------------------------------------------------------


@query(
    "set_intersect",
    """
    SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_intersect(spark, sf_dir):
    """INTERSECT — users who both clicked and errored."""
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("user_id")
    b = ev.where(F.col("event_type") == "error").select("user_id")
    return a.intersect(b)


@query(
    "set_except",
    """
    SELECT event_id FROM events WHERE value > 30
    EXCEPT
    SELECT event_id FROM events WHERE event_type = 'click'
    """,
)
def set_except(spark, sf_dir):
    """EXCEPT (distinct set semantics, DataFrame ``subtract``) — high-value
    events that are not clicks."""
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("value") > 30).select("event_id")
    b = ev.where(F.col("event_type") == "click").select("event_id")
    return a.subtract(b)


# ---------------------------------------------------------------------------
# distribution statistics
# ---------------------------------------------------------------------------


@query(
    "agg_percentile",
    """
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           MIN(value) AS vmin, MAX(value) AS vmax
    FROM events GROUP BY event_type
    """,
)
def agg_percentile(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, bit-equal linear interpolation), plus min/max.
    For 100 TB use the approx_percentile sketch; the exact form is the
    correctness oracle."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )


@query(
    "wx_ntile",
    """
    SELECT o_orderkey, o_orderstatus,
           CAST(NTILE(4) OVER (PARTITION BY o_orderstatus
                               ORDER BY o_totalprice DESC, o_orderkey) AS INT)
             AS quartile
    FROM orders
    """,
)
def wx_ntile(spark, sf_dir):
    """NTILE quartiles per order status (partitioned window — no global
    single-partition sort)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey", "o_orderstatus", F.ntile(4).over(w).cast("int").alias("quartile")
    )


@query(
    "agg_pivot",
    """
    SELECT user_id,
      CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
      CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
      CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
      CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
      CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
    FROM events GROUP BY user_id
    """,
)
def agg_pivot(spark, sf_dir):
    """PIVOT — long→wide event-type counts per user (the reference's
    `expanded` 8-skill struct is this same shape, SURVEY.md J2 note). The
    explicit value list keeps it one aggregate pass — no distinct-values
    pre-scan."""
    ev = _t(spark, sf_dir, "events")
    kinds = ["click", "error", "purchase", "signup", "view"]
    out = ev.groupBy("user_id").pivot("event_type", kinds).count()
    # pivot leaves null where a user lacks a type; counts are 0 there
    for k in kinds:
        out = out.withColumn(k, F.coalesce(F.col(k), F.lit(0)))
    return out


@query(
    "wx_range_frame",
    """
    SELECT event_id, user_id,
      CAST(SUM(CAST(value AS DECIMAL(38,2))) OVER (
        PARTITION BY user_id ORDER BY epoch(ts)
        RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_1h
    FROM events
    """,
)
def wx_range_frame(spark, sf_dir):
    """RANGE-frame window — trailing 1-hour sum per user ordered by event
    time: a value-based frame (all rows within 3600s), not a row-count
    frame. Decimal sums keep it order-independent within the frame.

    Ordering key is FRACTIONAL epoch seconds (cast ts to double), matching
    DuckDB's epoch(); unix_timestamp() would truncate to whole seconds and
    make sub-second events in the same second frame peers — a data-
    dependent oracle divergence."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("double"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(38,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_1h"),
    )


@query(
    "agg_session_windows",
    """
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT CAST(MIN(ts) AS VARCHAR) AS session_start,
           CAST(MAX(ts) + INTERVAL 30 MINUTE AS VARCHAR) AS session_end,
           user_id, CAST(COUNT(*) AS BIGINT) AS n
    FROM g GROUP BY user_id, sid
    """,
)
def agg_session_windows(spark, sf_dir):
    """Sessionization — F.session_window with a 30-minute inactivity gap:
    events merge while each arrives within the gap of the session's end
    (session end = last event + gap). The oracle reconstructs identical
    sessions with the gaps-and-islands idiom (lag → boundary flag →
    running-sum session id). In batch this is one shuffle on user_id; the
    same expression runs under Structured Streaming for live sessions."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").cast("string").alias("session_start"),
            F.col("w.end").cast("string").alias("session_end"),
            "user_id",
            "n",
        )
    )


@query(
    "agg_corr_stats",
    """
    WITH s AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sy,
             CAST(SUM(CAST(value AS DECIMAL(38,2))
                      * CAST(json_extract(props, '$.k') AS INT)) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(value AS DECIMAL(38,2)) * CAST(value AS DECIMAL(38,2)))
                  AS DOUBLE) AS sxx,
             CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)
                      * CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS syy
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           (n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
             AS corr_vk
    FROM s
    """,
)
def agg_corr_stats(spark, sf_dir):
    """Correlation per group, decimal-sum formulation: built-in F.corr
    accumulates doubles in partition order (nondeterministic last bits), so
    the moments are summed EXACTLY (decimal / integer) and the Pearson
    formula applies once at the end — bit-stable across engines and runs,
    still one map-side-combinable aggregate pass."""
    ev = _t(spark, sf_dir, "events")
    x = F.col("value").cast("decimal(38,2)")
    y = F.get_json_object("props", "$.k").cast("int")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y.cast("long") * y.cast("long")).cast("long").alias("syy"),
    )
    return s.select(
        "event_type",
        "n",
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
            )
        ).alias("corr_vk"),
    )


@query(
    "wx_percent_rank",
    """
    SELECT o_orderkey,
           PERCENT_RANK() OVER w AS pr,
           CUME_DIST() OVER w AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def wx_percent_rank(spark, sf_dir):
    """PERCENT_RANK + CUME_DIST — relative-position statistics per status
    partition; exact rationals of rank and count, so bit-equal across
    engines given the deterministic tiebreaker."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


@query(
    "set_union",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    UNION
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_union(spark, sf_dir):
    """UNION (distinct) — completes the set-op triple next to u1's
    UNION ALL: union + distinct collapses duplicates in one hash shuffle."""
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("user_id")
    b = ev.where(F.col("event_type") == "error").select("user_id")
    return a.union(b).distinct()


@query(
    "c9_posexplode_tokens",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
    SELECT doc_id, CAST(g.i - 1 AS INT) AS pos, t[g.i] AS token
    FROM toks, UNNEST(generate_series(1, len(t))) g(i)
    WHERE doc_id < 50
    """,
)
def c9_posexplode_tokens(spark, sf_dir):
    """posexplode — lateral array expansion WITH ORDINALITY (position
    preserved), the building block under every tokenization/shingling
    stage; explicit here for §2 completeness."""
    d = catalog.table(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


@query(
    "agg_array_agg_sorted",
    """
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types
    FROM events GROUP BY user_id
    """,
)
def agg_array_agg_sorted(spark, sf_dir):
    """Deterministic array aggregation: collect_set's arrival order is
    nondeterministic, so the engine's discipline is sort_array before any
    serialization — emitted as a joined string so the comparison is
    order-exact."""
    ev = catalog.table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias("types")
    )


@query(
    "wx_rank_vs_dense_rank",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(RANK() OVER w AS INT) AS rnk,
           CAST(DENSE_RANK() OVER w AS INT) AS drnk
    FROM lineitem
    WHERE l_orderkey < 200
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_quantity DESC)
    """,
)
def wx_rank_vs_dense_rank(spark, sf_dir):
    """RANK vs DENSE_RANK under ties — the two tie-aware ranking semantics
    next to W4's row_number (which the reference's list-position rank
    required). Tie groups share a rank, so no tiebreaker column is needed
    for the rank VALUES to be deterministic."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 200)
    w = Window.partitionBy("l_orderkey").orderBy(F.desc("l_quantity"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.rank().over(w).cast("int").alias("rnk"),
        F.dense_rank().over(w).cast("int").alias("drnk"),
    )
