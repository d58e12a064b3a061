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
from ..functions import dates
from ..functions.num import davg, dsum
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


@query(
    "j10_interval_overlap",
    """
    WITH iv AS (
      SELECT o_custkey AS ck, o_orderkey AS ok,
             CAST(o_orderdate AS DATE) AS s,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 29 DAY AS DATE) AS e
      FROM orders
    )
    SELECT a.ck AS custkey, a.ok AS okey_a, b.ok AS okey_b,
           CAST(DATE_DIFF('day', GREATEST(a.s, b.s), LEAST(a.e, b.e)) + 1
                AS BIGINT) AS overlap_days
    FROM iv a JOIN iv b
      ON a.ck = b.ck AND a.ok < b.ok AND a.s <= b.e AND b.s <= a.e
    """,
)
def j10_interval_overlap(spark, sf_dir):
    """Interval-OVERLAP self-join — pairs of orders from the same customer
    whose 30-day activity windows intersect (interval × interval, unlike
    j8's point-in-band). Implemented with MONTH-BUCKET candidate
    generation: each interval explodes into the calendar months it covers
    (≤ 2 for a 30-day span), candidates equi-join on (custkey, month), and
    each surviving pair is emitted EXACTLY ONCE by keeping only the match
    in the overlap's own start month — no global distinct. That composite
    key is the 100 TB shape: a hot key's candidates are bounded by its
    per-month density, not its whole history, and with no equi-key at all
    the month bucket alone carries the join (a plain range-condition join
    would be a per-key nested loop). Overlap length is day arithmetic —
    integer-exact in both engines."""
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("ok"),
        F.to_date("o_orderdate").alias("s"),
    )
    o = o.withColumn("e", F.date_add("s", 29))
    mo = lambda c: F.year(c) * 12 + F.month(c)  # noqa: E731 — month index
    bucketed = o.withColumn("bucket", F.explode(F.sequence(mo(F.col("s")), mo(F.col("e")))))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    ovl_start = F.greatest(F.col("a.s"), F.col("b.s"))
    return (
        a.join(
            b,
            on=[
                F.col("a.ck") == F.col("b.ck"),
                F.col("a.bucket") == F.col("b.bucket"),
                F.col("a.ok") < F.col("b.ok"),
                F.col("a.s") <= F.col("b.e"),
                F.col("b.s") <= F.col("a.e"),
            ],
        )
        # one emission per pair: only the bucket holding the overlap start
        .where(F.col("a.bucket") == mo(ovl_start))
        .select(
            F.col("a.ck").alias("custkey"),
            F.col("a.ok").alias("okey_a"),
            F.col("b.ok").alias("okey_b"),
            (
                F.datediff(
                    F.least(F.col("a.e"), F.col("b.e")), ovl_start
                )
                + 1
            )
            .cast("long")
            .alias("overlap_days"),
        )
    )


@query(
    "j11_salted_skew_join",
    """
    WITH dim AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS type_total
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.user_id, e.event_type, d.type_total
    FROM events e JOIN dim d ON e.event_type = d.event_type
    """,
)
def j11_salted_skew_join(spark, sf_dir):
    """Skew-salted equi-join under the oracle (r7 verdict item 7): the
    events fact is EXTREMELY skewed on event_type (three values carry the
    whole table — the one-hot-key shape AQE's skew splitting cannot fix,
    because a single key's build bucket is indivisible), joined to a
    per-type dim through operators.joins.salted_join. The left side gets
    a deterministic hash-derived salt, the dim is replicated 16×, and the
    join key becomes (event_type, salt) — one hot key spreads over 16
    tasks. Salting is pure plan surgery: the result must be IDENTICAL to
    the unsalted join, which is exactly what the plain-SQL oracle pins;
    the salt fan-out itself is plan-gated in tests/test_skew.py."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    dim = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("type_total")
    )
    out = joins.salted_join(ev, dim, on="event_type", salt_buckets=16)
    return out.select("event_id", "user_id", "event_type", "type_total")


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


@query(
    "set_intersect_all",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT ALL
    SELECT user_id FROM events WHERE event_type = 'view'
    """,
)
def set_intersect_all(spark, sf_dir):
    """INTERSECT ALL — BAG semantics (DataFrame ``intersectAll``): each
    user survives min(click-count, view-count) times, not once. The
    multiset variants plan as a count-compare aggregate instead of the
    distinct variants' left-semi, so they carry their own entry."""
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("user_id")
    b = ev.where(F.col("event_type") == "view").select("user_id")
    return a.intersectAll(b)


@query(
    "set_except_all",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT ALL
    SELECT user_id FROM events WHERE event_type = 'error'
    """,
)
def set_except_all(spark, sf_dir):
    """EXCEPT ALL — multiset difference (DataFrame ``exceptAll``): a user
    with 5 clicks and 2 errors keeps 3 rows (the distinct EXCEPT would
    drop them entirely)."""
    ev = _t(spark, sf_dir, "events")
    a = ev.where(F.col("event_type") == "click").select("user_id")
    b = ev.where(F.col("event_type") == "error").select("user_id")
    return a.exceptAll(b)


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
    "dq_anomaly_mad",
    """
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, ABS(e.value - m.med) AS ad, m.med
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(ad, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           ANY_VALUE(d.med) AS med,
           ANY_VALUE(m.mad) AS mad,
           CAST(SUM(CASE WHEN d.ad > 3 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def dq_anomaly_mad(spark, sf_dir):
    """Median-absolute-deviation anomaly counts per group — the robust
    outlier gate beside dq_outlier_iqr (MAD tolerates 50% contamination
    where IQR fences break at 25%). Two exact-percentile passes (Spark
    ``percentile`` == DuckDB ``quantile_cont``, bit-equal interpolation —
    the agg_percentile parity) plus a counting aggregate, all shuffling on
    the same group key so AQE coalesces the exchanges; the medians travel
    back as a |groups|-row broadcast join, never a window over the fact
    table. At 100 TB the exact median swaps for the quantile-histogram
    sketch; this form is its correctness oracle."""
    ev = _t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), on="event_type").select(
        "event_type", "value", F.abs(F.col("value") - F.col("med")).alias("ad"), "med"
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), on="event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med").alias("med"),
            F.any_value("mad").alias("mad"),
            F.sum((F.col("ad") > 3 * F.col("mad")).cast("long")).alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "mix_diversity_gini",
    """
    WITH c AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY 1, 2
    ),
    t AS (
      SELECT lang, SUM(n) AS tn, SUM(n * n) AS sq FROM c GROUP BY 1
    )
    SELECT lang, CAST(tn AS BIGINT) AS n_docs,
           CAST(((tn * tn - sq) * 1000000) // (tn * tn) AS BIGINT) AS gini_fp
    FROM t
    """,
)
def mix_diversity_gini(spark, sf_dir):
    """Per-language source-mixture diversity as Gini impurity — the
    mixture-health metric a pretraining pipeline watches (gini → 0 means
    one source dominates a language's slice). Gini = 1 − Σp² is a RATIONAL
    of integer counts, so unlike entropy (logs are not correctly-rounded)
    it is hash-exact in 10^6 fixed point. Two re-aggregatable hash
    aggregates (source counts, then per-lang moments) — counts-only,
    re-aggregatable across shards, no data-sized join anywhere."""
    d = catalog.table(spark, sf_dir, "documents")
    c = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    # tn*tn*1e6 passes 2^63 once a language slice holds ~3e6 docs, so the
    # closing products run in DECIMAL(38,0) (the agg_ols_slope widening
    # discipline) to match the oracle's HUGEINT arithmetic at 100 TB.
    t = c.groupBy("lang").agg(
        F.sum("n").cast("decimal(38,0)").alias("tn"),
        F.sum(F.col("n") * F.col("n")).cast("decimal(38,0)").alias("sq"),
    )
    return t.select(
        "lang",
        F.col("tn").cast("long").alias("n_docs"),
        F.expr("((tn * tn - sq) * 1000000) div (tn * tn)")
        .cast("long")
        .alias("gini_fp"),
    )


@query(
    "wx_streak_lengths",
    """
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
      WHERE ts IS NOT NULL
    ),
    g AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
                        AS INT) AS grp
      FROM d
    ),
    s AS (
      SELECT user_id, MIN(day) AS streak_start,
             CAST(COUNT(*) AS BIGINT) AS streak_days
      FROM g GROUP BY user_id, grp
    ),
    r AS (
      SELECT user_id, CAST(streak_start AS VARCHAR) AS streak_start,
             streak_days,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY streak_days DESC, streak_start ASC)
               AS rn
      FROM s
    )
    SELECT user_id, streak_start, streak_days FROM r WHERE rn = 1
    """,
)
def wx_streak_lengths(spark, sf_dir):
    """Longest consecutive-day activity streak per user — the
    gaps-and-islands classic (day − row_number is constant within a run of
    consecutive days, so the island id costs ONE window pass, never a
    self-join or a recursive walk). Distinct active days → island id →
    per-island count → per-user arg-max with a (length desc, start asc)
    tiebreak. Every stage shuffles on user_id, so AQE collapses the
    exchanges into one layout; output is one row per user."""
    ev = _t(spark, sf_dir, "events")
    # NULL ts guard on BOTH sides: engines disagree on NULL sort position
    # (Spark ASC nulls-first vs DuckDB nulls-last) and NULL date arithmetic
    # would silently create a NULL island
    d = (
        ev.where(F.col("ts").isNotNull())
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    wg = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn(
        "grp", F.date_sub("day", F.row_number().over(wg))
    )
    s = g.groupBy("user_id", "grp").agg(
        F.min("day").alias("streak_start"),
        F.count(F.lit(1)).alias("streak_days"),
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.desc("streak_days"), F.asc("streak_start")
    )
    return (
        s.withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("streak_start").cast("string").alias("streak_start"),
            "streak_days",
        )
    )


@query(
    "wx_rolling_median",
    """
    WITH b AS (
      SELECT user_id, ts, event_id,
             GREATEST(CAST(FLOOR(value * 1000) AS BIGINT), 0) AS x_fp
      FROM events WHERE ts IS NOT NULL
    ),
    w AS (
      SELECT user_id, event_id, x_fp,
             list_sort(list(x_fp) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS BETWEEN 6 PRECEDING
                                        AND CURRENT ROW)) AS win
      FROM b
    )
    SELECT user_id, event_id, x_fp,
           win[(len(win) + 1) // 2] AS med_fp
    FROM w
    """,
)
def wx_rolling_median(spark, sf_dir):
    """Exact rolling median (lower median of the trailing 7-row frame per
    user) — the robust smoother beside wx_ewma: one spike can drag a mean
    or an EWMA, never the median. No native windowed-median exists in
    either engine, so the frame is collected as a bounded k-element array
    and sorted per row — O(k log k) per row with k a CONSTANT (7), which
    keeps it a pure column expression inside whole-stage codegen: one
    shuffle on user_id, no UDF, no second pass. The LOWER median
    (element (n+1) div 2 of the sorted frame) avoids even-count
    interpolation entirely, so the result is integer-exact cross-engine."""
    ev = _t(spark, sf_dir, "events")
    b = ev.where(F.col("ts").isNotNull()).select(
        "user_id",
        "ts",
        "event_id",
        F.greatest(F.floor(F.col("value") * 1000).cast("long"), F.lit(0)).alias(
            "x_fp"
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    win = F.sort_array(F.collect_list("x_fp").over(w))
    return b.select(
        "user_id",
        "event_id",
        "x_fp",
        F.element_at(win, ((F.size(win) + 1) / 2).cast("int")).alias("med_fp"),
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

    Ordering key is FRACTIONAL epoch seconds — zone-free epoch_us / 1e6 —
    matching DuckDB's epoch(); unix_timestamp() would truncate to whole
    seconds and make sub-second events in the same second frame peers — a
    data-dependent oracle divergence. The epoch comes from dates.epoch_us
    (field-based timestampdiff for NTZ), so the frame boundaries hold
    under ANY session zone — a DST zone would warp the old NTZ→TZ cast's
    offsets across a transition and shift frame membership."""
    ev = _t(spark, sf_dir, "events")
    epoch_s = dates.epoch_us(ev, "ts") / F.lit(1000000.0)
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_s)
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
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE  -- STRICT: Spark's session_window merges an event landing EXACTLY at the session end (inclusive boundary; probed empirically, pinned by the adversarial-corpus test)
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WHERE ts IS NOT NULL
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
    same expression runs under Structured Streaming for live sessions.
    Null timestamps are dropped EXPLICITLY on both sides (F.session_window
    drops them silently; the oracle's LAG would fold them into a session —
    the agg_bounce_rate discipline, r7 adversarial-corpus finding)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
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
    "agg_time_bucket_gapfill",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS sv
      FROM events GROUP BY 1, 2
    ),
    cal AS (
      SELECT event_type,
             CAST(UNNEST(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY))
                  AS DATE) AS day
      FROM daily GROUP BY event_type
    )
    SELECT c.event_type, CAST(c.day AS VARCHAR) AS day,
           COALESCE(d.n, 0) AS n_events,
           CAST(d.n IS NULL AS INT) AS gap_filled,
           last_value(d.sv IGNORE NULLS) OVER (
             PARTITION BY c.event_type ORDER BY c.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
    FROM cal c
    LEFT JOIN daily d ON c.event_type = d.event_type AND c.day = d.day
    """,
)
def agg_time_bucket_gapfill(spark, sf_dir):
    """Time-bucket rollup with gap filling + last-observation-carried-
    forward — the hypertable idiom (TimescaleDB's time_bucket_gapfill /
    locf) a timeseries warehouse needs that vanilla SQL lacks: days with no
    events still get a row (n_events = 0, gap_filled = 1) and the daily
    value sum carries forward across the gap. Expressed as pure DataFrame
    ops: daily decimal-sum rollup (one shuffle, |keys|×|days| groups), a
    per-key calendar densified with sequence()+explode — gap generation is
    KEY-LOCAL, sized by that key's own [min_day, max_day] span, never a
    global calendar cross-join — a left join back on the same
    (event_type, day) hash layout, and a bounded running `last(ignorenulls)`
    window per key. At 100 TB the dense output is |keys| × span-days —
    linear in keys, independent of event count — and every stage shuffles
    on the same key, so AQE coalesces the three exchanges into one layout.
    Leading days before a key's first non-null sum stay NULL in both
    engines (nothing to carry yet)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"), dsum("value").alias("sv")
    )
    cal = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("event_type", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cal.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            F.col("day").cast("string").alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.col("n").isNull().cast("int").alias("gap_filled"),
            F.last("sv", ignorenulls=True).over(w).alias("value_locf"),
        )
    )


@query(
    "agg_funnel_steps",
    """
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS is1,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is2,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is3
      FROM events
    ),
    s1 AS (
      SELECT *, MAX(is1) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS r1,
             COALESCE(MAX(is1) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS r1_prior
      FROM o
    ),
    s2 AS (
      SELECT *, MAX(CASE WHEN is2 = 1 AND r1_prior = 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS r2,
             COALESCE(MAX(CASE WHEN is2 = 1 AND r1_prior = 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS r2_prior
      FROM s1
    ),
    s3 AS (
      SELECT *, MAX(CASE WHEN is3 = 1 AND r2_prior = 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS r3
      FROM s2
    ),
    per_user AS (
      SELECT user_id, MAX(r1) AS f1, MAX(r2) AS f2, MAX(r3) AS f3 FROM s3
      GROUP BY user_id
    )
    SELECT step, users FROM (
      SELECT 1 AS ord, 'view' AS step, CAST(SUM(f1) AS BIGINT) AS users
      FROM per_user
      UNION ALL
      SELECT 2, 'view>click', CAST(SUM(f2) AS BIGINT) FROM per_user
      UNION ALL
      SELECT 3, 'view>click>purchase', CAST(SUM(f3) AS BIGINT) FROM per_user
    ) ORDER BY ord
    """,
)
def agg_funnel_steps(spark, sf_dir):
    """Ordered-event funnel — how many users progress view → click →
    purchase with each step STRICTLY after the previous one in the
    (ts, event_id) order (the unique-tiebreaker rule: same-timestamp rows
    resolve identically in both engines). Implemented as three stacked
    running-max windows over ONE per-user sort: r1 marks "a view has
    happened", a click converts only where the PRIOR-row running max
    already shows a view (frame … AND 1 PRECEDING — a click sharing a
    row-order position with its view does not count), and purchase
    likewise chains off r2. One shuffle on user_id; Spark executes all
    three levels in a single Window stage because partition key and sort
    order never change; the final per-user flags collapse in a tiny
    partial-aggregated reduction. At 100 TB funnels over billions of
    events are exactly this shape — never a self-join per step (the
    3-way join formulation is quadratic in step count and skew-fragile)."""
    ev = _t(spark, sf_dir, "events")
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prior = wseq.rowsBetween(Window.unboundedPreceding, -1)
    is1 = F.when(F.col("event_type") == "view", 1).otherwise(0)
    is2 = F.when(F.col("event_type") == "click", 1).otherwise(0)
    is3 = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    s1 = ev.select(
        "user_id",
        "ts",
        "event_id",
        is2.alias("is2"),
        is3.alias("is3"),
        F.max(is1).over(run).alias("r1"),
        F.coalesce(F.max(is1).over(prior), F.lit(0)).alias("r1_prior"),
    )
    hit2 = F.when((F.col("is2") == 1) & (F.col("r1_prior") == 1), 1).otherwise(0)
    s2 = s1.select(
        "user_id",
        "ts",
        "event_id",
        "is3",
        "r1",
        F.max(hit2).over(run).alias("r2"),
        F.coalesce(F.max(hit2).over(prior), F.lit(0)).alias("r2_prior"),
    )
    hit3 = F.when((F.col("is3") == 1) & (F.col("r2_prior") == 1), 1).otherwise(0)
    s3 = s2.select("user_id", "r1", "r2", F.max(hit3).over(run).alias("r3"))
    per_user = s3.groupBy("user_id").agg(
        F.max("r1").alias("f1"), F.max("r2").alias("f2"), F.max("r3").alias("f3")
    )
    steps = per_user.agg(
        F.sum("f1").alias("u1"), F.sum("f2").alias("u2"), F.sum("f3").alias("u3")
    )
    return steps.select(
        F.explode(
            F.array(
                F.struct(F.lit("view").alias("step"), F.col("u1").alias("users")),
                F.struct(
                    F.lit("view>click").alias("step"), F.col("u2").alias("users")
                ),
                F.struct(
                    F.lit("view>click>purchase").alias("step"),
                    F.col("u3").alias("users"),
                ),
            )
        ).alias("s")
    ).select(F.col("s.step").alias("step"), F.col("s.users").alias("users"))


@query(
    "agg_retention_cohorts",
    """
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    cohorts AS (
      SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
    )
    SELECT CAST(c.cohort_day AS VARCHAR) AS cohort_day,
           CAST(a.day - c.cohort_day AS INT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS active_users
    FROM activity a JOIN cohorts c USING (user_id)
    GROUP BY 1, 2
    """,
)
def agg_retention_cohorts(spark, sf_dir):
    """Cohort retention matrix — users grouped by their first-active day,
    counted on each later day they return (the product-analytics staple).
    Shape: one distinct-collapse of (user, day) activity, a per-user MIN
    reduction, a self-enrichment join on user_id (same hash layout — AQE
    plans it shuffle-free after the groupBys), and the final
    (cohort, offset) count. Every stage keys on user_id until the last
    small aggregate, so a 100 TB event stream reduces immediately to
    |users|×|active-days| and then to a |days|² matrix — the output is
    bounded by the calendar, not the data."""
    ev = _t(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).dropDuplicates(["user_id", "day"])
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.datediff("day", "cohort_day").cast("int").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@query(
    "agg_time_bucket_interp",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(38,2))) * 100 AS BIGINT) AS svc
      FROM events GROUP BY 1, 2
    ),
    cal AS (
      SELECT event_type,
             CAST(UNNEST(generate_series(MIN(day), MAX(day), INTERVAL 1 DAY))
                  AS DATE) AS day
      FROM daily GROUP BY event_type
    ),
    j AS (
      SELECT c.event_type, c.day, COALESCE(d.n, 0) AS n_events, d.svc,
             last_value(d.svc IGNORE NULLS) OVER wp AS pc,
             last_value(CASE WHEN d.svc IS NOT NULL THEN c.day END IGNORE NULLS)
               OVER wp AS pd,
             first_value(d.svc IGNORE NULLS) OVER wn AS nc,
             first_value(CASE WHEN d.svc IS NOT NULL THEN c.day END IGNORE NULLS)
               OVER wn AS nd
      FROM cal c
      LEFT JOIN daily d ON c.event_type = d.event_type AND c.day = d.day
      WINDOW wp AS (PARTITION BY c.event_type ORDER BY c.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY c.event_type ORDER BY c.day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, CAST(day AS VARCHAR) AS day, n_events,
           CASE
             WHEN svc IS NOT NULL THEN CAST(svc AS DOUBLE) / 100.0
             WHEN pc IS NOT NULL AND nc IS NOT NULL THEN
               CAST(pc * (nd - day) + nc * (day - pd) AS DOUBLE)
                 / (CAST(nd - pd AS DOUBLE) * 100.0)
             ELSE NULL
           END AS value_interp
    FROM j
    """,
)
def agg_time_bucket_interp(spark, sf_dir):
    """Gap-fill with LINEAR INTERPOLATION — agg_time_bucket_gapfill's
    locf sibling (TimescaleDB's ``interpolate()``): a missing day's value
    is the time-weighted blend of the nearest observed days on either
    side; leading/trailing gaps (no bracketing observation) stay NULL.
    Determinism discipline: daily sums stay exact integers (decimal cents)
    through BOTH windows, and the single blend division runs in IEEE
    double over those exact integers — one correctly-rounded operation,
    bit-identical cross-engine (the corr-stats rule: never SUM in float,
    but one float division of exact operands is safe). Days whose events
    are all NULL-valued count as UNOBSERVED (the sum is NULL), matching
    the oracle's IGNORE NULLS carry on both sides. Same 100 TB shape as
    the locf form: key-local calendars, every stage on one
    (event_type, day) hash layout, forward and backward frames sharing a
    single per-key sort."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.col("value").cast("decimal(38,2)")) * 100)
        .cast("long")
        .alias("svc"),
    )
    cal = (
        daily.groupBy("event_type")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("event_type", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("svc").isNotNull(), F.col("day"))
    j = (
        cal.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            "svc",
            F.last("svc", ignorenulls=True).over(wp).alias("pc"),
            F.last(obs_day, ignorenulls=True).over(wp).alias("pd"),
            F.first("svc", ignorenulls=True).over(wn).alias("nc"),
            F.first(obs_day, ignorenulls=True).over(wn).alias("nd"),
        )
    )
    blend = (
        F.col("pc") * F.datediff("nd", "day") + F.col("nc") * F.datediff("day", "pd")
    ).cast("double") / (F.datediff("nd", "pd").cast("double") * 100.0)
    return j.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "n_events",
        F.when(F.col("svc").isNotNull(), F.col("svc").cast("double") / 100.0)
        .when(F.col("pc").isNotNull() & F.col("nc").isNotNull(), blend)
        .alias("value_interp"),
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
           -- NULLIF: a zero-variance group (single row, constant values)
           -- has no defined correlation — NULL in both engines, matching
           -- the plan's try_divide (Spark ANSI raises on /0 otherwise)
           (n * sxy - sx * sy)
             / NULLIF(sqrt(n * sxx - sx * sx)
                      * sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 0)
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
        # try_divide: a zero-variance group (single row, constant values)
        # must yield NULL, not an ANSI DIVIDE_BY_ZERO — found by the
        # adversarial-corpus test, unreachable on the fixture
        F.try_divide(
            F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"),
            F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * F.sqrt(
                (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
            ),
        ).alias("corr_vk"),
    )


@query(
    "agg_ols_slope",
    """
    WITH b AS (
      SELECT event_type,
             CAST(DATE_DIFF('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS x,
             CAST(FLOOR(value * 1000) AS BIGINT) AS y
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(COUNT(*) AS HUGEINT) AS n,
             CAST(SUM(x) AS HUGEINT) AS sx,
             CAST(SUM(y) AS HUGEINT) AS sy,
             CAST(SUM(x * y) AS HUGEINT) AS sxy,
             CAST(SUM(x * x) AS HUGEINT) AS sxx
      FROM b GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           CAST(sy * sxx - sx * sxy AS BIGINT) AS intercept_num
    FROM s
    """,
)
def agg_ols_slope(spark, sf_dir):
    """Per-group least-squares trend (value vs day) as EXACT RATIONALS:
    slope = slope_num/slope_den and intercept = intercept_num/slope_den are
    returned as integer numerator/denominator instead of a lossy double —
    the trend-detection staple (is this metric drifting?) made hash-exact.
    One map-side-combinable aggregate pass over integer moments (x = day
    index, y = value in 1e3 fixed point); the closing products are widened
    to DECIMAL(38,0) (Spark) / HUGEINT (oracle) — the quality_bigram_lm
    overflow discipline, since n·Σxy overflows BIGINT long before the
    moments themselves do at 100 TB."""
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("x"),
        F.floor(F.col("value") * 1000).cast("long").alias("y"),
    )
    dec = "decimal(38,0)"
    s = b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum("x").cast(dec).alias("sx"),
        F.sum("y").cast(dec).alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast(dec).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast(dec).alias("sxx"),
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        .cast("long")
        .alias("slope_num"),
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        .cast("long")
        .alias("slope_den"),
        (F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy"))
        .cast("long")
        .alias("intercept_num"),
    )


@query(
    "dq_uniqueness",
    """
    WITH k AS (
      SELECT user_id, ts, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_keys,
           CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS dup_rows,
           CAST(MAX(n) AS BIGINT) AS worst_key_rows,
           CAST((SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) * 1000000)
                // COUNT(*) AS BIGINT) AS dup_key_fp
    FROM k
    """,
)
def dq_uniqueness(spark, sf_dir):
    """Candidate-key uniqueness audit — would (user_id, ts) serve as a
    key? Reports total keys, violating keys, rows trapped in violations,
    the worst key's multiplicity, and the violation rate in fixed point —
    the promotion gate run before declaring any natural key or building a
    MERGE on it. One map-side-combinable count per key then a scalar
    reduce; at 100 TB this is the cheapest full-table audit there is (no
    join, no sort, one shuffle)."""
    ev = _t(spark, sf_dir, "events")
    k = ev.groupBy("user_id", "ts").agg(F.count(F.lit(1)).alias("n"))
    return k.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum((F.col("n") > 1).cast("long")).alias("dup_keys"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).alias("dup_rows"),
        F.max("n").alias("worst_key_rows"),
        F.expr("(sum(cast(n > 1 as long)) * 1000000) div count(1)").alias(
            "dup_key_fp"
        ),
    )


@query(
    "agg_bounce_rate",
    """
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    ),
    s AS (
      SELECT user_id, sid, CAST(CAST(MIN(ts) AS DATE) AS VARCHAR) AS day,
             COUNT(*) AS n
      FROM g GROUP BY 1, 2
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
           CAST((SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000) // COUNT(*)
                AS BIGINT) AS bounce_fp
    FROM s GROUP BY day
    """,
)
def agg_bounce_rate(spark, sf_dir):
    """Daily bounce rate — the share of 30-minute-gap sessions containing
    exactly one event, keyed by the session's START day: the engagement
    metric every product dashboard leads with. Sessionizes with
    F.session_window (one shuffle on user_id — the same state shape the
    streaming variant runs live), then one day-keyed aggregate; the rate
    is integer fixed point (×10^6 floor), so the metric — not just the
    counts — is hash-exact. The oracle reconstructs identical sessions
    with the gaps-and-islands idiom. Null timestamps are dropped
    EXPLICITLY on both sides (F.session_window would drop them silently;
    the oracle's LAG would fold them into a session) so the drop rule is
    stated, not incidental."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    s = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.to_date(F.col("w.start")).cast("string").alias("day"),
            "n",
        )
    )
    return s.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("n") == 1).cast("long")).alias("n_bounces"),
        F.expr(
            "(sum(cast(n = 1 as long)) * 1000000) div count(1)"
        ).alias("bounce_fp"),
    )


@query(
    "agg_markov_transitions",
    """
    WITH s AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    t AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM s WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT from_type, SUM(n) AS tn FROM t GROUP BY 1
    )
    SELECT t.from_type, t.to_type, t.n,
           CAST((t.n * 1000000) // tot.tn AS BIGINT) AS p_fp
    FROM t JOIN tot USING (from_type)
    """,
)
def agg_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences —
    the behavioral-model staple (what follows a view? how often does an
    error precede churn?). The successor is one LEAD window under the
    (ts, event_id) total order (one shuffle on user_id), the matrix is a
    hash aggregate over (from, to), and the row-conditional probability is
    integer fixed point (×10^6, floor) so the distribution — not just the
    counts — is hash-exact. |event types|² is tiny at any corpus scale, so
    the per-from totals could equally broadcast; the LEAD pass is the only
    data-sized stage."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    t = s.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = t.groupBy("from_type").agg(F.sum("n").alias("tn"))
    return t.join(tot, on="from_type").select(
        "from_type",
        "to_type",
        "n",
        F.expr("(n * 1000000) div tn").cast("long").alias("p_fp"),
    )


@query(
    "agg_mode",
    """
    WITH c AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY user_id, event_type
    ),
    r AS (
      SELECT user_id, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type ASC) AS rn
      FROM c
    )
    SELECT user_id, event_type AS mode_event, n FROM r WHERE rn = 1
    """,
)
def agg_mode(spark, sf_dir):
    """Deterministic per-group mode: most frequent event type per user,
    ties broken lexicographically (a bare MODE() is engine-defined under
    ties — unusable against an oracle). Count pass + rank pass share the
    user_id partitioning, so the second window reuses the first shuffle."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("mode_event"), "n")
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


# ---------------------------------------------------------------------------
# TPC-H-shaped subquery / decorrelation surface (q4/q7/q12/q13/q14/q19/q21/q22
# adapted to the reduced testdata schema — no partsupp, no comment/phone/
# shipmode columns; each keeps the original query's PLAN SHAPE: semi-join
# decorrelation, OR-of-ANDs pushdown, outer-join count distribution, scalar
# subquery broadcast, nested-EXISTS→aggregation rewrite)
# ---------------------------------------------------------------------------


@query(
    "tpch_q4_order_priority",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark, sf_dir):
    """TPC-H Q4-shaped: correlated EXISTS decorrelated to a LEFT SEMI join
    (equi on orderkey + the date comparison as a residual predicate), then
    one hash aggregate. The semi join never multiplies rows, so no distinct
    pass is needed — the shape Catalyst produces for EXISTS itself."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sem = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@query(
    "tpch_q7_volume_shipping",
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INT) AS l_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7-shaped: bilateral trade volume between two nations by year.
    The same dimension table (nation) joins twice under different roles —
    supplier's nation and customer's nation — with a disjunctive cross-role
    predicate that only prunes AFTER both joins. All dims broadcast; the
    fact side shuffles once for the final aggregate."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("n1_key"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("n2_key"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return j.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("int").alias("l_year"),
    ).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue")
    )


@query(
    "tpch_q12_priority_class",
    """
    SELECT l_returnflag,
      CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def tpch_q12_priority_class(spark, sf_dir):
    """TPC-H Q12-shaped: conditional-count aggregate over a fact-fact join —
    the filter lives on lineitem (pushed to the scan), the CASE dissects by
    the joined order's priority. One shuffle join + one hash aggregate."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13-shaped: order-count distribution over ALL customers — the
    LEFT join keeps order-less customers (c_count = 0 bucket), with the
    filter in the JOIN CONDITION, not a WHERE (a WHERE would silently turn
    the outer join inner). COUNT(o_orderkey) counts non-null only. Two hash
    aggregates, the second over a tiny distinct-count domain."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "tpch_q14_promo_revenue",
    """
    SELECT
      100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
                   ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
        / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
               AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14-shaped: promo revenue share — broadcast the part dimension,
    conditional decimal sum over the month's lineitems, single scalar out.
    The ratio divides two exact decimals cast to double, so it is bit-stable
    despite being a float division."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(38,6)"
    )
    zero = F.lit(0).cast("decimal(38,6)")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    return j.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", disc).otherwise(zero)).cast(
                "double"
            )
            / F.sum(disc).cast("double")
        ).alias("promo_revenue")
    )


@query(
    "tpch_q19_disjunctive_pred",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 20 AND l_quantity <= 30)
    GROUP BY ()
    """,
)
def tpch_q19_disjunctive_pred(spark, sf_dir):
    """TPC-H Q19-shaped: OR-of-ANDs spanning both join sides. Catalyst
    extracts the common join key and pushes the per-side implications
    (p_brand IN (...), l_quantity <= 30) below the join as derived filters —
    the disjunction itself evaluates as the join residual. Part broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & sz.between(1, 5) & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & sz.between(1, 10) & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#24") & sz.between(1, 15) & (q >= 20) & (q <= 30))
    )
    return j.where(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "tpch_q21_waiting_supplier",
    """
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND s_nationkey = n_nationkey AND n_name = 'NATION_1'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
)
def tpch_q21_waiting_supplier(spark, sf_dir):
    """TPC-H Q21-shaped (late = shipped >60 days after order date): the
    sole-late-supplier query. The EXISTS / NOT EXISTS pair is rewritten as
    ONE per-order aggregation — count distinct suppliers and distinct LATE
    suppliers per order, keep orders with >1 supplier but exactly 1 late
    one — then late rows join back. Two passes over the joined fact instead
    of three correlated subqueries; at 100 TB the rewrite shuffles the fact
    twice on the same key (one exchange reused) vs. three semi/anti joins."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    lo = li.join(o, li["l_orderkey"] == o["o_orderkey"]).withColumn(
        "late", F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    sole_late = per_order.where((F.col("n_supp") > 1) & (F.col("n_late") == 1)).select(
        "l_orderkey"
    )
    waiting = lo.where(F.col("late")).join(sole_late, "l_orderkey")
    return (
        waiting.join(F.broadcast(s), waiting["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "tpch_q22_sales_opportunity",
    """
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)
      AND c_acctbal > (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE)
                 / COUNT(c_acctbal)
        FROM customer
        WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 2, 3, 4, 5, 6, 7))
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    """,
)
def tpch_q22_sales_opportunity(spark, sf_dir):
    """TPC-H Q22-shaped (nationkey stands in for the phone country code;
    "never placed an URGENT order" replaces "never ordered", which is vacuous
    in this testdata — every customer has orders): above-average-balance
    customers with untapped urgency. The scalar AVG subquery becomes a 1-row
    broadcast cross join (decimal-exact average, so the > comparison is
    bit-identical to the oracle); the NOT EXISTS is a LEFT ANTI join — no
    correlated execution anywhere."""
    nations = [1, 2, 3, 4, 5, 6, 7]
    c = _t(spark, sf_dir, "customer").where(F.col("c_nationkey").isin(nations))
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("avg_bal")
    )
    cand = (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
    )
    return cand.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum("c_acctbal").alias("totacctbal"),
    )


@query(
    "tpch_q8_market_share",
    """
    WITH flat AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) AS volume,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = n1.n_regionkey
      JOIN nation n2 ON n2.n_nationkey = s_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_0' THEN volume
                         ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share
    FROM flat GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8-shaped: NATION_0 suppliers' share of AMERICA's STANDARD-part
    order volume per year. Plan shape: ONE big-big shuffle (lineitem ⋈
    orders on the order key); part / supplier / customer / both nation roles
    / region all broadcast — at 100 TB the fact-fact join is the only data
    movement, and the year-grouped ratio is two decimal sums divided once in
    double (bit-stable, q14 discipline)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD").select("p_partkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA").select(
        "r_regionkey"
    )
    n1 = n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).select(
        F.col("n_nationkey").alias("c_nkey")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
    zero = F.lit(0).cast("decimal(38,6)")
    flat = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), c["c_nationkey"] == F.col("c_nkey"))
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("s_nkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    return flat.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_0", F.col("volume")).otherwise(
                    zero
                )
            ).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@query(
    "tpch_q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
               AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15-shaped: the quarter's top-revenue supplier(s). The scalar
    MAX subquery becomes a 1-row broadcast cross join against the SAME
    persisted revenue relation (scanned once, consumed twice); the equality
    compares EXACT DECIMALS — comparing after a double cast could fake or
    miss ties, the classic Q15 trap."""
    from pyspark import StorageLevel

    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    # scale 6, not 2: the double product sits on .005
                    # boundaries often enough that HALF_UP (Spark) vs
                    # round-half-even (DuckDB) drifts the scale-2 sum by
                    # cents at sf0.1; at scale 6 boundary hits vanish
                    "decimal(38,6)"
                )
            ).alias("total_rev")
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    top = rev.agg(F.max("total_rev").alias("max_rev"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    out = (
        rev.crossJoin(F.broadcast(top))
        .where(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )
    # tiny result (the tied top suppliers): materialize, release the cache
    out = out.localCheckpoint(eager=True)
    rev.unpersist()
    return out


@query(
    "tpch_q17_small_quantity_revenue",
    """
    WITH pq AS (
      SELECT l_partkey AS agg_pkey,
             SUM(CAST(l_quantity AS DECIMAL(38,2))) AS sum_qty,
             COUNT(l_quantity) AS cnt_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pq ON agg_pkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND CAST(l_quantity AS DECIMAL(38,2)) * 5 * cnt_qty < sum_qty
    """,
)
def tpch_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17-shaped: revenue lost to sub-20%-of-average-quantity orders
    of one brand. The correlated AVG subquery becomes one per-part
    aggregate joined back to lineitem (both sides partitioned by the part
    key — Catalyst reuses the exchange). The 0.2·avg comparison is CROSS-
    MULTIPLIED into exact integers/decimals (5·qty·cnt < sum) — an actual
    decimal division would round differently in each engine and flip
    boundary rows."""
    # keyed spread (r11): the per-part aggregate AND the probe join both
    # consume lineitem hashed by l_partkey — one reusable exchange, and the
    # single-split local scan no longer serializes the decimal partial agg
    # onto one core; no-op at real scale (guide §2.4)
    li = catalog.spread(_t(spark, sf_dir, "lineitem"), key="l_partkey")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1").select(
        "p_partkey"
    )
    qd = F.col("l_quantity").cast("decimal(38,2)")
    pq = li.groupBy(F.col("l_partkey").alias("agg_pkey")).agg(
        F.sum(qd).alias("sum_qty"), F.count("l_quantity").alias("cnt_qty")
    )
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(pq, li["l_partkey"] == pq["agg_pkey"])
        .where(qd * 5 * F.col("cnt_qty") < F.col("sum_qty"))
    )
    return j.agg(
        (dsum("l_extendedprice") / F.lit(7.0)).cast("double").alias("avg_yearly")
    )


@query(
    "k5_row_merge",
    """
    WITH src AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice * 2 AS o_totalprice, o_orderpriority
      FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT o_orderkey + 10000000, o_custkey, o_orderstatus,
             o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey < 100
    ),
    t AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
                 o_orderpriority FROM orders)
    SELECT
      CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderkey
           ELSE t.o_orderkey END AS o_orderkey,
      CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey
           ELSE t.o_custkey END AS o_custkey,
      CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderstatus
           ELSE t.o_orderstatus END AS o_orderstatus,
      CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
           ELSE t.o_totalprice END AS o_totalprice,
      CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_orderpriority
           ELSE t.o_orderpriority END AS o_orderpriority
    FROM t FULL OUTER JOIN src s ON t.o_orderkey = s.o_orderkey
    WHERE NOT (s.o_orderkey IS NOT NULL AND t.o_orderkey IS NOT NULL
               AND s.o_totalprice < 1000)
    """,
)
def k5_row_merge(spark, sf_dir):
    """Row-level MERGE semantics (sinks.merge_rows — the Delta-less MERGE
    INTO): urgent orders arrive as corrections (source wins), re-keyed
    clones arrive as inserts, cheap corrections are deleted on match,
    untouched orders survive. One full-outer join on the key; the oracle is
    an independent CASE-WHEN formulation of the same contract."""
    from ..sources import sinks

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority",
    )
    corrections = o.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey",
        "o_custkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
        "o_orderpriority",
    )
    inserts = o.where(F.col("o_orderkey") < 100).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderpriority",
    )
    src = corrections.unionByName(inserts)
    return sinks.merge_rows(
        o, src, keys=("o_orderkey",), delete_condition=F.col("s.o_totalprice") < 1000
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


@query(
    "scd2_intervals",
    """
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER w IS NULL
                       OR LAG(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
      SELECT user_id, ts, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM o
    )
    SELECT user_id, event_type,
           CAST(MIN(ts) AS VARCHAR) AS valid_from,
           CAST(MAX(ts) AS VARCHAR) AS valid_to,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM g GROUP BY user_id, event_type, grp
    """,
)
def scd2_intervals(spark, sf_dir):
    """SCD-type-2 history compression (gaps-and-islands on VALUE change,
    not time gap — the complement of agg_session_windows): consecutive
    equal event_type runs per user collapse into [valid_from, valid_to]
    interval rows. Both windows order by (ts, event_id) — the unique
    tiebreaker keeps run boundaries deterministic under equal timestamps.
    One user_id-partitioned shuffle; no global window."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(w)
    chg = F.when(prev.isNull() | (prev != F.col("event_type")), 1).otherwise(0)
    g = ev.select(
        "user_id", "ts", "event_id", "event_type", chg.alias("chg")
    ).withColumn(
        "grp",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        g.groupBy("user_id", "event_type", "grp")
        .agg(
            F.min("ts").cast("string").alias("valid_from"),
            F.max("ts").cast("string").alias("valid_to"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "event_type", "valid_from", "valid_to", "n_events")
    )


@query(
    "wx_last_nonnull",
    """
    SELECT event_id, user_id,
           LAST_VALUE(CASE WHEN event_type = 'click' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_click_value
    FROM events
    """,
)
def wx_last_nonnull(spark, sf_dir):
    """Forward-fill via LAST_VALUE … IGNORE NULLS: carry each user's most
    recent click value onto every subsequent event — the standard
    last-observation-carried-forward idiom for sparse signals. A plain
    column pick (no float aggregation), so values are engine-exact; the
    (ts, event_id) order keys keep the carried value deterministic."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    v = F.when(F.col("event_type") == "click", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.last(v, ignorenulls=True).over(w).alias("last_click_value"),
    )


def _ewma_oracle() -> str:
    from ..operators.windows import EWMA_DEN, EWMA_NUM

    return f"""
    WITH RECURSIVE seq AS (
      SELECT user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS rn,
             GREATEST(CAST(FLOOR(value * 1000) AS BIGINT), 0) AS x_fp
      FROM events
    ),
    rec(user_id, rn, x_fp, ewma_fp) AS (
      SELECT user_id, rn, x_fp, x_fp FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.user_id, s.rn, s.x_fp,
             ({EWMA_NUM} * s.x_fp + {EWMA_DEN - EWMA_NUM} * r.ewma_fp)
               // {EWMA_DEN}
      FROM rec r JOIN seq s ON s.user_id = r.user_id AND s.rn = r.rn + 1
    )
    SELECT user_id, rn, x_fp, ewma_fp FROM rec
    """


@query("wx_ewma", _ewma_oracle())
def wx_ewma(spark, sf_dir):
    """Per-user EWMA of the event value as a fixed-point INTEGER fold
    (alpha = 1/4): v_1 = x_1, v_t = (x_t + 3·v_{t−1}) div 4 over the
    (ts, event_id) total order — the stateful smoother every metrics
    pipeline needs that no window expression can express (the floor inside
    each step makes the recurrence non-linear, so there is no closed-form
    frame). Runs as one Arrow batch per user (operators.windows.ewma_int);
    keys parallelize, per-key history is the only sequential dimension.
    Values are floored to a non-negative 1e3 fixed-point domain ONCE on
    both sides, so the fold is bit-identical across engines; the oracle is
    the same recurrence as a recursive-CTE join on (user_id, rn)."""
    from ..operators import windows as W

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        F.greatest(F.floor(F.col("value") * 1000).cast("long"), F.lit(0)).alias(
            "x_fp"
        ),
    )
    return W.ewma_int(ev, "user_id", ["ts", "event_id"], "x_fp")


@query(
    "reshape_unpivot",
    """
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_tax', l_tax
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def reshape_unpivot(spark, sf_dir):
    """UNPIVOT / melt — wide measures to long (measure, val) rows, the
    inverse of agg_pivot. Spark's native unpivot is a narrow generator (no
    shuffle, no union of re-scans — ONE pass emitting 4 rows per input);
    the oracle's UNION ALL shows the relational equivalent."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        )
    )
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )


@query(
    "j9_not_in_null_aware",
    """
    SELECT
      (SELECT COUNT(*) FROM orders
       WHERE o_custkey NOT IN
             (SELECT NULLIF(c_custkey, 7) FROM customer WHERE c_custkey < 100))
        AS n_not_in,
      (SELECT COUNT(*) FROM orders o
       WHERE NOT EXISTS
             (SELECT 1 FROM customer c
              WHERE c_custkey < 100 AND NULLIF(c_custkey, 7) = o.o_custkey))
        AS n_not_exists
    """,
)
def j9_not_in_null_aware(spark, sf_dir):
    """NOT IN vs NOT EXISTS under NULLs — the classic three-valued-logic
    trap: one NULL in the NOT IN list makes every membership test UNKNOWN
    (zero rows survive), while NOT EXISTS ignores the NULL row. Spark plans
    the NOT IN as a null-aware anti join (broadcast) — both semantics in
    one row so the divergence is visible, and the engine is proven to
    implement the standard, not the intuitive, behavior."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM v_orders
           WHERE o_custkey NOT IN
                 (SELECT NULLIF(c_custkey, 7) FROM v_customer
                  WHERE c_custkey < 100)) AS n_not_in,
          (SELECT COUNT(*) FROM v_orders o
           WHERE NOT EXISTS
                 (SELECT 1 FROM v_customer c
                  WHERE c_custkey < 100
                    AND NULLIF(c_custkey, 7) = o.o_custkey)) AS n_not_exists
        """
    )


@query(
    "dq_profile_events",
    """
    SELECT
      CAST(COUNT(*) AS BIGINT) AS n_rows,
      CAST(COUNT(*) - COUNT(user_id) AS BIGINT) AS null_user_id,
      CAST(COUNT(*) - COUNT(value) AS BIGINT) AS null_value,
      CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
      CAST(COUNT(DISTINCT event_type) AS BIGINT) AS distinct_types,
      CAST(MIN(value) AS DOUBLE) AS min_value,
      CAST(MAX(value) AS DOUBLE) AS max_value,
      CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative,
      CAST(MIN(ts) AS VARCHAR) AS min_ts,
      CAST(MAX(ts) AS VARCHAR) AS max_ts
    FROM events
    """,
)
def dq_profile_events(spark, sf_dir):
    """Data-quality profile — the gate a pipeline runs before promoting a
    partition: row count, per-column null counts, distinct cardinalities,
    value ranges, constraint-violation counts, time bounds. One pass, all
    aggregates map-side-combinable except the two exact count-distincts
    (which Spark plans as expand + two-stage agg — still one shuffle
    family, no collect). min/max are order-free so doubles are safe."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count("user_id")).alias("null_user_id"),
        (F.count(F.lit(1)) - F.count("value")).alias("null_value"),
        F.count_distinct("user_id").alias("distinct_users"),
        F.count_distinct("event_type").alias("distinct_types"),
        F.min("value").cast("double").alias("min_value"),
        F.max("value").cast("double").alias("max_value"),
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0))
        .cast("long")
        .alias("n_negative"),
        F.min("ts").cast("string").alias("min_ts"),
        F.max("ts").cast("string").alias("max_ts"),
    )


@query(
    "dq_drift_histogram",
    """
    SELECT event_type,
           CAST(FLOOR(value / 50) AS INT) AS bucket,
           CAST(COUNT(CASE WHEN ts <  TIMESTAMP '2024-01-16' THEN 1 END)
                AS BIGINT) AS n_a,
           CAST(COUNT(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN 1 END)
                AS BIGINT) AS n_b
    FROM events
    WHERE value IS NOT NULL
    GROUP BY event_type, CAST(FLOOR(value / 50) AS INT)
    """,
)
def dq_drift_histogram(spark, sf_dir):
    """Two-period drift histogram — the load-over-load distribution monitor
    a promotion gate runs beside the profile: per (event_type, fixed-width
    value bucket), exact row counts for the first vs second half of the
    month, in ONE aggregation pass over one scan (conditional counts, not
    two filtered subqueries). Counts stay integers so the comparison is
    exact; the divergence statistic (PSI) is float-territory and is
    computed downstream from these counts — a property test pins PSI ≈ 0
    between two halves of an identically-distributed stream and PSI > 0
    against a shifted synthetic batch. Fixed-width buckets (not quantiles)
    keep the histogram mergeable across partitions and days at 100 TB."""
    ev = _t(spark, sf_dir, "events").where(F.col("value").isNotNull())
    period_b = F.col("ts") >= F.lit("2024-01-16").cast("timestamp")
    return ev.groupBy(
        "event_type", F.floor(F.col("value") / 50).cast("int").alias("bucket")
    ).agg(
        F.count(F.when(~period_b, 1)).cast("long").alias("n_a"),
        F.count(F.when(period_b, 1)).cast("long").alias("n_b"),
    )


@query(
    "sql_daily_rollup",
    """
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def sql_daily_rollup(spark, sf_dir):
    """The pure-SQL front-end, exercised end-to-end: register the catalog
    as temp views and run a textual Spark SQL query — same Catalyst plan
    as the DataFrame form, proving the engine's second user-facing API
    surface (ad-hoc SQL over the same tables) produces oracle-identical
    results. Every other entry uses the DataFrame API; this one guards the
    spark.sql path + view registration."""
    catalog.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(to_date(ts) AS STRING) AS day, event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
        """
    )


@query(
    "sql_lateral_topk",
    """
    SELECT t.event_type, l.event_id, l.x_fp, l.rn
    FROM (SELECT DISTINCT event_type FROM events) t,
    LATERAL (
      SELECT * FROM (
        SELECT event_id, CAST(FLOOR(value * 1000) AS BIGINT) AS x_fp,
               ROW_NUMBER() OVER (ORDER BY value DESC, event_id ASC) AS rn
        FROM events e
        WHERE e.event_type = t.event_type
      ) r WHERE r.rn <= 3
    ) l
    """,
)
def sql_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery — per event type, its top-3 events by
    value through the textual SQL front-end (Spark 4 lateral correlated
    subqueries): the 'for each row of t, run this parameterized query'
    surface analysts reach for before learning window functions. Catalyst
    DECORRELATES the lateral into the same join+window plan the wx_* rank
    entries state directly — which is the point of the entry: the naive
    per-group re-scan formulation still executes set-at-a-time, verified
    by the same oracle shape running in DuckDB's lateral binder. The
    top-3 is taken by filtering the ROW_NUMBER, not ORDER BY…LIMIT: the
    decorrelator preserves a lateral's inner ORDER BY as a GLOBAL range
    sort (caught by the universal no-global-sort plan gate), while the
    rank filter decorrelates into a properly partitioned window."""
    catalog.register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT t.event_type, l.event_id, l.x_fp, l.rn
        FROM (SELECT DISTINCT event_type FROM events) t,
        LATERAL (
          SELECT * FROM (
            SELECT event_id, CAST(FLOOR(value * 1000) AS BIGINT) AS x_fp,
                   ROW_NUMBER() OVER (ORDER BY value DESC, event_id ASC) AS rn
            FROM events e
            WHERE e.event_type = t.event_type
          ) r WHERE r.rn <= 3
        ) l
        """
    )


@query(
    "sql_recursive_rollup",
    """
    WITH RECURSIVE du AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    ),
    chain(node, user_id) AS (
      SELECT user_id AS node, user_id FROM du
      UNION ALL
      SELECT node // 2, user_id FROM chain WHERE node > 0
    )
    SELECT c.node, CAST(COUNT(*) AS BIGINT) AS n_desc_users,
           CAST(SUM(d.n_events) AS BIGINT) AS n_subtree_events
    FROM chain c JOIN du d USING (user_id)
    GROUP BY c.node
    """,
)
def sql_recursive_rollup(spark, sf_dir):
    """WITH RECURSIVE (Spark 4's recursive CTE support) driven end-to-end:
    hierarchical subtree rollup over the implicit user tree node -> node/2
    — the classic org-chart/BOM traversal shape, where each node
    aggregates every descendant's event count by walking ancestor chains
    (strictly decreasing, so UNION ALL terminates without cycle
    detection; depth is log2(max user_id) ~ a dozen recursion steps).
    The iterative OPERATORS (graph_pagerank, dedup_components) already
    cover fixed-point computation engine-side; this guards the SQL
    SURFACE for it, with DuckDB running the identical recursion as the
    oracle. Spark plans each recursion step as a UnionLoop over the
    previous step's output — rows per step are |users|, never the
    cross-product, and the final rollup is one hash aggregate."""
    catalog.register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH RECURSIVE du AS (
          SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY 1
        ),
        chain(node, user_id) AS (
          SELECT user_id AS node, user_id FROM du
          UNION ALL
          SELECT node DIV 2, user_id FROM chain WHERE node > 0
        )
        SELECT c.node, COUNT(*) AS n_desc_users,
               SUM(d.n_events) AS n_subtree_events
        FROM chain c JOIN du d USING (user_id)
        GROUP BY c.node
        """
    )


# ---------------------------------------------------------------------------
# Derived partsupp: the five TPC-H queries previously written off
# ---------------------------------------------------------------------------
# The driver testdata has no partsupp table, which kept q2/q9/q11/q16/q20
# inexpressible for four rounds. But partsupp is DERIVABLE: the official
# dbgen assigns each part its 4 suppliers by pure integer arithmetic
# (suppkey = (p + i·(S/4 + (p−1)/S)) mod S + 1, i ∈ 0..3 — the real TPC-H
# supplier-distribution formula), and availqty/supplycost only need to be
# deterministic and engine-identical, so they are integer hash formulas
# with supplycost held in CENTS (exact integer money — a decimal division
# would round differently per engine). Both the Spark builder and the
# oracle CTE below derive the SAME relation from part × count(supplier),
# so all five queries are hash-verifiable end-to-end.

#: shared formula constants (Spark plan + generated oracle)
_PS_AVAIL_A, _PS_AVAIL_B, _PS_AVAIL_MOD = 37, 101, 9999
_PS_COST_A, _PS_COST_B, _PS_COST_MOD = 13, 7, 99900

_PARTSUPP_CTE = f"""
ps0 AS (
  SELECT p_partkey AS ps_partkey,
         (p_partkey + g.i * (s.n // 4 + (p_partkey - 1) // s.n)) % s.n + 1
           AS ps_suppkey
  FROM part, (SELECT COUNT(*) AS n FROM supplier) s,
       UNNEST([0, 1, 2, 3]) AS g(i)
),
partsupp AS (
  SELECT ps_partkey,
         CAST(ps_suppkey AS BIGINT) AS ps_suppkey,
         CAST((ps_partkey * {_PS_AVAIL_A} + ps_suppkey * {_PS_AVAIL_B})
              % {_PS_AVAIL_MOD} + 1 AS BIGINT) AS ps_availqty,
         CAST((ps_partkey * {_PS_COST_A} + ps_suppkey * {_PS_COST_B})
              % {_PS_COST_MOD} + 100 AS BIGINT) AS ps_supplycost_cents
  FROM ps0
)"""


def _supplier_rows(sf_dir) -> int:
    """Supplier cardinality from the parquet footer(s) — no Spark job;
    directory-aware for multi-file datasets (the 10x scale tier)."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "supplier.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    return pq.ParquetFile(path).metadata.num_rows


def _partsupp(spark, sf_dir) -> DataFrame:
    """The Spark half of the derived partsupp relation (see block comment).
    Narrow: part scan → 4-row fan-out → integer projections; no shuffle."""
    S = _supplier_rows(sf_dir)
    p = _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("ps_partkey"))
    ps0 = p.select(
        "ps_partkey", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("i")
    ).select(
        "ps_partkey",
        F.expr(
            f"(ps_partkey + i * ({S} div 4 + (ps_partkey - 1) div {S})) % {S} + 1"
        ).cast("long").alias("ps_suppkey"),
    )
    return ps0.select(
        "ps_partkey",
        "ps_suppkey",
        F.expr(
            f"(ps_partkey * {_PS_AVAIL_A} + ps_suppkey * {_PS_AVAIL_B})"
            f" % {_PS_AVAIL_MOD} + 1"
        ).cast("long").alias("ps_availqty"),
        F.expr(
            f"(ps_partkey * {_PS_COST_A} + ps_suppkey * {_PS_COST_B})"
            f" % {_PS_COST_MOD} + 100"
        ).cast("long").alias("ps_supplycost_cents"),
    )


@query(
    "tpch_q2_min_cost_supplier",
    f"""
    WITH {_PARTSUPP_CTE.strip()},
    esupp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    cand AS (
      SELECT p.p_partkey, e.s_name, e.s_acctbal, e.n_name,
             ps.ps_supplycost_cents
      FROM partsupp ps
      JOIN part p ON p.p_partkey = ps.ps_partkey
      JOIN esupp e ON e.s_suppkey = ps.ps_suppkey
      WHERE p.p_size = 15 AND p.p_type = 'LARGE'
    ),
    mins AS (
      SELECT p_partkey, MIN(ps_supplycost_cents) AS mc
      FROM cand GROUP BY p_partkey
    )
    SELECT c.s_acctbal, c.s_name, c.n_name, c.p_partkey,
           c.ps_supplycost_cents
    FROM cand c JOIN mins m
      ON c.p_partkey = m.p_partkey AND c.ps_supplycost_cents = m.mc
    """,
)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2-shaped over the derived partsupp: for every EUROPE-sourced
    size-15 LARGE part, the supplier(s) offering the minimum supply cost.
    The correlated MIN subquery becomes a per-part aggregate joined back
    (both sides partitioned on the part key); the region/nation/supplier
    chain is a broadcast dimension. Output columns follow the reference
    shape minus p_mfgr/s_address/s_phone (absent from the testdata
    schema)."""
    ps = _partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    esupp = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    ).select("p_partkey")
    cand = (
        ps.join(F.broadcast(p), ps["ps_partkey"] == p["p_partkey"])
        .join(F.broadcast(esupp), ps["ps_suppkey"] == esupp["s_suppkey"])
        .select("p_partkey", "s_name", "s_acctbal", "n_name", "ps_supplycost_cents")
    )
    mins = cand.groupBy(F.col("p_partkey").alias("m_pkey")).agg(
        F.min("ps_supplycost_cents").alias("mc")
    )
    return (
        cand.join(
            mins,
            (cand["p_partkey"] == mins["m_pkey"])
            & (cand["ps_supplycost_cents"] == mins["mc"]),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "ps_supplycost_cents")
    )


@query(
    "tpch_q9_product_type_profit",
    f"""
    WITH {_PARTSUPP_CTE.strip()}
    SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS INT) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                    * (1 - CAST(l_discount AS DECIMAL(5,2)))
                    - ps_supplycost_cents
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / 100
             AS sum_profit
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    JOIN part ON p_partkey = l_partkey
    JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, YEAR(o_orderdate)
    """,
)
def tpch_q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9-shaped: per-nation per-year profit on 'red' parts —
    revenue minus supply cost, the one classic query that NEEDS partsupp.
    Money stays exact: revenue in cents via decimal multiplication,
    supply cost already integer cents, one decimal SUM, a single
    double-cast division at the end (identical IEEE op per engine). The
    lineitem↔partsupp join is keyed on (partkey, suppkey); dims
    broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%")).select(
        "p_partkey"
    )
    ps = _partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * 100
        * (F.lit(1) - F.col("l_discount").cast("decimal(5,2)"))
        - F.col("ps_supplycost_cents") * F.col("l_quantity").cast("decimal(18,2)")
    )
    j = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(
            ps,
            (li["l_partkey"] == ps["ps_partkey"]) & (li["l_suppkey"] == ps["ps_suppkey"]),
        )
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg((F.sum(amount).cast("double") / 100).alias("sum_profit"))
    )


@query(
    "tpch_q11_important_stock",
    f"""
    WITH {_PARTSUPP_CTE.strip()},
    v AS (
      SELECT ps_partkey,
             CAST(SUM(ps_supplycost_cents * ps_availqty) AS BIGINT) AS value_cents
      FROM partsupp
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_7'
      GROUP BY ps_partkey
    ),
    t AS (SELECT CAST(SUM(value_cents) AS BIGINT) AS total FROM v)
    SELECT ps_partkey, value_cents
    FROM v, t
    WHERE value_cents * 1000 > total
    """,
)
def tpch_q11_important_stock(spark, sf_dir):
    """TPC-H Q11-shaped: parts whose NATION_7 stock value exceeds 0.1% of
    the nation's total. The HAVING-against-global-total is one extra 1-row
    broadcast; the 0.001 fraction is CROSS-MULTIPLIED into exact integers
    (value·1000 > total) — the q17 discipline, since a float fraction of
    an exact integer would flip boundary rows between engines."""
    ps = _partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7").select(
        "n_nationkey"
    )
    v = (
        ps.join(F.broadcast(s), ps["ps_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("ps_partkey")
        .agg(
            F.sum(F.col("ps_supplycost_cents") * F.col("ps_availqty"))
            .cast("long")
            .alias("value_cents")
        )
    )
    t = v.agg(F.sum("value_cents").cast("long").alias("total"))
    return (
        v.crossJoin(F.broadcast(t))
        .where(F.col("value_cents") * 1000 > F.col("total"))
        .select("ps_partkey", "value_cents")
    )


@query(
    "tpch_q16_parts_supplier_relationship",
    f"""
    WITH {_PARTSUPP_CTE.strip()}
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#9'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 15, 25, 35, 45, 49, 50)
      AND ps_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16_parts_supplier_relationship(spark, sf_dir):
    """TPC-H Q16-shaped: distinct supplier counts per (brand, type, size)
    excluding flagged suppliers. The reference excludes by s_comment
    'Customer Complaints'; the testdata has no comment column, so the
    deterministic stand-in is s_acctbal < 0 (the same
    small-blacklist-of-suppliers shape). NOT IN over a non-null key plans
    as a broadcast anti join."""
    ps = _partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#9")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 15, 25, 35, 45, 49, 50))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(F.broadcast(p), ps["ps_partkey"] == p["p_partkey"])
        .join(F.broadcast(bad), ps["ps_suppkey"] == bad["s_suppkey"], "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").cast("long").alias("supplier_cnt"))
    )


@query(
    "tpch_q20_excess_stock",
    f"""
    WITH {_PARTSUPP_CTE.strip()},
    shipped AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_9'
    JOIN partsupp ON ps_suppkey = s.s_suppkey
    JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'small%'
    JOIN shipped ON shipped.l_partkey = ps_partkey
               AND shipped.l_suppkey = ps_suppkey
    WHERE CAST(2 * ps_availqty AS DECIMAL(18,2)) > qty
    """,
)
def tpch_q20_excess_stock(spark, sf_dir):
    """TPC-H Q20-shaped: NATION_9 suppliers (a nation with matches at BOTH scale factors — NATION_3 was empty at sf0.1, a vacuous 0=0 compare) holding more than half a
    year's shipments of 'small…' parts in stock. The 0.5·sum(qty)
    comparison is cross-multiplied exact (2·availqty > qty, decimal vs
    decimal); the nested EXISTS chain becomes the aggregate-then-join
    form with broadcast dims — same plan family as q17/q21."""
    li = _t(spark, sf_dir, "lineitem")
    shipped = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
    )
    ps = _partsupp(spark, sf_dir)
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_9").select(
        "n_nationkey"
    )
    return (
        ps.join(F.broadcast(p), ps["ps_partkey"] == p["p_partkey"])
        .join(
            shipped,
            (ps["ps_partkey"] == shipped["l_partkey"])
            & (ps["ps_suppkey"] == shipped["l_suppkey"]),
        )
        .where((2 * F.col("ps_availqty")).cast("decimal(18,2)") > F.col("qty"))
        .join(F.broadcast(s), ps["ps_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_suppkey", "s_name")
        .distinct()
    )


# ---------------------------------------------------------------------------
# round-7 additions: referential-integrity audit, last-touch attribution,
# stratified per-group capping
# ---------------------------------------------------------------------------


@query(
    "dq_referential_integrity",
    """
    WITH r1 AS (
      SELECT 'lineitem->orders' AS fk, CAST(COUNT(*) AS BIGINT) AS n_child,
             CAST(SUM(CASE WHEN NOT EXISTS
                   (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
      FROM lineitem l
    ),
    r2 AS (
      SELECT 'lineitem->part', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN NOT EXISTS
                   (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
                   THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem l
    ),
    r3 AS (
      SELECT 'lineitem->supplier', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN NOT EXISTS
                   (SELECT 1 FROM supplier s WHERE s.s_suppkey = l.l_suppkey)
                   THEN 1 ELSE 0 END) AS BIGINT)
      FROM lineitem l
    ),
    r4 AS (
      SELECT 'orders->customer', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN NOT EXISTS
                   (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
                   THEN 1 ELSE 0 END) AS BIGINT)
      FROM orders o
    ),
    u AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2
          UNION ALL SELECT * FROM r3 UNION ALL SELECT * FROM r4)
    SELECT fk, n_child, n_orphans,
           CAST((n_orphans * 1000000) // GREATEST(n_child, 1) AS BIGINT)
             AS orphan_fp
    FROM u
    """,
)
def dq_referential_integrity(spark, sf_dir):
    """Foreign-key orphan audit across the star schema — the
    promotion gate run before trusting any join for metrics (an orphan
    child row silently vanishes from every inner join downstream). One
    row per relationship: child rows, orphaned child rows, and the
    orphan rate in 10^6 fixed point; the zero counts ARE the assertion a
    pipeline gates on (r7: supersedes the earlier 3-edge anti-join form —
    adds lineitem->supplier, total/rate columns so the report is
    actionable, and an injected-orphan adversarial proof, since the
    fixtures are FK-clean and a broken audit would zero-pass forever).

    Scale shape: each relationship pre-aggregates the child to
    (key, count) with map-side combine — the join then carries one row
    per DISTINCT key, not per child row (lineitem shrinks ~4x before
    the exchange) — and the groupBy/join share the same key so Catalyst
    reuses the partitioning (one exchange per side, no re-shuffle).
    No distinct, no sort; the summary row set is relationship-sized."""

    def rel(child, key, parent, pkey, fkname):
        ck = child.groupBy(F.col(key).alias("k")).agg(
            F.count(F.lit(1)).alias("n")
        )
        # dropDuplicates: a DIRTY parent with a duplicated key would
        # multiply grouped child rows through the join, inflating n_child
        # (the NOT EXISTS oracle is immune) — and this audit exists
        # precisely to run on possibly-broken data (r7 advice)
        pk = (
            parent.select(F.col(pkey).alias("k"), F.lit(1).alias("__p"))
            .dropDuplicates(["k"])
        )
        return (
            ck.join(pk, "k", "left")
            .agg(
                F.sum("n").alias("n_child"),
                F.sum(
                    F.when(F.col("__p").isNull(), F.col("n")).otherwise(0)
                ).alias("n_orphans"),
            )
            .select(
                F.lit(fkname).alias("fk"),
                F.col("n_child").cast("long").alias("n_child"),
                F.col("n_orphans").cast("long").alias("n_orphans"),
            )
        )

    li = _t(spark, sf_dir, "lineitem")
    rows = (
        rel(li, "l_orderkey", _t(spark, sf_dir, "orders"), "o_orderkey",
            "lineitem->orders")
        .unionByName(rel(li, "l_partkey", _t(spark, sf_dir, "part"),
                         "p_partkey", "lineitem->part"))
        .unionByName(rel(li, "l_suppkey", _t(spark, sf_dir, "supplier"),
                         "s_suppkey", "lineitem->supplier"))
        .unionByName(rel(_t(spark, sf_dir, "orders"), "o_custkey",
                         _t(spark, sf_dir, "customer"), "c_custkey",
                         "orders->customer"))
    )
    return rows.select(
        "fk",
        "n_child",
        "n_orphans",
        F.expr("(n_orphans * 1000000) div greatest(n_child, 1)")
        .cast("long")
        .alias("orphan_fp"),
    )


@query(
    "agg_attribution_last_touch",
    """
    WITH s AS (
      SELECT user_id, ts, event_id, event_type, value,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS last_click_ts
      FROM events WHERE ts IS NOT NULL
    ),
    p AS (
      SELECT CASE WHEN last_click_ts IS NOT NULL
                   AND last_click_ts >= ts - INTERVAL 7 DAY
                  THEN CAST(CAST(last_click_ts AS DATE) AS VARCHAR)
                  ELSE 'unattributed' END AS day,
             CAST(FLOOR(value * 100) AS BIGINT) AS cents
      FROM s WHERE event_type = 'purchase'
    )
    SELECT day, CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS rev_cents
    FROM p GROUP BY day
    """,
)
def agg_attribution_last_touch(spark, sf_dir):
    """Last-touch attribution: each purchase credits the user's most
    recent click at or before it (7-day horizon), rolled up by the
    CLICK's day — the marketing-analytics staple. ONE window pass over
    the interleaved event sequence (last ignore-nulls over an explicit
    ROWS frame with the (ts, event_id) total order — no as-of join, no
    per-pair probing), then a day-keyed integer aggregate: purchase
    value in 10^2 fixed point so revenue is hash-exact. Null timestamps
    are dropped explicitly on both sides (the bounce-rate discipline).

    Scale: one shuffle on user_id for the window + one map-side-
    combinable aggregate; state per user is a single carried timestamp,
    the same shape the streaming variant would hold."""
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    s = ev.withColumn(
        "last_click_ts",
        F.last(
            F.when(F.col("event_type") == "click", F.col("ts")),
            ignorenulls=True,
        ).over(w),
    )
    p = s.where(F.col("event_type") == "purchase").select(
        F.when(
            F.col("last_click_ts").isNotNull()
            & (F.col("last_click_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAY")),
            F.to_date("last_click_ts").cast("string"),
        )
        .otherwise(F.lit("unattributed"))
        .alias("day"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    return p.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum("cents").alias("rev_cents"),
    )


@query(
    "sample_stratified_cap",
    """
    WITH r AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY CAST('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                             AS BIGINT), doc_id) AS rk
      FROM documents
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, CAST(rk AS INT) AS rk
    FROM r WHERE rk <= 50
    """,
)
def sample_stratified_cap(spark, sf_dir):
    """Stratified cap: keep at most K=50 documents per language, chosen
    by md5 rank — the deterministic 'reservoir' a mixture pipeline uses
    to cap an over-represented slice without order bias (hash rank is
    uniform and reproducible across runs/engines, unlike any RNG-based
    reservoir). Partitioned window rank (one shuffle on lang, no global
    sort; doc_id tiebreak makes the order total), hash-exact because
    the rank key lives in the shared md5 hash domain."""
    d = _t(spark, sf_dir, "documents")
    hk = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    w = Window.partitionBy("lang").orderBy(hk.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "lang")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 50)
        .select("doc_id", "lang", F.col("rk").cast("int").alias("rk"))
    )


@query(
    "wx_time_weighted_avg",
    """
    WITH seq AS (
      SELECT user_id, value, event_id, epoch_us(ts) AS t_us,
             LEAD(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS nxt_us
      FROM events WHERE ts IS NOT NULL
    ),
    terms AS (
      SELECT user_id,
             CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS HUGEINT)
               * CAST(nxt_us - t_us AS HUGEINT) AS term,
             (nxt_us - t_us) AS dt_us
      FROM seq WHERE nxt_us IS NOT NULL
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(dt_us) AS BIGINT) AS total_us,
           CAST(SUM(term) AS DOUBLE) / 100.0
             / NULLIF(CAST(SUM(dt_us) AS DOUBLE), 0.0) AS twa
    FROM terms GROUP BY user_id
    """,
)
def wx_time_weighted_avg(spark, sf_dir):
    """Time-weighted average per user (the timeseries `time_weight` /
    TWAP operator): each observation holds until the user's next event
    (last-observation-carried-forward), so its weight is the microsecond
    gap to the successor; the per-user average is Σ value·Δt / Σ Δt over
    closed intervals (a user's final observation opens an unbounded
    interval and is excluded). One window for LEAD + one groupBy — the
    same shuffle key, so AQE coalesces them onto one exchange.

    Determinism discipline: interval ends tie-break on event_id; the
    value is quantized ONCE to integer cents (explicit round-half-up via
    floor — the same cross-engine trick as quantize_int8; DECIMAL(38,2) ×
    BIGINT is NOT usable here because DuckDB silently falls back to
    double for the over-width product) and the cent·µs products are
    integers summed exactly in DECIMAL(38,0) (num.dsum rule — no float
    accumulation; plain BIGINT would overflow at ~1e19). The single
    double division at the end is try_divide (a user whose events all
    share one timestamp has zero total weight → NULL, mirrored by the
    oracle's NULLIF). NULL event times are dropped EXPLICITLY on both
    sides (the standing null-ts hazard class); NULL values contribute
    their time to the denominator but nothing to the numerator (SUM
    skips NULL identically in both engines)."""
    ev = _t(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    t_us = dates.epoch_us(ev, "ts")  # zone-free: DST-safe interval widths
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    seq = ev.select(
        "user_id", "value", "event_id", t_us.alias("t_us")
    ).withColumn("nxt_us", F.lead("t_us").over(w))
    # cent·µs products go through 128-bit-wide integer math on BOTH sides
    # (DECIMAL(20,0)×DECIMAL(20,0) here, HUGEINT in the oracle): a large
    # value over an hours-long gap overflows int64 at ~1e19
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long").cast("decimal(20,0)")
    terms = seq.where(F.col("nxt_us").isNotNull()).select(
        "user_id",
        (cents * (F.col("nxt_us") - F.col("t_us")).cast("decimal(20,0)")).alias(
            "term"
        ),
        (F.col("nxt_us") - F.col("t_us")).alias("dt_us"),
    )
    return terms.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_intervals"),
        F.sum("dt_us").cast("long").alias("total_us"),
        F.try_divide(
            F.sum("term").cast("double") / 100.0,
            F.sum("dt_us").cast("double"),
        ).alias("twa"),
    )
