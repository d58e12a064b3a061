"""Reference-derived operator queries (SURVEY.md §2) + DuckDB oracles.

Each SURVEY.md §2 operator id gets a named query phrased over the driver's
test tables (FIXTURES.md §1 assignment) as a pure DataFrame plan, plus an
equivalent ANSI-SQL oracle for DuckDB. Conventions that make the
order-insensitive value-hash comparison bit-stable across engines:

- every double aggregate sums in exact DECIMAL and casts back to double
  (``functions.num.dsum``) — float sums are order-dependent, decimals
  aren't;
- every window/order spec carries a unique tiebreaker column;
- date outputs are ISO strings (both engines format dates identically);
- counts/ranks are cast to the same integer width on both sides
  (DuckDB row_number → BIGINT, Spark → INT; counts → BIGINT/long).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import catalog
from ..functions.num import coalesce0, dsum
from ..functions.scalar import points_from_position, skill_constants_df, skill_points, try_int
from ..operators import aggregates, filters, joins, setops, windows
from ..session import tune

QUERIES: dict = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable and its oracle."""

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


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return catalog.table(spark, sf_dir, name)


def _events_dated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + derived date key (UTC game-day, offset 0)."""
    return _t(spark, sf_dir, "events").withColumn("d", F.to_date("ts"))


def _with_max_date(ev: DataFrame) -> DataFrame:
    """Attach the max event date as a broadcast scalar column ``dmax``."""
    bounds = ev.agg(F.max("d").alias("dmax"))
    return ev.crossJoin(F.broadcast(bounds))


# ---------------------------------------------------------------------------
# §2.1 sources / scans
# ---------------------------------------------------------------------------


@query(
    "s1_scan_pushdown",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_quantity >= 30
    """,
)
def s1_scan_pushdown(spark, sf_dir):
    """S1 — filtered scan; the level≥30 cutoff (etl.dart:77,:83) as a
    pushed-down parquet predicate + column-pruned projection."""
    li = _t(spark, sf_dir, "lineitem")
    return filters.min_value(li, "l_quantity", 30).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@query(
    "s4_topk_scan",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 1000
    """,
)
def s4_topk_scan(spark, sf_dir):
    """S4/W6 — top-1000 scan (etl.dart:501,:544) → TakeOrderedAndProject:
    per-partition heaps merged at the driver, no global sort."""
    o = _t(spark, sf_dir, "orders")
    return windows.top_k(o, [F.desc("o_totalprice"), F.asc("o_orderkey")], 1000).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


@query(
    "s5_keyed_snapshot",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE CAST(o_orderdate AS DATE) =
          (SELECT MIN(CAST(o_orderdate AS DATE)) FROM orders)
    """,
)
def s5_keyed_snapshot(spark, sf_dir):
    """S5 — keyed snapshot read (etl.dart:224-227); on a date-partitioned
    table the equality is a metadata-only partition prune."""
    o = _t(spark, sf_dir, "orders").withColumn("d", F.to_date("o_orderdate"))
    dmin = o.agg(F.min("d").alias("dmin"))
    return (
        o.crossJoin(F.broadcast(dmin))
        .where(F.col("d") == F.col("dmin"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "s6_exists_probe",
    """
    SELECT (COUNT(*) > 0) AS present FROM (
      SELECT 1 FROM orders
      WHERE o_orderstatus = 'F' AND o_totalprice > 100000 LIMIT 1
    )
    """,
)
def s6_exists_probe(spark, sf_dir):
    """S6/A4 — existence probe (etl.dart:286-289): conjunctive equality +
    LIMIT 1 short-circuit, returned as a 1-row boolean relation."""
    o = _t(spark, sf_dir, "orders")
    probed = o.where(
        (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 100000)
    ).limit(1)
    return probed.agg((F.count(F.lit(1)) > 0).alias("present"))


# ---------------------------------------------------------------------------
# §2.3 filters / projections
# ---------------------------------------------------------------------------


@query(
    "f1_min_value_filter",
    """
    SELECT event_id, user_id, value FROM events WHERE COALESCE(value, 0) >= 100
    """,
)
def f1_min_value_filter(spark, sf_dir):
    """F1/F3 — (value ?? 0) >= threshold (etl.dart:77,:361)."""
    ev = _t(spark, sf_dir, "events")
    return filters.min_value(ev, "value", 100).select("event_id", "user_id", "value")


@query(
    "f2_conjunctive_filter",
    """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
    WHERE l_returnflag = 'R' AND COALESCE(l_quantity, 0) >= 10
    """,
)
def f2_conjunctive_filter(spark, sf_dir):
    """F2 — rookie filter shape (etl.dart:321): equality AND min-threshold."""
    li = _t(spark, sf_dir, "lineitem")
    # threshold > 0 makes the coalesce form equivalent to the bare >=,
    # which (unlike coalesce) reaches PushedFilters — see filters.min_value
    return filters.conjunctive(
        li, F.col("l_returnflag") == "R", F.col("l_quantity") >= 10
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")


@query(
    "f3_min_level_online",
    """
    WITH b AS (SELECT MAX(CAST(ts AS DATE)) AS dmax FROM events)
    SELECT event_id, user_id, value FROM events, b
    WHERE CAST(ts AS DATE) = b.dmax AND COALESCE(value, 0) >= 100
    """,
)
def f3_min_level_online(spark, sf_dir):
    """F3 — min-level filter over the ONLINE snapshot (etl.dart:361): the
    same threshold primitive as F1 applied to the latest-day partition —
    named separately so the §2 id has its own driver-verified row. The
    date equality prunes to one partition on a date-partitioned store."""
    ev = _with_max_date(_events_dated(spark, sf_dir))
    online = ev.where(F.col("d") == F.col("dmax"))
    return filters.min_value(online, "value", 100).select(
        "event_id", "user_id", "value"
    )


@query(
    "f6_typeguard_projection",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
    """,
)
def f6_typeguard_projection(spark, sf_dir):
    """F6 — type-guarded nested extraction (etl.dart:95-102): JSON path
    access with invalid/missing values filtered, not crashing."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.select("event_id", k.alias("k")).where(F.col("k").isNotNull())


@query(
    "f7_tag_projection",
    """SELECT s_suppkey, s_name, 'All' AS world FROM supplier""",
)
def f7_tag_projection(spark, sf_dir):
    """F7 — per-row source tag (etl.dart:322-324)."""
    s = _t(spark, sf_dir, "supplier")
    return filters.tag(s.select("s_suppkey", "s_name"), "world", "All")


# ---------------------------------------------------------------------------
# §2.4 joins
# ---------------------------------------------------------------------------

_J1_ORACLE = """
WITH bounds AS (
  SELECT MIN(CAST(ts AS DATE)) AS d1, MAX(CAST(ts AS DATE)) AS d2 FROM events
),
snap AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         SUM(CAST(value AS DECIMAL(38,6))) AS v
  FROM events GROUP BY 1, 2
),
diff AS (
  SELECT t.user_id, CAST(t.v - y.v AS DOUBLE) AS gain
  FROM snap t JOIN snap y ON t.user_id = y.user_id, bounds b
  WHERE t.d = b.d2 AND y.d = b.d1 AND t.v > y.v
)
SELECT user_id, gain,
       CAST(ROW_NUMBER() OVER (ORDER BY gain DESC, user_id) AS INT) AS rnk
FROM diff
"""


@query("j1_snapshot_diff", _J1_ORACLE)
def j1_snapshot_diff(spark, sf_dir):
    """J1 — the flagship snapshot-diff (etl.dart:229-241, route E2):
    per-user value snapshots at the first and last event date, inner-joined
    on user, positive gains ranked desc. Two partition-pruned scans → one
    (broadcast-able) hash join → window rank: the 100 TB-ready shape of the
    reference's nested-loop diff."""
    ev = _events_dated(spark, sf_dir)
    bounds = ev.agg(F.min("d").alias("d1"), F.max("d").alias("d2"))
    snap = ev.groupBy("user_id", "d").agg(
        F.sum(F.col("value").cast("decimal(38,6)")).alias("v")
    )
    snap = snap.crossJoin(F.broadcast(bounds))
    today = snap.where(F.col("d") == F.col("d2")).select("user_id", "v")
    yday = snap.where(F.col("d") == F.col("d1")).select("user_id", "v")
    diffed = joins.snapshot_diff(today, yday, key="user_id", value="v", gain_name="g")
    diffed = diffed.select("user_id", F.col("g").cast("double").alias("gain"))
    ranked = windows.add_rank(
        diffed, [F.desc("gain"), F.asc("user_id")], rank_name="rnk"
    )
    return ranked.select("user_id", "gain", "rnk")


_J2_ORACLE = """
WITH rev AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)))
              AS DOUBLE) AS v
  FROM lineitem GROUP BY 1
),
r1 AS (
  SELECT s_suppkey, 'revenue' AS category,
         CAST(ROW_NUMBER() OVER (ORDER BY v DESC, s_suppkey) AS INT) AS rnk
  FROM rev
),
r2 AS (
  SELECT s_suppkey, 'acctbal' AS category,
         CAST(ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS INT) AS rnk
  FROM supplier
),
long AS (SELECT * FROM r1 UNION ALL SELECT * FROM r2),
pts AS (
  SELECT s_suppkey, SUM(1000 - (rnk - 1)) AS total_points FROM long GROUP BY 1
)
SELECT s.s_suppkey, s.s_name,
       CAST(COALESCE(p.total_points, 0) AS BIGINT) AS total_points
FROM supplier s LEFT JOIN pts p USING (s_suppkey)
"""


@query("j2_enrichment_join", _J2_ORACLE)
def j2_enrichment_join(spark, sf_dir):
    """J2 — rookmaster-style multi-category enrichment (etl.dart:550-570):
    per-category rankings in LONG format unioned once, rank→points (C2),
    one groupBy + one left join — shuffle count independent of category
    count, unlike the reference's 7 chained probes."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("v")
    )
    r1 = windows.add_rank(rev, [F.desc("v"), F.asc("s_suppkey")], "rnk").select(
        "s_suppkey", F.lit("revenue").alias("category"), "rnk"
    )
    r2 = windows.add_rank(
        sup, [F.desc("s_acctbal"), F.asc("s_suppkey")], "rnk"
    ).select("s_suppkey", F.lit("acctbal").alias("category"), "rnk")
    long = setops.union_all(r1, r2)
    base = sup.select("s_suppkey", "s_name")
    out = joins.enrich_points(
        base, long, key="s_suppkey", rank_col="rnk", total_name="total_points"
    )
    return out.select(
        "s_suppkey", "s_name", F.col("total_points").cast("long").alias("total_points")
    )


_J3_ORACLE = """
WITH b AS (SELECT MAX(CAST(ts AS DATE)) AS dmax FROM events),
acc AS (
  SELECT user_id, CAST(5 * COUNT(*) AS BIGINT) AS minutes,
         CAST(FLOOR(MAX_BY(struct_pack(v := value), event_id).v) AS INT) AS level
  FROM events, b WHERE CAST(ts AS DATE) < b.dmax GROUP BY user_id
),
batch AS (
  SELECT user_id, CAST(FLOOR(MAX_BY(struct_pack(v := value), event_id).v) AS INT) AS level
  FROM events, b WHERE CAST(ts AS DATE) = b.dmax GROUP BY user_id
)
SELECT COALESCE(a.user_id, x.user_id) AS user_id,
       CAST(COALESCE(a.minutes, 0)
            + CASE WHEN x.user_id IS NOT NULL THEN 5 ELSE 0 END AS BIGINT)
         AS minutes,
       COALESCE(x.level, a.level) AS level
FROM acc a FULL OUTER JOIN batch x ON a.user_id = x.user_id
"""


@query("j3_accumulating_merge", _J3_ORACLE)
def j3_accumulating_merge(spark, sf_dir):
    """J3 — accumulating merge (etl.dart:360-382): running online-time
    accumulator full-outer-merged with the latest poll; matched rows gain 5
    minutes and take the batch's level, new rows start at 5. One hash join
    replaces three per-row ``firstWhere`` probes."""
    ev = _with_max_date(_events_dated(spark, sf_dir))
    level = F.floor(F.max_by("value", "event_id")).cast("int").alias("level")
    acc = (
        ev.where(F.col("d") < F.col("dmax"))
        .groupBy("user_id")
        .agg((F.count(F.lit(1)) * 5).cast("long").alias("minutes"), level)
    )
    batch = ev.where(F.col("d") == F.col("dmax")).groupBy("user_id").agg(level)
    merged = joins.accumulating_merge(
        acc, batch, key="user_id", time_col="minutes", increment=5, carry_cols=("level",)
    )
    return merged.select(
        "user_id", F.col("minutes").cast("long").alias("minutes"), "level"
    )


_J4_ORACLE = """
WITH b AS (SELECT MAX(CAST(ts AS DATE)) AS dmax FROM events),
f AS (
  SELECT user_id, value, event_type, event_id FROM events, b
  WHERE CAST(ts AS DATE) > b.dmax - 7
)
SELECT user_id,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value,
       MAX_BY(struct_pack(v := event_type), event_id).v AS last_type,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM f GROUP BY user_id
"""


@query("j4_period_rollup", _J4_ORACLE)
def j4_period_rollup(spark, sf_dir):
    """J4 — 7-day period rollup (etl.dart:397-424): the reference's 365
    sequential per-day reads + fold become ONE range-filtered scan and one
    partially-aggregated groupBy; last-seen-wins via max_by (A3)."""
    ev = _with_max_date(_events_dated(spark, sf_dir))
    f = ev.where(F.col("d") > F.date_sub(F.col("dmax"), 7))
    return f.groupBy("user_id").agg(
        dsum("value", 6).alias("total_value"),
        F.max_by("event_type", "event_id").alias("last_type"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "j5_semi_probe",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def j5_semi_probe(spark, sf_dir):
    """J5/S6 batched — left-semi join (etl.dart:286-289 as a set op)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return joins.semi_probe(c, o, "c_custkey").select("c_custkey", "c_name")


@query(
    "j6_anti_probe",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (
      SELECT o_custkey FROM orders
      WHERE o_totalprice > 300000 AND o_custkey IS NOT NULL
    )
    """,
)
def j6_anti_probe(spark, sf_dir):
    """K4's anti-predicate as a set op — left-anti join (retention shape):
    customers with no high-value order."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > 300000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return joins.anti_probe(c, o, "c_custkey").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# §2.5 aggregations
# ---------------------------------------------------------------------------


@query(
    "a1_range_sum",
    """
    SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM events GROUP BY user_id
    """,
)
def a1_range_sum(spark, sf_dir):
    """A1 — per-key sum over a range (etl.dart:411), decimal-exact."""
    ev = _t(spark, sf_dir, "events")
    return aggregates.range_sum(ev, "user_id", "value", alias="total", scale=6)


@query(
    "a2_horizontal_sum",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE)
           + CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE)
           + CAST(SUM(CAST(l_tax AS DECIMAL(38,2))) AS DOUBLE) AS score
    FROM lineitem GROUP BY l_orderkey
    """,
)
def a2_horizontal_sum(spark, sf_dir):
    """A2 — horizontal sum across measures (etl.dart:566): one wide
    aggregate, columns added horizontally after exact per-column sums.
    Spread KEYED ON THE GROUP KEY (r11): with ~1 group per 4 rows the
    map-side partial agg barely shrinks data, so the single-split local
    scan used to serialize the decimal aggregation onto one core; hash-
    repartitioning by l_orderkey is one exchange the groupBy then REUSES
    (same key, same partition count — guide §2.4 "share one exchange"),
    so the plan still holds exactly one Exchange but the decimal sums run
    at full parallelism (measured 1.96 s → 1.09 s). At real scale the
    spread guard is false and the plan is unchanged."""
    li = catalog.spread(_t(spark, sf_dir, "lineitem"), key="l_orderkey")
    return li.groupBy("l_orderkey").agg(
        (dsum("l_quantity", 2) + dsum("l_extendedprice", 2) + dsum("l_tax", 2)).alias(
            "score"
        )
    )


@query(
    "a3_last_value_wins",
    """
    -- struct_pack: DuckDB's MAX_BY skips NULL args while Spark's max_by
    -- returns the value AT the greatest ordering, NULL included (probed;
    -- fuzz-corpus finding). Wrapping in a never-NULL struct makes DuckDB
    -- track the row, matching true last-seen-wins semantics.
    SELECT user_id, MAX_BY(struct_pack(v := value), event_id).v AS last_value,
           MAX_BY(struct_pack(v := event_type), event_id).v AS last_type
    FROM events GROUP BY user_id
    """,
)
def a3_last_value_wins(spark, sf_dir):
    """A3 — last-seen-wins (etl.dart:372,:412-413) via max_by over the
    unique event sequence."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max_by("value", "event_id").alias("last_value"),
        F.max_by("event_type", "event_id").alias("last_type"),
    )


@query(
    "a4_count_nonempty",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n, (COUNT(*) > 0) AS nonempty
    FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def a4_count_nonempty(spark, sf_dir):
    """A4 — count-nonempty existence aggregate (etl.dart:288)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.where(F.col("l_returnflag") == "R").agg(
        F.count(F.lit(1)).alias("n"), (F.count(F.lit(1)) > 0).alias("nonempty")
    )


@query(
    "a5_poll_minutes",
    """
    SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(5 * COUNT(*) AS BIGINT) AS minutes
    FROM events GROUP BY 1, 2
    """,
)
def a5_poll_minutes(spark, sf_dir):
    """A5 — minutes = 5 × polls-seen per (user, day) (etl.dart:371)."""
    ev = _events_dated(spark, sf_dir).withColumn("day", F.col("d").cast("string"))
    return aggregates.poll_minutes(ev, ["user_id", "day"], 5, alias="minutes")


# ---------------------------------------------------------------------------
# §2.6 windows / ranks
# ---------------------------------------------------------------------------


@query(
    "w1_rank_desc",
    """
    SELECT o_orderkey, o_totalprice,
           CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS INT)
             AS rnk
    FROM orders
    """,
)
def w1_rank_desc(spark, sf_dir):
    """W1+W4 — sort by value desc + list-position rank (etl.dart:88,
    :249-255): row_number (ties get distinct sequential ranks)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return windows.add_rank(o, [F.desc("o_totalprice"), F.asc("o_orderkey")], "rnk")


@query(
    "w2_level_rank",
    """
    WITH lvl AS (
      SELECT user_id, CAST(FLOOR(MAX_BY(struct_pack(v := value), event_id).v) AS INT) AS level
      FROM events GROUP BY user_id
    )
    SELECT user_id, level,
           CAST(ROW_NUMBER() OVER (ORDER BY level DESC, user_id) AS INT) AS rnk
    FROM lvl
    """,
)
def w2_level_rank(spark, sf_dir):
    """W2 — sort by level desc (etl.dart:88 ordering variant): per-user
    last-seen level (A3's max_by) ranked descending — named separately so
    the §2 id has its own driver-verified row."""
    ev = _t(spark, sf_dir, "events")
    lvl = ev.groupBy("user_id").agg(
        F.floor(F.max_by("value", "event_id")).cast("int").alias("level")
    )
    return windows.add_rank(lvl, [F.desc("level"), F.asc("user_id")], "rnk")


@query(
    "wx_partitioned_rank",
    """
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice,
           CAST(ROW_NUMBER() OVER (PARTITION BY o_orderstatus, o_orderpriority
                                   ORDER BY o_totalprice DESC, o_orderkey)
                AS INT) AS rnk
    FROM orders
    """,
)
def wx_partitioned_rank(spark, sf_dir):
    """Distributed ranking — the 100 TB form of W1/W4: partition keys
    (status, priority) keep every sort local to its hash partition, so the
    plan carries ZERO Exchange SinglePartition however large the table
    (the global-window form is only acceptable for ranking-table-sized
    outputs; this is the shape for everything else)."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    return windows.add_rank(
        o,
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        "rnk",
        partition_by=[F.col("o_orderstatus"), F.col("o_orderpriority")],
    )


@query(
    "w3_multikey_rank",
    """
    WITH s AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events, total_value,
           CAST(ROW_NUMBER() OVER
                (ORDER BY n_events DESC, total_value DESC, user_id) AS INT) AS rnk
    FROM s
    """,
)
def w3_multikey_rank(spark, sf_dir):
    """W3 — multi-key comparator sort (etl.dart:339-342): primary desc,
    tiebreak desc, then unique key for stability."""
    ev = _t(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"), dsum("value", 6).alias("total_value")
    )
    return windows.add_rank(
        s, [F.desc("n_events"), F.desc("total_value"), F.asc("user_id")], "rnk"
    )


@query(
    "w5_points_from_rank",
    """
    WITH r AS (
      SELECT o_orderkey,
             CAST(ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS INT)
               AS rnk
      FROM orders
    )
    SELECT o_orderkey, rnk, CAST(1000 - (rnk - 1) AS BIGINT) AS points
    FROM r WHERE rnk <= 1000
    """,
)
def w5_points_from_rank(spark, sf_dir):
    """W5+C2 — points from ranking position (etl.dart:506,:556)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    r = windows.add_rank(o, [F.desc("o_totalprice"), F.asc("o_orderkey")], "rnk")
    return r.where(F.col("rnk") <= 1000).select(
        "o_orderkey", "rnk", points_from_position(F.col("rnk")).alias("points")
    )


@query(
    "wx_lag_delta",
    """
    SELECT event_id, user_id,
           value - LAG(value) OVER (PARTITION BY user_id ORDER BY event_id) AS delta
    FROM events
    """,
)
def wx_lag_delta(spark, sf_dir):
    """Engine extension — lag/lead frame windows (free via pyspark.sql.Window;
    absent from the reference, SURVEY.md §2.6 note)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    return ev.select(
        "event_id", "user_id", (F.col("value") - F.lag("value").over(w)).alias("delta")
    )


@query(
    "wx_moving_sum",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
             PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mv3
    FROM events
    """,
)
def wx_moving_sum(spark, sf_dir):
    """Engine extension — rows-frame moving aggregate."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(38,6)")).over(w).cast("double").alias("mv3"),
    )


# ---------------------------------------------------------------------------
# §2.7 set ops
# ---------------------------------------------------------------------------


@query(
    "u1_union_tagged",
    """
    SELECT c_name AS name, 'customer' AS source FROM customer
    UNION ALL
    SELECT s_name AS name, 'supplier' AS source FROM supplier
    """,
)
def u1_union_tagged(spark, sf_dir):
    """U1/U2 — tagged union-all across sources (etl.dart:78,:325,:496)."""
    c = filters.tag(
        _t(spark, sf_dir, "customer").select(F.col("c_name").alias("name")),
        "source",
        "customer",
    )
    s = filters.tag(
        _t(spark, sf_dir, "supplier").select(F.col("s_name").alias("name")),
        "source",
        "supplier",
    )
    return setops.union_all(c, s)


# ---------------------------------------------------------------------------
# §2.8 scalar functions
# ---------------------------------------------------------------------------

_C1_ORACLE = """
WITH skills(skill, a, b, d) AS (VALUES
  ('magic', 1600.0, 3.0, 30.0),
  ('fist', 50.0, 1.5, 10.0),
  ('axe', 50.0, 1.1, 10.0),
  ('club', 50.0, 1.1, 10.0),
  ('sword', 50.0, 1.1, 10.0),
  ('distance', 30.0, 1.1, 10.0),
  ('shielding', 100.0, 1.1, 10.0),
  ('fishing', 20.0, 1.1, 10.0)
)
SELECT p_partkey, skill,
       CAST(FLOOR(((POW(b, CAST(COALESCE(p_size % 21 + 10, 10) AS DOUBLE) - 10) - 1)
                   / (b - 1)) * a / d) AS BIGINT) AS points
FROM part CROSS JOIN skills
"""


@query("c1_skill_points", _C1_ORACLE)
def c1_skill_points(spark, sf_dir):
    """C1 — skill-points geometric-series formula (etl.dart:572-606) as a
    pure Column expression (no UDF: stays in whole-stage codegen), constants
    broadcast-joined from an 8-row lookup dimension. p_size stands in for
    the skill value, folded into [10, 30] to keep points in BIGINT range."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", (F.col("p_size") % 21 + 10).alias("value")
    )
    sk = skill_constants_df(spark)
    out = p.crossJoin(F.broadcast(sk))
    pts = skill_points(F.col("value"), F.col("a"), F.col("b"), F.col("d"))
    return out.select("p_partkey", "skill", pts.alias("points"))


@query(
    "c5_try_int",
    """
    SELECT event_id,
           CAST(COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), 0)
                AS BIGINT) AS k
    FROM events
    """,
)
def c5_try_int(spark, sf_dir):
    """C5 — int.tryParse(s) ?? 0 (etl.dart:612)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id", try_int(F.get_json_object("props", "$.k")).alias("k")
    )


@query(
    "c6_date_functions",
    """
    SELECT DISTINCT
      CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day,
      CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y,
      CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) AS m,
      CAST(CAST(o_orderdate AS DATE) - 7 AS VARCHAR) AS week_ago,
      CAST(CAST(CAST(o_orderdate AS DATE) - INTERVAL 1 MONTH AS DATE) AS VARCHAR)
        AS month_ago
    FROM orders
    """,
)
def c6_date_functions(spark, sf_dir):
    """C6 — the DT.* calendar surface (etl.dart:32,:138,:404 call sites):
    today/yesterday/week/month derivations as date arithmetic."""
    o = _t(spark, sf_dir, "orders").withColumn("d", F.to_date("o_orderdate"))
    return o.select(
        F.col("d").cast("string").alias("day"),
        F.year("d").alias("y"),
        F.month("d").alias("m"),
        F.date_sub("d", 7).cast("string").alias("week_ago"),
        F.add_months("d", -1).cast("string").alias("month_ago"),
    ).distinct()


@query(
    "c7_json_extract",
    """
    SELECT event_id, json_extract_string(props, '$.k') AS k_str,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events
    """,
)
def c7_json_extract(spark, sf_dir):
    """C7 — JSON document decode (etl.dart fromJson sites): path extraction
    out of the nested props document."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select("event_id", k.alias("k_str"), k.cast("long").alias("k_int"))


# ---------------------------------------------------------------------------
# §2.9 streaming-shaped semantics, batch form (source of truth)
# ---------------------------------------------------------------------------


@query(
    "e3_daily_online_time",
    """
    WITH daily AS (
      SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(5 * COUNT(*) AS BIGINT) AS minutes
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, day, minutes,
           CAST(ROW_NUMBER() OVER
                (PARTITION BY day ORDER BY minutes DESC, user_id) AS INT) AS rnk
    FROM daily
    """,
)
def e3_daily_online_time(spark, sf_dir):
    """E3 — daily online-time ranking (etl.dart:360-382): tumbling day
    window count×5, ranked within each day. The partitioned window keeps
    the rank sort distributed (one partition per day)."""
    ev = _events_dated(spark, sf_dir).withColumn("day", F.col("d").cast("string"))
    daily = aggregates.poll_minutes(ev, ["user_id", "day"], 5, alias="minutes")
    return windows.add_rank(
        daily,
        [F.desc("minutes"), F.asc("user_id")],
        "rnk",
        partition_by=[F.col("day")],
    )


@query(
    "e3_period_online_time",
    """
    WITH b AS (SELECT MAX(CAST(ts AS DATE)) AS dmax FROM events),
    daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d, 5 * COUNT(*) AS minutes
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, CAST(SUM(minutes) AS BIGINT) AS minutes,
           CAST(ROW_NUMBER() OVER (ORDER BY SUM(minutes) DESC, user_id) AS INT)
             AS rnk
    FROM daily, b WHERE d > b.dmax - 7 GROUP BY user_id
    """,
)
def e3_period_online_time(spark, sf_dir):
    """E3 period rollup — 7-day online-time ranking (etl.dart:397-424) as
    one scan over the daily aggregate (no 365 round-trips)."""
    ev = _with_max_date(_events_dated(spark, sf_dir))
    daily = ev.groupBy("user_id", "d", "dmax").agg(
        (F.count(F.lit(1)) * 5).alias("minutes")
    )
    period = (
        daily.where(F.col("d") > F.date_sub(F.col("dmax"), 7))
        .groupBy("user_id")
        .agg(F.sum("minutes").cast("long").alias("minutes"))
    )
    return windows.add_rank(period, [F.desc("minutes"), F.asc("user_id")], "rnk")


# ---------------------------------------------------------------------------
# headline analytical queries (bench + built-in aggregate surface, §2.5 note)
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
    AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
       AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_discount AS DECIMAL(38,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("tpch_q1_pricing_summary", _Q1_ORACLE)
def tpch_q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary: the canonical wide hash aggregate
    (map-side partial + final), decimal-exact sums."""
    # decimal partial-aggregation is the dominant cost; fan single-split
    # local scans out first (no-op at real scale, catalog.spread). Round-
    # robin is fine: decimal sums are order-independent by construction.
    li = catalog.spread(
        _t(spark, sf_dir, "lineitem").where(
            F.to_date("l_shipdate") <= F.lit("2001-09-02").cast("date")
        )
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", 2).alias("sum_qty"),
        dsum("l_extendedprice", 2).alias("sum_base_price"),
        dsum(disc_price, 6).alias("sum_disc_price"),
        dsum(charge, 6).alias("sum_charge"),
        (dsum("l_quantity", 2) / F.count(F.lit(1))).alias("avg_qty"),
        (dsum("l_discount", 2) / F.count(F.lit(1))).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


_Q3_ORACLE = """
SELECT l_orderkey,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
    AS revenue,
  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
GROUP BY l_orderkey, day, o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


@query("tpch_q3_shipping_priority", _Q3_ORACLE)
def tpch_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3-shaped: dimension-filtered fact join + top-K by aggregate.
    customer is broadcast; top-10 via TakeOrderedAndProject."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(
        o, li["l_orderkey"] == o["o_orderkey"], "inner"
    ).join(F.broadcast(c), o["o_custkey"] == c["c_custkey"], "inner")
    agg = j.groupBy(
        "l_orderkey",
        F.to_date("o_orderdate").cast("string").alias("day"),
        "o_orderpriority",
    ).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue")
    )
    return windows.top_k(agg, [F.desc("revenue"), F.asc("l_orderkey")], 10).select(
        "l_orderkey", "revenue", "day", "o_orderpriority"
    )


_Q5_ORACLE = """
SELECT n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
    AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
GROUP BY n_name
"""


@query("tpch_q5_local_supplier_volume", _Q5_ORACLE)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5-shaped: 6-way star join, small dims broadcast, one shuffle
    on the fact side."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(
            F.broadcast(c),
            (o["o_custkey"] == c["c_custkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
    )
    return j.groupBy("n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue")
    )


_Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


@query("tpch_q6_forecast_revenue", _Q6_ORACLE)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6-shaped: pure scan-filter-aggregate — every predicate reaches
    PushedFilters, no shuffle beyond the single-row final agg."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


_Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
    AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


@query("tpch_q10_returned_items", _Q10_ORACLE)
def tpch_q10_returned_items(spark, sf_dir):
    """TPC-H Q10-shaped: returned-item revenue per customer, top-20 —
    fact-side filter first, dims broadcast, TakeOrderedAndProject."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    j = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue")
    )
    return windows.top_k(agg, [F.desc("revenue"), F.asc("c_custkey")], 20).select(
        "c_custkey", "c_name", "n_name", "revenue"
    )


_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey FROM lineitem GROUP BY 1
  HAVING SUM(CAST(l_quantity AS DECIMAL(38,2))) > 150
)
SELECT c_custkey, c_name, o_orderkey,
  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS day, o_totalprice,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS total_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey, day, o_totalprice
"""


@query("tpch_q18_large_orders", _Q18_ORACLE)
def tpch_q18_large_orders(spark, sf_dir):
    """TPC-H Q18-shaped: HAVING-filtered semi-join (large-quantity orders)
    then re-aggregate — the aggregate feeds a left-semi join, no subquery
    re-evaluation. lineitem is spread KEYED on l_orderkey (r11): the
    single-split local scan serialized the 150k-group decimal partial agg
    onto one core, and the same hash layout feeds BOTH consumers (the
    HAVING aggregate and the order join), so ReuseExchange folds the two
    branches onto one exchange; no-op at real scale (guide §2.4)."""
    li = catalog.spread(_t(spark, sf_dir, "lineitem"), key="l_orderkey")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", 2).alias("q"))
        .where(F.col("q") > 150)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    j = (
        li.join(o.join(big, "o_orderkey", "left_semi"), li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    )
    return j.groupBy(
        "c_custkey",
        "c_name",
        "o_orderkey",
        F.to_date("o_orderdate").cast("string").alias("day"),
        "o_totalprice",
    ).agg(dsum("l_quantity", 2).alias("total_qty"))
