"""Fixture-blind-spot hunting for the RELATIONAL family's oracles.

The documents/events/embeddings families have had adversarial + fuzz
corpora since round 5 (they caught seven real fixture-invisible
divergences); the TPC-H / relational family was the one family still
proven only on the synthetic fixture at two scale factors. This module
closes that: a crafted 7-table corpus packs the hazard shapes the
generated fixture provably avoids, with rows sitting EXACTLY on every
predicate boundary the queries use:

- date edges: order/ship dates at 1995-01-01 / 1996-01-01 / 1997-01-01 /
  1997-04-01 / 1997-09-01 / 1997-10-01 / 1998-01-01 and one microsecond
  inside/outside; the q21 late-ship edge at exactly +60 days vs +60d+1us
- numeric edges: q6's discount 0.05/0.07 and quantity 23/24, q19's
  quantity bands (1/11, 10/20, 20/30) against the matching brand+size,
  f1's quantity 29/30, s6's totalprice exactly 100000 vs 100000.01
- join-shape hazards: customers with zero orders (q13/q22), an order
  with no lineitems (q4 exists), a supplier with no lineitems, orphan
  foreign keys in lineitem AND orders (dq_referential_integrity's prey),
  a nation pointing at a nonexistent region, TWO nations named NATION_1
  (name-filter + key-join queries must count both consistently)
- tie hazards: identical o_totalprice triples (rank tiebreak stress),
  two suppliers with bit-identical q15-window revenue, tied acctbals
- string hazards for LIKE: 'smallish part' (matches 'small%'),
  'reddish gizmo' (matches '%red%'), 'RED CAP' (case-sensitive MISS)
- NULLs in every nullable non-key column (acctbal, p_size, totalprice,
  orderdate, discount, tax) — aggregation skip, predicate three-valued
  logic, and ORDER BY placement must all agree cross-engine
- exact duplicate lineitem rows (multiset discipline)

A divergence here is a REAL bug in the plan or the oracle even though
the driver gate is green at both scale factors.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from forgottenlandapp_etl_spark.plans.registry import ORACLE, QUERIES

from .oracle import compare


def _ts(y, m, d, h=0, mi=0, s=0, us=0):
    return dt.datetime(y, m, d, h, mi, s, us)


def _tables():
    region = [
        (0, "AFRICA"),
        (1, "AMERICA"),
        (2, "ASIA"),
        (3, "EUROPE"),
        (4, "MIDDLE EAST"),
        (5, "AMERICA"),        # duplicate region NAME, distinct key
        (6, "EMPTY REGION"),   # region with no nations
    ]
    nation = [
        # (key, name, regionkey)
        (0, "NATION_0", 1),    # q8's supplier nation, in AMERICA
        (1, "NATION_1", 3),    # q7/q21 target, in EUROPE
        (2, "NATION_2", 3),    # q7 counterpart, same region
        (7, "NATION_7", 1),
        (9, "NATION_9", 2),
        (10, "NATION_1", 3),   # SECOND nation named NATION_1 — name filters
                               # must fan out to both, key joins must not
        (11, "NATION_ORPHAN", 99),  # regionkey with no region row
        (12, "NATION_EMPTY", 0),    # nation with no customers/suppliers
        (13, "NATION_5", 4),
    ]
    customer = [
        # (key, name, nationkey, acctbal, mktsegment)
        (1, "cust one", 1, 100.0, "BUILDING"),
        (2, "cust two", 1, 200.0, "BUILDING"),      # zero orders (q13/q22)
        (3, "cust three", 2, 300.0, "building"),    # lowercase segment: case miss
        (4, "cust four", 0, -999.99, "MACHINERY"),  # negative balance
        (5, "cust five", 0, 0.0, "AUTOMOBILE"),
        (6, "cust six", 7, None, "HOUSEHOLD"),      # NULL acctbal
        (7, "cust seven", 9, 500.5, "FURNITURE"),   # tied balances
        (8, "cust eight", 9, 500.5, "FURNITURE"),
        (9, "cust nine", 11, 50.0, "BUILDING"),     # lives in orphan nation
        (10, "cust ten", 10, 60.0, "MACHINERY"),    # lives in dup-name nation
        (11, "cust big", 0, 9000.0, "MACHINERY"),   # the q18 heavy orderer
        (12, "cust big", 2, 70.0, "BUILDING"),      # duplicate NAME
    ]
    supplier = [
        # (key, name, nationkey, acctbal)
        (1, "supp one", 1, 1000.0),    # NATION_1: q21's waiting supplier
        (2, "supp two", 10, 1000.0),   # the OTHER NATION_1
        (3, "supp three", 2, 2000.0),  # q15 revenue tie partner of supp one
        (4, "supp four", 0, 3000.0),   # no lineitems at all
        (5, "supp five", 0, -1.0),
        (6, "supp six", 9, 750.25),    # tied balances
        (7, "supp seven", 9, 750.25),
        (8, "supp eight", 11, 10.0),   # lives in orphan nation
        (9, "supp nine", 7, 400.0),    # NATION_7: q11's value-share target
    ]
    part = [
        # (key, name, brand, type, size, retailprice)
        (1, "small widget", "Brand#12", "LARGE", 15, 10.0),    # q2 hit + 'small%'
        (2, "small red bolt", "Brand#23", "PROMO", 10, 20.0),  # PROMO + 'small%' + '%red%'
        (3, "dark red rod", "Brand#24", "STANDARD", 15, 30.0), # '%red%' + q19 band 3 + STANDARD
        (4, "reddish gizmo", "Brand#1", "STANDARD", 1, 40.0),  # '%red%' inside a word
        (5, "RED CAP", "Brand#1", "LARGE", 5, 50.0),           # case-sensitive MISS for '%red%'
        (6, "blue rod", "Brand#12", "ECONOMY", 5, 60.0),       # q19 band 1
        (7, "smallish part", "Brand#9", "MEDIUM", 50, 70.0),   # 'small%' prefix hit
        (8, "cold widget", "Brand#1", "PROMO", 15, 0.0),       # q17's Brand#1 target
        (9, "odd part", "Brand#23", "LARGE", None, 80.0),      # NULL size: BETWEEN -> NULL
        (10, "near miss", "Brand#1", "LARGE POLISHED", 14, -5.0),  # q2 near-miss on both
        (11, "unused part", "Brand#20", "MEDIUM", 3, 90.0),    # no lineitems
        (12, "small widget", "Brand#13", "SMALL", 2, 11.0),    # duplicate NAME
    ]
    orders = []

    def o(key, cust, status, total, odate, prio):
        orders.append((key, cust, status, total, odate, prio))

    # q8 window edges: 1995-01-01 in, one us before is out; 1996-12-31
    # 23:59:59 in, 1997-01-01 out
    o(100, 5, "F", 1000.0, _ts(1995, 1, 1), "1-URGENT")  # AMERICA customer:
    #   its 1995 STANDARD-part lines are q8's denominator year 1
    o(101, 1, "O", 1100.0, _ts(1994, 12, 31, 23, 59, 59, 999999), "2-HIGH")
    o(102, 3, "F", 1200.0, _ts(1996, 12, 31, 23, 59, 59), "3-MEDIUM")
    o(103, 3, "O", 1300.0, _ts(1997, 1, 1), "5-LOW")
    # c6/cube material on the 1996 boundary year
    o(104, 4, "P", 1400.0, _ts(1996, 1, 1), "4-NOT SPECIFIED")
    # s6 probe boundary: strictly > 100000
    o(105, 5, "F", 100000.0, _ts(1997, 6, 1), "1-URGENT")
    o(106, 5, "F", 100000.01, _ts(1997, 6, 2), "2-HIGH")
    # rank ties: three identical totalprices
    o(107, 7, "O", 5000.0, _ts(1997, 7, 1), "5-LOW")
    o(108, 8, "O", 5000.0, _ts(1997, 7, 2), "5-LOW")
    o(109, 10, "O", 5000.0, _ts(1997, 7, 3), "5-LOW")
    # NULL hazards
    o(110, 9, "F", None, _ts(1997, 8, 1), "3-MEDIUM")
    o(111, 4, "O", 0.0, None, "1-URGENT")
    # the q21 late-ship pair's orders (status F required)
    o(112, 1, "F", 2000.0, _ts(1997, 3, 1), "2-HIGH")
    o(113, 3, "F", 2100.0, _ts(1997, 3, 2), "2-HIGH")
    # order with NO lineitems (q4-exists must drop, q13 counts the order)
    o(114, 1, "F", 2200.0, _ts(1997, 9, 15), "1-URGENT")
    # q18 heavy orderer: two orders whose quantity sums straddle a having
    o(115, 11, "O", 8000.0, _ts(1997, 10, 5), "2-HIGH")
    o(116, 11, "O", 8100.0, _ts(1997, 10, 6), "2-HIGH")
    # orphan custkey (no customer row)
    o(117, 9999, "O", 3000.0, _ts(1997, 11, 1), "5-LOW")
    # negative totalprice
    o(118, 12, "F", -500.0, _ts(1997, 11, 2), "4-NOT SPECIFIED")
    # q15 window revenue-tie suppliers ship against these
    o(119, 7, "F", 4000.0, _ts(1997, 1, 15), "3-MEDIUM")
    # q8 1996 denominator: another AMERICA customer's STANDARD-part order
    o(120, 4, "O", 4100.0, _ts(1996, 6, 1), "2-HIGH")
    # sub-100 orderkey: reshape_unpivot's l_orderkey < 100 window
    o(99, 7, "O", 900.0, _ts(1997, 12, 1), "5-LOW")

    lineitem = []

    def l(okey, pkey, skey, ln, qty, price, disc, tax, rf, ls, ship):
        lineitem.append((okey, pkey, skey, ln, qty, price, disc, tax, rf, ls, ship))

    # --- q6 boundary block (ship in [1997-01-01, 1998-01-01), disc in
    # [0.05, 0.07], qty < 24) — every row flips exactly one condition
    l(100, 3, 1, 1, 23.0, 1000.0, 0.05, 0.02, "N", "O", _ts(1997, 1, 1))        # all edges IN
    l(100, 3, 1, 2, 24.0, 1000.0, 0.06, 0.02, "N", "O", _ts(1997, 6, 1))        # qty OUT (=24)
    l(100, 3, 1, 3, 23.0, 1000.0, 0.07, 0.02, "N", "O", _ts(1997, 12, 31, 23, 59, 59))  # IN at top edges
    l(100, 3, 1, 4, 23.0, 1000.0, 0.08, 0.02, "N", "O", _ts(1997, 6, 1))        # disc OUT
    l(100, 3, 1, 5, 23.0, 1000.0, 0.04, 0.02, "N", "O", _ts(1997, 6, 1))        # disc OUT (low)
    l(100, 3, 1, 6, 23.0, 1000.0, 0.06, 0.02, "N", "O", _ts(1996, 12, 31, 23, 59, 59))  # date OUT
    l(100, 3, 1, 7, 23.0, 1000.0, 0.06, 0.02, "N", "O", _ts(1998, 1, 1))        # date OUT (=end)
    # --- q14 September window edges (PROMO part 2 vs non-promo part 3)
    l(102, 2, 3, 1, 5.0, 500.0, 0.1, 0.01, "N", "O", _ts(1997, 9, 1))           # IN, promo
    l(102, 3, 3, 2, 5.0, 500.0, 0.1, 0.01, "N", "O", _ts(1997, 9, 30, 23, 59, 59))  # IN, non-promo
    l(102, 2, 3, 3, 5.0, 500.0, 0.1, 0.01, "N", "O", _ts(1997, 10, 1))          # OUT (=end)
    l(102, 2, 3, 4, 5.0, 500.0, 0.1, 0.01, "N", "O", _ts(1997, 8, 31, 23, 59, 59))  # OUT
    # --- q19 band edges: brand/size/quantity triple-matched
    l(103, 6, 1, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", _ts(1997, 2, 1))   # band1 low edge IN
    l(103, 6, 1, 2, 11.0, 100.0, 0.0, 0.0, "N", "O", _ts(1997, 2, 2))  # band1 high edge IN
    l(103, 6, 1, 3, 12.0, 100.0, 0.0, 0.0, "N", "O", _ts(1997, 2, 3))  # band1 OUT
    l(103, 2, 1, 4, 10.0, 100.0, 0.0, 0.0, "N", "O", _ts(1997, 2, 4))  # band2 low edge IN
    l(103, 2, 1, 5, 20.0, 100.0, 0.0, 0.0, "N", "O", _ts(1997, 2, 5))  # band2 high edge IN
    l(103, 3, 1, 6, 20.0, 100.0, 0.0, 0.0, "N", "O", _ts(1997, 2, 6))  # band3 low edge IN
    l(103, 3, 1, 7, 30.0, 100.0, 0.0, 0.0, "N", "O", _ts(1997, 2, 7))  # band3 high edge IN
    l(103, 3, 1, 8, 31.0, 100.0, 0.0, 0.0, "N", "O", _ts(1997, 2, 8))  # band3 OUT
    l(103, 9, 1, 9, 5.0, 100.0, 0.0, 0.0, "N", "O", _ts(1997, 2, 9))   # NULL size: never matches
    # --- f1/f2 edges: qty >= 30, returnflag R with qty >= 10
    l(104, 1, 3, 1, 30.0, 200.0, 0.01, 0.01, "R", "F", _ts(1997, 3, 1))  # both IN
    l(104, 1, 3, 2, 29.0, 200.0, 0.01, 0.01, "R", "F", _ts(1997, 3, 2))  # f1 OUT
    l(104, 1, 3, 3, 10.0, 200.0, 0.01, 0.01, "R", "O", _ts(1997, 3, 3))  # f2 IN at edge
    l(104, 1, 3, 4, 9.0, 200.0, 0.01, 0.01, "R", "O", _ts(1997, 3, 4))   # f2 OUT
    l(104, 1, 3, 5, 50.0, 200.0, 0.01, 0.01, "A", "F", _ts(1997, 3, 5))  # flag mismatch
    # --- q21 late-ship edges: o112 orderdate 1997-03-01 (F). +60d exactly
    # = 1997-04-30 (NOT late under strict >), +60d+1us late.
    l(112, 1, 1, 1, 1.0, 300.0, 0.0, 0.0, "N", "F", _ts(1997, 4, 30))
    l(112, 1, 1, 2, 1.0, 300.0, 0.0, 0.0, "N", "F", _ts(1997, 4, 30, 0, 0, 0, 1))
    l(112, 6, 3, 3, 1.0, 300.0, 0.0, 0.0, "N", "F", _ts(1997, 3, 10))  # other supplier ON TIME:
    #   q21's EXISTS holds and NOT EXISTS holds -> supp one waits (numwait
    #   counts ONLY the +1us row; the exactly-+60d row is not late)
    l(113, 1, 2, 1, 1.0, 300.0, 0.0, 0.0, "N", "F", _ts(1997, 6, 2))  # late, OTHER NATION_1
    l(113, 6, 1, 2, 1.0, 300.0, 0.0, 0.0, "N", "F", _ts(1997, 6, 3))  # BOTH suppliers late:
    #   NOT EXISTS fails -> order 113 contributes to nobody
    # --- q15 revenue tie: supp 1 and supp 3, same extendedprice*(1-disc),
    # inside the [1997-01-01, 1997-04-01) window
    l(119, 4, 1, 1, 2.0, 800.0, 0.25, 0.0, "N", "O", _ts(1997, 1, 20))  # 600.0
    l(119, 4, 3, 2, 2.0, 600.0, 0.0, 0.0, "N", "O", _ts(1997, 1, 21))   # 600.0 tie
    # --- q17 Brand#1 (part 8): quantities sum to exactly 20.00 over 5
    # rows, so the DECIMAL(38,2) threshold qty*5*cnt < sum means qty < 0.8
    # STRICTLY: the 0.80 row sits exactly AT the boundary (excluded), the
    # 0.50 row is the only revenue contributor
    l(105, 8, 6, 1, 0.80, 50.0, 0.0, 0.0, "N", "O", _ts(1997, 5, 1))
    l(105, 8, 6, 2, 0.50, 50.0, 0.0, 0.0, "N", "O", _ts(1997, 5, 2))
    l(105, 8, 6, 3, 4.70, 50.0, 0.0, 0.0, "N", "O", _ts(1997, 5, 3))
    l(105, 8, 6, 4, 5.00, 50.0, 0.0, 0.0, "N", "O", _ts(1997, 5, 4))
    l(105, 8, 6, 5, 9.00, 50.0, 0.0, 0.0, "N", "O", _ts(1997, 5, 5))
    # --- q18 heavy orders: sums 120 and 80 straddle the common 100 cut
    l(115, 1, 1, 1, 60.0, 700.0, 0.0, 0.0, "N", "O", _ts(1997, 10, 7))
    l(115, 1, 1, 2, 60.0, 700.0, 0.0, 0.0, "N", "O", _ts(1997, 10, 8))
    l(116, 1, 1, 1, 80.0, 700.0, 0.0, 0.0, "N", "O", _ts(1997, 10, 9))
    # --- NULL arithmetic: NULL discount and NULL tax propagate identically
    l(106, 3, 6, 1, 3.0, 400.0, None, 0.02, "N", "O", _ts(1997, 6, 3))
    l(106, 3, 6, 2, 3.0, 400.0, 0.02, None, "A", "F", _ts(1997, 6, 4))
    # --- exact duplicate rows (multiset semantics) + price ties
    l(107, 6, 7, 1, 7.0, 900.0, 0.03, 0.01, "N", "O", _ts(1997, 7, 5))
    l(107, 6, 7, 1, 7.0, 900.0, 0.03, 0.01, "N", "O", _ts(1997, 7, 5))
    l(108, 6, 7, 1, 7.0, 900.0, 0.03, 0.01, "R", "F", _ts(1997, 7, 6))
    # --- orphan foreign keys: no order / no part / no supplier
    l(88888, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", _ts(1997, 8, 5))
    l(109, 77777, 1, 2, 1.0, 10.0, 0.0, 0.0, "N", "O", _ts(1997, 8, 6))
    l(109, 1, 66666, 3, 1.0, 10.0, 0.0, 0.0, "N", "O", _ts(1997, 8, 7))
    # --- reshape_unpivot material (orderkey < 100) with a NULL measure
    l(99, 6, 9, 1, 2.0, 111.0, 0.04, 0.01, "N", "O", _ts(1997, 12, 2))
    l(99, 6, 9, 2, 3.0, 222.0, None, 0.02, "N", "O", _ts(1997, 12, 3))
    # --- zero/negative prices, zero quantity
    l(110, 5, 5, 1, 0.0, 0.0, 0.0, 0.0, "N", "O", _ts(1997, 8, 8))
    l(110, 5, 5, 2, 1.0, -100.0, 0.5, 0.1, "A", "F", _ts(1997, 8, 9))
    # --- 100% discount: revenue contribution exactly zero
    l(111, 4, 8, 1, 2.0, 500.0, 1.0, 0.0, "N", "O", _ts(1997, 8, 10))
    # --- the 1995/1996 window material for q7/q8 volume years: order 100
    # (AMERICA cust, 1995) gets a NATION_0-supplier STANDARD line for q8's
    # numerator beside its NATION_1-supplier q6-block lines; order 120
    # (AMERICA cust, 1996) a NATION_2-supplier STANDARD line (denominator
    # only)
    l(100, 3, 5, 8, 2.0, 1000.0, 0.2, 0.0, "N", "F", _ts(1997, 6, 5))
    l(120, 4, 3, 1, 3.0, 1200.0, 0.1, 0.0, "N", "O", _ts(1996, 7, 1))
    l(101, 3, 1, 1, 4.0, 1500.0, 0.1, 0.0, "N", "F", _ts(1995, 1, 2))
    l(118, 3, 2, 1, 4.0, 1500.0, 0.1, 0.0, "N", "F", _ts(1996, 6, 15))
    # --- q20 excess stock: supplier 6 (NATION_9) is arithmetically in the
    # DERIVED partsupp of part 1 ('small%'), and this 1996 shipment makes
    # it appear in the shipped CTE with qty << 2*availqty
    l(118, 1, 6, 2, 5.0, 100.0, 0.0, 0.0, "N", "F", _ts(1996, 7, 2))
    return region, nation, customer, supplier, part, orders, lineitem


def _write_tables(d, region, nation, customer, supplier, part, orders, lineitem):
    def col(rows, i):
        return [r[i] for r in rows]

    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(col(region, 0), pa.int32()),
                "r_name": pa.array(col(region, 1), pa.string()),
            }
        ),
        f"{d}/region.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(col(nation, 0), pa.int32()),
                "n_name": pa.array(col(nation, 1), pa.string()),
                "n_regionkey": pa.array(col(nation, 2), pa.int32()),
            }
        ),
        f"{d}/nation.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(col(customer, 0), pa.int64()),
                "c_name": pa.array(col(customer, 1), pa.string()),
                "c_nationkey": pa.array(col(customer, 2), pa.int32()),
                "c_acctbal": pa.array(col(customer, 3), pa.float64()),
                "c_mktsegment": pa.array(col(customer, 4), pa.string()),
            }
        ),
        f"{d}/customer.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(col(supplier, 0), pa.int64()),
                "s_name": pa.array(col(supplier, 1), pa.string()),
                "s_nationkey": pa.array(col(supplier, 2), pa.int32()),
                "s_acctbal": pa.array(col(supplier, 3), pa.float64()),
            }
        ),
        f"{d}/supplier.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(col(part, 0), pa.int64()),
                "p_name": pa.array(col(part, 1), pa.string()),
                "p_brand": pa.array(col(part, 2), pa.string()),
                "p_type": pa.array(col(part, 3), pa.string()),
                "p_size": pa.array(col(part, 4), pa.int32()),
                "p_retailprice": pa.array(col(part, 5), pa.float64()),
            }
        ),
        f"{d}/part.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(col(orders, 0), pa.int64()),
                "o_custkey": pa.array(col(orders, 1), pa.int64()),
                "o_orderstatus": pa.array(col(orders, 2), pa.string()),
                "o_totalprice": pa.array(col(orders, 3), pa.float64()),
                "o_orderdate": pa.array(col(orders, 4), pa.timestamp("us")),
                "o_orderpriority": pa.array(col(orders, 5), pa.string()),
            }
        ),
        f"{d}/orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(col(lineitem, 0), pa.int64()),
                "l_partkey": pa.array(col(lineitem, 1), pa.int64()),
                "l_suppkey": pa.array(col(lineitem, 2), pa.int64()),
                "l_linenumber": pa.array(col(lineitem, 3), pa.int32()),
                "l_quantity": pa.array(col(lineitem, 4), pa.float64()),
                "l_extendedprice": pa.array(col(lineitem, 5), pa.float64()),
                "l_discount": pa.array(col(lineitem, 6), pa.float64()),
                "l_tax": pa.array(col(lineitem, 7), pa.float64()),
                "l_returnflag": pa.array(col(lineitem, 8), pa.string()),
                "l_linestatus": pa.array(col(lineitem, 9), pa.string()),
                "l_shipdate": pa.array(col(lineitem, 10), pa.timestamp("us")),
            }
        ),
        f"{d}/lineitem.parquet",
    )


@pytest.fixture(scope="module")
def tpch_adv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_tpch")
    _write_tables(str(d), *_tables())
    return str(d)


@pytest.fixture(scope="module")
def tpch_adv_con(tpch_adv_dir):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{tpch_adv_dir}/{t}.parquet'"
        )
    yield con
    con.close()


#: every registry entry whose Spark plan AND oracle read only the seven
#: TPC-H tables (curated like the other families' lists)
TPCH_ONLY_ENTRIES = [
    "a2_horizontal_sum",
    "a4_count_nonempty",
    "agg_cube",
    "agg_grouping_sets",
    "agg_rollup",
    "c1_skill_points",
    "c6_date_functions",
    "dq_referential_integrity",
    "f2_conjunctive_filter",
    "f7_tag_projection",
    "j2_enrichment_join",
    "j5_semi_probe",
    "j6_anti_probe",
    "j9_not_in_null_aware",
    "reshape_unpivot",
    "s1_scan_pushdown",
    "s4_topk_scan",
    "s5_keyed_snapshot",
    "s6_exists_probe",
    "tpch_q1_pricing_summary",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_type_profit",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_priority_class",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_parts_supplier_relationship",
    "tpch_q17_small_quantity_revenue",
    "tpch_q18_large_orders",
    "tpch_q19_disjunctive_pred",
    "tpch_q20_excess_stock",
    "tpch_q21_waiting_supplier",
    "tpch_q22_sales_opportunity",
    "graph_link_prediction",
    "j10_interval_overlap",
    "u1_union_tagged",
    "w1_rank_desc",
    "w5_points_from_rank",
    "wx_ntile",
    "wx_partitioned_rank",
    "wx_percent_rank",
    "wx_rank_vs_dense_rank",
    # k5_row_merge writes a staging table — sink entries are covered by
    # their own crash-matrix tests, not oracle corpora
]


@pytest.mark.parametrize("name", TPCH_ONLY_ENTRIES)
def test_tpch_entry_matches_oracle_on_adversarial_corpus(
    spark, tpch_adv_dir, tpch_adv_con, name
):
    got = QUERIES[name](spark, tpch_adv_dir)
    want = tpch_adv_con.execute(ORACLE[name]).fetchdf()
    compare(got, want, name=f"{name}@adversarial-tpch")


# ---------------------------------------------------------------------------
# seeded fuzz: randomized 7-table corpora with boundary-weighted draws
# ---------------------------------------------------------------------------


def _fuzz_tpch(seed):
    """Random TPC-H-shaped corpus whose distributions are WEIGHTED toward
    the hazard manifold: dates draw 25% from the exact predicate-boundary
    list, quantities 30% from the band-edge set, discounts 30% from q6's
    edge values, and every nullable non-key column goes NULL ~7% of the
    time; ~5% of lineitems reference a nonexistent order. Two seeds run
    per entry — different corpus, same required Spark == DuckDB
    equality."""
    import random

    rng = random.Random(seed)
    boundary_dates = [
        _ts(1995, 1, 1), _ts(1996, 1, 1), _ts(1997, 1, 1), _ts(1997, 4, 1),
        _ts(1997, 9, 1), _ts(1997, 10, 1), _ts(1998, 1, 1),
        _ts(1996, 12, 31, 23, 59, 59, 999999), _ts(1997, 3, 31, 23, 59, 59),
    ]

    def rdate():
        if rng.random() < 0.25:
            return rng.choice(boundary_dates)
        base = _ts(1994, 6, 1) + dt.timedelta(
            seconds=rng.randrange(0, 4 * 365 * 86400), microseconds=rng.randrange(0, 1000000)
        )
        return base

    def maybe_null(v, p=0.07):
        return None if rng.random() < p else v

    region = [(i, n) for i, n in enumerate(
        ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])]
    nation = [
        (k, f"NATION_{rng.randrange(0, 12)}" if rng.random() < 0.5 else f"NATION_{k}",
         rng.randrange(0, 6))  # regionkey 5 is an orphan
        for k in range(10)
    ]
    segs = ["BUILDING", "MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "FURNITURE", "building"]
    customer = [
        (k, f"cust {k % 7}", rng.randrange(0, 11), maybe_null(round(rng.uniform(-1000, 9000), 2)),
         rng.choice(segs))
        for k in range(1, 31)
    ]
    supplier = [
        (k, f"supp {k % 5}", rng.randrange(0, 11), maybe_null(round(rng.uniform(-100, 5000), 2)))
        for k in range(1, 13)
    ]
    name_frags = ["small", "red", "blue", "large", "cold", "smallish", "reddish", "RED"]
    types = ["LARGE", "STANDARD", "SMALL", "MEDIUM", "ECONOMY", "PROMO"]
    part = [
        (k, f"{rng.choice(name_frags)} {rng.choice(['widget', 'bolt', 'rod', 'cap'])}",
         f"Brand#{rng.choice([1, 12, 23, 24, rng.randrange(1, 26)])}",
         rng.choice(types), maybe_null(rng.choice([1, 5, 10, 14, 15, rng.randrange(1, 51)])),
         round(rng.uniform(0, 100), 2))
        for k in range(1, 21)
    ]
    statuses = ["F", "O", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    orders = [
        (k, rng.choice(customer)[0] if rng.random() > 0.04 else 9999,
         rng.choice(statuses),
         maybe_null(round(rng.uniform(-500, 150000), 2)),
         maybe_null(rdate()), rng.choice(prios))
        for k in range(1, 81)
    ]
    qty_edges = [1.0, 10.0, 11.0, 20.0, 23.0, 24.0, 30.0]
    disc_edges = [0.0, 0.04, 0.05, 0.06, 0.07, 0.08, 1.0]
    lineitem = []
    for i in range(300):
        okey = rng.choice(orders)[0] if rng.random() > 0.05 else 88888 + i
        qty = rng.choice(qty_edges) if rng.random() < 0.3 else float(rng.randrange(1, 51))
        disc = rng.choice(disc_edges) if rng.random() < 0.3 else round(rng.uniform(0, 0.2), 2)
        lineitem.append(
            (okey, rng.choice(part)[0], rng.choice(supplier)[0], i % 7 + 1,
             qty, round(rng.uniform(0, 2000), 2), maybe_null(disc),
             maybe_null(round(rng.uniform(0, 0.1), 2)),
             rng.choice(["N", "A", "R"]), rng.choice(["O", "F"]), rdate())
        )
    return region, nation, customer, supplier, part, orders, lineitem


@pytest.fixture(scope="module", params=[71, 72])
def tpch_fuzz_setup(tmp_path_factory, request):
    d = tmp_path_factory.mktemp(f"fuzz_tpch_{request.param}")
    region, nation, customer, supplier, part, orders, lineitem = _fuzz_tpch(
        request.param
    )
    _write_tables(str(d), region, nation, customer, supplier, part, orders, lineitem)
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    yield str(d), con
    con.close()


@pytest.mark.parametrize("name", TPCH_ONLY_ENTRIES)
def test_tpch_entry_matches_oracle_on_fuzz_corpus(spark, tpch_fuzz_setup, name):
    d, con = tpch_fuzz_setup
    compare(QUERIES[name](spark, d), con.execute(ORACLE[name]).fetchdf(),
            name=f"{name}@fuzz-tpch")
