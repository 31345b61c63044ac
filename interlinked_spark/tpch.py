"""TPC-H suite on the engine's operator library (SURVEY §2b coverage
widening, round 8).

The driver's testdata is TPC-H-ish (TESTDATA.md): the eight classic
tables minus ``partsupp``, with a reduced column set (no
``l_commitdate``/``l_receiptdate``/``l_shipmode``/``l_shipinstruct``,
no ``p_container``/``p_mfgr``, no ``c_phone``/``c_address``, no
comments).  This module implements every TPC-H query expressible on
that schema — faithful where all referenced columns exist, and
shape-preserving adaptations (documented per query) where a filter
column is absent.  Q1/Q3/Q5 already live in the main catalog as
``pricing_summary``/``top_orders``/``region_revenue``; Q2/Q11/Q16/Q20
need ``partsupp`` and Q12 needs ``l_shipmode``/``l_commitdate``, so
they are out of schema scope (recorded in COVERAGE.md).

Adaptation conventions:

* "late" (Q4/Q21, originally ``l_receiptdate > l_commitdate``) becomes
  ``l_shipdate > o_orderdate + 120 days`` — same correlated-predicate
  shape, expressible columns.
* Q13's ``o_comment NOT LIKE`` exclusion becomes an
  ``o_orderpriority <> '5-LOW'`` join predicate — still a non-key
  predicate inside the left join, which is the shape the query tests.
* Q17/Q19 drop the absent ``p_container``/``l_shipinstruct`` terms and
  keep the brand/size/quantity terms; the correlated-scalar-subquery
  (Q17) and disjunction-of-conjunctions (Q19) shapes are intact.
* Q22's phone-prefix country code becomes ``c_nationkey``, and "never
  ordered" becomes "no order since 2000-01-01" (this dataset has no
  order-less customers) — the anti-join + above-positive-average
  scalar subquery shape is intact.

Plan notes (the 100-TB posture): ``nation``/``region`` are O(100)-row
dims at every scale factor — always broadcast.  ``supplier``/``part``/
``customer`` scale with SF, so they join via plain equi-joins and AQE
picks the strategy from observed sizes; selective dim filters are
applied BELOW the join so Catalyst prunes and pushes them into the
scan.  Correlated subqueries (Q17/Q21/Q22) are implemented
decorrelated — per-group aggregates joined back — which is the plan
Catalyst produces for the SQL form and the only shape that scales.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .catalog import _rev, defq
from .operators import (
    anti_join,
    broadcast_join,
    equi_join,
    group_agg,
    semi_join,
    top_k,
)

_LATE = "INTERVAL 120 DAYS"  # adaptation of receipt-after-commit lateness


def _late_col() -> F.Column:
    return F.col("l_shipdate") > F.col("o_orderdate") + F.expr(_LATE)


@defq(
    "tpch_q04",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 120 DAY)
    GROUP BY o_orderpriority
    """,
    o="table.orders",
    li="table.lineitem",
)
def q_tpch_q04(o: DataFrame, li: DataFrame) -> DataFrame:
    """TPC-H Q4 (order priority checking), lateness adapted to
    ship-vs-order date: correlated EXISTS -> left-semi join with a
    non-equi conjunct, then priority counts (§2b-C/D)."""
    quarter = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late = semi_join(
        quarter,
        li.select("l_orderkey", "l_shipdate"),
        on=(F.col("o_orderkey") == F.col("l_orderkey")) & _late_col(),
    )
    return group_agg(late, ["o_orderpriority"], {"order_count": F.count("*")})


@defq(
    "tpch_q06",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    li="table.lineitem",
)
def q_tpch_q06(li: DataFrame) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change), faithful: every predicate
    pushes to the parquet scan; single partial+final aggregate, no
    shuffle of data rows (§2b-B/D)."""
    f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue")
    )


@defq(
    "tpch_q07",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS INTEGER) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier s
          JOIN lineitem l ON s.s_suppkey = l.l_suppkey
          JOIN orders o   ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
          JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
          WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
              OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
            AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                               AND TIMESTAMP '1997-12-31') shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    li="table.lineitem",
    o="table.orders",
    c="table.customer",
    s="table.supplier",
    n="table.nation",
)
def q_tpch_q07(
    li: DataFrame, o: DataFrame, c: DataFrame, s: DataFrame, n: DataFrame
) -> DataFrame:
    """TPC-H Q7 (volume shipping), faithful: two broadcast nation
    look-ups tag both trade directions; the disjunctive nation-pair
    predicate filters AFTER both tags exist, so each fact row shuffles
    at most twice (orders, customer) (§2b-C)."""
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    shipped = li.filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    supp = broadcast_join(s, n1, on=F.col("s_nationkey") == F.col("s_nkey")).filter(
        F.col("supp_nation").isin("NATION_3", "NATION_8")
    )
    cust = broadcast_join(c, n2, on=F.col("c_nationkey") == F.col("c_nkey")).filter(
        F.col("cust_nation").isin("NATION_3", "NATION_8")
    )
    joined = equi_join(
        equi_join(
            equi_join(shipped, supp, on=F.col("l_suppkey") == F.col("s_suppkey")),
            o,
            on=F.col("l_orderkey") == F.col("o_orderkey"),
        ),
        cust,
        on=F.col("o_custkey") == F.col("c_custkey"),
    ).filter(F.col("supp_nation") != F.col("cust_nation"))
    return group_agg(
        joined.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            _rev().alias("volume"),
        ),
        ["supp_nation", "cust_nation", "l_year"],
        {"revenue": F.round(F.sum("volume"), 2)},
    )


@defq(
    "tpch_q08",
    oracle="""
    SELECT o_year,
           ROUND(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
                 / SUM(volume), 6) AS mkt_share
    FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                 l_extendedprice * (1 - l_discount) AS volume,
                 n2.n_name AS nation
          FROM part p
          JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o   ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
          JOIN region r   ON n1.n_regionkey = r.r_regionkey
          JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
          WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO'
            AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                                  AND TIMESTAMP '1997-12-31') all_nations
    GROUP BY o_year
    """,
    li="table.lineitem",
    o="table.orders",
    c="table.customer",
    s="table.supplier",
    p="table.part",
    n="table.nation",
    r="table.region",
)
def q_tpch_q08(
    li: DataFrame,
    o: DataFrame,
    c: DataFrame,
    s: DataFrame,
    p: DataFrame,
    n: DataFrame,
    r: DataFrame,
) -> DataFrame:
    """TPC-H Q8 (national market share), faithful: the numerator is a
    conditional aggregate over the SAME joined set (one pass, no self
    join); part/customer filters sit below their joins for pushdown
    (§2b-C/D)."""
    euro_nations = broadcast_join(
        n, r.filter(F.col("r_name") == "EUROPE"), on=F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("c_nkey"))
    n2 = n.select(F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation"))
    promo = p.filter(F.col("p_type") == "PROMO").select("p_partkey")
    window_orders = o.filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    joined = equi_join(
        equi_join(li, promo, on=F.col("l_partkey") == F.col("p_partkey")),
        window_orders,
        on=F.col("l_orderkey") == F.col("o_orderkey"),
    )
    joined = semi_join(
        equi_join(joined, c, on=F.col("o_custkey") == F.col("c_custkey")),
        F.broadcast(euro_nations),
        on=F.col("c_nationkey") == F.col("c_nkey"),
    )
    joined = broadcast_join(
        equi_join(joined, s, on=F.col("l_suppkey") == F.col("s_suppkey")),
        n2,
        on=F.col("s_nationkey") == F.col("s_nkey"),
    )
    tagged = joined.select(
        F.year("o_orderdate").cast("int").alias("o_year"),
        _rev().alias("volume"),
        "nation",
    )
    return group_agg(
        tagged,
        ["o_year"],
        {
            "mkt_share": F.round(
                F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0.0)))
                / F.sum("volume"),
                6,
            )
        },
    )


@defq(
    "tpch_q09",
    oracle="""
    SELECT nation, o_year, ROUND(SUM(amount), 2) AS sum_profit
    FROM (SELECT n.n_name AS nation,
                 CAST(year(o_orderdate) AS INTEGER) AS o_year,
                 l_extendedprice * (1 - l_discount)
                   - 0.1 * p_retailprice * l_quantity AS amount
          FROM part p
          JOIN lineitem l ON p.p_partkey = l.l_partkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o   ON o.o_orderkey = l.l_orderkey
          JOIN nation n   ON s.s_nationkey = n.n_nationkey
          WHERE p.p_name LIKE '%red%') profit
    GROUP BY nation, o_year
    """,
    li="table.lineitem",
    o="table.orders",
    s="table.supplier",
    p="table.part",
    n="table.nation",
)
def q_tpch_q09(
    li: DataFrame, o: DataFrame, s: DataFrame, p: DataFrame, n: DataFrame
) -> DataFrame:
    """TPC-H Q9 (product type profit), cost adapted: ``partsupp`` is
    out of schema, so supply cost is proxied as ``0.1 * p_retailprice *
    l_quantity`` — the 5-way join + name-LIKE filter + nation x year
    aggregate shape is intact (§2b-C/D/H)."""
    red_parts = p.filter(F.col("p_name").like("%red%")).select("p_partkey", "p_retailprice")
    joined = equi_join(
        equi_join(
            equi_join(li, red_parts, on=F.col("l_partkey") == F.col("p_partkey")),
            o.select("o_orderkey", "o_orderdate"),
            on=F.col("l_orderkey") == F.col("o_orderkey"),
        ),
        s.select("s_suppkey", "s_nationkey"),
        on=F.col("l_suppkey") == F.col("s_suppkey"),
    )
    joined = broadcast_join(
        joined,
        n.select("n_nationkey", F.col("n_name").alias("nation")),
        on=F.col("s_nationkey") == F.col("n_nationkey"),
    )
    amount = _rev() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return group_agg(
        joined.select(
            "nation", F.year("o_orderdate").cast("int").alias("o_year"), amount.alias("amount")
        ),
        ["nation", "o_year"],
        {"sum_profit": F.round(F.sum("amount"), 2)},
    )


@defq(
    "tpch_q10",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           ROUND(c.c_acctbal, 2) AS acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    li="table.lineitem",
    o="table.orders",
    c="table.customer",
    n="table.nation",
)
def q_tpch_q10(li: DataFrame, o: DataFrame, c: DataFrame, n: DataFrame) -> DataFrame:
    """TPC-H Q10 (returned item reporting), faithful minus the absent
    address/phone/comment output columns: quarter + returnflag filters
    below the joins, broadcast nation, global top-20 with key
    tie-break (§2b-C/F)."""
    quarter = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    returned = li.filter(F.col("l_returnflag") == "R")
    joined = equi_join(
        equi_join(returned, quarter, on=F.col("l_orderkey") == F.col("o_orderkey")),
        c,
        on=F.col("o_custkey") == F.col("c_custkey"),
    )
    joined = broadcast_join(joined, n, on=F.col("c_nationkey") == F.col("n_nationkey"))
    agg = group_agg(
        joined.select(
            "c_custkey",
            "c_name",
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            "n_name",
            _rev().alias("rev"),
        ),
        ["c_custkey", "c_name", "acctbal", "n_name"],
        {"revenue": F.round(F.sum("rev"), 2)},
    ).select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
    return top_k(agg, [F.col("revenue").desc(), F.col("c_custkey").asc()], 20)


@defq(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                            AND o.o_orderpriority <> '5-LOW'
          GROUP BY c.c_custkey) c_orders
    GROUP BY c_count
    """,
    o="table.orders",
    c="table.customer",
)
def q_tpch_q13(o: DataFrame, c: DataFrame) -> DataFrame:
    """TPC-H Q13 (customer distribution), exclusion adapted: the
    comment NOT-LIKE becomes a priority predicate INSIDE the left join
    (same shape: unmatched customers must still count as 0); two-level
    aggregate (§2b-C/D)."""
    kept = o.filter(F.col("o_orderpriority") != "5-LOW").select("o_custkey", "o_orderkey")
    per_cust = group_agg(
        equi_join(
            c.select("c_custkey"), kept, on=F.col("c_custkey") == F.col("o_custkey"), how="left"
        ),
        ["c_custkey"],
        {"c_count": F.count("o_orderkey")},
    )
    return group_agg(per_cust, ["c_count"], {"custdist": F.count("*")})


@defq(
    "tpch_q14",
    oracle="""
    SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
    li="table.lineitem",
    p="table.part",
)
def q_tpch_q14(li: DataFrame, p: DataFrame) -> DataFrame:
    """TPC-H Q14 (promotion effect), faithful: month filter pushes to
    the lineitem scan; conditional-vs-total ratio in one aggregate
    pass (§2b-C/D)."""
    month = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    joined = equi_join(
        month, p.select("p_partkey", "p_type"), on=F.col("l_partkey") == F.col("p_partkey")
    )
    rev = _rev()
    return joined.agg(
        F.round(
            100.0
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
            / F.sum(rev),
            6,
        ).alias("promo_revenue")
    )


@defq(
    "tpch_q15",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    li="table.lineitem",
    s="table.supplier",
)
def q_tpch_q15(li: DataFrame, s: DataFrame) -> DataFrame:
    """TPC-H Q15 (top supplier): the revenue "view" is computed once
    and reused for both the per-supplier rows and the scalar MAX —
    Catalyst reuses the aggregated exchange; the one-row max broadcasts
    (§2b-C/D).  Revenue is rounded BEFORE the max-equality so the
    comparison is on stable 2-dp values in both engines."""
    quarter = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = group_agg(
        quarter.select(F.col("l_suppkey").alias("supplier_no"), _rev().alias("rev")),
        ["supplier_no"],
        {"total_revenue": F.round(F.sum("rev"), 2)},
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    best = broadcast_join(
        revenue, top, on=F.col("total_revenue") == F.col("max_revenue")
    ).select("supplier_no", "total_revenue")
    return equi_join(
        s.select("s_suppkey", "s_name"), best, on=F.col("s_suppkey") == F.col("supplier_no")
    ).select("s_suppkey", "s_name", "total_revenue")


@defq(
    "tpch_q17",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
    li="table.lineitem",
    p="table.part",
)
def q_tpch_q17(li: DataFrame, p: DataFrame) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue), container term
    dropped (out of schema): the correlated per-part AVG scalar
    subquery is implemented decorrelated — per-part thresholds
    aggregated once over the brand-pruned lineitems, joined back
    (§2b-C/D; the plan Catalyst itself produces for the SQL form)."""
    brand_parts = p.filter(F.col("p_brand") == "Brand#23").select("p_partkey")
    li_brand = equi_join(
        li.select("l_partkey", "l_quantity", "l_extendedprice"),
        brand_parts,
        on=F.col("l_partkey") == F.col("p_partkey"),
    )
    thresholds = group_agg(
        li_brand.select(F.col("l_partkey").alias("t_partkey"), "l_quantity"),
        ["t_partkey"],
        {"qty_threshold": 0.2 * F.avg("l_quantity")},
    )
    small = equi_join(
        li_brand, thresholds, on=F.col("l_partkey") == F.col("t_partkey")
    ).filter(F.col("l_quantity") < F.col("qty_threshold"))
    return small.agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))


@defq(
    "tpch_q18",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS orderdate,
           ROUND(o.o_totalprice, 2) AS totalprice,
           ROUND(SUM(l.l_quantity), 2) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING SUM(l_quantity) > 200)
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, orderdate, totalprice
    ORDER BY totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
    li="table.lineitem",
    o="table.orders",
    c="table.customer",
)
def q_tpch_q18(li: DataFrame, o: DataFrame, c: DataFrame) -> DataFrame:
    """TPC-H Q18 (large volume customer), faithful: the IN-subquery is
    a left-semi join against the HAVING aggregate; quantities re-sum on
    the surviving slice only; global top-100 with key tie-break
    (§2b-C/D/F)."""
    big = group_agg(
        li.select(F.col("l_orderkey").alias("b_orderkey"), "l_quantity"),
        ["b_orderkey"],
        {"qty": F.sum("l_quantity")},
    ).filter(F.col("qty") > 200)
    kept_orders = semi_join(o, big, on=F.col("o_orderkey") == F.col("b_orderkey"))
    joined = equi_join(
        equi_join(kept_orders, c, on=F.col("o_custkey") == F.col("c_custkey")),
        li.select("l_orderkey", "l_quantity"),
        on=F.col("o_orderkey") == F.col("l_orderkey"),
    )
    agg = group_agg(
        joined.select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.round(F.col("o_totalprice"), 2).alias("totalprice"),
            "l_quantity",
        ),
        ["c_custkey", "c_name", "o_orderkey", "orderdate", "totalprice"],
        {"sum_qty": F.round(F.sum("l_quantity"), 2)},
    )
    return top_k(agg, [F.col("totalprice").desc(), F.col("o_orderkey").asc()], 100)


@defq(
    "tpch_q19",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    li="table.lineitem",
    p="table.part",
)
def q_tpch_q19(li: DataFrame, p: DataFrame) -> DataFrame:
    """TPC-H Q19 (discounted revenue), container/shipmode terms dropped
    (out of schema): the OR-of-ANDs mixes part-side and lineitem-side
    predicates, so it evaluates post-join while the union of part-side
    brand terms pre-prunes the part scan (§2b-B/C)."""
    candidate_parts = p.filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
    ).select("p_partkey", "p_brand", "p_size")
    joined = equi_join(
        li.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount"),
        candidate_parts,
        on=F.col("l_partkey") == F.col("p_partkey"),
    )
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return joined.filter(clause).agg(F.round(F.sum(_rev()), 2).alias("revenue"))


@defq(
    "tpch_q21",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F' AND n.n_name = 'NATION_3'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 120 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 120 DAY)
    GROUP BY s.s_name
    """,
    li="table.lineitem",
    o="table.orders",
    s="table.supplier",
    n="table.nation",
)
def q_tpch_q21(li: DataFrame, o: DataFrame, s: DataFrame, n: DataFrame) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting), lateness adapted
    to ship-vs-order date: the EXISTS / NOT-EXISTS pair over sibling
    lineitems decorrelates to ONE per-order aggregate — count of
    distinct suppliers and of distinct LATE suppliers — joined back to
    the late rows (multi-supplier order, exactly one late supplier).
    One pass over lineitem instead of two correlated probes (§2b-C/D)."""
    f_orders = o.filter(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    li_f = equi_join(
        li.select("l_orderkey", "l_suppkey", "l_shipdate"),
        f_orders,
        on=F.col("l_orderkey") == F.col("o_orderkey"),
    ).withColumn("is_late", _late_col())
    order_stats = group_agg(
        li_f.select(F.col("l_orderkey").alias("st_orderkey"), "l_suppkey", "is_late"),
        ["st_orderkey"],
        {
            "n_supp": F.count_distinct("l_suppkey"),
            "n_late_supp": F.count_distinct(
                F.when(F.col("is_late"), F.col("l_suppkey"))
            ),
        },
    )
    waiting = equi_join(
        li_f.filter(F.col("is_late")),
        order_stats,
        on=F.col("l_orderkey") == F.col("st_orderkey"),
    ).filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    nation_suppliers = broadcast_join(
        s,
        n.filter(F.col("n_name") == "NATION_3").select("n_nationkey"),
        on=F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    blamed = equi_join(
        waiting, nation_suppliers, on=F.col("l_suppkey") == F.col("s_suppkey")
    )
    return group_agg(blamed, ["s_name"], {"numwait": F.count("*")})


@defq(
    "tpch_q22",
    oracle="""
    SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer c
    WHERE c.c_nationkey IN (3, 8, 13, 17, 21)
      AND c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_acctbal > 0
                           AND c2.c_nationkey IN (3, 8, 13, 17, 21))
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY c_nationkey
    """,
    o="table.orders",
    c="table.customer",
)
def q_tpch_q22(o: DataFrame, c: DataFrame) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), adapted: country code =
    ``c_nationkey`` (no phone column) and dormancy = no order since
    2000-01-01 (every customer here has SOME order).  Shape intact:
    scalar above-positive-average subquery (one-row broadcast) +
    anti-join against recent orders (§2b-C/D)."""
    codes = [3, 8, 13, 17, 21]
    in_scope = c.filter(F.col("c_nationkey").isin(codes))
    avg_bal = in_scope.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = broadcast_join(in_scope, avg_bal, on=F.col("c_acctbal") > F.col("avg_bal"))
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    dormant = anti_join(rich, recent, on=F.col("c_custkey") == F.col("o_custkey"))
    return group_agg(
        dormant.select(F.col("c_nationkey").alias("cntrycode"), "c_acctbal"),
        ["cntrycode"],
        {"numcust": F.count("*"), "totacctbal": F.round(F.sum("c_acctbal"), 2)},
    )


# Q1/Q3/Q5 aliases: the implementations live in the main catalog
# (pricing_summary / top_orders / region_revenue predate this module);
# registering them under suite names makes every runnable TPC-H query
# addressable as q.tpch_q* without duplicating the logic or the
# oracle.  Oracle strings are SHARED objects (assigned below), so a fix
# to the primary entry can never diverge from its alias.


@defq("tpch_q01", li="table.lineitem")
def q_tpch_q01(li: DataFrame) -> DataFrame:
    """TPC-H Q1 (pricing summary report) — suite alias of
    ``pricing_summary`` (§2b-A/B/D; same plan, same oracle object)."""
    from . import catalog as _c

    return _c.q_pricing_summary(li)


@defq("tpch_q03", c="table.customer", o="table.orders", li="table.lineitem")
def q_tpch_q03(c: DataFrame, o: DataFrame, li: DataFrame) -> DataFrame:
    """TPC-H Q3 (shipping priority) — suite alias of ``top_orders``
    (§2b-C/F; same plan, same oracle object)."""
    from . import catalog as _c

    return _c.q_top_orders(c, o, li)


@defq(
    "tpch_q05",
    li="table.lineitem",
    o="table.orders",
    c="table.customer",
    n="table.nation",
    r="table.region",
)
def q_tpch_q05(li, o, c, n, r) -> DataFrame:
    """TPC-H Q5 (local supplier volume) — suite alias of
    ``region_revenue`` (§2b-C star join; same plan, same oracle
    object)."""
    from . import catalog as _c

    return _c.q_region_revenue(li, o, c, n, r)


from .catalog import ORACLES as _ORACLES  # noqa: E402

_ORACLES["tpch_q01"] = _ORACLES["pricing_summary"]
_ORACLES["tpch_q03"] = _ORACLES["top_orders"]
_ORACLES["tpch_q05"] = _ORACLES["region_revenue"]


# =====================================================================
# Derived partsupp — TPC-H 22/22 closure (round 10)
# =====================================================================
#
# The driver's testdata omits ``partsupp`` (TESTDATA.md), which gated
# Q2/Q11/Q16/Q20 out of scope through round 9.  Close the suite with a
# DETERMINISTIC derivation from ``part`` x ``supplier`` that both
# engines recompute identically (the oracle carries the same CTE), so
# the four queries are value-hash-gated like every other row:
#
# * ``ps_suppkey``: the dbgen spec formula (TPC-H v3 clause 4.2.3,
#   0-based-key twin): for i in 0..3,
#   ``(p + i * (S div 4 + p div S)) mod S`` with S = |supplier| —
#   4 suppliers per part, same wrap-around structure as real dbgen.
#   At toy scale (S=10, sf0.001) a step that is 0 mod S collapses the
#   four replicas; SELECT DISTINCT keeps the pair-set a primary key at
#   every SF (a no-op at spec-scale S).
# * ``ps_availqty``: spec range [1, 9999] from the md5 of the key pair
#   (first 8 hex chars) — the engine's standard cross-engine
#   deterministic-uniform (same construction as operators/sampling).
# * ``ps_supplycost``: spec range [1.00, 1000.00] in EXACT cents:
#   ``(100 + h2 mod 99900) / 100.0`` — a plain double division both
#   engines compute bit-identically (no ROUND step to diverge on).
#
# Registered as the EXACT resource ``table.partsupp``: the reference's
# exact-before-pattern routing (routing.py R1-R4) makes it win over the
# ``table.{name:identifier}`` parquet reader — the derivation is a
# first-class demonstration of that precedence rule on the hot path.

N_SUPPLIERS_PER_PART = 4

_PS_KEY_SQL = "CAST(ps_partkey AS VARCHAR) || ':' || CAST(ps_suppkey AS VARCHAR)"

# DuckDB CTE bodies (prepend to each oracle): ps0 derives the pair set,
# partsupp attaches qty/cost.  floor()-based integer division — DuckDB
# CAST rounds half-even while Spark CAST truncates, so neither bare
# CAST is portable; floor() of a nonnegative double is.
PARTSUPP_SQL_CTES = f"""
    ps0 AS (
      SELECT DISTINCT p_partkey AS ps_partkey,
             (p_partkey + t.i * (CAST(floor(S.n / 4.0) AS BIGINT)
                + CAST(floor(CAST(p_partkey AS DOUBLE) / S.n) AS BIGINT))) % S.n
               AS ps_suppkey
      FROM part,
           (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM supplier) S,
           (SELECT unnest([0, 1, 2, 3]) AS i) t),
    partsupp AS (
      SELECT ps_partkey, ps_suppkey,
             CAST(('0x' || substr(md5({_PS_KEY_SQL}), 1, 8))::BIGINT % 9999 + 1
                  AS INTEGER) AS ps_availqty,
             CAST(100 + ('0x' || substr(md5({_PS_KEY_SQL}), 9, 8))::BIGINT % 99900
                  AS DOUBLE) / 100.0 AS ps_supplycost
      FROM ps0)"""


def derive_partsupp(part: DataFrame, supplier: DataFrame) -> DataFrame:
    """Spark twin of :data:`PARTSUPP_SQL_CTES` (see module comment).

    Scale shape: |supplier| enters the plan as a one-row broadcast (no
    driver collect), the 4-way replica explode is row-local, and the
    DISTINCT is one dim-scale shuffle over 4x|part| rows — partsupp is
    a dimension table at every SF, never fact-scale."""
    nsup = supplier.agg(F.count("*").cast("long").alias("__n"))
    ps0 = (
        part.select("p_partkey")
        .crossJoin(F.broadcast(nsup))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.explode(
                F.array(*[F.lit(i) for i in range(N_SUPPLIERS_PER_PART)])
            ).alias("__i"),
            "__n",
        )
        .select(
            "ps_partkey",
            (
                (
                    F.col("ps_partkey")
                    + F.col("__i")
                    * (
                        F.floor(F.col("__n") / F.lit(4.0))
                        + F.floor(F.col("ps_partkey").cast("double") / F.col("__n"))
                    )
                )
                % F.col("__n")
            ).alias("ps_suppkey"),
        )
        .distinct()
    )
    key = F.concat(
        F.col("ps_partkey").cast("string"),
        F.lit(":"),
        F.col("ps_suppkey").cast("string"),
    )
    h1 = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(key), 9, 8), 16, 10).cast("long")
    return ps0.select(
        "ps_partkey",
        "ps_suppkey",
        (h1 % 9999 + 1).cast("int").alias("ps_availqty"),
        ((F.lit(100) + h2 % 99900).cast("double") / 100.0).alias("ps_supplycost"),
    )


from .catalog import WKF as _WKF  # noqa: E402


@_WKF.depend(p="table.part", s="table.supplier")
@_WKF.provide("table.partsupp")
def t_partsupp(p: DataFrame, s: DataFrame) -> DataFrame:
    """Exact route beating the ``table.{name:identifier}`` pattern
    (reference routing R1: exact-first) — ``partsupp`` has no parquet
    file, so the resource derives it (see :func:`derive_partsupp`)."""
    return derive_partsupp(p, s)


@defq(
    "tpch_q02",
    oracle=f"""
    WITH {PARTSUPP_SQL_CTES}
    SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey,
           p_type, ROUND(ps_supplycost, 2) AS ps_supplycost
    FROM partsupp
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN region ON r_regionkey = n_regionkey
    JOIN part ON p_partkey = ps_partkey
    WHERE r_name = 'EUROPE' AND p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
      AND ps_supplycost = (
        SELECT MIN(ps2.ps_supplycost)
        FROM partsupp ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
        JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
        JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
        WHERE ps2.ps_partkey = partsupp.ps_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    p="table.part",
    ps="table.partsupp",
    s="table.supplier",
    n="table.nation",
    r="table.region",
)
def q_tpch_q02(
    p: DataFrame, ps: DataFrame, s: DataFrame, n: DataFrame, r: DataFrame
) -> DataFrame:
    """TPC-H Q2 (minimum cost supplier) on the derived ``partsupp``;
    ``p_type LIKE '%BRASS'`` adapted to this schema's categorical
    ``p_type = 'STANDARD'`` (and ``p_size = 15`` widened to a 10-20 band
    so the result is a non-trivial hash gate at small SF) and the absent ``p_mfgr``/``s_address``/
    ``s_phone``/``s_comment`` output columns dropped.  The correlated
    MIN subquery is implemented DECORRELATED: the region-filtered
    partsupp aggregates min cost per part once, then joins back on
    ``(partkey, cost)`` — the plan Catalyst produces for the SQL form
    and the only shape that scales (§2b-C correlated-subquery family).
    nation x region broadcast (O(100) dims); the min-cost frame is
    part-keyed and AQE picks its join strategy from observed size."""
    eu_sup = equi_join(
        s,
        broadcast_join(
            n,
            r.filter(F.col("r_name") == "EUROPE").select("r_regionkey"),
            on=F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name"),
        on=F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    ps_eu = equi_join(ps, eu_sup, on=F.col("ps_suppkey") == F.col("s_suppkey"))
    min_cost = group_agg(
        ps_eu.select(F.col("ps_partkey").alias("mc_partkey"), "ps_supplycost"),
        ["mc_partkey"],
        {"min_cost": F.min("ps_supplycost")},
    )
    cheapest = equi_join(
        ps_eu,
        min_cost,
        on=(F.col("ps_partkey") == F.col("mc_partkey"))
        & (F.col("ps_supplycost") == F.col("min_cost")),
    )
    target = p.filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    ).select(
        "p_partkey", "p_type"
    )
    res = equi_join(cheapest, target, on=F.col("ps_partkey") == F.col("p_partkey")).select(
        F.round("s_acctbal", 2).alias("s_acctbal"),
        "s_name",
        "n_name",
        "p_partkey",
        "p_type",
        F.round("ps_supplycost", 2).alias("ps_supplycost"),
    )
    return top_k(
        res,
        [
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        ],
        100,
    )


@defq(
    "tpch_q11",
    oracle=f"""
    WITH {PARTSUPP_SQL_CTES},
    g AS (
      SELECT ps_partkey,
             CAST(ROUND(ps_supplycost * 100) AS BIGINT) * ps_availqty AS cents
      FROM partsupp
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_7'),
    pp AS (SELECT ps_partkey, SUM(cents) AS value_cents FROM g GROUP BY 1),
    t AS (SELECT SUM(value_cents) AS total_cents, COUNT(*) AS nparts FROM pp)
    SELECT ps_partkey, ROUND(value_cents / 100.0, 2) AS value
    FROM pp, t
    WHERE value_cents * nparts * 2 > total_cents * 3
    """,
    ps="table.partsupp",
    s="table.supplier",
    n="table.nation",
)
def q_tpch_q11(ps: DataFrame, s: DataFrame, n: DataFrame) -> DataFrame:
    """TPC-H Q11 (important stock identification) on the derived
    ``partsupp``; 'GERMANY' adapted to this data's ``NATION_7`` and the
    spec's SF-dependent ``0.0001/SF`` fraction replaced by a scale-free
    ``1.5x the mean per-part value`` threshold (``value * nparts * 2 >
    total * 3`` — same scalar-subquery HAVING shape).  Arithmetic is in
    EXACT integer cents (supplycost is 2-dp by construction), so the
    HAVING boundary cannot flip on cross-engine float-sum ordering; the
    comparison runs in decimal(38) because cents x nparts overflows
    int64 at SF >= ~100.  The one-row totals frame enters as a
    broadcast (no driver collect)."""
    ger = equi_join(
        s.select("s_suppkey", "s_nationkey"),
        F.broadcast(n.filter(F.col("n_name") == "NATION_7").select("n_nationkey")),
        on=F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    cents = (
        F.round(F.col("ps_supplycost") * 100, 0).cast("long")
        * F.col("ps_availqty")
    )
    per_part = group_agg(
        equi_join(ps, ger, on=F.col("ps_suppkey") == F.col("s_suppkey")).select(
            "ps_partkey", cents.alias("cents")
        ),
        ["ps_partkey"],
        {"value_cents": F.sum("cents")},
    )
    totals = per_part.agg(
        F.sum("value_cents").cast("decimal(38,0)").alias("total_cents"),
        F.count("*").alias("nparts"),
    )
    return (
        per_part.crossJoin(F.broadcast(totals))
        .filter(
            F.col("value_cents").cast("decimal(38,0)") * F.col("nparts") * 2
            > F.col("total_cents") * 3
        )
        .select(
            "ps_partkey",
            F.round(F.col("value_cents") / 100.0, 2).alias("value"),
        )
    )


@defq(
    "tpch_q16",
    oracle=f"""
    WITH {PARTSUPP_SQL_CTES}
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT ps_suppkey) AS supplier_cnt
    FROM partsupp
    JOIN part ON p_partkey = ps_partkey
    WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
      AND p_size IN (4, 9, 14, 19, 23, 36, 45, 49)
      AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    ps="table.partsupp",
    p="table.part",
    s="table.supplier",
)
def q_tpch_q16(ps: DataFrame, p: DataFrame, s: DataFrame) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) on the derived
    ``partsupp``; the absent ``s_comment LIKE '%Customer%Complaints%'``
    supplier exclusion adapted to ``s_acctbal < 0`` (still a NOT-IN
    anti-join on the supplier side) and ``p_type NOT LIKE 'MEDIUM
    POLISHED%'`` to the categorical ``<> 'PROMO'``.  Distinct-count
    after a fact-dim join + anti-join — the §2b-D COUNT(DISTINCT)
    family at its spec shape."""
    flagged = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    kept_ps = anti_join(ps, flagged, on=F.col("ps_suppkey") == F.col("s_suppkey"))
    target = p.filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(4, 9, 14, 19, 23, 36, 45, 49))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    joined = equi_join(kept_ps, target, on=F.col("ps_partkey") == F.col("p_partkey"))
    return joined.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("ps_suppkey").alias("supplier_cnt")
    )


@defq(
    "tpch_q20",
    oracle=f"""
    WITH {PARTSUPP_SQL_CTES}
    SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
    FROM supplier
    JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
        SELECT ps_suppkey FROM partsupp
        WHERE ps_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
          AND ps_availqty > (
            SELECT 0.5 * SUM(l_quantity) FROM lineitem
            WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'))
    """,
    s="table.supplier",
    n="table.nation",
    ps="table.partsupp",
    p="table.part",
    li="table.lineitem",
)
def q_tpch_q20(
    s: DataFrame, n: DataFrame, ps: DataFrame, p: DataFrame, li: DataFrame
) -> DataFrame:
    """TPC-H Q20 (potential part promotion) on the derived
    ``partsupp``; ``p_name LIKE 'forest%'`` adapted to this data's
    ``'small%'`` prefix, 'CANADA' to ``NATION_3``, and ``s_address``
    replaced by ``s_acctbal`` in the output.  The correlated
    half-year-of-shipments subquery decorrelates to one (partkey,
    suppkey)-grouped aggregate INNER-joined back (the spec's NULL
    comparison excludes pairs with no shipments, which is exactly the
    inner join); the part-name filter is a semi-join, the final
    supplier membership another semi-join.  Quantity sums are integral
    doubles — order-independent, exact in both engines (§2b-C
    correlated-subquery family)."""
    small = p.filter(F.col("p_name").like("small%")).select("p_partkey")
    ps_small = semi_join(ps, small, on=F.col("ps_partkey") == F.col("p_partkey"))
    shipped = group_agg(
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        ).select("l_partkey", "l_suppkey", "l_quantity"),
        ["l_partkey", "l_suppkey"],
        {"half_qty": 0.5 * F.sum("l_quantity")},
    )
    excess = equi_join(
        ps_small,
        shipped,
        on=(F.col("ps_partkey") == F.col("l_partkey"))
        & (F.col("ps_suppkey") == F.col("l_suppkey")),
    ).filter(F.col("ps_availqty") > F.col("half_qty"))
    target_sup = equi_join(
        s,
        F.broadcast(n.filter(F.col("n_name") == "NATION_3").select("n_nationkey")),
        on=F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return semi_join(
        target_sup, excess, on=F.col("s_suppkey") == F.col("ps_suppkey")
    ).select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))


@defq(
    "tpch_q12",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 120 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    """,
    o="table.orders",
    li="table.lineitem",
)
def q_tpch_q12(o: DataFrame, li: DataFrame) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority); the absent
    ``l_shipmode`` receipt-year filter and commit/receipt lateness
    adapted per the module convention: group by the line-level
    categorical ``l_returnflag`` and take 'late' as ship-vs-order
    lateness (``_late_col``), year-windowed on ``l_shipdate`` — the
    join + dual conditional count + line-categorical group shape is
    intact (§2b-C/D)."""
    lines = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag", "l_shipdate")
    joined = equi_join(
        o.select("o_orderkey", "o_orderdate", "o_orderpriority"),
        lines,
        on=F.col("o_orderkey") == F.col("l_orderkey"),
    ).filter(_late_col())
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy("l_returnflag").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )
