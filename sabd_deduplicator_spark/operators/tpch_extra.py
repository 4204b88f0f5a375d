"""TPC-H-style breadth #3: the remaining canonical query shapes expressible
on the driver's columns (Q4/Q6/Q7/Q8/Q9/Q10/Q12/Q15/Q22 analogues).

The reference has no relational surface beyond the index report
(test/deduplicator_test.exs:323-330); these queries exist for the capability
matrix (SURVEY.md §2.B "joins/aggregations") and each is oracle-checked.
Columns the spec needs but the testdata lacks are adapted, not faked:

- no ``l_commitdate``/``l_receiptdate`` → "late" = shipped > 30/60 days after
  the order date (same adaptation q21 uses);
- no ``l_shipmode`` → Q12 groups by ``l_linestatus``;
- no ``ps_supplycost`` → Q9's cost proxy is ``p_retailprice * l_quantity``;
- no ``c_phone`` → Q22's country code is ``c_nationkey % 5``.

Scale posture: dimension chains broadcast; the only shuffles are fact-fact
joins on ``l_orderkey``/``o_custkey`` and the final group-by; global top-k
uses the k-th-value prefilter (TakeOrderedAndProject → broadcast threshold →
rank survivors), never a full-table global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from sabd_deduplicator_spark.catalog import table
from sabd_deduplicator_spark.functions.numeric import dsum_sql
from sabd_deduplicator_spark.registry import query

_DP_SQL = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))"
)


def _dp() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(12,2)")


@query(
    "q4_order_priority_exists",
    oracle=(
        "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count "
        "FROM orders o "
        "WHERE o.o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o.o_orderdate < TIMESTAMP '1996-07-01' "
        "AND EXISTS (SELECT 1 FROM lineitem l "
        "  WHERE l.l_orderkey = o.o_orderkey "
        "  AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY) "
        "GROUP BY o_orderpriority"
    ),
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape: orders with at least one late line, counted per
    priority. EXISTS = left_semi on l_orderkey with the lateness predicate as
    a residual non-equi condition; the date filter prunes the orders scan
    before the shuffle, and semi-join dedups order keys executor-side (no
    distinct pass)."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    l = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@query(
    "q6_forecast_revenue",
    oracle=(
        "SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) "
        "* CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue "
        "FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND l_discount BETWEEN 0.02 AND 0.08 AND l_quantity < 24"
    ),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6 shape: pure filter + single exact-decimal aggregate — the
    query whose whole cost is the scan. All three predicates reach the
    parquet reader (PushedFilters), the projection is two columns, and the
    aggregate is one partial+final pair with no grouping keys."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.02, 0.08)
        & (F.col("l_quantity") < 24)
    )
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * F.col("l_discount").cast(
        "decimal(12,2)"
    )
    return l.agg(F.sum(rev).cast("double").alias("revenue"))


@query(
    "q7_volume_shipping",
    oracle=(
        "SELECT supp_nation, cust_nation, l_year, "
        "CAST(sum(volume) AS DOUBLE) AS revenue FROM ("
        "  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "  CAST(year(l.l_shipdate) AS INT) AS l_year, "
        f"  {_DP_SQL} AS volume "
        "  FROM supplier s, lineitem l, orders o, customer c, nation n1, nation n2 "
        "  WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey "
        "  AND c.c_custkey = o.o_custkey AND s.s_nationkey = n1.n_nationkey "
        "  AND c.c_nationkey = n2.n_nationkey "
        "  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') "
        "    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))"
        ") GROUP BY supp_nation, cust_nation, l_year"
    ),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: bilateral trade volume between two nations by year.
    Both nation filters broadcast onto their fact sides BEFORE the fact-fact
    join, so the l⋈o shuffle moves only the two nations' rows; the
    directional pair predicate rides the join as a residual."""
    n = table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    l = (
        table(spark, sf_dir, "lineitem")
        .join(broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount",
                "supp_nation")
    )
    o = (
        table(spark, sf_dir, "orders")
        .join(broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "cust_nation")
    )
    return (
        l.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("supp_nation") != F.col("cust_nation")),
        )
        .withColumn("l_year", F.year("l_shipdate").cast("int"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(_dp()).cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=(
        "SELECT o_year, "
        "CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume "
        "ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) "
        "/ CAST(sum(volume) AS DOUBLE) AS mkt_share FROM ("
        "  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year, "
        f"  {_DP_SQL} AS volume, n2.n_name AS supp_nation "
        "  FROM part p, supplier s, lineitem l, orders o, customer c, "
        "  nation n1, nation n2, region r "
        "  WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey "
        "  AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey "
        "  AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = r.r_regionkey "
        "  AND r.r_name = 'ASIA' AND s.s_nationkey = n2.n_nationkey "
        "  AND p.p_type = 'STANDARD'"
        ") GROUP BY o_year"
    ),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape: one nation's share of a region's market for one part
    type, by year. Every dimension (part-type filter, supplier→nation,
    customer→nation→region) broadcasts; the numerator CASE stays exact
    decimal so numerator/denominator are each order-independent sums divided
    once in double."""
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select(
        "p_partkey"
    )
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .select("s_suppkey", "supp_nation")
    )
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = table(spark, sf_dir, "nation").join(
        broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = (
        table(spark, sf_dir, "customer")
        .join(broadcast(n1), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey")
    )
    o = (
        table(spark, sf_dir, "orders")
        .join(broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate")
    )
    l = (
        table(spark, sf_dir, "lineitem")
        .join(broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    vol = _dp()
    num = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast("decimal(12,2)")
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("o_year")
        .agg(
            (F.sum(num).cast("double") / F.sum(vol).cast("double")).alias("mkt_share")
        )
    )


@query(
    "q9_product_profit",
    oracle=(
        "SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit FROM ("
        "  SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year, "
        f"  {_DP_SQL} - CAST(p_retailprice AS DECIMAL(12,2)) "
        "  * CAST(l_quantity AS DECIMAL(12,2)) AS amount "
        "  FROM part p, supplier s, lineitem l, orders o, nation n "
        "  WHERE s.s_suppkey = l.l_suppkey AND p.p_partkey = l.l_partkey "
        "  AND o.o_orderkey = l.l_orderkey AND s.s_nationkey = n.n_nationkey "
        "  AND p.p_name LIKE '%widget%'"
        ") GROUP BY nation, o_year"
    ),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 shape: profit by supplier nation and year for one product
    family (cost proxy = retailprice×quantity; testdata has no partsupp).
    The p_name LIKE filter broadcasts as a partkey semi-set onto lineitem —
    at 100 TB that IN-set prunes the fact scan before the orders shuffle."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        table(spark, sf_dir, "supplier")
        .join(broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    l = (
        table(spark, sf_dir, "lineitem")
        .join(broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = _dp() - (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("int"))
        .groupBy("nation", "o_year")
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@query(
    "q10_returned_items",
    oracle=(
        "WITH rev AS ("
        "  SELECT c.c_custkey, c.c_name, n.n_name, "
        f"  CAST(sum({_DP_SQL}) AS DOUBLE) AS revenue "
        "  FROM customer c, orders o, lineitem l, nation n "
        "  WHERE c.c_custkey = o.o_custkey AND l.l_orderkey = o.o_orderkey "
        "  AND o.o_orderdate >= TIMESTAMP '1996-01-01' "
        "  AND o.o_orderdate < TIMESTAMP '1996-04-01' "
        "  AND l.l_returnflag = 'R' AND c.c_nationkey = n.n_nationkey "
        "  GROUP BY c.c_custkey, c.c_name, n.n_name) "
        "SELECT c_custkey, c_name, n_name, revenue, rnk FROM ("
        "  SELECT *, CAST(rank() OVER (ORDER BY revenue DESC) AS BIGINT) AS rnk "
        "  FROM rev) WHERE rnk <= 20"
    ),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: top-20 customers by returned-lineitem revenue in a
    quarter. Global top-k via the k-th-value prefilter: orderBy+limit is
    TakeOrderedAndProject (per-partition heads merged on the driver), the
    threshold broadcasts back, and the rank window only sees the ~20
    survivors — no full-aggregate single-partition funnel."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    l = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_dp()).cast("double").alias("revenue"))
    )
    kth = rev.orderBy(F.desc("revenue")).limit(20).agg(F.min("revenue").alias("kth"))
    survivors = rev.join(broadcast(kth), rev.revenue >= kth.kth).select(
        "c_custkey", "c_name", "n_name", "revenue"
    )
    # bounded global window: input is the k-th-value survivor set (<= 20 + ties)
    w = Window.orderBy(F.desc("revenue"))
    return (
        survivors.withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 20)
    )


@query(
    "q12_late_priority_class",
    oracle=(
        "SELECT l_linestatus, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
        "FROM orders o, lineitem l WHERE o.o_orderkey = l.l_orderkey "
        "AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY "
        "AND l.l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l.l_shipdate < TIMESTAMP '1997-01-01' "
        "GROUP BY l_linestatus"
    ),
)
def q12_late_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape (l_linestatus stands in for the absent l_shipmode):
    late lines classified by order priority. One fact-fact shuffle on
    l_orderkey with the lateness predicate as a residual; the CASE counts are
    conditional sums in a single hash aggregate."""
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(
            o,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q15_top_supplier",
    oracle=(
        "WITH revenue AS ("
        "  SELECT l_suppkey AS supplier_no, "
        f"  CAST(sum({_DP_SQL}) AS DOUBLE) AS total_revenue "
        "  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "  AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
        "SELECT s_suppkey, s_name, total_revenue "
        "FROM supplier, revenue WHERE s_suppkey = supplier_no "
        "AND total_revenue = (SELECT max(total_revenue) FROM revenue)"
    ),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 shape: supplier(s) achieving the maximum quarterly revenue.
    The scalar MAX subquery is a one-row broadcast joined back on equality
    (exact-decimal revenue makes float-equality safe); supplier dim
    broadcasts onto the survivors."""
    l = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_dp()).cast("double").alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(broadcast(mx), F.col("total_revenue") == F.col("mx"))
        .join(broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q22_global_sales_opportunity",
    oracle=(
        "WITH pot AS ("
        "  SELECT c_custkey, c_nationkey % 5 AS cntrycode, c_acctbal "
        "  FROM customer WHERE c_nationkey % 5 IN (0, 1, 2)), "
        "avgbal AS ("
        "  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) "
        "  / count(*) AS a FROM pot WHERE c_acctbal > 0.00) "
        "SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust, "
        "CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal "
        "FROM pot WHERE c_acctbal > (SELECT a FROM avgbal) "
        "AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = pot.c_custkey "
        "  AND o.o_orderdate >= TIMESTAMP '2000-01-01') "
        "GROUP BY cntrycode"
    ),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape (country code = c_nationkey % 5; "dormant" = no order
    since 2000): rich customers with no recent orders. The scalar
    positive-balance average is an exact-decimal one-row broadcast
    (crossJoin); NOT EXISTS = left_anti against date-pruned orders, shuffling
    on o_custkey."""
    pot = (
        table(spark, sf_dir, "customer")
        .withColumn("cntrycode", (F.col("c_nationkey") % 5))
        .filter(F.col("cntrycode").isin(0, 1, 2))
        .select("c_custkey", "cntrycode", "c_acctbal")
    )
    avgbal = (
        pot.filter(F.col("c_acctbal") > 0.00)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
                / F.count("*")
            ).alias("a")
        )
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select("o_custkey")
    )
    return (
        pot.crossJoin(broadcast(avgbal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )
