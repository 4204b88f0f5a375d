"""TPC-H-style breadth #4: the last four canonical shapes (Q2/Q11/Q16/Q20
analogues), closing the 22-query family on the driver's columns.

The testdata has no ``partsupp`` table, so the part-supplier relation is
DERIVED from lineitem: the distinct ``(l_partkey, l_suppkey)`` pairs are the
"offers", and the supply-cost / availability proxies are

- ``cost``      = min unit price ever charged for the pair
                  (``min(l_extendedprice / l_quantity)``) — Q2/Q11's
                  ``ps_supplycost`` stand-in;
- ``availqty``  = total quantity ever shipped for the pair — Q20's
                  ``ps_availqty`` stand-in;
- Q16's "customer complaints" supplier exclusion becomes ``s_acctbal < 0``
  (the only supplier attribute with selectivity in this schema).

All four keep the SPEC'S PLAN SHAPE — that is the point of the exercise:
Q2's correlated min subquery, Q11's global-scalar HAVING, Q16's NOT-IN +
count-distinct, Q20's nested-aggregate IN chain.

Scale posture: the offers aggregation shuffles once on (partkey, suppkey) —
the same key both the correlated-min join (Q2) and the excess filter (Q20)
reuse, so AQE can reuse the exchange; dimension sides (supplier, nation,
region, the per-part min, the one-row global total) broadcast; nothing sorts
globally. The reference has no relational surface (its only query is the
index report, test/deduplicator_test.exs:323-330); these exist for the
SURVEY.md §2.B joins/aggregations capability rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from sabd_deduplicator_spark.catalog import table
from sabd_deduplicator_spark.registry import query

# Offers: the derived part-supplier relation, shared by all four queries.
# Unit price divides DOUBLE by DOUBLE (parquet types) — bit-identical in
# Spark and DuckDB, so min() and equality joins on it are engine-stable.
_OFFERS_SQL = (
    "SELECT l_partkey AS partkey, l_suppkey AS suppkey, "
    "min(l_extendedprice / l_quantity) AS cost, "
    "sum(l_quantity) AS availqty "
    "FROM lineitem GROUP BY l_partkey, l_suppkey"
)


def offers(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"),
        F.sum("l_quantity").alias("availqty"),
    )


@query(
    "q2_min_cost_supplier",
    oracle=(
        "SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, o.cost "
        f"FROM ({_OFFERS_SQL}) o "
        "JOIN part ON p_partkey = o.partkey "
        "JOIN supplier ON s_suppkey = o.suppkey "
        "JOIN nation ON n_nationkey = s_nationkey "
        "JOIN region ON r_regionkey = n_regionkey "
        "WHERE p_size <= 10 AND r_name = 'EUROPE' "
        "AND o.cost = ("
        f"  SELECT min(i.cost) FROM ({_OFFERS_SQL}) i "
        "   JOIN supplier s2 ON s2.s_suppkey = i.suppkey "
        "   JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey "
        "   JOIN region r2 ON r2.r_regionkey = n2.n_regionkey "
        "   WHERE r2.r_name = 'EUROPE' AND i.partkey = o.partkey)"
    ),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape: for each qualifying part, the European supplier(s)
    charging the minimum cost. The correlated scalar subquery decorrelates to
    a per-part min over the region-filtered offers, equi-joined back on
    (partkey, cost) — the classic Q2 rewrite Catalyst itself applies to the
    SQL form. The offers agg shuffles once on (partkey, suppkey); supplier/
    nation/region and the per-part min (one row per part, post-agg) all
    broadcast; no global sort."""
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = table(spark, sf_dir, "part").filter(F.col("p_size") <= 10).select(
        "p_partkey", "p_brand"
    )

    # European suppliers are a dimension: broadcast them into the offers agg.
    eu_supp = s.join(broadcast(n), s.s_nationkey == n.n_nationkey).join(
        broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")

    eu_offers = offers(spark, sf_dir).join(
        broadcast(eu_supp), F.col("suppkey") == F.col("s_suppkey")
    )
    min_cost = eu_offers.groupBy("partkey").agg(F.min("cost").alias("min_cost"))
    return (
        eu_offers.join(
            broadcast(min_cost.withColumnRenamed("partkey", "mk")),
            (F.col("partkey") == F.col("mk")) & (F.col("cost") == F.col("min_cost")),
        )
        .join(broadcast(p), F.col("partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "cost")
    )


@query(
    "q11_important_parts",
    oracle=(
        "SELECT partkey, value FROM ("
        "  SELECT o.partkey, sum(o.cost * o.availqty) AS value "
        f"  FROM ({_OFFERS_SQL}) o "
        "   JOIN supplier ON s_suppkey = o.suppkey "
        "   JOIN nation ON n_nationkey = s_nationkey "
        "   WHERE n_name = 'NATION_7' GROUP BY o.partkey) "
        "WHERE value > ("
        "  SELECT sum(i.cost * i.availqty) * 0.001 "
        f"  FROM ({_OFFERS_SQL}) i "
        "   JOIN supplier s2 ON s2.s_suppkey = i.suppkey "
        "   JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey "
        "   WHERE n2.n_name = 'NATION_7')"
    ),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 shape: parts whose inventory value within one nation exceeds
    a fraction of that nation's total. The HAVING-against-a-global-scalar
    becomes: one-row total → broadcast cross join → filter. The per-part agg
    and the total agg share the same filtered-offers input, so Spark computes
    the scan+agg once per branch off a common shuffle (same key); the scalar
    side is ONE row — broadcasting it is free."""
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nat_supp = s.join(broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    nat_offers = (
        offers(spark, sf_dir)
        .join(broadcast(nat_supp), F.col("suppkey") == F.col("s_suppkey"))
        .select("partkey", (F.col("cost") * F.col("availqty")).alias("v"))
    )
    per_part = nat_offers.groupBy("partkey").agg(F.sum("v").alias("value"))
    total = nat_offers.agg((F.sum("v") * F.lit(0.001)).alias("threshold"))
    return per_part.join(broadcast(total), per_part.value > total.threshold).select(
        "partkey", "value"
    )


@query(
    "q16_supplier_part_counts",
    oracle=(
        "SELECT p_brand, p_type, p_size, "
        "CAST(count(DISTINCT o.suppkey) AS BIGINT) AS supplier_cnt "
        f"FROM ({_OFFERS_SQL}) o "
        "JOIN part ON p_partkey = o.partkey "
        "WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO' "
        "AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49) "
        "AND o.suppkey NOT IN "
        "  (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY p_brand, p_type, p_size"
    ),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape: distinct supplier count per (brand, type, size),
    excluding blacklisted suppliers. NOT IN over a non-null key column =
    left_anti join (s_suppkey is never null, so the null-aware expansion is
    unnecessary — contrast `not_in_null_aware`); the excluded-supplier set
    and the filtered part dimension both broadcast. count(DISTINCT) over the
    already-distinct offers pairs keeps the expand-free two-phase distinct
    aggregate plan."""
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    o = offers(spark, sf_dir).select("partkey", "suppkey")
    return (
        o.join(broadcast(bad), o.suppkey == bad.s_suppkey, "left_anti")
        .join(broadcast(p), F.col("partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("suppkey").alias("supplier_cnt"))
    )


@query(
    "q20_excess_suppliers",
    oracle=(
        "SELECT s_name, s_acctbal FROM supplier "
        "JOIN nation ON n_nationkey = s_nationkey "
        "WHERE n_name = 'NATION_3' AND s_suppkey IN ("
        "  SELECT o.suppkey "
        f"  FROM ({_OFFERS_SQL}) o "
        "   WHERE o.partkey IN "
        "     (SELECT p_partkey FROM part WHERE p_name LIKE 'small%') "
        "   AND o.availqty > ("
        "     SELECT 0.5 * sum(l.l_quantity) FROM lineitem l "
        "     WHERE l.l_partkey = o.partkey "
        "     AND l.l_shipdate >= TIMESTAMP '1996-01-01' "
        "     AND l.l_shipdate < TIMESTAMP '1998-01-01'))"
    ),
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20 shape: suppliers in one nation holding "excess availability"
    of small-named parts. The nested correlated aggregate (half the two-year
    shipped quantity per part) decorrelates to a per-part agg joined on
    partkey; the part-name IN prunes before both aggs; the final IN is a
    left_semi from supplier. Chain: offers agg (shuffle on pair) → broadcast
    per-part threshold → broadcast surviving suppkeys → semi join — the
    supplier side never shuffles."""
    small = table(spark, sf_dir, "part").filter(F.col("p_name").startswith("small")).select(
        "p_partkey"
    )
    l = table(spark, sf_dir, "lineitem")
    shipped = (
        l.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(broadcast(small), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg((F.lit(0.5) * F.sum("l_quantity")).alias("half_qty"))
    )
    excess = (
        offers(spark, sf_dir)
        .join(broadcast(small), F.col("partkey") == F.col("p_partkey"))
        .join(
            broadcast(shipped.withColumnRenamed("l_partkey", "sk")),
            (F.col("partkey") == F.col("sk")) & (F.col("availqty") > F.col("half_qty")),
        )
        .select("suppkey")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    return (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(excess), s.s_suppkey == excess.suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )
