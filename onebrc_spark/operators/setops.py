"""Set operations (SURVEY §2.7): union/unionByName, intersect, except.

Scale notes: UNION ALL is a zero-shuffle concatenation of partition lists;
INTERSECT / EXCEPT (distinct forms) hash-shuffle both sides on the full row —
we always project to the minimal column set first so the shuffled row is
narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onebrc_spark.registry import query
from onebrc_spark.sources.catalog import load_table


def _buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    # no explicit distinct(): every consumer is a set operator (intersect /
    # except) that applies distinct semantics itself — the extra aggregate
    # was a redundant shuffle stage (round-5 review)
    o = load_table(spark, sf_dir, "orders")
    return o.select(F.col("o_custkey").alias("custkey"))


def _high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )


@query(
    "setop_union_all",
    oracle="""
    SELECT custkey, count(*) AS n
    FROM (
      SELECT o_custkey AS custkey FROM orders
      UNION ALL
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    )
    GROUP BY custkey ORDER BY custkey
    """,
    survey_ref="setops",
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) via unionByName + count to make the bag
    observable in the hash."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    hb = _high_balance(spark, sf_dir)
    return (
        o.unionByName(hb)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("custkey")
    )


@query(
    "setop_intersect",
    oracle="""
    SELECT custkey FROM (
      SELECT DISTINCT o_custkey AS custkey FROM orders
      INTERSECT
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    ) ORDER BY custkey
    """,
    survey_ref="setops",
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): buyers who also have high balances."""
    return _buyers(spark, sf_dir).intersect(_high_balance(spark, sf_dir)).orderBy("custkey")


@query(
    "setop_except",
    oracle="""
    SELECT custkey FROM (
      SELECT c_custkey AS custkey FROM customer
      EXCEPT
      SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority LIKE '1-%'
    ) ORDER BY custkey
    """,
    survey_ref="setops",
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customers who never placed an urgent ('1-%')
    order — the set-op twin of the J4 anti join. (The unfiltered
    customers-minus-buyers difference is empty at every test SF, which made
    the round-1 green vacuous; the priority filter keeps a real, non-empty
    difference at sf0.001/0.01/0.1: 18/203/1986 rows.)"""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").like("1-%"))
        .select(F.col("o_custkey").alias("custkey"))
    )
    # subtract() IS EXCEPT DISTINCT; the earlier exceptAll().distinct()
    # only matched the oracle because c_custkey is unique on the left — a
    # left-side duplicate would have survived the multiset subtraction and
    # diverged from EXCEPT's set semantics (round-5 review)
    return c.subtract(urgent).orderBy("custkey")


@query(
    "setop_intersect_all",
    oracle="""
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders
      INTERSECT ALL
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    ) ORDER BY custkey
    """,
    survey_ref="setops (bag semantics)",
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): each custkey kept min(count_left,
    count_right) times — orders-side duplicates survive up to the one
    matching customer row. Distinct vs bag is a correctness trap worth a
    dedicated oracle; Spark implements both natively."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return o.intersectAll(_high_balance(spark, sf_dir)).orderBy("custkey")


@query(
    "setop_except_all",
    oracle="""
    SELECT custkey FROM (
      SELECT o_custkey AS custkey FROM orders
      EXCEPT ALL
      SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    ) ORDER BY custkey
    """,
    survey_ref="setops (bag semantics)",
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics): per-key counts subtract instead of the
    distinct form's set difference — a customer with 5 orders minus one
    high-balance row leaves 4."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return o.exceptAll(_high_balance(spark, sf_dir)).orderBy("custkey")
