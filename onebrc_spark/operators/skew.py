"""Skew-handling operators: salted aggregation and salted join (SURVEY §4,
"AQE skew-join handling" row — here made explicit as library rewrites).

The reference's data is uniform (413 stations drawn uniformly,
`generate.rs:31-33`), so it never faces skew; a 100 TB corpus always does
(one hot user, one hot key). AQE's skew-join splitting handles the join
case at runtime; these operators are the MANUAL rewrites for when the skew
is in an aggregation (AQE does not split skewed agg groups) or when the
planner must be forced:

  - salted two-phase aggregation: groupBy(key, salt) partial → groupBy(key)
    final. The hot key's rows spread over S reducers in phase 1; phase 2
    combines S small partials. Exactly the reference's partial/final
    decomposition (SURVEY §2.4 A1/A2) with a synthetic extra key.
  - salted replicated join: the dim side is replicated S times (one copy
    per salt), the fact side computes a deterministic salt from a uniform
    column; the join key becomes (key, salt) so one hot key's probe rows
    land on S tasks instead of 1.

Both are verified against unsalted oracles — salting must be semantically
invisible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from onebrc_spark.registry import query
from onebrc_spark.sources.catalog import load_table

_SALTS = 16


@query(
    "agg_salted_twophase",
    oracle="""
    SELECT l_returnflag,
           sum(l_quantity) AS sum_qty,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT)
             / 10000.0 AS revenue,
           count(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    survey_ref="A1,A2 (salted two-phase aggregation for skewed groups)",
)
def agg_salted_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a 3-value group key (the skew
    extreme: each group is ~1/3 of the table).

    Phase 1 groups by (l_returnflag, salt=xxhash64(l_orderkey) mod 16) so
    each giant group becomes 16 partial states computed on 16 different
    reducers; phase 2 merges the 16 partials per key. SUM/COUNT re-combine
    losslessly (decomposable aggregates, SURVEY §2.4); the oracle is the
    plain one-phase GROUP BY — identical results required.
    """
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn("salt", F.pmod(F.xxhash64("l_orderkey"), F.lit(_SALTS)))
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.sum("l_quantity").alias("p_qty"),
        F.sum(
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * (100 - F.round(F.col("l_discount") * 100).cast("long"))
        ).alias("p_rev"),
        F.count(F.lit(1)).alias("p_n"),
    )
    return (
        partial.groupBy("l_returnflag")
        .agg(
            F.sum("p_qty").alias("sum_qty"),
            (F.sum("p_rev") / F.lit(10000.0)).alias("revenue"),
            F.sum("p_n").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "join_salted_skew",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             / 100.0 AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    survey_ref="J1 (salted replicated join for skewed keys)",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant equi-join: customer replicated ×16 (one row per salt),
    orders salted deterministically by xxhash64(o_orderkey) mod 16; join on
    (custkey, salt).

    If one customer owned half of all orders, a plain shuffle join would
    put half the fact table on one task; salting spreads it over 16. The
    cost — the dim side is written 16× into the shuffle — is the classic
    trade, which is why this is a library operator and not the default
    (AQE's skew splitter covers the common case for free). Oracle: the
    unsalted join.
    """
    o = load_table(spark, sf_dir, "orders").withColumn(
        "salt", F.pmod(F.xxhash64("o_orderkey"), F.lit(_SALTS))
    )
    c = load_table(spark, sf_dir, "customer").withColumn(
        "salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(_SALTS)]))
    )
    return (
        o.join(c, (o.o_custkey == c.c_custkey) & (o.salt == c.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / F.lit(100.0)
            ).alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )
