"""B. Projections / filters / predicates (SURVEY.md §2.2-B)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables


@query(
    "rel_filter_complex",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE (o_orderstatus IN ('O', 'F')
           AND o_totalprice BETWEEN 50000 AND 300000
           AND o_orderpriority LIKE '1%')
       OR (o_orderstatus = 'P' AND o_totalprice IS NOT NULL
           AND o_totalprice < 20000)
    """,
)
def rel_filter_complex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/IN/BETWEEN/LIKE/IS NOT NULL combination predicate."""
    t = Tables(spark, sf_dir)
    o = t.orders
    return o.filter(
        (
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_totalprice").between(50000, 300000)
            & F.col("o_orderpriority").like("1%")
        )
        | (
            (F.col("o_orderstatus") == "P")
            & F.col("o_totalprice").isNotNull()
            & (F.col("o_totalprice") < 20000)
        )
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "rel_expr_case",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 300000 THEN 'large'
                WHEN o_totalprice >= 100000 THEN 'medium'
                WHEN o_totalprice >= 25000  THEN 'small'
                ELSE 'tiny' END AS tier
    FROM orders
    """,
)
def rel_expr_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN tiering of order totals."""
    t = Tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .when(F.col("o_totalprice") >= 25000, "small")
        .otherwise("tiny")
        .alias("tier"),
    )


@query(
    "rel_null_handling",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           COALESCE(NULLIF(l_discount, 0.0), -1.0) AS discount_or_flag,
           CASE WHEN NULLIF(l_tax, 0.0) IS NULL THEN 1 ELSE 0 END AS tax_is_zero
    FROM lineitem
    """,
)
def rel_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce/nullif null-semantics round trip."""
    t = Tables(spark, sf_dir)
    li = t.lineitem
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0)).alias(
            "discount_or_flag"
        ),
        F.when(F.nullif(F.col("l_tax"), F.lit(0.0)).isNull(), 1)
        .otherwise(0)
        .alias("tax_is_zero"),
    )
