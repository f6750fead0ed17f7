"""H. Scalar function library (SURVEY.md §2.2-H).

String / date / math / array / map-json expression coverage, all JVM-side
built-ins (whole-stage codegen; no UDFs). The array row is the
higher-order-function vector math that replaces the reference's Scala
geometry kernels for fold-expressible distances.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import Tables
from .vector import norm2, to_double


@query(
    "rel_scalar_string",
    oracle="""
    SELECT doc_id,
           LOWER(SUBSTR(text, 1, 20)) AS head20,
           CONCAT(lang, ':', source) AS lang_src,
           CAST(LEN(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           COALESCE(regexp_extract(text, '([a-z]+ing)\\b', 1), '') AS first_ing
    FROM documents
    """,
)
def rel_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lower/substr/concat/split/regexp_extract over document text."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.lower(F.substring("text", 1, 20)).alias("head20"),
        F.concat_ws(":", "lang", "source").alias("lang_src"),
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.regexp_extract("text", r"([a-z]+ing)\b", 1).alias("first_ing"),
    )


@query(
    "rel_scalar_date",
    oracle="""
    SELECT o_orderkey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           CAST(date_part('year', o_orderdate) AS INTEGER) AS order_year,
           CAST(date_part('isodow', o_orderdate) AS INTEGER) AS iso_dow,
           CAST(date_diff('day', o_orderdate, TIMESTAMP '1998-12-31') AS INTEGER)
               AS days_to_eoy
    FROM orders
    """,
)
def rel_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc/extract/day-of-week/datediff bucketing of order dates.

    ISO day-of-week is used because the engines' native dayofweek
    disagrees on the week origin (Spark: Sunday=1, DuckDB dow: Sunday=0).
    """
    t = Tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
            "order_month"
        ),
        F.year("o_orderdate").alias("order_year"),
        (F.weekday("o_orderdate") + 1).alias("iso_dow"),
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_eoy"),
    )


@query(
    "rel_scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(ABS(l_extendedprice * l_discount - l_tax * 100), 6) AS m_abs,
           ROUND(LN(l_extendedprice), 6) AS m_ln,
           ROUND(POW(1 + l_discount, 3), 6) AS m_pow,
           ROUND(SQRT(l_quantity), 6) AS m_sqrt,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_bucket,
           l_linenumber % 3 AS line_mod
    FROM lineitem
    """,
)
def rel_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ln/pow/sqrt/floor/mod pricing math."""
    t = Tables(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.round(
            F.abs(
                F.col("l_extendedprice") * F.col("l_discount")
                - F.col("l_tax") * 100
            ),
            6,
        ).alias("m_abs"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("m_ln"),
        F.round(F.pow(1 + F.col("l_discount"), 3), 6).alias("m_pow"),
        F.round(F.sqrt("l_quantity"), 6).alias("m_sqrt"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_bucket"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
    )


@query(
    "rel_scalar_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           ROUND(SQRT(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           ROUND(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))) / len(embedding), 6) AS mean_val
    FROM embeddings
    """,
)
def rel_scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: per-embedding L2 norm and mean, fully
    JVM-side via transform/aggregate — the no-UDF vector-math idiom."""
    t = Tables(spark, sf_dir)
    emb = to_double("embedding")
    return t.embeddings.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(norm2(emb), 6).alias("l2_norm"),
        F.round(
            F.aggregate(emb, F.lit(0.0), lambda a, x: a + x)
            / F.size("embedding"),
            6,
        ).alias("mean_val"),
    )


@query(
    "rel_scalar_map_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           CAST(LEN(json_keys(props)) AS INTEGER) AS n_keys,
           json_keys(props)[1] AS first_key
    FROM events
    """,
)
def rel_scalar_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """props JSON parsed to a typed MapType; key/value extraction via map
    functions (from_json + map_keys/element_at)."""
    t = Tables(spark, sf_dir)
    m = F.from_json("props", T.MapType(T.StringType(), T.IntegerType()))
    return t.events.select(
        "event_id",
        m.getItem("k").alias("k_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.map_keys(m).getItem(0).alias("first_key"),
    )
