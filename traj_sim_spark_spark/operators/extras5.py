"""Round-4 continuation: front-end surfaces and scale-pattern operators.

- ``rel_recursive_cte`` — ``WITH RECURSIVE`` through ``spark.sql``:
  Spark 4's recursive-CTE execution (UnionLoop) running a genuinely
  order-dependent FOLD (a zero-clamped running balance, NOT expressible
  as a plain window sum) over each customer's order chain — the SAME
  statement text executes on DuckDB. Completes the pure-SQL front-end
  story `rel_sql_frontend` opened: ad-hoc users get iteration without
  leaving SQL;
- ``rel_regr_exact``   — per-group LINEAR REGRESSION (slope/intercept/
  r², the ``regr_*`` aggregate family) from EXACT integer moment sums:
  membership-free float math confined to one final 5-row expression
  evaluated in the identical operation order on both engines (the
  house display discipline), never a float aggregate;
- ``ps_frontend``      — the PANDAS API ON SPARK front end: the same
  grouped aggregation written as ``df.pandas_api().groupby(...)``,
  compiled by the same Catalyst optimizer to the same hash-aggregate
  plan as the DataFrame and SQL rows — the third user surface
  (DataFrame / SQL / pandas) pinned result-equal;
- ``rel_join_skew_salted`` — the SALTED JOIN skew pattern as a
  first-class operator: fact rows spread across S deterministic salts,
  the dimension replicated S-fold, join on (key, salt) — the standard
  cure when one hot key would otherwise pin a 100 TB shuffle on a
  single reducer; pinned result-equal to the plain join (the oracle IS
  the unsalted join).

Scale notes (100 TB):
- recursive-CTE rounds are each one (chain-frontier ⋈ base) equi-join
  hash-partitioned on the customer key; the frontier only shrinks, and
  depth is bounded by the longest order chain (~40 in TPC-H), far
  under ``spark.sql.cteRecursionLevelLimit`` (100);
- the regression pass is ONE map-side-combinable hash aggregation of
  integer products (the sole DECIMAL accumulator is the y² moment,
  which overflows int64; DuckDB's native HUGEINT sum mirrors it);
- the salted join trades an S-fold dimension replication (broadcast-
  sized) for eliminating the per-key reducer ceiling — the documented
  alternative to AQE skew-split when skew is known ahead of time;
- the pandas-API row proves surface, not a new engine: one hash agg,
  no driver collect (``to_spark`` stays a lazy plan).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables

# ---------------------------------------------------------------------------
# rel_recursive_cte — WITH RECURSIVE fold over per-customer order chains
# ---------------------------------------------------------------------------

# A zero-clamped running balance (bal_i = max(0, bal_{i-1} + d_i)) is a
# genuine FOLD: the clamp makes it non-associative, so no window frame
# or prefix sum expresses it — recursion (or a stateful kernel) is
# required.  d_i = order value in cents minus a fixed 150 000.00
# replenishment threshold.  Integer cents end to end.
#
# The statement is composed from two fragments shared verbatim with the
# oracle: the base SELECT (chain-position numbering) and the recursion.
# Spark materializes the base ONCE (localCheckpoint) before entering
# the loop — without that cut, UnionLoop re-evaluates the window +
# scan every round (~40 re-scans; measured 11 s -> ~3 s at sf0.1).
_REC_BASE_SELECT = """
        SELECT o_custkey AS cust,
               CAST(ROW_NUMBER() OVER (
                    PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rn,
               CAST(ROUND(o_totalprice * 100) AS BIGINT)
                   - 15000000 AS d
        FROM __r5_orders
"""

_REC_RECURSION = """
    chain(cust, rn, bal) AS (
        SELECT cust, rn, GREATEST(CAST(0 AS BIGINT), d)
        FROM base WHERE rn = 1
        UNION ALL
        SELECT b.cust, b.rn, GREATEST(CAST(0 AS BIGINT), c.bal + b.d)
        FROM chain c JOIN base b ON b.cust = c.cust AND b.rn = c.rn + 1
    )
    SELECT cust AS o_custkey,
           CAST(MAX(rn) AS BIGINT) AS n_orders,
           CAST(MAX_BY(bal, rn) AS BIGINT) AS final_bal_cents
    FROM chain GROUP BY cust
"""


@query(
    "rel_recursive_cte",
    oracle=(
        "WITH RECURSIVE base AS ("
        + _REC_BASE_SELECT.replace("__r5_orders", "orders")
        + "), "
        + _REC_RECURSION
    ),
)
def rel_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``WITH RECURSIVE`` executed by Spark 4's UnionLoop: each
    customer's orders form a linked list (ROW_NUMBER next-pointers) and
    the recursion folds a ZERO-CLAMPED running balance down the chain —
    ``bal_i = GREATEST(0, bal_{i-1} + d_i)``.  The clamp is
    non-associative, so this is not a window function in disguise: it
    is the canonical computation SQL needed recursion for, and the
    IDENTICAL statement text runs on DuckDB (one string, two engines —
    the `rel_sql_frontend` discipline extended to iteration).

    Exactness: integer cents throughout; the fold, the tie-broken
    ordering (o_orderdate, o_orderkey) and the MAX_BY final-row pick
    are all integer decisions.

    Scale shape: every recursion round is one frontier⋈base equi-join
    hash-partitioned on the customer key; the frontier is monotonically
    shrinking (chains end), depth is the longest chain (~40 ≪ the
    engine's recursion limit of 100).  The base is MATERIALIZED once
    before the loop (localCheckpoint) — UnionLoop would otherwise
    re-run the window + scan per round; at 100 TB the materialized
    base is a bucketed table so every round's join is co-located."""
    t = Tables(spark, sf_dir)
    t.orders.createOrReplaceTempView("__r5_orders")
    base = spark.sql(_REC_BASE_SELECT).localCheckpoint()
    base.createOrReplaceTempView("__r5_rec_base")
    return spark.sql(
        "WITH RECURSIVE base AS (SELECT * FROM __r5_rec_base), "
        + _REC_RECURSION
    )


# ---------------------------------------------------------------------------
# rel_regr_exact — per-group linear regression from exact integer moments
# ---------------------------------------------------------------------------

# Final display expressions: float math confined to ONE projection over
# the 3-row aggregate output, written once and evaluated in the
# identical operation order on both engines.  All inputs are exact
# integers (n, sx, sy, sxy, sxx fit int64; syy needs 128 bits — Spark
# sums DECIMAL(38,0), DuckDB's BIGINT sum is natively HUGEINT; both
# cast the same exact integer to DOUBLE).
_REGR_FINAL = """
    l_returnflag,
    CAST(n AS BIGINT) AS n,
    ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) + 0.0
        AS slope_cents_per_unit,
    ROUND((CAST(sy AS DOUBLE)
           - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
             * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) + 0.0
        AS intercept_cents,
    ROUND(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
          / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) + 0.0
        AS r2
"""


@query(
    "rel_regr_exact",
    oracle=f"""
    WITH q AS (
        SELECT l_returnflag,
               CAST(ROUND(l_quantity) AS BIGINT) AS x,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    m AS (
        SELECT l_returnflag, COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(x * y) AS sxy, SUM(x * x) AS sxx,
               SUM(y * y) AS syy
        FROM q GROUP BY l_returnflag
    )
    SELECT {_REGR_FINAL} FROM m
    """,
)
def rel_regr_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group LINEAR REGRESSION (the SQL-standard ``regr_slope`` /
    ``regr_intercept`` / ``regr_r2`` family) of extended price (cents)
    on quantity, per l_returnflag — computed the house way: the
    aggregation pass sums EXACT INTEGER moments (n, Σx, Σy, Σxy, Σx²,
    Σy²), and floats appear only in one final 3-row projection whose
    expression text is shared verbatim with the oracle.  Native
    ``regr_*`` aggregates accumulate doubles and are order-dependent
    at the ulp — these moments are partitioning- and engine-exact.

    The only 128-bit moment is Σy² (~6e19 at sf0.1): Spark accumulates
    DECIMAL(38,0); DuckDB's BIGINT SUM is natively HUGEINT.  Both sides
    cast the same exact integer to DOUBLE for the display expression.

    Scale shape: ONE map-side-combinable hash aggregation over the
    fact table (integer adds at codegen speed; the single decimal
    column is the price of exactness, cf. `rel_agg_basic`'s dispatch);
    the regression algebra runs on 3 aggregate rows."""
    t = Tables(spark, sf_dir)
    q = t.lineitem.selectExpr(
        "l_returnflag",
        "CAST(ROUND(l_quantity) AS BIGINT) AS x",
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y",
    )
    m = q.groupBy("l_returnflag").agg(
        F.expr("COUNT(*)").alias("n"),
        F.expr("SUM(x)").alias("sx"),
        F.expr("SUM(y)").alias("sy"),
        F.expr("SUM(x * y)").alias("sxy"),
        F.expr("SUM(x * x)").alias("sxx"),
        F.expr("SUM(CAST(y AS DECIMAL(38,0)) * y)").alias("syy"),
    )
    return m.selectExpr(*_split_top_level(_REGR_FINAL))


def _split_top_level(cols: str) -> list[str]:
    """Split a SELECT-list fragment on top-level commas (shared between
    the oracle string and ``selectExpr`` so the float expression order
    is written exactly once)."""
    out, depth, cur = [], 0, []
    for ch in cols:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur and "".join(cur).strip():
        out.append("".join(cur).strip())
    return out


# ---------------------------------------------------------------------------
# ps_frontend — the pandas API on Spark as a third user surface
# ---------------------------------------------------------------------------


@query(
    "ps_frontend",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
           CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS max_cents
    FROM orders GROUP BY o_orderpriority
    """,
)
def ps_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PANDAS API ON SPARK front end (``pyspark.pandas``): the
    grouped aggregation a data scientist writes as
    ``df.groupby(...).agg(...)`` — compiled by the SAME Catalyst
    optimizer into the same hash-aggregate plan the DataFrame and SQL
    rows produce.  Completes the three-surface story: DataFrame
    (most rows), textual SQL (`rel_sql_frontend`), and pandas (this
    row), all one engine underneath.

    Exactness: cents quantized to BIGINT *before* entering the pandas
    API, so count/sum/max are integer aggregates.

    Scale shape: ``pandas_api()`` and ``to_spark()`` are metadata-only
    wrappers — the computation is one map-side-combinable hash agg; no
    driver materialization anywhere (pandas-on-Spark only collects on
    ``to_pandas()``, which is never called)."""
    t = Tables(spark, sf_dir)
    cents = t.orders.select(
        "o_orderpriority",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    psdf = cents.pandas_api()
    g = psdf.groupby("o_orderpriority", as_index=False)["cents"].agg(
        ["count", "sum", "max"]
    )
    return (
        g.to_spark()
        .toDF("o_orderpriority", "n_orders", "total_cents", "max_cents")
        .select(
            "o_orderpriority",
            F.col("n_orders").cast("bigint").alias("n_orders"),
            F.col("total_cents").cast("bigint").alias("total_cents"),
            F.col("max_cents").cast("bigint").alias("max_cents"),
        )
    )


# ---------------------------------------------------------------------------
# rel_join_skew_salted — the salted-join skew pattern, pinned to plain join
# ---------------------------------------------------------------------------

_SALTS = 8


@query(
    "rel_join_skew_salted",
    oracle="""
    SELECT s.s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def rel_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SALTED JOIN — the standard hand-applied cure for shuffle-key
    skew: every fact row gets a DETERMINISTIC salt (``l_orderkey % 8``
    — no RNG, the house reproducibility rule), the dimension is
    replicated across all 8 salts, and the join key becomes
    ``(suppkey, salt)`` so one hot supplier's rows spread over 8
    reducers instead of pinning one.  The oracle is the PLAIN join —
    salting must be result-invisible, and the gate proves it.

    Scale shape: at 100 TB this is the ahead-of-time alternative to
    AQE's reactive skew-split (which only fires on detected partition
    imbalance): S× replication of a broadcast-sized dimension buys a
    hard ceiling of fact_rows/S per (key,salt) reducer.  The aggregate
    after the join is keyed on nation only — the salt never escapes
    the join."""
    t = Tables(spark, sf_dir)
    fact = t.lineitem.select(
        "l_suppkey",
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias(
            "cents"
        ),
        (F.col("l_orderkey") % _SALTS).cast("int").alias("salt"),
    )
    dim = (
        t.supplier.select("s_suppkey", "s_nationkey")
        .withColumn(
            "salt", F.explode(F.sequence(F.lit(0), F.lit(_SALTS - 1)))
        )
        .withColumn("salt", F.col("salt").cast("int"))
    )
    joined = fact.join(
        dim,
        (fact["l_suppkey"] == dim["s_suppkey"])
        & (fact["salt"] == dim["salt"]),
    )
    return joined.groupBy("s_nationkey").agg(
        F.count("*").alias("n_items"),
        F.sum("cents").cast("bigint").alias("total_cents"),
    )


# ---------------------------------------------------------------------------
# rel_variant_json — Spark 4 VARIANT ingestion with typed extraction
# ---------------------------------------------------------------------------


@query(
    "rel_variant_json",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(SUM(user_id) AS BIGINT) AS sum_u
    FROM events GROUP BY event_type
    """,
)
def rel_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's VARIANT type end-to-end: each event's JSON props are
    merged with computed fields into one JSON document, parsed ONCE
    into the binary VARIANT encoding (``parse_json``), then read back
    with TYPED path extraction (``variant_get`` with a target type —
    not the stringly ``get_json_object`` of `src_json_props`), and
    aggregated.  The oracle reads the same numbers straight from the
    source — the VARIANT round trip must be lossless.

    Scale shape: VARIANT's binary encoding is the lakehouse
    semi-structured format (Parquet VARIANT shredding): parse cost is
    paid once at ingest, every later extraction is an O(log fields)
    binary probe instead of a JSON re-parse — exactly how a 100 TB
    event table with heterogeneous props should land.  This whole plan
    is JVM-side codegen; no Python anywhere."""
    t = Tables(spark, sf_dir)
    doc = t.events.select(
        "event_type",
        F.expr(
            "parse_json(to_json(named_struct("
            "  'k', CAST(get_json_object(props, '$.k') AS BIGINT),"
            "  'u', user_id,"
            "  't', event_type)))"
        ).alias("v"),
    )
    ext = doc.select(
        F.expr("variant_get(v, '$.t', 'string')").alias("event_type"),
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
        F.expr("variant_get(v, '$.u', 'bigint')").alias("u"),
    )
    return ext.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.sum("u").cast("bigint").alias("sum_u"),
    )


# ---------------------------------------------------------------------------
# src_xml_ingest — XML round trip through Spark 4's native from_xml
# ---------------------------------------------------------------------------


@query(
    "src_xml_ingest",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders GROUP BY o_orderstatus
    """,
)
def src_xml_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion via Spark 4's NATIVE XML support (``from_xml``,
    mainlined from spark-xml in 4.0): every order is serialized to an
    XML record, parsed back through a typed schema, and the parsed
    fields aggregated.  The oracle aggregates the source directly —
    the XML round trip must be lossless, which pins both the writer
    (element construction) and the reader (typed extraction,
    whitespace/number handling) at once.

    Scale shape: ``from_xml`` is a JVM-side row expression (StaxXML
    under the hood) — parsing parallelizes per partition like any
    projection, no Python; at 100 TB the same expression ingests
    feed-style XML dumps partition-parallel.  Numeric fields carry
    integer cents (the house exactness rule) so the round trip has no
    float formatting hazard."""
    t = Tables(spark, sf_dir)
    xml = t.orders.select(
        F.expr(
            "concat('<r><k>', CAST(o_orderkey AS STRING),"
            " '</k><c>', CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)"
            "            AS STRING),"
            " '</c><s>', o_orderstatus, '</s></r>')"
        ).alias("x")
    )
    parsed = xml.select(
        F.expr(
            "from_xml(x, 'k BIGINT, c BIGINT, s STRING')"
        ).alias("r")
    )
    return parsed.groupBy(F.col("r.s").alias("status")).agg(
        F.count("*").alias("n_orders"),
        F.sum("r.c").cast("bigint").alias("total_cents"),
        F.max("r.k").cast("bigint").alias("max_key"),
    )


# ---------------------------------------------------------------------------
# graph_sssp — weighted single-source shortest paths (Bellman-Ford rounds)
# ---------------------------------------------------------------------------

_SSSP_ROUNDS = 4
_SSSP_SUPP = 1_000_000_000


def _sssp_oracle() -> str:
    ctes = [
        f"""
    p AS (
        SELECT o.o_custkey AS c, l.l_suppkey AS s, COUNT(*) AS cnt
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    e AS (
        SELECT c AS src, s + {_SSSP_SUPP} AS dst,
               8 - LEAST(cnt, CAST(6 AS BIGINT)) AS w
        FROM p
        UNION ALL
        SELECT s + {_SSSP_SUPP}, c, 8 - LEAST(cnt, CAST(6 AS BIGINT))
        FROM p
    ),
    d0 AS (
        SELECT CAST((SELECT MIN(c) FROM p) AS BIGINT) AS node,
               CAST(0 AS BIGINT) AS dist
    )"""
    ]
    for r in range(1, _SSSP_ROUNDS + 1):
        ctes.append(f"""
    d{r} AS (
        SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM d{r - 1}
            UNION ALL
            SELECT e.dst AS node, d{r - 1}.dist + e.w AS dist
            FROM d{r - 1} JOIN e ON e.src = d{r - 1}.node
        ) u GROUP BY node
    )""")
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
    SELECT CASE WHEN node < {_SSSP_SUPP}
                THEN 'c' || CAST(node AS VARCHAR)
                ELSE 's' || CAST(node - {_SSSP_SUPP} AS VARCHAR) END
               AS node,
           CAST(dist AS BIGINT) AS dist
    FROM d{_SSSP_ROUNDS}
    """
    )


@query("graph_sssp", oracle=_sssp_oracle)
def graph_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted SINGLE-SOURCE SHORTEST PATHS ({rounds} Bellman-Ford
    relaxation rounds) over the customer-supplier trade graph — the
    weighted completion of the path family (`graph_bfs_hops` counts
    unweighted hops): edge cost is the inverse trade intensity
    ``8 - LEAST(cnt, 6)`` (more lineitems between a pair = closer), so
    distances are exact small integers and every min() is an integer
    decision — an iterative graph algorithm with a FULL chained-CTE
    oracle, no floats anywhere.

    Each round is ONE frontier⋈edges equi-join + ONE (node, min)
    hash aggregate over the union with the previous tableau — the
    textbook distributed Bellman-Ford; rounds localCheckpoint so round
    r+1's plan doesn't re-derive rounds 1..r (the CC/PageRank lineage
    policy).  The relaxation count is fixed ({rounds}), so Spark and
    DuckDB run the identical tableau evolution.

    Scale shape: the per-round join is src-keyed (pre-partitioning the
    edge list by src makes it co-located at 100 TB); the distance
    tableau is |V|-bounded.  Negative edges don't exist, so {rounds}
    rounds bound 4-hop-optimal distances — the same contract as the
    BFS row, now with weights."""
    t = Tables(spark, sf_dir)
    p = (
        t.lineitem.select("l_orderkey", "l_suppkey")
        .join(
            F.broadcast(t.orders.select("o_orderkey", "o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(
            F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s")
        )
        .agg(F.count("*").alias("cnt"))
    )
    w = (F.lit(8) - F.least(F.col("cnt"), F.lit(6))).cast("bigint")
    half = p.select(
        F.col("c").alias("src"),
        (F.col("s") + _SSSP_SUPP).alias("dst"),
        w.alias("w"),
    )
    edges = half.unionAll(
        half.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    ).localCheckpoint()
    d = (
        p.agg(F.min("c").cast("bigint").alias("node"))
        .withColumn("dist", F.lit(0).cast("bigint"))
        .localCheckpoint()
    )
    for _ in range(_SSSP_ROUNDS):
        relaxed = (
            d.join(edges, d["node"] == edges["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("dist") + F.col("w")).alias("dist"),
            )
        )
        d = (
            d.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
    return d.select(
        F.when(F.col("node") < _SSSP_SUPP, F.concat(F.lit("c"), F.col("node").cast("string")))
        .otherwise(
            F.concat(F.lit("s"), (F.col("node") - _SSSP_SUPP).cast("string"))
        )
        .alias("node"),
        F.col("dist").cast("bigint").alias("dist"),
    )


# ---------------------------------------------------------------------------
# text_setsim_prefix_join — EXACT set-similarity join via prefix filtering
# ---------------------------------------------------------------------------

_PFX_TAU_NUM, _PFX_TAU_DEN = 7, 10  # Jaccard >= 0.7, exact rational


def _pfx_oracle() -> str:
    return f"""
    WITH tok AS (
        SELECT DISTINCT d.doc_id, t.token
        FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(token)
    ),
    df AS (SELECT token, COUNT(*) AS df FROM tok GROUP BY token),
    ranked AS (
        SELECT tok.doc_id, tok.token,
               ROW_NUMBER() OVER (
                   PARTITION BY tok.doc_id
                   ORDER BY df.df, tok.token) AS rn,
               COUNT(*) OVER (PARTITION BY tok.doc_id) AS n
        FROM tok JOIN df ON df.token = tok.token
    ),
    pfx AS (
        SELECT doc_id, token, n FROM ranked
        WHERE rn <= n - (({_PFX_TAU_NUM} * n + {_PFX_TAU_DEN} - 1)
                         // {_PFX_TAU_DEN}) + 1
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM pfx a JOIN pfx b
          ON a.token = b.token AND a.doc_id < b.doc_id
    ),
    lists AS (
        SELECT doc_id, list_sort(list(token)) AS toks,
               COUNT(*) AS n
        FROM tok GROUP BY doc_id
    ),
    verified AS (
        SELECT c.id_a, c.id_b,
               len(list_intersect(la.toks, lb.toks)) AS both_n,
               la.n AS na, lb.n AS nb
        FROM cand c
        JOIN lists la ON la.doc_id = c.id_a
        JOIN lists lb ON lb.doc_id = c.id_b
    ),
    hits AS (
        SELECT id_a, id_b, both_n, na + nb - both_n AS un
        FROM verified
        WHERE {_PFX_TAU_DEN} * both_n
              >= {_PFX_TAU_NUM} * (na + nb - both_n)
    ),
    best AS (
        SELECT id_a, id_b, both_n, un,
               ROW_NUMBER() OVER (
                   PARTITION BY id_a
                   ORDER BY (both_n * 1000000000) // un DESC, id_b
               ) AS rk,
               COUNT(*) OVER (PARTITION BY id_a) AS n_matches
        FROM hits
    )
    SELECT id_a, CAST(n_matches AS BIGINT) AS n_matches,
           id_b AS best_id_b,
           ROUND(both_n * 1.0 / un, 6) AS best_jaccard
    FROM best WHERE rk = 1
    """


@query("text_setsim_prefix_join", oracle=_pfx_oracle)
def text_setsim_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity join by PREFIX FILTERING (the PPJoin family
    — Chaudhuri/Ganti/Kaushik ICDE'06, Xiao et al. WWW'08): the
    scale-correct EXACT algorithm beside the approximate LSH rows.
    Tokens get a GLOBAL frequency order (df, then token — total, so
    both engines rank identically); two docs can reach Jaccard ≥ 0.7
    only if their (n - ⌈0.7n⌉ + 1) RAREST tokens share one element —
    so candidate pairs come from an equi-join on prefix tokens only,
    then exact verification by full-set intersection, with PPJoin's
    integer length + positional filters pruning collisions before the
    verify.  Lossless by the prefix-filter theorem; the oracle runs
    the UNFILTERED prefix plan, so every gate run also certifies the
    prunes drop nothing (and pytest pins a brute-force twin).

    Exactness: the threshold decision is integer cross-multiplication
    (10·|∩| ≥ 7·|∪|); the per-doc argmax is keyed on an integer-
    quantized jaccard with an id tie-break (total order); jaccard is
    display-only ROUND 6.

    Output contract is LINEAR: duplicate clusters make the raw pair
    set quadratic in cluster size (5.1M true pairs at sf0.1 from dup
    clusters), so the row emits the per-doc summary (match count +
    best match) — the pair relation stays internal, as a 100 TB dedup
    job would keep it.

    Scale shape: the candidate join touches only each doc's ~0.3n
    rarest tokens — hot tokens (stopwords) sort LAST and never enter
    prefixes, so the skew that forces `text_jaccard_neardup`'s DF cap
    is avoided BY CONSTRUCTION rather than by truncation; verification
    cost is per-candidate, and candidates are df-bounded per prefix
    token.  This is how exact dedup at 100 TB is actually run."""
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window as W

    tok = (
        t.documents.repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .distinct()
    )
    # INT-ID DICTIONARY (round 12, guide §2.3 narrower types): the df
    # aggregate doubles as the vocabulary, and each token gets a
    # deterministic injective int64 id (hash bucket * 2^40 +
    # rank-within-bucket — two-phase, so no vocab-wide single-partition
    # sort; the `pipe_neardup_dedup` dictionary discipline).  The
    # prefix self-join then collides on a LONG instead of a ~40-char
    # string, and the exact verify intersects two INT arrays.  |A∩B|,
    # |A|, |B| are invariant under any injective relabeling and every
    # threshold/argmax decision is integer arithmetic on those sizes,
    # so the output — and the string-side oracle — is unchanged.
    # Broadcasting the vocab also keeps the token stream partitioned
    # by doc_id straight into the rank window (the string-keyed df
    # join re-shuffled it by token and back).
    bucket = F.pmod(F.xxhash64("token"), F.lit(1024)).cast("int")
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("df"))
        .withColumn("b", bucket)
        .withColumn(
            "tid",
            F.col("b").cast("long") * F.lit(1 << 40).cast("long")
            + F.row_number().over(W.partitionBy("b").orderBy("token")),
        )
        .select("token", "df", "tid")
    )
    ranked = (
        tok.join(F.broadcast(vocab), "token")
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("doc_id").orderBy("df", "token")
            ),
        )
        .withColumn("n", F.count("*").over(W.partitionBy("doc_id")))
    )
    pfx = ranked.filter(
        F.col("rn")
        <= F.col("n")
        - F.expr(
            f"({_PFX_TAU_NUM} * n + {_PFX_TAU_DEN} - 1)"
            f" div {_PFX_TAU_DEN}"
        )
        + 1
    ).select("doc_id", "tid", "rn", "n")
    a = pfx.select(
        F.col("doc_id").alias("id_a"),
        "tid",
        F.col("rn").alias("pa"),
        F.col("n").alias("na_p"),
    )
    b = pfx.select(
        F.col("doc_id").alias("id_b"),
        "tid",
        F.col("rn").alias("pb"),
        F.col("n").alias("nb_p"),
    )
    # PPJoin's two LOSSLESS pre-verification prunes, both integer:
    # length filter (J >= tau forces 7*max(n) <= 10*min(n)) and the
    # positional filter (a collision at prefix positions pa/pb bounds
    # the overlap by ub = 1 + min(na-pa, nb-pb); J >= tau needs
    # 17*ub >= 7*(na+nb)).  Together they drop ~2/3 of raw prefix
    # collisions BEFORE the pair-distinct and the array verify
    # (14.2 s -> 5.8 s at sf0.1); the oracle keeps the plain prefix
    # candidate set, so the gate also certifies the prunes lossless.
    raw = (
        a.join(b, "tid")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.lit(_PFX_TAU_NUM) * F.greatest("na_p", "nb_p")
            <= F.lit(_PFX_TAU_DEN) * F.least("na_p", "nb_p")
        )
        .filter(
            F.lit(_PFX_TAU_DEN + _PFX_TAU_NUM)
            * (
                F.lit(1)
                + F.least(
                    F.col("na_p") - F.col("pa"),
                    F.col("nb_p") - F.col("pb"),
                )
            )
            >= F.lit(_PFX_TAU_NUM) * (F.col("na_p") + F.col("nb_p"))
        )
    )
    cand = raw.select("id_a", "id_b").distinct()
    lists = (
        tok.join(F.broadcast(vocab.select("token", "tid")), "token")
        .groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list("tid")).alias("toks"),
            F.count("*").alias("n"),
        )
    )
    la = lists.select(
        F.col("doc_id").alias("id_a"),
        F.col("toks").alias("toks_a"),
        F.col("n").alias("na"),
    )
    lb = lists.select(
        F.col("doc_id").alias("id_b"),
        F.col("toks").alias("toks_b"),
        F.col("n").alias("nb"),
    )
    v = (
        cand.join(la, "id_a")
        .join(lb, "id_b")
        .withColumn(
            "both_n", F.size(F.array_intersect("toks_a", "toks_b"))
        )
    )
    hits = v.filter(
        F.lit(_PFX_TAU_DEN) * F.col("both_n")
        >= F.lit(_PFX_TAU_NUM)
        * (F.col("na") + F.col("nb") - F.col("both_n"))
    ).select(
        "id_a",
        "id_b",
        "both_n",
        (F.col("na") + F.col("nb") - F.col("both_n")).alias("un"),
    )
    # linear output contract: duplicate CLUSTERS make the raw pair set
    # quadratic in cluster size (5.1M true pairs at sf0.1), so the row
    # emits the per-doc summary — match count + argmax match, the
    # argmax keyed on an exact integer-quantized jaccard with an id
    # tie-break (total order on both engines)
    # argmax as a HASH AGGREGATE (max_by on the lexicographic struct
    # (quantized_j, -id_b)), not a sort-window: partial aggregation
    # combines map-side, so the 5.1M-hit relation never needs a
    # per-doc sort — same total order as the oracle's ROW_NUMBER
    # (jq DESC, id_b ASC)
    best = hits.groupBy("id_a").agg(
        F.count("*").cast("bigint").alias("n_matches"),
        F.max_by(
            F.struct("id_b", "both_n", "un"),
            F.struct(
                F.expr(
                    "(CAST(both_n AS BIGINT) * 1000000000) div un"
                ).alias("jq"),
                (-F.col("id_b")).alias("nid"),
            ),
        ).alias("bst"),
    )
    return best.select(
        "id_a",
        "n_matches",
        F.col("bst.id_b").alias("best_id_b"),
        F.round(F.col("bst.both_n") / F.col("bst.un"), 6).alias(
            "best_jaccard"
        ),
    )


# ---------------------------------------------------------------------------
# rel_gdpr_delete — merge-on-read deletion vectors (right-to-be-forgotten)
# ---------------------------------------------------------------------------


@query(
    "rel_gdpr_delete",
    oracle="""
    WITH victim AS (SELECT MIN(o_custkey) AS v FROM orders)
    SELECT o_orderstatus AS status,
           CAST(SUM(CASE WHEN o_custkey <> (SELECT v FROM victim)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
           CAST(SUM(CASE WHEN o_custkey = (SELECT v FROM victim)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_deleted,
           CAST(SUM(CASE WHEN o_custkey <> (SELECT v FROM victim)
                         THEN CAST(ROUND(o_totalprice * 100) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS live_cents
    FROM orders GROUP BY o_orderstatus
    """,
)
def rel_gdpr_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ DELETION VECTORS — the right-to-be-forgotten
    pattern every lakehouse format ships (Delta deletion vectors,
    Iceberg positional deletes): deleting one subject's rows from an
    immutable 100 TB table must NOT rewrite the table.  The base stays
    as-written; a KB-sized sidecar of deleted keys (here: every order
    of the lexicographically first customer) lands next to it, and
    every read applies `base ANTI JOIN sidecar` (broadcast — the
    deletion vector is small by construction).  The report aggregates
    the LIVE view and counts what the vector masks; the oracle
    computes both straight from the source table.

    Scale shape: the delete costs one key-scan + KB write, reads cost
    one broadcast anti-join (Bloom-prunable at scale); compaction
    (`sink_compaction`'s job) eventually folds vectors into rewritten
    files.  Append-only + sidecar = the same manifest discipline as
    `sink_versioned_snapshot`."""
    import os
    import shutil

    from ..sources.readers import (
        layout_current,
        staging_dir,
        stamp_layout,
    )

    t = Tables(spark, sf_dir)
    root = os.path.join(staging_dir(sf_dir, "gdpr"), "orders_mor")
    if not layout_current(root, sf_dir, table="orders"):
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        t.orders.select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias(
                "cents"
            ),
        ).write.mode("overwrite").parquet(os.path.join(root, "base"))
        base = spark.read.parquet(os.path.join(root, "base"))
        victim = base.agg(F.min("o_custkey").alias("v"))
        dv = base.join(
            F.broadcast(victim), base["o_custkey"] == victim["v"]
        ).select("o_orderkey")
        dv.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(root, "dv")
        )
        # root-level _SUCCESS is the reuse marker layout_current checks
        # (the parquet writers only mark their own subdirs)
        open(os.path.join(root, "_SUCCESS"), "w").close()
        stamp_layout(root, sf_dir, table="orders")
    base = spark.read.parquet(os.path.join(root, "base"))
    dv = spark.read.parquet(os.path.join(root, "dv"))
    live = base.join(F.broadcast(dv), "o_orderkey", "left_anti")
    dead = base.join(F.broadcast(dv), "o_orderkey", "left_semi")
    live_agg = live.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("n_live"),
        F.sum("cents").cast("bigint").alias("live_cents"),
    )
    dead_agg = dead.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("n_deleted")
    )
    return (
        live_agg.join(dead_agg, "status", "left")
        .select(
            "status",
            "n_live",
            F.coalesce("n_deleted", F.lit(0)).cast("bigint").alias(
                "n_deleted"
            ),
            "live_cents",
        )
    )


# ---------------------------------------------------------------------------
# text_quality_logreg — linear quality classifier applied at scale
# ---------------------------------------------------------------------------

# Fixed "published" weights in nano-units (micro x micro features ->
# the margin is an exact BIGINT in 1e-12 units after the dot product).
# Features (all exact micro-unit rationals): doc length in tokens
# (capped), type-token ratio, mean token length, short-token share.
_LOGREG_W = {
    "bias": -2_500_000,  # -2.5 in micro
    "w_len": 5_000,  # per token, micro
    "w_ttr": 2_000_000,  # x ttr
    "w_mtl": 300_000,  # x mean token length
    "w_short": -1_800_000,  # x short-token share
}


@query(
    "text_quality_logreg",
    oracle=f"""
    WITH tok AS (
        SELECT d.doc_id, t.token
        FROM documents d, UNNEST(string_split(d.text, ' ')) AS t(token)
    ),
    feats AS (
        SELECT doc_id,
               LEAST(COUNT(*), CAST(400 AS BIGINT)) AS n_tok,
               (COUNT(DISTINCT token) * 1000000) // COUNT(*) AS ttr_u,
               (SUM(LEN(token)) * 1000000) // COUNT(*) AS mtl_u,
               (SUM(CASE WHEN LEN(token) <= 2 THEN 1 ELSE 0 END)
                * 1000000) // COUNT(*) AS short_u
        FROM tok GROUP BY doc_id
    )
    SELECT doc_id,
           CAST({_LOGREG_W["bias"]} * CAST(1000000 AS BIGINT)
                + {_LOGREG_W["w_len"]} * n_tok * 1000000
                + {_LOGREG_W["w_ttr"]} * ttr_u
                + {_LOGREG_W["w_mtl"]} * mtl_u
                + {_LOGREG_W["w_short"]} * short_u AS BIGINT)
               AS margin_pico,
           CAST(CASE WHEN {_LOGREG_W["bias"]} * CAST(1000000 AS BIGINT)
                + {_LOGREG_W["w_len"]} * n_tok * 1000000
                + {_LOGREG_W["w_ttr"]} * ttr_u
                + {_LOGREG_W["w_mtl"]} * mtl_u
                + {_LOGREG_W["w_short"]} * short_u >= 0
                THEN 1 ELSE 0 END AS INTEGER) AS keep
    FROM feats
    """,
)
def text_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR QUALITY CLASSIFIER applied at corpus scale — the
    fastText/logreg "is this document trainable" gate every LLM data
    pipeline runs (CCNet, Gopher, FineWeb all ship one): fixed
    published-style weights over cheap structural features (length,
    type-token ratio, mean token length, short-token share).  The
    MARGIN (w·x) is computed entirely in integer units — features are
    micro-unit rationals (integer div), weights micro-unit integers,
    so the keep/drop DECISION (margin ≥ 0) is bit-exact on every
    engine and partitioning; the sigmoid is monotone, so ranking and
    thresholding never need the float probability (engines' EXP
    implementations differ at the ulp — it stays out of the contract).

    Scale shape: one tokenize-aggregate pass (pre-explode
    repartition), one projection; weights are constants folded into
    codegen.  Re-scoring 100 TB with new weights is a projection-only
    job — no shuffle."""
    t = Tables(spark, sf_dir)
    tok = t.documents.repartition(spark.sparkContext.defaultParallelism, "doc_id").select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    feats = tok.groupBy("doc_id").agg(
        F.least(F.count("*"), F.lit(400).cast("bigint")).alias("n_tok"),
        F.expr("(COUNT(DISTINCT token) * 1000000) div COUNT(*)").alias(
            "ttr_u"
        ),
        F.expr("(SUM(LENGTH(token)) * 1000000) div COUNT(*)").alias(
            "mtl_u"
        ),
        F.expr(
            "(SUM(CASE WHEN LENGTH(token) <= 2 THEN 1 ELSE 0 END)"
            " * 1000000) div COUNT(*)"
        ).alias("short_u"),
    )
    margin = (
        F.lit(_LOGREG_W["bias"]) * F.lit(1_000_000).cast("bigint")
        + F.lit(_LOGREG_W["w_len"]) * F.col("n_tok") * F.lit(1_000_000)
        + F.lit(_LOGREG_W["w_ttr"]) * F.col("ttr_u")
        + F.lit(_LOGREG_W["w_mtl"]) * F.col("mtl_u")
        + F.lit(_LOGREG_W["w_short"]) * F.col("short_u")
    )
    return feats.select(
        "doc_id",
        margin.cast("bigint").alias("margin_pico"),
        F.when(margin >= 0, 1).otherwise(0).cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------------
# rel_holt_linear — window-truncated Holt double exponential smoothing
# ---------------------------------------------------------------------------

_HOLT_W = 12  # window length (days); alpha = beta = 1/2


def _holt_coeffs() -> tuple[int, list[int], list[int]]:
    """Exact integer Holt coefficients: simulate the alpha=beta=1/2
    recurrence over a W-day restart window (l_0 = y_oldest, b_0 = 0)
    in exact rational arithmetic, then clear denominators.  Returns
    (D, level_num[j], trend_num[j]) with j = days-ago lag, so that
    l_t = sum_j level_num[j] * y_{t-j} / D (and likewise the trend).
    D = 2^22 for W=12; max |numerator| = 2^21, so si (<= ~1e9 micro)
    keeps every term and the 12-term sum far inside BIGINT."""
    from fractions import Fraction
    from math import lcm

    w = _HOLT_W
    lv = [Fraction(0)] * w
    tr = [Fraction(0)] * w
    lv[0] = Fraction(1)
    for i in range(1, w):
        ln = [
            (Fraction(1 if k == i else 0) + lv[k] + tr[k]) / 2
            for k in range(w)
        ]
        tn = [(ln[k] - lv[k] + tr[k]) / 2 for k in range(w)]
        lv, tr = ln, tn
    d = lcm(*[c.denominator for c in lv + tr])
    nl = [int(lv[w - 1 - j] * d) for j in range(w)]
    nb = [int(tr[w - 1 - j] * d) for j in range(w)]
    return d, nl, nb


_HOLT_D, _HOLT_NL, _HOLT_NB = _holt_coeffs()


def _holt_oracle() -> str:
    from .series import _GRID_SQL

    w = _HOLT_W
    nl = ", ".join(str(x) for x in _HOLT_NL)
    nb = ", ".join(str(x) for x in _HOLT_NB)
    return f"""
    WITH {_GRID_SQL},
    contrib AS (
        SELECT g.user_id, g.dy + j.j AS dy,
               g.si * ([{nl}][j.j + 1]) AS lterm,
               g.si * ([{nb}][j.j + 1]) AS bterm
        FROM grid g
        CROSS JOIN (SELECT UNNEST(generate_series(0, {w - 1})) AS j) j
    ),
    win AS (
        SELECT c.user_id, c.dy,
               CAST(SUM(c.lterm) AS BIGINT) AS lnum,
               CAST(SUM(c.bterm) AS BIGINT) AS bnum,
               COUNT(*) AS k
        FROM contrib c JOIN grid t
          ON t.user_id = c.user_id AND t.dy = c.dy
        GROUP BY 1, 2
        HAVING COUNT(*) = {w}
    )
    SELECT user_id, dy,
           ROUND(CAST(lnum AS DOUBLE) / {_HOLT_D} / 1e6, 6) AS level,
           ROUND(CAST(bnum AS DOUBLE) / {_HOLT_D} / 1e6, 6) + 0.0
               AS trend,
           ROUND(CAST(lnum + bnum AS DOUBLE) / {_HOLT_D} / 1e6, 6) + 0.0
               AS forecast
    FROM win
    """


@query("rel_holt_linear", oracle=_holt_oracle)
def rel_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOLT DOUBLE EXPONENTIAL SMOOTHING (level + trend) per user over
    the dense daily grid — the trend-aware upgrade of ``rel_ewma`` and
    the one-step forecast a monitoring pipeline actually pages on.
    alpha = beta = 1/2 over a 12-day RESTART WINDOW (l initialized to
    the window's oldest value, b to 0): truncation turns the unbounded
    recurrence into a FIXED linear combination of the last 12 days, so
    the whole statistic is one explode + equi-join + integer sum — the
    same linear shape as ``rel_ewma``, never a sequential scan.

    Exactness: the recurrence is simulated ONCE in exact rational
    arithmetic (`fractions`) and cleared to integer numerators over
    D = 2^22; each day's contribution si * n_j is BIGINT (max |n_j| =
    2^21, si <= ~1e9 micro at sf0.1 -> terms <= ~2e15, 12-term sums
    <= ~2.2e16, 400x int64 headroom); level/trend/forecast are single
    final float expressions with identical operation order on both
    engines (trend/forecast sign-cross -> `+ 0.0` negative-zero
    guard).  Restart-window Holt is what sequence-parallel systems
    ship for exponential smoothing at scale: an untruncated backward
    recurrence would serialize each user's 100 TB history, while the
    window form is one shuffle on the (user, day) key the daily rollup
    already produced, with per-day fan-out exactly W."""
    from .series import _daily_grid

    w = _HOLT_W
    t = Tables(spark, sf_dir)
    grid = _daily_grid(t)
    nl = F.array(*[F.lit(x).cast("long") for x in _HOLT_NL])
    nb = F.array(*[F.lit(x).cast("long") for x in _HOLT_NB])
    contrib = grid.select(
        "user_id",
        "dy",
        "si",
        F.explode(F.sequence(F.lit(0), F.lit(w - 1))).alias("j"),
    ).select(
        "user_id",
        (F.col("dy") + F.col("j")).alias("dy"),
        (F.col("si") * F.element_at(nl, F.col("j") + 1)).alias("lterm"),
        (F.col("si") * F.element_at(nb, F.col("j") + 1)).alias("bterm"),
    )
    win = (
        contrib.join(grid.select("user_id", "dy"), ["user_id", "dy"])
        .groupBy("user_id", "dy")
        .agg(
            F.sum("lterm").alias("lnum"),
            F.sum("bterm").alias("bnum"),
            F.count("*").alias("k"),
        )
        .filter(F.col("k") == w)
    )
    d = float(_HOLT_D)
    return win.select(
        "user_id",
        "dy",
        F.round(F.col("lnum").cast("double") / d / 1e6, 6).alias(
            "level"
        ),
        (
            F.round(F.col("bnum").cast("double") / d / 1e6, 6) + 0.0
        ).alias("trend"),
        (
            F.round(
                (F.col("lnum") + F.col("bnum")).cast("double") / d / 1e6,
                6,
            )
            + 0.0
        ).alias("forecast"),
    )


# ---------------------------------------------------------------------------
# text_dup_ngram_coverage — exact substring-dedup coverage (Lee et al.)
# ---------------------------------------------------------------------------

_DUPCOV_N = 8  # n-gram (token) run length


@query(
    "text_dup_ngram_coverage",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    starts AS (
        SELECT t.doc_id, s.i,
               array_to_string(list_slice(t.l, s.i, s.i + {_DUPCOV_N - 1}),
                               ' ') AS gram
        FROM toks t,
             UNNEST(generate_series(1, len(t.l) - {_DUPCOV_N - 1}))
                 AS s(i)
    ),
    dup AS (
        SELECT gram FROM starts GROUP BY gram HAVING COUNT(*) >= 2
    ),
    ds AS (
        SELECT s.doc_id, s.i,
               LEAD(s.i) OVER (PARTITION BY s.doc_id ORDER BY s.i)
                   AS nxt
        FROM starts s JOIN dup USING (gram)
    ),
    cov AS (
        SELECT doc_id, COUNT(*) AS n_dup_starts,
               CAST(SUM(LEAST({_DUPCOV_N},
                              COALESCE(nxt - i, {_DUPCOV_N})))
                    AS BIGINT) AS covered_tok
        FROM ds GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(len(t.l) AS BIGINT) AS n_tok,
           CAST(COALESCE(c.n_dup_starts, 0) AS BIGINT) AS n_dup_starts,
           COALESCE(c.covered_tok, 0) AS covered_tok,
           ROUND(COALESCE(c.covered_tok, 0) * 1.0 / len(t.l), 6)
               AS coverage
    FROM toks t LEFT JOIN cov c USING (doc_id)
    """,
)
def text_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT SUBSTRING-DEDUP COVERAGE — the corpus statistic behind
    suffix-array substring deduplication (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL'22): for every
    document, the fraction of token positions covered by an 8-token
    run that occurs at least twice in the corpus (anywhere — another
    doc or a self-repeat).  This is the decision input for substring
    CUTTING (as opposed to whole-doc dropping): pipelines excise the
    covered spans and keep the remainder.

    Shape: one shingle pass (doc-parallel), one shingle-count
    aggregation, one semi-join back, then a per-doc interval-union via
    LEAD — overlapping dup runs merge exactly with
    LEAST(n, next_start - start), so `covered_tok` is the true union
    length of duplicated spans, in integers end to end (the ratio is
    display-only ROUND 6).  The distributed plan is the practical
    stand-in for a 100 TB suffix array: shingle counts shard by hash
    like any aggregation (hot shingles are just big counters), the
    semi-join clusters on the shingle key, and the interval union is a
    per-doc window over at most n_tok rows — no global sort, no
    driver state."""
    from pyspark.sql import Window as W

    n = _DUPCOV_N
    t = Tables(spark, sf_dir)
    toks = t.documents.repartition(spark.sparkContext.defaultParallelism, "doc_id").select(
        "doc_id", F.split("text", " ").alias("l")
    )
    starts = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("l") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("l") - (n - 1)),
                    lambda i: F.struct(
                        i.alias("i"),
                        F.array_join(
                            F.slice("l", i, n), " "
                        ).alias("gram"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("s"),
    ).select("doc_id", F.col("s.i").alias("i"), F.col("s.gram").alias("gram"))
    dup = (
        starts.groupBy("gram")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("gram")
    )
    ds = starts.join(dup, "gram", "left_semi").withColumn(
        "nxt", F.lead("i").over(W.partitionBy("doc_id").orderBy("i"))
    )
    cov = ds.groupBy("doc_id").agg(
        F.count("*").alias("n_dup_starts"),
        F.sum(
            F.least(F.lit(n), F.coalesce(F.col("nxt") - F.col("i"), F.lit(n)))
        )
        .cast("bigint")
        .alias("covered_tok"),
    )
    return (
        toks.select("doc_id", F.size("l").cast("bigint").alias("n_tok"))
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            F.coalesce("n_dup_starts", F.lit(0))
            .cast("bigint")
            .alias("n_dup_starts"),
            F.coalesce("covered_tok", F.lit(0)).alias("covered_tok"),
            F.round(
                F.coalesce("covered_tok", F.lit(0)) / F.col("n_tok"), 6
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# rel_pit_join — point-in-time join against SCD2 validity intervals
# ---------------------------------------------------------------------------

_PIT_PRICE = 200_000  # change-event threshold (mirrors rel_scd2_merge)


@query(
    "rel_pit_join",
    oracle=f"""
    WITH chg AS (
        SELECT o_custkey AS c_custkey,
               MIN(epoch_us(CAST(o_orderdate AS TIMESTAMP))) AS eff_us
        FROM orders WHERE o_totalprice > {_PIT_PRICE}
        GROUP BY o_custkey
    ),
    dim AS (
        SELECT c.c_custkey, 1 AS version, c.c_mktsegment,
               CAST(NULL AS BIGINT) AS valid_from_us,
               g.eff_us AS valid_to_us
        FROM customer c LEFT JOIN chg g USING (c_custkey)
        UNION ALL
        SELECT c.c_custkey, 2, c.c_mktsegment, g.eff_us,
               CAST(NULL AS BIGINT)
        FROM customer c JOIN chg g USING (c_custkey)
    ),
    pit AS (
        SELECT d.version, d.c_mktsegment,
               CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents
        FROM orders o
        JOIN dim d ON d.c_custkey = o.o_custkey
        AND (d.valid_from_us IS NULL
             OR epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
                >= d.valid_from_us)
        AND (d.valid_to_us IS NULL
             OR epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
                < d.valid_to_us)
    )
    SELECT version, c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS cents
    FROM pit GROUP BY version, c_mktsegment
    """,
)
def rel_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME JOIN — the feature-store / SCD2 lookup: every
    order joins the dimension VERSION that was valid at order time
    (version 1 before the customer's first 200k+ order, version 2
    from that instant on — the same change construction as
    ``rel_scd2_merge``), then aggregates order count + cents by
    (version, segment).  This is the train-time "no data leakage"
    join: features must come from the version valid AT the event, not
    the latest one.

    Exactness: validity bounds and event times are integer
    microseconds; the half-open [from, to) convention makes every
    event match EXACTLY one version (no boundary double-count — an
    order AT the effective instant belongs to v2).  Sums in integer
    cents.

    Scale shape: one shuffle on the customer key joins events to
    their (<= 2, generally few) versions; the validity predicate is a
    join-side filter, so the pair fan-out is versions-per-key, never
    a band scan.  At 100 TB this is the bucketed-by-key PIT layout
    every feature store ships; the change aggregate itself is
    broadcast-sized."""
    t = Tables(spark, sf_dir)
    ts_us = F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    chg = (
        t.orders.filter(F.col("o_totalprice") > _PIT_PRICE)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.min(ts_us).alias("eff_us"))
    )
    cust = t.customer.select("c_custkey", "c_mktsegment")
    v1 = cust.join(F.broadcast(chg), "c_custkey", "left").select(
        "c_custkey",
        F.lit(1).alias("version"),
        "c_mktsegment",
        F.lit(None).cast("long").alias("valid_from_us"),
        F.col("eff_us").alias("valid_to_us"),
    )
    v2 = cust.join(F.broadcast(chg), "c_custkey").select(
        "c_custkey",
        F.lit(2).alias("version"),
        "c_mktsegment",
        F.col("eff_us").alias("valid_from_us"),
        F.lit(None).cast("long").alias("valid_to_us"),
    )
    dim = v1.unionByName(v2)
    o = t.orders.select(
        F.col("o_custkey").alias("c_custkey"),
        ts_us.alias("o_us"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias(
            "cents"
        ),
    )
    pit = o.join(dim, "c_custkey").filter(
        (
            F.col("valid_from_us").isNull()
            | (F.col("o_us") >= F.col("valid_from_us"))
        )
        & (
            F.col("valid_to_us").isNull()
            | (F.col("o_us") < F.col("valid_to_us"))
        )
    )
    return pit.groupBy(
        "version", F.col("c_mktsegment").alias("segment")
    ).agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("cents"),
    )


# ---------------------------------------------------------------------------
# pipe_doc_shuffle — deterministic global training shuffle + sharding
# ---------------------------------------------------------------------------

_SHUF_SALT = "ep0"  # epoch salt: changing it reshuffles deterministically
_SHUF_SHARDS = 8


@query(
    "pipe_doc_shuffle",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || '#{_SHUF_SALT}')
                   AS hk
        FROM documents
    ),
    rk AS (
        SELECT doc_id, hk,
               ROW_NUMBER() OVER (ORDER BY hk, doc_id) - 1 AS r
        FROM h
    )
    SELECT doc_id,
           CAST(r % {_SHUF_SHARDS} AS BIGINT) AS shard,
           CAST(r // {_SHUF_SHARDS} AS BIGINT) AS pos
    FROM rk
    """,
)
def pipe_doc_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC GLOBAL TRAINING SHUFFLE — the step between
    curation and tokenization in every LLM data pipeline: order the
    corpus by a SEEDED content-independent hash (md5(doc_id # salt) —
    changing the salt is a new epoch permutation, rerunning the same
    salt is bit-identical), then deal documents round-robin into
    training shards, recording (shard, position) for each doc.
    Round-robin in hash order gives every shard an iid sample AND
    near-equal cardinality (sizes differ by at most 1 — no
    hash-bucket skew), which is why dataloader sharding is dealt,
    not hashed.

    Exactness: the permutation key (hex md5, doc_id) is a total
    order; shard and pos are integer arithmetic on the dense rank.

    Scale shape: the global rank is TWO-PHASE, never a one-partition
    window — `repartitionByRange` on the hash key (a distributed
    range sort), a per-partition row_number, then each partition's
    rank offset joined in from a partition-count aggregate (32 rows,
    broadcast): the zipWithIndex pattern expressed declaratively.
    The result is the exact global dense rank WHEREVER the range
    boundaries fall, so the plan scales out while staying
    bit-deterministic.  At 100 TB you'd write shards straight out of
    the ranked partitions (partitionBy(shard))."""
    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    h = t.documents.select(
        "doc_id",
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"), F.lit(f"#{_SHUF_SALT}")
            )
        ).alias("hk"),
    ).repartitionByRange(32, "hk", "doc_id")
    # pid is materialized by a localCheckpoint BEFORE the window's
    # exchange: spark_partition_id() is stage-dependent, and without
    # the barrier Catalyst may collapse the projection into the
    # post-exchange stage, where the id no longer names the RANGE
    # partition the row sorted into
    pinned = h.withColumn(
        "pid", F.spark_partition_id()
    ).localCheckpoint()
    local = pinned.select(
        "doc_id",
        "hk",
        "pid",
        (
            F.row_number().over(
                W.partitionBy("pid").orderBy("hk", "doc_id")
            )
            - 1
        ).alias("lr"),
    )
    offsets = (
        local.groupBy("pid")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "off",
            F.coalesce(
                F.sum("cnt").over(
                    W.orderBy("pid").rowsBetween(
                        W.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("pid", "off")
    )
    rk = local.join(F.broadcast(offsets), "pid").withColumn(
        "r", F.col("off") + F.col("lr")
    )
    return rk.select(
        "doc_id",
        F.pmod("r", F.lit(_SHUF_SHARDS)).cast("bigint").alias("shard"),
        F.expr(f"r div {_SHUF_SHARDS}").cast("bigint").alias("pos"),
    )


# ---------------------------------------------------------------------------
# graph_stress_betweenness — exact S-restricted stress centrality
# ---------------------------------------------------------------------------

_STRESS_K = 4  # pivot sources: the k smallest nodes in the edge set
_STRESS_D = 4  # BFS horizon (pairs farther apart don't contribute)


def _stress_oracle() -> str:
    ctes = [
        f"""
    b AS (
        SELECT user_id,
               CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 86400e6)
                    AS BIGINT) AS dy,
               MIN(value) AS v
        FROM events GROUP BY 1, 2
    ),
    e AS MATERIALIZED (
        SELECT a.user_id u, c.user_id v
        FROM b a JOIN b c
          ON a.dy = c.dy AND a.user_id < c.user_id
         AND ABS(a.v - c.v) <= 1.0
        GROUP BY 1, 2 HAVING COUNT(*) >= 3
    ),
    und AS (SELECT u AS s, v AS t FROM e UNION ALL SELECT v, u FROM e),
    srcs AS (
        SELECT node FROM (
            SELECT u AS node FROM e UNION SELECT v FROM e
        ) n ORDER BY node LIMIT {_STRESS_K}
    ),
    f0 AS (SELECT node AS src, node, CAST(1 AS BIGINT) AS sigma
           FROM srcs),
    seen0 AS (SELECT src, node FROM f0)"""
    ]
    for h in range(1, _STRESS_D + 1):
        ctes.append(f"""
    f{h} AS (
        SELECT f.src, und.t AS node, SUM(f.sigma) AS sigma
        FROM und JOIN f{h - 1} f ON und.s = f.node
        WHERE NOT EXISTS (SELECT 1 FROM seen{h - 1} sn
                          WHERE sn.src = f.src AND sn.node = und.t)
        GROUP BY 1, 2
    ),
    seen{h} AS (SELECT src, node FROM seen{h - 1}
                UNION ALL SELECT src, node FROM f{h})""")
    levels = " UNION ALL ".join(
        f"SELECT src, node, {h} AS hop, sigma FROM f{h}"
        for h in range(_STRESS_D + 1)
    )
    ctes.append(f"bt AS MATERIALIZED (SELECT * FROM ({levels}))")
    return (
        "WITH " + ",".join(ctes)
        + """
    , st AS (
        SELECT src AS s, node AS t, hop AS hop_st FROM bt
        WHERE node IN (SELECT node FROM srcs) AND src < node
    )
    SELECT bs.node AS user_id,
           CAST(SUM(bs.sigma * bt2.sigma) AS BIGINT) AS stress_paths
    FROM st
    JOIN bt bs ON bs.src = st.s
    JOIN bt bt2 ON bt2.src = st.t AND bt2.node = bs.node
    WHERE bs.hop + bt2.hop = st.hop_st
      AND bs.node <> st.s AND bs.node <> st.t
    GROUP BY bs.node
    """
    )


@query("graph_stress_betweenness", oracle=_stress_oracle)
def graph_stress_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT STRESS CENTRALITY restricted to the pivot set S (the 4
    smallest nodes): for every node v, the NUMBER of shortest paths
    between distinct pivots s<t that pass strictly through v —
    sigma_st(v) = sigma_sv * sigma_vt whenever hop(s,v) + hop(v,t) =
    hop(s,t).  This is the integer core of Brandes' betweenness with
    pivot sampling (Brandes/Pich 2007): the ratio form divides by
    sigma_st per pair, which floats the result; the PATH-COUNT form is
    pure BIGINT arithmetic, so the whole centrality — the canonical
    "is this node a broker" statistic — hash-matches a chained-CTE
    DuckDB oracle exactly.  The D=4 horizon is self-consistent: any v
    on a shortest s-t path with hop(s,t) <= D has both legs <= D, so
    truncation never corrupts a counted pair.

    Scale shape: ALL pivots BFS together (one `src` column — k
    frontiers in the same joins); each round is one frontier⋈edges
    equi-join + one (src, node) hash agg summing path counts + one
    anti-join against the visited set, localCheckpoint'd (the BFS/CC
    lineage policy).  The pair-combine is two self-joins of the
    |S|x|V| tableau keyed on node — broadcast-sized pivot tables at
    any graph scale.  Pivot count is the accuracy/cost dial exactly
    as in published approximate-betweenness systems."""
    from .mining import comovement_edges

    e = comovement_edges(spark, sf_dir)
    und = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    nodes = e.select(F.col("u").alias("node")).unionAll(
        e.select(F.col("v").alias("node"))
    ).distinct()
    srcs = nodes.orderBy("node").limit(_STRESS_K)
    f = srcs.select(
        F.col("node").alias("src"),
        "node",
        F.lit(1).cast("bigint").alias("sigma"),
    ).localCheckpoint()
    bt = f.withColumn("hop", F.lit(0))
    seen = f.select("src", "node")
    for h in range(1, _STRESS_D + 1):
        f = (
            und.join(f, und["u"] == f["node"])
            .select("src", F.col("v").alias("node"), "sigma")
            .groupBy("src", "node")
            .agg(F.sum("sigma").alias("sigma"))
            .join(seen, ["src", "node"], "left_anti")
            .localCheckpoint()
        )
        bt = bt.unionByName(f.withColumn("hop", F.lit(h)))
        seen = seen.unionByName(f.select("src", "node")).localCheckpoint()
    bt = bt.localCheckpoint()
    src_set = srcs.select(F.col("node").alias("t"))
    st = (
        bt.join(src_set, bt["node"] == src_set["t"])
        .filter(F.col("src") < F.col("node"))
        .select(
            F.col("src").alias("s"),
            F.col("t"),
            F.col("hop").alias("hop_st"),
        )
    )
    bs = bt.select(
        F.col("src").alias("s"),
        F.col("node").alias("v"),
        F.col("hop").alias("hop_sv"),
        F.col("sigma").alias("sig_sv"),
    )
    btv = bt.select(
        F.col("src").alias("t"),
        F.col("node").alias("v"),
        F.col("hop").alias("hop_tv"),
        F.col("sigma").alias("sig_tv"),
    )
    return (
        F.broadcast(st)
        .join(bs, "s")
        .join(btv, ["t", "v"])
        .filter(
            (F.col("hop_sv") + F.col("hop_tv") == F.col("hop_st"))
            & (F.col("v") != F.col("s"))
            & (F.col("v") != F.col("t"))
        )
        .groupBy(F.col("v").alias("user_id"))
        .agg(
            F.sum(F.col("sig_sv") * F.col("sig_tv"))
            .cast("bigint")
            .alias("stress_paths")
        )
    )


# ---------------------------------------------------------------------------
# graph_temporal_reach — time-respecting reachability (earliest arrival)
# ---------------------------------------------------------------------------

_TR_ROUNDS = 4
_TR_EPS = "1.0"  # co-location eps (mirrors traj_comovement)
_TR_SENTINEL = -(2**40)  # "before all time" seed arrival


def _treach_oracle() -> str:
    from .mining import CAPPED_BASE_SQL

    ctes = [
        f"""
    b AS ({CAPPED_BASE_SQL}),
    te AS MATERIALIZED (
        SELECT a.user_id u, c.user_id AS w, a.dy
        FROM b a JOIN b c
          ON a.dy = c.dy AND a.user_id < c.user_id
         AND ABS(a.v - c.v) <= {_TR_EPS}
    ),
    und AS (SELECT u, w, dy FROM te UNION ALL SELECT w, u, dy FROM te),
    a0 AS (
        SELECT CAST((SELECT MIN(u) FROM te) AS BIGINT) AS node,
               CAST({_TR_SENTINEL} AS BIGINT) AS arr
    )"""
    ]
    for r in range(1, _TR_ROUNDS + 1):
        ctes.append(f"""
    a{r} AS (
        SELECT node, MIN(arr) AS arr FROM (
            SELECT node, arr FROM a{r - 1}
            UNION ALL
            SELECT und.w AS node, und.dy AS arr
            FROM und JOIN a{r - 1} ON und.u = a{r - 1}.node
            WHERE und.dy >= a{r - 1}.arr
        ) u GROUP BY node
    )""")
    return (
        "WITH " + ",".join(ctes)
        + f"""
    SELECT node AS user_id, arr AS arrival_day
    FROM a{_TR_ROUNDS} WHERE arr > {_TR_SENTINEL}
    """
    )


@query("graph_temporal_reach", oracle=_treach_oracle)
def graph_temporal_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-RESPECTING REACHABILITY (temporal graph semantics): which
    users can an "infection" starting at the seed (smallest user in
    the co-location relation) reach when each hop must use a contact
    on a day >= the day the carrier was itself reached — the
    contact-tracing / information-diffusion query, where STATIC
    reachability over-counts (a path using yesterday's contact after
    today's is not a real transmission chain).  Returns each reached
    user's EARLIEST possible arrival day after 4 relaxation rounds.

    Temporal edges are the per-day co-location pairs (same MIN-value
    representative + eps-cell equi-join as ``traj_comovement``, WITHOUT
    the >=3-days support filter — every contact-day is its own edge
    instant).  Earliest-arrival relaxes like Bellman-Ford under the
    non-decreasing-day constraint; all labels are integer days (the
    seed's label is an integer sentinel meaning "before all time"), so
    every min() is an integer decision and the chained-CTE DuckDB
    oracle matches bit-for-bit.

    Scale shape: per round ONE frontier⋈edges equi-join on the carrier
    key (the day constraint is a join-side filter) + ONE (node, min)
    hash agg, localCheckpoint'd — identical cost to a BFS round; the
    temporal dimension costs nothing extra because edges carry their
    instant as data.  At 100 TB the edge relation pre-partitions by
    carrier exactly like the SSSP row.  The contact base is the CAPPED
    per-(day, eps-cell) variant (``mining.comovement_base_capped``,
    top-64 user_ids per bucket, mirrored in the oracle): contact-day
    edge volume in a dense cell is quadratic in occupancy, and the cap
    bounds it by construction — the same dense-regime discipline as
    ``graph_clustering_coeff``."""
    from .mining import comovement_base_capped

    b = comovement_base_capped(spark, sf_dir)
    probe = b.withColumn(
        "cell",
        F.explode(
            F.array(F.col("cell") - 1, F.col("cell"), F.col("cell") + 1)
        ),
    )
    a, c = probe.alias("a"), b.alias("c")
    te = a.join(
        c,
        (F.col("a.dy") == F.col("c.dy"))
        & (F.col("a.cell") == F.col("c.cell"))
        & (F.col("a.user_id") < F.col("c.user_id"))
        & (F.abs(F.col("a.v") - F.col("c.v")) <= float(_TR_EPS)),
    ).select(
        F.col("a.user_id").alias("u"),
        F.col("c.user_id").alias("w"),
        F.col("a.dy").alias("dy"),
    )
    und = te.unionAll(
        te.select(F.col("w").alias("u"), F.col("u").alias("w"), "dy")
    ).localCheckpoint()
    arr = (
        te.agg(F.min("u").alias("node"))
        .filter(F.col("node").isNotNull())
        .withColumn("arr", F.lit(_TR_SENTINEL).cast("bigint"))
        .localCheckpoint()
    )
    for _ in range(_TR_ROUNDS):
        relax = (
            und.join(arr, und["u"] == arr["node"])
            .filter(F.col("dy") >= F.col("arr"))
            .select(F.col("w").alias("node"), F.col("dy").alias("arr"))
        )
        arr = (
            arr.select("node", "arr")
            .unionByName(relax)
            .groupBy("node")
            .agg(F.min("arr").alias("arr"))
            .localCheckpoint()
        )
    return arr.filter(F.col("arr") > _TR_SENTINEL).select(
        F.col("node").alias("user_id"), F.col("arr").alias("arrival_day")
    )


# ---------------------------------------------------------------------------
# rel_observe — the Observation API (in-flight pipeline metrics)
# ---------------------------------------------------------------------------


@query(
    "rel_observe",
    oracle="""
    SELECT 'orders_scan' AS pipeline_stage,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS cents,
           CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END)
                AS BIGINT) AS n_filled
    FROM orders
    """,
)
def rel_observe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OBSERVATION API (`df.observe`) — in-flight pipeline metrics:
    named aggregates evaluated as accumulators DURING a pass (here: a
    noop-sink write of the orders scan), then read from the driver —
    the data-quality counters every production job publishes without
    paying a second scan.  The metrics themselves are the result: one
    row (stage, row count, integer-cents sum, filled-order count).

    Exactness: observed metrics are Spark aggregates — the cents sum
    is quantized BEFORE summation, so the accumulator is integer and
    batching/partitioning-independent.

    Scale shape: observe() attaches accumulator expressions to the
    existing physical plan — zero extra shuffles, zero extra scans; at
    100 TB the metrics ride the write job.  (The action inside the
    builder is the point: observation only materializes with the
    pass.)"""
    from pyspark.sql import Observation

    t = Tables(spark, sf_dir)
    obs = Observation("orders_scan")
    df = t.orders.select(
        "o_orderkey",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias(
            "cents"
        ),
        "o_orderstatus",
    ).observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("cents"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias(
            "n_filled"
        ),
    )
    df.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                "orders_scan",
                int(m["n_rows"]),
                int(m["cents"]),
                int(m["n_filled"]),
            )
        ],
        "pipeline_stage string, n_rows bigint, cents bigint, "
        "n_filled bigint",
    )


# ---------------------------------------------------------------------------
# emb_kmeans_exact — integer-quantized Lloyd's k-means, FULL oracle
# ---------------------------------------------------------------------------

_KMX_K = 8
_KMX_ITERS = 3
_KMX_C = 100_000_000  # +C mean shift (bounds |q| <= 100 micro-units)


def _kmx_oracle() -> str:
    k, c = _KMX_K, _KMX_C
    ctes = [
        f"""
    v AS MATERIALIZED (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS i,
               CAST(ROUND(UNNEST(embedding) * 1e6) AS BIGINT) AS q
        FROM embeddings
    ),
    c0 AS (
        SELECT CAST(vec_id AS INTEGER) AS cl, i, q AS cq
        FROM v WHERE vec_id < {k}
    )"""
    ]
    for r in range(1, _KMX_ITERS + 1):
        ctes.append(f"""
    d{r} AS (
        SELECT v.vec_id, c.cl,
               SUM((v.q - c.cq) * (v.q - c.cq)) AS d2
        FROM v JOIN c{r - 1} c ON c.i = v.i
        GROUP BY 1, 2
    ),
    a{r} AS (
        SELECT vec_id, cl FROM (
            SELECT vec_id, cl,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cl) AS rk
            FROM d{r}
        ) WHERE rk = 1
    ),
    m{r} AS (
        SELECT a.cl, v.i,
               CAST((SUM(v.q) + COUNT(*) * {c}) // COUNT(*)
                    AS BIGINT) - {c} AS cq
        FROM a{r} a JOIN v ON v.vec_id = a.vec_id
        GROUP BY 1, 2
    ),
    c{r} AS (
        SELECT p.cl, p.i, COALESCE(m.cq, p.cq) AS cq
        FROM c{r - 1} p LEFT JOIN m{r} m
          ON m.cl = p.cl AND m.i = p.i
    )""")
    return (
        "WITH " + ",".join(ctes)
        + f"""
    SELECT a.cl AS cluster_id,
           CAST(COUNT(DISTINCT a.vec_id) AS BIGINT) AS n_members,
           CAST(MAX(CASE WHEN cf.i = 0 THEN cf.cq END) AS BIGINT)
               AS c0_micro,
           CAST(SUM(CASE WHEN a.vec_id = (SELECT MIN(vec_id)
                                          FROM a{_KMX_ITERS} x
                                          WHERE x.cl = a.cl)
                         THEN ABS(cf.cq) ELSE 0 END) AS BIGINT)
               AS l1_micro
    FROM a{_KMX_ITERS} a
    JOIN c{_KMX_ITERS} cf ON cf.cl = a.cl
    GROUP BY a.cl
    """
    )


@query("emb_kmeans_exact", oracle=_kmx_oracle)
def emb_kmeans_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENGINE-EXACT Lloyd's k-means (k=8, 3 iterations, init = the k
    lowest vec_ids) — the WEAK float `emb_kmeans` row upgraded to a
    bit-reproducible contract: coordinates quantize ONCE to micro-unit
    BIGINTs, every distance is an integer sum of squares (argmin ties
    to the lowest cluster id — a total order), and every centroid
    update is the exact shifted integer mean floor((Σq + n·C)/n) − C
    (the `sim_knn_filtered` house pattern; +C keeps the numerator
    positive so Spark's `div` and DuckDB's `//` agree).  The ENTIRE
    3-round Lloyd evolution — assignment, mean, empty-cluster
    carry-forward — replays as one unrolled SQL statement in DuckDB
    and hash-matches: iterative ML made engine-exact, the codebook
    training loop IVF/PQ quality depends on made auditable.

    Output: per cluster, member count + centroid dim-0 + centroid L1
    norm (micro) — the checkable fingerprint of the fitted codebook.

    Scale shape: per round one k-row broadcast + one argmin pass + one
    (cl, dim) hash agg — identical plan family to the float row;
    quantization changes no asymptotics, only determinism.  d2 <=
    64·(2e8)² ≈ 2.6e18 < 2^63 bounds the integer products."""
    t = Tables(spark, sf_dir)
    emb = t.embeddings.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(ROUND(x * 1e6) AS BIGINT))"
        ).alias("q"),
    )
    cent = emb.filter(F.col("vec_id") < _KMX_K).select(
        F.col("vec_id").cast("int").alias("cl"),
        F.col("q").alias("cq"),
    )
    d2 = F.aggregate(
        F.zip_with("q", "cq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    assigned = None
    for _ in range(_KMX_ITERS):
        assigned = (
            emb.join(F.broadcast(cent))
            .withColumn("d2", d2)
            .groupBy("vec_id")
            .agg(
                F.min_by("cl", F.struct("d2", "cl")).alias("cl"),
                F.first("q").alias("q"),
            )
        )
        means = (
            assigned.select("cl", F.posexplode("q").alias("i", "x"))
            .groupBy("cl", "i")
            .agg(
                (
                    F.expr(
                        f"(sum(x) + count(*) * {_KMX_C})"
                        f" div count(*)"
                    )
                    - F.lit(_KMX_C)
                ).alias("cq")
            )
        )
        prev = cent.select(
            "cl", F.posexplode("cq").alias("i", "pq")
        )
        cent = (
            prev.join(means, ["cl", "i"], "left")
            .select(
                "cl", "i", F.coalesce("cq", F.col("pq")).alias("cq")
            )
            .groupBy("cl")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("i", "cq"))
                ).alias("p")
            )
            .select(
                "cl", F.transform("p", lambda s: s["cq"]).alias("cq")
            )
        )
    sizes = assigned.groupBy("cl").agg(
        F.count("*").cast("bigint").alias("n_members")
    )
    fp = cent.select(
        "cl",
        F.element_at("cq", 1).cast("bigint").alias("c0_micro"),
        F.aggregate(
            "cq",
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + F.abs(x),
        )
        .cast("bigint")
        .alias("l1_micro"),
    )
    return sizes.join(fp, "cl").select(
        F.col("cl").alias("cluster_id"),
        "n_members",
        "c0_micro",
        "l1_micro",
    )


# ---------------------------------------------------------------------------
# sim_knn_pq_exact — engine-exact product quantization (train+encode+ADC)
# ---------------------------------------------------------------------------

_PQX_M = 8  # subspaces (64 dims -> 8 x 8)
_PQX_SUB = 8
_PQX_K = 16  # codewords per subspace
_PQX_ITERS = 2
_PQX_TOPK = 10


def pqx_scored(subv: DataFrame, cent: DataFrame) -> DataFrame:
    """Score every (vec_id, m) subvector against a trained codebook:
    broadcast join on the subspace + integer squared distance d2."""
    d2 = F.aggregate(
        F.zip_with("sub", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return subv.join(F.broadcast(cent), "m").withColumn("d2", d2)


def pqx_lloyd(subv: DataFrame) -> DataFrame:
    """Shared integer-exact PQ Lloyd trainer: given subvector rows
    (vec_id, m, sub: array<bigint>), run _PQX_ITERS rounds — integer
    argmin assignment (ties -> lowest cid), shifted integer means,
    empty-code coordinate carry-forward — with init = the _PQX_K
    lowest vec_ids' subvectors, and return the FINAL codebook
    (m, cid, c: array<bigint>).  Callers derive codes (per-(vec_id, m)
    argmin over `pqx_scored`) and ADC tables from it.  Used by
    `sim_knn_pq_exact` / `sim_knn_pq` (raw subvectors) and
    `sim_knn_ivfpq` (coarse-cell residual subvectors)."""
    cent = subv.filter(F.col("vec_id") < _PQX_K).select(
        "m",
        F.col("vec_id").cast("int").alias("cid"),
        F.col("sub").alias("c"),
    )
    d2 = F.aggregate(
        F.zip_with("sub", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    for _ in range(_PQX_ITERS):
        assigned = (
            subv.join(F.broadcast(cent), "m")
            .withColumn("d2", d2)
            .groupBy("vec_id", "m")
            .agg(
                F.min_by("cid", F.struct("d2", "cid")).alias("cid"),
                F.first("sub").alias("sub"),
            )
        )
        means = (
            assigned.select(
                "m", "cid", F.posexplode("sub").alias("pos", "x")
            )
            .groupBy("m", "cid", "pos")
            .agg(
                (
                    F.expr(
                        f"(sum(x) + count(*) * {_KMX_C})"
                        f" div count(*)"
                    )
                    - F.lit(_KMX_C)
                ).alias("mv")
            )
        )
        prev = cent.select(
            "m", "cid", F.posexplode("c").alias("pos", "pv")
        )
        cent = (
            prev.join(means, ["m", "cid", "pos"], "left")
            .select(
                "m",
                "cid",
                "pos",
                F.coalesce("mv", F.col("pv")).alias("mv"),
            )
            .groupBy("m", "cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "mv"))
                ).alias("pm")
            )
            .select(
                "m", "cid", F.transform("pm", lambda s: s["mv"]).alias("c")
            )
        )
    return cent


def _pqx_oracle(display: str = "int") -> str:
    """Unrolled integer-PQ oracle.  ``display="int"`` emits the raw
    micro² BIGINT ADC sum (the `sim_knn_pq_exact` fingerprint);
    ``display="float"`` emits the same sum scaled back to embedding
    units (``ROUND(sum/1e12, 6)``) for the promoted `sim_knn_pq` row —
    the ORDER BY stays on the exact integer sum in both forms."""
    c = _KMX_C
    ctes = [
        f"""
    ev AS MATERIALIZED (
        SELECT vec_id,
               (generate_subscripts(embedding, 1) - 1) // {_PQX_SUB}
                   AS m,
               (generate_subscripts(embedding, 1) - 1) % {_PQX_SUB}
                   AS i,
               CAST(ROUND(UNNEST(embedding) * 1e6) AS BIGINT) AS q
        FROM embeddings
    ),
    c0 AS (
        SELECT m, CAST(vec_id AS INTEGER) AS cid, i, q AS cq
        FROM ev WHERE vec_id < {_PQX_K}
    )"""
    ]
    last = 0
    for r in range(1, _PQX_ITERS + 1):
        ctes.append(f"""
    d{r} AS (
        SELECT ev.vec_id, ev.m, c.cid,
               SUM((ev.q - c.cq) * (ev.q - c.cq)) AS d2
        FROM ev JOIN c{r - 1} c ON c.m = ev.m AND c.i = ev.i
        GROUP BY 1, 2, 3
    ),
    a{r} AS (
        SELECT vec_id, m, cid FROM (
            SELECT vec_id, m, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                      ORDER BY d2, cid) AS rk
            FROM d{r}
        ) WHERE rk = 1
    ),
    mn{r} AS (
        SELECT a.m, a.cid, ev.i,
               CAST((SUM(ev.q) + COUNT(*) * {c}) // COUNT(*)
                    AS BIGINT) - {c} AS cq
        FROM a{r} a
        JOIN ev ON ev.vec_id = a.vec_id AND ev.m = a.m
        GROUP BY 1, 2, 3
    ),
    c{r} AS (
        SELECT p.m, p.cid, p.i, COALESCE(x.cq, p.cq) AS cq
        FROM c{r - 1} p LEFT JOIN mn{r} x
          ON x.m = p.m AND x.cid = p.cid AND x.i = p.i
    )""")
        last = r
    f = last + 1
    ctes.append(f"""
    df AS (
        SELECT ev.vec_id, ev.m, c.cid,
               SUM((ev.q - c.cq) * (ev.q - c.cq)) AS d2
        FROM ev JOIN c{last} c ON c.m = ev.m AND c.i = ev.i
        GROUP BY 1, 2, 3
    ),
    codes AS (
        SELECT vec_id, m, cid FROM (
            SELECT vec_id, m, cid,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                      ORDER BY d2, cid) AS rk
            FROM df
        ) WHERE rk = 1
    ),
    qtab AS (
        SELECT m, cid, d2 AS qd2 FROM df WHERE vec_id = 0
    )""")
    disp = (
        "CAST(SUM(q.qd2) AS BIGINT)"
        if display == "int"
        else "ROUND(CAST(SUM(q.qd2) AS DOUBLE) / 1e12, 6)"
    )
    return (
        "WITH " + ",".join(ctes)
        + f"""
    SELECT vec_id, {disp} AS adc_d2
    FROM codes
    JOIN qtab q USING (m, cid)
    WHERE vec_id <> 0
    GROUP BY vec_id
    ORDER BY SUM(q.qd2), vec_id LIMIT {_PQX_TOPK}
    """
    )


@query("sim_knn_pq_exact", oracle=_pqx_oracle)
def sim_knn_pq_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ENGINE-EXACT PRODUCT QUANTIZATION, end to end: subspace split
    (8x8 over 64 dims), per-subspace 16-codeword codebooks trained by
    the INTEGER Lloyd of `emb_kmeans_exact` (micro-quantized
    coordinates, integer argmin with code-id tie-break, shifted
    integer means, empty-code carry-forward), every vector encoded as
    8 integer codes, and the query (vec_id 0) answered by ASYMMETRIC
    DISTANCE COMPUTATION — a 128-row integer lookup table summed per
    candidate, top-10 by (adc_d2, vec_id).  The WHOLE pipeline —
    train, encode, search — replays as one unrolled DuckDB statement
    and hash-matches: the production ANN index (FAISS PQ shape) with
    a bit-reproducible contract, where the WEAK float `sim_knn_pq`
    row can only pin a NumPy twin.

    Scale shape identical to the float row: train/encode are offline
    write-path jobs (k-row broadcast per round); the query path reads
    only 8-byte codes + a broadcast ADC table — no float vector at
    query time.  Integer bounds: per-subspace d2 <= 8·(2e8)^2 ≈
    3.2e17, the 8-term ADC sum <= 2.6e18 < 2^63."""
    t = Tables(spark, sf_dir)
    emb = t.embeddings.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(ROUND(x * 1e6) AS BIGINT))"
        ).alias("v"),
    )
    subs = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice("v", m * _PQX_SUB + 1, _PQX_SUB).alias("sub"),
            )
            for m in range(_PQX_M)
        ]
    )
    subv = emb.select("vec_id", F.explode(subs).alias("s")).select(
        "vec_id", F.col("s.m").alias("m"), F.col("s.sub").alias("sub")
    )
    scored = pqx_scored(subv, pqx_lloyd(subv))
    codes = scored.groupBy("vec_id", "m").agg(
        F.min_by("cid", F.struct("d2", "cid")).alias("cid")
    )
    qtab = scored.filter(F.col("vec_id") == 0).select(
        "m", "cid", F.col("d2").alias("qd2")
    )
    return (
        codes.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qtab), ["m", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("qd2").cast("bigint").alias("adc_d2"))
        .orderBy("adc_d2", "vec_id")
        .limit(_PQX_TOPK)
    )


# ---------------------------------------------------------------------------
# text_dedup_cut — substring-dedup as a TRANSFORMATION (cut the spans)
# ---------------------------------------------------------------------------


@query(
    "text_dedup_cut",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    pos AS (
        SELECT doc_id, UNNEST(generate_series(1, len(l))) AS p,
               l[UNNEST(generate_series(1, len(l)))] AS tok
        FROM toks
    ),
    starts AS (
        SELECT t.doc_id, s.i,
               array_to_string(list_slice(t.l, s.i, s.i + {_DUPCOV_N - 1}),
                               ' ') AS gram
        FROM toks t,
             UNNEST(generate_series(1, len(t.l) - {_DUPCOV_N - 1}))
                 AS s(i)
    ),
    dup AS (
        SELECT gram FROM starts GROUP BY gram HAVING COUNT(*) >= 2
    ),
    covered AS (
        SELECT DISTINCT s.doc_id,
               UNNEST(generate_series(s.i, s.i + {_DUPCOV_N - 1})) AS p
        FROM starts s JOIN dup USING (gram)
    ),
    kept AS (
        SELECT pos.doc_id, pos.p, pos.tok
        FROM pos LEFT JOIN covered c
          ON c.doc_id = pos.doc_id AND c.p = pos.p
        WHERE c.p IS NULL
    ),
    cleaned AS (
        SELECT doc_id,
               COUNT(*) AS kept_tok,
               md5(COALESCE(string_agg(tok, ' ' ORDER BY p), ''))
                   AS content_hash
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(len(t.l) AS BIGINT) AS n_tok,
           CAST(COALESCE(c.kept_tok, 0) AS BIGINT) AS kept_tok,
           COALESCE(c.content_hash, md5('')) AS content_hash
    FROM toks t LEFT JOIN cleaned c USING (doc_id)
    """,
)
def text_dedup_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUBSTRING DEDUP AS A TRANSFORMATION — the action
    `text_dup_ngram_coverage` measures: EXCISE every token lying under
    a corpus-duplicated 8-token run and keep the remainder (Lee et
    al.'s substring cutting, the form of dedup that saves partial
    documents instead of dropping them).  Returns per doc the original
    and kept token counts plus the md5 of the CLEANED text — the
    content hash certifies both engines reconstruct the identical
    surviving string, order included.

    Shape: duplicated starts fan out to their n=8 covered positions
    (a LINEAR explode — never a position×start range join), distinct,
    anti-join against the token-position table, then an ordered
    re-join of survivors.  At 100 TB every stage is a hash
    shuffle on (doc, position) keys; the corpus-wide gram-count
    aggregation is shared verbatim with the coverage row."""
    from pyspark.sql import Window as W  # noqa: F401  (parallel shape)

    n = _DUPCOV_N
    t = Tables(spark, sf_dir)
    toks = t.documents.repartition(spark.sparkContext.defaultParallelism, "doc_id").select(
        "doc_id", F.split("text", " ").alias("l")
    )
    pos = toks.select(
        "doc_id", F.posexplode("l").alias("p0", "tok")
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "tok")
    starts = toks.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("l") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("l") - (n - 1)),
                    lambda i: F.struct(
                        i.alias("i"),
                        F.array_join(F.slice("l", i, n), " ").alias(
                            "gram"
                        ),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("s"),
    ).select("doc_id", F.col("s.i").alias("i"), F.col("s.gram").alias("gram"))
    dup = (
        starts.groupBy("gram")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= 2)
        .select("gram")
    )
    covered = (
        starts.join(dup, "gram", "left_semi")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + (n - 1))
            ).alias("p"),
        )
        .distinct()
    )
    kept = pos.join(covered, ["doc_id", "p"], "left_anti")
    cleaned = kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("kept_tok"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("p", "tok"))),
                    lambda s: s["tok"],
                ),
            )
        ).alias("content_hash"),
    )
    return (
        toks.select("doc_id", F.size("l").cast("bigint").alias("n_tok"))
        .join(cleaned, "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            F.coalesce("kept_tok", F.lit(0))
            .cast("bigint")
            .alias("kept_tok"),
            F.coalesce("content_hash", F.md5(F.lit(""))).alias(
                "content_hash"
            ),
        )
    )


# ---------------------------------------------------------------------------
# graph_clustering_coeff — local clustering coefficient
# ---------------------------------------------------------------------------


def _gcc_oracle() -> str:
    from .mining import CAPPED_BASE_SQL

    return f"""
    WITH b AS ({CAPPED_BASE_SQL}),
    e AS MATERIALIZED (
        SELECT a.user_id u, c.user_id v
        FROM b a JOIN b c
          ON a.dy = c.dy AND a.user_id < c.user_id
         AND ABS(a.v - c.v) <= 1.0
        GROUP BY 1, 2 HAVING COUNT(*) >= 3
    ),
    tri AS (
        SELECT t.node, COUNT(*) AS n_tri FROM (
            SELECT e1.u AS node FROM e e1
            JOIN e e2 ON e2.u = e1.v
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
            UNION ALL
            SELECT e1.v FROM e e1
            JOIN e e2 ON e2.u = e1.v
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
            UNION ALL
            SELECT e2.v FROM e e1
            JOIN e e2 ON e2.u = e1.v
            JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        ) t GROUP BY t.node
    ),
    deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT u AS node FROM e UNION ALL SELECT v FROM e
        ) GROUP BY node
    )
    SELECT d.node AS user_id,
           CAST(d.d AS BIGINT) AS degree,
           CAST(COALESCE(t.n_tri, 0) AS BIGINT) AS n_triangles,
           ROUND(COALESCE(t.n_tri, 0) * 2.0 / (d.d * (d.d - 1)), 6)
               AS clustering
    FROM deg d LEFT JOIN tri t ON t.node = d.node
    WHERE d.d >= 2
    """


@query("graph_clustering_coeff", oracle=_gcc_oracle)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCAL CLUSTERING COEFFICIENT — the standard graph metric the
    triangle kernel exists to feed: per node, 2·triangles /
    (deg·(deg−1)) over the co-movement graph (how clique-like is each
    user's neighborhood — the flock-cohesion score).  Completes the
    metric set around `graph_triangles` (numerator), degree
    (denominator) and `graph_assortativity`/`graph_modularity`
    (global structure).

    Exactness: triangle counts and degrees are integers; the
    coefficient is one final float expression with identical operation
    order (ROUND 6; value in [0,1], no sign-crossing hazard).  Nodes
    with degree < 2 are excluded (undefined denominator) — mirrored in
    the oracle.

    Scale shape: the oriented two-join triangle enumeration (each
    triangle once, fan-out per key = oriented out-degree) + one degree
    aggregate + one join — the `graph_triangles` cost plus two cheap
    hash ops.  The edge input is the CAPPED co-movement variant
    (``mining.comovement_edges_capped``): in any one (day, eps-cell)
    bucket only the 64 lowest user_ids participate, so per-node degree
    — and with it the wedge fan-out Σdeg² that is this query's true
    cost — is bounded by construction in the dense-city regime where
    the uncapped graph degenerates to per-cell cliques (the 20x clone
    grew edges 403x and shuffle-spilled the box).  Result-changing cap,
    mirrored exactly in the oracle's ROW_NUMBER predicate."""
    from .mining import comovement_edges_capped

    e = comovement_edges_capped(spark, sf_dir)
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    tnodes = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    return (
        deg.filter(F.col("d") >= 2)
        .join(tnodes, "node", "left")
        .select(
            F.col("node").alias("user_id"),
            F.col("d").cast("bigint").alias("degree"),
            F.coalesce("n_tri", F.lit(0))
            .cast("bigint")
            .alias("n_triangles"),
            F.round(
                F.coalesce("n_tri", F.lit(0))
                * 2.0
                / (F.col("d") * (F.col("d") - 1)),
                6,
            ).alias("clustering"),
        )
    )


# ---------------------------------------------------------------------------
# emb_cov_topk — exact integer covariance structure of the embedding space
# ---------------------------------------------------------------------------

_COV_TOPK = 20


@query(
    "emb_cov_topk",
    oracle=f"""
    WITH ev AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS i,
               CAST(ROUND(UNNEST(embedding) * 1e6) AS BIGINT) AS q
        FROM embeddings
    ),
    n AS (SELECT COUNT(*) AS n FROM embeddings),
    sums AS (SELECT i, SUM(q) AS s FROM ev GROUP BY i),
    prods AS (
        SELECT a.i AS i, b.i AS j, SUM(a.q * b.q) AS sp
        FROM ev a JOIN ev b
          ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY 1, 2
    ),
    cov AS (
        SELECT p.i, p.j,
               CAST((SELECT n FROM n) AS DECIMAL(38, 0))
                   * CAST(p.sp AS DECIMAL(38, 0))
                   - CAST(sa.s AS DECIMAL(38, 0))
                     * CAST(sb.s AS DECIMAL(38, 0)) AS num
        FROM prods p
        JOIN sums sa ON sa.i = p.i
        JOIN sums sb ON sb.i = p.j
    )
    SELECT i, j,
           ROUND(CAST(num AS DOUBLE)
                 / ((SELECT n FROM n) * CAST((SELECT n FROM n)
                                             AS DOUBLE)) / 1e12,
                 6) + 0.0 AS cov
    FROM cov
    ORDER BY ABS(num) DESC, i, j LIMIT {_COV_TOPK}
    """,
)
def emb_cov_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT COVARIANCE STRUCTURE of the embedding space: the top-20
    dimension pairs by |covariance| — the integer-exact sufficient
    statistics PCA consumes (the WEAK float `emb_pca` row's power
    iteration cannot be made engine-exact because eigenvector
    normalization needs sqrt; the covariance MATRIX can, and this row
    proves it).  cov(i,j) = (n·Σqᵢqⱼ − Σqᵢ·Σqⱼ) / n²: every term is
    BIGINT over micro-quantized coordinates, so the RANKING — which
    pairs dominate the spectrum — is an integer decision with an (i,j)
    tie-break; the displayed value is one final float expression
    (`+ 0.0` sign guard: covariances cross zero).

    Scale shape: one (vec, dim-pair) self-join restricted to i <= j
    within the same vector — per-vector fan-out d(d+1)/2 = 2080,
    corpus-linear, map-side combinable; no centering pass (the
    two-pass mean-subtracted form is folded into the closed formula,
    the standard one-pass trick); per-dimension sums/products stay
    BIGINT, but the closing n·Σqq − Σq·Σq products are DECIMAL(38,0)
    on BOTH engines — at 20x-clone corpus sizes they pass int64, and
    Spark would wrap silently where DuckDB errors."""
    t = Tables(spark, sf_dir)
    ev = t.embeddings.select(
        "vec_id",
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " x -> CAST(ROUND(x * 1e6) AS BIGINT))"
            )
        ).alias("i", "q"),
    )
    n = t.embeddings.count()
    sums = ev.groupBy("i").agg(F.sum("q").alias("s"))
    a = ev.select("vec_id", F.col("i").alias("ia"), F.col("q").alias("qa"))
    b = ev.select("vec_id", F.col("i").alias("jb"), F.col("q").alias("qb"))
    prods = (
        a.join(b, "vec_id")
        .filter(F.col("ia") <= F.col("jb"))
        .groupBy(F.col("ia").alias("i"), F.col("jb").alias("j"))
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("sp"))
    )
    sa = sums.select(F.col("i"), F.col("s").alias("si"))
    sb = sums.select(F.col("i").alias("j"), F.col("s").alias("sj"))
    cov = (
        prods.join(F.broadcast(sa), "i")
        .join(F.broadcast(sb), "j")
        .select(
            "i",
            "j",
            (
                F.lit(n).cast("decimal(38,0)")
                * F.col("sp").cast("decimal(38,0)")
                - F.col("si").cast("decimal(38,0)")
                * F.col("sj").cast("decimal(38,0)")
            ).alias("num"),
        )
    )
    return (
        cov.orderBy(F.abs("num").desc(), "i", "j")
        .limit(_COV_TOPK)
        .select(
            "i",
            "j",
            (
                F.round(
                    F.col("num").cast("double")
                    / (float(n) * float(n))
                    / 1e12,
                    6,
                )
                + 0.0
            ).alias("cov"),
        )
    )


# ---------------------------------------------------------------------------
# emb_cosine_hist — pairwise-cosine histogram (embedding-geometry QA)
# ---------------------------------------------------------------------------

# 10 bins over cos in [-1, 1]; thresholds t_k = (k-5)/5, k = 0..9.
# cos >= p/5  is decided WITHOUT the sqrt in cosine's denominator by a
# sign-aware squared comparison (square preserves order only on matching
# signs), so bin membership is an exact integer/DECIMAL decision on
# both engines — no float boundary anywhere.
_COSH_BINS = 10


def _cos_ge(p: int) -> str:
    """SQL boolean: cos >= p/5 over columns dot (BIGINT), d2 = dot^2
    and nn = na2*nb2 (both DECIMAL(38,0))."""
    p2 = p * p
    if p >= 0:
        return f"(dot >= 0 AND 25 * d2 >= {p2} * nn)"
    return f"(dot >= 0 OR 25 * d2 <= {p2} * nn)"


_COSH_BIN_EXPR = (
    "CAST("
    + " + ".join(
        f"(CASE WHEN {_cos_ge(k - 5)} THEN 1 ELSE 0 END)"
        for k in range(_COSH_BINS)
    )
    + " - 1 AS INTEGER)"
)


@query(
    "emb_cosine_hist",
    oracle=f"""
    WITH qv AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> ROUND(CAST(x AS DOUBLE) * 1e6))
                   AS q
        FROM embeddings
    ),
    nrm AS (
        SELECT vec_id, q,
               CAST(list_dot_product(q, q) AS BIGINT) AS n2
        FROM qv
    ),
    srate AS (
        SELECT GREATEST(1, (COUNT(*) * (COUNT(*) - 1) // 2)
                           // 2000000) AS s
        FROM nrm WHERE n2 > 0
    ),
    rrate AS (
        -- exact ceil-isqrt(s): float sqrt candidate corrected by +-1
        -- with integer comparisons (engine round-vs-trunc safe)
        SELECT CASE WHEN (c - 1) * (c - 1) >= s THEN c - 1
                    WHEN c * c >= s THEN c
                    ELSE c + 1 END AS r
        FROM (SELECT CAST(s AS BIGINT) AS s,
                     CAST(SQRT(CAST(s AS DOUBLE)) AS BIGINT) AS c
              FROM srate)
    ),
    samp AS (
        SELECT vec_id, q, n2
        FROM nrm
        WHERE n2 > 0
          AND CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
                                   1, 6)) AS INTEGER)
              % CAST((SELECT r FROM rrate) AS INTEGER) = 0
    ),
    pairs AS (
        SELECT CAST(list_dot_product(a.q, b.q) AS BIGINT) AS dot,
               CAST(a.n2 AS DECIMAL(38, 0))
                   * CAST(b.n2 AS DECIMAL(38, 0)) AS nn
        FROM samp a JOIN samp b ON a.vec_id < b.vec_id
    ),
    binned AS (
        SELECT {_COSH_BIN_EXPR} AS bin
        FROM (SELECT dot,
                     CAST(dot AS DECIMAL(38, 0))
                         * CAST(dot AS DECIMAL(38, 0)) AS d2,
                     nn
              FROM pairs)
    )
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM binned GROUP BY bin
    """,
)
def emb_cosine_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PAIRWISE-COSINE HISTOGRAM over the whole corpus — the
    embedding-geometry QA report (anisotropy / collapse detection: a
    healthy embedding space puts random-pair cosine mass near 0; a
    collapsed one piles into the top bins — the first diagnostic run
    on a new encoder before any ANN index is built).  All ~N²/2 pairs
    binned into 10 cosine buckets of width 0.2.

    Exactness: micro-quantized coordinates make every dot product and
    norm an exact integer (sums <= 2.6e14, exact even through the
    oracle's double-typed `list_dot_product`); `cos >= p/5` is decided
    by sign-aware SQUARED cross-multiplication in DECIMAL(38,0) — the
    sqrt in cosine's denominator never materializes, so bin edges are
    bit-exact on both engines.

    Scale shape: above ~2M true pairs a DETERMINISTIC md5
    VERTEX-sample engages — keep vectors with md5(vec_id) % R == 0,
    R = ceil_isqrt(S), S = pairs div 2M — then enumerate ALL pairs
    among survivors.  Pair volume drops by R^2 ~= S, and BOTH the
    enumeration and the broadcast side are bounded by construction
    at every scale: survivors ~= n/R ~= sqrt(4M) ~= 2-3k vectors, so
    the broadcast is a few MB and the nested loop ~4M pairs whether
    the corpus is 10k or 10^9 vectors.  (A bucket-PAIR block-sample
    was considered and rejected: with a fixed K x K grid the sampled
    block count K(K+1)/2/S hits zero once S exceeds the block count,
    i.e. it stops working exactly when sampling matters most.
    Vertex sampling has no such cliff.)  Result-changing dispatch,
    mirrored in the oracle via an identical md5 % R predicate and an
    exact SQL ceil-isqrt; R = 1 (all pairs, byte-identical to the
    unsampled histogram) at every shipped fixture scale — the 20x
    clone probe crosses into the sampled branch."""
    t = Tables(spark, sf_dir)
    qv = t.embeddings.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(ROUND(x * 1e6) AS BIGINT))"
        ).alias("q"),
    )
    dot_qq = F.aggregate(
        F.zip_with("q", "q", lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    nrm = qv.select("vec_id", "q", dot_qq.alias("n2")).filter(
        F.col("n2") > 0
    )
    # sampling DISPATCH (mirrored in the oracle): above ~2M true pairs
    # keep only vectors with md5(vec_id) % R == 0, R = ceil_isqrt(S),
    # S = pairs div 2M — survivors ~n/R, so the all-pairs enumeration
    # below shrinks by R^2 ~= S and its broadcast side is bounded
    # (~2-3k vectors) at every corpus size.  R = 1 (no-op filter
    # skipped entirely) at every shipped fixture scale.
    n_live = nrm.count()
    samp = max(1, (n_live * (n_live - 1) // 2) // 2_000_000)
    rr = 1 if samp == 1 else math.isqrt(samp - 1) + 1
    if rr > 1:
        nrm = nrm.filter(
            F.expr(
                "CAST(conv(substring(md5(CAST(vec_id AS STRING)),"
                f" 1, 6), 16, 10) AS INT) % {rr} = 0"
            )
        )
    # fan the streamed side out to full parallelism — the (possibly
    # sampled) projection of a single-file fixture otherwise carries
    # its 1-3 input splits through the broadcast nested loop
    a = nrm.repartition(spark.sparkContext.defaultParallelism).select(
        F.col("vec_id").alias("ida"),
        F.col("q").alias("qa"),
        F.col("n2").alias("na2"),
    )
    b = nrm.select(
        F.col("vec_id").alias("idb"),
        F.col("q").alias("qb"),
        F.col("n2").alias("nb2"),
    )
    dot_ab = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("ida") < F.col("idb"))
        .select(
            dot_ab.alias("dot"),
            (
                F.col("na2").cast("decimal(38,0)")
                * F.col("nb2").cast("decimal(38,0)")
            ).alias("nn"),
        )
        .select(
            "dot",
            (
                F.col("dot").cast("decimal(38,0)")
                * F.col("dot").cast("decimal(38,0)")
            ).alias("d2"),
            "nn",
        )
    )
    return (
        pairs.select(F.expr(_COSH_BIN_EXPR).alias("bin"))
        .groupBy("bin")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# pipe_leakage_safe_split — cluster-aware train/val/test assignment
# ---------------------------------------------------------------------------

_LSS_SALT = "split0"


def _lss_oracle() -> str:
    from ..registry import _LAZY_ORACLES, ORACLES
    from . import text  # noqa: F401  (register text_dedup_cluster)

    cl = (
        ORACLES["text_dedup_cluster"]
        if "text_dedup_cluster" in ORACLES
        else _LAZY_ORACLES["text_dedup_cluster"]()
    )
    # the cluster oracle starts WITH RECURSIVE; splice its CTE list
    body = cl.strip()
    assert body.upper().startswith("WITH RECURSIVE")
    inner = body[len("WITH RECURSIVE") :]
    # wrap: clusters AS MATERIALIZED (<cluster select>) over shared CTEs
    i = inner.rfind("SELECT lab.doc_id")
    ctes, sel = inner[:i].rstrip(), inner[i:]
    return f"""
    WITH RECURSIVE {ctes},
    clusters AS MATERIALIZED ({sel}),
    hashed AS (
        SELECT doc_id, cluster_id, cluster_size,
               CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)
                                        || '#{_LSS_SALT}'), 1, 6))
                    AS INTEGER) % 10 AS h
        FROM clusters
    )
    SELECT doc_id, cluster_id,
           CASE WHEN h < 8 THEN 'train'
                WHEN h = 8 THEN 'val' ELSE 'test' END AS split
    FROM hashed
    """


@query("pipe_leakage_safe_split", oracle=_lss_oracle)
def pipe_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE TRAIN/VAL/TEST SPLIT — the eval-hygiene rule
    `pipe_train_split` cannot enforce: hashing DOC ids sprays near-
    duplicate documents across splits, silently leaking test content
    into training (the evaluation-contamination failure mode
    `text_contamination` measures after the fact).  This row prevents
    it BY CONSTRUCTION: documents are grouped by their dedup CLUSTER
    (the registered `text_dedup_cluster` connected components), and
    the 80/10/10 assignment hashes the CLUSTER id — every near-dup
    clique lands in exactly one split, provably (same cluster -> same
    hash -> same split).

    Composed from the registered builder and its registered recursive-
    CTE oracle (the `sim_ann_recall` discipline: what is verified is
    what ships).  The md5-of-cluster-id split is deterministic,
    engine-exact, and re-runnable; changing the salt re-deals.

    Scale shape: cost = the dedup clustering itself + one md5
    projection; the split adds NO shuffle (hash is per-row on the
    cluster label already attached to each doc)."""
    from ..registry import QUERIES

    labels = QUERIES["text_dedup_cluster"](spark, sf_dir)
    h = F.expr(
        f"CAST(conv(substring(md5(concat(CAST(cluster_id AS STRING),"
        f" '#{_LSS_SALT}')), 1, 6), 16, 10) AS INT) % 10"
    )
    return labels.select(
        "doc_id",
        "cluster_id",
        F.when(h < 8, "train")
        .when(h == 8, "val")
        .otherwise("test")
        .alias("split"),
    )
