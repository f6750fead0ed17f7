"""Graph + interval operators over the engine's derived entities.

- ``rel_join_interval_overlap`` — the missing member of the range-join
  family (as-of and theta-band live in ``joins.py``): which users'
  activity SESSIONS overlapped in time. Interval joins are the classic
  quadratic trap; here each session is matched through the DAY of the
  overlap's start instant — a session pair overlaps on exactly one
  such day, so the equi-join on (day) is both lossless and dup-free,
  and per-key fan-out is sessions-active-that-day (the same
  bucket-bounds-the-blowup argument as the eps-grid joins).
- ``graph_pagerank`` — PageRank over the customer⋈supplier trade graph
  in FIXED-POINT integer arithmetic: every rank is an integer count of
  1e-12 units, contributions use exact integer division (``DIV``), and
  integer sums are order-independent — which turns the canonically
  float-and-iteration-order-sensitive algorithm into one with a FULL
  bit-exact DuckDB oracle (same trick as the DECIMAL aggregates,
  pushed all the way into an iterative algorithm). Three Jacobi
  iterations, undirected edges, damping 0.85.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables

_FP_ONE = 10**12  # fixed-point unit: 1.0 rank == 1e12
_PR_ITERS = 3
_PR_TOPK = 20


@query(
    "rel_join_interval_overlap",
    oracle="""
    WITH p AS (
        SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               CASE WHEN LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                         IS NULL
                    OR epoch_us(CAST(ts AS TIMESTAMP))
                       - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                       >= 1800000000
                    THEN 1 ELSE 0 END AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
        SELECT user_id,
               CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us)
                    AS BIGINT) AS sess, us
        FROM p
    ),
    iv AS (
        SELECT user_id, sess, MIN(us) AS s_us, MAX(us) AS e_us
        FROM s GROUP BY 1, 2
    )
    SELECT a.user_id AS user_a, a.sess AS sess_a,
           b.user_id AS user_b, b.sess AS sess_b,
           LEAST(a.e_us, b.e_us) - GREATEST(a.s_us, b.s_us)
               AS overlap_us
    FROM iv a JOIN iv b
      ON a.user_id < b.user_id
     AND a.s_us <= b.e_us AND b.s_us <= a.e_us
    """,
)
def rel_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: pairs of DIFFERENT users whose 30-min-gap
    activity sessions overlapped in wall-clock time, with the overlap
    length.

    The engine side does NOT run the naive O(S^2) theta join: each
    session interval is exploded to the HOURS it covers, the pair join
    is an EQUI-join on the hour, and the predicate `hour ==
    floor(max(s_a, s_b) / hour)` keeps exactly the hour the overlap
    starts — so a pair spanning shared hours emits once, no DISTINCT
    needed. Bucket granularity trades explosion factor (intervals per
    bucket-length) against per-key fan-out^2; sessions here are
    minutes long, so hourly buckets cost ~1 replica per session while
    cutting the quadratic term ~24^2 vs daily. The oracle states the
    declarative O(S^2) truth; the engine plan is the bucketed one
    (plan test pins the equi-key)."""
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wc = W.partitionBy("user_id").orderBy("us")
    p = (
        t.events.select("user_id", "event_id", "ts")
        .withColumn("us", F.unix_micros("ts"))
        .withColumn("prev", F.lag("us").over(w))
        .withColumn(
            "brk",
            F.when(
                F.col("prev").isNull()
                | (F.col("us") - F.col("prev") >= 1_800_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn("sess", F.sum("brk").over(wc))
    )
    iv = p.groupBy("user_id", "sess").agg(
        F.min("us").alias("s_us"), F.max("us").alias("e_us")
    )
    hour = lambda c: F.floor(c / F.lit(3600e6))  # noqa: E731
    blocked = iv.withColumn(
        "dy", F.explode(F.sequence(hour(F.col("s_us")), hour(F.col("e_us"))))
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    overlap_start = F.greatest(F.col("a.s_us"), F.col("b.s_us"))
    return (
        a.join(
            b,
            (F.col("a.dy") == F.col("b.dy"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.s_us") <= F.col("b.e_us"))
            & (F.col("b.s_us") <= F.col("a.e_us")),
        )
        .filter(F.col("a.dy") == hour(overlap_start))
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("a.sess").alias("sess_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("b.sess").alias("sess_b"),
            (
                F.least(F.col("a.e_us"), F.col("b.e_us")) - overlap_start
            ).alias("overlap_us"),
        )
    )


_PAGERANK_ORACLE = f"""
    WITH e0 AS (
        SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                        's' || CAST(l.l_suppkey AS VARCHAR) AS dst
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    edges AS (
        SELECT src, dst FROM e0
        UNION ALL
        SELECT dst AS src, src AS dst FROM e0
    ),
    deg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM deg),
    r0 AS (SELECT node, d, {_FP_ONE} // (SELECT n FROM n) AS r FROM deg),
    r1 AS (
        SELECT deg.node, deg.d,
               (15 * {_FP_ONE}) // (100 * (SELECT n FROM n))
               + (85 * COALESCE(SUM(r0.r // r0.d), 0)) // 100 AS r
        FROM deg
        LEFT JOIN edges ON edges.dst = deg.node
        LEFT JOIN r0 ON r0.node = edges.src
        GROUP BY deg.node, deg.d
    ),
    r2 AS (
        SELECT deg.node, deg.d,
               (15 * {_FP_ONE}) // (100 * (SELECT n FROM n))
               + (85 * COALESCE(SUM(r1.r // r1.d), 0)) // 100 AS r
        FROM deg
        LEFT JOIN edges ON edges.dst = deg.node
        LEFT JOIN r1 ON r1.node = edges.src
        GROUP BY deg.node, deg.d
    ),
    r3 AS (
        SELECT deg.node, deg.d,
               (15 * {_FP_ONE}) // (100 * (SELECT n FROM n))
               + (85 * COALESCE(SUM(r2.r // r2.d), 0)) // 100 AS r
        FROM deg
        LEFT JOIN edges ON edges.dst = deg.node
        LEFT JOIN r2 ON r2.node = edges.src
        GROUP BY deg.node, deg.d
    )
    SELECT node, CAST(r AS BIGINT) AS rank_fp
    FROM r3 ORDER BY r DESC, node LIMIT {_PR_TOPK}
"""


@query("graph_pagerank", oracle=_PAGERANK_ORACLE)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 Jacobi iterations) over the undirected
    customer-supplier trade graph (an edge per distinct trading pair
    from lineitem⋈orders), in fixed-point integer arithmetic: ranks are
    integers counting 1e-12 units, per-edge contributions use exact
    integer division, so every engine — and every PARTITIONING — gets
    the identical bits. The float formulation would be
    accumulation-order-sensitive and only approximately checkable;
    fixed-point makes an iterative graph algorithm FULL-oracle-able.

    Scale shape per iteration: one equi-join of the rank table to the
    edge list on src (edges pre-partitioned by the join key would make
    this co-located; here AQE handles it) + one hash aggregate on dst.
    Dangling nodes don't exist (the undirected edge set gives every
    node degree >= 1). Top-20 via TakeOrderedAndProject."""
    t = Tables(spark, sf_dir)
    li, orders = t.lineitem, t.orders
    # Numeric node ids end-to-end (suppliers offset into their own id
    # space); the display ids ('c<k>' / 's<k>') are built only for the
    # final 20 rows. Dedup happens on the compact numeric pair BEFORE
    # any string exists, and the orders side is a 2-column broadcast.
    _SUPP = 1_000_000_000
    e0 = (
        li.select("l_orderkey", "l_suppkey")
        .join(
            F.broadcast(orders.select("o_orderkey", "o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP).alias("dst"),
        )
        .distinct()
    )
    # Materialize the (small) edge list once: the Jacobi loop references
    # it every iteration, and a lazy plan would re-derive the
    # lineitem⋈orders distinct per reference — the same
    # lineage-truncation move as text_dedup_cluster's CC loop.
    edges = e0.unionAll(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    # iteration economics (the connected_components argument): each
    # Jacobi round pays per-shuffle-partition scheduling cost whatever
    # the data volume, so the loop's width tracks the EDGE count, not
    # the session's scan width — 2 stages x 3 rounds x 32 near-empty
    # tasks was pure overhead at fixture scale
    n_edges = edges.count()  # edges are materialized; this is free
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    parts = max(1, min(width, n_edges // 2_000_000 + 1))
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        deg = (
            edges.groupBy(F.col("src").alias("node"))
            .agg(F.count("*").alias("d"))
            .localCheckpoint()  # referenced every Jacobi round
        )
        # |V| as one driver scalar (deg is materialized; this is a
        # metadata-cheap count) — it parameterizes BOTH the rank
        # arithmetic (as a constant-folded literal, replacing two
        # broadcast joins of the 1-row n table per round) and the
        # broadcast-vs-shuffle dispatch below.
        n_nodes = deg.count()
        base = F.lit((15 * _FP_ONE) // (100 * n_nodes)).cast("bigint")
        # COST-BASED DISPATCH (the trajectory.py:1072 pattern): an
        # explicit broadcast HINT never demotes, so at hundreds of
        # millions of nodes it would OOM the executors where a shuffle
        # join survives. Broadcast the rank table only while |V| is
        # bounded; above the threshold leave the join unhinted — the
        # src-keyed shuffle join co-locates ranks with edges (and AQE
        # may still locally convert where stats allow). Both branches
        # produce identical fixed-point bits (partition-invariant
        # integer arithmetic); both plans pinned in tests/test_plans.py.
        bcast_max = int(
            os.environ.get("SPARK_GRAFT_PR_BCAST_MAX_NODES", "10000000")
        )
        hint = F.broadcast if n_nodes <= bcast_max else (lambda df: df)
        r = deg.select(
            "node",
            "d",
            F.lit(_FP_ONE // n_nodes).cast("bigint").alias("r"),
        )
        for _ in range(_PR_ITERS):
            # rank table is |nodes| rows (tiny vs edges): broadcast (in
            # the dispatched regime) streams the edge list ONCE map-side
            # with no edge shuffle — |V| << |E| join-side asymmetry;
            # partial aggregation combines inflow per dst before the
            # single |V|-sized exchange.
            contrib = (
                edges.join(
                    hint(
                        r.select(
                            F.col("node").alias("src"),
                            F.expr("r DIV d").alias("c"),
                        )
                    ),
                    "src",
                )
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum("c").alias("inflow"))
            )
            r = (
                deg.join(contrib, "node", "left")
                .select(
                    "node",
                    "d",
                    (
                        base
                        + F.expr("(85 * COALESCE(inflow, 0)) DIV 100")
                    ).alias("r"),
                )
                # truncate lineage per iteration: keeps each Jacobi step ONE
                # join + one agg instead of an exponentially re-expanded tree
                .localCheckpoint()
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    label = F.when(
        F.col("node") < _SUPP,
        F.concat(F.lit("c"), F.col("node").cast("string")),
    ).otherwise(
        F.concat(F.lit("s"), (F.col("node") - _SUPP).cast("string"))
    )
    return (
        r.select(label.alias("node"), F.col("r").alias("rank_fp"))
        .orderBy(F.desc("rank_fp"), "node")
        .limit(_PR_TOPK)
    )


@query(
    "rel_join_asof_nearest",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
    s AS (SELECT * FROM events WHERE event_type = 'signup'),
    back AS (
        SELECT p.event_id, p.user_id,
               epoch_us(CAST(p.ts AS TIMESTAMP)) AS purchase_us,
               epoch_us(CAST(s.ts AS TIMESTAMP)) AS prev_us
        FROM p ASOF LEFT JOIN s
          ON p.user_id = s.user_id AND p.ts >= s.ts
    ),
    fwd AS (
        SELECT p.event_id,
               epoch_us(CAST(s.ts AS TIMESTAMP)) AS next_us
        FROM p ASOF LEFT JOIN s
          ON p.user_id = s.user_id AND p.ts <= s.ts
    )
    SELECT back.event_id, back.user_id, back.purchase_us,
           CASE
             WHEN prev_us IS NULL THEN next_us
             WHEN next_us IS NULL THEN prev_us
             WHEN purchase_us - prev_us <= next_us - purchase_us
               THEN prev_us
             ELSE next_us
           END AS signup_us
    FROM back JOIN fwd USING (event_id)
    """,
)
def rel_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join: each purchase matched to the signup closest
    in time in EITHER direction (ties -> the earlier/backward signup) —
    the kdb `aj`-nearest variant that backward-only as-of cannot
    express.

    Same single-shuffle analytic rewrite as ``rel_join_asof``, run in
    both directions over one ordered union: `last(signup ts)
    ignoreNulls` up to the row and `first(signup ts) ignoreNulls` from
    the row on, then a scalar CASE picks the nearer. The oracle is TWO
    native DuckDB ASOF joins (backward and forward) + the same CASE —
    proving the one-pass rewrite equals the textbook two-join
    formulation."""
    t = Tables(spark, sf_dir)
    ev = t.events.filter(F.col("event_type").isin("purchase", "signup"))
    base = W.partitionBy("user_id")
    wb = base.orderBy("ts", F.col("event_type").desc()).rowsBetween(
        W.unboundedPreceding, 0
    )
    wf = base.orderBy("ts", F.col("event_type").asc()).rowsBetween(
        0, W.unboundedFollowing
    )
    sig = F.when(F.col("event_type") == "signup", F.unix_micros("ts"))
    out = (
        ev.withColumn("prev_us", F.last(sig, ignorenulls=True).over(wb))
        .withColumn("next_us", F.first(sig, ignorenulls=True).over(wf))
        .filter(F.col("event_type") == "purchase")
        .withColumn("purchase_us", F.unix_micros("ts"))
    )
    nearest = (
        F.when(F.col("prev_us").isNull(), F.col("next_us"))
        .when(F.col("next_us").isNull(), F.col("prev_us"))
        .when(
            F.col("purchase_us") - F.col("prev_us")
            <= F.col("next_us") - F.col("purchase_us"),
            F.col("prev_us"),
        )
        .otherwise(F.col("next_us"))
    )
    return out.select(
        "event_id", "user_id", "purchase_us", nearest.alias("signup_us")
    )


@query(
    "traj_heatmap_density",
    oracle="""
    WITH t0 AS (
        SELECT MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t0 FROM events
    ),
    cells AS (
        SELECT CAST(FLOOR((epoch_us(CAST(ts AS TIMESTAMP))
                           - (SELECT t0 FROM t0)) / 86400e6)
                    AS BIGINT) AS cx,
               CAST(FLOOR(value / 10.0) AS BIGINT) AS cy,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    sm AS (
        SELECT c.cx + dx.d AS cx, c.cy + dy.d AS cy, c.n
        FROM cells c,
             (SELECT UNNEST([-1, 0, 1]) AS d) dx,
             (SELECT UNNEST([-1, 0, 1]) AS d) dy
    )
    SELECT sm.cx, sm.cy,
           CAST(SUM(sm.n) AS BIGINT) AS smoothed,
           CAST(COALESCE(MAX(cells.n), 0) AS BIGINT) AS n
    FROM sm LEFT JOIN cells ON sm.cx = cells.cx AND sm.cy = cells.cy
    GROUP BY sm.cx, sm.cy
    """,
)
def traj_heatmap_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density heatmap with 3x3 box smoothing over the (day, value/10)
    grid — the raster aggregation every trajectory dashboard draws, and
    the additive-kernel pattern for density-based spatial analysis.

    Scatter-gather without a neighbor join: each occupied cell SCATTERS
    its count to its 9 neighbors via a tiny explode (a 9-element
    literal array), and one hash aggregate gathers the smoothed sum —
    cells-x-9 intermediate rows, where cells is already the aggregated
    (small) grid, never the raw events. The raw cell count rides along
    via a left join back to the occupied-cell table (broadcast-sized).
    Identical integer arithmetic everywhere; no float smoothing
    weights."""
    t = Tables(spark, sf_dir)
    t0 = t.events.agg(F.min(F.unix_micros("ts")).alias("t0"))
    cells = (
        t.events.join(F.broadcast(t0))
        .groupBy(
            F.floor((F.unix_micros("ts") - F.col("t0")) / 86400e6).alias(
                "cx"
            ),
            F.floor(F.col("value") / 10.0).alias("cy"),
        )
        .agg(F.count("*").alias("n"))
    )
    offsets = F.expr(
        "explode(array(-1,0,1))"
    )
    sm = (
        cells.select("cx", "cy", "n", offsets.alias("dx"))
        .select("cx", "cy", "n", "dx", F.expr("explode(array(-1,0,1))").alias("dy"))
        .select(
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
            "n",
        )
    )
    smoothed = sm.groupBy("cx", "cy").agg(F.sum("n").alias("smoothed"))
    return (
        smoothed.join(
            cells.select("cx", "cy", F.col("n")), ["cx", "cy"], "left"
        )
        .select(
            "cx",
            "cy",
            "smoothed",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        )
    )


@query(
    "graph_triangles",
    oracle="""
    WITH b AS (
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
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1
        JOIN e e2 ON e2.u = e1.v
        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    nodes AS (
        SELECT a AS user_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM nodes GROUP BY user_id
    """,
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TRIANGLE counts over the co-movement graph — the
    classic distributed graph-mining kernel (clustering-coefficient
    numerator), composed from the SAME registered ``traj_comovement``
    builder (and its oracle SQL) that produces the edges: a triangle of
    co-moving users is a 3-flock candidate.

    The standard two-join counting shape with the u < v edge
    orientation doing the dedup work: each triangle {a<b<c} is
    enumerated exactly once as (a,b) ⋈ (b,c) ⋈ (a,c) — no
    symmetrization, no division by 6. Both joins key on single edge
    endpoints, so fan-out per key is that node's out-degree in the
    ORIENTED graph (bounded by the banded co-movement join that built
    the edges), never all-pairs. Edges are materialized once
    (localCheckpoint — no cache to leak) and read three times."""
    from .mining import comovement_edges

    e = comovement_edges(spark, sf_dir)
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    nodes = (
        tri.select(F.col("a").alias("user_id"))
        .unionAll(tri.select(F.col("b").alias("user_id")))
        .unionAll(tri.select(F.col("c").alias("user_id")))
    )
    out = nodes.groupBy("user_id").agg(F.count("*").alias("n_triangles"))
    return out


_KCORE_K = 3
_KCORE_ROUNDS = 5  # fixed peel depth; fixture convergence pinned in pytest


def _kcore_oracle() -> str:
    """Chained-CTE oracle: _KCORE_ROUNDS degree-filter/edge-restrict
    peels over the co-movement graph. A FIXED unrolling (recursive CTEs
    cannot re-aggregate degrees per round); the engine runs the same
    fixed depth, and tests/test_mining.py asserts the peel has reached
    its fixpoint by then at fixture scale."""
    ctes = [
        """
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
    und0 AS (SELECT u AS s, v AS t FROM e
             UNION ALL SELECT v, u FROM e)"""
    ]
    for i in range(_KCORE_ROUNDS):
        ctes.append(f"""
    a{i} AS (SELECT s FROM und{i} GROUP BY s
             HAVING COUNT(*) >= {_KCORE_K}),
    und{i + 1} AS (SELECT und{i}.s, und{i}.t FROM und{i}
                   JOIN a{i} ON a{i}.s = und{i}.s
                   JOIN a{i} x ON x.s = und{i}.t)""")
    n = _KCORE_ROUNDS
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
    SELECT s AS user_id, CAST(COUNT(*) AS BIGINT) AS degree
    FROM und{n} GROUP BY s HAVING COUNT(*) >= {_KCORE_K}
    """
    )


@query("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=3) of the co-movement graph: repeatedly
    peel nodes with degree < k until the remaining subgraph is stable —
    the standard cohesive-subgraph extractor (a 3-core is where flocks
    and convoys can live; degree-1/2 stragglers cannot).

    The third iterative-algorithm pattern beside connected components
    and PageRank: each round is ONE hash aggregate (degrees) + ONE
    semi-join pair (restrict both endpoints) — linear per round, no
    all-pairs anywhere; edge fan-out only ever shrinks. Runs a FIXED
    5-round peel so the DuckDB oracle (which cannot re-aggregate inside
    a recursive CTE) unrolls the identical chain; fixture convergence
    by round 5 is asserted in tests/test_mining.py, and at larger
    diameters the loop extends with localCheckpoint every few rounds
    exactly like ``connected_components``."""
    from .mining import comovement_edges

    e = comovement_edges(spark, sf_dir)
    und = e.select(F.col("u").alias("s"), F.col("v").alias("t")).unionByName(
        e.select(F.col("v").alias("s"), F.col("u").alias("t"))
    )
    for _ in range(_KCORE_ROUNDS):
        alive = (
            und.groupBy("s")
            .agg(F.count("*").alias("d"))
            .filter(F.col("d") >= _KCORE_K)
            .select("s")
        )
        # materialize per round: `und` is referenced twice per peel
        # (degrees + restriction), so an unbroken lineage DOUBLES in
        # plan size every round — O(2^rounds) planning. The edge set
        # only shrinks, so the checkpoint is a small, bounded job.
        und = (
            und.join(alive, "s", "left_semi")
            .join(alive.select(F.col("s").alias("t")), "t", "left_semi")
            .localCheckpoint()
        )
    return (
        und.groupBy("s")
        .agg(F.count("*").alias("degree"))
        .filter(F.col("degree") >= _KCORE_K)
        .select(F.col("s").alias("user_id"), "degree")
    )


_BFS_DEPTH = 4


def _bfs_oracle() -> str:
    """Chained-CTE oracle: fixed-depth BFS frontier expansion (min-hop
    labels fall out because level h excludes every earlier level)."""
    ctes = [
        """
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
    l0 AS (SELECT MIN(u) AS user_id FROM e),
    seen0 AS (SELECT user_id FROM l0)"""
    ]
    for h in range(1, _BFS_DEPTH + 1):
        ctes.append(f"""
    l{h} AS (
        SELECT DISTINCT und.t AS user_id
        FROM und JOIN l{h - 1} ON und.s = l{h - 1}.user_id
        WHERE und.t NOT IN (SELECT user_id FROM seen{h - 1})
    ),
    seen{h} AS (SELECT user_id FROM seen{h - 1}
                UNION ALL SELECT user_id FROM l{h})""")
    levels = " UNION ALL ".join(
        f"SELECT user_id, {h} AS hop FROM l{h}"
        for h in range(_BFS_DEPTH + 1)
    )
    return (
        "WITH " + ",".join(ctes)
        + f" SELECT user_id, hop FROM ({levels}) WHERE user_id IS NOT NULL"
    )


@query("graph_bfs_hops", oracle=_bfs_oracle())
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS hop distances (depth <= 4) from a deterministic seed (the
    smallest user appearing in any edge) over the undirected
    co-movement graph — the social-reachability primitive ("friends of
    friends of co-movers"), and the fourth iterative pattern beside CC,
    PageRank and k-core.

    Each round is ONE frontier⋈edges equi-join + ONE distinct + ONE
    anti-join against the visited set — per-round cost is frontier
    volume x degree, the textbook distributed BFS; min-hop labels need
    no min() because level h is constructed to exclude levels < h.
    Every level is localCheckpoint'd: the visited set is read by every
    later round, and without the cut the plan would re-derive all
    previous frontiers per round (lineage doubling — same policy as the
    CC loop). The seed is an aggregate, not a .head() — no driver
    round-trip; the whole query stays one lazy plan per level."""
    from .mining import comovement_edges

    e = comovement_edges(spark, sf_dir)
    und = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    level = e.agg(F.min("u").alias("user_id")).filter(
        F.col("user_id").isNotNull()
    ).localCheckpoint()
    out = level.withColumn("hop", F.lit(0))
    visited = level
    for h in range(1, _BFS_DEPTH + 1):
        nxt = (
            und.join(
                level.withColumnRenamed("user_id", "s"),
                und["u"] == F.col("s"),
            )
            .select(F.col("v").alias("user_id"))
            .distinct()
            .join(visited, "user_id", "left_anti")
            .localCheckpoint()
        )
        out = out.unionAll(nxt.withColumn("hop", F.lit(h)))
        visited = visited.unionAll(nxt).localCheckpoint()
        level = nxt
    return out


@query(
    "graph_cc",
    oracle="""
    WITH RECURSIVE b AS (
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
    und AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
    reach(node, label) AS (
        SELECT DISTINCT user_id, user_id FROM events
        UNION
        SELECT und.u, r.label
        FROM reach r JOIN und ON und.v = r.node
        WHERE r.label < und.u
    ),
    lab AS (SELECT node AS user_id, MIN(label) AS component_id
            FROM reach GROUP BY node)
    SELECT lab.user_id, lab.component_id, c.component_size
    FROM lab JOIN (
        SELECT component_id, COUNT(*) AS component_size FROM lab
        GROUP BY component_id
    ) c USING (component_id)
    """,
)
def graph_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the co-movement graph — the social-
    group extractor (every user labeled with the smallest user id
    reachable through co-movement edges, plus the component size), and
    the graph-family sibling of the text pipeline's dedup clustering:
    both reuse the SAME ``connected_components`` min-label-propagation
    engine (one join + one aggregate per round, scalar convergence
    check, ``localCheckpoint`` every few rounds to truncate lineage).

    Isolated users form singleton components — the node set is every
    user in events, not just edge endpoints, so the output is a total
    labeling (what a downstream group-by-component join needs)."""
    from .mining import comovement_edges
    from .text import connected_components

    e = comovement_edges(spark, sf_dir)
    und = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    t = Tables(spark, sf_dir)
    nodes = t.events.select(F.col("user_id").alias("node")).distinct()
    labels = connected_components(nodes, und)
    sizes = labels.groupBy("label").agg(
        F.count("*").alias("component_size")
    )
    return labels.join(sizes, "label").select(
        F.col("node").alias("user_id"),
        F.col("label").alias("component_id"),
        "component_size",
    )


_GI_TOPK = 20


@query(
    "traj_hotspot_gi",
    oracle=f"""
    WITH t0 AS (
        SELECT MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t0 FROM events
    ),
    cells AS (
        SELECT CAST(FLOOR((epoch_us(CAST(ts AS TIMESTAMP))
                           - (SELECT t0 FROM t0)) / 86400e6)
                    AS BIGINT) AS cx,
               CAST(FLOOR(value / 10.0) AS BIGINT) AS cy,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    box AS (
        SELECT MIN(cx) AS x0, MAX(cx) AS x1,
               MIN(cy) AS y0, MAX(cy) AS y1,
               (MAX(cx) - MIN(cx) + 1) * (MAX(cy) - MIN(cy) + 1) AS nn,
               SUM(n) AS s1,
               SUM(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS s2
        FROM cells
    ),
    sm AS (
        SELECT c.cx + dx.d AS cx, c.cy + dy.d AS cy, c.n
        FROM cells c,
             (SELECT UNNEST([-1, 0, 1]) AS d) dx,
             (SELECT UNNEST([-1, 0, 1]) AS d) dy
    ),
    gi AS (
        SELECT cells.cx, cells.cy,
               g.gsum,
               (LEAST(cells.cx + 1, b.x1) - GREATEST(cells.cx - 1, b.x0)
                + 1)
               * (LEAST(cells.cy + 1, b.y1) - GREATEST(cells.cy - 1, b.y0)
                  + 1) AS wi,
               b.nn, b.s1, b.s2
        FROM cells
        JOIN (SELECT cx, cy, CAST(SUM(n) AS BIGINT) AS gsum
              FROM sm GROUP BY cx, cy) g USING (cx, cy)
        CROSS JOIN box b
    )
    SELECT cx, cy, CAST(gsum AS BIGINT) AS neighbor_sum,
           ROUND((gsum - (s1 * 1.0 / nn) * wi)
                 / (SQRT(CAST(s2 AS DOUBLE) / nn - (s1 * 1.0 / nn) ** 2)
                    * SQRT((nn * 1.0 * wi - wi * 1.0 * wi) / (nn - 1))),
                 6) AS gi_z
    FROM gi
    WHERE nn > 1
      AND CAST(s2 AS DOUBLE) / nn - (s1 * 1.0 / nn) ** 2 > 0
      AND nn * wi - wi * wi > 0
    ORDER BY (gsum - (s1 * 1.0 / nn) * wi)
             / (SQRT(CAST(s2 AS DOUBLE) / nn - (s1 * 1.0 / nn) ** 2)
                * SQRT((nn * 1.0 * wi - wi * 1.0 * wi) / (nn - 1)))
             DESC, cx, cy
    LIMIT {_GI_TOPK}
    """,
)
def traj_hotspot_gi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* hotspot detection over the (day, value/10) density
    grid: the top-20 statistically hottest cells — the spatial-
    statistics step after ``traj_heatmap_density``'s raster (a high
    count is not a hotspot unless its NEIGHBORHOOD is jointly high
    relative to the study area's mean and variance).

    The study area is the occupied cells' bounding box; per-cell
    neighborhood weight W_i is the box-clamped 3x3 size (integer
    arithmetic), the neighborhood sum reuses the heatmap's scatter-
    gather (no neighbor join), and the global moments (N, Σx, Σx²) are
    one broadcast row of exact integers — so every z-score is a single
    float expression over exact integers, identical cross-engine, and
    the knife-edge top-20 needs only the (cx, cy) tie-break. Cost: the
    grid aggregate is the only data-sized pass; everything downstream
    is grid-sized."""
    t = Tables(spark, sf_dir)
    t0 = t.events.agg(F.min(F.unix_micros("ts")).alias("t0"))
    cells = (
        t.events.join(F.broadcast(t0))
        .groupBy(
            F.floor((F.unix_micros("ts") - F.col("t0")) / 86400e6).alias(
                "cx"
            ),
            F.floor(F.col("value") / 10.0).alias("cy"),
        )
        .agg(F.count("*").alias("n"))
    )
    d18 = F.col("n").cast("decimal(18,0)")
    box = cells.agg(
        F.min("cx").alias("x0"),
        F.max("cx").alias("x1"),
        F.min("cy").alias("y0"),
        F.max("cy").alias("y1"),
        (
            (F.max("cx") - F.min("cx") + 1)
            * (F.max("cy") - F.min("cy") + 1)
        ).alias("nn"),
        F.sum("n").alias("s1"),
        F.sum(d18 * d18).alias("s2"),
    )
    sm = (
        cells.select(
            "cx", "cy", "n", F.expr("explode(array(-1,0,1))").alias("dx")
        )
        .select(
            "cx",
            "cy",
            "n",
            "dx",
            F.expr("explode(array(-1,0,1))").alias("dy"),
        )
        .select(
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
            "n",
        )
        .groupBy("cx", "cy")
        .agg(F.sum("n").alias("gsum"))
    )
    gi = (
        cells.join(sm, ["cx", "cy"])
        .join(F.broadcast(box))
        .withColumn(
            "wi",
            (
                F.least(F.col("cx") + 1, F.col("x1"))
                - F.greatest(F.col("cx") - 1, F.col("x0"))
                + 1
            )
            * (
                F.least(F.col("cy") + 1, F.col("y1"))
                - F.greatest(F.col("cy") - 1, F.col("y0"))
                + 1
            ),
        )
    )
    mean = F.col("s1") * 1.0 / F.col("nn")
    sd = F.sqrt(
        F.col("s2").cast("double") / F.col("nn") - mean * mean
    )
    z = (F.col("gsum") - mean * F.col("wi")) / (
        sd
        * F.sqrt(
            (
                F.col("nn") * 1.0 * F.col("wi")
                - F.col("wi") * 1.0 * F.col("wi")
            )
            / (F.col("nn") - 1)
        )
    )
    # exclude degenerate study areas (one cell, zero variance, or a
    # neighborhood covering the whole box): Gi* is undefined there —
    # mirrored in the oracle; real grids always pass
    defined = (
        (F.col("nn") > 1)
        & (F.col("s2").cast("double") / F.col("nn") - mean * mean > 0)
        & (F.col("nn") * F.col("wi") - F.col("wi") * F.col("wi") > 0)
    )
    return (
        gi.filter(defined)
        .withColumn("gi_z", z)
        .orderBy(F.desc("gi_z"), "cx", "cy")
        .limit(_GI_TOPK)
        .select(
            "cx",
            "cy",
            F.col("gsum").alias("neighbor_sum"),
            F.round("gi_z", 6).alias("gi_z"),
        )
    )


@query(
    "graph_assortativity",
    oracle="""
    WITH b AS (
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
    und AS (SELECT u AS s, t.v AS t FROM e t(u, v)
            UNION ALL SELECT v, u FROM e),
    deg AS (SELECT s, COUNT(*) AS d FROM und GROUP BY s),
    pairs AS (
        SELECT da.d AS x, db.d AS y
        FROM und JOIN deg da ON da.s = und.s
                 JOIN deg db ON db.s = und.t
    ),
    m AS (
        SELECT COUNT(*) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x AS HUGEINT) * x) AS sxx,
               SUM(CAST(y AS HUGEINT) * y) AS syy,
               SUM(CAST(x AS HUGEINT) * y) AS sxy
        FROM pairs
    )
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (SQRT(n * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) ** 2)
                    * SQRT(n * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) ** 2)), 6) + 0.0
               AS assortativity
    FROM m
    WHERE n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) ** 2 > 0
      AND n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) ** 2 > 0
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-movement graph (Newman's r): the
    Pearson correlation of endpoint degrees over all directed edge
    slots — do gregarious users co-move with other gregarious users
    (r > 0, social networks) or with loners (r < 0, hub-and-spoke)?
    One scalar that tells you which skew-mitigation story the graph's
    joins will need.

    Sufficient statistics over INTEGER degrees (exact 128-bit products,
    order-independent sums) + one final float expression — the
    ``rel_autocorr`` discipline applied to a graph moment. Cost: one
    degree aggregate + two broadcast-sized joins back to the edge list;
    linear in edges. Degenerate regular graphs (zero degree variance)
    emit no row on both sides rather than NULL/NaN divergence."""
    from .mining import comovement_edges

    e = comovement_edges(spark, sf_dir)
    und = e.select(F.col("u").alias("s"), F.col("v").alias("t")).unionAll(
        e.select(F.col("v").alias("s"), F.col("u").alias("t"))
    )
    deg = und.groupBy("s").agg(F.count("*").alias("d"))
    pairs = (
        und.join(deg.withColumnRenamed("d", "x"), "s")
        .join(
            deg.select(F.col("s").alias("t"), F.col("d").alias("y")), "t"
        )
        .select("x", "y")
    )
    d18 = lambda c: F.col(c).cast("decimal(18,0)")  # noqa: E731
    m = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(d18("x") * d18("x")).alias("sxx"),
        F.sum(d18("y") * d18("y")).alias("syy"),
        F.sum(d18("x") * d18("y")).alias("sxy"),
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    var_x = F.col("n") * dbl("sxx") - dbl("sx") * dbl("sx")
    var_y = F.col("n") * dbl("syy") - dbl("sy") * dbl("sy")
    r = (F.col("n") * dbl("sxy") - dbl("sx") * dbl("sy")) / (
        F.sqrt(var_x) * F.sqrt(var_y)
    )
    return (
        m.filter((var_x > 0) & (var_y > 0))
        .select(
            (F.col("n") / 2).cast("long").alias("n_edges"),
            # + 0.0 collapses IEEE negative zero (same hazard as
            # graph_modularity, found by the sf0.1 dual-scale gate)
            (F.round(r, 6) + 0.0).alias("assortativity"),
        )
    )
