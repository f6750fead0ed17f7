"""Round-9 (continuation) additions — warehouse/curation staples that
round out the analytics surface:

- ``rel_market_basket`` — association rules (support / confidence /
  lift) over per-user event-type baskets, the Apriori-at-depth-2
  rollup every product warehouse materializes.
- ``rel_cuped`` — CUPED variance-reduced A/B means (Deng et al.,
  WSDM'13): pooled pre-period covariate theta from exact integer
  moments, per-arm adjusted post-period means.
- ``rel_rfm_segments`` — equi-depth RFM (recency / frequency /
  monetary) customer segmentation with EXACT integer quintile cuts
  computed from bounded distinct-value histograms — no corpus-sized
  global window.
- ``graph_katz`` — Katz centrality unrolled to walk length 3 on the
  capped co-movement graph, exact integer micro-unit scores.
- ``sketch_bloom_fpr`` — build an m-bit / k-hash Bloom filter over
  purchaser ids and measure its EMPIRICAL false-positive rate on the
  disjoint non-purchaser probe set, beside the fill-fraction bound.
- ``text_readability`` — Flesch reading-ease banded histogram from
  integer milli-unit scores (words / sentences / vowel-group
  syllables), the readability gate of a pretraining quality stack.
- ``rel_markov_transitions`` — first-order event-type transition
  matrix (LAG within user, vocab-bounded output).
- ``text_template_detect`` — templated/machine-generated document
  clusters via structure skeletons (digits->0, letter-runs->a), the
  spam-template mode that exact/near dedup both miss.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables
from .extras5 import _split_top_level

# ---------------------------------------------------------------------------
# rel_market_basket — depth-2 association rules over event-type baskets
# ---------------------------------------------------------------------------

# one shared display projection: every ratio is exact-integer-counts
# divided once, in DOUBLE, with identical expression text on both
# engines (lift is the classic n_both·n_users / (n_ant·n_cons))
_MB_FINAL = """
    ant, cons,
    CAST(n_both AS BIGINT) AS n_both,
    CAST(n_ant AS BIGINT) AS n_ant,
    CAST(n_cons AS BIGINT) AS n_cons,
    CAST(n_users AS BIGINT) AS n_users,
    ROUND(CAST(n_both AS DOUBLE) / n_users, 6) AS support,
    ROUND(CAST(n_both AS DOUBLE) / n_ant, 6) AS confidence,
    ROUND(CAST(n_both AS DOUBLE) * n_users
          / (CAST(n_ant AS DOUBLE) * n_cons), 6) AS lift
"""


@query(
    "rel_market_basket",
    oracle=f"""
    WITH b AS (SELECT DISTINCT user_id, event_type FROM events),
    tot AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM b),
    item AS (
        SELECT event_type, COUNT(*) AS n_item FROM b GROUP BY 1
    ),
    pair AS (
        SELECT a.event_type AS ant, c.event_type AS cons,
               COUNT(*) AS n_both
        FROM b a JOIN b c ON a.user_id = c.user_id
                         AND a.event_type <> c.event_type
        GROUP BY 1, 2
    ),
    wide AS (
        SELECT p.ant, p.cons, p.n_both,
               ia.n_item AS n_ant, ic.n_item AS n_cons, tot.n_users
        FROM pair p
        JOIN item ia ON ia.event_type = p.ant
        JOIN item ic ON ic.event_type = p.cons, tot
    )
    SELECT {_MB_FINAL} FROM wide
    """,
)
def rel_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASSOCIATION RULES at depth 2 — support, confidence and lift for
    every ordered event-type pair (antecedent -> consequent) over
    per-user baskets: the Apriori rollup retail/product warehouses
    materialize nightly, and the missing companion of
    `graph_copurchase` (which keeps the graph, not the rule table).

    Exactness: every number is an exact integer count (distinct
    (user, type) rows, per-type user counts, per-pair co-occurrence
    counts); the three ratios are single shared-display DOUBLE
    divisions of those integers, so both engines divide the same
    integers in the same order.

    Scale shape: the basket table is one distinct (user, type) hash
    agg; the pair join fans out only vocab-bounded rows per user
    (|types|^2, single digits here), then two BROADCAST joins attach
    the vocab-sized item counts and the 1-row user total — the big
    table is touched twice, shuffled on user_id once."""
    t = Tables(spark, sf_dir)
    # the basket table feeds 4 consumers (both pair sides, item
    # counts, user total): stage it once — one events scan, not 5
    b = (
        t.events.select("user_id", "event_type")
        .distinct()
        .localCheckpoint()
    )
    tot = b.agg(F.countDistinct("user_id").alias("n_users"))
    item = b.groupBy("event_type").agg(F.count("*").alias("n_item"))
    a = b.select("user_id", F.col("event_type").alias("ant"))
    c = b.select("user_id", F.col("event_type").alias("cons"))
    pair = (
        a.join(c, "user_id")
        .filter(F.col("ant") != F.col("cons"))
        .groupBy("ant", "cons")
        .agg(F.count("*").alias("n_both"))
    )
    wide = (
        pair.join(
            F.broadcast(
                item.select(
                    F.col("event_type").alias("ant"),
                    F.col("n_item").alias("n_ant"),
                )
            ),
            "ant",
        )
        .join(
            F.broadcast(
                item.select(
                    F.col("event_type").alias("cons"),
                    F.col("n_item").alias("n_cons"),
                )
            ),
            "cons",
        )
        .join(F.broadcast(tot))
    )
    return wide.selectExpr(*_split_top_level(_MB_FINAL))


# ---------------------------------------------------------------------------
# rel_cuped — CUPED variance-reduced A/B means from exact integer moments
# ---------------------------------------------------------------------------

# theta = cov(X,Y)/var(X) appears twice (display + adjustment) as the
# SAME expression text, so both engines build the identical float DAG;
# X/Y are per-user centi-sums, moments are exact integers (operands cast
# to DECIMAL(18,0), products widening to ~DECIMAL(36,0) — ample headroom
# for centi-sums, though narrower than the full rel_lorenz_gini
# DECIMAL(38,0) recipe; an operand beyond 1e18 would error in DuckDB)
_CUPED_THETA = (
    "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
)

_CUPED_FINAL = f"""
    CAST(arm AS BIGINT) AS arm,
    CAST(n_a AS BIGINT) AS n_users,
    ROUND(CAST(sx_a AS DOUBLE) / n_a / 100, 6) AS mean_pre,
    ROUND(CAST(sy_a AS DOUBLE) / n_a / 100, 6) AS mean_post,
    ROUND({_CUPED_THETA}, 6) + 0.0 AS theta,
    ROUND((CAST(sy_a AS DOUBLE) / n_a
           - {_CUPED_THETA}
             * (CAST(sx_a AS DOUBLE) / n_a
                - CAST(sx AS DOUBLE) / n)) / 100, 6) + 0.0
        AS mean_post_adj
"""


@query(
    "rel_cuped",
    oracle=f"""
    WITH ev AS (
        SELECT user_id,
               CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 86400e6)
                    AS BIGINT) AS dy,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    mid AS (
        SELECT CAST((MIN(dy) + MAX(dy)) // 2 AS BIGINT) AS mid FROM ev
    ),
    u AS (
        SELECT user_id, user_id % 2 AS arm,
               SUM(CASE WHEN dy <= mid THEN cents ELSE 0 END) AS x,
               SUM(CASE WHEN dy > mid THEN cents ELSE 0 END) AS y
        FROM ev, mid GROUP BY 1, 2
    ),
    g AS (
        SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x AS DECIMAL(18,0))
                   * CAST(x AS DECIMAL(18,0))) AS sxx,
               SUM(CAST(x AS DECIMAL(18,0))
                   * CAST(y AS DECIMAL(18,0))) AS sxy
        FROM u
        HAVING COUNT(*) * SUM(CAST(x AS DECIMAL(18,0))
                              * CAST(x AS DECIMAL(18,0)))
               - CAST(SUM(x) AS DECIMAL(18,0))
                 * CAST(SUM(x) AS DECIMAL(18,0)) > 0
    ),
    a AS (
        SELECT arm, COUNT(*) AS n_a, SUM(x) AS sx_a, SUM(y) AS sy_a
        FROM u GROUP BY 1
    )
    SELECT {_CUPED_FINAL} FROM a, g
    """,
)
def rel_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng, Xu, Kohavi &
    Walker, WSDM'13) — the industry-standard A/B sharpener that
    `rel_did`/`rel_ttest_welch` lack: per user, X = pre-period spend
    (centi-units, days <= integer midpoint), Y = post-period spend;
    theta = cov(X,Y)/var(X) POOLED across arms (even/odd user_id);
    each arm's adjusted mean is mean(Y) - theta*(mean_a(X) - mean(X)).

    Exactness: per-user X/Y are exact centi BIGINTs; the five pooled
    moments (n, SX, SY, SXX, SXY) are exact — operands cast to
    DECIMAL(18,0) so cross products widen to ~DECIMAL(36,0) and 100x
    clones cannot overflow (narrower than the rel_lorenz_gini
    DECIMAL(38,0) recipe: an operand beyond 1e18 would error in
    DuckDB rather than wrap); theta and the adjusted means are ONE shared
    float display whose expression text is identical on both engines
    (theta inlined twice on purpose); degenerate var(X)=0 corpora
    yield zero rows via an integer HAVING gate, not a NaN.

    Scale shape: one user_id hash agg builds (X, Y); a 1-row global
    moment agg and a 2-row arm agg cross-join back — nothing bigger
    than 5 numbers moves after the per-user pass."""
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "user_id",
        F.expr(
            "CAST(FLOOR(unix_micros(ts) / 86400e6) AS BIGINT)"
        ).alias("dy"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
    )
    mid = ev.agg(
        F.expr("CAST((MIN(dy) + MAX(dy)) div 2 AS BIGINT)").alias("mid")
    )
    u = (
        ev.join(F.broadcast(mid))
        .groupBy("user_id", (F.col("user_id") % 2).alias("arm"))
        .agg(
            F.expr(
                "SUM(CASE WHEN dy <= mid THEN cents ELSE 0 END)"
            ).alias("x"),
            F.expr(
                "SUM(CASE WHEN dy > mid THEN cents ELSE 0 END)"
            ).alias("y"),
        )
        # per-user (x, y) feeds both the pooled-moment and per-arm
        # aggs: stage it once — one events scan, not 4
        .localCheckpoint()
    )
    g = u.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(
            F.col("x").cast("decimal(18,0)")
            * F.col("x").cast("decimal(18,0)")
        ).alias("sxx"),
        F.sum(
            F.col("x").cast("decimal(18,0)")
            * F.col("y").cast("decimal(18,0)")
        ).alias("sxy"),
    ).filter(
        "n * sxx - CAST(sx AS DECIMAL(18,0))"
        " * CAST(sx AS DECIMAL(18,0)) > 0"
    )
    a = u.groupBy("arm").agg(
        F.count("*").alias("n_a"),
        F.sum("x").alias("sx_a"),
        F.sum("y").alias("sy_a"),
    )
    return a.join(F.broadcast(g)).selectExpr(
        *_split_top_level(_CUPED_FINAL)
    )


# ---------------------------------------------------------------------------
# rel_rfm_segments — equi-depth RFM segmentation via exact histogram cuts
# ---------------------------------------------------------------------------

_RFM_FINAL = """
    CAST(r_score AS BIGINT) AS r_score,
    CAST(f_score AS BIGINT) AS f_score,
    CAST(m_score AS BIGINT) AS m_score,
    CAST(COUNT(*) AS BIGINT) AS n_customers,
    ROUND(CAST(SUM(m_cents) AS DOUBLE) / 100, 6) AS monetary,
    ROUND(CAST(SUM(f_cnt) AS DOUBLE) / COUNT(*), 6) AS avg_frequency,
    ROUND(CAST(SUM(r_days) AS DOUBLE) / COUNT(*), 6) AS avg_recency_days
"""

# quintile cut j (j=1..4) of a dimension = the SMALLEST value whose
# cumulative count satisfies 5*cum >= j*n — an exact integer decision
# (equivalently cum >= ceil(j*n/5)); a value equal to a cut stays in
# the lower bucket.  One CTE trio per dimension.
_RFM_CUTS = """
    h{d} AS (SELECT {col} AS v, COUNT(*) AS c FROM cust GROUP BY 1),
    c{d} AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cum FROM h{d}),
    k{d} AS (
        SELECT g.j, MIN(v) AS cut
        FROM c{d}, n, (SELECT UNNEST([1, 2, 3, 4]) AS j) g
        WHERE 5 * cum >= g.j * n.n GROUP BY 1
    ),
    w{d} AS (
        SELECT MIN(CASE WHEN j = 1 THEN cut END) AS c1,
               MIN(CASE WHEN j = 2 THEN cut END) AS c2,
               MIN(CASE WHEN j = 3 THEN cut END) AS c3,
               MIN(CASE WHEN j = 4 THEN cut END) AS c4
        FROM k{d}
    )
"""


@query(
    "rel_rfm_segments",
    oracle=f"""
    WITH maxd AS (
        SELECT MAX(CAST(FLOOR(epoch_us(CAST(o_orderdate AS TIMESTAMP))
                              / 86400e6) AS BIGINT)) AS gmax
        FROM orders
    ),
    cust AS (
        SELECT o_custkey,
               maxd.gmax
                 - MAX(CAST(FLOOR(epoch_us(CAST(o_orderdate
                                                AS TIMESTAMP))
                                  / 86400e6) AS BIGINT)) AS r_days,
               COUNT(*) AS f_cnt,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                   AS m_cents,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    // 10000 AS BIGINT) AS m_band
        FROM orders, maxd GROUP BY 1, maxd.gmax
    ),
    n AS (SELECT COUNT(*) AS n FROM cust),
    {_RFM_CUTS.format(d="r", col="r_days")},
    {_RFM_CUTS.format(d="f", col="f_cnt")},
    {_RFM_CUTS.format(d="m", col="m_band")},
    scored AS (
        SELECT r_days, f_cnt, m_cents,
               6 - (1 + CASE WHEN r_days > wr.c1 THEN 1 ELSE 0 END
                      + CASE WHEN r_days > wr.c2 THEN 1 ELSE 0 END
                      + CASE WHEN r_days > wr.c3 THEN 1 ELSE 0 END
                      + CASE WHEN r_days > wr.c4 THEN 1 ELSE 0 END)
                   AS r_score,
               1 + CASE WHEN f_cnt > wf.c1 THEN 1 ELSE 0 END
                 + CASE WHEN f_cnt > wf.c2 THEN 1 ELSE 0 END
                 + CASE WHEN f_cnt > wf.c3 THEN 1 ELSE 0 END
                 + CASE WHEN f_cnt > wf.c4 THEN 1 ELSE 0 END
                   AS f_score,
               1 + CASE WHEN m_band > wm.c1 THEN 1 ELSE 0 END
                 + CASE WHEN m_band > wm.c2 THEN 1 ELSE 0 END
                 + CASE WHEN m_band > wm.c3 THEN 1 ELSE 0 END
                 + CASE WHEN m_band > wm.c4 THEN 1 ELSE 0 END
                   AS m_score
        FROM cust, wr, wf, wm
    )
    SELECT {_RFM_FINAL}
    FROM scored GROUP BY 1, 2, 3
    """,
)
def rel_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQUI-DEPTH RFM SEGMENTATION — recency / frequency / monetary
    quintile scores per customer, rolled up to the <=125 (R,F,M)
    segments with sizes and value totals: THE classic CRM cube.

    The point of this implementation is HOW the quintiles are cut:
    not NTILE over a corpus-sized single-partition window (the
    anti-pattern the round-9 global-window audit hunts), but EXACT
    integer order statistics read off bounded DISTINCT-VALUE
    histograms — recency has ~#days distinct values, frequency
    ~#orders-per-customer, monetary is banded to whole-hundred units
    (integer floor-div) first, so each histogram (and its cumulative
    window) is domain-bounded no matter how many customers flow in.
    Cut j = smallest value with 5*cum >= j*n (an integer decision =
    ceil-rank semantics, ties stay low); a customer's score is
    1 + #cuts-strictly-below (recency inverted so most-recent = 5).

    Scale shape: one o_custkey hash agg builds the RFM triple; three
    tiny histogram aggs + 4-row cut tables broadcast back; final
    125-row rollup. The orders table is scanned once."""
    t = Tables(spark, sf_dir)
    day = F.expr(
        "CAST(FLOOR(unix_micros(CAST(o_orderdate AS TIMESTAMP))"
        " / 86400e6) AS BIGINT)"
    )
    maxd = t.orders.agg(F.max(day).alias("gmax"))
    cust = (
        t.orders.join(F.broadcast(maxd))
        .groupBy("o_custkey", "gmax")
        .agg(
            F.max(day).alias("cmax"),
            F.count("*").alias("f_cnt"),
            F.sum(
                F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")
            ).alias("m_cents"),
        )
        .select(
            (F.col("gmax") - F.col("cmax")).alias("r_days"),
            "f_cnt",
            "m_cents",
            F.expr("CAST(m_cents div 10000 AS BIGINT)").alias("m_band"),
        )
        # the per-customer triple is consumed 5x (count, 3 histograms,
        # scoring); localCheckpoint collapses what would otherwise be
        # 14 full orders scans in one plan to ONE scan + tiny reuses
        # (the text_simhash_neardup staging precedent)
        .localCheckpoint()
    )
    n = cust.agg(F.count("*").alias("n"))

    def cuts(col: str) -> DataFrame:
        # bounded distinct-value histogram -> cumulative counts ->
        # the 4 exact quintile cut values as one broadcastable row
        h = cust.groupBy(F.col(col).alias("v")).agg(
            F.count("*").alias("c")
        )
        cum = h.select(
            "v",
            F.sum("c")
            .over(W.orderBy("v").rowsBetween(W.unboundedPreceding, 0))
            .alias("cum"),
        )
        grid = spark.range(1, 5).select(F.col("id").alias("j"))
        k = (
            cum.join(F.broadcast(n))
            .join(F.broadcast(grid))
            .filter(F.col("cum") * 5 >= F.col("j") * F.col("n"))
            .groupBy("j")
            .agg(F.min("v").alias("cut"))
        )
        return k.agg(
            *[
                F.min(F.when(F.col("j") == i, F.col("cut"))).alias(
                    f"c{i}"
                )
                for i in (1, 2, 3, 4)
            ]
        )

    def score(col: str, pfx: str) -> F.Column:
        b = F.lit(1)
        for i in (1, 2, 3, 4):
            b = b + F.when(
                F.col(col) > F.col(f"{pfx}_c{i}"), 1
            ).otherwise(0)
        return b

    wr, wf, wm = cuts("r_days"), cuts("f_cnt"), cuts("m_band")
    scored = (
        cust.join(F.broadcast(wr.select(*[F.col(f"c{i}").alias(f"r_c{i}") for i in (1, 2, 3, 4)])))
        .join(F.broadcast(wf.select(*[F.col(f"c{i}").alias(f"f_c{i}") for i in (1, 2, 3, 4)])))
        .join(F.broadcast(wm.select(*[F.col(f"c{i}").alias(f"m_c{i}") for i in (1, 2, 3, 4)])))
        .select(
            "r_days",
            "f_cnt",
            "m_cents",
            (F.lit(6) - score("r_days", "r")).alias("r_score"),
            score("f_cnt", "f").alias("f_score"),
            score("m_band", "m").alias("m_score"),
        )
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").cast("bigint").alias("n_customers"),
        F.round(F.sum("m_cents").cast("double") / 100, 6).alias(
            "monetary"
        ),
        F.round(
            F.sum("f_cnt").cast("double") / F.count("*"), 6
        ).alias("avg_frequency"),
        F.round(
            F.sum("r_days").cast("double") / F.count("*"), 6
        ).alias("avg_recency_days"),
    )


# ---------------------------------------------------------------------------
# graph_katz — Katz centrality unrolled to walk length 3, exact integers
# ---------------------------------------------------------------------------

_KATZ_TOPN = 20
# attenuation beta = 1/8 in micro-units, each power pre-truncated ONCE
# as an integer literal: 1e6/8, 1e6/64, 1e6/512 (floor) — the
# graph_adamic_adar quantize-once recipe applied to the weights
_KATZ_W1 = 125_000
_KATZ_W2 = 15_625
_KATZ_W3 = 1_953


def _katz_oracle() -> str:
    from .mining import _CO_EPS, _CO_MIN_DAYS, CAPPED_BASE_SQL

    return f"""
    WITH b AS ({CAPPED_BASE_SQL}),
    e AS MATERIALIZED (
        SELECT a.user_id AS u, c.user_id AS v
        FROM b a JOIN b c
          ON a.dy = c.dy AND a.user_id < c.user_id
         AND ABS(a.v - c.v) <= {_CO_EPS}
        GROUP BY 1, 2 HAVING COUNT(*) >= {_CO_MIN_DAYS}
    ),
    und AS (
        SELECT u AS node, v AS nbr FROM e
        UNION ALL SELECT v, u FROM e
    ),
    deg AS (SELECT node, COUNT(*) AS w1 FROM und GROUP BY 1),
    p2 AS (
        SELECT und.node, SUM(d.w1) AS w2
        FROM und JOIN deg d ON d.node = und.nbr GROUP BY 1
    ),
    p3 AS (
        SELECT und.node, SUM(p.w2) AS w3
        FROM und JOIN p2 p ON p.node = und.nbr GROUP BY 1
    ),
    k AS (
        SELECT deg.node AS user_id,
               CAST(deg.w1 AS BIGINT) AS walks1,
               CAST(p2.w2 AS BIGINT) AS walks2,
               CAST(p3.w3 AS BIGINT) AS walks3,
               CAST(deg.w1 * {_KATZ_W1} + p2.w2 * {_KATZ_W2}
                    + p3.w3 * {_KATZ_W3} AS BIGINT) AS katz_micro
        FROM deg JOIN p2 USING (node) JOIN p3 USING (node)
    )
    SELECT user_id, walks1, walks2, walks3, katz_micro,
           ROUND(CAST(katz_micro AS DOUBLE) / 1e6, 6) AS katz
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY katz_micro DESC,
                                     user_id) AS rk
        FROM k
    ) WHERE rk <= {_KATZ_TOPN}
    """


@query("graph_katz", oracle=_katz_oracle)
def graph_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KATZ CENTRALITY unrolled to walk length 3 over the capped
    co-movement graph — the attenuated-walk companion of
    `graph_pagerank` (uniform damping) and `graph_hits`
    (mutual-reinforcement): katz(a) = sum over L of beta^L * (#walks
    of length L from a), beta = 1/8, truncated at L=3.  Output: the
    top-20 most walk-central users with the exact per-length walk
    counts and the integer micro-unit score.

    Exactness: walk counts are EXACT integers by construction
    (walks2(a) = sum of deg over neighbors, walks3(a) = sum of
    walks2 over neighbors — two relational joins, no floats); each
    beta power is pre-truncated ONCE to a micro-unit integer literal
    (1e6/8, /64, /512), so katz_micro is an exact BIGINT and the
    ranking is an integer decision; the /1e6 display is the only
    float.  Ranked via orderBy+limit (TakeOrderedAndProject).

    Scale shape: two joins keyed on the shared endpoint — identical
    fan-out profile to `graph_adamic_adar`'s wedge join, bounded by
    the capped builder's per-(day, cell) participant cap; 64-row
    attenuation means BIGINT holds to ~1e15 walks, far past the cap's
    reach at 100x."""
    from .mining import comovement_edges_capped

    e = comovement_edges_capped(spark, sf_dir)
    und = e.select(
        F.col("u").alias("node"), F.col("v").alias("nbr")
    ).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = und.groupBy("node").agg(F.count("*").alias("w1"))
    p2 = (
        und.join(
            deg.select(F.col("node").alias("nbr"), F.col("w1").alias("dw")),
            "nbr",
        )
        .groupBy("node")
        .agg(F.sum("dw").alias("w2"))
    )
    p3 = (
        und.join(
            p2.select(F.col("node").alias("nbr"), F.col("w2").alias("pw")),
            "nbr",
        )
        .groupBy("node")
        .agg(F.sum("pw").alias("w3"))
    )
    k = (
        deg.join(p2, "node")
        .join(p3, "node")
        .select(
            F.col("node").alias("user_id"),
            F.col("w1").cast("bigint").alias("walks1"),
            F.col("w2").cast("bigint").alias("walks2"),
            F.col("w3").cast("bigint").alias("walks3"),
            F.expr(
                f"CAST(w1 * {_KATZ_W1} + w2 * {_KATZ_W2}"
                f" + w3 * {_KATZ_W3} AS BIGINT)"
            ).alias("katz_micro"),
        )
    )
    return (
        k.orderBy(F.col("katz_micro").desc(), "user_id")
        .limit(_KATZ_TOPN)
        .select(
            "*",
            F.round(F.col("katz_micro").cast("double") / 1e6, 6).alias(
                "katz"
            ),
        )
    )


# ---------------------------------------------------------------------------
# sketch_bloom_fpr — Bloom filter build + empirical false-positive rate
# ---------------------------------------------------------------------------

_BLOOM_M = 16_384  # filter bits
_BLOOM_K = 4  # hash functions

_BLOOM_FINAL = f"""
    CAST(n_keys AS BIGINT) AS n_keys,
    CAST(n_probes AS BIGINT) AS n_probes,
    CAST(n_bits_set AS BIGINT) AS n_bits_set,
    CAST(n_fp AS BIGINT) AS n_fp,
    ROUND(CAST(n_fp AS DOUBLE) / n_probes, 6) AS fpr,
    ROUND(CAST(n_bits_set AS DOUBLE) / {_BLOOM_M}, 6) AS fill_frac,
    ROUND(POWER(CAST(n_bits_set AS DOUBLE) / {_BLOOM_M},
                {_BLOOM_K}), 6) AS fpr_expected
"""


@query(
    "sketch_bloom_fpr",
    oracle=f"""
    WITH purch AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 2 = 0
    ),
    other AS (
        SELECT DISTINCT user_id FROM events WHERE user_id % 2 = 1
    ),
    grid AS (SELECT UNNEST(range(0, {_BLOOM_K})) AS i),
    bits AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)
                                        || '#'
                                        || CAST(i AS VARCHAR)), 1, 8))
                    AS BIGINT) % {_BLOOM_M} AS pos
        FROM purch, grid
    ),
    ppos AS (
        SELECT o.user_id,
               CAST(('0x' || substr(md5(CAST(o.user_id AS VARCHAR)
                                        || '#'
                                        || CAST(g.i AS VARCHAR)), 1, 8))
                    AS BIGINT) % {_BLOOM_M} AS pos
        FROM other o, grid g
    ),
    hit AS (
        SELECT p.user_id, COUNT(b.pos) AS n_hit
        FROM ppos p LEFT JOIN bits b ON b.pos = p.pos
        GROUP BY 1
    ),
    s AS (
        SELECT (SELECT COUNT(*) FROM purch) AS n_keys,
               (SELECT COUNT(*) FROM other) AS n_probes,
               (SELECT COUNT(*) FROM bits) AS n_bits_set,
               (SELECT COUNT(*) FROM hit
                WHERE n_hit = {_BLOOM_K}) AS n_fp
        HAVING n_probes >= 1
    )
    SELECT {_BLOOM_FINAL} FROM s
    """,
)
def sketch_bloom_fpr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM FILTER build + EMPIRICAL false-positive audit — the
    missing membership sketch beside HLL/CMS/KMV, measured the way a
    pipeline actually validates one: insert every even user id into
    an m=16384-bit, k=4 filter, probe with the DISJOINT odd-id set
    (both halves non-empty by construction, unlike any
    event-type-conditioned split), and report the observed FPR beside
    the fill-fraction bound (set-bit density ^ k, the standard
    empirical-fill estimate).

    Exactness: bit positions are 32-bit md5 prefixes mod m (the
    `sketch_hll_distinct` cross-engine hash idiom, salted '#i' per
    hash function); the filter is the exact DISTINCT position set;
    a probe is a false positive iff ALL k of its positions hit —
    an integer count compare.  The two float displays divide exact
    integers once.

    Scale shape: build = one distinct-agg over n*k integer rows;
    the m-bounded (<=16384-row) bit set BROADCASTS to the probe side,
    so probing is a map-side hash lookup + one user_id agg — the
    filter itself never shuffles, exactly how a 100 TB prefilter
    deploys."""
    t = Tables(spark, sf_dir)
    h = (
        f"CAST(conv(substr(md5(concat(CAST(user_id AS STRING), '#',"
        f" CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        f" % {_BLOOM_M}"
    )
    # each id half feeds two consumers (positions + count): stage the
    # distinct lists once — two events scans total, not 5
    purch = (
        t.events.filter(F.col("user_id") % 2 == 0)
        .select("user_id")
        .distinct()
        .localCheckpoint()
    )
    other = (
        t.events.filter(F.col("user_id") % 2 == 1)
        .select("user_id")
        .distinct()
        .localCheckpoint()
    )
    grid = spark.range(_BLOOM_K).select(F.col("id").alias("i"))
    bits = (
        purch.join(F.broadcast(grid))
        .select(F.expr(h).alias("pos"))
        .distinct()
    )
    hit = (
        other.join(F.broadcast(grid))
        .select("user_id", F.expr(h).alias("pos"))
        .join(
            F.broadcast(bits.withColumn("b", F.lit(1))), "pos", "left"
        )
        .groupBy("user_id")
        .agg(F.count("b").alias("n_hit"))
    )
    s = (
        purch.agg(F.count("*").alias("n_keys"))
        .join(other.agg(F.count("*").alias("n_probes")))
        .join(bits.agg(F.count("*").alias("n_bits_set")))
        .join(
            hit.filter(F.col("n_hit") == _BLOOM_K).agg(
                F.count("*").alias("n_fp")
            )
        )
        .filter("n_probes >= 1")
    )
    return s.selectExpr(*_split_top_level(_BLOOM_FINAL))


# ---------------------------------------------------------------------------
# text_readability — integer milli-Flesch banded histogram
# ---------------------------------------------------------------------------

_READ_FINAL = """
    CAST(band AS BIGINT) AS flesch_band,
    CAST(COUNT(*) AS BIGINT) AS n_docs,
    CAST(SUM(words) AS BIGINT) AS total_words,
    ROUND(CAST(SUM(words) AS DOUBLE) / SUM(sents), 6)
        AS avg_words_per_sentence,
    ROUND(CAST(SUM(syll) AS DOUBLE) / SUM(words), 6)
        AS avg_syllables_per_word,
    ROUND(CAST(SUM(fm) AS DOUBLE) / COUNT(*) / 1000, 6) AS avg_flesch
"""


@query(
    "text_readability",
    oracle=f"""
    WITH d AS (
        SELECT len(string_split(text, ' ')) AS words,
               GREATEST(1, length(text)
                           - length(replace(replace(replace(text,
                                 '.', ''), '!', ''), '?', '')))
                   AS sents,
               len(regexp_extract_all(text, '[aeiouAEIOU]+')) AS syll
        FROM documents
    ),
    f AS (
        SELECT words, sents, syll,
               LEAST(206835, GREATEST(0,
                   206835 - (1015 * words) // sents
                          - (84600 * syll) // words)) AS fm
        FROM d
    ),
    b AS (SELECT words, sents, syll, fm, fm // 10000 AS band FROM f)
    SELECT {_READ_FINAL}
    FROM b GROUP BY 1
    """,
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLESCH READING-EASE banded histogram — the readability gate of
    a pretraining quality stack (kept-band selection is how CC-style
    corpora drop both gibberish and boilerplate legalese):
    206.835 - 1.015*(words/sentence) - 84.6*(syllables/word), with
    syllables approximated by vowel-group count (the standard
    dictionary-free proxy) and sentences by terminal-punctuation
    count (floored at 1).

    Exactness: the score is computed in MILLI-units with pure integer
    arithmetic — each term one integer floor-division of exact counts
    ((1015*words) div sents, (84600*syll) div words) — then clamped
    to [0, 206835], so the 10-point band decision (div 10000) is an
    integer on both engines; no float ever feeds a boundary.  The
    three per-band rate displays divide exact integer sums once.

    Scale shape: one projection + one ~21-row hash agg; counts come
    from split/replace/regexp-extract expressions that stay inside
    whole-stage codegen — no explode, no UDF, one scan."""
    t = Tables(spark, sf_dir)
    d = t.documents.select(
        F.expr("size(split(text, ' '))").alias("words"),
        F.expr(
            "GREATEST(1, length(text)"
            " - length(replace(replace(replace(text,"
            " '.', ''), '!', ''), '?', '')))"
        ).alias("sents"),
        F.expr(
            "size(regexp_extract_all(text, '[aeiouAEIOU]+', 0))"
        ).alias("syll"),
    )
    f = d.select(
        "words",
        "sents",
        "syll",
        F.expr(
            "LEAST(206835, GREATEST(0,"
            " 206835 - (1015 * words) div sents"
            " - (84600 * syll) div words))"
        ).alias("fm"),
    )
    b = f.withColumn("band", F.expr("fm div 10000"))
    return (
        b.groupBy("band")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("words").cast("bigint").alias("total_words"),
            F.round(
                F.sum("words").cast("double") / F.sum("sents"), 6
            ).alias("avg_words_per_sentence"),
            F.round(
                F.sum("syll").cast("double") / F.sum("words"), 6
            ).alias("avg_syllables_per_word"),
            F.round(
                F.sum("fm").cast("double") / F.count("*") / 1000, 6
            ).alias("avg_flesch"),
        )
        .withColumnRenamed("band", "flesch_band")
    )


# ---------------------------------------------------------------------------
# rel_markov_transitions — first-order event-type transition matrix
# ---------------------------------------------------------------------------


@query(
    "rel_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id
               ) AS prev
        FROM events
    ),
    pair AS (
        SELECT prev AS src, event_type AS dst, COUNT(*) AS n
        FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT src, SUM(n) AS n_src FROM pair GROUP BY 1)
    SELECT p.src, p.dst,
           CAST(p.n AS BIGINT) AS n_pairs,
           CAST(t.n_src AS BIGINT) AS n_src_total,
           ROUND(CAST(p.n AS DOUBLE) / t.n_src, 6) AS p_next
    FROM pair p JOIN tot t USING (src)
    """,
)
def rel_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-ORDER EVENT-TYPE MARKOV MATRIX — P(next type | type) per
    user journey, `traj_transition_matrix`'s behavioral twin (cells
    -> event types) and the input of every next-action model /
    journey-sankey a product warehouse draws.  Output: one row per
    (src, dst) with the exact pair count, the src row total and the
    conditional probability.

    Exactness: successor pairs come from ONE LAG window totally
    ordered by (epoch_us, event_id) within each user — the
    `rel_attribution_touch` tie-break discipline — so pair counts
    are exact integers; the probability is a single shared-display
    division of two integers.

    Scale shape: the window is PARTITIONED by user_id (never global);
    one shuffle to the per-user sort, one vocab^2-bounded agg, and
    the row-total join touches only the vocab^2 pair table (AQE
    broadcasts it)."""
    t = Tables(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(
        F.unix_micros("ts"), "event_id"
    )
    seq = t.events.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    )
    pair = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy(
            F.col("prev").alias("src"),
            F.col("event_type").alias("dst"),
        )
        .agg(F.count("*").alias("n"))
    )
    tot = pair.groupBy("src").agg(F.sum("n").alias("n_src"))
    return pair.join(F.broadcast(tot), "src").select(
        "src",
        "dst",
        F.col("n").cast("bigint").alias("n_pairs"),
        F.col("n_src").cast("bigint").alias("n_src_total"),
        F.round(F.col("n").cast("double") / F.col("n_src"), 6).alias(
            "p_next"
        ),
    )


# ---------------------------------------------------------------------------
# text_template_detect — templated-document clusters via structure skeletons
# ---------------------------------------------------------------------------

_TPL_TOPN = 20


@query(
    "text_template_detect",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, text,
               regexp_replace(regexp_replace(lower(text),
                   '[0-9]+', '0', 'g'), '[a-z]+', 'a', 'g') AS tpl
        FROM documents
    ),
    g AS (
        SELECT tpl, COUNT(*) AS n_docs,
               COUNT(DISTINCT text) AS n_texts,
               MIN(doc_id) AS example_doc,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars
        FROM s GROUP BY 1
        HAVING COUNT(*) >= 2 AND COUNT(DISTINCT text) >= 2
    )
    SELECT substr(tpl, 1, 80) AS template_head,
           CAST(length(tpl) AS BIGINT) AS template_len,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_texts AS BIGINT) AS n_texts,
           CAST(example_doc AS BIGINT) AS example_doc,
           total_chars
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY n_docs DESC, tpl) AS rk
        FROM g
    ) WHERE rk <= {_TPL_TOPN}
    """,
)
def text_template_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPLATED-DOCUMENT detection — cluster documents by STRUCTURE
    SKELETON (lowercase, digit-runs -> '0', letter-runs -> 'a', so
    only punctuation/layout survives) and surface the top-20 template
    families with >= 2 docs of >= 2 DISTINCT texts: the
    machine-generated/spam-template mode that `text_exact_dedup`
    (identical text) and `text_minhash_neardup` (shared shingles)
    both miss, because template instances share structure, not
    content — a staple of LLM corpus curation beside boilerplate
    removal.

    Exactness: the skeleton is deterministic string rewriting (two
    global regexp_replace passes — ASCII classes, identical RE2/Java
    semantics); cluster stats are exact integer counts; ranking is an
    integer ROW_NUMBER decision totally ordered by (n_docs DESC, tpl)
    with BINARY string comparison on both engines (skeletons are
    ASCII).  No floats anywhere.

    Scale shape: one projection + one hash agg keyed on the skeleton
    (map-side combinable), then orderBy+limit
    (TakeOrderedAndProject) over the (small) >=2-doc cluster table —
    one scan, one shuffle on tpl."""
    t = Tables(spark, sf_dir)
    s = t.documents.select(
        "doc_id",
        "text",
        F.expr(
            "regexp_replace(regexp_replace(lower(text),"
            " '[0-9]+', '0'), '[a-z]+', 'a')"
        ).alias("tpl"),
    )
    g = (
        s.groupBy("tpl")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("text").alias("n_texts"),
            F.min("doc_id").alias("example_doc"),
            F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        )
        .filter((F.col("n_docs") >= 2) & (F.col("n_texts") >= 2))
    )
    return (
        g.orderBy(F.col("n_docs").desc(), "tpl")
        .limit(_TPL_TOPN)
        .select(
            F.expr("substr(tpl, 1, 80)").alias("template_head"),
            F.length("tpl").cast("bigint").alias("template_len"),
            F.col("n_docs").cast("bigint"),
            F.col("n_texts").cast("bigint"),
            F.col("example_doc").cast("bigint"),
            "total_chars",
        )
    )


# ---------------------------------------------------------------------------
# rel_entity_match — blocked entity resolution with rep-collapsed pair counts
# ---------------------------------------------------------------------------

_ER_LEV = 2  # max edit distance between qualifiers to call a match

_ER_FINAL = """
    block,
    CAST(n_parts AS BIGINT) AS n_parts,
    CAST(n_variants AS BIGINT) AS n_variants,
    CAST(n_exact_pairs AS BIGINT) AS n_exact_pairs,
    CAST(n_match_pairs AS BIGINT) AS n_match_pairs,
    ROUND(CAST(n_match_pairs AS DOUBLE)
          / (n_parts * (n_parts - 1) / 2), 6) AS match_density
"""


@query(
    "rel_entity_match",
    oracle=f"""
    WITH names AS (
        SELECT regexp_extract(p_name, '[^ ]+$') AS block,
               regexp_extract(p_name, '^[^ ]+') AS qual,
               p_name, COUNT(*) AS cnt
        FROM part GROUP BY 1, 2, 3
    ),
    fuzzy AS (
        SELECT a.block, SUM(a.cnt * b.cnt) AS n_fuzzy
        FROM names a JOIN names b
          ON a.block = b.block AND a.p_name < b.p_name
         AND levenshtein(a.qual, b.qual) <= {_ER_LEV}
        GROUP BY 1
    ),
    blocks AS (
        SELECT block, SUM(cnt) AS n_parts, COUNT(*) AS n_variants,
               SUM(cnt * (cnt - 1) // 2) AS n_exact_pairs
        FROM names GROUP BY 1
        HAVING SUM(cnt) >= 2
    ),
    wide AS (
        SELECT b.block, b.n_parts, b.n_variants, b.n_exact_pairs,
               b.n_exact_pairs + COALESCE(f.n_fuzzy, 0)
                   AS n_match_pairs
        FROM blocks b LEFT JOIN fuzzy f USING (block)
    )
    SELECT {_ER_FINAL} FROM wide
    """,
)
def rel_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOCKED ENTITY RESOLUTION — the classic dedupe-by-blocking
    pipeline (block on the stable token, fuzzy-match the qualifier
    with edit distance, count match pairs) that record-linkage /
    master-data systems run before any merge: parts block on their
    LAST name token, two parts match if names are equal (exact) or
    their first tokens are within Levenshtein {_ER_LEV} (fuzzy).
    Output: per block, entity count, name-variant count, exact and
    total match-pair counts, and pair density.

    Exactness: pair counting is REP-COLLAPSED onto distinct names
    (the house exact-group trick): exact pairs = C(cnt,2) per name,
    fuzzy pairs = cnt_a*cnt_b over distinct-name pairs — exact
    BIGINT sums either way, and the candidate join runs over the
    VOCAB-bounded distinct-name table, never the corpus, so a 100x
    clone cannot go quadratic.  levenshtein() is the same integer DP
    on both engines; density divides exact integers once.

    Scale shape: one distinct-name hash agg over the corpus, then a
    vocab^2-bounded self-join within blocks + one left join — the
    corpus is scanned once."""
    t = Tables(spark, sf_dir)
    names = (
        t.part.select(
            F.regexp_extract("p_name", "[^ ]+$", 0).alias("block"),
            F.regexp_extract("p_name", "^[^ ]+", 0).alias("qual"),
            "p_name",
        )
        .groupBy("block", "qual", "p_name")
        .agg(F.count("*").alias("cnt"))
    )
    a = names.select(
        "block",
        F.col("qual").alias("qa"),
        F.col("p_name").alias("na"),
        F.col("cnt").alias("ca"),
    )
    b = names.select(
        "block",
        F.col("qual").alias("qb"),
        F.col("p_name").alias("nb"),
        F.col("cnt").alias("cb"),
    )
    fuzzy = (
        a.join(b, "block")
        .filter(
            (F.col("na") < F.col("nb"))
            & (F.levenshtein("qa", "qb") <= _ER_LEV)
        )
        .groupBy("block")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("n_fuzzy"))
    )
    blocks = (
        names.groupBy("block")
        .agg(
            F.sum("cnt").alias("n_parts"),
            F.count("*").alias("n_variants"),
            F.sum(
                F.expr("cnt * (cnt - 1) div 2")
            ).alias("n_exact_pairs"),
        )
        .filter(F.col("n_parts") >= 2)
    )
    wide = blocks.join(fuzzy, "block", "left").select(
        "block",
        "n_parts",
        "n_variants",
        "n_exact_pairs",
        (
            F.col("n_exact_pairs")
            + F.coalesce(F.col("n_fuzzy"), F.lit(0))
        ).alias("n_match_pairs"),
    )
    return wide.selectExpr(*_split_top_level(_ER_FINAL))


# ---------------------------------------------------------------------------
# rel_power_mde — A/B test power analysis from exact integer moments
# ---------------------------------------------------------------------------

# z_{alpha/2}=1.96 (two-sided 5%) + z_beta=0.8416 (80% power), each an
# explicit DOUBLE literal (the sketch_hll_distinct house rule); the
# variance is Bessel-corrected from exact integer moments
_MDE_VAR = (
    "((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)"
    " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))"
)

_MDE_FINAL = f"""
    event_type,
    CAST(n AS BIGINT) AS n,
    ROUND(CAST(s AS DOUBLE) / n / 100, 6) AS mean,
    ROUND(SQRT({_MDE_VAR}) / 100, 6) AS sd,
    ROUND((CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))
          * SQRT(CAST(2 AS DOUBLE) * {_MDE_VAR} / n) / 100, 6)
        AS mde_abs,
    ROUND((CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))
          * SQRT(CAST(2 AS DOUBLE) * {_MDE_VAR} / n)
          / (CAST(s AS DOUBLE) / n), 6) AS mde_rel
"""


@query(
    "rel_power_mde",
    oracle=f"""
    WITH m AS (
        SELECT event_type, COUNT(*) AS n,
               SUM(CAST(ROUND(value * 100) AS BIGINT)) AS s,
               SUM(CAST(CAST(ROUND(value * 100) AS BIGINT)
                        AS DECIMAL(18,0))
                   * CAST(CAST(ROUND(value * 100) AS BIGINT)
                          AS DECIMAL(18,0))) AS q
        FROM events GROUP BY 1
        HAVING COUNT(*) >= 2
           AND COUNT(*) * SUM(CAST(CAST(ROUND(value * 100) AS BIGINT)
                                   AS DECIMAL(18,0))
                              * CAST(CAST(ROUND(value * 100)
                                          AS BIGINT)
                                     AS DECIMAL(18,0)))
               - CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                      AS DECIMAL(18,0))
                 * CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                        AS DECIMAL(18,0)) > 0
           AND SUM(CAST(ROUND(value * 100) AS BIGINT)) <> 0
    )
    SELECT {_MDE_FINAL} FROM m
    """,
)
def rel_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B TEST POWER ANALYSIS — the minimum detectable effect (MDE)
    at 80% power / two-sided 5% for an equal-split experiment on each
    event type's value, sized at the CURRENT sample: the
    planning-side companion of the readout family (`rel_ttest_welch`,
    `rel_cuped`, `rel_did`) — what an experimentation platform shows
    BEFORE the test runs.  MDE = (z_a/2 + z_b) * sqrt(2*var/n).

    Exactness: per-type moments (n, sum, sum-of-squares) are exact
    integers (cross terms via DECIMAL(18,0) operands widening to
    ~DECIMAL(36,0) products, the `rel_cuped` recipe);
    variance, sd and both MDE displays are ONE shared float
    projection with every literal explicitly CAST AS DOUBLE (the
    `sketch_hll_distinct` rule); integer HAVING gates (n >= 2,
    positive variance numerator, nonzero mean) kill every degenerate
    branch before a float is born.

    Scale shape: one map-side-combinable hash agg to vocab-bounded
    rows; display arithmetic on those rows only."""
    t = Tables(spark, sf_dir)
    cents = F.expr("CAST(ROUND(value * 100) AS BIGINT)")
    centd = F.expr(
        "CAST(CAST(ROUND(value * 100) AS BIGINT) AS DECIMAL(18,0))"
    )
    m = (
        t.events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents).alias("s"),
            F.sum(centd * centd).alias("q"),
        )
        .filter(
            "n >= 2 AND n * q - CAST(s AS DECIMAL(18,0))"
            " * CAST(s AS DECIMAL(18,0)) > 0 AND s <> 0"
        )
    )
    return m.selectExpr(*_split_top_level(_MDE_FINAL))


# ---------------------------------------------------------------------------
# rel_skew_profile — join-key skew diagnostics via log2 frequency bands
# ---------------------------------------------------------------------------

_SKEW_FINAL = """
    CAST(band AS BIGINT) AS freq_log2_band,
    CAST(COUNT(*) AS BIGINT) AS n_keys,
    CAST(SUM(freq) AS BIGINT) AS n_rows,
    CAST(MIN(freq) AS BIGINT) AS min_freq,
    CAST(MAX(freq) AS BIGINT) AS max_freq,
    ROUND(CAST(SUM(freq) AS DOUBLE) / MAX(total), 6) AS row_share
"""


@query(
    "rel_skew_profile",
    oracle=f"""
    WITH f AS (
        SELECT user_id, COUNT(*) AS freq FROM events GROUP BY 1
    ),
    tot AS (SELECT SUM(freq) AS total FROM f),
    b AS (
        SELECT freq, LENGTH(bin(freq)) - 1 AS band, tot.total
        FROM f, tot
    )
    SELECT {_SKEW_FINAL}
    FROM b GROUP BY 1
    """,
)
def rel_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-KEY SKEW PROFILE — the diagnostic a 100 TB shuffle plan is
    sized from: per log2 frequency band of events.user_id, how many
    keys live there, how many rows they carry, and the row share —
    the table that tells you whether `rel_join_skew_salted`'s salting
    (or AQE skew splitting) is needed BEFORE the join runs.  Joins
    the observability family (`rel_table_stats`, `rel_dq_audit`,
    `rel_equidepth_hist`).

    Exactness: the band is INTEGER log2 via LENGTH(bin(freq)) - 1 —
    the `sketch_hll_distinct` rank idiom, no float log; counts are
    exact; the share divides exact integers once.

    Scale shape: one map-side-combinable key-count agg, then a
    ~32-row band rollup with a broadcast 1-row total — the canonical
    two-level aggregation, linear and skew-immune itself (the inner
    agg keys on the skewed column but map-side combine flattens
    it)."""
    t = Tables(spark, sf_dir)
    f = t.events.groupBy("user_id").agg(F.count("*").alias("freq"))
    tot = f.agg(F.sum("freq").alias("total"))
    b = f.join(F.broadcast(tot)).select(
        "freq",
        F.expr("LENGTH(bin(freq)) - 1").alias("band"),
        "total",
    )
    return (
        b.groupBy("band")
        .agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("freq").cast("bigint").alias("n_rows"),
            F.min("freq").cast("bigint").alias("min_freq"),
            F.max("freq").cast("bigint").alias("max_freq"),
            F.round(
                F.sum("freq").cast("double") / F.max("total"), 6
            ).alias("row_share"),
        )
        .withColumnRenamed("band", "freq_log2_band")
    )


# ---------------------------------------------------------------------------
# emb_silhouette — per-label clustering quality from integer distances
# ---------------------------------------------------------------------------

# coordinates quantized ONCE to 1e4 ints; label centroids quantized
# ONCE to the 1e6 scale (ROUND(S*100/n) — the text_zipf_fit
# quantize-once recipe, identical expression text on both engines);
# from there every squared distance is an exact BIGINT and the
# nearest-other-label argmin is an integer (d2, label) decision
_SIL_FINAL = """
    CAST(label AS INT) AS label,
    CAST(n_vecs AS BIGINT) AS n_vecs,
    ROUND(CAST(sum_a AS DOUBLE) / n_vecs / 1e12, 6) AS mean_intra_d2,
    ROUND(CAST(sum_b AS DOUBLE) / n_vecs / 1e12, 6) AS mean_nearest_d2,
    ROUND(CAST(sum_s AS DOUBLE) / n_vecs / 1e9, 6) + 0.0 AS mean_silhouette
"""


@query(
    "emb_silhouette",
    oracle=f"""
    WITH ev AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) - 1 AS i,
               CAST(ROUND(UNNEST(embedding) * 1e4) AS BIGINT) AS q
        FROM embeddings
    ),
    cent AS (
        SELECT label AS cl, i,
               CAST(ROUND(CAST(SUM(q) AS DOUBLE) * 100 / COUNT(*))
                    AS BIGINT) AS c
        FROM ev GROUP BY 1, 2
    ),
    d2 AS (
        SELECT ev.vec_id, ev.label, cent.cl,
               SUM((ev.q * 100 - cent.c) * (ev.q * 100 - cent.c))
                   AS d2
        FROM ev JOIN cent ON cent.i = ev.i
        GROUP BY 1, 2, 3
    ),
    ab AS (
        SELECT vec_id, label,
               MIN(CASE WHEN cl = label THEN d2 END) AS a,
               MIN(CASE WHEN cl <> label THEN d2 END) AS b
        FROM d2 GROUP BY 1, 2
    ),
    s AS (
        SELECT label, a, b,
               CAST(ROUND((CAST(b AS DOUBLE) - a)
                          * 1e9 / GREATEST(a, b, 1))
                    AS BIGINT) AS sq
        FROM ab
    )
    SELECT {_SIL_FINAL}
    FROM (
        SELECT label, COUNT(*) AS n_vecs, SUM(a) AS sum_a,
               SUM(b) AS sum_b, SUM(sq) AS sum_s
        FROM s GROUP BY 1
    )
    """,
)
def emb_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMPLIFIED SILHOUETTE per label — the clustering-quality score
    every embedding pipeline reads before trusting its labels
    (centroid-based silhouette, Rousseeuw'87 simplified form):
    a(v) = squared distance to OWN label centroid, b(v) = squared
    distance to the NEAREST other centroid, s = (b-a)/max(a,b);
    per label the mean intra / nearest-other distances and mean s.

    Exactness: coordinates quantized ONCE to 1e4 ints, centroids
    quantized ONCE to the 1e6 scale (ROUND(S*100/n) — the
    `text_zipf_fit` recipe, same expression text both engines); every
    d2 is then an exact BIGINT (|diff| <= ~1.2e6, x64 dims ~ 1e14),
    the nearest-other argmin is an integer MIN, per-vector s is
    quantized ONCE to integer nano-units via single-arg
    ROUND(s * 1e9) (the `rel_holt_winters` recipe — the two-arg
    ROUND(x, 9) form risks the cross-engine one-ulp tie) and summed
    as exact BIGINTs; displays divide once.

    Scale shape: the distance pass is an explode-join against the
    BROADCAST 640-row centroid table, map-side combinable on
    (vec, label) — corpus-linear with a labels-x-dims fan-out, no
    vector ever compares to another vector (the all-pairs silhouette
    is quadratic; the centroid form is the one that ships)."""
    t = Tables(spark, sf_dir)
    ev = t.embeddings.select(
        "vec_id",
        "label",
        F.posexplode(
            F.expr(
                "transform(embedding,"
                " x -> CAST(ROUND(x * 1e4) AS BIGINT))"
            )
        ).alias("i", "q"),
    )
    cent = ev.groupBy(F.col("label").alias("cl"), "i").agg(
        F.expr(
            "CAST(ROUND(CAST(SUM(q) AS DOUBLE) * 100 / COUNT(*))"
            " AS BIGINT)"
        ).alias("c")
    )
    d2 = (
        ev.join(F.broadcast(cent), "i")
        .groupBy("vec_id", "label", "cl")
        .agg(
            F.sum(
                (F.col("q") * 100 - F.col("c"))
                * (F.col("q") * 100 - F.col("c"))
            ).alias("d2")
        )
    )
    ab = d2.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("cl") == F.col("label"), F.col("d2"))).alias(
            "a"
        ),
        F.min(F.when(F.col("cl") != F.col("label"), F.col("d2"))).alias(
            "b"
        ),
    )
    s = ab.select(
        "label",
        "a",
        "b",
        F.expr(
            "CAST(ROUND((CAST(b AS DOUBLE) - a)"
            " * 1e9 / GREATEST(a, b, 1)) AS BIGINT)"
        ).alias("sq"),
    )
    roll = s.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.sum("a").alias("sum_a"),
        F.sum("b").alias("sum_b"),
        F.sum("sq").alias("sum_s"),
    )
    return roll.selectExpr(*_split_top_level(_SIL_FINAL))


# ---------------------------------------------------------------------------
# text_source_overlap — cross-source shingle containment matrix
# ---------------------------------------------------------------------------

_OVL_N = 5  # shingle length (tokens)

_OVL_FINAL = """
    src_a, src_b,
    CAST(n_a AS BIGINT) AS n_grams_a,
    CAST(n_b AS BIGINT) AS n_grams_b,
    CAST(n_inter AS BIGINT) AS n_shared,
    ROUND(CAST(n_inter AS DOUBLE) / n_a, 6) AS containment_a,
    ROUND(CAST(n_inter AS DOUBLE) / n_b, 6) AS containment_b,
    ROUND(CAST(n_inter AS DOUBLE) / (n_a + n_b - n_inter), 6)
        AS jaccard
"""


@query(
    "text_source_overlap",
    oracle=f"""
    WITH toks AS (
        SELECT source, string_split(text, ' ') AS l FROM documents
    ),
    grams AS (
        SELECT DISTINCT source,
               array_to_string(list_slice(t.l, s.i, s.i + {_OVL_N - 1}),
                               ' ') AS g
        FROM toks t,
             UNNEST(generate_series(1, len(t.l) - {_OVL_N - 1}))
                 AS s(i)
    ),
    sizes AS (SELECT source, COUNT(*) AS sz FROM grams GROUP BY 1),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b,
               COUNT(*) AS n_inter
        FROM grams a JOIN grams b
          ON a.g = b.g AND a.source < b.source
        GROUP BY 1, 2
    ),
    wide AS (
        SELECT i.src_a, i.src_b, i.n_inter,
               sa.sz AS n_a, sb.sz AS n_b
        FROM inter i
        JOIN sizes sa ON sa.source = i.src_a
        JOIN sizes sb ON sb.source = i.src_b
    )
    SELECT {_OVL_FINAL} FROM wide
    """,
)
def text_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-SOURCE SHINGLE OVERLAP MATRIX — which corpus sources
    duplicate each other: per source pair, the exact count of shared
    distinct 5-token shingles with both containments and the Jaccard
    — the diagnostic a curation pipeline reads to decide which
    source to DROP (high containment_a means source a is mostly
    inside b), upstream of any per-document dedup
    (`text_minhash_neardup` finds the pairs; this names the
    source-level cause).

    Exactness: distinct (source, shingle) sets are exact; the
    intersection join counts exact integers; the three ratios are
    one shared display projection.

    Scale shape: one shingle explode (pre-repartitioned corpus) to a
    distinct hash agg; the intersection join keys on the shingle with
    fan-out bounded by sources-sharing-the-gram (<= |sources|^2 per
    gram, 20 sources here); output is the <= |sources|^2/2 pair
    matrix.  Never doc x doc."""
    t = Tables(spark, sf_dir)
    toks = (
        t.documents.select("source", "text")
        .repartition(spark.sparkContext.defaultParallelism, "source", "text")
        .select("source", F.split("text", " ").alias("l"))
        # shorter-than-shingle docs: sequence(1, len-4) would count
        # DOWN through 0 and slice(l, 0, .) throws — the floor-corpus
        # bug class §5.2(8) already catalogued; DuckDB's
        # generate_series(1, 0) is empty so only Spark needs the gate
        .filter(F.size("l") >= _OVL_N)
    )
    grams = (
        toks.select(
            "source",
            F.explode(
                F.sequence(
                    F.lit(1), F.size("l") - F.lit(_OVL_N - 1)
                )
            ).alias("i"),
            "l",
        )
        .select(
            "source",
            F.expr(
                f"array_join(slice(l, i, {_OVL_N}), ' ')"
            ).alias("g"),
        )
        .distinct()
        # the distinct gram set feeds 3 consumers (both join sides +
        # sizes): stage it once so the shingle explode runs ONCE (the
        # extras2 word-shingle staging precedent)
        .localCheckpoint()
    )
    sizes = grams.groupBy("source").agg(F.count("*").alias("sz"))
    a = grams.select(F.col("source").alias("src_a"), "g")
    b = grams.select(F.col("source").alias("src_b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_inter"))
    )
    wide = inter.join(
        F.broadcast(
            sizes.select(
                F.col("source").alias("src_a"), F.col("sz").alias("n_a")
            )
        ),
        "src_a",
    ).join(
        F.broadcast(
            sizes.select(
                F.col("source").alias("src_b"), F.col("sz").alias("n_b")
            )
        ),
        "src_b",
    )
    return wide.selectExpr(*_split_top_level(_OVL_FINAL))


# ---------------------------------------------------------------------------
# rel_holt_winters — window-truncated additive Holt-Winters (season 7)
# ---------------------------------------------------------------------------

_HW_W = 14  # restart window (2 full seasons); alpha = beta = gamma = 1/2
# W=14 keeps D = 2^26 and max|numerator| = 2^25, so si (<= ~1e9 micro)
# terms stay ~5e17 with ~20x int64 headroom; W=21 would push D to 2^40
# and overflow — measured in _hw_coeffs' own rational simulation
_HW_M = 7  # season length (weekday)


def _hw_coeffs() -> tuple[int, list[int], list[int], list[int]]:
    """Exact integer Holt-Winters coefficients (the `rel_holt_linear`
    rational-simulation recipe extended with a seasonal state ring):
    simulate the additive alpha=beta=gamma=1/2 recurrence over a W-day
    restart window (l_0 = y_oldest, b_0 = 0, s_* = 0) in exact
    Fractions, each state a coefficient vector over the W inputs, then
    clear denominators.  Returns (D, level_num, trend_num,
    season_next_num) with index j = days-ago lag; every state is a
    FIXED linear combination of the window's values, so the whole
    statistic is one explode + equi-join + integer sum."""
    from fractions import Fraction
    from math import lcm

    w, m = _HW_W, _HW_M
    zero = [Fraction(0)] * w
    lv = list(zero)
    tr = list(zero)
    seas = [list(zero) for _ in range(m)]
    lv[0] = Fraction(1)
    for i in range(1, w):
        y = [Fraction(1 if k == i else 0) for k in range(w)]
        sp = seas[i % m]
        ln = [(y[k] - sp[k] + lv[k] + tr[k]) / 2 for k in range(w)]
        tn = [(ln[k] - lv[k] + tr[k]) / 2 for k in range(w)]
        sn = [(y[k] - ln[k] + sp[k]) / 2 for k in range(w)]
        lv, tr, seas[i % m] = ln, tn, sn
    s_next = seas[w % m]
    d = lcm(*[c.denominator for c in lv + tr + s_next])
    nl = [int(lv[w - 1 - j] * d) for j in range(w)]
    nb = [int(tr[w - 1 - j] * d) for j in range(w)]
    ns = [int(s_next[w - 1 - j] * d) for j in range(w)]
    return d, nl, nb, ns


_HW_D, _HW_NL, _HW_NB, _HW_NS = _hw_coeffs()


def _hw_oracle() -> str:
    from .series import _GRID_SQL

    w = _HW_W
    nl = ", ".join(str(x) for x in _HW_NL)
    nb = ", ".join(str(x) for x in _HW_NB)
    ns = ", ".join(str(x) for x in _HW_NS)
    return f"""
    WITH {_GRID_SQL},
    contrib AS (
        SELECT g.user_id, g.dy + j.j AS dy,
               g.si * ([{nl}][j.j + 1]) AS lterm,
               g.si * ([{nb}][j.j + 1]) AS bterm,
               g.si * ([{ns}][j.j + 1]) AS sterm
        FROM grid g
        CROSS JOIN (SELECT UNNEST(generate_series(0, {w - 1})) AS j) j
    ),
    win AS (
        SELECT c.user_id, c.dy,
               CAST(SUM(c.lterm) AS BIGINT) AS lnum,
               CAST(SUM(c.bterm) AS BIGINT) AS bnum,
               CAST(SUM(c.sterm) AS BIGINT) AS snum,
               COUNT(*) AS k
        FROM contrib c JOIN grid t
          ON t.user_id = c.user_id AND t.dy = c.dy
        GROUP BY 1, 2
        HAVING COUNT(*) = {w}
    )
    SELECT user_id, dy,
           CAST(CAST(ROUND(CAST(lnum AS DOUBLE) / {_HW_D})
                     AS BIGINT) AS DOUBLE) / 1e6 AS level,
           CAST(CAST(ROUND(CAST(bnum AS DOUBLE) / {_HW_D})
                     AS BIGINT) AS DOUBLE) / 1e6 AS trend,
           CAST(CAST(ROUND(CAST(snum AS DOUBLE) / {_HW_D})
                     AS BIGINT) AS DOUBLE) / 1e6 AS season_next,
           CAST(CAST(ROUND(CAST(lnum + bnum + snum AS DOUBLE)
                           / {_HW_D}) AS BIGINT) AS DOUBLE) / 1e6
               AS forecast
    FROM win
    """


@query("rel_holt_winters", oracle=_hw_oracle)
def rel_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADDITIVE HOLT-WINTERS (level + trend + weekday seasonality) per
    user over the dense daily grid — `rel_holt_linear` upgraded with
    the season-7 state ring: the forecast shape that actually pages
    on weekly-periodic product metrics.  alpha = beta = gamma = 1/2
    over a 14-day (2-season) restart window; forecast = l + b +
    s_nextweekday.

    Exactness: the three-state recurrence (with its m=7 seasonal ring)
    is simulated ONCE in exact rational arithmetic and cleared to
    integer numerators over D = 2^26; each day contributes
    si * n_j as BIGINT (14-term sums ~5e17, 20x int64 headroom); the four
    outputs are single final float expressions (+0.0 on the
    sign-crossing three).

    Scale shape: identical to `rel_holt_linear` — truncation turns
    the sequential recurrence into a FIXED 21-tap linear filter: one
    explode (fan-out exactly W), one equi-join on the (user, day)
    key, one integer-sum agg; an untruncated backward recurrence
    would serialize each user's history."""
    from .series import _daily_grid

    w = _HW_W
    t = Tables(spark, sf_dir)
    grid = _daily_grid(t)
    nl = F.array(*[F.lit(x).cast("long") for x in _HW_NL])
    nb = F.array(*[F.lit(x).cast("long") for x in _HW_NB])
    ns = F.array(*[F.lit(x).cast("long") for x in _HW_NS])
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
        (F.col("si") * F.element_at(ns, F.col("j") + 1)).alias("sterm"),
    )
    win = (
        contrib.join(grid.select("user_id", "dy"), ["user_id", "dy"])
        .groupBy("user_id", "dy")
        .agg(
            F.sum("lterm").alias("lnum"),
            F.sum("bterm").alias("bnum"),
            F.sum("sterm").alias("snum"),
            F.count("*").alias("k"),
        )
        .filter(F.col("k") == w)
    )
    # displays: snum / 2^26 is an EXACT double (pure exponent shift),
    # so the single-arg ROUND decision is unambiguous on both engines;
    # the integer micro-units then divide by 1e6 identically — this
    # sidesteps the engines' 2-arg ROUND(x, 6) disagreeing by one ulp
    # of the 6th decimal (hit once at sf0.1)
    def disp(col: F.Column, name: str) -> F.Column:
        return (
            F.expr(
                f"CAST(CAST(ROUND(CAST({col} AS DOUBLE) / {_HW_D})"
                f" AS BIGINT) AS DOUBLE) / 1e6"
            )
        ).alias(name)

    return win.select(
        "user_id",
        "dy",
        disp("lnum", "level"),
        disp("bnum", "trend"),
        disp("snum", "season_next"),
        disp("lnum + bnum + snum", "forecast"),
    )


# ---------------------------------------------------------------------------
# sketch_ams_f2 — AMS/tug-of-war second frequency moment sketch
# ---------------------------------------------------------------------------

_AMS_J = 32  # counters: 4 groups x 8 (mean of 8, pseudo-median of 4)

_AMS_FINAL = """
    CAST(n_rows AS BIGINT) AS n_rows,
    CAST(n_keys AS BIGINT) AS n_keys,
    CAST(f2_true AS BIGINT) AS f2_true,
    CAST(g1 AS BIGINT) AS g1,
    CAST(g2 AS BIGINT) AS g2,
    CAST(g3 AS BIGINT) AS g3,
    CAST(g4 AS BIGINT) AS g4,
    ROUND((CAST(g1 AS DOUBLE) + g2 + g3 + g4
           - GREATEST(g1, g2, g3, g4) - LEAST(g1, g2, g3, g4))
          / 2 / 8, 6) AS f2_est,
    ROUND(((CAST(g1 AS DOUBLE) + g2 + g3 + g4
            - GREATEST(g1, g2, g3, g4) - LEAST(g1, g2, g3, g4))
           / 2 / 8 - f2_true) / f2_true, 6) + 0.0 AS rel_err
"""


@query(
    "sketch_ams_f2",
    oracle=f"""
    WITH h AS (
        SELECT user_id, j.j,
               CASE WHEN CAST(('0x' || substr(md5(CAST(user_id
                                                       AS VARCHAR)
                                                  || '@'
                                                  || CAST(j.j
                                                          AS VARCHAR)),
                                              1, 8)) AS BIGINT)
                         % 2 = 0
                    THEN 1 ELSE -1 END AS sg
        FROM events,
             (SELECT UNNEST(range(0, {_AMS_J})) AS j) j
    ),
    c AS (SELECT j, SUM(sg) AS cj FROM h GROUP BY 1),
    g AS (
        SELECT j // 8 AS grp, SUM(cj * cj) AS gs
        FROM c GROUP BY 1
    ),
    truth AS (
        SELECT SUM(f) AS n_rows, COUNT(*) AS n_keys,
               SUM(f * f) AS f2_true
        FROM (SELECT user_id, COUNT(*) AS f FROM events GROUP BY 1)
    ),
    wide AS (
        SELECT truth.n_rows, truth.n_keys, truth.f2_true,
               MIN(CASE WHEN grp = 0 THEN gs END) AS g1,
               MIN(CASE WHEN grp = 1 THEN gs END) AS g2,
               MIN(CASE WHEN grp = 2 THEN gs END) AS g3,
               MIN(CASE WHEN grp = 3 THEN gs END) AS g4
        FROM g, truth
        GROUP BY 1, 2, 3
    )
    SELECT {_AMS_FINAL} FROM wide
    """,
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS (tug-of-war) SECOND-MOMENT SKETCH — F2 = sum of squared key
    frequencies (self-join size / skew in one number), the classic
    Alon-Matias-Szegedy estimator that completes the sketch family
    (HLL = F0, CMS = point freq, KMV = distinct, AMS = F2): 32 signed
    counters c_j = sum over rows of +-1 (md5-parity sign per (key, j)),
    each c_j^2 estimates F2; mean of 8 within each of 4 groups,
    pseudo-median across groups (the drop-min/max middle mean — an
    exact-integer selection, no float median).

    Exactness: signs are integer md5 parity (the HLL hash idiom, '@j'
    salt); counters and their squares are exact BIGINTs (|c_j| <= n
    rows, squares <= 1e14 at 100x — headroom); group sums are
    integers, the drop-min/max selection is GREATEST/LEAST on
    integers, and the /2/8 normalization is one final float display;
    true F2 is an exact integer for the accuracy read-off.

    Scale shape: the canonical mergeable sketch — one rows x 32
    explode into a 32-row map-side-combinable SUM (partition sketches
    merge by addition), plus one exact key-count agg for truth; O(J)
    state, one scan each."""
    t = Tables(spark, sf_dir)
    grid = spark.range(_AMS_J).select(F.col("id").alias("j"))
    h = t.events.select("user_id").join(F.broadcast(grid)).select(
        "j",
        F.expr(
            "CASE WHEN CAST(conv(substr(md5(concat("
            "CAST(user_id AS STRING), '@', CAST(j AS STRING))),"
            " 1, 8), 16, 10) AS BIGINT) % 2 = 0"
            " THEN 1 ELSE -1 END"
        ).alias("sg"),
    )
    c = h.groupBy("j").agg(F.sum("sg").alias("cj"))
    g = c.groupBy(F.expr("j div 8").alias("grp")).agg(
        F.sum(F.col("cj") * F.col("cj")).alias("gs")
    )
    truth = (
        t.events.groupBy("user_id")
        .agg(F.count("*").alias("f"))
        .agg(
            F.sum("f").alias("n_rows"),
            F.count("*").alias("n_keys"),
            F.sum(F.col("f") * F.col("f")).alias("f2_true"),
        )
    )
    wide = (
        g.agg(
            *[
                F.min(F.when(F.col("grp") == i, F.col("gs"))).alias(
                    f"g{i + 1}"
                )
                for i in range(4)
            ]
        )
        .join(F.broadcast(truth))
    )
    return wide.selectExpr(*_split_top_level(_AMS_FINAL))


# ---------------------------------------------------------------------------
# text_decontaminate_apply — drop training docs overlapping the held-out set
# ---------------------------------------------------------------------------

_DECON_N = 5  # word-shingle length (matches text_contamination)

_DECON_FINAL = """
    source,
    CAST(n_docs AS BIGINT) AS n_docs,
    CAST(n_dropped AS BIGINT) AS n_dropped,
    CAST(n_docs - n_dropped AS BIGINT) AS n_kept,
    CAST(dropped_chars AS BIGINT) AS dropped_chars,
    CAST(total_chars - dropped_chars AS BIGINT) AS kept_chars,
    ROUND(CAST(n_dropped AS DOUBLE) / n_docs, 6) AS drop_rate
"""


@query(
    "text_decontaminate_apply",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, source,
               array_to_string(list_slice(toks, i, i + {_DECON_N - 1}),
                               ' ') AS shingle
        FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
              FROM documents) d,
             LATERAL (SELECT UNNEST(generate_series(
                          1, LEN(toks) - {_DECON_N - 1})) AS i) g
    ),
    test AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
    hitdocs AS (
        SELECT DISTINCT sh.doc_id
        FROM sh JOIN test USING (shingle)
        WHERE sh.source <> 'src0'
    ),
    agg AS (
        SELECT d.source, COUNT(*) AS n_docs,
               SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                   AS n_dropped,
               SUM(CASE WHEN h.doc_id IS NOT NULL
                        THEN length(d.text) ELSE 0 END)
                   AS dropped_chars,
               SUM(length(d.text)) AS total_chars
        FROM documents d LEFT JOIN hitdocs h USING (doc_id)
        WHERE d.source <> 'src0'
        GROUP BY 1
    )
    SELECT {_DECON_FINAL} FROM agg
    """,
)
def text_decontaminate_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BENCHMARK DECONTAMINATION APPLIED — `text_contamination` audits
    how much held-out content leaks into the corpus; this op executes
    the standard cure on the TRAINING side: any training document
    sharing even ONE word 5-gram with the held-out split (source
    'src0') is DROPPED (the strict n-gram decontamination rule LLM
    corpora apply before training), and the per-source accounting
    (docs/chars dropped vs kept, drop rate) is the table a dataset
    card publishes.

    Exactness: the drop decision is a DISTINCT semi-join on the
    shingle string — pure set membership, no floats; all stats are
    exact integer counts; the rate divides once.

    Scale shape: the held-out shingle set is benchmark-sized and
    BROADCASTS; training shingles stream past it (one explode, one
    distinct hit-doc semi-join), then one per-source agg over the
    corpus joined with the (small) hit-doc list — the train corpus is
    scanned twice (shingle pass + accounting pass), never joined to
    itself."""
    from .text_ext import _word_shingles

    t = Tables(spark, sf_dir)
    sh = _word_shingles(t.documents, _DECON_N)
    test = (
        sh.filter(F.col("source") == "src0")
        .select("shingle")
        .distinct()
    )
    hitdocs = (
        sh.filter(F.col("source") != "src0")
        .join(F.broadcast(test), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    agg = (
        t.documents.filter(F.col("source") != "src0")
        .join(hitdocs, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_dropped"),
            F.sum(
                F.when(F.col("hit") == 1, F.length("text")).otherwise(0)
            ).alias("dropped_chars"),
            F.sum(F.length("text")).alias("total_chars"),
        )
    )
    return agg.selectExpr(*_split_top_level(_DECON_FINAL))


# ---------------------------------------------------------------------------
# rel_forecast_eval — rolling one-step backtest of the Holt filter
# ---------------------------------------------------------------------------

_FE_FINAL = """
    CAST(n_evals AS BIGINT) AS n_evals,
    ROUND(CAST(err_sum AS DOUBLE) / n_evals / {d} / 1e6, 6) AS mae,
    ROUND(CAST(naive_sum AS DOUBLE) / n_evals / {d} / 1e6, 6)
        AS mae_naive,
    ROUND(1 - CAST(err_sum AS DOUBLE) / CAST(naive_sum AS DOUBLE), 6)
        + 0.0 AS skill
"""


def _fe_oracle() -> str:
    from .extras5 import _HOLT_D, _HOLT_NB, _HOLT_NL, _HOLT_W
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
    ),
    ev AS (
        SELECT w.user_id, w.dy,
               ABS(CAST(w.lnum + w.bnum AS DECIMAL(38,0))
                   - CAST(nxt.si AS DECIMAL(38,0)) * {_HOLT_D})
                   AS err_num,
               ABS(CAST(cur.si AS DECIMAL(38,0))
                   - CAST(nxt.si AS DECIMAL(38,0))) * {_HOLT_D}
                   AS naive_num
        FROM win w
        JOIN grid nxt ON nxt.user_id = w.user_id
                     AND nxt.dy = w.dy + 1
        JOIN grid cur ON cur.user_id = w.user_id
                     AND cur.dy = w.dy
    ),
    agg AS (
        SELECT COUNT(*) AS n_evals,
               SUM(err_num) AS err_sum,
               SUM(naive_num) AS naive_sum
        FROM ev
        HAVING COUNT(*) >= 1 AND SUM(naive_num) > 0
    )
    SELECT {_FE_FINAL.format(d=_HOLT_D)} FROM agg
    """


@query("rel_forecast_eval", oracle=_fe_oracle)
def rel_forecast_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLING-ORIGIN ONE-STEP BACKTEST of the Holt forecaster — the
    evaluation loop an ML-ops pipeline runs before trusting
    `rel_holt_linear` in an alert path: at every day t with a complete
    12-day window AND a next grid day, compare forecast(t+1) =
    level+trend against the actual, report MAE, the persistence
    (naive last-value) MAE, and the skill score 1 − MAE/MAE_naive.

    Exactness: both error terms are EXACT integers on the common
    D-scaled micro grid — |lnum+bnum − si_next·D| and
    |si_t − si_next|·D (si·D ≈ 4e15 per term, summed in
    DECIMAL(38,0) — int64 would overflow on the corpus sum); the
    HAVING gates (≥1 eval, nonzero naive error) are integer; the
    three displays divide once (`+ 0.0` on skill — it crosses zero).

    Scale shape: the same fixed-tap linear filter as the forecaster
    (one explode + equi-join + agg), plus two dense-grid equi-joins
    for the actuals and one 1-row agg — everything shuffles on the
    (user, day) key the daily rollup already produced."""
    from .extras5 import _HOLT_D, _HOLT_NB, _HOLT_NL, _HOLT_W
    from .series import _daily_grid

    w = _HOLT_W
    t = Tables(spark, sf_dir)
    grid = _daily_grid(t).localCheckpoint()
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
    nxt = grid.select(
        "user_id",
        (F.col("dy") - 1).alias("dy"),
        F.col("si").alias("si_next"),
    )
    cur = grid.select("user_id", "dy", F.col("si").alias("si_cur"))
    ev = (
        win.join(nxt, ["user_id", "dy"])
        .join(cur, ["user_id", "dy"])
        .select(
            F.abs(
                (F.col("lnum") + F.col("bnum")).cast("decimal(38,0)")
                - F.col("si_next").cast("decimal(38,0)") * _HOLT_D
            ).alias("err_num"),
            (
                F.abs(
                    F.col("si_cur").cast("decimal(38,0)")
                    - F.col("si_next").cast("decimal(38,0)")
                )
                * _HOLT_D
            ).alias("naive_num"),
        )
    )
    agg = ev.agg(
        F.count("*").alias("n_evals"),
        F.sum("err_num").alias("err_sum"),
        F.sum("naive_num").alias("naive_sum"),
    ).filter("n_evals >= 1 AND naive_sum > 0")
    return agg.selectExpr(*_split_top_level(_FE_FINAL.format(d=_HOLT_D)))


# ---------------------------------------------------------------------------
# pipe_mix_dedup_aware — duplicate-aware training-mix accounting
# ---------------------------------------------------------------------------

_MIX_FINAL = """
    source,
    CAST(n_docs AS BIGINT) AS n_docs,
    CAST(n_dup_docs AS BIGINT) AS n_dup_docs,
    CAST(raw_tokens AS BIGINT) AS raw_tokens,
    CAST(eff_tokens_micro AS BIGINT) AS eff_tokens_micro,
    ROUND(CAST(eff_tokens_micro AS DOUBLE) / 1e6, 6) AS eff_tokens,
    ROUND(CAST(raw_tokens AS DOUBLE)
          / (CAST(eff_tokens_micro AS DOUBLE) / 1e6), 6)
        AS dup_inflation
"""


@query(
    "pipe_mix_dedup_aware",
    oracle=f"""
    WITH g AS (
        SELECT text, COUNT(*) AS cnt FROM documents GROUP BY 1
    ),
    d AS (
        SELECT doc.source,
               len(string_split(doc.text, ' ')) AS toks,
               g.cnt
        FROM documents doc JOIN g USING (text)
    ),
    agg AS (
        SELECT source, COUNT(*) AS n_docs,
               SUM(CASE WHEN cnt >= 2 THEN 1 ELSE 0 END) AS n_dup_docs,
               SUM(toks) AS raw_tokens,
               SUM(toks * (1000000 // cnt)) AS eff_tokens_micro
        FROM d GROUP BY 1
        HAVING SUM(toks) >= 1
    )
    SELECT {_MIX_FINAL} FROM agg
    """,
)
def pipe_mix_dedup_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DUPLICATE-AWARE TRAINING-MIX ACCOUNTING — the table a mixture
    designer reads INSTEAD of raw token counts: every exact-duplicate
    group contributes its tokens once (each copy weighted 1/cnt), so
    per source you get raw vs EFFECTIVE tokens and the duplication
    inflation factor — the number that tells you a source's apparent
    size is x1.8 hot air before `pipe_mix_sources` allocates epochs
    to it.  Complements `text_exact_dedup` (which picks survivors):
    this op keeps every copy but DOWNWEIGHTS, the epoch-equivalent
    accounting LLaMA-style mixes use.

    Exactness: group sizes and token counts are exact integers; the
    per-doc weight is ONE integer floor division (1e6 div cnt,
    micro-units) so effective tokens are exact BIGINT sums; the two
    displays divide once.

    Scale shape: one text-keyed hash agg (the rep-collapse key), one
    join back (fan-out = group size, i.e. corpus-linear), one
    per-source rollup — never doc x doc."""
    t = Tables(spark, sf_dir)
    g = t.documents.groupBy("text").agg(F.count("*").alias("cnt"))
    d = t.documents.select(
        "source", "text", F.expr("size(split(text, ' '))").alias("toks")
    ).join(g, "text")
    agg = (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(F.col("cnt") >= 2, 1).otherwise(0)).alias(
                "n_dup_docs"
            ),
            F.sum("toks").alias("raw_tokens"),
            F.sum(
                F.col("toks") * F.expr("1000000 div cnt")
            ).alias("eff_tokens_micro"),
        )
        .filter("raw_tokens >= 1")
    )
    return agg.selectExpr(*_split_top_level(_MIX_FINAL))


# ---------------------------------------------------------------------------
# rel_cohort_ltv — cumulative cohort revenue (LTV) curves
# ---------------------------------------------------------------------------

_LTV_MAX_AGE = 8  # weeks of age tracked per cohort

_LTV_FINAL = """
    CAST(cohort_week AS BIGINT) AS cohort_week,
    CAST(age_week AS BIGINT) AS age_week,
    CAST(n_users AS BIGINT) AS cohort_size,
    ROUND(CAST(rev_cents AS DOUBLE) / 100, 6) AS week_revenue,
    ROUND(CAST(cum_cents AS DOUBLE) / 100, 6) AS cum_revenue,
    ROUND(CAST(cum_cents AS DOUBLE) / 100 / n_users, 6) AS ltv_per_user
"""


@query(
    "rel_cohort_ltv",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_type,
               CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 86400e6)
                    AS BIGINT) // 7 AS wk,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    cohort AS (
        SELECT user_id, MIN(wk) AS cohort_week FROM ev GROUP BY 1
    ),
    sizes AS (
        SELECT cohort_week, COUNT(*) AS n_users FROM cohort GROUP BY 1
    ),
    rev AS (
        SELECT c.cohort_week, ev.wk - c.cohort_week AS age_week,
               SUM(ev.cents) AS rev_cents
        FROM ev JOIN cohort c USING (user_id)
        WHERE ev.event_type = 'purchase'
          AND ev.wk - c.cohort_week BETWEEN 0 AND {_LTV_MAX_AGE}
        GROUP BY 1, 2
    ),
    grid AS (
        SELECT s.cohort_week, g.age_week, s.n_users,
               COALESCE(r.rev_cents, 0) AS rev_cents
        FROM sizes s
        CROSS JOIN (SELECT UNNEST(generate_series(0, {_LTV_MAX_AGE}))
                        AS age_week) g
        LEFT JOIN rev r ON r.cohort_week = s.cohort_week
                       AND r.age_week = g.age_week
    ),
    cum AS (
        SELECT *, SUM(rev_cents) OVER (
                   PARTITION BY cohort_week ORDER BY age_week
               ) AS cum_cents
        FROM grid
    )
    SELECT {_LTV_FINAL} FROM cum
    """,
)
def rel_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHORT LTV CURVES — cumulative purchase revenue per signup-week
    cohort by age week, per-user: THE companion table of
    `rel_retention` (which counts the users; this follows the money)
    and the grid every growth model is fit against.  Cohort = the
    user's first-event week; ages 0..8 are DENSIFIED (zero-revenue
    weeks appear explicitly — an LTV curve with holes misleads), and
    the running sum yields cumulative revenue and LTV per cohort
    user.

    Exactness: weeks are integer floor-divisions of epoch days;
    revenue sums exact centi BIGINTs; the cumulative window runs over
    the DENSIFIED 9-row age frame per cohort (bounded by construction
    — never a corpus-sized window); the three displays divide once.

    Scale shape: one user_id agg for cohorts, one broadcast-sized
    (cohort, age) revenue agg, a 9x dense grid on the tiny cohort
    table, one bounded window — the events table is scanned twice
    (cohort pass + revenue pass), shuffled on user_id once."""
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "user_id",
        "event_type",
        F.expr(
            "CAST(FLOOR(unix_micros(ts) / 86400e6) AS BIGINT) div 7"
        ).alias("wk"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
    )
    cohort = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(
        F.count("*").alias("n_users")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(cohort, "user_id")
        .withColumn("age_week", F.col("wk") - F.col("cohort_week"))
        .filter(
            (F.col("age_week") >= 0)
            & (F.col("age_week") <= _LTV_MAX_AGE)
        )
        .groupBy("cohort_week", "age_week")
        .agg(F.sum("cents").alias("rev_cents"))
    )
    grid = (
        sizes.join(
            F.broadcast(
                spark.range(_LTV_MAX_AGE + 1).select(
                    F.col("id").alias("age_week")
                )
            )
        )
        .join(F.broadcast(rev), ["cohort_week", "age_week"], "left")
        .select(
            "cohort_week",
            "age_week",
            "n_users",
            F.coalesce("rev_cents", F.lit(0)).alias("rev_cents"),
        )
    )
    cum = grid.withColumn(
        "cum_cents",
        F.sum("rev_cents").over(
            W.partitionBy("cohort_week")
            .orderBy("age_week")
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    return cum.selectExpr(*_split_top_level(_LTV_FINAL))
