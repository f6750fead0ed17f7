"""Warehouse-analytics composites: funnel analysis, SCD2 dimension
versioning, and Lloyd's k-means over the embedding corpus.

The reference engine's users run it embedded in a warehouse stack
(SURVEY.md §1 — the similarity engine feeds ordinary OLAP downstream);
these are the three downstream shapes its outputs land in:

- ``rel_funnel``     — ordered-event funnel (view -> click -> purchase)
  as three conditional-min aggregates, no self-join explosion;
- ``rel_scd2_merge`` — MERGE-as-a-join: slowly-changing-dimension
  type-2 versioning of ``customer`` against an order-derived change
  stream, declaratively (the sink-side upsert pattern without a
  transactional table format);
- ``emb_kmeans``     — Lloyd's iterations as repeated broadcast-join +
  re-aggregation (the iterative-algorithm pattern #2 after
  connected-components; WEAK row, pinned against a NumPy reference in
  ``tests/test_analytics.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables

_KMEANS_K = 8
_KMEANS_ITERS = 4
_SCD2_PRICE = 200_000.0


@query(
    "rel_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS v_us
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id,
               MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) AS c_us
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click'
          AND epoch_us(CAST(e.ts AS TIMESTAMP)) > v.v_us
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id,
               MIN(epoch_us(CAST(e.ts AS TIMESTAMP))) AS p_us
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_us(CAST(e.ts AS TIMESTAMP)) > c.c_us
        GROUP BY e.user_id
    )
    SELECT v.user_id, v.v_us, c.c_us, p.p_us,
           1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
             + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS stage
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON c.user_id = p.user_id
    """,
)
def rel_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: per user, the earliest 'view', the earliest
    'click' AFTER that view, and the earliest 'purchase' after that
    click — stage = how deep the user got.

    Three stage aggregates, each a conditional MIN keyed by user_id,
    chained by left joins on the SAME key — so every shuffle in the
    plan is the user_id hash exchange and AQE coalesces them; no
    per-event self-join, no window over the full event log. The stage
    predicate pushes the event_type filter into each scan."""
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("v_us"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("us") > F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("c_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("us") > F.col("c_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"))
    )
    stage = (
        F.lit(1)
        + F.when(F.col("c_us").isNull(), 0).otherwise(1)
        + F.when(F.col("p_us").isNull(), 0).otherwise(1)
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "v_us", "c_us", "p_us", stage.alias("stage"))
    )


@query(
    "rel_scd2_merge",
    oracle="""
    WITH chg AS (
        SELECT o_custkey AS c_custkey,
               MIN(epoch_us(CAST(o_orderdate AS TIMESTAMP))) AS eff_us,
               CAST(COUNT(*) AS BIGINT) AS n_big
        FROM orders WHERE o_totalprice > 200000.0
        GROUP BY o_custkey
    )
    SELECT c.c_custkey, 1 AS version, c.c_mktsegment,
           CAST(0 AS BIGINT) AS n_big_orders,
           CAST(NULL AS BIGINT) AS valid_from_us,
           chg.eff_us AS valid_to_us
    FROM customer c LEFT JOIN chg USING (c_custkey)
    UNION ALL
    SELECT c.c_custkey, 2 AS version, c.c_mktsegment,
           chg.n_big AS n_big_orders,
           chg.eff_us AS valid_from_us,
           CAST(NULL AS BIGINT) AS valid_to_us
    FROM customer c JOIN chg USING (c_custkey)
    """,
)
def rel_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension merge, declaratively: the
    change stream is each customer's first order over 200k (effective
    timestamp + big-order count); affected customers get their v1 row
    CLOSED (valid_to = effective time) and a v2 row OPENED; untouched
    customers keep one open v1 row.

    This is the sink-side MERGE/upsert re-expressed as one aggregate on
    the change source + one left join + one inner join + UNION ALL —
    exactly what a transactional table format does under the hood,
    minus the log. Both joins key on c_custkey; the change aggregate is
    small and broadcast-able at any scale (customers with 200k+ orders
    that batch)."""
    t = Tables(spark, sf_dir)
    chg = (
        t.orders.filter(F.col("o_totalprice") > _SCD2_PRICE)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.min(
                F.unix_micros(F.col("o_orderdate").cast("timestamp"))
            ).alias("eff_us"),
            F.count("*").alias("n_big"),
        )
    )
    cust = t.customer.select("c_custkey", "c_mktsegment")
    v1 = cust.join(F.broadcast(chg), "c_custkey", "left").select(
        "c_custkey",
        F.lit(1).alias("version"),
        "c_mktsegment",
        F.lit(0).cast("long").alias("n_big_orders"),
        F.lit(None).cast("long").alias("valid_from_us"),
        F.col("eff_us").alias("valid_to_us"),
    )
    v2 = cust.join(F.broadcast(chg), "c_custkey").select(
        "c_custkey",
        F.lit(2).alias("version"),
        "c_mktsegment",
        F.col("n_big").alias("n_big_orders"),
        F.col("eff_us").alias("valid_from_us"),
        F.lit(None).cast("long").alias("valid_to_us"),
    )
    return v1.unionAll(v2)


_KM_C = 100_000_000  # +C mean shift (the emb_kmeans_exact recipe)


def _km_oracle() -> str:
    """Unrolled 4-round integer Lloyd + final assignment, as one DuckDB
    statement (the `emb_kmeans_exact` template from
    operators/extras5.py, extended with the 5th assignment pass whose
    winning d2 feeds the WCSS display)."""
    k, c = _KMEANS_K, _KM_C
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
    for r in range(1, _KMEANS_ITERS + 1):
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
    rr = _KMEANS_ITERS
    return (
        "WITH " + ",".join(ctes)
        + f""",
    df AS (
        SELECT v.vec_id, c.cl,
               SUM((v.q - c.cq) * (v.q - c.cq)) AS d2
        FROM v JOIN c{rr} c ON c.i = v.i
        GROUP BY 1, 2
    ),
    af AS (
        SELECT vec_id, cl, d2 FROM (
            SELECT vec_id, cl, d2,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY d2, cl) AS rk
            FROM df
        ) WHERE rk = 1
    )
    SELECT cl,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(CAST(SUM(d2) AS DOUBLE) / 1e12, 4) AS wcss
    FROM af GROUP BY cl
    """
    )


@query("emb_kmeans", oracle=_km_oracle)
def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (k=8, 4 iterations, deterministic init = the
    k lowest vec_ids) over the 64-d embedding corpus — the iterative
    scale pattern behind IVF codebook training (``sim_centroid`` is one
    half-step of this loop).

    Each iteration is: broadcast the k-row centroid table, assign via
    argmin-L2 (min_by over the cross join — k rows per vector, k tiny),
    re-aggregate centroids elementwise via posexplode + (cluster, dim)
    hash agg. Everything stays a DataFrame; no vector ever reaches the
    driver (the centroid table itself is k x d = small by construction,
    the legitimate broadcast dimension). Output: per-cluster size +
    within-cluster sum of squares (value units², the final-assignment
    pass against the round-4 centroids).

    FULL row (promoted round 9, previously the last WEAK pair): the
    Lloyd loop runs on micro-unit BIGINT coordinates — integer argmin
    (ties → lowest cluster id), exact shifted integer means
    floor((Σq + n·C)/n) − C, empty-cluster carry-forward — so the
    entire 4-round evolution replays bit-exactly as one unrolled
    DuckDB statement (the `emb_kmeans_exact` recipe, which keeps its
    own 3-iteration centroid-fingerprint output).  WCSS is exact
    integer micro² summed wide (DECIMAL(38,0) / HUGEINT — Σd2 can
    pass int64 on clone probes) with ONE final ÷1e12 display; also
    pinned against an independent NumPy integer Lloyd in
    ``tests/test_analytics.py``.

    Scale shape: per round one k-row broadcast + one argmin pass + one
    (cl, dim) hash agg; quantization changes no asymptotics.  d2 ≤
    64·(2.4e6)² ≈ 3.7e14 < 2^63 bounds the per-pair products."""
    t = Tables(spark, sf_dir)
    emb = t.embeddings.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(ROUND(x * 1e6) AS BIGINT))"
        ).alias("q"),
    )
    cent = emb.filter(F.col("vec_id") < _KMEANS_K).select(
        F.col("vec_id").cast("int").alias("cl"),
        F.col("q").alias("cq"),
    )
    dist2 = F.aggregate(
        F.zip_with("q", "cq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    for _ in range(_KMEANS_ITERS):
        assigned = (
            emb.join(F.broadcast(cent))
            .withColumn("d2", dist2)
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
                        f"(sum(x) + count(*) * {_KM_C})"
                        f" div count(*)"
                    )
                    - F.lit(_KM_C)
                ).alias("cq")
            )
        )
        prev = cent.select("cl", F.posexplode("cq").alias("i", "pq"))
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
    final = (
        emb.join(F.broadcast(cent))
        .withColumn("d2", dist2)
        .groupBy("vec_id")
        .agg(F.min(F.struct("d2", "cl")).alias("best"))
        .select(
            F.col("best.cl").alias("cl"),
            F.col("best.d2").alias("d2"),
        )
    )
    return final.groupBy("cl").agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.round(
            F.sum(F.col("d2").cast("decimal(38,0)")).cast("double")
            / 1e12,
            4,
        ).alias("wcss"),
    )


@query(
    "rel_win_pattern",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               LEAD(event_type, 1) OVER w AS t1,
               LEAD(event_type, 2) OVER w AS t2
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, COUNT(*) AS n_matches,
           MIN(us) AS first_match_us
    FROM seq
    WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
    GROUP BY user_id
    """,
)
def rel_win_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequential pattern matching: strictly
    consecutive view -> click -> purchase triples per user (no
    intervening events — the strict-contiguity pattern the funnel's
    eventually-follows semantics cannot express).

    One window sort materializes both lookaheads; the pattern predicate
    is a scalar filter over (type, lead1, lead2) — linear, one shuffle,
    and the general template for any fixed-length regex-over-events:
    k-step patterns are k-1 leads, still one window."""
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t.events.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    )
    return (
        seq.filter(
            (F.col("event_type") == "view")
            & (F.col("t1") == "click")
            & (F.col("t2") == "purchase")
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_matches"),
            F.min("us").alias("first_match_us"),
        )
    )


_PCA_DIM = 64
_PCA_POWER_ITERS = 64
# 1e-4 coordinate quantization: |cv| <= ~1.2e4 micro-steps, cv^2 <=
# 1.5e8, so the integer covariance numerators S_ij <= N * 1.5e8 stay
# below 2^53 through 1000x clone probes — the BIGINT -> DOUBLE
# conversion both engines perform on S is therefore EXACT, which is
# what lets the float power iteration start from identical bits.
_PCA_Q = 10_000


def _pca_power_exact(mat, d: int, iters: int):
    """Deterministic power iteration with a FULLY PINNED float DAG:
    pure-Python IEEE-double loops whose fold order (seed-first, left
    to right — s = x0; s += x1; ...) is bit-identical to DuckDB's
    ``list_reduce`` left fold, so the oracle's recursive-CTE twin
    reproduces every intermediate bit-for-bit (the `traj_dtw_pair`
    float-expression-tree precedent, applied to an eigensolve).
    init = [0.125]*64 (1/sqrt(64), exactly representable), fixed
    iteration count, sign fixed by the first nonzero component.
    Returns (e1, e2): the top two axes (second via one deflation
    step M2 = M - (lam*e1_i)*e1_j, left-assoc).  The matrix is
    dim^2-bounded — CONSTANT relative to corpus size, like a PQ
    codebook — so the driver-side solve is scale-safe; all
    data-sized work stays distributed.  No NumPy: BLAS matvecs use
    pairwise/SIMD summation orders no SQL engine replays."""
    import math

    def seedfold(vals):
        it = iter(vals)
        s = next(it)
        for x in it:
            s = s + x
        return s

    def top(m):
        v = [0.125] * d
        for _ in range(iters):
            w = [
                seedfold(m[i][j] * v[j] for j in range(d))
                for i in range(d)
            ]
            nrm = math.sqrt(seedfold(x * x for x in w))
            v = [x / nrm for x in w]
        first = next((x for x in v if x != 0.0), 0.0)
        if first < 0:
            v = [-x for x in v]
        return v

    e1 = top(mat)
    tv = [
        seedfold(mat[i][j] * e1[j] for j in range(d)) for i in range(d)
    ]
    lam = seedfold(e1[i] * tv[i] for i in range(d))
    m2 = [
        [mat[i][j] - lam * e1[i] * e1[j] for j in range(d)]
        for i in range(d)
    ]
    e2 = top(m2)
    return e1, e2


def _pca_recursion_sql(name: str, msrc: str) -> str:
    """One recursive-CTE power iteration over the 1-row matrix CTE
    ``msrc`` (column ``m``: DOUBLE[][]), ending in a sign-fixed
    eigenvector CTE ``e_{name}`` (column ``e``).  Folds are
    ``list_reduce`` (seed-first left fold) matching
    `_pca_power_exact`; the single-element-list trick binds the
    matvec result ``w`` so normalization references it once."""
    d, t = _PCA_DIM, _PCA_POWER_ITERS
    return f"""
    it_{name} AS (
        SELECT 0 AS t,
               list_transform(generate_series(1, {d}),
                              x -> CAST(0.125 AS DOUBLE)) AS v
        UNION ALL
        SELECT t + 1,
               list_transform(
                   [list_transform(m, r -> list_reduce(
                        list_transform(generate_series(1, {d}),
                            j -> list_extract(r, j)
                                 * list_extract(v, j)),
                        (a, b) -> a + b))],
                   w -> list_transform(w, x -> x / SQRT(list_reduce(
                            list_transform(w, y -> y * y),
                            (a, b) -> a + b))))[1]
        FROM it_{name}, {msrc} WHERE t < {t}
    ),
    e_{name} AS (
        SELECT CASE WHEN COALESCE(list_filter(v,
                         x -> x <> CAST(0.0 AS DOUBLE))[1],
                         CAST(0.0 AS DOUBLE)) < 0
                    THEN list_transform(v, x -> -x) ELSE v END AS e
        FROM it_{name} WHERE t = {t}
    )"""


def _pca_oracle() -> str:
    d, q, c = _PCA_DIM, _PCA_Q, _KM_C
    return f"""
    WITH RECURSIVE v AS MATERIALIZED (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS i,
               CAST(ROUND(UNNEST(embedding) * CAST({q} AS DOUBLE))
                    AS BIGINT) AS qv
        FROM embeddings
    ),
    mu AS (
        SELECT i, CAST((SUM(qv) + COUNT(*) * {c}) // COUNT(*)
                       AS BIGINT) - {c} AS mq
        FROM v GROUP BY i
    ),
    cv AS MATERIALIZED (
        SELECT v.vec_id, v.i, v.qv - mu.mq AS cq
        FROM v JOIN mu USING (i)
    ),
    s AS MATERIALIZED (
        SELECT a.i AS i, b.i AS j,
               CAST(SUM(a.cq * b.cq) AS DOUBLE) AS m
        FROM cv a JOIN cv b USING (vec_id)
        GROUP BY 1, 2
    ),
    mrows AS (SELECT i, list(m ORDER BY j) AS r FROM s GROUP BY i),
    mt AS MATERIALIZED (SELECT list(r ORDER BY i) AS m FROM mrows),
    {_pca_recursion_sql("one", "mt")},
    tvec AS (
        SELECT list_transform(m, r -> list_reduce(
                   list_transform(generate_series(1, {d}),
                       j -> list_extract(r, j) * list_extract(e, j)),
                   (a, b) -> a + b)) AS tv
        FROM mt, e_one
    ),
    lam AS (
        SELECT list_reduce(
                   list_transform(generate_series(1, {d}),
                       i -> list_extract(e, i) * list_extract(tv, i)),
                   (a, b) -> a + b) AS lam
        FROM tvec, e_one
    ),
    m2 AS MATERIALIZED (
        SELECT list_transform(generate_series(1, {d}),
                   i -> list_transform(generate_series(1, {d}),
                       j -> list_extract(list_extract(m, i), j)
                            - lam * list_extract(e, i)
                                  * list_extract(e, j))) AS m
        FROM mt, e_one, lam
    ),
    {_pca_recursion_sql("two", "m2")},
    cvl AS (SELECT vec_id, list(cq ORDER BY i) AS cq
            FROM cv GROUP BY vec_id)
    SELECT vec_id,
           ROUND(list_reduce(list_transform(generate_series(1, {d}),
                     j -> list_extract(cq, j)
                          * list_extract(e_one.e, j)),
                 (a, b) -> a + b) / CAST({q} AS DOUBLE), 6) + 0.0
               AS pc1,
           ROUND(list_reduce(list_transform(generate_series(1, {d}),
                     j -> list_extract(cq, j)
                          * list_extract(e_two.e, j)),
                 (a, b) -> a + b) / CAST({q} AS DOUBLE), 6) + 0.0
               AS pc2
    FROM cvl, e_one, e_two
    """


@query("emb_pca", oracle=_pca_oracle)
def emb_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection of the embedding corpus onto its top-2 principal
    axes — the dimensionality-reduction step a curation pipeline runs
    before semantic clustering/dedup (project, then bucket in the
    reduced space).

    FULL row (promoted round 9 — the last WEAK key): the covariance
    is computed as EXACT INTEGER numerators S_ij = SUM(cv_i*cv_j)
    over 1e-4-quantized centered coordinates (shifted integer mean;
    DECIMAL(38,0)/HUGEINT sums; S < 2^53 so the cast to DOUBLE is
    exact on both engines), and the eigensolve is a power iteration
    whose ENTIRE float DAG is pinned: driver-side pure-Python
    seed-first left folds == DuckDB recursive-CTE ``list_reduce``
    folds, bit-for-bit through 64 matvec+normalize steps, the
    Rayleigh quotient, one deflation, and 64 more steps (the
    `traj_dtw_pair` float-expression-tree discipline applied to an
    eigensolve).  Projections are integer-dot-float folds with one
    final /1e4 display; +0.0 normalizes sign-crossing zeros.

    Distributed part (data-sized): one (i)-keyed hash agg for the
    mean, one 4096-group outer-product hash agg for S, one zip_with
    fold per vector for the projections.  Driver part is dim^2 = 4096
    integers + a 520k-flop Python loop — corpus-independent, the
    broadcast-codebook legitimacy class.  Pinned against an
    independent NumPy PCA (tolerance — BLAS fold order differs) in
    tests/test_analytics.py."""
    t = Tables(spark, sf_dir)
    emb = t.embeddings.select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> CAST(ROUND(x"
            f" * CAST({_PCA_Q} AS DOUBLE)) AS BIGINT))"
        ).alias("q"),
    )
    mu_rows = (
        emb.select(F.posexplode("q").alias("i", "x"))
        .groupBy("i")
        .agg(
            (
                F.expr(f"(sum(x) + count(*) * {_KM_C}) div count(*)")
                - F.lit(_KM_C)
            ).alias("mq")
        )
        .collect()
    )  # 64 rows — dim-bounded, corpus-independent
    mu = [0] * _PCA_DIM
    for r in mu_rows:
        mu[r["i"]] = int(r["mq"])
    mu_arr = F.array(*[F.lit(m).cast("bigint") for m in mu])
    # pre-explode repartition: the fixture is a single row group, and
    # the 4096x outer-product expansion is the heavy stage — spread it
    centered = emb.repartition("vec_id").select(
        "vec_id",
        F.zip_with("q", mu_arr, lambda a, b: a - b).alias("cq"),
    )
    outer = F.flatten(
        F.transform("cq", lambda x: F.transform("cq", lambda y: x * y))
    )
    s_rows = (
        centered.select(F.posexplode(outer).alias("pos", "xy"))
        .groupBy("pos")
        .agg(F.sum(F.col("xy").cast("decimal(38,0)")).alias("s"))
        .collect()
    )  # 4096 exact integers to the driver — dim^2-bounded
    mat = [[0.0] * _PCA_DIM for _ in range(_PCA_DIM)]
    for r in s_rows:
        mat[r["pos"] // _PCA_DIM][r["pos"] % _PCA_DIM] = float(
            int(r["s"])
        )
    e1, e2 = _pca_power_exact(mat, _PCA_DIM, _PCA_POWER_ITERS)
    a1 = F.array(*[F.lit(float(x)) for x in e1])
    a2 = F.array(*[F.lit(float(x)) for x in e2])
    dot = lambda arr: F.aggregate(  # noqa: E731
        F.zip_with("cq", arr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return centered.select(
        "vec_id",
        (
            F.round(dot(a1) / F.lit(float(_PCA_Q)), 6) + F.lit(0.0)
        ).alias("pc1"),
        (
            F.round(dot(a2) / F.lit(float(_PCA_Q)), 6) + F.lit(0.0)
        ).alias("pc2"),
    )


@query(
    "rel_retention",
    oracle="""
    WITH d AS (
        SELECT user_id, event_type,
               CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 86400e6)
                    AS BIGINT) AS dy
        FROM events
    ),
    cohort AS (
        SELECT user_id, MIN(dy) AS c_day
        FROM d WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (SELECT DISTINCT user_id, dy AS a_day FROM d)
    SELECT c.c_day AS cohort_day,
           a.a_day - c.c_day AS day_offset,
           CAST(COUNT(DISTINCT c.user_id) AS BIGINT) AS n_users
    FROM cohort c JOIN activity a USING (user_id)
    WHERE a.a_day - c.c_day BETWEEN 0 AND 7
    GROUP BY 1, 2
    """,
)
def rel_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by their first 'signup'
    day, counted as retained on each of the next 7 days they show ANY
    activity — the standard product-analytics rollup, and a shape the
    event-replay deployments of this engine run daily.

    Plan: two hash aggregates (cohort = conditional MIN, activity =
    DISTINCT (user, day)) joined on user_id — every shuffle is the
    user_id exchange, the 8-column retention matrix is the only
    output. No event self-join, no per-day scan. Days as epoch-day
    bigints (the ``traj_od_flows`` convention — cross-engine DATE
    normalization differs)."""
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "user_id",
        "event_type",
        F.floor(F.unix_micros("ts") / F.lit(86400e6)).alias("day"),
    )
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("day").alias("cohort_day"))
    )
    activity = ev.select("user_id", F.col("day").alias("a_day")).distinct()
    off = F.col("a_day") - F.col("cohort_day")
    return (
        cohort.join(activity, "user_id")
        .withColumn("day_offset", off)
        .filter((F.col("day_offset") >= 0) & (F.col("day_offset") <= 7))
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "emb_outliers",
    oracle="""
    WITH e AS (
        SELECT vec_id, label,
               CAST(unnest(embedding) AS DOUBLE) AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    cent AS (
        SELECT label, i, AVG(v) AS c FROM e GROUP BY label, i
    ),
    cs AS (
        SELECT e.vec_id, e.label,
               SUM(e.v * cent.c)
                 / (SQRT(SUM(e.v * e.v)) * SQRT(SUM(cent.c * cent.c)))
                 AS cos_c
        FROM e JOIN cent USING (label, i)
        GROUP BY e.vec_id, e.label
    ),
    stats AS (
        SELECT label, AVG(cos_c) AS mu, STDDEV_SAMP(cos_c) AS sd
        FROM cs GROUP BY label
    )
    SELECT cs.vec_id, cs.label,
           ROUND(cs.cos_c, 6) + 0.0 AS cos_c,
           ROUND((cs.cos_c - s.mu) / NULLIF(s.sd, 0), 6) + 0.0 AS z,
           CASE WHEN ROUND((cs.cos_c - s.mu) / NULLIF(s.sd, 0), 6) < -2.0
                THEN 1 ELSE 0 END AS is_outlier
    FROM cs JOIN stats s USING (label)
    """,
)
def emb_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding OUTLIER detection — the curation gate that drops
    mis-embedded / off-cluster vectors before semantic dedup: cosine of
    every vector to its OWN label centroid, z-scored within the label,
    flagged below -2.

    One posexplode + (label, dim) hash agg trains the centroids
    (``sim_centroid``'s aggregate), one broadcast join + fold scores
    every vector, one (label) agg z-scores — all linear, all JVM. The
    outlier flag compares the ROUNDED z on both engines, so the
    boundary is hash-deterministic."""
    t = Tables(spark, sf_dir)
    emb = t.embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    cent = (
        emb.select("label", F.posexplode("v").alias("i", "x"))
        .groupBy("label", "i")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("cs"))
        .select("label", F.col("cs.c").alias("c"))
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cs = (
        emb.join(F.broadcast(cent), "label")
        .select(
            "vec_id",
            "label",
            (
                dot("v", "c")
                / (F.sqrt(dot("v", "v")) * F.sqrt(dot("c", "c")))
            ).alias("cos_c"),
        )
    )
    stats = cs.groupBy("label").agg(
        F.avg("cos_c").alias("mu"), F.stddev_samp("cos_c").alias("sd")
    )
    # + 0.0 collapses IEEE negative zero in the two sign-crossing
    # display columns (house hardening after the sf0.1 dual-scale find)
    z = F.round(
        (F.col("cos_c") - F.col("mu"))
        / F.nullif(F.col("sd"), F.lit(0.0)),
        6,
    ) + 0.0
    return (
        cs.join(F.broadcast(stats), "label")
        .select(
            "vec_id",
            "label",
            (F.round("cos_c", 6) + 0.0).alias("cos_c"),
            z.alias("z"),
            F.when(z < -2.0, 1).otherwise(0).alias("is_outlier"),
        )
    )
