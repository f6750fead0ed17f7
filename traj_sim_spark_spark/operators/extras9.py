"""Round-8 additions: multi-feature exact regression, isotonic
calibration, Zipf diagnostics, an RP-tree ANN tier, and two
pipeline-composition audits.

- ``rel_ols_multi``   — 2-feature multiple regression from exact
  integer moments (normal equations solved by Cramer's rule in one
  shared display projection) — the multivariate extension of
  ``rel_regr_exact``.
- ``rel_isotonic_fit`` — per-user isotonic (monotone) L2 regression
  via the minimax characterization fit_i = max_{j<=i} min_{k>=i}
  mean(y[j..k]), computed EXACTLY in integers by scaling every
  segment mean to a common denominator (LCM(1..24)) — the
  calibration-curve primitive quality-score pipelines need.
- ``text_zipf_fit``    — Zipf's-law rank-frequency fit over the top
  token ranks: log-log OLS from micro-quantized ln values (integer
  moments, one float display) — corpus-health diagnostic.
- ``emb_rp_tree_knn``  — random-projection tree ANN: 3 deterministic
  signed-projection levels with node-local integer medians, leaf-only
  exact integer L2 rerank — the space-partitioning ANN family beside
  LSH (`emb_neardup_lsh`), IVF (`sim_knn_ivf*`) and PQ (`sim_knn_pq`).
- ``pipe_dedup_cascade_audit`` — the 2^3 overlap matrix of the three
  dedup tiers (exact / MinHash-near-dup / semantic): which documents
  each tier catches, composed from the REGISTERED pipelines so the
  audited decisions are the shipped decisions.
- ``pipe_tokenizer_compare``  — per-source tokenizer economics for
  the learned BPE merges: whitespace tokens vs BPE tokens vs chars,
  fertility and compression per corpus domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables

# ---------------------------------------------------------------------------
# rel_ols_multi — multiple regression from exact integer moments
# ---------------------------------------------------------------------------

# Cramer's rule on the 3x3 normal equations [[n,s1,s2],[s1,s11,s12],
# [s2,s12,s22]] · [b0,b1,b2]' = [sy,s1y,s2y]'.  Float math confined to
# this ONE projection over the per-group aggregate row; every input is
# an exact integer cast to DOUBLE identically on both engines, and the
# determinant expressions share their text verbatim (house
# `rel_regr_exact` discipline).  Displays carry +0.0 (sign-crossing).
_OLS_DET = (
    "(CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE)"
    " - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))"
    " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE)"
    " - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))"
    " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE)"
    " - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)))"
)
_OLS_DET0 = (
    "(CAST(sy AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s22 AS DOUBLE)"
    " - CAST(s12 AS DOUBLE) * CAST(s12 AS DOUBLE))"
    " - CAST(s1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE)"
    " - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))"
    " + CAST(s2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE)"
    " - CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE)))"
)
_OLS_DET1 = (
    "(CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * CAST(s22 AS DOUBLE)"
    " - CAST(s12 AS DOUBLE) * CAST(s2y AS DOUBLE))"
    " - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s22 AS DOUBLE)"
    " - CAST(s12 AS DOUBLE) * CAST(s2 AS DOUBLE))"
    " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE)"
    " - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE)))"
)
_OLS_DET2 = (
    "(CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * CAST(s2y AS DOUBLE)"
    " - CAST(s1y AS DOUBLE) * CAST(s12 AS DOUBLE))"
    " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s2y AS DOUBLE)"
    " - CAST(s1y AS DOUBLE) * CAST(s2 AS DOUBLE))"
    " + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s12 AS DOUBLE)"
    " - CAST(s11 AS DOUBLE) * CAST(s2 AS DOUBLE)))"
)
_OLS_FINAL = f"""
    l_returnflag,
    CAST(n AS BIGINT) AS n,
    ROUND({_OLS_DET0} / {_OLS_DET}, 6) + 0.0 AS intercept_cents,
    ROUND({_OLS_DET1} / {_OLS_DET}, 6) + 0.0 AS slope_qty,
    ROUND({_OLS_DET2} / {_OLS_DET}, 6) + 0.0 AS slope_disc
"""


@query(
    "rel_ols_multi",
    oracle=f"""
    WITH q AS (
        SELECT l_returnflag,
               CAST(ROUND(l_quantity) AS BIGINT) AS x1,
               CAST(ROUND(l_discount * 100) AS BIGINT) AS x2,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y
        FROM lineitem
    ),
    m AS (
        SELECT l_returnflag, COUNT(*) AS n,
               SUM(x1) AS s1, SUM(x2) AS s2, SUM(y) AS sy,
               SUM(x1 * x1) AS s11, SUM(x1 * x2) AS s12,
               SUM(x2 * x2) AS s22,
               SUM(x1 * y) AS s1y, SUM(x2 * y) AS s2y
        FROM q GROUP BY l_returnflag
    )
    SELECT {_OLS_FINAL} FROM m
    """,
)
def rel_ols_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIPLE linear regression (2 features + intercept) of extended
    price (cents) on quantity and discount percent, per l_returnflag —
    the multivariate extension of ``rel_regr_exact``, computed the
    house way: one map-side-combinable hash aggregation sums EXACT
    INTEGER moments (n, Σx1, Σx2, Σy, Σx1², Σx1x2, Σx2², Σx1y, Σx2y;
    the largest ~3e14 at sf0.1, comfortably int64), and the normal
    equations are solved per group by CRAMER'S RULE in one final
    3-row projection whose determinant expressions share their text
    verbatim with the oracle — floats appear once, in identical
    operation order, on exact-integer inputs.

    The point at 100 TB: native ``regr_*``-style float accumulators
    are order-dependent at the ulp, so a re-partitioned re-run of the
    same fit DIVERGES in the last digits; integer moments make the
    regression partitioning- and engine-exact, and the fleet-side cost
    is one codegen'd integer agg — the algebra runs on 3 rows."""
    t = Tables(spark, sf_dir)
    from .extras5 import _split_top_level

    q = t.lineitem.selectExpr(
        "l_returnflag",
        "CAST(ROUND(l_quantity) AS BIGINT) AS x1",
        "CAST(ROUND(l_discount * 100) AS BIGINT) AS x2",
        "CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS y",
    )
    m = q.groupBy("l_returnflag").agg(
        F.expr("COUNT(*)").alias("n"),
        F.expr("SUM(x1)").alias("s1"),
        F.expr("SUM(x2)").alias("s2"),
        F.expr("SUM(y)").alias("sy"),
        F.expr("SUM(x1 * x1)").alias("s11"),
        F.expr("SUM(x1 * x2)").alias("s12"),
        F.expr("SUM(x2 * x2)").alias("s22"),
        F.expr("SUM(x1 * y)").alias("s1y"),
        F.expr("SUM(x2 * y)").alias("s2y"),
    )
    return m.selectExpr(*_split_top_level(_OLS_FINAL))


# ---------------------------------------------------------------------------
# rel_isotonic_fit — per-user exact isotonic (monotone) regression
# ---------------------------------------------------------------------------

_ISO_N = 24  # prefix length fitted per user
_ISO_LCM = 5354228880  # lcm(1..24): every segment mean scales exactly
_ISO_DISP = float(_ISO_LCM * 100)  # centi-units -> value units


@query(
    "rel_isotonic_fit",
    oracle=f"""
    WITH p AS (
        SELECT user_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS i,
               CAST(ROUND(value * 100) AS BIGINT) AS y
        FROM events
    ),
    pts AS (SELECT * FROM p WHERE i <= {_ISO_N}),
    cum AS (
        SELECT user_id, i, y,
               SUM(y) OVER (PARTITION BY user_id ORDER BY i) AS s
        FROM pts
    ),
    seg AS (
        SELECT a.user_id, a.i AS j, b.i AS k,
               (b.s - a.s + a.y)
                   * CAST({_ISO_LCM} // (b.i - a.i + 1) AS BIGINT)
                   AS mlcm
        FROM cum a JOIN cum b
          ON a.user_id = b.user_id AND a.i <= b.i
    ),
    tri AS (
        SELECT user_id, j, mlcm,
               UNNEST(range(j, k + 1)) AS i
        FROM seg
    ),
    mn AS (
        SELECT user_id, i, j, MIN(mlcm) AS v
        FROM tri GROUP BY 1, 2, 3
    ),
    fit AS (
        SELECT user_id, i, MAX(v) AS f FROM mn GROUP BY 1, 2
    )
    SELECT fit.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pts,
           CAST(COUNT(DISTINCT fit.f) AS BIGINT) AS n_blocks,
           CAST(SUM(ABS(pts.y * {_ISO_LCM} - fit.f)) AS BIGINT)
               AS adj_mass_lcm,
           ROUND(CAST(MAX(CASE WHEN fit.i = 1 THEN fit.f END)
                      AS DOUBLE) / {_ISO_DISP}, 6) AS fit_first,
           ROUND(CAST(MAX(CASE WHEN fit.i = {_ISO_N} THEN fit.f END)
                      AS DOUBLE) / {_ISO_DISP}, 6) AS fit_last
    FROM fit JOIN pts
      ON pts.user_id = fit.user_id AND pts.i = fit.i
    GROUP BY fit.user_id
    """,
)
def rel_isotonic_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ISOTONIC (monotone nondecreasing) L2 regression over
    the first 24 events — the calibration-curve primitive (quality
    scores, CTR calibration, any score→outcome mapping that must be
    monotone), computed EXACTLY: the minimax characterization
    fit_i = max_{j<=i} min_{k>=i} mean(y[j..k]) with every segment
    mean scaled to the common denominator lcm(1..24), so min/max
    decisions are BIGINT comparisons (no rational rounding anywhere)
    and the result is the true PAVA fit bit-for-bit.

    Output per user: point count, block count (maximal constant runs
    — isotonic fits are nondecreasing, so equal values are
    contiguous), the total L1 adjustment mass in LCM units (an exact
    integer fingerprint of the whole fitted vector), and the
    first/last fitted values (display-only division).

    Scale shape: the per-user work is a bounded ~N³/6 triple
    enumeration (N=24 → 2.6k rows/user) built from one prefix-sum
    window, one seq-bounded self-join and one explode — users
    parallelize across the fleet, nothing is quadratic in the table.
    Integer bounds: |mlcm| <= 24·maxcenti·LCM/1 ≈ 6.3e15 < 2^63."""
    t = Tables(spark, sf_dir)
    pts = (
        t.user_points()
        .select(
            "user_id",
            F.col("seq").alias("i"),
            F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("y"),
        )
        .filter(F.col("i") <= _ISO_N)
    )
    cum = pts.withColumn(
        "s",
        F.sum("y").over(W.partitionBy("user_id").orderBy("i")),
    )
    a, b = cum.alias("a"), cum.alias("b")
    seg = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.i") <= F.col("b.i")),
    ).select(
        F.col("a.user_id").alias("user_id"),
        F.col("a.i").alias("j"),
        F.col("b.i").alias("k"),
        (
            (F.col("b.s") - F.col("a.s") + F.col("a.y"))
            * F.expr(f"{_ISO_LCM}L div (b.i - a.i + 1)")
        ).alias("mlcm"),
    )
    tri = seg.select(
        "user_id",
        "j",
        "mlcm",
        F.explode(F.expr("sequence(j, k)")).alias("i"),
    )
    mn = tri.groupBy("user_id", "i", "j").agg(F.min("mlcm").alias("v"))
    fit = mn.groupBy("user_id", "i").agg(F.max("v").alias("f"))
    joined = fit.join(pts, ["user_id", "i"])
    return joined.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_pts"),
        F.countDistinct("f").cast("long").alias("n_blocks"),
        F.sum(F.abs(F.col("y") * F.lit(_ISO_LCM) - F.col("f")))
        .cast("long")
        .alias("adj_mass_lcm"),
        F.round(
            F.max(F.when(F.col("i") == 1, F.col("f"))).cast("double")
            / _ISO_DISP,
            6,
        ).alias("fit_first"),
        F.round(
            F.max(F.when(F.col("i") == _ISO_N, F.col("f"))).cast(
                "double"
            )
            / _ISO_DISP,
            6,
        ).alias("fit_last"),
    )


# ---------------------------------------------------------------------------
# text_zipf_fit — rank-frequency power-law fit over the token corpus
# ---------------------------------------------------------------------------

_ZIPF_TOP = 30

# slope/intercept of ln(f) ~ a + b·ln(r) from integer moments of the
# micro-quantized ln values — one shared float display projection.
_ZIPF_FINAL = """
    CAST(n AS BIGINT) AS n_ranks,
    CAST(f1 AS BIGINT) AS top1_freq,
    ROUND((CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
           - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
          / (CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
             - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / 1e0, 6) + 0.0
        AS zipf_slope,
    ROUND((CAST(s2 AS DOUBLE)
           - ((CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE))
              / (CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
                 - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)))
             * CAST(s1 AS DOUBLE)) / CAST(n AS DOUBLE) / 1e6, 6) + 0.0
        AS zipf_intercept
"""


@query(
    "text_zipf_fit",
    oracle=f"""
    WITH tok AS (
        SELECT word, COUNT(*) AS f
        FROM (SELECT UNNEST(string_split(text, ' ')) AS word
              FROM documents)
        WHERE LEN(word) > 0 GROUP BY 1
    ),
    top AS (
        SELECT word, f,
               ROW_NUMBER() OVER (ORDER BY f DESC, word) AS r
        FROM tok
    ),
    q AS (
        SELECT r, f,
               CAST(ROUND(LN(CAST(r AS DOUBLE)) * 1e6) AS BIGINT)
                   AS lr,
               CAST(ROUND(LN(CAST(f AS DOUBLE)) * 1e6) AS BIGINT)
                   AS lf
        FROM top WHERE r <= {_ZIPF_TOP}
    ),
    m AS (
        SELECT COUNT(*) AS n,
               MAX(CASE WHEN r = 1 THEN f END) AS f1,
               SUM(lr) AS s1, SUM(lf) AS s2,
               SUM(lr * lr) AS s11, SUM(lr * lf) AS s12
        FROM q
    )
    SELECT {_ZIPF_FINAL} FROM m
    """,
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ZIPF'S-LAW fit for the corpus: OLS of ln(frequency) on ln(rank)
    over the top-30 token ranks — the rank-frequency slope is the
    standard one-number corpus-health diagnostic (natural language
    sits near −1; template/boilerplate-heavy corpora flatten, spam
    steepens).

    House exactness for a float-native statistic: rank membership and
    ordering are integer-exact (frequency counts, ROW_NUMBER ties on
    the token), each ln value is quantized ONCE to micro-units
    (CAST(ROUND(LN(x)·1e6) AS BIGINT) on an exact-integer input — the
    only cross-engine float surface is libm ln at the rounding
    boundary, ~1e-10 per value), and the fit runs on INTEGER moments
    with one shared display projection (`rel_regr_exact` shape; the
    /1e0 and /1e6 rescale the micro-units back: slope is unit-free,
    the intercept is in ln-frequency units).

    Scale shape: one map-side-combinable token count, a top-30
    TakeOrdered, and a 1-row projection — the corpus is touched
    once."""
    t = Tables(spark, sf_dir)
    from .extras5 import _split_top_level

    tok = (
        t.documents.select(
            F.explode(F.split("text", " ")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("f"))
    )
    # TakeOrderedAndProject for the top-30 (no full-vocab global
    # window), then rank the 30 survivors — same (f DESC, word) order
    top = (
        tok.orderBy(F.col("f").desc(), "word")
        .limit(_ZIPF_TOP)
        .withColumn(
            "r",
            F.row_number().over(
                W.orderBy(F.col("f").desc(), "word")
            ),
        )
    )
    q = top.selectExpr(
        "r",
        "f",
        "CAST(ROUND(LN(CAST(r AS DOUBLE)) * 1e6) AS BIGINT) AS lr",
        "CAST(ROUND(LN(CAST(f AS DOUBLE)) * 1e6) AS BIGINT) AS lf",
    )
    m = q.agg(
        F.expr("COUNT(*)").alias("n"),
        F.expr("MAX(CASE WHEN r = 1 THEN f END)").alias("f1"),
        F.expr("SUM(lr)").alias("s1"),
        F.expr("SUM(lf)").alias("s2"),
        F.expr("SUM(lr * lr)").alias("s11"),
        F.expr("SUM(lr * lf)").alias("s12"),
    )
    return m.selectExpr(*_split_top_level(_ZIPF_FINAL))


# ---------------------------------------------------------------------------
# emb_rp_tree_knn — random-projection tree ANN (deterministic)
# ---------------------------------------------------------------------------

_RPT_PRIMES = (37, 59, 83)  # one signed projection per tree level
_RPT_MOD = 97
_RPT_K = 10
_RPT_QUERY = 0


def _rpt_sign_case(p: int, qcol: str = "q") -> str:
    """Deterministic ±1 sign for dimension d: +1 iff ((d+1)·p) mod 97
    falls in the lower half — the 'random' projection reproduced by
    arithmetic on both engines."""
    return (
        f"SUM(CASE WHEN ((d + 1) * {p}) % {_RPT_MOD}"
        f" < {_RPT_MOD // 2 + 1} THEN {qcol} ELSE -{qcol} END)"
    )


@query(
    "emb_rp_tree_knn",
    oracle=f"""
    WITH ev AS MATERIALIZED (
        SELECT vec_id,
               generate_subscripts(embedding, 1) - 1 AS d,
               CAST(ROUND(UNNEST(embedding) * 1e6) AS BIGINT) AS q
        FROM embeddings
    ),
    proj AS (
        SELECT vec_id,
               {_rpt_sign_case(_RPT_PRIMES[0])} AS p1,
               {_rpt_sign_case(_RPT_PRIMES[1])} AS p2,
               {_rpt_sign_case(_RPT_PRIMES[2])} AS p3
        FROM ev GROUP BY 1
    ),
    l1 AS (
        SELECT vec_id, p1, p2, p3,
               CASE WHEN ROW_NUMBER() OVER (ORDER BY p1, vec_id)
                    <= CAST((COUNT(*) OVER () + 1) // 2 AS BIGINT)
                    THEN 0 ELSE 1 END AS b1
        FROM proj
    ),
    l2 AS (
        SELECT vec_id, p3, b1,
               CASE WHEN ROW_NUMBER() OVER (PARTITION BY b1
                                            ORDER BY p2, vec_id)
                    <= CAST((COUNT(*) OVER (PARTITION BY b1) + 1) // 2
                            AS BIGINT)
                    THEN 0 ELSE 1 END AS b2
        FROM l1
    ),
    leaf AS (
        SELECT vec_id,
               b1 * 4 + b2 * 2
               + CASE WHEN ROW_NUMBER() OVER (PARTITION BY b1, b2
                                              ORDER BY p3, vec_id)
                      <= CAST((COUNT(*) OVER (PARTITION BY b1, b2)
                               + 1) // 2 AS BIGINT)
                      THEN 0 ELSE 1 END AS leaf_id
        FROM l2
    ),
    cand AS (
        SELECT c.vec_id
        FROM leaf c
        JOIN leaf qv ON qv.vec_id = {_RPT_QUERY}
                    AND c.leaf_id = qv.leaf_id
        WHERE c.vec_id <> {_RPT_QUERY}
    ),
    d2 AS (
        SELECT a.vec_id, SUM((a.q - b.q) * (a.q - b.q)) AS dd
        FROM ev a
        JOIN ev b ON b.vec_id = {_RPT_QUERY} AND b.d = a.d
        WHERE a.vec_id IN (SELECT vec_id FROM cand)
        GROUP BY a.vec_id
    )
    SELECT vec_id,
           ROUND(CAST(dd AS DOUBLE) / 1e12, 6) AS l2_sq
    FROM d2
    ORDER BY dd, vec_id LIMIT {_RPT_K}
    """,
)
def emb_rp_tree_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANDOM-PROJECTION TREE ANN (Dasgupta–Freund shape): three tree
    levels, each splitting every node at the node-local LOWER MEDIAN
    of a signed projection (deterministic ±1 signs from modular
    arithmetic on the dimension index — the 'random' directions
    reproduced exactly on both engines); the query descends to its
    leaf (~1/8 of the corpus) and an exact integer L2 rerank returns
    the top-10.  Completes the ANN family portfolio: hash buckets
    (LSH), learned cells (IVF), compressed codes (PQ), and now
    adaptive SPACE PARTITIONING — the structure that handles
    non-clustered data where IVF cells degenerate.

    Exactness: projections are integer dots of micro-quantized
    coordinates; medians are ROW_NUMBER <= (cnt+1) div 2 selections
    (integer, ties on vec_id); leaf membership and the rerank are
    pure BIGINT — FULL oracle, like the other ANN rows.

    Scale shape: at 100 TB the three median splits are a WRITE-PATH
    layout job (partition by leaf_id — the `emb_layout_ivf` pattern;
    medians via sampled split points at fleet scale), and a query
    reads ONE leaf partition: the tree IS partition pruning.  Here
    the splits are window functions over the 1-row-per-vector
    projection frame — corpus touched once for projections, once for
    the leaf-bounded rerank."""
    t = Tables(spark, sf_dir)
    ev = t.embeddings.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(ROUND(x * 1e6) AS BIGINT))"
        ).alias("qv"),
    )
    half = _RPT_MOD // 2 + 1
    projs = [
        F.aggregate(
            F.zip_with(
                "qv",
                F.expr(
                    f"transform(sequence(1, size(qv)), d -> "
                    f"CASE WHEN (d * {p}) % {_RPT_MOD} < {half}"
                    f" THEN 1L ELSE -1L END)"
                ),
                lambda x, s: x * s,
            ),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias(f"p{i + 1}")
        for i, p in enumerate(_RPT_PRIMES)
    ]
    proj = ev.select("vec_id", *projs)

    def split(df: DataFrame, pcol: str, parts: list[str], out: str):
        # lower-median split: rn <= (cnt+1) div 2 (both positive, so
        # the double division + bigint cast truncates == floors)
        wp = W.partitionBy(*parts) if parts else W.partitionBy()
        rn = F.row_number().over(wp.orderBy(pcol, "vec_id"))
        cnt = F.count("*").over(wp)
        half = ((cnt + F.lit(1)) / F.lit(2)).cast("bigint")
        return df.withColumn(
            out, F.when(rn <= half, F.lit(0)).otherwise(F.lit(1))
        )

    l1 = split(proj, "p1", [], "b1")
    l2 = split(l1, "p2", ["b1"], "b2")
    l3 = split(l2, "p3", ["b1", "b2"], "b3")
    leaf = l3.select(
        "vec_id",
        (
            F.col("b1") * 4 + F.col("b2") * 2 + F.col("b3")
        ).alias("leaf_id"),
    )
    qleaf = leaf.filter(F.col("vec_id") == _RPT_QUERY).select(
        F.col("leaf_id").alias("q_leaf")
    )
    cand = (
        leaf.join(F.broadcast(qleaf))
        .filter(
            (F.col("leaf_id") == F.col("q_leaf"))
            & (F.col("vec_id") != _RPT_QUERY)
        )
        .select("vec_id")
    )
    qvec = ev.filter(F.col("vec_id") == _RPT_QUERY).select(
        F.col("qv").alias("qq")
    )
    d2 = F.aggregate(
        F.zip_with("qv", "qq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        ev.join(F.broadcast(cand), "vec_id", "left_semi")
        .join(F.broadcast(qvec))
        .withColumn("dd", d2)
        .orderBy("dd", "vec_id")
        .limit(_RPT_K)
        .select(
            "vec_id",
            F.round(F.col("dd").cast("double") / 1e12, 6).alias(
                "l2_sq"
            ),
        )
    )


# ---------------------------------------------------------------------------
# pipe_dedup_cascade_audit — overlap matrix of the three dedup tiers
# ---------------------------------------------------------------------------


def _cascade_oracle() -> str:
    # lazy: resolved by registry.load_all() after every module loaded;
    # each tier's ORACLE is embedded as an independent subquery (its
    # own WITH scope — no CTE-name collisions between pipelines).
    from ..registry import _LAZY_ORACLES, ORACLES

    def get(key: str) -> str:
        return (
            ORACLES[key]
            if key in ORACLES
            else _LAZY_ORACLES[key]()
        )

    exact = get("text_exact_dedup")
    near = get("pipe_neardup_dedup")
    sem = get("pipe_dedup_semantic")
    return f"""
    SELECT ek AS exact_kept, nk AS near_kept, sk AS sem_kept,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CASE WHEN ek = 0 THEN 'exact'
                WHEN nk = 0 THEN 'near_dup'
                WHEN sk = 0 THEN 'semantic'
                ELSE 'kept' END AS first_removed_by
    FROM (
        SELECT d.doc_id,
               CASE WHEN e.keep_id IS NULL THEN 0 ELSE 1 END AS ek,
               CAST(n.keep AS INTEGER) AS nk,
               CASE WHEN s.kept THEN 1 ELSE 0 END AS sk
        FROM documents d
        LEFT JOIN (SELECT keep_id FROM ({exact}) x) e
          ON e.keep_id = d.doc_id
        JOIN ({near}) n ON n.doc_id = d.doc_id
        JOIN ({sem}) s ON s.doc_id = d.doc_id
    )
    GROUP BY ek, nk, sk
    """


@query("pipe_dedup_cascade_audit", oracle=_cascade_oracle)
def pipe_dedup_cascade_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DEDUP CASCADE AUDIT: the 2³ overlap matrix of the three dedup
    tiers — exact (`text_exact_dedup`), MinHash near-dup
    (`pipe_neardup_dedup`) and semantic/embedding
    (`pipe_dedup_semantic`) — per combination: document count, an
    example doc, and which tier of the standard exact→near→semantic
    cascade removes the cell first.  This is the attribution table a
    pipeline owner reads before ordering (or dropping) tiers: cells
    like (kept-by-exact, removed-by-near) measure what each stage
    adds over the previous one.

    Composed from the REGISTERED pipelines (`sim_ann_recall`
    pattern), so the audited keep/remove decisions are the shipped
    plans, not re-implementations; the oracle embeds each tier's
    registered SQL as an independent subquery scope.

    Scale shape: the three tiers are each bucketed/rep-collapsed (see
    their rows); the audit adds two hash joins on doc_id and an 8-row
    aggregate."""
    from ..registry import QUERIES

    t = Tables(spark, sf_dir)
    exact = (
        QUERIES["text_exact_dedup"](spark, sf_dir)
        .select(F.col("keep_id").alias("doc_id"))
        .withColumn("ek", F.lit(1))
    )
    near = QUERIES["pipe_neardup_dedup"](spark, sf_dir).select(
        "doc_id", F.col("keep").cast("int").alias("nk")
    )
    sem = QUERIES["pipe_dedup_semantic"](spark, sf_dir).select(
        "doc_id",
        F.when(F.col("kept"), 1).otherwise(0).alias("sk"),
    )
    flags = (
        t.documents.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id")
        .join(sem, "doc_id")
        .select(
            "doc_id",
            F.coalesce("ek", F.lit(0)).alias("ek"),
            "nk",
            "sk",
        )
    )
    return flags.groupBy("ek", "nk", "sk").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
    ).select(
        F.col("ek").alias("exact_kept"),
        F.col("nk").alias("near_kept"),
        F.col("sk").alias("sem_kept"),
        "n_docs",
        "min_doc_id",
        F.when(F.col("ek") == 0, "exact")
        .when(F.col("nk") == 0, "near_dup")
        .when(F.col("sk") == 0, "semantic")
        .otherwise("kept")
        .alias("first_removed_by"),
    )


# ---------------------------------------------------------------------------
# pipe_tokenizer_compare — per-source tokenizer economics
# ---------------------------------------------------------------------------


def _tokcmp_oracle() -> str:
    from .extras7 import _BPE_ROUNDS, _bpe_oracle_ctes

    return f"""
    WITH {_bpe_oracle_ctes()},
    sw AS (
        SELECT source, word, COUNT(*) AS f
        FROM (SELECT source,
                     UNNEST(string_split(text, ' ')) AS word
              FROM documents)
        WHERE LEN(word) > 0 GROUP BY 1, 2
    ),
    fert AS (
        SELECT word, len(syms) AS fert, LEN(word) AS chars
        FROM v{_BPE_ROUNDS}
    )
    SELECT source,
           CAST(SUM(f) AS BIGINT) AS ws_tokens,
           CAST(SUM(f * fert) AS BIGINT) AS bpe_tokens,
           CAST(SUM(f * chars) AS BIGINT) AS word_chars,
           ROUND(CAST(SUM(f * fert) AS DOUBLE) / SUM(f), 6)
               AS fertility,
           ROUND(CAST(SUM(f * chars) AS DOUBLE) / SUM(f * fert), 6)
               AS chars_per_token
    FROM sw JOIN fert USING (word)
    GROUP BY source
    """


@query("pipe_tokenizer_compare", oracle=_tokcmp_oracle)
def pipe_tokenizer_compare(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-SOURCE TOKENIZER ECONOMICS for the learned BPE merges: for
    each corpus domain, whitespace-token count, BPE-token count under
    the round-6 merge rules, raw character mass, and the two derived
    ratios tokenizer teams compare across domains — FERTILITY
    (BPE tokens per word; high = the vocabulary underserves that
    domain) and COMPRESSION (chars per BPE token).  The per-domain
    view is what `pipe_bpe_fertility`'s global distribution cannot
    show: which sources pay the token-budget tax.

    One corpus pass for the per-(source, word) frequencies, joined to
    the vocabulary-bounded merge result (`extras7._bpe_rounds`) — the
    corpus is never re-tokenized per merge round.  Integer masses end
    to end; the two ratios are display-only divisions of exact
    integers, written identically on both engines."""
    from .extras7 import _bpe_rounds

    t = Tables(spark, sf_dir)
    _, vocab = _bpe_rounds(t)
    fert = vocab.select(
        "word",
        F.size("syms").cast("long").alias("fert"),
        F.length("word").cast("long").alias("chars"),
    )
    sw = (
        t.documents.select(
            "source", F.explode(F.split("text", " ")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("source", "word")
        .agg(F.count("*").alias("f"))
    )
    j = sw.join(fert, "word")
    return j.groupBy("source").agg(
        F.sum("f").cast("long").alias("ws_tokens"),
        F.sum(F.col("f") * F.col("fert"))
        .cast("long")
        .alias("bpe_tokens"),
        F.sum(F.col("f") * F.col("chars"))
        .cast("long")
        .alias("word_chars"),
        F.round(
            F.sum(F.col("f") * F.col("fert")).cast("double")
            / F.sum("f"),
            6,
        ).alias("fertility"),
        F.round(
            F.sum(F.col("f") * F.col("chars")).cast("double")
            / F.sum(F.col("f") * F.col("fert")),
            6,
        ).alias("chars_per_token"),
    )

# ---------------------------------------------------------------------------
# sim_knn_graph_greedy — graph-based ANN (deterministic NSW shape)
# ---------------------------------------------------------------------------

_NSW_DEG = 4  # intra-bucket exact-NN out-degree
_NSW_BUCKET = 128  # locality sub-bucket cap: pair gen <= N*128, never cell-quadratic
_NSW_SKIPS = (1, -1, 16, -16, 256, -256)  # deterministic long links
_NSW_HOPS = 6
_NSW_QUERY = 0


def _nsw_oracle() -> str:
    skips = ", ".join(f"CAST({o} AS BIGINT)" for o in _NSW_SKIPS)
    ctes = [
        f"""
    ev AS MATERIALIZED (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) - 1 AS d,
               CAST(ROUND(UNNEST(embedding) * 1e6) AS BIGINT) AS q
        FROM embeddings
    ),
    lab AS (SELECT DISTINCT vec_id, label FROM ev),
    nn AS (SELECT COUNT(*) AS n FROM lab),
    qd AS MATERIALIZED (
        SELECT a.vec_id, SUM((a.q - b.q) * (a.q - b.q)) AS dd
        FROM ev a JOIN ev b ON b.vec_id = {_NSW_QUERY} AND b.d = a.d
        GROUP BY 1
    ),
    prj AS (  -- locality key: the level-1 signed projection
        SELECT vec_id,
               {_rpt_sign_case(_RPT_PRIMES[0])} AS p1
        FROM ev GROUP BY 1
    ),
    buck AS MATERIALIZED (  -- p1-ordered sub-buckets of <= {_NSW_BUCKET}
        SELECT l.vec_id, l.label,
               CAST((ROW_NUMBER() OVER (PARTITION BY l.label
                                        ORDER BY p.p1, l.vec_id) - 1)
                    // {_NSW_BUCKET} AS BIGINT) AS bk
        FROM lab l JOIN prj p ON p.vec_id = l.vec_id
    ),
    pairs AS (
        SELECT x.vec_id AS s, y.vec_id AS t,
               SUM((a.q - b.q) * (a.q - b.q)) AS dd
        FROM buck x
        JOIN buck y ON x.label = y.label AND x.bk = y.bk
                   AND x.vec_id <> y.vec_id
        JOIN ev a ON a.vec_id = x.vec_id
        JOIN ev b ON b.vec_id = y.vec_id AND b.d = a.d
        GROUP BY 1, 2
    ),
    knn AS (
        SELECT s, t FROM (
            SELECT s, t,
                   ROW_NUMBER() OVER (PARTITION BY s
                                      ORDER BY dd, t) AS rk
            FROM pairs
        ) WHERE rk <= {_NSW_DEG}
    ),
    skip AS (
        SELECT l.vec_id AS s,
               (l.vec_id + u.o + (SELECT n FROM nn))
                   % (SELECT n FROM nn) AS t
        FROM lab l, UNNEST([{skips}]) AS u(o)
    ),
    nbrs AS MATERIALIZED (
        SELECT DISTINCT s, t FROM (
            SELECT s, t FROM knn
            UNION ALL
            SELECT sk.s, sk.t
            FROM skip sk JOIN lab ex ON ex.vec_id = sk.t
        )
        WHERE s <> {_NSW_QUERY} AND t <> {_NSW_QUERY} AND s <> t
    ),
    h0 AS (
        SELECT MIN(vec_id) AS node FROM lab
        WHERE vec_id <> {_NSW_QUERY}
    )"""
    ]
    for r in range(1, _NSW_HOPS + 1):
        ctes.append(f"""
    h{r} AS MATERIALIZED (
        SELECT node FROM (
            SELECT c.node,
                   ROW_NUMBER() OVER (ORDER BY q.dd, c.node) AS rk
            FROM (
                SELECT nb.t AS node
                FROM nbrs nb JOIN h{r - 1} h ON nb.s = h.node
                UNION ALL
                SELECT node FROM h{r - 1}
            ) c JOIN qd q ON q.vec_id = c.node
        ) WHERE rk = 1
    )""")
    sel = " UNION ALL ".join(
        f"SELECT {r} AS hop, node FROM h{r}"
        for r in range(_NSW_HOPS + 1)
    )
    return (
        "WITH "
        + ",".join(ctes)
        + f"""
    SELECT CAST(w.hop AS BIGINT) AS hop,
           CAST(w.node AS BIGINT) AS vec_id,
           ROUND(CAST(q.dd AS DOUBLE) / 1e12, 6) AS l2_sq
    FROM ({sel}) w JOIN qd q ON q.vec_id = w.node
    ORDER BY hop
    """
    )


@query("sim_knn_graph_greedy", oracle=_nsw_oracle)
def sim_knn_graph_greedy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GRAPH-BASED ANN (the HNSW/NSW family — the fourth modern ANN
    shape beside LSH buckets, IVF cells and PQ codes): build a
    navigable neighbor graph — per vector its 4 exact nearest
    neighbors within its label cell (bounded candidate generation,
    the `emb_neardup_lsh` argument) PLUS deterministic skip links at
    id offsets ±{1,16,256} (the long-range edges NSW gets from
    insertion order, reproduced arithmetically so both engines build
    the identical graph) — then GREEDY-SEARCH it: from the lowest
    non-query vector, hop 6 times to the neighbor closest to the
    query, staying put at a local minimum.  Output: the full
    navigation chain (hop, node, distance) — the convergence trace a
    graph-ANN deployment inspects, ending at the search answer.

    Exactness: integer micro-distances everywhere (graph edges, hop
    argmins — ties on node id), display-only /1e12.

    Scale shape: graph construction is the write-path job (cell-
    bounded pair gen → at 100 TB, NN-descent refinement over the same
    bounded candidates); the QUERY touches out-degree·hops ≈ 60
    vectors — independent of corpus size, the property that makes
    graph ANN the latency king.  Here each hop is a 1-row broadcast
    argmin."""
    t = Tables(spark, sf_dir)
    ev = t.embeddings.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> CAST(ROUND(x * 1e6) AS BIGINT))"
        ).alias("qv"),
    )
    n_total = ev.agg(F.count("*").alias("n"))
    d2 = F.aggregate(
        F.zip_with("qv", "q2", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    qvec = ev.filter(F.col("vec_id") == _NSW_QUERY).select(
        F.col("qv").alias("q2")
    )
    qd = (
        ev.join(F.broadcast(qvec))
        .withColumn("dd", d2)
        .select("vec_id", "dd")
    )
    # locality sub-buckets: order each cell by the level-1 signed
    # projection (emb_rp_tree_knn's p1) and cut every _NSW_BUCKET
    # vectors — pair generation is N·bucket, never cell-quadratic (the
    # 20x probe caught the fixed-cell-count quadratic: 378 s -> ~2 s)
    half = _RPT_MOD // 2 + 1
    p1 = F.aggregate(
        F.zip_with(
            "qv",
            F.expr(
                f"transform(sequence(1, size(qv)), d -> "
                f"CASE WHEN (d * {_RPT_PRIMES[0]}) % {_RPT_MOD}"
                f" < {half} THEN 1L ELSE -1L END)"
            ),
            lambda x, sg: x * sg,
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    bucketed = ev.withColumn("p1", p1).withColumn(
        "bk",
        F.expr(
            f"(row_number() OVER (PARTITION BY label"
            f" ORDER BY p1, vec_id) - 1) div {_NSW_BUCKET}"
        ),
    )
    # single-file fixture = one scan task: spread the d2 folds across
    # the executor threads before the pair join (house perf trap #1)
    a = bucketed.select("vec_id", "label", "bk", "qv").repartition(
        32, "vec_id"
    )
    b = bucketed.select(
        F.col("vec_id").alias("t"),
        F.col("label").alias("lb"),
        F.col("bk").alias("bk2"),
        F.col("qv").alias("q2"),
    )
    pairs = (
        a.join(
            b,
            (F.col("label") == F.col("lb"))
            & (F.col("bk") == F.col("bk2"))
            & (F.col("vec_id") != F.col("t")),
        )
        .withColumn("dd", d2)
        .select(F.col("vec_id").alias("s"), "t", "dd")
    )
    knn = (
        pairs.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("s").orderBy("dd", "t")
            ),
        )
        .filter(F.col("rk") <= _NSW_DEG)
        .select("s", "t")
    )
    offs = F.array(*[F.lit(o).cast("long") for o in _NSW_SKIPS])
    skip = (
        ev.select("vec_id")
        .join(F.broadcast(n_total))
        .select(
            F.col("vec_id").alias("s"),
            F.explode(offs).alias("o"),
            "n",
        )
        .select(
            "s",
            ((F.col("s") + F.col("o") + F.col("n")) % F.col("n")).alias(
                "t"
            ),
        )
        .join(
            ev.select(F.col("vec_id").alias("t")), "t", "left_semi"
        )
    )
    nbrs = (
        knn.unionByName(skip)
        .filter(
            (F.col("s") != _NSW_QUERY)
            & (F.col("t") != _NSW_QUERY)
            & (F.col("s") != F.col("t"))
        )
        .distinct()
    )
    # Adjacency annotated with each target's query distance, built
    # ONCE and PARTITIONED BY SOURCE NODE (hash on s; localCheckpoint
    # so the 6 navigation joins scan the materialized edge set instead
    # of re-deriving the pair generation per hop).  Round-9 rewrite:
    # the walk itself is DECLARATIVE — the whole 6-hop chain is one
    # Spark plan carrying the navigation trace as a 1-row
    # array<struct<hop,node,dd>> state, each hop one broadcast join
    # (the 1-row state is the broadcast side) + one tiny argmin agg —
    # no per-hop driver collect, no repartition(1) single-task chain,
    # no createDataFrame.  The argmin is exact integer (dd, id), so
    # the struct MIN mirrors the oracle's ROW_NUMBER tie-break.
    nd = (
        nbrs.join(
            qd.select(
                F.col("vec_id").alias("t"), F.col("dd").alias("tdd")
            ),
            "t",
        )
        .select("s", "t", "tdd")
        .repartition(4, "s")
        .localCheckpoint()
    )
    state = (
        qd.filter(F.col("vec_id") != _NSW_QUERY)
        .orderBy("vec_id")
        .limit(1)
        .select(
            F.array(
                F.struct(
                    F.lit(0).cast("bigint").alias("hop"),
                    F.col("vec_id").alias("node"),
                    F.col("dd").alias("dd"),
                )
            ).alias("chain")
        )
    )
    for r in range(1, _NSW_HOPS + 1):
        cur = F.element_at(F.col("chain"), -1)
        # every node keeps >= 3 skip links (s != t, t != query are the
        # only prunes and |skips| = 3 distinct offsets), so the inner
        # join can never drop the 1-row state
        best = (
            nd.join(F.broadcast(state), F.col("s") == cur["node"])
            .groupBy("chain")
            .agg(F.min(F.struct("tdd", "t")).alias("b"))
        )
        cur2 = F.element_at(F.col("chain"), -1)
        better = (F.col("b.tdd") < cur2["dd"]) | (
            (F.col("b.tdd") == cur2["dd"])
            & (F.col("b.t") < cur2["node"])
        )
        step = F.when(
            better,
            F.struct(
                F.lit(r).cast("bigint").alias("hop"),
                F.col("b.t").alias("node"),
                F.col("b.tdd").alias("dd"),
            ),
        ).otherwise(
            F.struct(
                F.lit(r).cast("bigint").alias("hop"),
                cur2["node"].alias("node"),
                cur2["dd"].alias("dd"),
            )
        )
        state = best.select(
            F.concat("chain", F.array(step)).alias("chain")
        )
    return (
        state.select(
            F.explode("chain").alias("c")
        )
        .select(
            F.col("c.hop").alias("hop"),
            F.col("c.node").alias("vec_id"),
            F.round(
                F.col("c.dd").cast("double") / 1e12, 6
            ).alias("l2_sq"),
        )
        .orderBy("hop")
    )


# ---------------------------------------------------------------------------
# graph_louvain_move — one synchronous Louvain local-move round
# ---------------------------------------------------------------------------


def _louvain_oracle() -> str:
    from .extras2 import _COMOVE_ORACLE_CTES

    return f"""
    WITH {_COMOVE_ORACLE_CTES},
    comm AS (
        SELECT user_id,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT))
                    // (COUNT(*) * 1000) AS BIGINT) AS community
        FROM events GROUP BY user_id
    ),
    m AS (SELECT COUNT(*) AS m FROM e),
    deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT u AS node FROM e UNION ALL SELECT v FROM e
        ) GROUP BY node
    ),
    nodes AS (
        SELECT comm.user_id, comm.community, COALESCE(deg.d, 0) AS d
        FROM comm LEFT JOIN deg ON deg.node = comm.user_id
    ),
    stot AS (
        SELECT community, SUM(d) AS st FROM nodes GROUP BY 1
    ),
    inc AS (
        SELECT x.node AS i, n2.community AS c, COUNT(*) AS kic
        FROM (SELECT u AS node, v AS nbr FROM e
              UNION ALL SELECT v, u FROM e) x
        JOIN nodes n2 ON n2.user_id = x.nbr
        GROUP BY 1, 2
    ),
    base AS (
        SELECT n.user_id AS i, n.community AS a, n.d AS ki,
               COALESCE(ia.kic, 0) AS kia, sa.st AS sta
        FROM nodes n
        JOIN stot sa ON sa.community = n.community
        LEFT JOIN inc ia
          ON ia.i = n.user_id AND ia.c = n.community
    ),
    cand AS (
        SELECT b.i, b.a, inc.c,
               2 * (SELECT m FROM m) * inc.kic - st.st * b.ki
               - (2 * (SELECT m FROM m) * b.kia
                  - (b.sta - b.ki) * b.ki) AS g
        FROM base b
        JOIN inc ON inc.i = b.i AND inc.c <> b.a
        JOIN stot st ON st.community = inc.c
    ),
    best AS (
        SELECT i, c, g FROM (
            SELECT i, c, g,
                   ROW_NUMBER() OVER (PARTITION BY i
                                      ORDER BY g DESC, c) AS rk
            FROM cand
        ) WHERE rk = 1
    ),
    newlab AS (
        SELECT b.i AS user_id, b.ki AS d,
               CASE WHEN best.g > 0 THEN best.c ELSE b.a END
                   AS community
        FROM base b LEFT JOIN best ON best.i = b.i
    ),
    intra AS (
        SELECT a.community, COUNT(*) AS l
        FROM e
        JOIN newlab a ON a.user_id = e.u
        JOIN newlab c ON c.user_id = e.v
                     AND c.community = a.community
        GROUP BY 1
    )
    SELECT n.community,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(COALESCE(MAX(intra.l), 0) AS BIGINT)
               AS internal_edges,
           CAST(SUM(n.d) AS BIGINT) AS degree_sum,
           ROUND(CAST(COALESCE(MAX(intra.l), 0) AS DOUBLE)
                     / (SELECT m FROM m)
                 - (CAST(SUM(n.d) AS DOUBLE) * CAST(0.5 AS DOUBLE)
                       / (SELECT m FROM m))
                   * (CAST(SUM(n.d) AS DOUBLE) * CAST(0.5 AS DOUBLE)
                       / (SELECT m FROM m)), 6) + 0.0
               AS q_contrib
    FROM newlab n LEFT JOIN intra ON intra.community = n.community
    GROUP BY n.community
    """


@query("graph_louvain_move", oracle=_louvain_oracle)
def graph_louvain_move(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One SYNCHRONOUS LOUVAIN LOCAL-MOVE round over the co-movement
    graph, starting from `graph_modularity`'s value-band partition:
    every node evaluates moving to each NEIGHBOR community and takes
    the best strictly-positive modularity gain (ties → lowest
    community id), all moves applied at once — the parallel-Louvain
    sweep (Blondel et al. phase 1, synchronous variant), i.e. the
    community-refinement step a clustering pipeline runs on top of
    any initial labeling.  Output: `graph_modularity`'s per-community
    statement (n_nodes, internal edges, degree mass, Q-contribution)
    for the POST-MOVE partition, so the two keys read as
    before/after.

    Exactness: the gain comparison is the EXACT INTEGER
    2m·k_{i→c} − Σtot_c·k_i − (2m·k_{i→a} − (Σtot_a − k_i)·k_i) —
    no float modularity ever decides a move; Σtot/degrees are
    pre-move (synchronous).  Q display carries the house +0.0.

    Scale shape: k_{i→c} is one hash agg over the (directed) edge
    list joined to the broadcast-sized community map; the argmax is a
    per-node window over neighbor communities — everything linear in
    edges, the same budget as one PageRank iteration."""
    from .mining import comovement_edges

    t = Tables(spark, sf_dir)
    e = comovement_edges(spark, sf_dir)
    comm = t.events.groupBy("user_id").agg(
        F.expr(
            "sum(cast(round(value * 100) as bigint))"
            " div (count(*) * 1000)"
        ).alias("community")
    )
    m = e.agg(F.count("*").alias("m"))
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    nodes = comm.join(
        deg, comm.user_id == deg.node, "left"
    ).select(
        "user_id", "community", F.coalesce("d", F.lit(0)).alias("d")
    )
    stot = nodes.groupBy("community").agg(F.sum("d").alias("st"))
    directed = e.select(
        F.col("u").alias("node"), F.col("v").alias("nbr")
    ).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    n2 = nodes.select(
        F.col("user_id").alias("nbr"),
        F.col("community").alias("c"),
    )
    inc = (
        directed.join(n2, "nbr")
        .groupBy(F.col("node").alias("i"), "c")
        .agg(F.count("*").alias("kic"))
    )
    base = (
        nodes.join(
            stot.withColumnRenamed("st", "sta"), "community"
        )
        .join(
            inc.select(
                F.col("i").alias("user_id"),
                F.col("c").alias("community"),
                F.col("kic").alias("kia"),
            ),
            ["user_id", "community"],
            "left",
        )
        .select(
            F.col("user_id").alias("i"),
            F.col("community").alias("a"),
            F.col("d").alias("ki"),
            F.coalesce("kia", F.lit(0)).alias("kia"),
            "sta",
        )
    )
    cand = (
        base.join(
            inc, (inc.i == base.i) & (inc.c != base.a)
        )
        .join(
            F.broadcast(
                stot.select(
                    F.col("community").alias("c"),
                    F.col("st").alias("stc"),
                )
            ),
            "c",
        )
        .join(F.broadcast(m))
        .select(
            base.i.alias("i"),
            "a",
            "c",
            (
                2 * F.col("m") * F.col("kic")
                - F.col("stc") * F.col("ki")
                - (
                    2 * F.col("m") * F.col("kia")
                    - (F.col("sta") - F.col("ki")) * F.col("ki")
                )
            ).alias("g"),
        )
    )
    best = (
        cand.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("i").orderBy(F.col("g").desc(), "c")
            ),
        )
        .filter(F.col("rk") == 1)
        .select("i", F.col("c").alias("bc"), "g")
    )
    newlab = (
        base.join(best, "i", "left")
        .select(
            F.col("i").alias("user_id"),
            F.col("ki").alias("d"),
            F.when(F.col("g") > 0, F.col("bc"))
            .otherwise(F.col("a"))
            .alias("community"),
        )
    )
    na, nc = newlab.alias("na"), newlab.alias("nc")
    intra = (
        e.join(na, F.col("na.user_id") == e.u)
        .join(
            nc,
            (F.col("nc.user_id") == e.v)
            & (F.col("nc.community") == F.col("na.community")),
        )
        .groupBy(F.col("na.community").alias("community"))
        .agg(F.count("*").alias("l"))
    )
    return (
        newlab.join(F.broadcast(intra), "community", "left")
        .join(F.broadcast(m))
        .groupBy("community")
        .agg(
            F.count("*").alias("n_nodes"),
            F.coalesce(F.max("l"), F.lit(0)).alias("internal_edges"),
            F.sum("d").alias("degree_sum"),
            # literals CAST AS DOUBLE on both engines (the
            # sketch_hll_distinct house rule: bare decimal literals
            # type as DECIMAL in DuckDB with engine-specific scale)
            (
                F.round(
                    F.coalesce(F.max("l"), F.lit(0)).cast("double")
                    / F.max("m")
                    - (F.sum("d").cast("double") * F.lit(0.5)
                       / F.max("m"))
                    * (F.sum("d").cast("double") * F.lit(0.5)
                       / F.max("m")),
                    6,
                )
                + 0.0
            ).alias("q_contrib"),
        )
    )

# ---------------------------------------------------------------------------
# rel_conformal_bounds — split-conformal prediction intervals, exactly
# ---------------------------------------------------------------------------

_CONF_ALPHA_NUM, _CONF_ALPHA_DEN = 9, 10  # 1 - alpha = 9/10


@query(
    "rel_conformal_bounds",
    oracle=f"""
    WITH ev AS (
        SELECT event_id, user_id,
               CAST(ROUND(value * 100) AS BIGINT) AS y,
               event_id % 2 = 0 AS is_cal
        FROM events
    ),
    mu AS (  -- per-user shifted-floor mean over the CALIBRATION half
        SELECT user_id,
               CAST((SUM(y) + COUNT(*) * 100000000) // COUNT(*)
                    AS BIGINT) - 100000000 AS mu
        FROM ev WHERE is_cal GROUP BY user_id
    ),
    resid AS (
        SELECT ev.event_id, ABS(ev.y - mu.mu) AS r, ev.is_cal
        FROM ev JOIN mu USING (user_id)
    ),
    ncal AS (SELECT COUNT(*) AS n FROM resid WHERE is_cal),
    k AS (  -- conformal rank: ceil((1-alpha)·(n_cal+1)), integer
        SELECT CAST(({_CONF_ALPHA_NUM} * (n + 1) + {_CONF_ALPHA_DEN}
                     - 1) // {_CONF_ALPHA_DEN} AS BIGINT) AS k
        FROM ncal
    ),
    qhat AS (
        SELECT r AS q FROM (
            SELECT r, ROW_NUMBER() OVER (ORDER BY r, event_id) AS rn
            FROM resid WHERE is_cal
        ) WHERE rn = (SELECT k FROM k)
    )
    SELECT CAST((SELECT n FROM ncal) AS BIGINT) AS n_cal,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           ROUND(CAST((SELECT q FROM qhat) AS DOUBLE) / 100, 6)
               AS qhat,
           CAST(SUM(CASE WHEN r <= (SELECT q FROM qhat)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
           ROUND(CAST(SUM(CASE WHEN r <= (SELECT q FROM qhat)
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS coverage
    FROM resid WHERE NOT is_cal
    """,
)
def rel_conformal_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL PREDICTION INTERVALS with an exact coverage
    audit — the distribution-free uncertainty wrapper modern ML evals
    put around any point predictor: calibrate on the even-id half
    (predictor = per-user shifted-floor mean, the `emb_kmeans_exact`
    integer-mean recipe), take qhat = the ceil((1−α)(n+1))-th smallest
    absolute residual (α = 0.1) as an EXACT order statistic, then
    audit empirical coverage on the odd-id half — the guarantee says
    coverage >= 90%, and this row measures it.

    Every decision is integer-exact: centi-quantized values, shifted
    integer means, the conformal rank as integer ceiling arithmetic,
    the order statistic by ROW_NUMBER, covered-counts as integer
    compares; the two displays (qhat in value units, the coverage
    ratio) are final-projection divisions.

    Scale shape: one hash agg for the per-user means (broadcast back),
    one global top-k-style order statistic (at fleet scale: two-phase
    — per-partition counts then one boundary pass, the
    `pipe_doc_shuffle` global-rank pattern), one counting pass over
    the test half."""
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "event_id",
        "user_id",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("y"),
        (F.col("event_id") % 2 == 0).alias("is_cal"),
    )
    mu = (
        ev.filter("is_cal")
        .groupBy("user_id")
        .agg(
            (
                F.expr(
                    "(sum(y) + count(*) * 100000000) div count(*)"
                )
                - F.lit(100000000)
            ).alias("mu")
        )
    )
    resid = ev.join(mu, "user_id").select(
        "event_id",
        F.abs(F.col("y") - F.col("mu")).alias("r"),
        "is_cal",
    )
    cal = resid.filter("is_cal")
    ncal = cal.agg(F.count("*").alias("n"))
    k = ncal.select(
        F.expr(
            f"({_CONF_ALPHA_NUM} * (n + 1) + {_CONF_ALPHA_DEN} - 1)"
            f" div {_CONF_ALPHA_DEN}"
        ).alias("k")
    )
    qhat = (
        cal.withColumn(
            "rn", F.row_number().over(W.orderBy("r", "event_id"))
        )
        .join(F.broadcast(k))
        .filter(F.col("rn") == F.col("k"))
        .select(F.col("r").alias("q"))
    )
    test = resid.filter(~F.col("is_cal"))
    return (
        test.join(F.broadcast(qhat))
        .join(F.broadcast(ncal))
        .agg(
            F.max("n").cast("long").alias("n_cal"),
            F.count("*").cast("long").alias("n_test"),
            F.round(F.max("q").cast("double") / 100, 6).alias(
                "qhat"
            ),
            F.sum(
                F.when(F.col("r") <= F.col("q"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_covered"),
            (
                F.round(
                    F.sum(
                        F.when(F.col("r") <= F.col("q"), 1).otherwise(
                            0
                        )
                    ).cast("double")
                    / F.count("*"),
                    6,
                )
            ).alias("coverage"),
        )
    )

# ---------------------------------------------------------------------------
# rel_ttest_welch — Welch's two-sample t from exact integer moments
# ---------------------------------------------------------------------------

# Welch t and Satterthwaite df from the exact integer moments
# (n, Σy, Σy²) of each group — one shared display projection
# (`rel_regr_exact` discipline); vi = (Σy² − (Σy)²/n)/(n−1).
_TT_V1 = (
    "((CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)"
    " / CAST(n1 AS DOUBLE)) / (CAST(n1 AS DOUBLE) - 1))"
)
_TT_V2 = (
    "((CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)"
    " / CAST(n2 AS DOUBLE)) / (CAST(n2 AS DOUBLE) - 1))"
)
_TT_SE2 = (
    f"({_TT_V1} / CAST(n1 AS DOUBLE)"
    f" + {_TT_V2} / CAST(n2 AS DOUBLE))"
)
_TT_FINAL = f"""
    user_id,
    CAST(n1 AS BIGINT) AS n1,
    CAST(n2 AS BIGINT) AS n2,
    ROUND((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
           - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE))
          / SQRT({_TT_SE2}) / 100, 6) + 0.0 AS t_stat,
    ROUND({_TT_SE2} * {_TT_SE2}
          / ({_TT_V1} * {_TT_V1}
             / (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
                * (CAST(n1 AS DOUBLE) - 1))
             + {_TT_V2} * {_TT_V2}
               / (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE)
                  * (CAST(n2 AS DOUBLE) - 1))), 6) + 0.0 AS df_welch
"""


@query(
    "rel_ttest_welch",
    oracle=f"""
    WITH q AS (
        SELECT user_id, event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS y
        FROM events WHERE event_type IN ('click', 'view')
    ),
    m AS (
        SELECT user_id,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS n1,
               SUM(CASE WHEN event_type = 'click' THEN y ELSE 0 END)
                   AS s1,
               SUM(CASE WHEN event_type = 'click' THEN y * y
                        ELSE 0 END) AS q1,
               SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS n2,
               SUM(CASE WHEN event_type = 'view' THEN y ELSE 0 END)
                   AS s2,
               SUM(CASE WHEN event_type = 'view' THEN y * y
                        ELSE 0 END) AS q2
        FROM q GROUP BY user_id
    )
    SELECT {_TT_FINAL}
    FROM m WHERE n1 >= 2 AND n2 >= 2
      AND (n1 * q1 - s1 * s1 > 0 OR n2 * q2 - s2 * s2 > 0)
    """,
)
def rel_ttest_welch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WELCH'S TWO-SAMPLE T-TEST per user ('click' vs 'view' values) —
    the parametric sibling of `rel_mann_whitney`, completing the A/B
    screening family (t, Mann–Whitney U, KS, chi², Benford).  The
    house way: ONE map-side-combinable hash aggregation sums exact
    integer moments (n, Σy, Σy² per group, centi-quantized — Σy² ≤
    ~7e11, comfortably int64), the n≥2 membership gates are integer,
    and the t statistic + Welch–Satterthwaite df are one final shared
    display projection (the /100 restores value units from centi).

    Native stddev/variance aggregates accumulate doubles and are
    partitioning-order-dependent at the ulp; integer moments make the
    test statistic engine- and shuffle-exact.  Displays carry +0.0
    (t crosses zero).

    Scale shape: one integer hash agg over the fact table; the test
    algebra runs on one row per user."""
    t = Tables(spark, sf_dir)
    from .extras5 import _split_top_level

    q = t.events.filter(
        F.col("event_type").isin("click", "view")
    ).selectExpr(
        "user_id",
        "event_type",
        "CAST(ROUND(value * 100) AS BIGINT) AS y",
    )
    m = q.groupBy("user_id").agg(
        F.expr(
            "SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)"
        ).alias("n1"),
        F.expr(
            "SUM(CASE WHEN event_type = 'click' THEN y ELSE 0 END)"
        ).alias("s1"),
        F.expr(
            "SUM(CASE WHEN event_type = 'click' THEN y * y"
            " ELSE 0 END)"
        ).alias("q1"),
        F.expr(
            "SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)"
        ).alias("n2"),
        F.expr(
            "SUM(CASE WHEN event_type = 'view' THEN y ELSE 0 END)"
        ).alias("s2"),
        F.expr(
            "SUM(CASE WHEN event_type = 'view' THEN y * y"
            " ELSE 0 END)"
        ).alias("q2"),
    )
    # Membership also excludes the degenerate both-groups-constant
    # case (SE² = 0 → t = ±inf, whose ROUND/display semantics differ
    # across engines).  The gate is INTEGER-exact — n·Σy² − (Σy)² is
    # the variance numerator, ≥ 0 by Cauchy–Schwarz, so "> 0" means
    # "group has nonzero variance" with no float in the decision —
    # and is mirrored verbatim in the oracle WHERE clause.
    return m.filter(
        "n1 >= 2 AND n2 >= 2"
        " AND (n1 * q1 - s1 * s1 > 0 OR n2 * q2 - s2 * s2 > 0)"
    ).selectExpr(*_split_top_level(_TT_FINAL))


# ---------------------------------------------------------------------------
# rel_bootstrap_ci — Poisson bootstrap confidence interval, one pass
# ---------------------------------------------------------------------------

_BOOT_B = 32  # replicates
_BOOT_SALT = "boot8"
# Poisson(1) inverse-CDF thresholds on a micro-uniform (md5-derived):
# P(X<=k) for k = 0..3, micro-quantized; multiplicity capped at 4.
_BOOT_T = (367879, 735759, 919699, 981012)


def _boot_mult_sql(u: str) -> str:
    return (
        f"CASE WHEN {u} < {_BOOT_T[0]} THEN 0"
        f" WHEN {u} < {_BOOT_T[1]} THEN 1"
        f" WHEN {u} < {_BOOT_T[2]} THEN 2"
        f" WHEN {u} < {_BOOT_T[3]} THEN 3 ELSE 4 END"
    )


@query(
    "rel_bootstrap_ci",
    oracle=f"""
    WITH ev AS (
        SELECT event_id,
               CAST(ROUND(value * 100) AS BIGINT) AS y
        FROM events
    ),
    rep AS (
        SELECT b.b, ev.y,
               {_boot_mult_sql(
                   "CAST(('0x' || substr(md5(CAST(ev.event_id AS VARCHAR)"
                   " || '#' || CAST(b.b AS VARCHAR)"
                   f" || '#{_BOOT_SALT}'), 1, 8)) AS BIGINT) % 1000000"
               )} AS w
        FROM ev CROSS JOIN
             (SELECT UNNEST(range(1, {_BOOT_B} + 1)) AS b) b
    ),
    means AS (  -- micro-quantized replicate means (exact sort keys;
                -- y > 0 on this schema, so plain floor div — no shift,
                -- which overflowed at sum(w)·C on 20x clones)
        SELECT b,
               CAST((SUM(w * y) * 1000000) // SUM(w) AS BIGINT) AS mq
        FROM rep GROUP BY b HAVING SUM(w) > 0
    ),
    ranked AS (
        SELECT mq, ROW_NUMBER() OVER (ORDER BY mq, b) AS rn,
               COUNT(*) OVER () AS nb
        FROM means
    )
    SELECT CAST((SELECT COUNT(*) FROM ev) AS BIGINT) AS n_rows,
           CAST((SELECT MAX(nb) FROM ranked) AS BIGINT) AS n_reps,
           ROUND((SELECT CAST(SUM(y) AS DOUBLE) FROM ev)
                 / (SELECT COUNT(*) FROM ev) / 100, 6) AS mean_full,
           ROUND(CAST((SELECT mq FROM ranked WHERE rn = 2) AS DOUBLE)
                 / 1e8, 6) AS ci_lo,
           ROUND(CAST((SELECT mq FROM ranked
                       WHERE rn = (SELECT MAX(nb) FROM ranked) - 1)
                      AS DOUBLE) / 1e8, 6) AS ci_hi
    """,
)
def rel_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP confidence interval for the mean event value
    — the bootstrap that actually runs at 100 TB: instead of shuffling
    B resamples, every row draws a Poisson(1) multiplicity per
    replicate in ONE streaming pass (the standard large-scale recipe),
    here with md5-derived deterministic draws (inverse CDF on a
    micro-uniform, multiplicity capped at 4 ≈ P 0.9963) so both
    engines replay the identical resampling.  CI = the 2nd and
    (B−1)-th order statistics of the B=32 replicate means (~94%
    interval).

    Exactness: multiplicities are integer md5 arithmetic (the
    `pipe_leakage_safe_split` hash-split recipe); each replicate mean
    is micro-quantized by the shifted integer floor division, so the
    order statistics sort exact BIGINT keys; the three displays are
    final-projection divisions.

    Scale shape: one rows×B explode (flat map, no shuffle of data
    rows) into a B-group hash agg — map-side combinable, replicate
    count independent of data size; the order statistic runs on 32
    rows."""
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "event_id",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("y"),
    )
    u = (
        f"CAST(conv(substr(md5(concat(CAST(event_id AS STRING), '#',"
        f" CAST(b AS STRING), '#{_BOOT_SALT}')), 1, 8), 16, 10)"
        f" AS BIGINT) % 1000000"
    )
    rep = ev.select(
        "event_id",
        "y",
        F.explode(
            F.sequence(F.lit(1), F.lit(_BOOT_B))
        ).alias("b"),
    ).selectExpr("b", "y", f"{_boot_mult_sql(u)} AS w")
    means = (
        rep.groupBy("b")
        .agg(
            # y > 0 (events.value >= 0.01), so truncating div == floor
            # without the +C shift (which overflowed at 20x clones)
            F.expr("(sum(w * y) * 1000000) div sum(w)").alias("mq"),
            F.sum("w").alias("sw"),
        )
        .filter("sw > 0")
        .select("b", "mq")
    )
    ranked = means.select(
        "mq",
        F.row_number().over(W.orderBy("mq", "b")).alias("rn"),
        F.count("*").over(W.partitionBy()).alias("nb"),
    )
    full = ev.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.round(
            F.sum("y").cast("double") / F.count("*") / 100, 6
        ).alias("mean_full"),
    )
    lo = ranked.filter("rn = 2").select(
        F.round(F.col("mq").cast("double") / 1e8, 6).alias("ci_lo")
    )
    hi = ranked.filter("rn = nb - 1").select(
        F.round(F.col("mq").cast("double") / 1e8, 6).alias("ci_hi"),
        F.col("nb").cast("long").alias("n_reps"),
    )
    return (
        full.join(F.broadcast(hi))
        .join(F.broadcast(lo))
        .select("n_rows", "n_reps", "mean_full", "ci_lo", "ci_hi")
    )

# ---------------------------------------------------------------------------
# rel_survival_km — Kaplan–Meier time-to-event curve
# ---------------------------------------------------------------------------

_KM_HORIZON_H = 72  # administrative censoring horizon (hours)


@query(
    "rel_survival_km",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us
        FROM events
    ),
    f AS (SELECT user_id, MIN(us) AS first_us FROM ev GROUP BY 1),
    p AS (
        SELECT user_id, MIN(us) AS first_buy FROM ev
        WHERE event_type = 'purchase' GROUP BY 1
    ),
    subj AS (  -- per subject: latency hours + event/censor flag
        SELECT f.user_id,
               CASE WHEN p.first_buy IS NOT NULL
                     AND (p.first_buy - f.first_us) // 3600000000
                         < {_KM_HORIZON_H}
                    THEN (p.first_buy - f.first_us) // 3600000000
                    ELSE {_KM_HORIZON_H} END AS t,
               CASE WHEN p.first_buy IS NOT NULL
                     AND (p.first_buy - f.first_us) // 3600000000
                         < {_KM_HORIZON_H}
                    THEN 1 ELSE 0 END AS e
        FROM f LEFT JOIN p USING (user_id)
    ),
    n_all AS (SELECT COUNT(*) AS n FROM subj),
    times AS (
        SELECT t, SUM(e) AS d, COUNT(*) - SUM(e) AS c
        FROM subj GROUP BY t
    ),
    risk AS (  -- at-risk = subjects with t_i >= t (exact cumsum)
        SELECT t, d, c,
               (SELECT n FROM n_all)
               - COALESCE(SUM(d + c) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING), 0) AS n_risk
        FROM times
    ),
    lq AS (  -- per-time ln factor, micro-quantized ONCE
        SELECT t, d, c, n_risk,
               CASE WHEN d = 0 THEN 0
                    WHEN d = n_risk THEN NULL
                    ELSE CAST(ROUND(LN(CAST(n_risk - d AS DOUBLE)
                                       / n_risk) * 1e6) AS BIGINT)
               END AS lqt
        FROM risk
    ),
    curve AS (
        SELECT t, d, c, n_risk,
               SUM(lqt) OVER (ORDER BY t) AS cum,
               MAX(CASE WHEN lqt IS NULL THEN 1 ELSE 0 END)
                   OVER (ORDER BY t) AS dead
        FROM lq
    )
    SELECT CAST(t AS BIGINT) AS t_hours,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           CAST(c AS BIGINT) AS n_censored,
           CASE WHEN dead = 1 THEN 0.0
                ELSE ROUND(EXP(CAST(cum AS DOUBLE) / 1e6), 6)
           END AS survival
    FROM curve
    """,
)
def rel_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KAPLAN–MEIER time-to-event curve — survival analysis for the
    funnel age: per user, hours from first event to FIRST PURCHASE,
    administratively censored at 72 h (the fixed-horizon study
    design); per distinct time: at-risk count, events, censored, and
    the product-limit survival estimate S(t) = Π (1 − d/n).

    House exactness for a product of rationals: d and n_risk are
    exact integers (the at-risk count is an exact window cumsum, not a
    re-scan), each factor's ln is quantized ONCE to micro-nats
    (the `text_zipf_fit` recipe), the running sum is an INTEGER
    window cumsum, and the only floats are that one quantization and
    the final EXP display; an exhausted risk set (d = n) pins
    survival to exactly 0 thereafter via an integer cummax flag.

    Scale shape: two per-user hash aggs, a distinct-time agg
    (≤ horizon+1 rows), and windows over that tiny frame — the
    subject table is touched twice, the curve is O(horizon)."""
    t = Tables(spark, sf_dir)
    H = _KM_HORIZON_H
    ev = t.events.select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    f = ev.groupBy("user_id").agg(F.min("us").alias("first_us"))
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("us").alias("first_buy"))
    )
    lat = F.expr("(first_buy - first_us) div 3600000000")
    hit = F.col("first_buy").isNotNull() & (lat < H)
    subj = f.join(p, "user_id", "left").select(
        "user_id",
        F.when(hit, lat).otherwise(F.lit(H)).alias("t"),
        F.when(hit, 1).otherwise(0).alias("e"),
    )
    n_all = subj.agg(F.count("*").alias("n"))
    times = subj.groupBy("t").agg(
        F.sum("e").alias("d"),
        (F.count("*") - F.sum("e")).alias("c"),
    )
    wt = W.orderBy("t")
    risk = times.join(F.broadcast(n_all)).select(
        "t",
        "d",
        "c",
        (
            F.col("n")
            - F.coalesce(
                F.sum(F.col("d") + F.col("c")).over(
                    wt.rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        ).alias("n_risk"),
    )
    lq = risk.select(
        "t",
        "d",
        "c",
        "n_risk",
        F.when(F.col("d") == 0, F.lit(0).cast("bigint"))
        .when(F.col("d") == F.col("n_risk"), F.lit(None))
        .otherwise(
            F.expr(
                "CAST(ROUND(LN(CAST(n_risk - d AS DOUBLE) / n_risk)"
                " * 1e6) AS BIGINT)"
            )
        )
        .alias("lqt"),
    )
    curve = lq.select(
        "t",
        "d",
        "c",
        "n_risk",
        F.sum("lqt").over(wt).alias("cum"),
        F.max(
            F.when(F.col("lqt").isNull(), 1).otherwise(0)
        )
        .over(wt)
        .alias("dead"),
    )
    return curve.select(
        F.col("t").cast("long").alias("t_hours"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.col("c").cast("long").alias("n_censored"),
        F.when(F.col("dead") == 1, F.lit(0.0))
        .otherwise(
            F.round(F.exp(F.col("cum").cast("double") / 1e6), 6)
        )
        .alias("survival"),
    )


# ---------------------------------------------------------------------------
# rel_lorenz_gini — exact Gini / Lorenz inequality diagnostics
# ---------------------------------------------------------------------------


@query(
    "rel_lorenz_gini",
    oracle="""
    WITH q AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS y
        FROM events
    ),
    r AS (
        SELECT event_type, y,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY y) AS i
        FROM q
    ),
    m AS (
        SELECT event_type, COUNT(*) AS n, SUM(y) AS sy,
               SUM(CAST(i AS DECIMAL(38, 0)) * y) AS siy
        FROM r GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(sy AS BIGINT) AS sum_cents,
           ROUND((2 * CAST(siy AS DOUBLE)
                  - (CAST(n AS DOUBLE) + 1) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sy AS DOUBLE)), 6)
               AS gini
    FROM m
    """,
)
def rel_lorenz_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI COEFFICIENT per event type — the inequality diagnostic
    data teams run on value/token/traffic distributions (G near 0 =
    uniform spend, near 1 = whale-dominated), via the exact
    rank-sum identity G = (2·Σ i·y_(i) − (n+1)·Σy)/(n·Σy) over the
    ascending-ranked values.

    Exactness: ranks are ROW_NUMBER over (y) — TIES reorder only
    equal values, so Σ i·y is tie-order-invariant; the rank-weighted
    sum accumulates in DECIMAL(38,0) on Spark (HUGEINT in DuckDB, the
    `rel_regr_exact` Σy² precedent — Σ i·y exceeds int64 beyond ~20x
    this corpus); no libm anywhere, one final display division.

    Scale shape: the global rank is the one all-rows pass (at fleet
    scale: the `pipe_doc_shuffle` two-phase range-partition global
    rank); everything after is a per-group aggregate."""
    t = Tables(spark, sf_dir)
    q = t.events.select(
        "event_type",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("y"),
    )
    r = q.withColumn(
        "i",
        F.row_number().over(
            W.partitionBy("event_type").orderBy("y")
        ),
    )
    m = r.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("sy"),
        F.sum(
            F.col("i").cast("decimal(38,0)") * F.col("y")
        ).alias("siy"),
    )
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("sy").cast("long").alias("sum_cents"),
        F.round(
            (
                2 * F.col("siy").cast("double")
                - (F.col("n").cast("double") + 1)
                * F.col("sy").cast("double")
            )
            / (
                F.col("n").cast("double")
                * F.col("sy").cast("double")
            ),
            6,
        ).alias("gini"),
    )

# ---------------------------------------------------------------------------
# sketch_hll_distinct — HyperLogLog cardinality, engine-exact registers
# ---------------------------------------------------------------------------

_HLL_M = 64  # registers (b = 6 index bits of a 32-bit md5 prefix)
_HLL_W = 26  # rank window bits
# linear-counting switch E <= 2.5m rewritten as an INTEGER compare on
# the scaled register sum S = Σ 2^(27 − M_j):
# E = alpha·m²·2^27/S <= 2.5m  ⇔  S >= alpha·m·2^27/2.5
_HLL_LC_S = 2437276962
_HLL_ALPHA = (  # explicit DOUBLEs: bare decimal literals are
    # DECIMAL-typed with engine-specific scale rules (found at sf0.1)
    "(CAST(0.7213 AS DOUBLE) / (1 + CAST(1.079 AS DOUBLE) / 64))"
)


@query(
    "sketch_hll_distinct",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                    1, 8)) AS BIGINT) AS hv
        FROM events
    ),
    rr AS (
        SELECT hv // 67108864 AS idx,
               CASE WHEN hv % 67108864 = 0 THEN {_HLL_W + 1}
                    ELSE {_HLL_W + 1}
                         - LENGTH(bin(hv % 67108864)) END AS rho
        FROM h
    ),
    regs AS (
        SELECT g.idx, COALESCE(MAX(rr.rho), 0) AS m
        FROM (SELECT UNNEST(range(0, {_HLL_M})) AS idx) g
        LEFT JOIN rr ON rr.idx = g.idx
        GROUP BY g.idx
    ),
    s AS (
        SELECT CAST(SUM(CAST(2 AS BIGINT)
                        ** ({_HLL_W + 1} - m)) AS BIGINT) AS s,
               SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS v
        FROM regs
    ),
    truth AS (
        SELECT COUNT(DISTINCT user_id) AS d, COUNT(*) AS n
        FROM events
    )
    SELECT CAST(truth.n AS BIGINT) AS n_rows,
           CAST(truth.d AS BIGINT) AS true_distinct,
           CAST(s.s AS BIGINT) AS reg_sum_scaled,
           CAST(s.v AS BIGINT) AS zero_registers,
           ROUND(CASE WHEN s.v > 0 AND s.s >= {_HLL_LC_S}
                      THEN {_HLL_M} * LN({_HLL_M}
                                         * CAST(1.0 AS DOUBLE) / s.v)
                      ELSE {_HLL_ALPHA} * {_HLL_M} * {_HLL_M}
                           * 134217728.0 / s.s END, 6) AS hll_estimate
    FROM s, truth
    """,
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYPERLOGLOG cardinality — the industry-standard distinct
    sketch (the one `approx_count_distinct` runs internally),
    completing the sketch family (CMS, KMV, equi-depth histogram):
    64 registers over a 32-bit md5 prefix (6 index bits + 26-bit rank
    window), register = max leading-zero rank, raw estimate
    alpha·m²/Σ2^−M with the standard linear-counting fallback for the
    small range.

    Engine-exact the house way: ranks come from LENGTH(bin(h)) —
    identical integer string arithmetic on both engines, no float
    log2; the register sum is carried SCALED as the integer
    S = Σ 2^(27−M_j) (≤ 2^33), so the linear-counting switch
    E ≤ 2.5m becomes the integer compare S ≥ {_HLL_LC_S} (boundary
    decisions never touch a float); the estimate itself is ONE final
    display expression.  Output carries the exact S and
    zero-register count as integer fingerprints beside the display,
    plus the true distinct for the accuracy read-off.

    Scale shape: the register table is a 64-row aggregate of a
    map-side-combinable per-register MAX — the canonical mergeable
    sketch (partition registers merge by max), one scan, O(m)
    state."""
    t = Tables(spark, sf_dir)
    h = t.events.select(
        F.expr(
            "CAST(conv(substr(md5(CAST(user_id AS STRING)), 1, 8),"
            " 16, 10) AS BIGINT)"
        ).alias("hv")
    ).distinct()
    rr = h.select(
        F.expr("hv div 67108864").alias("idx"),
        F.expr(
            f"CASE WHEN hv % 67108864 = 0 THEN {_HLL_W + 1}"
            f" ELSE {_HLL_W + 1} - LENGTH(bin(hv % 67108864)) END"
        ).alias("rho"),
    )
    grid = spark.range(_HLL_M).select(F.col("id").alias("idx"))
    regs = (
        grid.join(rr, "idx", "left")
        .groupBy("idx")
        .agg(F.coalesce(F.max("rho"), F.lit(0)).alias("m"))
    )
    s = regs.agg(
        F.sum(
            F.expr(f"CAST(pow(2, {_HLL_W + 1} - m) AS BIGINT)")
        ).alias("s"),
        F.sum(F.when(F.col("m") == 0, 1).otherwise(0)).alias("v"),
    )
    truth = t.events.agg(
        F.countDistinct("user_id").alias("d"),
        F.count("*").alias("n"),
    )
    return (
        s.join(F.broadcast(truth))
        .select(
            F.col("n").cast("long").alias("n_rows"),
            F.col("d").cast("long").alias("true_distinct"),
            F.col("s").cast("long").alias("reg_sum_scaled"),
            F.col("v").cast("long").alias("zero_registers"),
            F.round(
                F.when(
                    (F.col("v") > 0)
                    & (F.col("s") >= _HLL_LC_S),
                    F.expr(
                        f"{_HLL_M} * LN({_HLL_M}"
                        f" * CAST(1.0 AS DOUBLE) / v)"
                    ),
                ).otherwise(
                    F.expr(
                        f"{_HLL_ALPHA} * {_HLL_M} * {_HLL_M}"
                        f" * 134217728.0 / s"
                    )
                ),
                6,
            ).alias("hll_estimate"),
        )
    )

# ---------------------------------------------------------------------------
# rel_dp_release — differentially-private histogram release + utility audit
# ---------------------------------------------------------------------------

_DP_B = 2.0  # Laplace scale b = sensitivity/epsilon = 1/0.5
_DP_SALT = "dp8"

# seeded Laplace via inverse CDF on an md5 micro-uniform u ∈ [0, 1e6):
# noise = -b·sign(u') · ln(1 − 2|u'|), u' = (u − 5e5)/1e6 — written once
# and shared verbatim by both engines ({u} is the integer uniform).
# u = 0 is the CDF singularity (u' = −0.5 → ln(0) = −inf, which DuckDB
# rejects at the BIGINT cast while Spark saturates — an engine
# divergence waiting on a future salted hash landing on 0), so the
# uniform is clamped to [1, 1e6) with GREATEST before the inverse CDF;
# identical on both engines, and a no-op for every u ≥ 1.
def _dp_noise_sql(u: str) -> str:
    u = f"GREATEST({u}, 1)"
    return (
        f"CAST(ROUND(-{_DP_B} * CASE WHEN {u} >= 500000 THEN 1.0"
        f" ELSE -1.0 END"
        f" * LN(1.0 - 2.0 * ABS(({u} - 500000.0) / 1000000.0)))"
        f" AS BIGINT)"
    )


@query(
    "rel_dp_release",
    oracle=f"""
    WITH g AS (
        SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1
    ),
    u AS (
        SELECT event_type, n,
               CAST(('0x' || substr(md5(event_type || '#{_DP_SALT}'),
                                    1, 8)) AS BIGINT) % 1000000 AS uu
        FROM g
    ),
    rel AS (
        SELECT event_type, n,
               n + {_dp_noise_sql("uu")} AS n_dp
        FROM u
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_true,
           CAST(n_dp AS BIGINT) AS n_released,
           CAST(ABS(n_dp - n) AS BIGINT) AS abs_err,
           ROUND(CAST(SUM(ABS(n_dp - n)) OVER () AS DOUBLE)
                 / SUM(n) OVER (), 6) AS l1_err_ratio
    FROM rel
    """,
)
def rel_dp_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENTIALLY-PRIVATE histogram release with a utility AUDIT:
    the per-event-type counts released under the Laplace mechanism
    (sensitivity 1, ε = 0.5 → b = 2), beside the true counts and the
    per-cell / total L1 error — the privacy-utility table a data
    steward reads before publishing (a production release would drop
    the true columns; the audit op keeps them BECAUSE it is the
    pre-release measurement).

    Determinism: the Laplace draw is seeded — an md5 micro-uniform
    per cell (the `pipe_leakage_safe_split` hash recipe) pushed
    through the inverse CDF, with the single float expression (one
    LN + ROUND) written verbatim on both engines and landing in an
    integer noise term; every downstream value is BIGINT except the
    final ratio display.  Seeded noise is also what a reproducible
    DP pipeline ships: the release is re-derivable from the salt.

    Scale shape: one map-side-combinable count, noise arithmetic on
    the handful of released cells."""
    t = Tables(spark, sf_dir)
    g = t.events.groupBy("event_type").agg(F.count("*").alias("n"))
    u = (
        f"CAST(conv(substr(md5(concat(event_type, '#{_DP_SALT}')),"
        f" 1, 8), 16, 10) AS BIGINT) % 1000000"
    )
    rel = g.selectExpr(
        "event_type",
        "n",
        f"n + {_dp_noise_sql(u)} AS n_dp",
    )
    w = W.partitionBy()
    return rel.select(
        "event_type",
        F.col("n").cast("long").alias("n_true"),
        F.col("n_dp").cast("long").alias("n_released"),
        F.abs(F.col("n_dp") - F.col("n"))
        .cast("long")
        .alias("abs_err"),
        F.round(
            F.sum(F.abs(F.col("n_dp") - F.col("n")))
            .over(w)
            .cast("double")
            / F.sum("n").over(w),
            6,
        ).alias("l1_err_ratio"),
    )


# ---------------------------------------------------------------------------
# rel_winsorized_mean — robust mean via exact order-statistic clamps
# ---------------------------------------------------------------------------


@query(
    "rel_winsorized_mean",
    oracle="""
    WITH q AS (
        SELECT event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS y
        FROM events
    ),
    r AS (
        SELECT event_type, y,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY y) AS i,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM q
    ),
    cuts AS (  -- exact p05 / p95 order statistics (ceil(p·n))
        SELECT event_type,
               MAX(CASE WHEN i = (5 * n + 99) // 100 THEN y END)
                   AS lo,
               MAX(CASE WHEN i = (95 * n + 99) // 100 THEN y END)
                   AS hi
        FROM r GROUP BY event_type
    )
    SELECT q.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN q.y < c.lo THEN 1
                         WHEN q.y > c.hi THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped,
           ROUND(CAST(SUM(CASE WHEN q.y < c.lo THEN c.lo
                          WHEN q.y > c.hi THEN c.hi
                          ELSE q.y END) AS DOUBLE) / COUNT(*) / 100,
                 6) AS winsorized_mean,
           ROUND(CAST(SUM(q.y) AS DOUBLE) / COUNT(*) / 100, 6)
               AS raw_mean
    FROM q JOIN cuts c USING (event_type)
    GROUP BY q.event_type
    """,
)
def rel_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WINSORIZED MEAN per event type (5%/95%) — the robust-mean
    estimator metric pipelines use when raw means are outlier-
    dominated and medians discard too much: clamp to the exact p05 /
    p95 ORDER STATISTICS (rank ceil(p·n) by integer arithmetic — no
    float percentile interpolation, unlike `rel_agg_percentile`'s
    contract), then average the clamped values.

    Every decision is integer: centi-quantized values, ROW_NUMBER
    ranks (ties reorder equal values only), integer ceiling ranks,
    integer clamp compares and sums; the two mean displays are final
    divisions.  Output also counts the clamped rows — the outlier-
    mass diagnostic.

    Scale shape: one per-group rank window + one broadcast of the
    per-group cut pairs + one aggregation pass (at fleet scale the
    cuts come from the two-phase global-rank pattern)."""
    t = Tables(spark, sf_dir)
    q = t.events.select(
        "event_type",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("y"),
    )
    wp = W.partitionBy("event_type")
    r = q.select(
        "event_type",
        "y",
        F.row_number().over(wp.orderBy("y")).alias("i"),
        F.count("*").over(wp).alias("n"),
    )
    cuts = r.groupBy("event_type").agg(
        F.max(
            F.when(
                F.col("i") == F.expr("(5 * n + 99) div 100"),
                F.col("y"),
            )
        ).alias("lo"),
        F.max(
            F.when(
                F.col("i") == F.expr("(95 * n + 99) div 100"),
                F.col("y"),
            )
        ).alias("hi"),
    )
    clamped = F.when(F.col("y") < F.col("lo"), F.col("lo")).when(
        F.col("y") > F.col("hi"), F.col("hi")
    ).otherwise(F.col("y"))
    out_flag = F.when(
        (F.col("y") < F.col("lo")) | (F.col("y") > F.col("hi")), 1
    ).otherwise(0)
    return (
        q.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(out_flag).cast("long").alias("n_clamped"),
            F.round(
                F.sum(clamped).cast("double") / F.count("*") / 100, 6
            ).alias("winsorized_mean"),
            F.round(
                F.sum("y").cast("double") / F.count("*") / 100, 6
            ).alias("raw_mean"),
        )
    )
