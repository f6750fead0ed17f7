"""Round-5 additions (SURVEY.md §2.2 — extras6).

- ``traj_lcss_pair`` / ``traj_edr_pair`` — the remaining two classic
  trajectory similarity measures (LCSS and EDR join Hausdorff /
  Fréchet / DTW; both are eps-matching EDIT formulations, integer-
  valued DPs and therefore exact by construction), FULL recursive-CTE
  oracles via the ``trajectory._dp_layers_sql`` antidiagonal template.
- ``sim_diversify_mmr`` — Maximal-Marginal-Relevance diversified
  top-k over the embedding corpus (the standard retrieval reranker),
  integer-exact on quantized squared distances, unrolled-rounds FULL
  oracle (the ``emb_kmeans_exact`` discipline).
- ``rel_gaps_islands`` — the gaps-and-islands pattern (maximal runs of
  consecutive active days per user).
- ``rel_agg_filtered`` — FILTER-clause conditional aggregation.
- ``text_langid_confusion`` — language-ID confusion matrix (labeled
  lang x predicted lang), composed from ``text_langid``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables
from . import dp_list_sql as _DL

# ---------------------------------------------------------------------------
# traj_lcss_pair / traj_edr_pair — eps-matching edit-style DP measures
# ---------------------------------------------------------------------------

_LCSS_EPS = "10.0"  # eps-matching tolerance (value units; ~5% of range)


def _lcss_edr_series_sql() -> str:
    """Shared av/bv series CTEs (same ordering as the DTW pair row)."""
    return """
    av(i, v) AS (
        SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id), value
        FROM events WHERE user_id = 2
    ),
    bv(j, v) AS (
        SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id), value
        FROM events WHERE user_id = 1
    )"""


def _lcss_pair_oracle() -> str:
    from .trajectory import _dp_layers_sql

    # match(i,j) in {0,1}; L(i,j) = max(W, N, NW + match) with a
    # virtual zero row/col (boundary cells take GREATEST with the bare
    # match value).  Monotone-equivalent to the textbook recurrence:
    # L grows by at most 1 per added element, so NW+1 dominates on a
    # match and never wins spuriously otherwise.
    combine = (
        "GREATEST("
        "MAX(CASE WHEN cur.age = 1 THEN cur.val + cells.d"
        "         ELSE cur.val END), "
        "MAX(CASE WHEN cells.i = 1 OR cells.k - cells.i = 1"
        "         THEN cells.d ELSE 0 END))"
    )
    cost = (
        f"CASE WHEN ABS(av.v - bv.v) <= {_LCSS_EPS} THEN 1 ELSE 0 END"
    )
    dp = _dp_layers_sql("lcss_dp", combine, cost)
    return f"""
    WITH RECURSIVE
    {_lcss_edr_series_sql()},
    {dp},
    nm AS (SELECT (SELECT MAX(i) FROM av) AS n,
                  (SELECT MAX(j) FROM bv) AS m)
    SELECT CAST(2 AS BIGINT) AS user_id,
           CAST((SELECT val FROM lcss_dp
                 WHERE age = 0 AND k = (SELECT n + m FROM nm)
                   AND i = (SELECT n FROM nm)) AS BIGINT) AS lcss_len,
           ROUND(CAST((SELECT val FROM lcss_dp
                       WHERE age = 0 AND k = (SELECT n + m FROM nm)
                         AND i = (SELECT n FROM nm)) AS DOUBLE)
                 / (SELECT LEAST(n, m) FROM nm), 6) AS lcss_sim
    """


def _edr_pair_oracle() -> str:
    from .trajectory import _dp_layers_sql

    # sub(i,j) in {0,1}; E(i,j) = min(NW + sub, N + 1, W + 1) with
    # E(i,0) = i, E(0,j) = j supplied as VIRTUAL boundary candidates
    # (j = k - i inside the layer): i = 1 sees NW = j-1, N = j;
    # j = 1 sees NW = i-1, W = i.
    combine = (
        "LEAST("
        "MIN(CASE WHEN cur.age = 1 THEN cur.val + cells.d"
        "         ELSE cur.val + 1 END), "
        "MIN(CASE WHEN cells.i = 1"
        "         THEN LEAST(cells.k - cells.i - 1 + cells.d,"
        "                    cells.k - cells.i + 1)"
        "         ELSE 1099511627776 END), "
        "MIN(CASE WHEN cells.k - cells.i = 1"
        "         THEN LEAST(cells.i - 1 + cells.d, cells.i + 1)"
        "         ELSE 1099511627776 END))"
    )
    cost = (
        f"CASE WHEN ABS(av.v - bv.v) <= {_LCSS_EPS} THEN 0 ELSE 1 END"
    )
    dp = _dp_layers_sql("edr_dp", combine, cost)
    return f"""
    WITH RECURSIVE
    {_lcss_edr_series_sql()},
    {dp},
    nm AS (SELECT (SELECT MAX(i) FROM av) AS n,
                  (SELECT MAX(j) FROM bv) AS m)
    SELECT CAST(2 AS BIGINT) AS user_id,
           CAST((SELECT val FROM edr_dp
                 WHERE age = 0 AND k = (SELECT n + m FROM nm)
                   AND i = (SELECT n FROM nm)) AS BIGINT) AS edr,
           ROUND(CAST((SELECT val FROM edr_dp
                       WHERE age = 0 AND k = (SELECT n + m FROM nm)
                         AND i = (SELECT n FROM nm)) AS DOUBLE)
                 / (SELECT GREATEST(n, m) FROM nm), 6) AS edr_norm
    """


@query("traj_lcss_pair", oracle=_lcss_pair_oracle)
def traj_lcss_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LCSS similarity between users 1 and 2 — the eps-matching
    longest-common-subsequence trajectory measure (robust to noise and
    outlier points where DTW is not: an outlier simply never matches).
    Completes the classic measure family {Hausdorff, Fréchet, DTW,
    LCSS, EDR} on the pair shape.

    Exactness: the DP is INTEGER-valued (match decisions are float
    comparisons against eps on identical doubles, then pure integer
    max/+1), so Spark's NumPy kernel and DuckDB's antidiagonal
    recursive CTE agree exactly; the similarity LCSS/min(n,m) is the
    one final display float.

    Scale shape: identical to ``traj_dtw_pair`` — assemble two series,
    one Arrow ``applyInPandas`` group, O(n·m) inside the kernel."""
    import numpy as np
    import pandas as pd

    from ..functions import kernels
    from .trajectory import _QUERY_USER, _paired_series

    t = Tables(spark, sf_dir)
    paired = _paired_series(t, _QUERY_USER).filter(F.col("user_id") == 2)
    eps = float(_LCSS_EPS)

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            a = np.asarray(row["vals"], dtype=np.float64)
            b = np.asarray(row["q_vals"], dtype=np.float64)
            ln = kernels.lcss(a, b, eps)
            out.append(
                (row["user_id"], ln, round(ln / min(len(a), len(b)), 6))
            )
        return pd.DataFrame(out, columns=["user_id", "lcss_len", "lcss_sim"])

    return paired.groupBy("user_id").applyInPandas(
        per_user, schema="user_id bigint, lcss_len bigint, lcss_sim double"
    )


@query("traj_edr_pair", oracle=_edr_pair_oracle)
def traj_edr_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDR (Edit Distance on Real sequences) between users 1 and 2:
    eps-matching edit distance — substitution costs 1 unless the
    points eps-match, insert/delete cost 1; boundary E(i,0)=i.
    The noise-robust edit twin of LCSS (counts mismatches instead of
    matches), also integer-valued and therefore exact; same
    antidiagonal recursive-CTE oracle with virtual boundary
    candidates.  Display: EDR and EDR/max(n,m)."""
    import numpy as np
    import pandas as pd

    from ..functions import kernels
    from .trajectory import _QUERY_USER, _paired_series

    t = Tables(spark, sf_dir)
    paired = _paired_series(t, _QUERY_USER).filter(F.col("user_id") == 2)
    eps = float(_LCSS_EPS)

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            a = np.asarray(row["vals"], dtype=np.float64)
            b = np.asarray(row["q_vals"], dtype=np.float64)
            e = kernels.edr(a, b, eps)
            out.append(
                (row["user_id"], e, round(e / max(len(a), len(b)), 6))
            )
        return pd.DataFrame(out, columns=["user_id", "edr", "edr_norm"])

    return paired.groupBy("user_id").applyInPandas(
        per_user, schema="user_id bigint, edr bigint, edr_norm double"
    )


# ---------------------------------------------------------------------------
# sim_diversify_mmr — Maximal-Marginal-Relevance diversified top-k
# ---------------------------------------------------------------------------

_MMR_SHORTLIST = 32  # relevance shortlist fed to the reranker
_MMR_K = 5  # diversified picks (unrolled in the oracle)


def _mmr_oracle() -> str:
    # integer d2 between quantized vectors via explicit unnest + BIGINT
    # sum (list_dot_product would be double; diffs^2 sums can graze
    # 2^53) — qv/d2 CTEs shared, then _MMR_K unrolled selection rounds:
    # pick argmin of 2*d2(q, c) - min_{s in S} d2(c, s) (lambda = 1/2
    # scaled x2 — all integer), ties to the smallest vec_id; round 0 is
    # pure relevance.  Selection happens INSIDE the 32-candidate
    # relevance shortlist, the standard rerank contract.
    rounds = []
    sel_union = "SELECT vec_id FROM s0"
    for r in range(1, _MMR_K):
        rounds.append(f"""
    s{r} AS (
        SELECT c.vec_id
        FROM short c
        WHERE c.vec_id NOT IN ({sel_union})
        ORDER BY 2 * c.d2q - (
            SELECT MIN(p.d2) FROM pair p
            WHERE p.ida = c.vec_id
              AND p.idb IN ({sel_union})
        ), c.vec_id
        LIMIT 1
    )""")
        sel_union += f" UNION ALL SELECT vec_id FROM s{r}"
    ranked = " UNION ALL ".join(
        f"SELECT {r} AS rank, vec_id FROM s{r}" for r in range(_MMR_K)
    )
    return f"""
    WITH qv AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> CAST(ROUND(x * 1e6) AS BIGINT)) AS q
        FROM embeddings
    ),
    qq AS (SELECT q FROM qv WHERE vec_id = (SELECT MIN(vec_id) FROM qv)),
    cand AS (
        SELECT v.vec_id,
               (SELECT SUM((a - b) * (a - b)) FROM (
                    SELECT UNNEST(v.q) AS a, UNNEST((SELECT q FROM qq)) AS b
                )) AS d2q
        FROM qv v
        WHERE v.vec_id > (SELECT MIN(vec_id) FROM qv)
    ),
    short AS (
        SELECT vec_id, CAST(d2q AS BIGINT) AS d2q
        FROM cand ORDER BY d2q, vec_id LIMIT {_MMR_SHORTLIST}
    ),
    pair AS (
        SELECT a.vec_id AS ida, b.vec_id AS idb,
               CAST((SELECT SUM((x - y) * (x - y)) FROM (
                    SELECT UNNEST(va.q) AS x, UNNEST(vb.q) AS y
               )) AS BIGINT) AS d2
        FROM short a
        JOIN short b ON a.vec_id <> b.vec_id
        JOIN qv va ON va.vec_id = a.vec_id
        JOIN qv vb ON vb.vec_id = b.vec_id
    ),
    s0 AS (SELECT vec_id FROM short ORDER BY d2q, vec_id LIMIT 1),
    {",".join(rounds)}
    SELECT CAST(r.rank AS BIGINT) AS rank, r.vec_id,
           s.d2q AS rel_d2
    FROM ({ranked}) r JOIN short s ON s.vec_id = r.vec_id
    """


@query("sim_diversify_mmr", oracle=_mmr_oracle)
def sim_diversify_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL MARGINAL RELEVANCE diversified top-k — the standard
    retrieval reranker (near-duplicate results waste a RAG context
    window; MMR trades relevance against redundancy): greedily pick
    the candidate minimizing 2·d2(query, c) − min_{s∈S} d2(c, s)
    (λ = 1/2, integer-scaled ×2) from a 32-candidate relevance
    shortlist, k = 5 picks, ties to the smallest vec_id.

    Exactness: squared distances between micro-quantized vectors are
    exact BIGINTs on both engines (explicit unnest + integer sum in
    the oracle — ``list_dot_product`` doubles could graze 2^53), and
    the greedy argmin is an integer decision chain, so the whole
    selection is bit-exact; mirrored as unrolled selection-round CTEs
    (the ``emb_kmeans_exact`` discipline).

    Scale shape: the corpus-sized work is the relevance scan (one
    column-pruned pass + global top-32, TakeOrderedAndProject); the
    rerank then touches only the 32-row shortlist — its 32x32 pair
    matrix and 5 greedy rounds are a BOUNDED driver artifact (~1k
    integers, the route/manifest-row discipline), so the operator's
    distributed footprint is exactly one scan regardless of corpus
    size."""
    import numpy as np

    t = Tables(spark, sf_dir)
    qv = t.embeddings.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(ROUND(x * 1e6) AS BIGINT))"
        ).alias("q"),
    )
    qmin = qv.agg(F.min("vec_id").alias("qid"))
    qrow = qv.join(F.broadcast(qmin), qv["vec_id"] == qmin["qid"]).select(
        F.col("q").alias("qq")
    )
    d2q = F.aggregate(
        F.zip_with("q", "qq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    shortlist = (
        qv.join(F.broadcast(qmin))
        .filter(F.col("vec_id") > F.col("qid"))
        .crossJoin(F.broadcast(qrow))
        .select("vec_id", "q", d2q.alias("d2q"))
        .orderBy("d2q", "vec_id")
        .limit(_MMR_SHORTLIST)
    )
    rows = shortlist.collect()  # bounded: 32 (vec_id, q, d2q) rows
    ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    vecs = np.asarray([r["q"] for r in rows], dtype=np.int64)
    rel = np.asarray([r["d2q"] for r in rows], dtype=np.int64)
    diff = vecs[:, None, :] - vecs[None, :, :]
    pair_d2 = (diff * diff).sum(axis=2)  # int64 exact
    order = np.lexsort((ids, rel))  # relevance, ties by id
    picked = [int(order[0])]
    while len(picked) < min(_MMR_K, len(ids)):
        best = None
        for c in range(len(ids)):
            if c in picked:
                continue
            div = int(min(pair_d2[c, s] for s in picked))
            key = (2 * int(rel[c]) - div, int(ids[c]))
            if best is None or key < best[0]:
                best = (key, c)
        picked.append(best[1])
    out = [
        (r, int(ids[c]), int(rel[c])) for r, c in enumerate(picked)
    ]
    return spark.createDataFrame(
        out, "rank bigint, vec_id bigint, rel_d2 bigint"
    )


# ---------------------------------------------------------------------------
# rel_gaps_islands — maximal runs of consecutive active days
# ---------------------------------------------------------------------------


@query(
    "rel_gaps_islands",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id,
               CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 86400e6)
                    AS BIGINT) AS dy
        FROM events
    ),
    grp AS (
        SELECT user_id, dy,
               dy - ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY dy) AS island
        FROM days
    )
    SELECT user_id,
           MIN(dy) AS start_dy,
           MAX(dy) AS end_dy,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM grp
    GROUP BY user_id, island
    """,
)
def rel_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GAPS-AND-ISLANDS: per user, the maximal runs of consecutive
    active days (the canonical sequential-SQL pattern — streaks,
    uptime windows, contiguous coverage): island id = day −
    row_number(day), one integer subtraction that is constant exactly
    within a consecutive run.  One distinct-days aggregate, one
    window, one group — all integer; partition-count independent.

    Scale shape: both shuffles key on user_id (the window and the
    final group co-partition), active-days per user bounds every
    window partition, and nothing is driver-sided."""
    t = Tables(spark, sf_dir)
    days = t.events.select(
        "user_id",
        F.floor(F.unix_micros("ts") / 86400e6).alias("dy"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("dy")
    grp = days.withColumn(
        "island", F.col("dy") - F.row_number().over(w)
    )
    return grp.groupBy("user_id", "island").agg(
        F.min("dy").alias("start_dy"),
        F.max("dy").alias("end_dy"),
        F.count("*").cast("bigint").alias("n_days"),
    ).drop("island")


# ---------------------------------------------------------------------------
# rel_agg_filtered — FILTER-clause conditional aggregation
# ---------------------------------------------------------------------------


@query(
    "rel_agg_filtered",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) FILTER (WHERE l_quantity > 25)
                AS BIGINT) AS n_bulk,
           CAST(COUNT(*) FILTER (WHERE l_discount >= 0.05)
                AS BIGINT) AS n_discounted,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                FILTER (WHERE l_quantity > 25) AS BIGINT) AS bulk_cents,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def rel_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause conditional aggregation — several differently-
    filtered aggregates in ONE pass over the table (the alternative is
    N scans or N self-joins): counts and an integer-cents sum, each
    under its own predicate, plus the unconditional total.

    Spark expresses FILTER with when()-guarded aggregates (count_if /
    sum(when)) — Catalyst folds them into a single hash aggregate with
    map-side partials, so the plan is one scan + one shuffle no matter
    how many conditions ride along.  All outputs integer (house cents
    rule), so the row hash-matches with no float anywhere."""
    t = Tables(spark, sf_dir)
    cents = F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")
    bulk = F.col("l_quantity") > 25
    return t.lineitem.groupBy("l_returnflag").agg(
        F.count(F.when(bulk, 1)).cast("bigint").alias("n_bulk"),
        F.count(F.when(F.col("l_discount") >= 0.05, 1))
        .cast("bigint")
        .alias("n_discounted"),
        F.sum(F.when(bulk, cents)).cast("bigint").alias("bulk_cents"),
        F.count("*").cast("bigint").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# text_langid_confusion — language-ID confusion matrix
# ---------------------------------------------------------------------------


def _langid_confusion_oracle() -> str:
    from ..registry import ORACLES
    from . import text  # noqa: F401  (registers text_langid)

    inner = ORACLES["text_langid"].rstrip()
    return f"""
    WITH pred AS ({inner})
    SELECT lang, pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred
    GROUP BY lang, pred_lang
    """


@query("text_langid_confusion", oracle=_langid_confusion_oracle)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LANGUAGE-ID CONFUSION MATRIX: labeled lang x predicted lang with
    document counts — the evaluation table for the n-gram language
    identifier (``text_langid``); off-diagonal mass is exactly the
    misclassification a corpus-quality pipeline alerts on.

    Composed operator: the per-doc prediction is the registered
    ``text_langid`` plan (one broadcast marker join + two aggregates),
    this row adds one more hash aggregate on (lang, pred_lang) — the
    oracle wraps the registered ``text_langid`` SQL as a CTE, so the
    two rows can never drift apart."""
    from .text import text_langid

    return (
        text_langid(spark, sf_dir)
        .groupBy("lang", "pred_lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# LCSS / EDR search tier (threshold + kNN) — WEAK rows, brute-pinned
# ---------------------------------------------------------------------------

_SEARCH_EPS = 10.0  # eps-matching tolerance (shared with the pair rows)
_LCSS_DELTA = 8  # Vlachos time-window (search rows use LCSS_{d,e})
_LCSS_TAU_NUM, _LCSS_TAU_DEN = 11, 20  # similarity threshold 0.55
_EDR_TAU_NUM, _EDR_TAU_DEN = 3, 5  # normalized-EDR threshold 0.6
_SEARCH_K = 10


def _user_positions(t: Tables) -> DataFrame:
    """(user_id, i, v): each user's series with 1-based positions.

    ``seq`` IS the 1-based dense per-user position (``user_points``
    defines it as row_number over the same (user_id; ts, event_id)
    order), so re-ranking it through a second row_number window was the
    identity — round 12 (guide §2.4) drops the redundant window pass."""
    return t.user_points().select(
        "user_id",
        F.col("seq").alias("i"),
        F.col("value").alias("v"),
    )


def _lcss_candidates(spark: SparkSession, t: Tables) -> DataFrame:
    """Per-candidate envelope UPPER BOUND on banded LCSS vs the query
    user: a_i can match only inside the time window [i-d, i+d], so
    ub = #{i : a_i within eps of the query's [min,max] envelope at i}
    >= #matchable points >= LCSS (LB_Keogh's necessary condition,
    applied as a counting bound).  LOSSLESS by construction; its
    measured selectivity on THIS corpus is ~zero (envelope spread ~=
    value spread at eps=10 — the dense regime), so it ships as the
    cheap guard it is, documented, not as the load-bearing phase; in a
    sparse-eps regime the same bound is the standard LCSS prune.
    Returns (user_id, n, ub)."""
    pos = _user_positions(t)
    q = pos.filter(F.col("user_id") == 1)
    env = (
        q.withColumn(
            "p",
            F.explode(
                F.sequence(
                    F.col("i") - _LCSS_DELTA, F.col("i") + _LCSS_DELTA
                )
            ),
        )
        .filter(F.col("p") >= 1)
        .groupBy("p")
        .agg(F.min("v").alias("qlo"), F.max("v").alias("qhi"))
    )
    cand = pos.filter(F.col("user_id") != 1)
    return (
        cand.join(F.broadcast(env), cand["i"] == env["p"], "left")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    F.col("qlo").isNotNull()
                    & (F.col("v") >= F.col("qlo") - _SEARCH_EPS)
                    & (F.col("v") <= F.col("qhi") + _SEARCH_EPS),
                    1,
                ).otherwise(0)
            ).alias("ub"),
        )
    )


def _edr_candidates(spark: SparkSession, t: Tables) -> DataFrame:
    """Per-candidate LOWER BOUND on (unbanded) EDR vs the query user:
    EDR >= max(n, m) - LCSS >= max(n, m) - #matchable points (each
    zero-cost substitution consumes one matchable candidate point;
    everything else costs >= 1), and EDR >= |n - m|.  Matchability is
    an eps-cell semi-join against the broadcast query values (probe
    the 3 adjacent cells).  Lossless; same dense-regime selectivity
    note as the LCSS bound.  Returns (user_id, n, lb).

    Round 12 (guide §2.4): the bound never uses series ORDER — point
    identity within a user is (ts, event_id), counts are
    window-invariant — so the corpus-wide row_number window (an
    Exchange + Sort) and the windowed query-length count are gone;
    everything reads ``events`` directly."""
    pts = t.events.select(
        "user_id", "ts", "event_id", F.col("value").alias("v")
    )
    q = pts.filter(F.col("user_id") == 1)
    m = q.count()
    qcells = (
        q.withColumn("cell", F.floor(F.col("v") / _SEARCH_EPS))
        .withColumn(
            "cell",
            F.explode(
                F.array(
                    F.col("cell") - 1, F.col("cell"), F.col("cell") + 1
                )
            ),
        )
        .select("cell", F.col("v").alias("qv"))
    )
    cand = pts.filter(F.col("user_id") != 1).withColumn(
        "cell", F.floor(F.col("v") / _SEARCH_EPS)
    )
    matchable = (
        cand.join(F.broadcast(qcells), "cell")
        .filter(F.abs(F.col("v") - F.col("qv")) <= _SEARCH_EPS)
        .select("user_id", "ts", "event_id")
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").alias("matchable"))
    )
    return (
        cand.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .join(matchable, "user_id", "left")
        .select(
            "user_id",
            "n",
            F.greatest(
                F.abs(F.col("n") - F.lit(m)),
                F.greatest(F.col("n"), F.lit(m))
                - F.coalesce("matchable", F.lit(0)),
            ).alias("lb"),
        )
    )


# ---------------------------------------------------------------------------
# FULL list-layer oracles for the LCSS/EDR/ERP search tiers (round 7):
# every candidate's whole DP grid vs the query user, advanced one
# antidiagonal LIST per recursion step (dp_list_sql.layer_dp — the
# NumPy kernels' antidiagonal layout transcribed to DuckDB lists;
# measured ~0.5 s at sf0.01 vs 37 s for the old row-per-cell
# recursion).  The oracles are deliberately UNFILTERED by the Spark
# side's lossless bounds, so every gate run re-certifies that the
# two-phase prunes lose nothing.
# ---------------------------------------------------------------------------


def _lcss1_prefix() -> str:
    return _DL.layer_dp(
        _DL.series_1d(),
        ("avs",),
        f"CASE WHEN ABS(avs[1] - q.qvs[1]) <= {_SEARCH_EPS}"
        " THEN CAST(1 AS BIGINT) ELSE 0 END",
        _DL.lcss_combine(
            f"ABS(avs[y] - q.qvs[k - y + 2]) <= {_SEARCH_EPS}"
            f" AND ABS(2 * (y - 1) - k) <= {_LCSS_DELTA}"
        ),
        _DL.SENT_LCSS,
    )


def _lcss2_prefix(query_user: int = 1) -> str:
    return _DL.layer_dp(
        _DL.series_2d_micro(query_user),
        ("ax", "ay"),
        f"CASE WHEN {_DL.D2Q_INIT} <= {_EPS2_MICRO2}"
        " THEN CAST(1 AS BIGINT) ELSE 0 END",
        _DL.lcss_combine(f"{_DL.D2Q_CELL} <= {_EPS2_MICRO2}"),
        _DL.SENT_LCSS,
    )


_LCSS_SEL = (
    "\nSELECT user_id, CAST(val AS BIGINT) AS lcss_len,"
    "\n       ROUND(CAST(val AS DOUBLE) / LEAST(n, m), 6) AS lcss_sim"
    "\nFROM fin"
)


def _lcss_threshold_oracle() -> str:
    return (
        _lcss1_prefix()
        + _LCSS_SEL
        + f"\nWHERE val * {_LCSS_TAU_DEN}"
        f" >= LEAST(n, m) * {_LCSS_TAU_NUM}"
    )


def _lcss_knn_oracle() -> str:
    return (
        _lcss1_prefix()
        + _LCSS_SEL
        + "\nORDER BY CAST(val AS DOUBLE) / LEAST(n, m) DESC, user_id"
        + f"\nLIMIT {_SEARCH_K}"
    )


def _lcss_threshold_2d_oracle() -> str:
    return (
        _lcss2_prefix()
        + _LCSS_SEL
        + f"\nWHERE val * {_LCSS_TAU_DEN}"
        f" >= LEAST(n, m) * {_LCSS_TAU_NUM}"
    )


def _lcss_knn_2d_oracle() -> str:
    return (
        _lcss2_prefix()
        + _LCSS_SEL
        + "\nORDER BY CAST(val AS DOUBLE) / LEAST(n, m) DESC, user_id"
        + f"\nLIMIT {_SEARCH_K}"
    )


def _edr1_prefix() -> str:
    return _DL.layer_dp(
        _DL.series_1d(),
        ("avs",),
        f"CASE WHEN ABS(avs[1] - q.qvs[1]) <= {_SEARCH_EPS}"
        " THEN CAST(0 AS BIGINT) ELSE 1 END",
        _DL.edr_combine(
            f"ABS(avs[y] - q.qvs[k - y + 2]) <= {_SEARCH_EPS}"
        ),
        _DL.SENT_EDR,
    )


def _edr2_prefix(query_user: int = 1) -> str:
    return _DL.layer_dp(
        _DL.series_2d_micro(query_user),
        ("ax", "ay"),
        f"CASE WHEN {_DL.D2Q_INIT} <= {_EPS2_MICRO2}"
        " THEN CAST(0 AS BIGINT) ELSE 1 END",
        _DL.edr_combine(f"{_DL.D2Q_CELL} <= {_EPS2_MICRO2}"),
        _DL.SENT_EDR,
    )


_EDR_SEL = (
    "\nSELECT user_id, CAST(val AS BIGINT) AS edr,"
    "\n       ROUND(CAST(val AS DOUBLE) / GREATEST(n, m), 6) AS edr_norm"
    "\nFROM fin"
)


def _edr_threshold_oracle() -> str:
    return (
        _edr1_prefix()
        + _EDR_SEL
        + f"\nWHERE val * {_EDR_TAU_DEN}"
        f" <= GREATEST(n, m) * {_EDR_TAU_NUM}"
    )


def _edr_knn_oracle() -> str:
    return (
        _edr1_prefix()
        + _EDR_SEL
        + "\nORDER BY CAST(val AS DOUBLE) / GREATEST(n, m), user_id"
        + f"\nLIMIT {_SEARCH_K}"
    )


def _edr_threshold_2d_oracle() -> str:
    return (
        _edr2_prefix()
        + _EDR_SEL
        + f"\nWHERE val * {_EDR_TAU_DEN}"
        f" <= GREATEST(n, m) * {_EDR_TAU_NUM}"
    )


def _edr_knn_2d_oracle() -> str:
    return (
        _edr2_prefix()
        + _EDR_SEL
        + "\nORDER BY CAST(val AS DOUBLE) / GREATEST(n, m), user_id"
        + f"\nLIMIT {_SEARCH_K}"
    )


def _erp1_prefix() -> str:
    return _DL.layer_dp(
        _DL.series_1d_erp(),
        ("avs", "acs", "aps"),
        "LEAST(ABS(avs[1] - q.qvs[1]), acs[1] + q.qcs[1])",
        _DL.erp_combine("ABS(avs[y] - q.qvs[k - y + 2])"),
        _DL.SENT_ERP,
    )


def _erp2_prefix(query_user: int = 1) -> str:
    return _DL.layer_dp(
        _DL.series_2d_erp(query_user),
        ("ax", "ay", "acs", "aps"),
        f"LEAST({_DL.sql_isqrt_bound(_DL.D2Q_INIT)},"
        " acs[1] + q.qcs[1])",
        _DL.erp_combine(_DL.sql_isqrt_bound(_DL.D2Q_CELL)),
        _DL.SENT_ERP,
    )


_ERP_SEL = (
    "\nSELECT user_id, CAST(val AS BIGINT) AS erp_micro,"
    "\n       ROUND(val / 1e6, 6) AS erp"
    "\nFROM fin"
)


def _erp_threshold_oracle() -> str:
    return _erp1_prefix() + _ERP_SEL + f"\nWHERE val <= {_ERP_TAU_MICRO}"


def _erp_knn_oracle() -> str:
    return (
        _erp1_prefix()
        + _ERP_SEL
        + f"\nORDER BY val, user_id LIMIT {_SEARCH_K}"
    )


def _erp_threshold_2d_oracle() -> str:
    return (
        _erp2_prefix() + _ERP_SEL + f"\nWHERE val <= {_ERP2D_TAU_MICRO}"
    )


def _erp_knn_2d_oracle() -> str:
    return (
        _erp2_prefix()
        + _ERP_SEL
        + f"\nORDER BY val, user_id LIMIT {_SEARCH_K}"
    )


_TAU_CK = 30  # phase-1 refine width shared by the tau_k kNN rows


def _tau_knn(
    bound: DataFrame,
    refine: Callable[[DataFrame], DataFrame],
    num: str,
    den: str | None,
    desc: bool,
    k: int = _SEARCH_K,
    ck: int = _TAU_CK,
) -> DataFrame:
    """Shared tau_k two-phase kNN harness (the ERP-kNN shape from
    ``traj_erp_knn``, generalized to ratio-valued sort keys).

    ``bound`` carries (user_id, bnum[, bden]) where bnum/bden is an
    ADMISSIBLE bound on the exact sort ratio num/den — an UPPER bound
    when ``desc`` (similarity search), a LOWER bound otherwise
    (distance search).  Phase 1 refines the ``ck`` best-bounded
    candidates; tau_k = the k-th best exact ratio, collected as its
    integer (num, den) pair — a <=k-row driver shortlist, the
    house-bounded artifact.  Phase 2 refines only candidates whose
    bound can still reach the top-k, decided by exact integer
    cross-multiplication (bnum*den_k vs num_k*bden — no float at the
    pruning boundary).  LOSSLESS: a pruned candidate's exact ratio is
    strictly worse than tau_k, so it ranks after all k phase-1 rows
    under the (ratio, user_id) final order regardless of id ties;
    candidates tied with tau_k are kept.  Returns phase-1 ∪ phase-2
    refined rows — the caller applies the same global order/limit as
    the refine-all plan, so the brute pins stay binding bit-for-bit."""
    lbdf = bound.localCheckpoint()
    br = F.col("bnum") / F.col("bden") if den else F.col("bnum")
    first_ids = lbdf.orderBy(
        br.desc() if desc else br.asc(), "user_id"
    ).limit(ck)
    first = refine(first_ids).localCheckpoint()
    xr = F.col(num) / F.col(den) if den else F.col(num)
    shortlist = (
        first.orderBy(xr.desc() if desc else xr.asc(), "user_id")
        .limit(k)
        .select(num, *([den] if den else []))
        .collect()
    )

    def anti(df: DataFrame) -> DataFrame:
        return df.join(
            F.broadcast(first_ids.select("user_id")),
            "user_id",
            "left_anti",
        )

    if len(shortlist) < k:
        rest_ids = anti(lbdf)
    else:
        nk = shortlist[-1][0]
        dk = shortlist[-1][1] if den else 1
        lhs, rhs = F.col("bnum") * F.lit(dk), F.lit(nk) * (
            F.col("bden") if den else F.lit(1)
        )
        rest_ids = anti(lbdf.filter(lhs >= rhs if desc else lhs <= rhs))
    return first.unionByName(refine(rest_ids))


def _lcss_refine(t: Tables, ids: DataFrame) -> DataFrame:
    """Exact banded-LCSS kernel over the candidate id set; returns
    (user_id, lcss_len, min_len, lcss_sim).  mapInPandas, not a
    per-user applyInPandas: paired rows are already one-per-user, so
    grouping would shuffle and pay one Python call per user (the
    _dp_refine discipline)."""
    import numpy as np
    import pandas as pd

    from ..functions import kernels
    from .trajectory import _QUERY_USER, _paired_series

    # fan the assembled pairs out to full parallelism: AQE coalesces
    # the 1500-row assembly shuffle to ~2 partitions, which would run
    # the whole DP workload on 2 cores (house single-file-fixture trap)
    paired = _paired_series(t, _QUERY_USER, ids=ids).repartition(
        t.spark.sparkContext.defaultParallelism
    )

    def refine(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                a = np.asarray(row.vals, dtype=np.float64)
                b = np.asarray(row.q_vals, dtype=np.float64)
                ln = kernels.lcss(a, b, _SEARCH_EPS, _LCSS_DELTA)
                ml = min(len(a), len(b))
                out.append((row.user_id, ln, ml, round(ln / ml, 6)))
            yield pd.DataFrame(
                out,
                columns=["user_id", "lcss_len", "min_len", "lcss_sim"],
            )

    return paired.mapInPandas(
        refine,
        schema="user_id bigint, lcss_len bigint, min_len bigint,"
        " lcss_sim double",
    )


def _edr_refine(t: Tables, ids: DataFrame) -> DataFrame:
    """Exact EDR kernel over the candidate id set; returns
    (user_id, edr, max_len, edr_norm).  Same mapInPandas discipline as
    ``_lcss_refine``."""
    import numpy as np
    import pandas as pd

    from ..functions import kernels
    from .trajectory import _QUERY_USER, _paired_series

    paired = _paired_series(t, _QUERY_USER, ids=ids).repartition(
        t.spark.sparkContext.defaultParallelism
    )  # same fan-out note as _lcss_refine

    def refine(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                a = np.asarray(row.vals, dtype=np.float64)
                b = np.asarray(row.q_vals, dtype=np.float64)
                e = kernels.edr(a, b, _SEARCH_EPS)
                ml = max(len(a), len(b))
                out.append((row.user_id, e, ml, round(e / ml, 6)))
            yield pd.DataFrame(
                out, columns=["user_id", "edr", "max_len", "edr_norm"]
            )

    return paired.mapInPandas(
        refine,
        schema="user_id bigint, edr bigint, max_len bigint,"
        " edr_norm double",
    )


@query("traj_lcss_threshold", oracle=_lcss_threshold_oracle)
def traj_lcss_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All users with banded-LCSS similarity >= 0.55 vs the query user
    (LCSS_{d,e}, d=8, e=10 — the Vlachos time-window form, which is
    what gives the envelope bound meaning).  Two-phase: the LOSSLESS
    envelope upper bound gates the kernel (20·ub < 11·min(n,m) cannot
    qualify), survivors refine through the Arrow kernel, and the final
    membership decision is the exact INTEGER cross-multiplication
    20·lcss >= 11·min(n,m) — no float at the boundary.  Brute-force
    equality pinned in tests/test_twophase.py."""
    t = Tables(spark, sf_dir)
    # query length: a plain pushdown-filtered events count — NOT a
    # user_points() count, which sorted the whole corpus through the
    # seq window to count one user's rows (round 12; row counts are
    # window-invariant)
    m = t.events.filter(F.col("user_id") == 1).count()
    cand = _lcss_candidates(spark, t).filter(
        F.col("ub") * _LCSS_TAU_DEN
        >= F.least(F.col("n"), F.lit(m)) * _LCSS_TAU_NUM
    )
    return (
        _lcss_refine(t, cand)
        .filter(
            F.col("lcss_len") * _LCSS_TAU_DEN
            >= F.col("min_len") * _LCSS_TAU_NUM
        )
        .select("user_id", "lcss_len", "lcss_sim")
    )


@query("traj_lcss_knn", oracle=_lcss_knn_oracle)
def traj_lcss_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by banded-LCSS similarity vs the query user
    (similarity DESC, user_id ASC ties) — the reference's two-phase
    kNN shape via the shared ``_tau_knn`` harness: refine the 30
    best-envelope candidates, take the 10th exact similarity as tau_k
    (an integer lcss_len/min_len pair), refine only the remaining
    users whose LOSSLESS envelope upper bound can still reach tau_k
    (ub·min_k >= lcss_k·min(n,m), exact cross-multiplication).  The
    envelope is non-discriminative in this dense-eps regime
    (documented in ``_lcss_candidates``; measured selectivity in
    BASELINE.md), so phase 2 may refine nearly everything — but the
    gate can only prune and the result is bit-identical to refine-all.
    Driver artifacts: the query-length scalar and the <=10-row tau
    shortlist.  Brute-force equality pinned in tests/test_twophase.py."""
    t = Tables(spark, sf_dir)
    # query length: a plain pushdown-filtered events count — NOT a
    # user_points() count, which sorted the whole corpus through the
    # seq window to count one user's rows (round 12; row counts are
    # window-invariant)
    m = t.events.filter(F.col("user_id") == 1).count()
    bound = _lcss_candidates(spark, t).select(
        "user_id",
        F.col("ub").alias("bnum"),
        F.least(F.col("n"), F.lit(m)).alias("bden"),
    )
    res = _tau_knn(
        bound,
        lambda ids: _lcss_refine(t, ids),
        num="lcss_len",
        den="min_len",
        desc=True,
    )
    return (
        res.orderBy(
            (F.col("lcss_len") / F.col("min_len")).desc(), "user_id"
        )
        .limit(_SEARCH_K)
        .select("user_id", "lcss_len", "lcss_sim")
    )


@query("traj_edr_threshold", oracle=_edr_threshold_oracle)
def traj_edr_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All users with normalized EDR <= 0.6 vs the query user.
    Two-phase: the LOSSLESS lower bound max(|n-m|, max(n,m) -
    matchable) gates the kernel (5·lb > 3·max(n,m) cannot qualify),
    survivors refine exactly; membership is the integer
    cross-multiplication 5·edr <= 3·max(n,m).  Brute-force equality
    pinned in tests/test_twophase.py."""
    t = Tables(spark, sf_dir)
    # query length: a plain pushdown-filtered events count — NOT a
    # user_points() count, which sorted the whole corpus through the
    # seq window to count one user's rows (round 12; row counts are
    # window-invariant)
    m = t.events.filter(F.col("user_id") == 1).count()
    cand = _edr_candidates(spark, t).filter(
        F.col("lb") * _EDR_TAU_DEN
        <= F.greatest(F.col("n"), F.lit(m)) * _EDR_TAU_NUM
    )
    return (
        _edr_refine(t, cand)
        .filter(
            F.col("edr") * _EDR_TAU_DEN
            <= F.col("max_len") * _EDR_TAU_NUM
        )
        .select("user_id", "edr", "edr_norm")
    )


@query("traj_edr_knn", oracle=_edr_knn_oracle)
def traj_edr_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by smallest normalized EDR vs the query user
    (edr/max_len ASC, user_id ties) — tau_k two-phase via ``_tau_knn``:
    refine the 30 best-bounded candidates, tau_k = 10th exact
    edr/max_len, phase 2 refines only users whose LOSSLESS lower
    bound max(|n-m|, max(n,m) - matchable) can still beat it
    (lb·max_k <= edr_k·max(n,m), exact cross-multiplication).  Same
    dense-regime selectivity caveat and bit-identical-to-refine-all
    guarantee as ``traj_lcss_knn``.  Brute pinned in
    tests/test_twophase.py."""
    t = Tables(spark, sf_dir)
    # query length: a plain pushdown-filtered events count — NOT a
    # user_points() count, which sorted the whole corpus through the
    # seq window to count one user's rows (round 12; row counts are
    # window-invariant)
    m = t.events.filter(F.col("user_id") == 1).count()
    bound = _edr_candidates(spark, t).select(
        "user_id",
        F.col("lb").alias("bnum"),
        F.greatest(F.col("n"), F.lit(m)).alias("bden"),
    )
    res = _tau_knn(
        bound,
        lambda ids: _edr_refine(t, ids),
        num="edr",
        den="max_len",
        desc=False,
    )
    return (
        res.orderBy(F.col("edr") / F.col("max_len"), "user_id")
        .limit(_SEARCH_K)
        .select("user_id", "edr", "edr_norm")
    )


# ---------------------------------------------------------------------------
# traj_erp_pair — ERP (Edit distance with Real Penalty), micro-integer
# ---------------------------------------------------------------------------


def _erp_pair_oracle() -> str:
    # E(i,j) = min(NW + |qa-qb|, N + |qa|, W + |qb|) over MICRO-QUANTIZED
    # integer values (gap g = 0); boundaries E(i,0)/E(0,j) are integer
    # prefix sums carried on the cells row (pa/pb CTEs with LAG), so
    # DuckDB's windowed-sum combine order cannot matter.  Custom layers
    # recursion (the _dp_layers_sql template carries one cost column;
    # ERP needs five), same antidiagonal age-carry scheme.
    big = 1 << 60
    return f"""
    WITH RECURSIVE
    av(i, q) AS (
        SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id),
               CAST(ROUND(value * 1e6) AS BIGINT)
        FROM events WHERE user_id = 2
    ),
    bv(j, q) AS (
        SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id),
               CAST(ROUND(value * 1e6) AS BIGINT)
        FROM events WHERE user_id = 1
    ),
    pa AS (
        SELECT i, SUM(ABS(q)) OVER (ORDER BY i) AS p,
               COALESCE(SUM(ABS(q)) OVER (ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS pprev
        FROM av
    ),
    pb AS (
        SELECT j, SUM(ABS(q)) OVER (ORDER BY j) AS p,
               COALESCE(SUM(ABS(q)) OVER (ORDER BY j
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS pprev
        FROM bv
    ),
    erp_dp(k, i, val, age) AS (
        SELECT 2, 1,
               (SELECT LEAST(ABS(av.q - bv.q), ABS(av.q) + ABS(bv.q))
                FROM av, bv WHERE av.i = 1 AND bv.j = 1), 0
        UNION ALL
        (
          WITH cur AS (SELECT * FROM erp_dp),
          kk AS (SELECT MAX(k) AS k FROM cur),
          cells AS (
              SELECT (SELECT k FROM kk) + 1 AS k, av.i AS i,
                     ABS(av.q - bv.q) AS d,
                     ABS(av.q) AS ca, ABS(bv.q) AS cb,
                     pa.p AS pap, pa.pprev AS papp,
                     pb.p AS pbp, pb.pprev AS pbpp
              FROM av
              JOIN bv ON bv.j = (SELECT k FROM kk) + 1 - av.i
              JOIN pa ON pa.i = av.i
              JOIN pb ON pb.j = bv.j
          ),
          newcells AS (
              SELECT cells.k, cells.i,
                     LEAST(
                       MIN(CASE WHEN cur.age = 1
                                THEN cur.val + cells.d
                                WHEN cur.i = cells.i
                                THEN cur.val + cells.cb
                                ELSE cur.val + cells.ca END),
                       MIN(CASE WHEN cells.i = 1
                            THEN LEAST(cells.pbpp + cells.d,
                                       cells.pbp + cells.ca)
                            ELSE {big} END),
                       MIN(CASE WHEN cells.k - cells.i = 1
                            THEN LEAST(cells.papp + cells.d,
                                       cells.pap + cells.cb)
                            ELSE {big} END)
                     ) AS val, 0 AS age
              FROM cells JOIN cur
                ON (cur.age = 0 AND cur.i IN (cells.i - 1, cells.i))
                OR (cur.age = 1 AND cur.i = cells.i - 1)
              GROUP BY cells.k, cells.i, cells.d, cells.ca, cells.cb,
                       cells.pap, cells.papp, cells.pbp, cells.pbpp
          ),
          carry AS (
              SELECT k + 1 AS k, i, val, 1 AS age FROM cur WHERE age = 0
          )
          SELECT k, i, val, age FROM newcells
          UNION ALL
          SELECT k, i, val, age FROM carry
          WHERE (SELECT k FROM kk)
                < (SELECT MAX(i) FROM av) + (SELECT MAX(j) FROM bv)
        )
    )
    SELECT CAST(2 AS BIGINT) AS user_id,
           CAST((SELECT val FROM erp_dp
                 WHERE age = 0
                   AND k = (SELECT MAX(i) FROM av)
                         + (SELECT MAX(j) FROM bv)
                   AND i = (SELECT MAX(i) FROM av)) AS BIGINT)
               AS erp_micro,
           ROUND((SELECT val FROM erp_dp
                  WHERE age = 0
                    AND k = (SELECT MAX(i) FROM av)
                          + (SELECT MAX(j) FROM bv)
                    AND i = (SELECT MAX(i) FROM av)) / 1e6, 6) AS erp
    """


@query("traj_erp_pair", oracle=_erp_pair_oracle)
def traj_erp_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERP (Edit distance with Real Penalty, gap g=0) between users 1
    and 2 — the sixth and last classic trajectory measure ({Hausdorff,
    Fréchet, DTW, LCSS, EDR, ERP} now ALL ship on the pair shape) and
    the only edit-style one that is a true METRIC (triangle inequality
    holds, so it admits metric indexing).

    Exactness: values are micro-quantized (SQL ROUND, JVM-side —
    engines' half-rounding agrees) so every DP cell, INCLUDING the
    boundary prefix sums, is a BIGINT — the one float is the final
    /1e6 display.  The oracle is a custom antidiagonal recursion
    (_dp_layers_sql carries one cost column; ERP needs the cell cost
    plus both gap costs and both boundary prefixes) with the virtual
    row-0/col-0 candidates carried on the cells row.

    Scale shape: identical to the other pair rows — two series
    assemblies, one Arrow group, O(n·m) integer kernel."""
    import numpy as np
    import pandas as pd

    from ..functions import kernels
    from .trajectory import _QUERY_USER, _paired_series

    t = Tables(spark, sf_dir)
    paired = (
        _paired_series(t, _QUERY_USER)
        .filter(F.col("user_id") == 2)
        .select(
            "user_id",
            F.expr(
                "transform(vals, x -> CAST(ROUND(x * 1e6) AS BIGINT))"
            ).alias("qa"),
            F.expr(
                "transform(q_vals, x -> CAST(ROUND(x * 1e6) AS BIGINT))"
            ).alias("qb"),
        )
    )

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            a = np.asarray(row["qa"], dtype=np.int64)
            b = np.asarray(row["qb"], dtype=np.int64)
            e = kernels.erp(a, b)
            out.append((row["user_id"], e, round(e / 1e6, 6)))
        return pd.DataFrame(out, columns=["user_id", "erp_micro", "erp"])

    return paired.groupBy("user_id").applyInPandas(
        per_user, schema="user_id bigint, erp_micro bigint, erp double"
    )


# ---------------------------------------------------------------------------
# pipe_span_corruption — T5/UL2-style span-corruption mask statistics
# ---------------------------------------------------------------------------

_SPAN_RATE = 20  # 1-in-20 token positions start a span (~5% starts)
_SPAN_LEN_MIN = 2  # span length in {2,3,4} (mean 3 => ~15% masked)


@query(
    "pipe_span_corruption",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    tok AS (
        SELECT doc_id, LEN(w) AS n_tok,
               UNNEST(generate_series(1, LEN(w))) AS p
        FROM d
    ),
    starts AS (
        SELECT doc_id, n_tok, p,
               {_SPAN_LEN_MIN}
               + CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
                                          || CAST(p AS VARCHAR) || '#L'),
                                      1, 6)) AS INTEGER) % 3 AS len
        FROM tok
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
                                       || CAST(p AS VARCHAR)),
                                   1, 6)) AS INTEGER)
              % {_SPAN_RATE} = 0
    ),
    masked AS (
        SELECT DISTINCT s.doc_id, g.q AS pos
        FROM starts s,
             LATERAL (SELECT UNNEST(generate_series(
                          s.p, LEAST(s.p + s.len - 1, s.n_tok))) AS q) g
    ),
    runs AS (
        SELECT doc_id, pos,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY pos) AS island
        FROM masked
    ),
    agg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_masked,
               CAST(COUNT(DISTINCT island) AS BIGINT) AS n_spans
        FROM runs GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(MAX(t.n_tok) AS BIGINT) AS n_tok,
           COALESCE(MAX(a.n_masked), 0) AS n_masked,
           COALESCE(MAX(a.n_spans), 0) AS n_spans,
           ROUND(COALESCE(MAX(a.n_masked), 0) * 1.0 / MAX(t.n_tok), 6)
               AS mask_ratio
    FROM tok t LEFT JOIN agg a ON a.doc_id = t.doc_id
    GROUP BY t.doc_id
    """,
)
def pipe_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPAN-CORRUPTION MASK STATISTICS (the T5/UL2 denoising-objective
    preprocessing step): deterministic seeded span selection — a token
    position starts a span iff md5(doc#pos) % 20 == 0 (~5% starts),
    span length 2 + md5(doc#pos#L) % 3 (mean 3, so ~15% of tokens
    masked), overlapping spans UNION into maximal runs — per doc the
    token count, masked-token count, merged-span count and mask ratio.
    What a training pipeline audits before materializing a denoising
    dataset: actual corruption rate and span-length geometry after
    overlap merging, not the nominal knobs.

    Exactness: selection and lengths are md5-derived integers
    (identical conv/'0x' evaluation both engines — the emb_cosine_hist
    discipline); span union is the gaps-and-islands integer trick
    (`rel_gaps_islands`); the ratio is the one display float.

    Scale shape: one token explode (repartitioned off the single-file
    fixture), a ~5% start subset fans out x3 positions, one distinct +
    one window + one group — all keyed on doc_id, corpus-linear."""
    t = Tables(spark, sf_dir)
    tok = (
        t.documents.repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("p0", "w"),
            F.size(F.split("text", " ")).alias("n_tok"),
        )
        .select("doc_id", (F.col("p0") + 1).alias("p"), "n_tok")
    )
    starts = tok.filter(
        F.expr(
            "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING),"
            f" '#', CAST(p AS STRING))), 1, 6), 16, 10) AS INT)"
            f" % {_SPAN_RATE} = 0"
        )
    ).withColumn(
        "len",
        F.expr(
            f"{_SPAN_LEN_MIN} + CAST(conv(substring(md5(concat("
            "CAST(doc_id AS STRING), '#', CAST(p AS STRING), '#L')),"
            " 1, 6), 16, 10) AS INT) % 3"
        ),
    )
    masked = (
        starts.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.col("p"),
                    F.least(F.col("p") + F.col("len") - 1, F.col("n_tok")),
                )
            ).alias("pos"),
        )
        .distinct()
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    agg = (
        masked.withColumn("island", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_masked"),
            F.countDistinct("island").cast("bigint").alias("n_spans"),
        )
    )
    base = tok.groupBy("doc_id").agg(F.max("n_tok").alias("n_tok"))
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        F.col("n_tok").cast("bigint"),
        F.coalesce("n_masked", F.lit(0)).cast("bigint").alias("n_masked"),
        F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
        F.round(
            F.coalesce("n_masked", F.lit(0)) * 1.0 / F.col("n_tok"), 6
        ).alias("mask_ratio"),
    )


# ---------------------------------------------------------------------------
# emb_norm_hist — squared-norm histogram (embedding QA)
# ---------------------------------------------------------------------------

_NORMH_W2 = 10_000_000_000_000  # squared-norm bin width (micro^2 units)


@query(
    "emb_norm_hist",
    oracle=f"""
    WITH qv AS (
        SELECT vec_id,
               list_transform(embedding,
                              x -> ROUND(CAST(x AS DOUBLE) * 1e6)) AS q
        FROM embeddings
    ),
    n2 AS (
        SELECT vec_id,
               CAST(list_dot_product(q, q) AS BIGINT) AS n2
        FROM qv
    )
    SELECT n2 // {_NORMH_W2} AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(MIN(n2) AS BIGINT) AS min_n2,
           CAST(MAX(n2) AS BIGINT) AS max_n2
    FROM n2 GROUP BY 1
    """,
)
def emb_norm_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQUARED-NORM HISTOGRAM of the embedding corpus — the second
    geometry QA report beside `emb_cosine_hist`: un-normalized
    encoders drift in norm (norm correlates with token frequency /
    sequence length), and a bimodal or heavy-tailed norm distribution
    breaks dot-product retrieval before cosine ever would.  Binning on
    the SQUARED norm in integer micro^2 units keeps every boundary an
    integer decision (no sqrt anywhere); min/max per bin are exact
    BIGINTs.

    Scale shape: one column-pruned scan + one hash aggregate — the
    cheapest possible corpus pass, map-side combinable."""
    t = Tables(spark, sf_dir)
    qv = t.embeddings.select(
        F.expr(
            "transform(embedding, x -> CAST(ROUND(x * 1e6) AS BIGINT))"
        ).alias("q")
    )
    n2 = qv.select(
        F.aggregate(
            F.zip_with("q", "q", lambda a, b: a * b),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("n2")
    )
    return n2.groupBy(
        F.expr(f"n2 div {_NORMH_W2}").alias("bin")
    ).agg(
        F.count("*").cast("bigint").alias("n_vecs"),
        F.min("n2").cast("bigint").alias("min_n2"),
        F.max("n2").cast("bigint").alias("max_n2"),
    )


# ---------------------------------------------------------------------------
# rel_try_arithmetic — ANSI-safe (try_*) arithmetic surface
# ---------------------------------------------------------------------------


@query(
    "rel_try_arithmetic",
    oracle="""
    WITH r AS (
        SELECT l_returnflag,
               CASE WHEN l_quantity = 25 THEN NULL
                    ELSE FLOOR(CAST(ROUND(l_extendedprice * 100)
                               AS BIGINT) / (l_quantity - 25))
               END AS safe_ratio
        FROM lineitem
    )
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN safe_ratio IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null_div,
           CAST(SUM(CAST(safe_ratio AS BIGINT)) AS BIGINT)
               AS sum_floor_ratio
    FROM r GROUP BY l_returnflag
    """,
)
def rel_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-SAFE ARITHMETIC (`try_divide`) — the error-handling
    surface ANSI mode makes mandatory: cents / (quantity − 25) where
    the divisor hits zero on real rows; `try_divide` yields NULL
    instead of aborting the job, NULLs are counted (the data-quality
    signal) and excluded from the aggregate.  FLOOR of the IEEE
    division makes the summed value integer-exact (single-op division
    is bit-identical cross-engine; summing raw doubles would be
    order-dependent); DuckDB's x/0 = NULL semantics mirror try_divide
    directly, with an explicit CASE guard so the oracle never relies
    on that default.

    Scale shape: pure per-row projection + one hash aggregate."""
    t = Tables(spark, sf_dir)
    cents = F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")
    ratio = F.floor(
        F.expr(
            "try_divide(CAST(ROUND(l_extendedprice * 100) AS BIGINT),"
            " l_quantity - 25)"
        )
    )
    return (
        t.lineitem.select("l_returnflag", ratio.alias("safe_ratio"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(
                F.when(F.col("safe_ratio").isNull(), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_null_div"),
            F.sum("safe_ratio").cast("bigint").alias("sum_floor_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# pipe_chunk_overlap — sliding-window document chunking (RAG prep)
# ---------------------------------------------------------------------------

_CHUNK_TOK = 64  # tokens per chunk
_CHUNK_STRIDE = 48  # stride (64 - 48 = 16-token overlap)


@query(
    "pipe_chunk_overlap",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               CAST((s.s - 1) / {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
               array_to_string(
                   list_slice(w, s.s,
                              LEAST(s.s + {_CHUNK_TOK} - 1, LEN(w))),
                   ' ') AS chunk,
               LEAST(s.s + {_CHUNK_TOK} - 1, LEN(w)) - s.s + 1 AS n_tok
        FROM d, LATERAL (
            SELECT UNNEST(generate_series(
                1, GREATEST(LEN(w) - {_CHUNK_TOK} + {_CHUNK_STRIDE}, 1),
                {_CHUNK_STRIDE})) AS s) s
    )
    SELECT doc_id, chunk_id, CAST(n_tok AS BIGINT) AS n_tok,
           md5(chunk) AS chunk_hash
    FROM chunks
    """,
)
def pipe_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING-WINDOW DOCUMENT CHUNKING — the RAG/embedding-ingest
    preprocessing step: 64-token chunks at stride 48 (16-token overlap
    so no sentence is orphaned at a boundary), last partial chunk
    kept.  Emits (doc_id, chunk_id, n_tok, md5-of-chunk-text): the
    hash column is the downstream dedup/caching key, and forcing BOTH
    engines to reconstruct the exact chunk STRING (joins, spacing,
    boundary clamps included) is what makes this row a strong oracle
    — any off-by-one in the window arithmetic flips the hash.

    Scale shape: chunk starts generate per doc via ``sequence()`` —
    chunks are born distributed on the doc's partition (the
    traj_resample discipline: no calendar/driver involvement), one
    slice+concat projection each, zero shuffles beyond the scan."""
    t = Tables(spark, sf_dir)
    d = t.documents.repartition(spark.sparkContext.defaultParallelism, "doc_id").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    starts = d.select(
        "doc_id",
        "w",
        F.explode(
            F.sequence(
                F.lit(1),
                F.greatest(
                    F.size("w") - _CHUNK_TOK + _CHUNK_STRIDE, F.lit(1)
                ),
                F.lit(_CHUNK_STRIDE),
            )
        ).alias("s"),
    )
    return starts.select(
        "doc_id",
        F.expr(f"CAST((s - 1) div {_CHUNK_STRIDE} AS BIGINT)").alias(
            "chunk_id"
        ),
        (
            F.least(
                F.col("s") + _CHUNK_TOK - 1, F.size("w")
            )
            - F.col("s")
            + 1
        )
        .cast("bigint")
        .alias("n_tok"),
        F.md5(
            F.concat_ws(
                " ",
                F.expr(
                    f"slice(w, s, LEAST(s + {_CHUNK_TOK} - 1, size(w))"
                    " - s + 1)"
                ),
            )
        ).alias("chunk_hash"),
    )


# ---------------------------------------------------------------------------
# rel_grouping_id — GROUPING() disambiguation over CUBE
# ---------------------------------------------------------------------------


@query(
    "rel_grouping_id",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS cents
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def rel_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING_ID over CUBE — the disambiguation surface every
    rollup/cube consumer eventually needs: a NULL in a grouping column
    is ambiguous between "subtotal row" and "group whose key IS NULL";
    GROUPING() is the bitmask that tells them apart (the classic
    silent-bug source in BI extracts).  Emits the 2-bit gid alongside
    the cube aggregate; integer cents keep the row hash-exact.

    Scale shape: one expand + hash aggregate — the `rel_agg_cube` plan
    with one extra literal-derived column, no added shuffle."""
    t = Tables(spark, sf_dir)
    cents = F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)")
    return (
        t.lineitem.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(cents).cast("bigint").alias("cents"),
            (
                F.grouping("l_returnflag") * 2
                + F.grouping("l_linestatus")
            )
            .cast("bigint")
            .alias("gid"),
        )
        .select(
            "l_returnflag", "l_linestatus", "gid", "n_rows", "cents"
        )
    )


# ---------------------------------------------------------------------------
# traj_lcss_pair_2d / traj_edr_pair_2d — 2-D eps-matching, integer-exact
# ---------------------------------------------------------------------------

_EPS2_MICRO2 = 10_000_000 ** 2  # eps = 10.0 plane units, in micro^2


def _series_2d_q_sql() -> str:
    """Micro-quantized 2-D series CTEs in the (time-in-days, value)
    plane — quantization AFTER the same float projection the engine
    computes, so the BIGINT coordinates agree bit-for-bit."""
    return """
    t0 AS (SELECT MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS t0
           FROM events),
    av(i, qx, qy) AS (
        SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id),
               CAST(ROUND((epoch_us(CAST(ts AS TIMESTAMP))
                           - (SELECT t0 FROM t0)) / 86400000000.0 * 1e6)
                    AS BIGINT),
               CAST(ROUND(value * 1e6) AS BIGINT)
        FROM events WHERE user_id = 2
    ),
    bv(j, qx, qy) AS (
        SELECT ROW_NUMBER() OVER (ORDER BY ts, event_id),
               CAST(ROUND((epoch_us(CAST(ts AS TIMESTAMP))
                           - (SELECT t0 FROM t0)) / 86400000000.0 * 1e6)
                    AS BIGINT),
               CAST(ROUND(value * 1e6) AS BIGINT)
        FROM events WHERE user_id = 1
    )"""


def _lcss_pair_2d_oracle() -> str:
    from .trajectory import _dp_layers_sql

    combine = (
        "GREATEST("
        "MAX(CASE WHEN cur.age = 1 THEN cur.val + cells.d"
        "         ELSE cur.val END), "
        "MAX(CASE WHEN cells.i = 1 OR cells.k - cells.i = 1"
        "         THEN cells.d ELSE 0 END))"
    )
    cost = (
        "CASE WHEN (av.qx - bv.qx) * (av.qx - bv.qx)"
        " + (av.qy - bv.qy) * (av.qy - bv.qy)"
        f" <= {_EPS2_MICRO2} THEN 1 ELSE 0 END"
    )
    dp = _dp_layers_sql("lcss2_dp", combine, cost)
    return f"""
    WITH RECURSIVE
    {_series_2d_q_sql()},
    {dp},
    nm AS (SELECT (SELECT MAX(i) FROM av) AS n,
                  (SELECT MAX(j) FROM bv) AS m)
    SELECT CAST(2 AS BIGINT) AS user_id,
           CAST((SELECT val FROM lcss2_dp
                 WHERE age = 0 AND k = (SELECT n + m FROM nm)
                   AND i = (SELECT n FROM nm)) AS BIGINT) AS lcss_len,
           ROUND(CAST((SELECT val FROM lcss2_dp
                       WHERE age = 0 AND k = (SELECT n + m FROM nm)
                         AND i = (SELECT n FROM nm)) AS DOUBLE)
                 / (SELECT LEAST(n, m) FROM nm), 6) AS lcss_sim
    """


def _edr_pair_2d_oracle() -> str:
    from .trajectory import _dp_layers_sql

    combine = (
        "LEAST("
        "MIN(CASE WHEN cur.age = 1 THEN cur.val + cells.d"
        "         ELSE cur.val + 1 END), "
        "MIN(CASE WHEN cells.i = 1"
        "         THEN LEAST(cells.k - cells.i - 1 + cells.d,"
        "                    cells.k - cells.i + 1)"
        "         ELSE 1099511627776 END), "
        "MIN(CASE WHEN cells.k - cells.i = 1"
        "         THEN LEAST(cells.i - 1 + cells.d, cells.i + 1)"
        "         ELSE 1099511627776 END))"
    )
    cost = (
        "CASE WHEN (av.qx - bv.qx) * (av.qx - bv.qx)"
        " + (av.qy - bv.qy) * (av.qy - bv.qy)"
        f" <= {_EPS2_MICRO2} THEN 0 ELSE 1 END"
    )
    dp = _dp_layers_sql("edr2_dp", combine, cost)
    return f"""
    WITH RECURSIVE
    {_series_2d_q_sql()},
    {dp},
    nm AS (SELECT (SELECT MAX(i) FROM av) AS n,
                  (SELECT MAX(j) FROM bv) AS m)
    SELECT CAST(2 AS BIGINT) AS user_id,
           CAST((SELECT val FROM edr2_dp
                 WHERE age = 0 AND k = (SELECT n + m FROM nm)
                   AND i = (SELECT n FROM nm)) AS BIGINT) AS edr,
           ROUND(CAST((SELECT val FROM edr2_dp
                       WHERE age = 0 AND k = (SELECT n + m FROM nm)
                         AND i = (SELECT n FROM nm)) AS DOUBLE)
                 / (SELECT GREATEST(n, m) FROM nm), 6) AS edr_norm
    """


def _paired_2d_quantized(t: Tables, ids: DataFrame | None = None):
    """``_paired_series_2d`` rows with micro-quantized coordinate
    arrays (SQL ROUND, JVM-side — same doubles, same half-rounding as
    the oracle).  Without ``ids``: the user-2 pair row; with ``ids``:
    the candidate set (search tier)."""
    from .trajectory import _QUERY_USER, _paired_series_2d

    q = "transform({0}, x -> CAST(ROUND(x * 1e6) AS BIGINT))"
    base = _paired_series_2d(t, _QUERY_USER, ids=ids)
    if ids is None:
        base = base.filter(F.col("user_id") == 2)
    return (
        base
        .select(
            "user_id",
            F.expr(q.format("xs")).alias("qxa"),
            F.expr(q.format("ys")).alias("qya"),
            F.expr(q.format("qxs")).alias("qxb"),
            F.expr(q.format("qys")).alias("qyb"),
        )
    )


@query("traj_lcss_pair_2d", oracle=_lcss_pair_2d_oracle)
def traj_lcss_pair_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LCSS between users 1 and 2 in the (time-in-days, value) PLANE —
    the 2-D completion of the eps-matching tier.  Stronger-than-1-D
    exactness: the Euclidean match decision is the INTEGER comparison
    (dx^2 + dy^2 <= eps^2) on micro-quantized coordinates — the sqrt
    in the 2-D metric never materializes anywhere, unlike the 2-D
    Fréchet/DTW rows whose cells carry float SQRT values."""
    import numpy as np
    import pandas as pd

    from ..functions import kernels

    t = Tables(spark, sf_dir)
    paired = _paired_2d_quantized(t)

    def refine(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                a = np.stack(
                    [
                        np.asarray(row.qxa, dtype=np.int64),
                        np.asarray(row.qya, dtype=np.int64),
                    ],
                    axis=1,
                )
                b = np.stack(
                    [
                        np.asarray(row.qxb, dtype=np.int64),
                        np.asarray(row.qyb, dtype=np.int64),
                    ],
                    axis=1,
                )
                ln = kernels.lcss_int2d(a, b, _EPS2_MICRO2)
                ml = min(len(a), len(b))
                out.append((row.user_id, ln, round(ln / ml, 6)))
            yield pd.DataFrame(
                out, columns=["user_id", "lcss_len", "lcss_sim"]
            )

    return paired.mapInPandas(
        refine,
        schema="user_id bigint, lcss_len bigint, lcss_sim double",
    )


@query("traj_edr_pair_2d", oracle=_edr_pair_2d_oracle)
def traj_edr_pair_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EDR between users 1 and 2 in the plane — same integer-exact
    Euclidean match decision as ``traj_lcss_pair_2d`` (no sqrt
    anywhere), same virtual-boundary recursive-CTE oracle as the 1-D
    EDR row."""
    import numpy as np
    import pandas as pd

    from ..functions import kernels

    t = Tables(spark, sf_dir)
    paired = _paired_2d_quantized(t)

    def refine(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                a = np.stack(
                    [
                        np.asarray(row.qxa, dtype=np.int64),
                        np.asarray(row.qya, dtype=np.int64),
                    ],
                    axis=1,
                )
                b = np.stack(
                    [
                        np.asarray(row.qxb, dtype=np.int64),
                        np.asarray(row.qyb, dtype=np.int64),
                    ],
                    axis=1,
                )
                e = kernels.edr_int2d(a, b, _EPS2_MICRO2)
                ml = max(len(a), len(b))
                out.append((row.user_id, e, round(e / ml, 6)))
            yield pd.DataFrame(
                out, columns=["user_id", "edr", "edr_norm"]
            )

    return paired.mapInPandas(
        refine,
        schema="user_id bigint, edr bigint, edr_norm double",
    )


# ---------------------------------------------------------------------------
# 2-D LCSS / EDR search tier (threshold + kNN) — WEAK rows, brute-pinned
# ---------------------------------------------------------------------------

_EPSM = 10_000_000  # eps in micro units (10.0 plane units)


def _pts_2d_q(t: Tables) -> DataFrame:
    """(user_id, i, qx, qy): micro-quantized plane points with 1-based
    per-user positions (same ordering as the 2-D assemblies).

    ``seq`` IS that position (``user_points`` ranks by the same
    (user_id; ts, event_id) order), so the former second row_number
    window was the identity — dropped in round 12 (guide §2.4)."""
    ev = t.user_points()
    t0 = t.events.agg(F.min(F.unix_micros("ts")).alias("t0"))
    return (
        ev.join(F.broadcast(t0))
        .select(
            "user_id",
            F.col("seq").alias("i"),
            F.expr(
                "CAST(ROUND((unix_micros(ts) - t0) / 86400000000.0"
                " * 1e6) AS BIGINT)"
            ).alias("qx"),
            F.expr("CAST(ROUND(value * 1e6) AS BIGINT)").alias("qy"),
        )
    )


def _matchable_2d(t: Tables) -> DataFrame:
    """Per-candidate count of points with SOME query point within eps
    (2-D eps-grid: probe the query side's 9 neighbor cells, verify the
    exact integer squared distance).  LCSS_2d <= matchable (each match
    consumes one matchable point) and EDR_2d >= max(n,m) - matchable —
    both LOSSLESS; same dense-regime selectivity caveat as the 1-D
    bounds.  Returns (user_id, n, matchable)."""
    pts = _pts_2d_q(t)
    q = pts.filter(F.col("user_id") == 1)
    qcells = (
        q.select(
            F.explode(
                F.expr(
                    f"flatten(transform(sequence(-1, 1), dx ->"
                    f" transform(sequence(-1, 1), dy ->"
                    f" struct((qx div {_EPSM}) + dx AS cx,"
                    f" (qy div {_EPSM}) + dy AS cy))))"
                )
            ).alias("c"),
            F.col("qx").alias("bx"),
            F.col("qy").alias("by"),
        )
        .select("c.cx", "c.cy", "bx", "by")
    )
    cand = pts.filter(F.col("user_id") != 1).select(
        "user_id",
        "i",
        "qx",
        "qy",
        F.expr(f"qx div {_EPSM}").alias("cx"),
        F.expr(f"qy div {_EPSM}").alias("cy"),
    )
    matchable = (
        cand.join(F.broadcast(qcells), ["cx", "cy"])
        .filter(
            (F.col("qx") - F.col("bx")) * (F.col("qx") - F.col("bx"))
            + (F.col("qy") - F.col("by")) * (F.col("qy") - F.col("by"))
            <= _EPSM * _EPSM
        )
        .select("user_id", "i")
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").alias("matchable"))
    )
    return (
        cand.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .join(matchable, "user_id", "left")
        .select(
            "user_id",
            "n",
            F.coalesce("matchable", F.lit(0)).alias("matchable"),
        )
    )


def _lcss2d_refine(t: Tables, ids: DataFrame) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..functions import kernels

    paired = _paired_2d_quantized(t, ids=ids).repartition(
        t.spark.sparkContext.defaultParallelism
    )

    def refine(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                a = np.stack(
                    [np.asarray(row.qxa, dtype=np.int64),
                     np.asarray(row.qya, dtype=np.int64)], axis=1)
                b = np.stack(
                    [np.asarray(row.qxb, dtype=np.int64),
                     np.asarray(row.qyb, dtype=np.int64)], axis=1)
                ln = kernels.lcss_int2d(a, b, _EPS2_MICRO2)
                ml = min(len(a), len(b))
                out.append((row.user_id, ln, ml, round(ln / ml, 6)))
            yield pd.DataFrame(
                out,
                columns=["user_id", "lcss_len", "min_len", "lcss_sim"],
            )

    return paired.mapInPandas(
        refine,
        schema="user_id bigint, lcss_len bigint, min_len bigint,"
        " lcss_sim double",
    )


def _edr2d_refine(t: Tables, ids: DataFrame) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..functions import kernels

    paired = _paired_2d_quantized(t, ids=ids).repartition(
        t.spark.sparkContext.defaultParallelism
    )

    def refine(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                a = np.stack(
                    [np.asarray(row.qxa, dtype=np.int64),
                     np.asarray(row.qya, dtype=np.int64)], axis=1)
                b = np.stack(
                    [np.asarray(row.qxb, dtype=np.int64),
                     np.asarray(row.qyb, dtype=np.int64)], axis=1)
                e = kernels.edr_int2d(a, b, _EPS2_MICRO2)
                ml = max(len(a), len(b))
                out.append((row.user_id, e, ml, round(e / ml, 6)))
            yield pd.DataFrame(
                out, columns=["user_id", "edr", "max_len", "edr_norm"]
            )

    return paired.mapInPandas(
        refine,
        schema="user_id bigint, edr bigint, max_len bigint,"
        " edr_norm double",
    )


@query("traj_lcss_threshold_2d", oracle=_lcss_threshold_2d_oracle)
def traj_lcss_threshold_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All users with plane-LCSS similarity >= 0.55 vs the query user —
    the 2-D completion of the LCSS search tier (unbanded: the plane's
    time AXIS already carries the temporal constraint the 1-D banded
    form imposes by index).  Lossless matchable-count bound gates the
    kernel; exact integer membership 20·lcss >= 11·min(n,m); brute
    equality pinned in tests/test_twophase.py."""
    t = Tables(spark, sf_dir)
    # query length: a plain pushdown-filtered events count — NOT a
    # user_points() count, which sorted the whole corpus through the
    # seq window to count one user's rows (round 12; row counts are
    # window-invariant)
    m = t.events.filter(F.col("user_id") == 1).count()
    cand = _matchable_2d(t).filter(
        F.col("matchable") * _LCSS_TAU_DEN
        >= F.least(F.col("n"), F.lit(m)) * _LCSS_TAU_NUM
    )
    return (
        _lcss2d_refine(t, cand)
        .filter(
            F.col("lcss_len") * _LCSS_TAU_DEN
            >= F.col("min_len") * _LCSS_TAU_NUM
        )
        .select("user_id", "lcss_len", "lcss_sim")
    )


@query("traj_lcss_knn_2d", oracle=_lcss_knn_2d_oracle)
def traj_lcss_knn_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by plane-LCSS similarity (DESC, id ties) — tau_k
    two-phase via ``_tau_knn`` with the LOSSLESS matchable-count upper
    bound (matchable >= LCSS_2d); bit-identical to refine-all, brute
    pinned in tests/test_twophase.py."""
    t = Tables(spark, sf_dir)
    # query length: a plain pushdown-filtered events count — NOT a
    # user_points() count, which sorted the whole corpus through the
    # seq window to count one user's rows (round 12; row counts are
    # window-invariant)
    m = t.events.filter(F.col("user_id") == 1).count()
    bound = _matchable_2d(t).select(
        "user_id",
        F.col("matchable").alias("bnum"),
        F.least(F.col("n"), F.lit(m)).alias("bden"),
    )
    res = _tau_knn(
        bound,
        lambda ids: _lcss2d_refine(t, ids),
        num="lcss_len",
        den="min_len",
        desc=True,
    )
    return (
        res.orderBy(
            (F.col("lcss_len") / F.col("min_len")).desc(), "user_id"
        )
        .limit(_SEARCH_K)
        .select("user_id", "lcss_len", "lcss_sim")
    )


@query("traj_edr_threshold_2d", oracle=_edr_threshold_2d_oracle)
def traj_edr_threshold_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All users with normalized plane-EDR <= 0.6 vs the query user;
    lossless lower bound max(|n-m|, max(n,m) - matchable) gates the
    kernel, integer membership 5·edr <= 3·max(n,m); brute pinned."""
    t = Tables(spark, sf_dir)
    # query length: a plain pushdown-filtered events count — NOT a
    # user_points() count, which sorted the whole corpus through the
    # seq window to count one user's rows (round 12; row counts are
    # window-invariant)
    m = t.events.filter(F.col("user_id") == 1).count()
    cand = _matchable_2d(t).select(
        "user_id",
        "n",
        F.greatest(
            F.abs(F.col("n") - F.lit(m)),
            F.greatest(F.col("n"), F.lit(m)) - F.col("matchable"),
        ).alias("lb"),
    ).filter(
        F.col("lb") * _EDR_TAU_DEN
        <= F.greatest(F.col("n"), F.lit(m)) * _EDR_TAU_NUM
    )
    return (
        _edr2d_refine(t, cand)
        .filter(
            F.col("edr") * _EDR_TAU_DEN
            <= F.col("max_len") * _EDR_TAU_NUM
        )
        .select("user_id", "edr", "edr_norm")
    )


@query("traj_edr_knn_2d", oracle=_edr_knn_2d_oracle)
def traj_edr_knn_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by smallest normalized plane-EDR (ASC, id ties) —
    tau_k two-phase via ``_tau_knn`` with the LOSSLESS lower bound
    max(|n-m|, max(n,m) - matchable); bit-identical to refine-all,
    brute pinned in tests/test_twophase.py."""
    t = Tables(spark, sf_dir)
    # query length: a plain pushdown-filtered events count — NOT a
    # user_points() count, which sorted the whole corpus through the
    # seq window to count one user's rows (round 12; row counts are
    # window-invariant)
    m = t.events.filter(F.col("user_id") == 1).count()
    bound = _matchable_2d(t).select(
        "user_id",
        F.greatest(
            F.abs(F.col("n") - F.lit(m)),
            F.greatest(F.col("n"), F.lit(m)) - F.col("matchable"),
        ).alias("bnum"),
        F.greatest(F.col("n"), F.lit(m)).alias("bden"),
    )
    res = _tau_knn(
        bound,
        lambda ids: _edr2d_refine(t, ids),
        num="edr",
        den="max_len",
        desc=False,
    )
    return (
        res.orderBy(F.col("edr") / F.col("max_len"), "user_id")
        .limit(_SEARCH_K)
        .select("user_id", "edr", "edr_norm")
    )


# ---------------------------------------------------------------------------
# ERP search tier (threshold + kNN) — metric norm-bound two-phase
# ---------------------------------------------------------------------------

_ERP_TAU_MICRO = 1_600_000_000  # 1600.0 value units in micro
_ERP_CK = 30  # phase-1 refine width for the kNN


def _erp_norms(t: Tables) -> DataFrame:
    """Per-candidate Chen&Ng ERP lower bound: ERP(a, b) >=
    |sum|a| - sum|b|| (ERP to the empty series IS the L1 mass, and ERP
    is a true metric, so the triangle inequality applies — the
    canonical published ERP prune).  Integer micro units end to end.
    Measured on THIS corpus the bound is weak (series carry similar
    total mass: lb/erp median 0.25, ~1/149 pruned at useful taus) —
    it ships as the lossless guard it is; on corpora where lengths or
    magnitudes vary it is the standard discriminative phase.
    Returns (user_id, lb)."""
    pts = t.user_points().select(
        "user_id",
        F.expr("ABS(CAST(ROUND(value * 1e6) AS BIGINT))").alias("av"),
    )
    sums = pts.groupBy("user_id").agg(F.sum("av").alias("sn"))
    qn = (
        sums.filter(F.col("user_id") == 1)
        .select(F.col("sn").alias("qn"))
    )
    return (
        sums.filter(F.col("user_id") != 1)
        .crossJoin(F.broadcast(qn))
        .select(
            "user_id",
            F.abs(F.col("sn") - F.col("qn")).alias("lb"),
        )
    )


def _erp_refine(t: Tables, ids: DataFrame) -> DataFrame:
    """Exact integer-ERP kernel over the candidate id set; returns
    (user_id, erp_micro, erp)."""
    import numpy as np
    import pandas as pd

    from ..functions import kernels
    from .trajectory import _QUERY_USER, _paired_series

    qz = "transform({0}, x -> CAST(ROUND(x * 1e6) AS BIGINT))"
    paired = (
        _paired_series(t, _QUERY_USER, ids=ids)
        .select(
            "user_id",
            F.expr(qz.format("vals")).alias("qa"),
            F.expr(qz.format("q_vals")).alias("qb"),
        )
        .repartition(t.spark.sparkContext.defaultParallelism)
    )

    def refine(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                a = np.asarray(row.qa, dtype=np.int64)
                b = np.asarray(row.qb, dtype=np.int64)
                e = kernels.erp(a, b)
                out.append((row.user_id, e, round(e / 1e6, 6)))
            yield pd.DataFrame(
                out, columns=["user_id", "erp_micro", "erp"]
            )

    return paired.mapInPandas(
        refine, schema="user_id bigint, erp_micro bigint, erp double"
    )


@query("traj_erp_threshold", oracle=_erp_threshold_oracle)
def traj_erp_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All users with ERP <= 1600.0 vs the query user — the metric
    member of the search matrix: the LOSSLESS triangle-inequality
    norm bound (|L1(a) - L1(q)| <= ERP, Chen & Ng) gates the kernel,
    survivors refine exactly, membership is the integer comparison
    erp_micro <= tau_micro.  Brute equality + bound admissibility
    pinned in tests/test_twophase.py."""
    t = Tables(spark, sf_dir)
    cand = _erp_norms(t).filter(F.col("lb") <= _ERP_TAU_MICRO)
    return (
        _erp_refine(t, cand)
        .filter(F.col("erp_micro") <= _ERP_TAU_MICRO)
        .select("user_id", "erp_micro", "erp")
    )


@query("traj_erp_knn", oracle=_erp_knn_oracle)
def traj_erp_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by ERP — the reference's two-phase kNN shape on
    the metric measure: refine the 30 best-bounded candidates, take
    the 10th exact distance as tau_k, refine every remaining user
    whose norm bound <= tau_k (any user with lb > tau_k has
    ERP >= lb > tau_k and cannot enter the top 10), merge, global
    top-10 by (erp_micro, user_id) — all integer decisions; only the
    scalar tau_k crosses to the driver (the AQE-stats footprint).
    Brute equality pinned in tests/test_twophase.py."""
    t = Tables(spark, sf_dir)
    lb = _erp_norms(t).localCheckpoint()
    first_ids = lb.orderBy("lb", "user_id").limit(_ERP_CK)
    first = _erp_refine(t, first_ids).localCheckpoint()
    tau_row = (
        first.orderBy("erp_micro", "user_id")
        .limit(_SEARCH_K)
        .agg(F.max("erp_micro").alias("tau"))
        .head()
    )
    tau = tau_row[0] if tau_row and tau_row[0] is not None else None
    if tau is None:
        rest_ids = lb.join(
            F.broadcast(first_ids.select("user_id")),
            "user_id",
            "left_anti",
        )
    else:
        rest_ids = (
            lb.filter(F.col("lb") <= tau)
            .join(
                F.broadcast(first_ids.select("user_id")),
                "user_id",
                "left_anti",
            )
        )
    rest = _erp_refine(t, rest_ids)
    return (
        first.unionByName(rest)
        .orderBy("erp_micro", "user_id")
        .limit(_SEARCH_K)
        .select("user_id", "erp_micro", "erp")
    )


# ---------------------------------------------------------------------------
# ERP in the plane: traj_erp_pair_2d (FULL) + threshold/kNN (WEAK)
# ---------------------------------------------------------------------------


def _sql_isqrt(d2: str) -> str:
    """Exact integer floor-sqrt of a non-negative BIGINT SQL expression:
    float-sqrt candidate corrected by +-1 with exact integer compares
    (kernels.isqrt_i64's SQL mirror; identical text runs on Spark SQL
    and DuckDB).  Valid for d2 < isqrt(2^63-1)^2 ~ 9.2e18 (above that
    (s0+1)^2 overflows) — the plane coordinates are micro-quantized
    (time-in-days, value), |q| <= ~6e8, so a coordinate difference can
    reach ~1.2e9 and dx^2+dy^2 tops out near 2.9e18 < 2^62: inside the
    bound with a >3x margin."""
    s0 = f"CAST(FLOOR(SQRT(CAST(({d2}) AS DOUBLE))) AS BIGINT)"
    return (
        f"(CASE WHEN ({s0} + 1) * ({s0} + 1) <= ({d2}) THEN {s0} + 1"
        f" WHEN {s0} * {s0} > ({d2}) THEN {s0} - 1 ELSE {s0} END)"
    )


def _erp_pair_2d_oracle() -> str:
    # The 1-D _erp_pair_oracle recursion with 2-D costs: match cost
    # isqrt(dx^2 + dy^2), gap cost isqrt(px^2 + py^2) (gap g = the
    # plane origin) — the floor-sqrt keeps every DP cell, INCLUDING
    # the boundary prefix sums, a BIGINT, so the float sqrt that
    # SURVEY flagged as the 2-D ERP blocker never reaches a membership
    # or accumulation decision on either engine.
    big = 1 << 60
    d_expr = _sql_isqrt(
        "(an.qx - bn.qx) * (an.qx - bn.qx)"
        " + (an.qy - bn.qy) * (an.qy - bn.qy)"
    )
    return f"""
    WITH RECURSIVE
    {_series_2d_q_sql()},
    an AS (SELECT i, qx, qy,
                  {_sql_isqrt("qx * qx + qy * qy")} AS nrm FROM av),
    bn AS (SELECT j, qx, qy,
                  {_sql_isqrt("qx * qx + qy * qy")} AS nrm FROM bv),
    pa AS (
        SELECT i, SUM(nrm) OVER (ORDER BY i) AS p,
               COALESCE(SUM(nrm) OVER (ORDER BY i
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS pprev
        FROM an
    ),
    pb AS (
        SELECT j, SUM(nrm) OVER (ORDER BY j) AS p,
               COALESCE(SUM(nrm) OVER (ORDER BY j
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS pprev
        FROM bn
    ),
    erp2_dp(k, i, val, age) AS (
        SELECT 2, 1,
               (SELECT LEAST({d_expr}, an.nrm + bn.nrm)
                FROM an, bn WHERE an.i = 1 AND bn.j = 1), 0
        UNION ALL
        (
          WITH cur AS (SELECT * FROM erp2_dp),
          kk AS (SELECT MAX(k) AS k FROM cur),
          cells AS (
              SELECT (SELECT k FROM kk) + 1 AS k, an.i AS i,
                     {d_expr} AS d,
                     an.nrm AS ca, bn.nrm AS cb,
                     pa.p AS pap, pa.pprev AS papp,
                     pb.p AS pbp, pb.pprev AS pbpp
              FROM an
              JOIN bn ON bn.j = (SELECT k FROM kk) + 1 - an.i
              JOIN pa ON pa.i = an.i
              JOIN pb ON pb.j = bn.j
          ),
          newcells AS (
              SELECT cells.k, cells.i,
                     LEAST(
                       MIN(CASE WHEN cur.age = 1
                                THEN cur.val + cells.d
                                WHEN cur.i = cells.i
                                THEN cur.val + cells.cb
                                ELSE cur.val + cells.ca END),
                       MIN(CASE WHEN cells.i = 1
                            THEN LEAST(cells.pbpp + cells.d,
                                       cells.pbp + cells.ca)
                            ELSE {big} END),
                       MIN(CASE WHEN cells.k - cells.i = 1
                            THEN LEAST(cells.papp + cells.d,
                                       cells.pap + cells.cb)
                            ELSE {big} END)
                     ) AS val, 0 AS age
              FROM cells JOIN cur
                ON (cur.age = 0 AND cur.i IN (cells.i - 1, cells.i))
                OR (cur.age = 1 AND cur.i = cells.i - 1)
              GROUP BY cells.k, cells.i, cells.d, cells.ca, cells.cb,
                       cells.pap, cells.papp, cells.pbp, cells.pbpp
          ),
          carry AS (
              SELECT k + 1 AS k, i, val, 1 AS age FROM cur WHERE age = 0
          )
          SELECT k, i, val, age FROM newcells
          UNION ALL
          SELECT k, i, val, age FROM carry
          WHERE (SELECT k FROM kk)
                < (SELECT MAX(i) FROM an) + (SELECT MAX(j) FROM bn)
        )
    )
    SELECT CAST(2 AS BIGINT) AS user_id,
           CAST((SELECT val FROM erp2_dp
                 WHERE age = 0
                   AND k = (SELECT MAX(i) FROM an)
                         + (SELECT MAX(j) FROM bn)
                   AND i = (SELECT MAX(i) FROM an)) AS BIGINT)
               AS erp_micro,
           ROUND((SELECT val FROM erp2_dp
                  WHERE age = 0
                    AND k = (SELECT MAX(i) FROM an)
                          + (SELECT MAX(j) FROM bn)
                    AND i = (SELECT MAX(i) FROM an)) / 1e6, 6) AS erp
    """


@query("traj_erp_pair_2d", oracle=_erp_pair_2d_oracle)
def traj_erp_pair_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERP between users 1 and 2 in the (time-in-days, value) PLANE —
    the 2-D completion of the metric measure (gap g = the origin, the
    standard choice that preserves the triangle inequality).

    Exactness: every match/gap cost is isqrt(dx^2 + dy^2) on
    micro-quantized coordinates — an exact integer (floor of the true
    Euclidean distance in micro units) computed identically on both
    engines via the float-sqrt-candidate +-1 integer correction
    (``kernels.isqrt_i64`` / ``_sql_isqrt``), so the whole DP is
    BIGINT; the one float is the final /1e6 display.

    Scale shape: identical to the other pair rows — two series
    assemblies, one Arrow batch, O(n*m) integer kernel."""
    import numpy as np
    import pandas as pd

    from ..functions import kernels

    t = Tables(spark, sf_dir)
    paired = _paired_2d_quantized(t)

    def refine(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                a = np.stack(
                    [
                        np.asarray(row.qxa, dtype=np.int64),
                        np.asarray(row.qya, dtype=np.int64),
                    ],
                    axis=1,
                )
                b = np.stack(
                    [
                        np.asarray(row.qxb, dtype=np.int64),
                        np.asarray(row.qyb, dtype=np.int64),
                    ],
                    axis=1,
                )
                e = kernels.erp_int2d(a, b)
                out.append((row.user_id, e, round(e / 1e6, 6)))
            yield pd.DataFrame(
                out, columns=["user_id", "erp_micro", "erp"]
            )

    return paired.mapInPandas(
        refine, schema="user_id bigint, erp_micro bigint, erp double"
    )


def _erp2d_norms(t: Tables) -> DataFrame:
    """Per-candidate LOSSLESS lower bound on floored plane-ERP vs the
    query user.  In TRUE (unfloored) space the Chen&Ng metric bound is
    ERP_t >= |M_t(a) - M_t(q)| with M_t = sum of true norms; flooring
    each cost drops it by < 1, so over a <=(n+m)-cell edit path
    ERP_f > ERP_t - (n+m), and each mass by < its count, so
    |M_t(a) - M_t(q)| >= |M_f(a) - M_f(q)| - max(n, m).  Hence
    lb = max(0, |dM_f| - (n + m + max(n, m))) <= ERP_f — exact
    integers end to end; the slack is <= ~3000 micro = 0.003 value
    units, negligible vs the ~1e9-micro distances.  Returns
    (user_id, n, lb)."""
    pts = _pts_2d_q(t).select(
        "user_id",
        F.expr(_sql_isqrt("qx * qx + qy * qy")).alias("nrm"),
    )
    sums = pts.groupBy("user_id").agg(
        F.sum("nrm").alias("sn"), F.count("*").alias("n")
    )
    qrow = sums.filter(F.col("user_id") == 1).select(
        F.col("sn").alias("qn"), F.col("n").alias("qm")
    )
    return (
        sums.filter(F.col("user_id") != 1)
        .crossJoin(F.broadcast(qrow))
        .select(
            "user_id",
            "n",
            F.greatest(
                F.lit(0),
                F.abs(F.col("sn") - F.col("qn"))
                - (
                    F.col("n")
                    + F.col("qm")
                    + F.greatest(F.col("n"), F.col("qm"))
                ),
            ).alias("lb"),
        )
    )


def _erp2d_refine(t: Tables, ids: DataFrame) -> DataFrame:
    """Exact integer plane-ERP kernel over the candidate id set;
    returns (user_id, erp_micro, erp).  Same mapInPandas fan-out
    discipline as the other 2-D refines."""
    import numpy as np
    import pandas as pd

    from ..functions import kernels

    paired = _paired_2d_quantized(t, ids=ids).repartition(
        t.spark.sparkContext.defaultParallelism
    )

    def refine(batches):
        for pdf in batches:
            out = []
            for row in pdf.itertuples():
                a = np.stack(
                    [
                        np.asarray(row.qxa, dtype=np.int64),
                        np.asarray(row.qya, dtype=np.int64),
                    ],
                    axis=1,
                )
                b = np.stack(
                    [
                        np.asarray(row.qxb, dtype=np.int64),
                        np.asarray(row.qyb, dtype=np.int64),
                    ],
                    axis=1,
                )
                e = kernels.erp_int2d(a, b)
                out.append((row.user_id, e, round(e / 1e6, 6)))
            yield pd.DataFrame(
                out, columns=["user_id", "erp_micro", "erp"]
            )

    return paired.mapInPandas(
        refine, schema="user_id bigint, erp_micro bigint, erp double"
    )


# 1800.0 plane units in micro — between p10 and p25 of the measured
# corpus distances (sf0.01 range 1.58e9..3.33e9, sf0.1 1.40e9..3.23e9),
# so the threshold row is nonempty and selective at both gate scales.
_ERP2D_TAU_MICRO = 1_800_000_000


@query("traj_erp_threshold_2d", oracle=_erp_threshold_2d_oracle)
def traj_erp_threshold_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All users with plane-ERP <= tau vs the query user — the 2-D
    metric threshold search: the lossless floored-norm bound
    (``_erp2d_norms``) gates the kernel, survivors refine exactly,
    membership is the integer comparison erp_micro <= tau_micro.
    Brute equality + bound admissibility pinned in
    tests/test_twophase.py."""
    t = Tables(spark, sf_dir)
    cand = _erp2d_norms(t).filter(F.col("lb") <= _ERP2D_TAU_MICRO)
    return (
        _erp2d_refine(t, cand)
        .filter(F.col("erp_micro") <= _ERP2D_TAU_MICRO)
        .select("user_id", "erp_micro", "erp")
    )


@query("traj_erp_knn_2d", oracle=_erp_knn_2d_oracle)
def traj_erp_knn_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by plane-ERP (ASC, id ties) — tau_k two-phase via
    ``_tau_knn`` on the absolute distance (den=None): refine the 30
    best-bounded candidates, tau_k = 10th exact erp_micro, phase 2
    refines only users whose lossless norm bound <= tau_k.
    Bit-identical to refine-all; brute pinned in
    tests/test_twophase.py."""
    t = Tables(spark, sf_dir)
    bound = _erp2d_norms(t).select(
        "user_id", F.col("lb").alias("bnum")
    )
    res = _tau_knn(
        bound,
        lambda ids: _erp2d_refine(t, ids),
        num="erp_micro",
        den=None,
        desc=False,
    )
    return (
        res.orderBy("erp_micro", "user_id")
        .limit(_SEARCH_K)
        .select("user_id", "erp_micro", "erp")
    )
