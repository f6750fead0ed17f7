"""Round-9 additions: exact substring-level deduplication (the cut
itself, not just the coverage statistic) and corpus drift diagnostics.

- ``text_substring_dedup`` — suffix k-gram WINDOW DEDUP (Lee et al.,
  "Deduplicating Training Data Makes Language Models Better",
  ACL'22): every 8-token run that occurs >= 2 times in the corpus is
  excised from all-but-its-first occurrence (first = lowest
  (doc_id, position)); per doc the cut spans union exactly, yielding
  cut/kept token counts and span counts — the fourth classic
  LLM-corpus dedup mode beside doc-level exact / MinHash / semantic
  (``text_exact_dedup`` / ``text_minhash_neardup`` /
  ``pipe_dedup_semantic``).  `text_dup_ngram_coverage` measures how
  much IS duplicated; this op decides what to CUT.
- ``text_corpus_drift`` — token-distribution shift between two corpus
  snapshots (even/odd doc_id halves): per top-vocab token the exact
  integer counts in each half plus per-token chi-squared and KL
  contributions as single shared float displays — `emb_drift`'s text
  twin, the monitoring table a training-data pipeline recomputes per
  snapshot to catch source drift before it reaches the model.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables

# ---------------------------------------------------------------------------
# text_substring_dedup — suffix k-gram window dedup (the cut decision)
# ---------------------------------------------------------------------------

_SSD_N = 8  # k-gram (token) window length — the dedup unit


@query(
    "text_substring_dedup",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    starts AS (
        SELECT t.doc_id, s.i,
               array_to_string(list_slice(t.l, s.i, s.i + {_SSD_N - 1}),
                               ' ') AS gram
        FROM toks t,
             UNNEST(generate_series(1, len(t.l) - {_SSD_N - 1}))
                 AS s(i)
    ),
    dup AS (
        SELECT gram FROM starts GROUP BY gram HAVING COUNT(*) >= 2
    ),
    occ AS (
        SELECT s.doc_id, s.i, s.gram
        FROM starts s JOIN dup USING (gram)
    ),
    o1 AS (SELECT gram, MIN(doc_id) AS od FROM occ GROUP BY gram),
    owner AS (
        SELECT o.gram, o1.od, MIN(o.i) AS oi
        FROM occ o JOIN o1 ON o1.gram = o.gram AND o.doc_id = o1.od
        GROUP BY o.gram, o1.od
    ),
    cut AS (
        SELECT o.doc_id, o.i,
               LEAD(o.i) OVER (PARTITION BY o.doc_id ORDER BY o.i)
                   AS nxt,
               LAG(o.i) OVER (PARTITION BY o.doc_id ORDER BY o.i)
                   AS prv
        FROM occ o JOIN owner w ON w.gram = o.gram
        WHERE NOT (o.doc_id = w.od AND o.i = w.oi)
    ),
    agg AS (
        SELECT doc_id, COUNT(*) AS n_cut_occ,
               CAST(SUM(LEAST({_SSD_N},
                              COALESCE(nxt - i, {_SSD_N})))
                    AS BIGINT) AS cut_tok,
               CAST(SUM(CASE WHEN prv IS NULL
                             OR i - prv > {_SSD_N} THEN 1
                        ELSE 0 END) AS BIGINT) AS cut_spans
        FROM cut GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(len(t.l) AS BIGINT) AS n_tok,
           CAST(COALESCE(a.n_cut_occ, 0) AS BIGINT) AS n_cut_occ,
           CAST(COALESCE(a.cut_spans, 0) AS BIGINT) AS cut_spans,
           COALESCE(a.cut_tok, 0) AS cut_tok,
           CAST(len(t.l) AS BIGINT) - COALESCE(a.cut_tok, 0)
               AS kept_tok,
           ROUND((CAST(len(t.l) AS DOUBLE) - COALESCE(a.cut_tok, 0))
                 / len(t.l), 6) AS kept_ratio
    FROM toks t LEFT JOIN agg a USING (doc_id)
    """,
)
def text_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUFFIX K-GRAM WINDOW DEDUP — the exact substring-level dedup
    CUT (Lee et al., ACL'22): any 8-token window occurring at least
    twice in the corpus is excised from every occurrence EXCEPT the
    first (first = lowest (doc_id, start position) — the canonical
    keep-one rule), and each document reports the merged cut spans:
    occurrence count, span count, cut/kept token counts, kept ratio.
    A pipeline applies the cut by dropping the token intervals; the
    decision table here IS the dedup (the doc-level family's fourth
    mode — exact, MinHash, semantic, and now substring).  Differs
    from the existing pair: `text_dup_ngram_coverage` only MEASURES
    duplication, and `text_dedup_cut` excises EVERY occurrence
    (destroying all copies of the content); this op is the
    keep-one-copy variant a corpus curator actually ships, which
    needs the global first-occurrence ownership decision the other
    two avoid.

    Exactness: ownership is a two-step integer argmin (MIN(doc_id)
    per gram, then MIN(i) within that doc — skew-safe map-side
    combinable aggregations, no per-gram window sort), interval
    union via the LEAD + LEAST(n, next-start) identity, span count
    via the gaps-islands LAG test (new span when the previous cut
    start is > n back) — integers end to end; the ratio is one
    display ROUND with the numerator CAST AS DOUBLE.

    Scale shape — EXACT-GROUP REPRESENTATIVE COLLAPSE (same proof as
    `text_substring_dedup_apply`, see its docstring: owners always
    live in first copies, corpus gram counts = rep counts weighted by
    group size, and a non-first copy with ≥ n tokens is fully cut —
    n_cut_occ = L−n+1, ONE merged span, cut_tok = L — while under n
    tokens nothing is cut): the shingle pass, the two gram-keyed hash
    aggs (duplicate filter + ownership — MIN not ROW_NUMBER, so hot
    grams are big counters, not big groups), the semi-shaped join
    back and the per-doc interval-union window all run on DISTINCT
    texts, then one text-keyed fan-out.  No global sort; the
    practical 100 TB stand-in for a suffix array, with the cut rule
    preserved (the pre-collapse form was 3x super-linear on the 100x
    dup-saturated clone probe)."""
    n = _SSD_N
    t = Tables(spark, sf_dir)
    docs = t.documents.repartition(spark.sparkContext.defaultParallelism, "doc_id").select(
        "doc_id", "text"
    )
    reps = docs.groupBy("text").agg(
        F.min("doc_id").alias("rep_id"),
        F.count("*").alias("m"),
    )
    toks = reps.select(
        F.col("rep_id").alias("doc_id"),
        "m",
        F.split("text", " ").alias("l"),
    )
    starts = toks.select(
        "doc_id",
        "m",
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
    ).select(
        "doc_id", "m", F.col("s.i").alias("i"),
        F.col("s.gram").alias("gram"),
    )
    # duplicate filter + ownership in ONE gram-keyed aggregate (round
    # 12, guide §2.3/§2.4): min(struct(doc_id, i)) is the lexicographic
    # argmin — MIN(doc_id) per gram, then MIN(i) within that doc, the
    # exact two-step ownership rule — and it is map-side combinable, so
    # the previous chain (dup semi-join + per-gram o1 aggregate + owner
    # join, four gram-keyed shuffles of the heavy gram strings) becomes
    # one aggregate + one join.
    ginfo = (
        starts.groupBy("gram")
        .agg(
            F.sum("m").alias("c"),  # corpus count = group-weighted
            F.min(F.struct("doc_id", "i")).alias("o"),
        )
        .filter(F.col("c") >= 2)
        .select(
            "gram",
            F.col("o.doc_id").alias("od"),
            F.col("o.i").alias("oi"),
        )
    )
    cut = (
        starts.select("doc_id", "i", "gram")
        .join(ginfo, "gram")
        .filter(
            ~((F.col("doc_id") == F.col("od")) & (F.col("i") == F.col("oi")))
        )
        .select("doc_id", "i")
    )
    w = W.partitionBy("doc_id").orderBy("i")
    spans = cut.select(
        "doc_id",
        "i",
        F.lead("i").over(w).alias("nxt"),
        F.lag("i").over(w).alias("prv"),
    )
    agg = spans.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_cut_occ"),
        F.sum(
            F.least(
                F.lit(n), F.coalesce(F.col("nxt") - F.col("i"), F.lit(n))
            )
        )
        .cast("bigint")
        .alias("cut_tok"),
        F.sum(
            F.when(
                F.col("prv").isNull() | (F.col("i") - F.col("prv") > n),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("cut_spans"),
    )
    rep_res = (
        toks.select(
            "doc_id", F.size("l").cast("bigint").alias("n_tok")
        )
        .join(agg, "doc_id", "left")
        .select(
            F.col("doc_id").alias("rep_id"),
            "n_tok",
            F.coalesce("n_cut_occ", F.lit(0))
            .cast("bigint")
            .alias("r_occ"),
            F.coalesce("cut_spans", F.lit(0))
            .cast("bigint")
            .alias("r_spans"),
            F.coalesce("cut_tok", F.lit(0)).alias("r_cut"),
        )
    )
    # fan back out: the rep keeps its computed result; every other
    # copy with >= n tokens is fully cut (L-n+1 occurrences merging
    # into one span covering all L tokens), under n tokens uncut
    first = F.col("doc_id") == F.col("rep_id")
    big = F.col("n_tok") >= n
    cut_tok = (
        F.when(first, F.col("r_cut"))
        .when(big, F.col("n_tok"))
        .otherwise(F.lit(0).cast("bigint"))
    )
    return (
        docs.join(reps.select("text", "rep_id"), "text")
        .join(rep_res, "rep_id")
        .select(
            "doc_id",
            "n_tok",
            F.when(first, F.col("r_occ"))
            .when(big, F.col("n_tok") - (n - 1))
            .otherwise(F.lit(0).cast("bigint"))
            .alias("n_cut_occ"),
            F.when(first, F.col("r_spans"))
            .when(big, F.lit(1).cast("bigint"))
            .otherwise(F.lit(0).cast("bigint"))
            .alias("cut_spans"),
            cut_tok.alias("cut_tok"),
            (F.col("n_tok") - cut_tok).alias("kept_tok"),
            F.round(
                (F.col("n_tok").cast("double") - cut_tok)
                / F.col("n_tok"),
                6,
            ).alias("kept_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# text_corpus_drift — token-distribution shift between snapshot halves
# ---------------------------------------------------------------------------

_DRIFT_TOPN = 50  # monitored vocabulary size

# per-token 2x2 chi-squared (a = cnt_a, b = cnt_b vs the rest of each
# half) and the KL(p_a || p_b) contribution, as single shared float
# display expressions over exact integer counts (< 2^53, so the DOUBLE
# casts are identical on both engines); {a} {b} {ta} {tb} are column
# names.  Literals CAST AS DOUBLE per the house rule.
def _drift_chi2_sql(a: str, b: str, ta: str, tb: str) -> str:
    return (
        f"ROUND((CAST({ta} AS DOUBLE) + CAST({tb} AS DOUBLE))"
        f" * (CAST({a} AS DOUBLE) * (CAST({tb} AS DOUBLE)"
        f"        - CAST({b} AS DOUBLE))"
        f"    - CAST({b} AS DOUBLE) * (CAST({ta} AS DOUBLE)"
        f"        - CAST({a} AS DOUBLE)))"
        f" * (CAST({a} AS DOUBLE) * (CAST({tb} AS DOUBLE)"
        f"        - CAST({b} AS DOUBLE))"
        f"    - CAST({b} AS DOUBLE) * (CAST({ta} AS DOUBLE)"
        f"        - CAST({a} AS DOUBLE)))"
        f" / (CAST({a} AS DOUBLE) + CAST({b} AS DOUBLE))"
        f" / (CAST({ta} AS DOUBLE) - CAST({a} AS DOUBLE)"
        f"    + CAST({tb} AS DOUBLE) - CAST({b} AS DOUBLE))"
        f" / CAST({ta} AS DOUBLE) / CAST({tb} AS DOUBLE), 6) + 0.0"
    )


def _drift_kl_sql(a: str, b: str, ta: str, tb: str) -> str:
    return (
        f"ROUND((CAST({a} AS DOUBLE) / CAST({ta} AS DOUBLE))"
        f" * LN((CAST({a} AS DOUBLE) / CAST({ta} AS DOUBLE))"
        f"      / (CAST({b} AS DOUBLE) / CAST({tb} AS DOUBLE))), 6)"
        f" + 0.0"
    )


@query(
    "text_corpus_drift",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id % 2 AS half, UNNEST(string_split(text, ' '))
                   AS token
        FROM documents
    ),
    cnt AS (
        SELECT token,
               SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS cnt_a,
               SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS cnt_b
        FROM tok GROUP BY token
    ),
    tot AS (
        SELECT SUM(cnt_a) AS ta, SUM(cnt_b) AS tb FROM cnt
    ),
    top AS (
        SELECT token, cnt_a, cnt_b FROM (
            SELECT token, cnt_a, cnt_b,
                   ROW_NUMBER() OVER (ORDER BY cnt_a + cnt_b DESC,
                                      token) AS rk
            FROM cnt WHERE cnt_a >= 1 AND cnt_b >= 1
        ) WHERE rk <= {_DRIFT_TOPN}
    )
    SELECT t.token,
           CAST(t.cnt_a AS BIGINT) AS cnt_a,
           CAST(t.cnt_b AS BIGINT) AS cnt_b,
           CAST(tot.ta AS BIGINT) AS total_a,
           CAST(tot.tb AS BIGINT) AS total_b,
           {_drift_chi2_sql("t.cnt_a", "t.cnt_b", "tot.ta", "tot.tb")}
               AS chi2_cell,
           {_drift_kl_sql("t.cnt_a", "t.cnt_b", "tot.ta", "tot.tb")}
               AS kl_term
    FROM top t, tot
    """,
)
def text_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS DRIFT between two snapshots (even/odd doc_id halves —
    the deterministic stand-in for consecutive crawl snapshots): per
    top-{_DRIFT_TOPN} vocabulary token, the exact integer counts in
    each half plus the per-token chi-squared contribution (2x2 token
    vs rest-of-half contingency) and the KL(p_a || p_b) term — the
    drift-monitoring table (`emb_drift`'s text twin) a training-data
    pipeline recomputes per snapshot; a spike in either column names
    the token whose rate shifted.

    Exactness: counts are one map-side-combinable integer hash agg;
    vocabulary membership is an integer decision (total count DESC,
    token tie-break, both halves >= 1 so neither display hits a
    zero denominator or LN(0)); chi-squared and KL are single shared
    float display expressions over integer counts < 2^53 (identical
    DOUBLE casts both engines, per-CELL terms per the
    `rel_chi2_cells` discipline — never a float running sum), with
    + 0.0 on both (the KL term is sign-crossing; chi2's subtraction
    can round to -0).

    Scale shape: one tokenize-explode pass, one token-keyed hash agg,
    a 1-row totals broadcast, a top-N window over the (bounded) token
    vocabulary, and 50 final display rows."""
    t = Tables(spark, sf_dir)
    tok = t.documents.repartition(spark.sparkContext.defaultParallelism, "doc_id").select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.split("text", " ")).alias("token"),
    )
    cnt = tok.groupBy("token").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias(
            "cnt_a"
        ),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias(
            "cnt_b"
        ),
    )
    tot = cnt.agg(
        F.sum("cnt_a").alias("ta"), F.sum("cnt_b").alias("tb")
    )
    # top-N via orderBy+limit (TakeOrderedAndProject — distributed
    # partial sort, no single-partition ROW_NUMBER window); the total
    # order (count DESC, token) makes it semantically identical to the
    # oracle's ROW_NUMBER <= N
    top = (
        cnt.filter((F.col("cnt_a") >= 1) & (F.col("cnt_b") >= 1))
        .orderBy((F.col("cnt_a") + F.col("cnt_b")).desc(), "token")
        .limit(_DRIFT_TOPN)
    )
    return top.join(F.broadcast(tot)).selectExpr(
        "token",
        "CAST(cnt_a AS BIGINT) AS cnt_a",
        "CAST(cnt_b AS BIGINT) AS cnt_b",
        "CAST(ta AS BIGINT) AS total_a",
        "CAST(tb AS BIGINT) AS total_b",
        f"{_drift_chi2_sql('cnt_a', 'cnt_b', 'ta', 'tb')}"
        f" AS chi2_cell",
        f"{_drift_kl_sql('cnt_a', 'cnt_b', 'ta', 'tb')} AS kl_term",
    )


# ---------------------------------------------------------------------------
# text_substring_dedup_apply — the keep-first cut APPLIED (kept text)
# ---------------------------------------------------------------------------


@query(
    "text_substring_dedup_apply",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS l FROM documents
    ),
    starts AS (
        SELECT t.doc_id, s.i,
               array_to_string(list_slice(t.l, s.i, s.i + {_SSD_N - 1}),
                               ' ') AS gram
        FROM toks t,
             UNNEST(generate_series(1, len(t.l) - {_SSD_N - 1}))
                 AS s(i)
    ),
    dup AS (
        SELECT gram FROM starts GROUP BY gram HAVING COUNT(*) >= 2
    ),
    occ AS (
        SELECT s.doc_id, s.i, s.gram
        FROM starts s JOIN dup USING (gram)
    ),
    o1 AS (SELECT gram, MIN(doc_id) AS od FROM occ GROUP BY gram),
    owner AS (
        SELECT o.gram, o1.od, MIN(o.i) AS oi
        FROM occ o JOIN o1 ON o1.gram = o.gram AND o.doc_id = o1.od
        GROUP BY o.gram, o1.od
    ),
    cut AS (
        SELECT o.doc_id, o.i
        FROM occ o JOIN owner w ON w.gram = o.gram
        WHERE NOT (o.doc_id = w.od AND o.i = w.oi)
    ),
    cov AS (
        SELECT DISTINCT c.doc_id, c.i + g.o AS pos
        FROM cut c, UNNEST(generate_series(0, {_SSD_N - 1})) AS g(o)
    ),
    tp AS (
        SELECT t.doc_id, s.i AS pos, t.l[s.i] AS tok
        FROM toks t, UNNEST(generate_series(1, len(t.l))) AS s(i)
    ),
    kept AS (
        SELECT tp.doc_id, tp.pos, tp.tok
        FROM tp LEFT JOIN cov
          ON cov.doc_id = tp.doc_id AND cov.pos = tp.pos
        WHERE cov.doc_id IS NULL
    ),
    rec AS (
        SELECT doc_id, COUNT(*) AS kept_tok,
               md5(string_agg(tok, ' ' ORDER BY pos)) AS kept_md5
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id, CAST(len(t.l) AS BIGINT) AS n_tok,
           CAST(COALESCE(r.kept_tok, 0) AS BIGINT) AS kept_tok,
           COALESCE(r.kept_md5, md5('')) AS kept_md5
    FROM toks t LEFT JOIN rec r USING (doc_id)
    """,
)
def text_substring_dedup_apply(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THE KEEP-FIRST SUBSTRING CUT APPLIED — `text_substring_dedup`
    decides, this op TRANSFORMS: every token position covered by a
    non-owned duplicated 8-token window is excised, the surviving
    tokens re-join in order, and the md5 of the reconstructed kept
    text certifies both engines rebuild the identical string (the
    `text_dedup_cut` certification pattern under the keep-one-copy
    ownership rule).  An exact duplicate of an earlier document keeps
    nothing (kept_md5 = md5('')) — the degenerate case where
    substring dedup subsumes doc-level exact dedup; the first copy
    keeps everything.

    Shape — EXACT-GROUP REPRESENTATIVE COLLAPSE (the round-7
    dup-saturated-corpus cure, provably result-identical here): the
    whole decide+explode+rebuild chain runs on DISTINCT texts only.
    (a) An owner occurrence always lives in a group's FIRST copy —
    the gram's minimal doc_id is ≤ every group's rep id — so rep-space
    ownership equals corpus ownership.  (b) Corpus gram counts =
    rep-space counts weighted by group size (SUM(m), not COUNT).
    (c) A NON-first copy with ≥ n tokens keeps NOTHING: windows tile
    every position (any p has a start in [p−n+1, p] ∩ [1, L−n+1]),
    every window is duplicated (its text occurs m ≥ 2 times) and
    non-owned (the owner doc is the earlier first copy) — so its row
    is (0, md5('')) by construction; under n tokens there are no
    windows and it keeps everything.  The 100x dup-saturated clone
    probe OOM'd the naive per-doc position explode (~760 M (doc, pos)
    rows); rep-collapse makes the explode distinct-text-sized.  The
    rebuild anti-join shuffles on (rep, position) hash keys."""
    n = _SSD_N
    t = Tables(spark, sf_dir)
    docs = t.documents.repartition(spark.sparkContext.defaultParallelism, "doc_id").select(
        "doc_id", "text"
    )
    reps = docs.groupBy("text").agg(
        F.min("doc_id").alias("rep_id"),
        F.count("*").alias("m"),
    )
    toks = reps.select(
        F.col("rep_id").alias("doc_id"),
        "m",
        F.split("text", " ").alias("l"),
    )
    starts = toks.select(
        "doc_id",
        "m",
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
    ).select(
        "doc_id", "m", F.col("s.i").alias("i"),
        F.col("s.gram").alias("gram"),
    )
    # duplicate filter + ownership in ONE gram-keyed aggregate (round
    # 12, guide §2.3/§2.4): min(struct(doc_id, i)) is the lexicographic
    # argmin — MIN(doc_id) per gram, then MIN(i) within that doc, the
    # exact two-step ownership rule — and it is map-side combinable, so
    # the previous chain (dup semi-join + per-gram o1 aggregate + owner
    # join, four gram-keyed shuffles of the heavy gram strings) becomes
    # one aggregate + one join.
    ginfo = (
        starts.groupBy("gram")
        .agg(
            F.sum("m").alias("c"),  # corpus count = group-weighted
            F.min(F.struct("doc_id", "i")).alias("o"),
        )
        .filter(F.col("c") >= 2)
        .select(
            "gram",
            F.col("o.doc_id").alias("od"),
            F.col("o.i").alias("oi"),
        )
    )
    cut = (
        starts.select("doc_id", "i", "gram")
        .join(ginfo, "gram")
        .filter(
            ~((F.col("doc_id") == F.col("od")) & (F.col("i") == F.col("oi")))
        )
        .select("doc_id", "i")
    )
    cov = cut.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("i"), F.col("i") + (n - 1))
        ).alias("pos"),
    ).distinct()
    tp = toks.select(
        "doc_id",
        F.posexplode("l").alias("p0", "tok"),
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), "tok")
    kept = tp.join(cov, ["doc_id", "pos"], "left_anti")
    rec = kept.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("kept_tok"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tok"))
                    ),
                    lambda s: s["tok"],
                ),
                " ",
            )
        ).alias("kept_md5"),
    )
    # per-rep result incl. empty-rebuild fallback
    rep_res = (
        toks.select(
            "doc_id", F.size("l").cast("bigint").alias("n_tok")
        )
        .join(rec, "doc_id", "left")
        .select(
            F.col("doc_id").alias("rep_id"),
            "n_tok",
            F.coalesce("kept_tok", F.lit(0))
            .cast("bigint")
            .alias("r_kept"),
            F.coalesce("kept_md5", F.md5(F.lit(""))).alias("r_md5"),
        )
    )
    # fan back out: the rep keeps its computed result; every other
    # copy keeps nothing (n_tok >= n) or everything (n_tok < n, no
    # windows — rebuild expression identical to the rep path)
    return (
        docs.join(
            reps.select("text", "rep_id"), "text"
        )
        .join(rep_res, "rep_id")
        .select(
            "doc_id",
            "n_tok",
            F.when(F.col("doc_id") == F.col("rep_id"), F.col("r_kept"))
            .when(F.col("n_tok") < n, F.col("n_tok"))
            .otherwise(F.lit(0).cast("bigint"))
            .alias("kept_tok"),
            F.when(F.col("doc_id") == F.col("rep_id"), F.col("r_md5"))
            .when(
                F.col("n_tok") < n,
                F.md5(F.array_join(F.split("text", " "), " ")),
            )
            .otherwise(F.md5(F.lit("")))
            .alias("kept_md5"),
        )
    )


# ---------------------------------------------------------------------------
# graph_adamic_adar — integer-exact link-prediction scores
# ---------------------------------------------------------------------------

_AA_TOPN = 20
# reciprocal-log weight in exact integers: ln(deg) quantized ONCE to
# micro-units, then w = 1e12 div ln_q ~ (1/ln deg) in micro-units —
# per-term truncation < 1e-6, summed exactly as BIGINTs.  A common
# neighbor always has degree >= 2 (it touches both endpoints), so
# ln_q >= ln(2)*1e6 and the division is never by zero; the deg >= 2
# filter makes that explicit on both engines.
_AA_SCALE = 1_000_000_000_000


def _aa_oracle() -> str:
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
    deg AS (SELECT node, COUNT(*) AS d FROM und GROUP BY 1),
    rw AS (
        SELECT node AS nbr,
               CAST({_AA_SCALE} //
                    CAST(ROUND(LN(CAST(d AS DOUBLE)) * 1e6) AS BIGINT)
                    AS BIGINT) AS w
        FROM deg WHERE d >= 2
    ),
    pairs AS (
        SELECT a.node AS user_a, b.node AS user_b,
               COUNT(*) AS common_cnt, SUM(rw.w) AS aa_micro
        FROM und a
        JOIN und b ON a.nbr = b.nbr AND a.node < b.node
        JOIN rw ON rw.nbr = a.nbr
        GROUP BY 1, 2
    )
    SELECT user_a, user_b,
           CAST(common_cnt AS BIGINT) AS common_cnt,
           CAST(aa_micro AS BIGINT) AS aa_micro,
           ROUND(CAST(aa_micro AS DOUBLE) / 1e6, 6) AS adamic_adar
    FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY aa_micro DESC,
                                     user_a, user_b) AS rk
        FROM pairs
    ) WHERE rk <= {_AA_TOPN}
    """


@query("graph_adamic_adar", oracle=_aa_oracle)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADAMIC-ADAR link prediction over the co-movement graph — the
    classic down-weighted-hub companion of `graph_common_neighbors`'
    Jaccard: AA(a,b) = sum over common neighbors w of 1/ln(deg(w)),
    so sharing a RARE partner counts more than sharing a hub.  Output:
    the top-20 unlinked-or-linked pairs by AA (integer-sum DESC, pair
    tie-break) with the common count and both scores' ingredients.

    Exactness: ln(deg) is quantized ONCE per node
    (CAST(ROUND(LN(d)*1e6) AS BIGINT) — the `text_zipf_fit` log-domain
    recipe), the reciprocal is one integer floor division (micro-unit
    1/ln), the per-pair score is an exact BIGINT SUM, and ranking is
    an integer ROW_NUMBER decision; the only float is the final /1e6
    display.  Built on the CAPPED co-movement edges
    (`mining.comovement_edges_capped`, `graph_clustering_coeff`'s
    graph — identical to the uncapped builder wherever no (day,
    eps-cell) exceeds 64 participants).

    Scale shape: one wedge join keyed on the shared neighbor.  Wedge
    fan-out is deg(w)^2 — on the UNcapped builder a 20x dense-clone
    probe filled the disk (the round-5 co-movement regime), which is
    exactly why this op takes the capped graph: the per-(day, cell)
    participant cap bounds degrees, hence wedges, by construction.
    Two hash aggs + a top-N window close it out."""
    from .mining import comovement_edges_capped

    e = comovement_edges_capped(spark, sf_dir)
    und = e.select(
        F.col("u").alias("node"), F.col("v").alias("nbr")
    ).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = und.groupBy("node").agg(F.count("*").alias("d"))
    rw = (
        deg.filter(F.col("d") >= 2)
        .withColumn(
            "lnq",
            F.expr("CAST(ROUND(LN(CAST(d AS DOUBLE)) * 1e6) AS BIGINT)"),
        )
        .select(
            F.col("node").alias("nbr"),
            F.expr(f"CAST({_AA_SCALE} div lnq AS BIGINT)").alias("w"),
        )
    )
    # Attach the per-common-neighbor weight to the LEFT incidence rows
    # BEFORE the wedge self-join (broadcast: rw is node-count-sized,
    # 1.5k rows at sf0.1), so the 21.6M-row wedge stream feeds the pair
    # aggregate directly instead of making a second sort-merge pass
    # against rw (plan: SortMergeJoin x2 -> x1; guide §3.1/§2.4).  The
    # wedge rows and their weights are identical — rw's d >= 2 filter
    # never drops a wedge (a wedge through w implies deg(w) >= 2).
    a = und.join(F.broadcast(rw), "nbr").select(
        F.col("node").alias("user_a"), "nbr", "w"
    )
    b = und.select(F.col("node").alias("user_b"), "nbr")
    # COST-BASED BROADCAST of the wedge build side (round 13, guide
    # §3.1): the incidence list is edge-count-sized (170k rows at
    # sf0.1, ~4 MB) while the wedge stream it produces is Σdeg² (21.6M
    # rows) — broadcasting kills the exchange+sort under the wedge
    # join, and the fan-out runs map-side straight into the partial
    # pair aggregate (measured 2.77 s → 2.02 s for the wedge+agg
    # stages).  Edges are materialized, so the count is a cheap job;
    # above the bound the join stays unhinted (sort-merge survives
    # where a forced broadcast would OOM).
    bcast_max = int(
        os.environ.get("SPARK_GRAFT_AA_BCAST_MAX_EDGES", "10000000")
    )
    hint = F.broadcast if e.count() <= bcast_max else (lambda df: df)
    pairs = (
        a.join(hint(b), "nbr")
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(
            F.count("*").cast("bigint").alias("common_cnt"),
            F.sum("w").cast("bigint").alias("aa_micro"),
        )
    )
    # top-N via orderBy+limit (TakeOrderedAndProject) instead of a
    # single-partition ROW_NUMBER window over the full pair table —
    # the total order (aa DESC, a, b) matches the oracle's ROW_NUMBER
    return (
        pairs.orderBy(
            F.col("aa_micro").desc(), "user_a", "user_b"
        )
        .limit(_AA_TOPN)
        .select(
            "user_a",
            "user_b",
            "common_cnt",
            "aa_micro",
            F.round(
                F.col("aa_micro").cast("double") / 1e6, 6
            ).alias("adamic_adar"),
        )
    )


# ---------------------------------------------------------------------------
# rel_attribution_touch — first/last-touch revenue attribution
# ---------------------------------------------------------------------------


@query(
    "rel_attribution_touch",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               event_type,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               CASE WHEN event_type IN ('view', 'click', 'signup')
                    THEN event_type END AS touch
        FROM events
    ),
    seq AS (
        SELECT user_id, event_type, cents,
               FIRST_VALUE(touch IGNORE NULLS) OVER w AS first_touch,
               LAST_VALUE(touch IGNORE NULLS) OVER w AS last_touch
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING)
    ),
    p AS (SELECT * FROM seq WHERE event_type = 'purchase'),
    modes AS (
        SELECT 'first' AS mode,
               COALESCE(first_touch, 'direct') AS channel,
               cents
        FROM p
        UNION ALL
        SELECT 'last', COALESCE(last_touch, 'direct'), cents FROM p
    )
    SELECT mode, channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           ROUND(CAST(SUM(cents) AS DOUBLE) / 100, 6) AS revenue
    FROM modes GROUP BY mode, channel
    """,
)
def rel_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST/LAST-TOUCH REVENUE ATTRIBUTION — the marketing-analytics
    composite every event warehouse runs: each purchase's value is
    credited to the user's FIRST preceding touch (view/click/signup)
    and, separately, to the LAST touch before the purchase;
    purchases with no prior touch credit 'direct'.  Output: one row
    per (mode, channel) with purchase count and attributed revenue.

    NOT a purchase x touches join: ONE window pass per user computes
    both ends — FIRST_VALUE(touch IGNORE NULLS) and
    LAST_VALUE(touch IGNORE NULLS) over ROWS UNBOUNDED PRECEDING TO
    1 PRECEDING (the strictly-before frame), totally ordered by
    (us, event_id) so ties break identically on both engines.  The
    as-of semantics of `rel_join_asof` expressed as a frame, linear
    in events.

    Exactness: revenue sums centi-quantized BIGINTs; the /100 is one
    final display; attribution decisions are string equality on the
    windowed values."""
    t = Tables(spark, sf_dir)
    ev = t.events.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        "event_type",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
        F.when(
            F.col("event_type").isin("view", "click", "signup"),
            F.col("event_type"),
        ).alias("touch"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    seq = ev.select(
        "user_id",
        "event_type",
        "cents",
        F.first("touch", ignorenulls=True).over(w).alias("first_touch"),
        F.last("touch", ignorenulls=True).over(w).alias("last_touch"),
    )
    p = seq.filter(F.col("event_type") == "purchase")
    modes = p.select(
        F.lit("first").alias("mode"),
        F.coalesce("first_touch", F.lit("direct")).alias("channel"),
        "cents",
    ).unionAll(
        p.select(
            F.lit("last").alias("mode"),
            F.coalesce("last_touch", F.lit("direct")).alias("channel"),
            "cents",
        )
    )
    return modes.groupBy("mode", "channel").agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        F.round(
            F.sum("cents").cast("double") / 100, 6
        ).alias("revenue"),
    )


# ---------------------------------------------------------------------------
# rel_did — difference-in-differences from exact integer moments
# ---------------------------------------------------------------------------

# the four cell means and the DiD estimate, one shared display
# projection over exact integer moments (s = Σcents, n = count per
# cell); /100 restores value units from centi
_DID_FINAL = """
    CAST(n_tp AS BIGINT) AS n_treat_pre,
    CAST(n_ta AS BIGINT) AS n_treat_post,
    CAST(n_cp AS BIGINT) AS n_ctrl_pre,
    CAST(n_ca AS BIGINT) AS n_ctrl_post,
    ROUND(CAST(s_tp AS DOUBLE) / n_tp / 100, 6) AS mean_treat_pre,
    ROUND(CAST(s_ta AS DOUBLE) / n_ta / 100, 6) AS mean_treat_post,
    ROUND(CAST(s_cp AS DOUBLE) / n_cp / 100, 6) AS mean_ctrl_pre,
    ROUND(CAST(s_ca AS DOUBLE) / n_ca / 100, 6) AS mean_ctrl_post,
    ROUND(((CAST(s_ta AS DOUBLE) / n_ta - CAST(s_tp AS DOUBLE) / n_tp)
           - (CAST(s_ca AS DOUBLE) / n_ca
              - CAST(s_cp AS DOUBLE) / n_cp)) / 100, 6) + 0.0 AS did
"""


@query(
    "rel_did",
    oracle=f"""
    WITH ev AS (
        SELECT user_id % 2 = 0 AS treat,
               CAST(FLOOR(epoch_us(CAST(ts AS TIMESTAMP)) / 86400e6)
                    AS BIGINT) AS dy,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    mid AS (
        SELECT CAST((MIN(dy) + MAX(dy)) // 2 AS BIGINT) AS mid FROM ev
    ),
    cells AS (
        SELECT
            SUM(CASE WHEN treat AND dy <= mid THEN 1 ELSE 0 END) AS n_tp,
            SUM(CASE WHEN treat AND dy <= mid THEN cents ELSE 0 END) AS s_tp,
            SUM(CASE WHEN treat AND dy > mid THEN 1 ELSE 0 END) AS n_ta,
            SUM(CASE WHEN treat AND dy > mid THEN cents ELSE 0 END) AS s_ta,
            SUM(CASE WHEN NOT treat AND dy <= mid THEN 1 ELSE 0 END) AS n_cp,
            SUM(CASE WHEN NOT treat AND dy <= mid THEN cents ELSE 0 END) AS s_cp,
            SUM(CASE WHEN NOT treat AND dy > mid THEN 1 ELSE 0 END) AS n_ca,
            SUM(CASE WHEN NOT treat AND dy > mid THEN cents ELSE 0 END) AS s_ca
        FROM ev, mid
        HAVING n_tp >= 1 AND n_ta >= 1 AND n_cp >= 1 AND n_ca >= 1
    )
    SELECT {_DID_FINAL} FROM cells
    """,
)
def rel_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES — the workhorse quasi-experimental
    estimator, closing the A/B screening family (Welch t,
    Mann-Whitney, KS, chi-squared, Benford, conformal, bootstrap):
    treatment = even user_id, control = odd (the deterministic
    hash-split stand-in for a rollout cohort), pre/post split at the
    corpus's integer midpoint day; DiD = (treat_post − treat_pre) −
    (ctrl_post − ctrl_pre) on mean event value.

    Exactness: ONE map-side-combinable conditional aggregation sums
    exact integer moments (n, Σcents per cell); the midpoint is an
    integer floor-div of integer day numbers; the HAVING gate (all 4
    cells non-empty) is integer, so the degenerate single-period
    corpus yields zero rows rather than a divide-by-zero; the 4 means
    and the DiD estimate are one shared display projection (+0.0 —
    DiD crosses zero).

    Scale shape: one scan, one 1-row aggregate joined with a 1-row
    midpoint — nothing shuffles more than 8 numbers."""
    t = Tables(spark, sf_dir)
    from .extras5 import _split_top_level

    ev = t.events.select(
        (F.col("user_id") % 2 == 0).alias("treat"),
        F.expr(
            "CAST(FLOOR(unix_micros(ts) / 86400e6) AS BIGINT)"
        ).alias("dy"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
    )
    mid = ev.agg(
        F.expr("CAST((MIN(dy) + MAX(dy)) div 2 AS BIGINT)").alias("mid")
    )
    cells = (
        ev.join(F.broadcast(mid))
        .agg(
            F.expr(
                "SUM(CASE WHEN treat AND dy <= mid THEN 1 ELSE 0 END)"
            ).alias("n_tp"),
            F.expr(
                "SUM(CASE WHEN treat AND dy <= mid THEN cents"
                " ELSE 0 END)"
            ).alias("s_tp"),
            F.expr(
                "SUM(CASE WHEN treat AND dy > mid THEN 1 ELSE 0 END)"
            ).alias("n_ta"),
            F.expr(
                "SUM(CASE WHEN treat AND dy > mid THEN cents"
                " ELSE 0 END)"
            ).alias("s_ta"),
            F.expr(
                "SUM(CASE WHEN NOT treat AND dy <= mid THEN 1"
                " ELSE 0 END)"
            ).alias("n_cp"),
            F.expr(
                "SUM(CASE WHEN NOT treat AND dy <= mid THEN cents"
                " ELSE 0 END)"
            ).alias("s_cp"),
            F.expr(
                "SUM(CASE WHEN NOT treat AND dy > mid THEN 1"
                " ELSE 0 END)"
            ).alias("n_ca"),
            F.expr(
                "SUM(CASE WHEN NOT treat AND dy > mid THEN cents"
                " ELSE 0 END)"
            ).alias("s_ca"),
        )
        .filter(
            "n_tp >= 1 AND n_ta >= 1 AND n_cp >= 1 AND n_ca >= 1"
        )
    )
    return cells.selectExpr(*_split_top_level(_DID_FINAL))
