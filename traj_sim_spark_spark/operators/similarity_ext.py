"""I (cont.): scalar-quantized ANN — the memory-reduction half of the
100 TB vector-search story.

IVF (``sim_knn_ivf_centroid`` / ``emb_layout_ivf``) prunes WHICH vectors
a query touches; scalar quantization shrinks WHAT each touched vector
costs: int8 codes are 8x smaller than float64 working sets, so the scan
side of ANN fits in memory at corpus sizes where floats spill. The
standard deployment (FAISS SQ8, Milvus, pgvector halfvec) is
quantized-prefilter -> exact-rerank; ``sim_knn_sq8`` is that pipeline
declaratively, with the quantizer trained in-plan (per-dimension
min/max) and every arithmetic step chosen to be bit-identical across
engines (floor(x + 0.5) instead of round — no half-even/half-up
divergence; integer distance sums — no float accumulation order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables

_SQ_CAND = 50  # quantized-prefilter shortlist size
_SQ_K = 10  # final exact top-k
_SQ_QUERY = 0  # query vector id


@query(
    "sim_knn_sq8",
    oracle=f"""
    WITH e AS (
        SELECT vec_id,
               CAST(unnest(embedding) AS DOUBLE) AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    stats AS (
        SELECT i, MIN(v) AS mn, MAX(v) AS mx FROM e GROUP BY i
    ),
    q AS (
        SELECT e.vec_id, e.i,
               CASE WHEN s.mx - s.mn = 0 THEN 0
                    ELSE CAST(FLOOR((e.v - s.mn) * 255.0
                                    / (s.mx - s.mn) + 0.5)
                              AS BIGINT) END AS code,
               e.v
        FROM e JOIN stats s USING (i)
    ),
    qq AS (SELECT i, code, v FROM q WHERE vec_id = {_SQ_QUERY}),
    qdist AS (
        SELECT q.vec_id,
               SUM((q.code - qq.code) * (q.code - qq.code)) AS d8,
               SUM((q.v - qq.v) * (q.v - qq.v)) AS d2
        FROM q JOIN qq USING (i)
        WHERE q.vec_id <> {_SQ_QUERY}
        GROUP BY q.vec_id
    ),
    cand AS (
        SELECT vec_id, d8, d2,
               ROW_NUMBER() OVER (ORDER BY d8, vec_id) AS rn
        FROM qdist
    )
    SELECT vec_id, CAST(d8 AS BIGINT) AS qdist,
           ROUND(SQRT(d2), 6) AS l2
    FROM cand WHERE rn <= {_SQ_CAND}
    ORDER BY l2, vec_id LIMIT {_SQ_K}
    """,
)
def sim_knn_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 ANN: train a per-dimension min/max scalar quantizer in-plan,
    shortlist the top-50 neighbors of vector 0 by INT8-code distance
    (exact integer arithmetic — order-independent), then re-rank the
    shortlist by exact float L2 and keep the top-10.

    The quantizer 'training' is a 64-row aggregate assembled into two
    broadcast arrays; encoding is ``zip_with`` JVM-side — the corpus is
    never exploded. The int code distance folds with
    ``aggregate(zip_with(...))`` into a long. floor(x + 0.5) quantizes
    identically in every engine (ROUND would hit half-even vs half-up);
    ties in both top-k stages break on vec_id. At 100 TB the code table
    is the 8x-smaller scan replica of the embedding column — the
    quantized prefilter touches only it, and the exact rerank fetches
    `candidates` full vectors, not the corpus."""
    t = Tables(spark, sf_dir)
    emb = t.embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    stats = (
        emb.select(F.posexplode("v").alias("i", "x"))
        .groupBy("i")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("i", "mn", "mx"))
            ).alias("s")
        )
        .select(
            F.transform("s", lambda r: r["mn"]).alias("mn"),
            F.transform("s", lambda r: (r["mx"] - r["mn"])).alias("rng"),
        )
    )
    coded = (
        emb.join(F.broadcast(stats))
        .select(
            "vec_id",
            "v",
            F.zip_with(
                F.zip_with(
                    "v", "mn", lambda x, m: x - m
                ),
                "rng",
                lambda d, r: F.when(r == 0.0, F.lit(0).cast("long")).otherwise(
                    F.floor(d * 255.0 / r + 0.5)
                ),
            ).alias("code"),
        )
    )
    q = coded.filter(F.col("vec_id") == _SQ_QUERY).select(
        F.col("v").alias("qv"), F.col("code").alias("qcode")
    )
    int_d = F.aggregate(
        F.zip_with("code", "qcode", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    exact_d = F.sqrt(
        F.aggregate(
            F.zip_with("v", "qv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cand = (
        coded.filter(F.col("vec_id") != _SQ_QUERY)
        .join(F.broadcast(q))
        .select("vec_id", int_d.alias("qdist"), exact_d.alias("l2"))
        .orderBy("qdist", "vec_id")
        .limit(_SQ_CAND)
    )
    return (
        cand.select("vec_id", "qdist", F.round("l2", 6).alias("l2"))
        .orderBy("l2", "vec_id")
        .limit(_SQ_K)
    )


def _recall_oracle() -> str:
    # invoked lazily by registry.load_all() AFTER every module is loaded,
    # so importing similarity here does not register its keys mid-window
    from ..registry import ORACLES
    from . import similarity  # noqa: F401

    exact = ORACLES["sim_knn"]
    ann = ORACLES["sim_knn_ivf_centroid"]
    return f"""
    SELECT COUNT(e.vec_id) AS n_exact,
           (SELECT COUNT(*) FROM ({ann}) x) AS n_ann,
           CAST(COUNT(a.vec_id) AS BIGINT) AS n_hit,
           ROUND(COUNT(a.vec_id) / CAST(COUNT(e.vec_id) AS DOUBLE), 6)
               AS recall
    FROM ({exact}) e LEFT JOIN ({ann}) a ON e.vec_id = a.vec_id
    """


@query("sim_ann_recall", oracle=_recall_oracle)
def sim_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality evaluation as a first-class query: recall@10 of the
    IVF-centroid path (``sim_knn_ivf_centroid``, nprobe=2) against the
    exact scan (``sim_knn``) for the query vector — the measurement a
    vector-search deployment runs before trusting an approximate index,
    here composed from the SAME registered builders it evaluates (and
    the oracle from their oracle SQL), so the evaluated plans are the
    shipped plans, not copies.

    One left join of two 10-row results; the entire cost is the two
    underlying kNN queries. Output: exact count, ANN count, overlap,
    recall."""
    from ..registry import QUERIES

    exact = QUERIES["sim_knn"](spark, sf_dir).select("vec_id")
    ann = QUERIES["sim_knn_ivf_centroid"](spark, sf_dir).select(
        F.col("vec_id").alias("a_vec_id")
    )
    joined = exact.join(
        F.broadcast(ann), exact.vec_id == ann.a_vec_id, "left"
    )
    return joined.agg(
        F.count("vec_id").alias("n_exact"),
        F.lit(10).cast("long").alias("n_ann"),
        F.count("a_vec_id").alias("n_hit"),
        F.round(
            F.count("a_vec_id") / F.count("vec_id").cast("double"), 6
        ).alias("recall"),
    )


_PQ_M = 8  # subspaces (64 dims -> 8 x 8)
_PQ_SUB = 8  # dims per subspace
_PQ_K = 16  # centroids per subspace codebook
_PQ_ITERS = 2
_PQ_TOPK = 10


def _pq_subvectors(emb: DataFrame) -> DataFrame:
    """(vec_id, m, sub) — each vector split into _PQ_M contiguous
    subvectors, JVM-side (slice, no explode of scalars)."""
    subs = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice("v", m * _PQ_SUB + 1, _PQ_SUB).alias("sub"),
            )
            for m in range(_PQ_M)
        ]
    )
    return emb.select(
        "vec_id", F.explode(subs).alias("s")
    ).select("vec_id", F.col("s.m").alias("m"), F.col("s.sub").alias("sub"))


def _pq_float_oracle() -> str:
    from .extras5 import _pqx_oracle

    return _pqx_oracle(display="float")


@query("sim_knn_pq", oracle=_pq_float_oracle)
def sim_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: 64-d vectors split into 8 subspaces of
    8 dims; per subspace a 16-centroid codebook (2 Lloyd iterations,
    deterministic init = the 16 lowest vec_ids' subvectors); every
    vector encoded as 8 one-byte codes (64 bytes -> 8 bytes, the 64x
    compression PQ exists for); the query answered by ASYMMETRIC
    DISTANCE COMPUTATION — one 128-row (m, code) -> d2 lookup table
    from the query's subvectors, each corpus vector scored as the SUM
    of 8 table lookups, top-10 by (adc_d2, vec_id).

    PROMOTED TO FULL (round 8): the codebook now trains by the
    integer-exact Lloyd of `sim_knn_pq_exact` (micro-quantized
    coordinates, integer argmin with code-id tie-break, shifted
    integer means) — the float variant's argmin was order-dependent
    across engines, which is a DETERMINISM bug at 1000 executors too,
    not just an oracle gap: a re-run could flip codebooks.  Ranking is
    by the exact integer ADC sum; only the DISPLAY converts back to
    embedding units (sum/1e12, rounded).  Quantization at 1e-6 on
    coordinates |x|<=0.53 moves distances ~1e-6 relative — the top-10
    set is unchanged vs the float pipeline on the fixtures (NumPy twin
    in tests/test_analytics.py re-derives it independently).

    The scale economics: the codebook train + encode is an offline
    write-path job (like `emb_layout_ivf`'s layout); the query path
    touches only the 8-byte codes and a broadcast 128-row table — no
    float vector is read at query time. All joins are broadcasts
    (codebooks, tables); per-iteration assignment reuses the k-means
    min_by pattern."""
    from .extras5 import sim_knn_pq_exact

    adc = sim_knn_pq_exact(spark, sf_dir)
    return adc.select(
        "vec_id",
        F.round(F.col("adc_d2").cast("double") / 1e12, 6).alias(
            "adc_d2"
        ),
    )


_IVFPQ_NPROBE = 2


def _ivfpqx_oracle() -> str:
    """Unrolled integer IVF+PQ oracle: coarse shifted-mean centroids
    -> integer argmin cell assignment -> residual subvectors -> the
    `_pqx_oracle` Lloyd rounds replayed over residuals -> per-probed-
    cell ADC tables.  Everything after the one ROUND(x*1e6)
    quantization is BIGINT arithmetic, so the whole FAISS-IVFPQ shape
    hash-matches across engines."""
    from .extras5 import _KMX_C as c

    sub, k, iters = _PQ_SUB, _PQ_K, _PQ_ITERS
    ctes = [
        f"""
    ev AS MATERIALIZED (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) - 1 AS d,
               CAST(ROUND(UNNEST(embedding) * 1e6) AS BIGINT) AS q
        FROM embeddings
    ),
    cc AS MATERIALIZED (
        SELECT label AS clabel, d,
               CAST((SUM(q) + COUNT(*) * {c}) // COUNT(*) AS BIGINT)
                   - {c} AS cq
        FROM ev GROUP BY 1, 2
    ),
    cd AS MATERIALIZED (
        SELECT ev.vec_id, c.clabel,
               SUM((ev.q - c.cq) * (ev.q - c.cq)) AS cd2
        FROM ev JOIN cc c ON c.d = ev.d
        GROUP BY 1, 2
    ),
    ca AS (
        SELECT vec_id, clabel FROM (
            SELECT vec_id, clabel,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY cd2, clabel) AS rk
            FROM cd
        ) WHERE rk = 1
    ),
    rv AS MATERIALIZED (
        SELECT ev.vec_id, ev.d // {sub} AS m, ev.d % {sub} AS i,
               ev.q - c.cq AS q
        FROM ev
        JOIN ca a ON a.vec_id = ev.vec_id
        JOIN cc c ON c.clabel = a.clabel AND c.d = ev.d
    ),
    c0 AS (
        SELECT m, CAST(vec_id AS INTEGER) AS cid, i, q AS cq
        FROM rv WHERE vec_id < {k}
    )"""
    ]
    for r in range(1, iters + 1):
        ctes.append(f"""
    d{r} AS (
        SELECT rv.vec_id, rv.m, c.cid,
               SUM((rv.q - c.cq) * (rv.q - c.cq)) AS d2
        FROM rv JOIN c{r - 1} c ON c.m = rv.m AND c.i = rv.i
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
        SELECT a.m, a.cid, rv.i,
               CAST((SUM(rv.q) + COUNT(*) * {c}) // COUNT(*)
                    AS BIGINT) - {c} AS cq
        FROM a{r} a
        JOIN rv ON rv.vec_id = a.vec_id AND rv.m = a.m
        GROUP BY 1, 2, 3
    ),
    c{r} AS (
        SELECT p.m, p.cid, p.i, COALESCE(x.cq, p.cq) AS cq
        FROM c{r - 1} p LEFT JOIN mn{r} x
          ON x.m = p.m AND x.cid = p.cid AND x.i = p.i
    )""")
    ctes.append(f"""
    df AS (
        SELECT rv.vec_id, rv.m, c.cid,
               SUM((rv.q - c.cq) * (rv.q - c.cq)) AS d2
        FROM rv JOIN c{iters} c ON c.m = rv.m AND c.i = rv.i
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
    probe AS (
        SELECT clabel FROM (
            SELECT clabel,
                   ROW_NUMBER() OVER (ORDER BY cd2, clabel) AS rk
            FROM cd WHERE vec_id = 0
        ) WHERE rk <= {_IVFPQ_NPROBE}
    ),
    qr AS (
        SELECT p.clabel, ev.d // {sub} AS m, ev.d % {sub} AS i,
               ev.q - c.cq AS q
        FROM probe p
        CROSS JOIN ev
        JOIN cc c ON c.clabel = p.clabel AND c.d = ev.d
        WHERE ev.vec_id = 0
    ),
    qtab AS (
        SELECT r.clabel, c.m, c.cid,
               SUM((r.q - c.cq) * (r.q - c.cq)) AS qd2
        FROM qr r JOIN c{iters} c ON c.m = r.m AND c.i = r.i
        GROUP BY 1, 2, 3
    )""")
    return (
        "WITH " + ",".join(ctes)
        + f"""
    SELECT cs.vec_id,
           ROUND(CAST(SUM(q.qd2) AS DOUBLE) / 1e12, 6) AS adc_d2
    FROM codes cs
    JOIN ca a ON a.vec_id = cs.vec_id
    JOIN qtab q ON q.clabel = a.clabel
               AND q.m = cs.m AND q.cid = cs.cid
    WHERE cs.vec_id <> 0
    GROUP BY cs.vec_id
    ORDER BY SUM(q.qd2), cs.vec_id LIMIT {_PQ_TOPK}
    """
    )


@query("sim_knn_ivfpq", oracle=_ivfpqx_oracle)
def sim_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ composed — the production ANN index (FAISS IVFPQ shape):
    the coarse quantizer prunes WHICH cells a query reads (a 10-row
    per-label codebook, nprobe=2) and product quantization shrinks
    WHAT each read vector costs (8-byte codes), with PQ trained on
    RESIDUALS (v - coarse centroid) — the textbook refinement:
    residuals are centered near zero, so one shared subspace codebook
    covers every cell.

    PROMOTED TO FULL (round 8): the whole pipeline is integer-exact —
    coordinates quantize ONCE to micro-unit BIGINTs, coarse centroids
    are shifted integer means (floor((Σq + n·C)/n) − C), assignments
    are integer argmins with id tie-breaks, PQ trains by the shared
    `pqx_lloyd` integer Lloyd on residuals, and ranking is by the
    exact integer ADC sum (only the display converts back to
    embedding units).  The entire train+encode+probe+ADC replays as
    one unrolled DuckDB statement and hash-matches.

    Train/encode is the WRITE-PATH job the IVF layout docs promise:
    coarse codebook, assignments+residuals, PQ codebook and codes
    persist under a fixture-fingerprinted staging dir; the query path
    only READS them (BIGINTs round-trip Parquet bit-exactly).  At
    query time: one 10-row coarse probe, one broadcast 2·128-row ADC
    table, and a scan of the probed cells' 8-byte codes — no float
    vector is touched."""
    import os

    from pyspark.sql import Window as W

    from ..sources.readers import (
        layout_current,
        staging_dir,
        stamp_layout,
    )
    from .extras5 import _KMX_C as C, pqx_lloyd, pqx_scored

    t = Tables(spark, sf_dir)
    ev = t.embeddings.select(
        "vec_id",
        "label",
        F.expr(
            "transform(embedding, x -> CAST(ROUND(x * 1e6) AS BIGINT))"
        ).alias("q"),
    )
    cd2 = F.aggregate(
        F.zip_with("q", "cqv", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    root = os.path.join(staging_dir(sf_dir, "ivfpq_q"), "artifacts")
    if not layout_current(root, sf_dir, table="embeddings"):
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        # coarse codebook: per-label shifted integer means
        coarse = (
            ev.select("label", F.posexplode("q").alias("d", "x"))
            .groupBy("label", "d")
            .agg(
                (
                    F.expr(f"(sum(x) + count(*) * {C}) div count(*)")
                    - F.lit(C)
                ).alias("cq")
            )
            .groupBy("label")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("d", "cq"))
                ).alias("p")
            )
            .select(
                F.col("label").alias("clabel"),
                F.expr("transform(p, s -> s.cq)").alias("cqv"),
            )
        )
        adist = ev.join(F.broadcast(coarse)).withColumn("cd2", cd2)
        rk = F.row_number().over(
            W.partitionBy("vec_id").orderBy("cd2", "clabel")
        )
        # assignment + integer residual in one pass
        assign_b = (
            adist.withColumn("rk", rk)
            .filter(F.col("rk") == 1)
            .select(
                "vec_id",
                "clabel",
                F.zip_with("q", "cqv", lambda a, b: a - b).alias("v"),
            )
        )
        subv = _pq_subvectors(assign_b.select("vec_id", "v"))
        cent_b = pqx_lloyd(subv)
        codes_b = (
            pqx_scored(subv, cent_b)
            .groupBy("vec_id", "m")
            .agg(F.min_by("cid", F.struct("d2", "cid")).alias("cid"))
        )
        coarse.write.mode("overwrite").parquet(
            os.path.join(root, "coarse")
        )
        assign_b.select("vec_id", "clabel").write.mode(
            "overwrite"
        ).parquet(os.path.join(root, "assign"))
        cent_b.write.mode("overwrite").parquet(
            os.path.join(root, "cent")
        )
        codes_b.write.mode("overwrite").parquet(
            os.path.join(root, "codes")
        )
        open(os.path.join(root, "_SUCCESS"), "w").close()
        stamp_layout(root, sf_dir, table="embeddings")
    coarse = spark.read.parquet(os.path.join(root, "coarse"))
    assign = spark.read.parquet(os.path.join(root, "assign"))
    cent = spark.read.parquet(os.path.join(root, "cent"))
    codes = spark.read.parquet(os.path.join(root, "codes"))
    # query probe: nprobe nearest cells by integer coarse distance,
    # each with the query's residual against THAT cell's centroid
    probe = (
        ev.filter(F.col("vec_id") == 0)
        .join(F.broadcast(coarse))
        .withColumn("cd2", cd2)
        .withColumn(
            "prk", F.row_number().over(W.orderBy("cd2", "clabel"))
        )
        .filter(F.col("prk") <= _IVFPQ_NPROBE)
        .select(
            "clabel",
            F.zip_with("q", "cqv", lambda a, b: a - b).alias("v"),
        )
    )
    qsubs = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice("v", m * _PQ_SUB + 1, _PQ_SUB).alias("sub"),
            )
            for m in range(_PQ_M)
        ]
    )
    qd2 = F.aggregate(
        F.zip_with("sub", "c", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    qtab = (
        probe.select("clabel", F.explode(qsubs).alias("s"))
        .select(
            "clabel",
            F.col("s.m").alias("m"),
            F.col("s.sub").alias("sub"),
        )
        .join(F.broadcast(cent), "m")
        .select("clabel", "m", "cid", qd2.alias("qd2"))
    )
    return (
        codes.join(assign, "vec_id")
        .filter(F.col("vec_id") != 0)
        .join(F.broadcast(qtab), ["clabel", "m", "cid"])
        .groupBy("vec_id")
        .agg(F.sum("qd2").alias("adc"))
        .orderBy("adc", "vec_id")
        .limit(_PQ_TOPK)
        .select(
            "vec_id",
            F.round(F.col("adc").cast("double") / 1e12, 6).alias(
                "adc_d2"
            ),
        )
    )


_MIPS_K = 10
_MIPS_QUERY = 0


@query(
    "sim_mips",
    oracle=f"""
    WITH ev AS (
        SELECT vec_id, label,
               generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    q AS (SELECT i, v FROM ev WHERE vec_id = {_MIPS_QUERY}),
    dots AS (
        SELECT ev.vec_id, SUM(ev.v * q.v) AS dp
        FROM ev JOIN q USING (i)
        WHERE ev.vec_id <> {_MIPS_QUERY}
        GROUP BY ev.vec_id
    )
    SELECT vec_id, ROUND(dp, 6) + 0.0 AS inner_product
    FROM dots ORDER BY dp DESC, vec_id LIMIT {_MIPS_K}
    """,
)
def sim_mips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search (MIPS): top-10 vectors by raw dot
    product with the query — the recommender-scoring retrieval mode
    (user·item affinity), where cosine's norm division is WRONG because
    item popularity lives in the norm.

    Exact path: one broadcast of the 1-row query, one codegen'd
    ``zip_with``+fold per vector, TakeOrderedAndProject — linear scan,
    no driver collect. The scale path is the standard norm-augmentation
    reduction (Shrivastava & Li's asymmetric LSH): append
    sqrt(M² − |v|²) to every corpus vector (M = max norm) and 0 to the
    query, and MIPS order becomes cosine order — after which ALL of the
    engine's cosine-bucketed infrastructure (`sim_knn_ivf*`,
    `emb_layout_ivf` partition pruning) applies unchanged; the
    augmentation is one ``concat(emb, array(sqrt(...)))`` column."""
    from ..functions.vector import dot, to_double

    t = Tables(spark, sf_dir)
    emb = t.embeddings.select(
        "vec_id", to_double("embedding").alias("emb")
    )
    q = emb.filter(F.col("vec_id") == _MIPS_QUERY).select(
        F.col("emb").alias("q_emb")
    )
    return (
        emb.filter(F.col("vec_id") != _MIPS_QUERY)
        .join(F.broadcast(q))
        .withColumn("dp", dot(F.col("emb"), F.col("q_emb")))
        .orderBy(F.col("dp").desc(), "vec_id")
        .limit(_MIPS_K)
        .select("vec_id", (F.round("dp", 6) + 0.0).alias("inner_product"))
    )


@query(
    "emb_drift",
    oracle="""
    WITH e AS (
        SELECT label, vec_id % 2 AS half,
               unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    m AS (
        SELECT label, half, i, AVG(CAST(v AS DOUBLE)) AS mv,
               COUNT(*) AS n
        FROM e GROUP BY 1, 2, 3
    ),
    paired AS (
        SELECT a.label, a.i, a.mv AS ma, b.mv AS mb,
               a.n AS na, b.n AS nb
        FROM m a JOIN m b
          ON a.label = b.label AND a.i = b.i
         AND a.half = 0 AND b.half = 1
    )
    SELECT label,
           CAST(MAX(na) AS BIGINT) AS n_a,
           CAST(MAX(nb) AS BIGINT) AS n_b,
           ROUND(SUM(ma * mb)
                 / (SQRT(SUM(ma * ma)) * SQRT(SUM(mb * mb))), 6) + 0.0
               AS centroid_cos
    FROM paired GROUP BY label
    """,
)
def emb_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift monitor: per label, the cosine between the
    centroid of one half of the corpus (even vec_ids — "yesterday's
    batch") and the other half (odd — "today's") — the model/data drift
    check an embedding pipeline runs before trusting ANN indexes and
    semantic-dedup thresholds trained on earlier data (a centroid
    swinging away from 1.0 means re-train the quantizer).

    Same shape as ``sim_centroid``: posexplode to (label, half, dim),
    one hash aggregate, then a per-label fold of two 64-dim mean
    vectors — linear, fully JVM-side, and the halves are keyed by a
    DETERMINISTIC id parity (in production: the partition date), not a
    sample."""
    t = Tables(spark, sf_dir)
    e = t.embeddings.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("i", "v"),
    )
    m = e.groupBy("label", "half", "i").agg(
        F.avg("v").alias("mv"), F.count("*").alias("n")
    )
    a = m.filter(F.col("half") == 0).select(
        "label", "i",
        F.col("mv").alias("ma"), F.col("n").alias("na"),
    )
    b = m.filter(F.col("half") == 1).select(
        "label", "i",
        F.col("mv").alias("mb"), F.col("n").alias("nb"),
    )
    return (
        a.join(b, ["label", "i"])
        .groupBy("label")
        .agg(
            F.max("na").alias("n_a"),
            F.max("nb").alias("n_b"),
            (
                F.round(
                    F.sum(F.col("ma") * F.col("mb"))
                    / (
                        F.sqrt(F.sum(F.col("ma") * F.col("ma")))
                        * F.sqrt(F.sum(F.col("mb") * F.col("mb")))
                    ),
                    6,
                )
                + 0.0
            ).alias("centroid_cos"),
        )
    )


_FILT_NPROBE = 4  # widened probe: the filter halves every cell's yield
_FILT_K = 10


@query(
    "sim_knn_filtered",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label,
               CAST(unnest(embedding) AS DOUBLE) AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ),
    cent AS (
        SELECT label AS clabel, i,
               CAST((SUM(CAST(ROUND(v * 1e6) AS BIGINT))
                     + COUNT(*) * 100000000) // COUNT(*)
                    AS BIGINT) - 100000000 AS mq
        FROM e GROUP BY label, i
    ),
    adist AS (
        SELECT e.vec_id, c.clabel,
               SUM((CAST(ROUND(e.v * 1e6) AS BIGINT) - c.mq)
                   * (CAST(ROUND(e.v * 1e6) AS BIGINT) - c.mq)) AS d2
        FROM e JOIN cent c ON e.i = c.i
        GROUP BY e.vec_id, c.clabel
    ),
    assign AS (
        SELECT vec_id, clabel FROM (
            SELECT vec_id, clabel,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                                      ORDER BY d2, clabel) AS rk
            FROM adist
        ) WHERE rk = 1
    ),
    probe AS (
        SELECT clabel FROM (
            SELECT clabel,
                   ROW_NUMBER() OVER (ORDER BY d2, clabel) AS rk
            FROM adist WHERE vec_id = 0
        ) WHERE rk <= {_FILT_NPROBE}
    ),
    cand AS (
        SELECT a.vec_id
        FROM assign a
        JOIN probe p USING (clabel)
        JOIN embeddings m ON m.vec_id = a.vec_id
        WHERE a.vec_id <> 0 AND m.label % 2 = 1
    ),
    q AS (SELECT i, v FROM e WHERE vec_id = 0),
    scored AS (
        SELECT e.vec_id,
               SUM(e.v * q.v)
               / (SQRT(SUM(e.v * e.v)) * SQRT(SUM(q.v * q.v))) AS cs
        FROM e JOIN q ON e.i = q.i
        WHERE e.vec_id IN (SELECT vec_id FROM cand)
        GROUP BY e.vec_id
    )
    SELECT vec_id, ROUND(cs, 6) + 0.0 AS cos_sim
    FROM scored
    ORDER BY cs DESC, vec_id
    LIMIT {_FILT_K}
    """,
)
def sim_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED ANN — metadata-predicated vector search (the "WHERE
    clause on your vector index" every production system needs: search
    only in-tenant / in-language / in-date-range vectors). Composes the
    IVF path with a label predicate (here ``label % 2 = 1``): probe
    cells from the query as usual, intersect the cell candidates with
    the FILTER before any exact distance work, rerank exact cosine.

    The classic filtered-ANN failure is recall collapse: a selective
    filter empties the nearest cells, so a fixed nprobe returns fewer
    than k survivors. The standard mitigation — widen the probe in
    proportion to the filter's selectivity — is applied here (nprobe
    {_FILT_NPROBE} vs the unfiltered row's 2 for a ~1/2-selective
    filter). At 100 TB the filter composes with layout twice: the IVF
    cell is a partition directory AND the metadata predicate prunes
    row groups inside it (both visible to Catalyst, neither touching
    Python).

    Deterministic end-to-end, with the candidate-set boundary decided
    in INTEGERS (house membership discipline): vector elements are
    micro-quantized FIRST and the centroid is an exact integer mean of
    those bigints (shifted floor division — no float AVG anywhere in
    the membership path), so neither summation order nor a .5-micro
    AVG boundary can flip an assignment (the unfiltered IVF rows accept
    the float boundary and document it; this row upgrades it)."""
    from pyspark.sql import Window as W

    from .similarity import _emb, _query_vec, cosine

    t = Tables(spark, sf_dir)
    emb = _emb(t)
    # quantized twin of similarity._ivf_adist: micro-unit integer
    # centroids and vectors -> integer d2, broadcast codebook join
    # Per-element micro-quantize FIRST, then an exact integer mean:
    # SUM of ROUND(v*1e6) bigints is order-independent (no float AVG in
    # the membership path), and the mean is floor((sq + n*C)/n) - C with
    # C = 1e8 micro-units — the +C shift keeps both operands positive so
    # Spark's truncating `div` and DuckDB's `//` agree (they differ on
    # negatives).  C bounds |v| <= 100; fixture embeddings are unit-ish.
    cent = (
        emb.select("label", F.posexplode("emb").alias("i", "v"))
        .groupBy("label", "i")
        .agg(
            F.expr(
                "(sum(cast(round(v * 1e6) as bigint))"
                " + count(*) * 100000000L) div count(*)"
                " - 100000000L"
            ).alias("mq")
        )
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("i", "mq"))).alias("cvec")
        )
        .select(
            F.col("label").alias("clabel"), F.col("cvec.mq").alias("cemb")
        )
    )
    vq = F.transform(
        F.col("emb"), lambda x: F.round(x * 1e6).cast("bigint")
    )
    d2 = F.aggregate(
        F.zip_with(vq, F.col("cemb"), lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    adist = emb.join(F.broadcast(cent)).withColumn("d2", d2)
    rk = F.row_number().over(W.partitionBy("vec_id").orderBy("d2", "clabel"))
    assign = (
        adist.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select("vec_id", "clabel")
    )
    probe = (
        adist.filter(F.col("vec_id") == 0)
        .withColumn("rk", F.row_number().over(W.orderBy("d2", "clabel")))
        .filter(F.col("rk") <= _FILT_NPROBE)
        .select("clabel")
    )
    allowed = t.embeddings.filter(F.col("label") % 2 == 1).select("vec_id")
    cand = (
        assign.join(F.broadcast(probe), "clabel")
        .join(allowed, "vec_id", "left_semi")
        .filter(F.col("vec_id") != 0)
    )
    q = _query_vec(emb, 0)
    return (
        emb.join(F.broadcast(cand.select("vec_id")), "vec_id", "left_semi")
        .join(F.broadcast(q))
        .withColumn("cos_raw", cosine(F.col("emb"), F.col("q_emb")))
        .orderBy(F.col("cos_raw").desc(), "vec_id")
        .limit(_FILT_K)
        .select("vec_id", (F.round("cos_raw", 6) + 0.0).alias("cos_sim"))
    )


_MRL_PREFIX = 16  # truncated head dimensions for the cheap pass
_MRL_CAND = 50  # shortlist size
_MRL_K = 10


@query(
    "sim_knn_mrl",
    oracle=f"""
    WITH e AS (
        SELECT vec_id,
               generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    q16 AS (
        SELECT i, CAST(ROUND(v * 1e6) AS BIGINT) AS vq
        FROM e WHERE vec_id = 0 AND i <= {_MRL_PREFIX}
    ),
    pre AS (
        SELECT e.vec_id,
               SUM((CAST(ROUND(e.v * 1e6) AS BIGINT) - q16.vq)
                   * (CAST(ROUND(e.v * 1e6) AS BIGINT) - q16.vq)) AS d2
        FROM e JOIN q16 USING (i)
        WHERE e.vec_id <> 0 AND e.i <= {_MRL_PREFIX}
        GROUP BY e.vec_id
    ),
    short AS (
        SELECT vec_id FROM (
            SELECT vec_id,
                   ROW_NUMBER() OVER (ORDER BY d2, vec_id) AS rk
            FROM pre
        ) WHERE rk <= {_MRL_CAND}
    ),
    q AS (SELECT i, v FROM e WHERE vec_id = 0),
    scored AS (
        SELECT e.vec_id,
               SUM(e.v * q.v)
               / (SQRT(SUM(e.v * e.v)) * SQRT(SUM(q.v * q.v))) AS cs
        FROM e JOIN q USING (i)
        WHERE e.vec_id IN (SELECT vec_id FROM short)
        GROUP BY e.vec_id
    )
    SELECT vec_id, ROUND(cs, 6) + 0.0 AS cos_sim
    FROM scored
    ORDER BY cs DESC, vec_id
    LIMIT {_MRL_K}
    """,
)
def sim_knn_mrl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka (MRL) prefix-truncated ANN — the dimension-truncation
    member of the approximate-search family (SQ8/PQ shrink PRECISION;
    MRL-style retrieval shrinks DIMENSIONALITY): rank everything by
    squared-L2 over only the first 16 of 64 dimensions, shortlist 50,
    then exact full-dimension cosine reranks the shortlist to top-10.
    With Matryoshka-trained embeddings the head dims carry most of the
    signal, so the cheap pass touches 4x less data per vector — and at
    100 TB the head prefix is a SEPARATE narrow column (or leading
    Parquet field) so the first pass scans a quarter of the bytes.

    Determinism discipline (same as ``sim_knn_sq8``): the shortlist —
    the only approximation boundary — is decided by INTEGER arithmetic
    (micro-unit quantized components, exact integer squared-L2, ties by
    vec_id), so the candidate set is bit-identical on every engine;
    floats appear only in the final rerank expression."""
    from .similarity import _emb, _query_vec, cosine

    from pyspark.sql import Window as W

    t = Tables(spark, sf_dir)
    emb = _emb(t)
    vq = F.transform(
        F.slice("emb", 1, _MRL_PREFIX),
        lambda x: F.round(x * 1e6).cast("bigint"),
    )
    base = emb.withColumn("vq", vq)
    qrow = base.filter(F.col("vec_id") == 0).select(
        F.col("vq").alias("qvq")
    )
    d2 = F.aggregate(
        F.zip_with("vq", "qvq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    pre = (
        base.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qrow))
        .select("vec_id", d2.alias("d2"))
    )
    # top-candidates via orderBy+limit (TakeOrderedAndProject —
    # distributed partial sort) instead of a single-partition global
    # ROW_NUMBER window over the corpus; (d2, vec_id) is a total order
    short = (
        pre.orderBy("d2", "vec_id")
        .limit(_MRL_CAND)
        .select("vec_id")
    )
    q = _query_vec(emb, 0)
    return (
        emb.join(F.broadcast(short), "vec_id", "left_semi")
        .join(F.broadcast(q))
        .withColumn("cos_raw", cosine(F.col("emb"), F.col("q_emb")))
        .orderBy(F.col("cos_raw").desc(), "vec_id")
        .limit(_MRL_K)
        .select("vec_id", (F.round("cos_raw", 6) + 0.0).alias("cos_sim"))
    )
