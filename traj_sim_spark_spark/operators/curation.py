"""Training-data curation composites: sequence packing, token-budget
sampling, character-entropy quality gating, Pareto skylines, and
link-prediction similarity over the co-movement graph.

These extend the LLM-pipeline family (text.py / pipelines.py) with the
remaining shapes a pretraining data loader needs:

- ``pipe_pack_chunks``   — concat-and-chunk sequence packing: documents
  are concatenated per (source, shard) in doc_id order and split into
  fixed 256-token blocks — the standard GPT-style packing step, as a
  window cumsum (no state machine, no driver loop);
- ``pipe_token_budget``  — fill a fixed per-language token budget in
  content-hash order (deterministic "take until full" mixing — the
  per-domain token-quota step of a data-mix recipe);
- ``text_entropy``       — character-level Shannon entropy + distinct
  char count per document (the cheap garbage/binary detector used as a
  Gopher-style quality gate);
- ``rel_skyline``        — Pareto-optimal rows of ``part`` (min price,
  max size) via the sorted running-max formulation — O(n log n), not
  the naive O(n^2) dominance anti-join;
- ``graph_common_neighbors`` — common-neighbor Jaccard between users of
  the co-movement graph (the link-prediction / node-similarity kernel),
  composed from the SAME registered ``traj_comovement`` edge builder as
  ``graph_triangles``.

Scale notes (100 TB):
- packing/budget are window cumsums whose partition keys ((source,
  shard) / lang) bound the sort width; shard count scales parallelism
  at constant semantics — a real pipeline packs per input shard, which
  is exactly this shape;
- entropy is explode + two hash aggregates, linear, with a pre-explode
  repartition so one fat input split cannot serialize the char scan;
- the skyline window runs over DISTINCT price groups (already reduced
  by a hash aggregate), never over base rows; at extreme cardinality
  the same plan nests once more (range-partition local skylines, then
  skyline-of-skylines — noted, not needed at fixture scale);
- the wedge join in common-neighbors fans out per shared neighbor, so
  per-key cost is degree^2 of that node — bounded here because the
  co-movement edge builder is eps-banded per (day, value-cell); a
  social-network hub graph would add a degree cap before the wedge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables

_PACK_BUDGET = 256  # tokens per packed block
_PACK_SHARDS = 4  # parallel packing shards per source
_LANG_BUDGET = 2000  # token quota per language
_SKY_PRICE = "p_retailprice"


@query(
    "pipe_pack_chunks",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source,
               CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               doc_id % {_PACK_SHARDS} AS shard
        FROM documents
    ),
    c AS (
        SELECT *,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY source, shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS st
        FROM d
    )
    SELECT source, CAST(shard AS BIGINT) AS shard, doc_id, n_tokens,
           CAST(FLOOR(st / {_PACK_BUDGET}) AS BIGINT) AS first_chunk,
           CAST(FLOOR((st + n_tokens - 1) / {_PACK_BUDGET}) AS BIGINT)
               AS last_chunk,
           CAST(FLOOR((st + n_tokens - 1) / {_PACK_BUDGET})
                - FLOOR(st / {_PACK_BUDGET}) + 1 AS BIGINT) AS n_chunks
    FROM c
    """,
)
def pipe_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: per (source, shard) the
    documents are concatenated in doc_id order and the token stream is
    cut into fixed 256-token blocks; each document reports the block
    range it lands in (a doc crossing a boundary spans several — the
    standard pretraining packing, where examples are chunked, not
    padded).

    Pure window arithmetic: one cumsum per (source, shard) gives every
    document its start offset; block ids are integer division. No
    sequential state machine — which is why real pipelines use
    concat-and-chunk rather than bin packing at scale. Shards make the
    per-partition sort width (source)/(shards) without changing any
    block assignment."""
    t = Tables(spark, sf_dir)
    d = t.documents.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.pmod("doc_id", F.lit(_PACK_SHARDS)).alias("shard"),
    )
    w = (
        W.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    c = d.withColumn("st", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    first = F.floor(F.col("st") / _PACK_BUDGET)
    last = F.floor((F.col("st") + F.col("n_tokens") - 1) / _PACK_BUDGET)
    return c.select(
        "source",
        F.col("shard").cast("long").alias("shard"),
        "doc_id",
        "n_tokens",
        first.alias("first_chunk"),
        last.alias("last_chunk"),
        (last - first + 1).alias("n_chunks"),
    )


@query(
    "pipe_token_budget",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang,
               CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, n_tokens,
               COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS cum_before
        FROM d
    )
    SELECT lang, doc_id, n_tokens,
           CAST(cum_before + n_tokens AS BIGINT) AS cum_tokens
    FROM c WHERE cum_before < {_LANG_BUDGET}
    """,
)
def pipe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-quota sampling: take documents per language, in md5(doc_id)
    hash order, until each language's 2000-token budget is filled (the
    document that crosses the boundary is kept — "take until full").

    The hash order is the deterministic stand-in for a shuffled corpus:
    reproducible across engines and reruns, no RNG state. One window
    cumsum per language, then a filter — at 100 TB the cumsum partitions
    by (lang, hash-prefix) exactly like the packing shards if a single
    language outgrows one partition's sort."""
    t = Tables(spark, sf_dir)
    d = t.documents.select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    w = (
        W.partitionBy("lang")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    c = d.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    return c.filter(F.col("cum_before") < _LANG_BUDGET).select(
        "lang",
        "doc_id",
        "n_tokens",
        (F.col("cum_before") + F.col("n_tokens")).alias("cum_tokens"),
    )


@query(
    "text_entropy",
    oracle="""
    WITH ch AS (
        SELECT doc_id, substr(text, CAST(i AS INTEGER), 1) AS c
        FROM (SELECT doc_id, text,
                     unnest(generate_series(1, LEN(text))) AS i
              FROM documents WHERE LEN(text) > 0)
    ),
    cnt AS (SELECT doc_id, c, COUNT(*) AS n FROM ch GROUP BY 1, 2),
    tot AS (SELECT doc_id, SUM(n) AS tot FROM cnt GROUP BY 1)
    SELECT cnt.doc_id,
           CAST(COUNT(*) AS BIGINT) AS distinct_chars,
           ROUND(-SUM((cnt.n / tot.tot) * LN(cnt.n / tot.tot)), 6)
               AS entropy
    FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
    GROUP BY cnt.doc_id
    """,
)
def text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Shannon entropy (nats) + distinct-char count per
    document — the cheap garbage detector: binary blobs and mojibake
    score high, single-char spam scores near zero; both tails are what
    a Gopher-style quality gate drops before expensive dedup.

    Explode each document into characters (pre-repartitioned so a fat
    input split cannot serialize the scan — same trick as the tf-idf
    tokenizer), then two hash aggregates: char frequencies per doc,
    entropy per doc. Linear, JVM-side, no UDF."""
    t = Tables(spark, sf_dir)
    ch = (
        t.documents.filter(F.length("text") > 0)
        .select("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
        )
        .select("doc_id", F.expr("substring(text, i, 1)").alias("c"))
    )
    cnt = ch.groupBy("doc_id", "c").agg(F.count("*").alias("n"))
    tot = cnt.groupBy("doc_id").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    return (
        cnt.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("distinct_chars"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
        )
    )


@query(
    "rel_skyline",
    oracle=f"""
    WITH g AS (
        SELECT {_SKY_PRICE} AS price, MAX(p_size) AS gmax
        FROM part GROUP BY 1
    ),
    r AS (
        SELECT price, gmax,
               MAX(gmax) OVER (ORDER BY price
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS run_strict
        FROM g
    )
    SELECT p.p_partkey, ROUND(p.{_SKY_PRICE}, 6) AS price,
           p.p_size AS size
    FROM part p JOIN r ON p.{_SKY_PRICE} = r.price
    WHERE (r.run_strict IS NULL OR r.run_strict < p.p_size)
      AND p.p_size = r.gmax
    """,
)
def rel_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline of ``part``: rows not dominated on (price down,
    size up) — a part is dropped iff some part is strictly cheaper with
    at-least-equal size, or equally priced with strictly larger size.

    NOT the naive O(n^2) dominance anti-join: group to one row per
    DISTINCT price (hash aggregate), take the running max of size over
    strictly-cheaper prices (one window over the reduced table), join
    back. O(n log g) where g = distinct prices; the base table is never
    globally sorted. At a cardinality where even g is too wide, the
    identical plan nests: range-partition by price, local skyline per
    range, skyline of the per-range survivors."""
    t = Tables(spark, sf_dir)
    part = t.part.select("p_partkey", _SKY_PRICE, "p_size")
    g = part.groupBy(F.col(_SKY_PRICE).alias("price")).agg(
        F.max("p_size").alias("gmax")
    )
    w = W.orderBy("price").rowsBetween(W.unboundedPreceding, -1)
    r = g.withColumn("run_strict", F.max("gmax").over(w))
    return (
        part.join(r, part[_SKY_PRICE] == r["price"])
        .filter(
            (F.col("run_strict").isNull()
             | (F.col("run_strict") < F.col("p_size")))
            & (F.col("p_size") == F.col("gmax"))
        )
        .select(
            "p_partkey",
            F.round(_SKY_PRICE, 6).alias("price"),
            F.col("p_size").alias("size"),
        )
    )


@query(
    "graph_common_neighbors",
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
    und AS (
        SELECT u AS node, v AS nbr FROM e
        UNION ALL SELECT v, u FROM e
    ),
    deg AS (SELECT node, COUNT(*) AS d FROM und GROUP BY 1),
    inter AS (
        SELECT a.node AS user_a, b.node AS user_b,
               COUNT(*) AS common_cnt
        FROM und a JOIN und b ON a.nbr = b.nbr AND a.node < b.node
        GROUP BY 1, 2
    )
    SELECT i.user_a, i.user_b,
           CAST(i.common_cnt AS BIGINT) AS common_cnt,
           ROUND(i.common_cnt / (da.d + db.d - i.common_cnt), 6)
               AS jaccard
    FROM inter i
    JOIN deg da ON da.node = i.user_a
    JOIN deg db ON db.node = i.user_b
    """,
)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor Jaccard between user pairs of the co-movement
    graph (link prediction: pairs that share many co-movement partners
    without necessarily co-moving themselves are flock candidates) —
    composed from the SAME registered ``traj_comovement`` edge builder
    as ``graph_triangles``.

    The wedge join keys on the shared NEIGHBOR, so fan-out per key is
    that node's degree, never all-pairs; degrees are bounded because
    the edge builder is eps-banded per (day, value-cell). Degrees are
    a hash aggregate; Jaccard is |N(a) n N(b)| / (d_a + d_b - |int|)
    from the inclusion-exclusion identity — no union materialized."""
    from .mining import comovement_edges

    e = comovement_edges(spark, sf_dir)
    und = e.select(F.col("u").alias("node"), F.col("v").alias("nbr")).unionAll(
        e.select(F.col("v").alias("node"), F.col("u").alias("nbr"))
    )
    deg = und.groupBy("node").agg(F.count("*").alias("d"))
    a = und.select(F.col("node").alias("user_a"), "nbr")
    b = und.select(F.col("node").alias("user_b"), "nbr")
    inter = (
        a.join(b, "nbr")
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(F.count("*").alias("common_cnt"))
    )
    da = deg.select(F.col("node").alias("user_a"), F.col("d").alias("da"))
    db = deg.select(F.col("node").alias("user_b"), F.col("d").alias("db"))
    return (
        inter.join(da, "user_a")
        .join(db, "user_b")
        .select(
            "user_a",
            "user_b",
            "common_cnt",
            F.round(
                F.col("common_cnt")
                / (F.col("da") + F.col("db") - F.col("common_cnt")),
                6,
            ).alias("jaccard"),
        )
    )


_KANON = 5  # minimum group size for release


@query(
    "rel_kanonymity",
    oracle=f"""
    WITH g AS (
        SELECT event_type,
               CAST(FLOOR(value / 50.0) AS BIGINT) AS value_cell,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events,
               ROUND(SUM(CAST(value AS DECIMAL(18, 2))), 6) AS sum_value
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, value_cell,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(sum_value AS DOUBLE) AS sum_value
    FROM g WHERE n_users >= {_KANON}
    UNION ALL
    SELECT 'SUPPRESSED' AS event_type,
           CAST(-1 AS BIGINT) AS value_cell,
           CAST(SUM(n_users) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           CAST(ROUND(SUM(sum_value), 6) AS DOUBLE) AS sum_value
    FROM g WHERE n_users < {_KANON}
    HAVING COUNT(*) > 0
    """,
)
def rel_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release gate (k=5): per-(event_type, value-cell)
    statistics published ONLY where at least k distinct users
    contribute; all sub-threshold cells collapse into one SUPPRESSED
    rollup row so totals still reconcile — the minimum-cell-size rule
    every data-release/aggregation API enforces before analytics leave
    the trust boundary.

    One hash aggregate + a threshold split; the suppressed remainder is
    a second tiny aggregate over the already-reduced cell table, not
    the raw scan. Sums quantize to DECIMAL per row (order-independent
    across partitionings — the release must not depend on cluster
    width). The gate composes in front of ANY registered aggregate at
    100 TB unchanged."""
    t = Tables(spark, sf_dir)
    g = t.events.groupBy(
        "event_type",
        F.floor(F.col("value") / 50.0).alias("value_cell"),
    ).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 6
        ).alias("sum_value"),
    )
    ok = g.filter(F.col("n_users") >= _KANON)
    sup = (
        g.filter(F.col("n_users") < _KANON)
        .agg(
            F.sum("n_users").alias("n_users"),
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 6).alias("sum_value"),
        )
        .filter(F.col("n_events").isNotNull())
        .select(
            F.lit("SUPPRESSED").alias("event_type"),
            F.lit(-1).cast("long").alias("value_cell"),
            "n_users",
            "n_events",
            "sum_value",
        )
    )
    return ok.unionByName(sup)


@query(
    "pipe_train_split",
    oracle="""
    WITH b AS (
        SELECT doc_id, source,
               CAST(LEN(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                    AS INTEGER) % 100 AS bucket
        FROM documents
    ),
    s AS (
        SELECT CASE WHEN bucket < 90 THEN 'train'
                    WHEN bucket < 95 THEN 'val'
                    ELSE 'test' END AS split,
               source, n_tokens
        FROM b
    )
    SELECT split, source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM s GROUP BY split, source
    """,
)
def pipe_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (90/5/5) by content-hash
    bucket — the op every training pipeline runs LAST, and the one that
    must be reproducible above all others: the same document lands in
    the same split on any engine, any cluster size, any rerun, because
    the split key is md5(doc_id) % 100, not RNG state or row order
    (the ``pipe_mix_sources`` idiom). Emits per-(split, source) doc and
    token budgets — the numbers a training run is configured from.

    One scan + one hash aggregate; the split predicate pushes into the
    scan as an ordinary deterministic expression, so downstream
    per-split readers (`WHERE split = 'train'`) prune at the source."""
    t = Tables(spark, sf_dir)
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % 100
    )
    split = (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        t.documents.select(
            split.alias("split"),
            "source",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
        .groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
