"""Coverage extras: remaining north-star dedup family + reshaping ops.

- SimHash document signatures (bit-identical across engines via md5-hex
  -> int conversion, so the sketch itself is oracle-checked)
- character-3-gram Jaccard near-dup (the n-gram variant of the token-set
  Jaccard in operators/text.py)
- embedding-cosine near-dup behind a hyperplane-LSH block (the dedup
  framing of the similarity threshold join — the shape that scales)
- pivot / unpivot / GROUPING SETS relational reshaping
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vector import dot, norm2, to_double
from ..registry import query
from ..tables import Tables

_SIMHASH_BITS = 32


@query(
    "text_simhash",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    th AS (
        SELECT doc_id,
               CAST(CAST(CONCAT('0x', substr(md5(token), 1, 8)) AS UBIGINT)
                    AS BIGINT) AS h
        FROM tok
    ),
    bits AS (
        SELECT doc_id, j.j AS j,
               SUM(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS bal
        FROM th CROSS JOIN (
            SELECT unnest(generate_series(0, {_SIMHASH_BITS - 1})) AS j) j
        GROUP BY doc_id, j.j
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN bal > 0 THEN (CAST(1 AS BIGINT) << j)
                         ELSE 0 END) AS BIGINT) AS simhash
    FROM bits
    GROUP BY doc_id
    """,
)
def text_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document.

    Per distinct token: a 32-bit hash (first 8 md5 hex chars); each bit
    votes +1/-1; signature bit j is 1 when the balance is positive.
    Near-dup docs differ in few bits, so candidate pairs at scale come
    from an equi-join on signature prefixes (same pattern as
    text_minhash_neardup's bands). The signature computation is two hash
    aggregates over an exploded (token x bit) table — linear, shuffled on
    doc_id."""
    t = Tables(spark, sf_dir)
    tok = t.doc_tokens().distinct()
    th = tok.select(
        "doc_id",
        F.conv(F.substring(F.md5("token"), 1, 8), 16, 10)
        .cast("long")
        .alias("h"),
    )
    # bit j of h == (h div 2^j) % 2, with 2^j precomputed per exploded row
    # (shiftleft/shiftright need literal bit counts, so arithmetic it is)
    pow2 = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    F.lit(1 << j).cast("long").alias("p"),
                )
                for j in range(_SIMHASH_BITS)
            ]
        )
    )
    bits = (
        th.select("doc_id", "h", pow2.alias("jp"))
        .select(
            "doc_id",
            F.col("jp.j").alias("j"),
            F.col("jp.p").alias("p"),
            F.when(((F.col("h") / F.col("jp.p")).cast("long") % 2) == 1, 1)
            .otherwise(-1)
            .alias("vote"),
        )
        .groupBy("doc_id", "j", "p")
        .agg(F.sum("vote").alias("bal"))
    )
    return bits.groupBy("doc_id").agg(
        F.sum(F.when(F.col("bal") > 0, F.col("p")).otherwise(0)).alias(
            "simhash"
        )
    )


_SIMHASH_SIG_CTE = f"""
    tok AS (
        SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    th AS (
        SELECT doc_id,
               CAST(CAST(CONCAT('0x', substr(md5(token), 1, 8)) AS UBIGINT)
                    AS BIGINT) AS h
        FROM tok
    ),
    bits AS (
        SELECT doc_id, j.j AS j,
               SUM(CASE WHEN (h >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS bal
        FROM th CROSS JOIN (
            SELECT unnest(generate_series(0, {_SIMHASH_BITS - 1})) AS j) j
        GROUP BY doc_id, j.j
    ),
    sig AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN bal > 0 THEN (CAST(1 AS BIGINT) << j)
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM bits
        GROUP BY doc_id
    )
"""


@query(
    "text_simhash_neardup",
    oracle=f"""
    WITH {_SIMHASH_SIG_CTE.strip()},
    bands AS (
        SELECT doc_id, simhash, j.j AS band,
               (simhash >> (8 * j.j)) & 255 AS bucket
        FROM sig CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) j
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
)
def text_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup PAIRS — the use-side of ``text_simhash``'s
    signatures: all doc pairs within Hamming distance 3, found by banded
    blocking. The 32-bit signature splits into 4 bands of 8 bits; by
    pigeonhole, Hamming <= 3 over 4 bands forces AT LEAST ONE identical
    band, so an equi-join on (band, bucket) is a LOSSLESS candidate
    generator and the exact Hamming filter (bit_count of xor, JVM
    codegen) keeps true qualifiers. Same first-colliding-band
    emission as ``text_minhash_neardup`` (earlier bands must differ), so
    the union is duplicate-free with no distinct shuffle. At 100 TB:
    widen the signature to 64 bits and the bands to 16 bits — the shape
    is unchanged, buckets stay selective.

    md5-derived signatures are bit-identical cross-engine -> FULL
    oracle."""
    t = Tables(spark, sf_dir)
    sig = text_simhash(spark, sf_dir).localCheckpoint()
    n_bands = 4

    def bucket(j: int) -> F.Column:
        return F.shiftright("simhash", 8 * j).bitwiseAND(F.lit(255))

    hamming = F.expr("bit_count(sa ^ sb)")
    parts = []
    for j in range(n_bands):
        a = sig.select(
            F.col("doc_id").alias("id_a"),
            F.col("simhash").alias("sa"),
            *[bucket(i).alias(f"ba{i}") for i in range(j + 1)],
        )
        b = sig.select(
            F.col("doc_id").alias("id_b"),
            F.col("simhash").alias("sb"),
            *[bucket(i).alias(f"bb{i}") for i in range(j + 1)],
        )
        pairs = a.join(
            F.broadcast(b), F.col(f"ba{j}") == F.col(f"bb{j}")
        ).filter(F.col("id_a") < F.col("id_b"))
        for i in range(j):
            pairs = pairs.filter(F.col(f"ba{i}") != F.col(f"bb{i}"))
        parts.append(
            pairs.filter(hamming <= 3).select(
                "id_a", "id_b", hamming.cast("int").alias("hamming")
            )
        )
    out = parts[0]
    for pt in parts[1:]:
        out = out.unionByName(pt)
    return out


_GRAM_DF_CAP = 200


@query(
    "text_ngram_jaccard",
    oracle="""
    WITH grams0 AS (
        SELECT DISTINCT d.doc_id, d.lang,
               substr(d.text, i.i, 3) AS g
        FROM documents d
        CROSS JOIN (SELECT unnest(generate_series(
                        1, (SELECT MAX(LEN(text)) FROM documents))) AS i) i
        WHERE i.i <= LEN(d.text) - 2
    ),
    grams AS (
        SELECT * FROM grams0
        WHERE (g, lang) NOT IN (
            SELECT (g, lang) FROM grams0
            GROUP BY g, lang HAVING COUNT(*) > 200
        )
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS both_n
        FROM grams a JOIN grams b
          ON a.g = b.g AND a.lang = b.lang AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(both_n * 1.0 / (sa.n + sb.n - both_n), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE both_n * 1.0 / (sa.n + sb.n - both_n) >= 0.75
    """,
)
def text_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-3-gram Jaccard near-dup (>= 0.75), lang-blocked — the
    n-gram complement of the token-set variant; robust to token
    reordering, which is exactly what word-soup near-dups look like."""
    t = Tables(spark, sf_dir)
    grams = (
        t.documents.select(
            "doc_id",
            "lang",
            F.explode(
                F.expr("sequence(1, greatest(length(text) - 2, 0))")
            ).alias("i"),
            "text",
        )
        .select(
            "doc_id", "lang", F.expr("substring(text, i, 3)").alias("g")
        )
        .distinct()
    )
    # hot-gram guard (same discipline as text_jaccard_neardup's token
    # cap): the 3-gram key space is tiny (~36^3), so corpus-frequent
    # grams are GUARANTEED at scale and would each explode into a
    # quadratic pair key. Grams above the per-lang document-frequency
    # cap are dropped via broadcast anti-join (the hot list is tiny by
    # construction); mirrored in the oracle, so capped-gram Jaccard is
    # the defined semantics at every scale.
    hot = (
        grams.groupBy("g", "lang")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > _GRAM_DF_CAP)
        .select("g", "lang")
    )
    grams = grams.join(F.broadcast(hot), ["g", "lang"], "left_anti")
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = grams.select(F.col("doc_id").alias("id_a"), "lang", "g")
    b = grams.select(F.col("doc_id").alias("id_b"), "lang", "g")
    inter = (
        a.join(b, ["g", "lang"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("both_n"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("both_n") / (F.col("na") + F.col("nb") - F.col("both_n"))
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .filter(jac >= 0.75)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


@query(
    "emb_neardup_lsh",
    oracle="""
    WITH ev AS (
        SELECT vec_id, generate_subscripts(embedding, 1) AS i,
               CAST(unnest(embedding) AS DOUBLE) AS v
        FROM embeddings
    ),
    sig AS (
        SELECT vec_id,
               STRING_AGG(CASE WHEN v >= 0 THEN '1' ELSE '0' END, ''
                          ORDER BY i) AS bucket
        FROM ev WHERE i <= 4
        GROUP BY vec_id
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               SUM(ea.v * eb.v)
               / (SQRT(SUM(ea.v * ea.v)) * SQRT(SUM(eb.v * eb.v))) AS cs
        FROM sig a
        JOIN sig b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        JOIN ev ea ON ea.vec_id = a.vec_id
        JOIN ev eb ON eb.vec_id = b.vec_id AND eb.i = ea.i
        GROUP BY a.vec_id, b.vec_id
    )
    SELECT id_a, id_b, ROUND(cs, 6) + 0.0 AS cos_sim
    FROM pairs WHERE cs >= 0.4
    """,
)
def emb_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cos >= 0.4) with hyperplane-LSH
    blocking: candidates share a 4-bit sign bucket, so pair generation is
    an equi-join on the bucket key — near-dup dedup that stays sub-
    quadratic at corpus scale (high-cosine pairs land in the same bucket
    with high probability; recall/bits traded like any LSH)."""
    t = Tables(spark, sf_dir)
    return _emb_lsh_pairs(t.embeddings.select("vec_id", "embedding"))


def _emb_lsh_pairs(embd: DataFrame) -> DataFrame:
    """The sign-bucket LSH + cosine-verify pair body of
    ``emb_neardup_lsh`` over an arbitrary (vec_id, embedding) set —
    shared with the rep-collapsed semantic dedup pipeline
    (``text_ext.pipe_dedup_semantic``)."""
    # per-vector L2 norm computed ONCE before the pair join (guide
    # §4.1: higher-order array folds are not codegen'd, so the three
    # folds per pair — dot + both norms — were 2/3 redundant; the
    # per-row norm2 is the identical expression on the identical
    # input, hence the same IEEE double and the same cosine)
    emb = (
        embd.select("vec_id", to_double("embedding").alias("emb"))
        .withColumn(
            "bucket",
            F.concat_ws(
                "",
                F.transform(
                    F.slice("emb", 1, 4),
                    lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
                ),
            ),
        )
        .withColumn("nrm", norm2("emb"))
    )
    a = emb.select(
        "bucket",
        F.col("vec_id").alias("id_a"),
        F.col("emb").alias("ea"),
        F.col("nrm").alias("nrm_a"),
    )
    b = emb.select(
        "bucket",
        F.col("vec_id").alias("id_b"),
        F.col("emb").alias("eb"),
        F.col("nrm").alias("nrm_b"),
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cs",
            dot(F.col("ea"), F.col("eb"))
            / (F.col("nrm_a") * F.col("nrm_b")),
        )
        .filter(F.col("cs") >= 0.4)
        .select("id_a", "id_b", (F.round("cs", 6) + 0.0).alias("cos_sim"))
    )


@query(
    "rel_pivot",
    oracle="""
    SELECT user_id,
           ROUND(COALESCE(SUM(CASE WHEN event_type = 'click' THEN value END), 0), 6) AS click,
           ROUND(COALESCE(SUM(CASE WHEN event_type = 'view' THEN value END), 0), 6) AS view,
           ROUND(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN value END), 0), 6) AS purchase,
           ROUND(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN value END), 0), 6) AS signup,
           ROUND(COALESCE(SUM(CASE WHEN event_type = 'error' THEN value END), 0), 6) AS error
    FROM events
    GROUP BY user_id
    """,
)
def rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user value sums spread across event_type columns (the
    explicit value list keeps the plan single-pass, no distinct-scan)."""
    t = Tables(spark, sf_dir)
    types = ["click", "view", "purchase", "signup", "error"]
    piv = (
        t.events.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 6))
    )
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in types],
    )


@query(
    "rel_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, k.kind AS kind,
           CASE k.kind WHEN 'price' THEN l_extendedprice
                       WHEN 'discount' THEN l_discount
                       WHEN 'tax' THEN l_tax END AS amount
    FROM lineitem
    CROSS JOIN (SELECT unnest(['price', 'discount', 'tax']) AS kind) k
    """,
)
def rel_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide price columns to (kind, amount) rows."""
    t = Tables(spark, sf_dir)
    return t.lineitem.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_extendedprice", "l_discount", "l_tax"],
        "kind",
        "amount",
    ).withColumn(
        "kind",
        F.when(F.col("kind") == "l_extendedprice", "price")
        .when(F.col("kind") == "l_discount", "discount")
        .otherwise("tax"),
    )


@query(
    "rel_agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 6) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def rel_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither rollup nor cube): per-flag,
    per-status, and grand total in one pass."""
    t = Tables(spark, sf_dir)
    t.lineitem.createOrReplaceTempView("__li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 6) AS sum_qty,
               COUNT(*) AS n_rows
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "rel_subquery_scalar",
    oracle="""
    SELECT p_partkey, p_brand, ROUND(p_retailprice, 6) AS price
    FROM part
    WHERE p_retailprice > 1.05 * (
        SELECT AVG(p2.p_retailprice) FROM part p2
        WHERE p2.p_brand = part.p_brand
    )
    """,
)
def rel_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: parts priced >5% above their brand's
    average. Catalyst decorrelates this into an aggregate + join — the
    rewrite class the reference has no analog for (SURVEY.md §4,
    'subquery decorrelation'); one table scan feeds both sides."""
    t = Tables(spark, sf_dir)
    t.part.createOrReplaceTempView("__part_sq")
    return spark.sql(
        """
        SELECT p_partkey, p_brand, ROUND(p_retailprice, 6) AS price
        FROM __part_sq part
        WHERE p_retailprice > 1.05 * (
            SELECT AVG(p2.p_retailprice) FROM __part_sq p2
            WHERE p2.p_brand = part.p_brand
        )
        """
    )


_BLOOM_BITS = 4096
_BLOOM_K = 3


def _bloom_pos(j, key):
    """Hash-j Bloom bit position of a key: first 16 bits of
    md5('<j>:<key>'), mod the filter width — bit-identical in any
    engine with md5 (the ``_cms_bucket`` idiom)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", j, key)), 1, 4), 16, 10
        ).cast("int")
        % _BLOOM_BITS
    )


@query(
    "rel_bloom_prefilter",
    oracle=f"""
    WITH ks AS (SELECT UNNEST(generate_series(0, {_BLOOM_K - 1})) AS j),
    bits AS (
        SELECT DISTINCT
               CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' ||
                                        CAST(o_custkey AS VARCHAR)), 1, 4))
                    AS INTEGER) % {_BLOOM_BITS} AS pos
        FROM orders CROSS JOIN ks
    ),
    probe AS (
        SELECT c.c_custkey, k.j,
               CAST(('0x' || substr(md5(CAST(k.j AS VARCHAR) || ':' ||
                                        CAST(c.c_custkey AS VARCHAR)), 1, 4))
                    AS INTEGER) % {_BLOOM_BITS} AS pos
        FROM customer c CROSS JOIN ks k
    ),
    maybe AS (
        SELECT p.c_custkey,
               CASE WHEN COUNT(bits.pos) = {_BLOOM_K} THEN 1 ELSE 0 END
                 AS bloom_maybe
        FROM probe p LEFT JOIN bits ON p.pos = bits.pos
        GROUP BY p.c_custkey
    )
    SELECT m.c_custkey, m.bloom_maybe,
           CASE WHEN EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = m.c_custkey)
                THEN 1 ELSE 0 END AS actually_has
    FROM maybe m
    """,
)
def rel_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10 made literal: a DETERMINISTIC Bloom filter (4096 bits, k=3
    md5 hashes) built from the orders build side, probed by every
    customer — the reference's compressed-bitmap candidate set
    [P §4.2], and the manual twin of Spark's own runtime Bloom join
    pruning (session flag `spark.sql.optimizer.runtime.bloomFilter`).

    The filter is an aggregate (DISTINCT bit positions — ≤4096 rows no
    matter the build-side size, map-side combinable) broadcast to the
    probe; each probe key checks its k positions with one small
    equi-join + count. Output carries the exact semi-join verdict next
    to the Bloom verdict, so the driver hash also PINS the filter's
    false-positive set — deterministic md5 means both engines build
    bit-identical filters. Every customer appears exactly once."""
    t = Tables(spark, sf_dir)
    js = F.array(*[F.lit(j) for j in range(_BLOOM_K)])
    bits = (
        t.orders.select(F.explode(js).alias("j"), "o_custkey")
        .select(_bloom_pos(F.col("j"), F.col("o_custkey")).alias("pos"))
        .distinct()
        .withColumn("present", F.lit(1))
    )
    probe = t.customer.select(
        "c_custkey", F.explode(js).alias("j")
    ).select(
        "c_custkey", _bloom_pos(F.col("j"), F.col("c_custkey")).alias("pos")
    )
    maybe = (
        probe.join(F.broadcast(bits), "pos", "left")
        .groupBy("c_custkey")
        .agg(
            F.when(F.count("present") == _BLOOM_K, 1)
            .otherwise(0)
            .alias("bloom_maybe")
        )
    )
    actual = (
        t.orders.select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("has", F.lit(1))
    )
    return maybe.join(actual, "c_custkey", "left").select(
        "c_custkey",
        "bloom_maybe",
        F.coalesce("has", F.lit(0)).alias("actually_has"),
    )
