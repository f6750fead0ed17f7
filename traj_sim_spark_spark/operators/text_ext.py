"""K (cont.): training-data curation ops beyond dedup — the checks a
100 TB pretraining pipeline runs between ingest and tokenization.

- ``text_contamination`` — benchmark-contamination audit: fraction of
  each held-out doc's distinct word 5-grams that appear anywhere in the
  training split (the standard n-gram-overlap decontamination check).
- ``text_repetition``   — intra-document repetition: duplicate 3-gram
  mass per doc (the "repetitive text" quality gate).
- ``pipe_mix_sources``  — balanced source mixture via deterministic
  content-hash sampling (downsample every source to the smallest
  source's rate) — reproducible across engines/reruns, no RNG state.
- ``text_pii_scrub``    — redaction accounting: digit-run hits in the
  raw event payloads, per event type (the PII-scrub bookkeeping pass;
  the fixtures carry no real PII, the shape is number-shaped tokens in
  a JSON payload column).

All four are linear scans + hash aggregates / bucketed joins; the only
join (contamination) keys on the shingle string itself — fan-out per
key is its document frequency in the train split, the same
hot-key-bounded shape as ``text_jaccard_neardup``'s capped variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables

_NGRAM = 5  # contamination shingle width (words)
_REP_N = 3  # repetition shingle width


def _word_shingles(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, lang, source, shingle) — one row per word n-gram
    position; JVM-side (sequence + transform + array_join), no UDF."""
    toks = F.split("text", " ")
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.array_join(F.slice(toks, i, n), " "),
                )
            ).alias("shingle"),
        )
    )


@query(
    "text_contamination",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, source,
               array_to_string(list_slice(toks, i, i + {_NGRAM - 1}), ' ')
                   AS shingle
        FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
              FROM documents) d,
             LATERAL (SELECT UNNEST(generate_series(
                          1, LEN(toks) - {_NGRAM - 1})) AS i) g
    ),
    train AS (SELECT DISTINCT shingle FROM sh WHERE source <> 'src0'),
    test AS (SELECT DISTINCT doc_id, shingle FROM sh
             WHERE source = 'src0')
    SELECT test.doc_id,
           COUNT(*) AS n_shingles,
           CAST(SUM(CASE WHEN train.shingle IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           ROUND(SUM(CASE WHEN train.shingle IS NOT NULL
                          THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS contamination
    FROM test LEFT JOIN train USING (shingle)
    GROUP BY test.doc_id
    """,
)
def text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit: treating source 'src0' as the
    held-out set, the fraction of each held-out doc's DISTINCT word
    5-grams that occur anywhere in the training split (all other
    sources) — the decontamination check every LLM corpus runs before
    training.

    Shape: shingles are generated JVM-side, both splits reduce to
    distinct-shingle sets, and the overlap is ONE equi-join on the
    shingle string followed by a per-doc aggregate. The train side
    carries no doc payload (just the distinct shingle), so the join's
    build side is the corpus vocabulary, not the corpus. At 100 TB the
    held-out side is tiny (benchmarks), making this a broadcast of the
    TEST set against a streamed train scan."""
    t = Tables(spark, sf_dir)
    sh = _word_shingles(t.documents, _NGRAM)
    train = (
        sh.filter(F.col("source") != "src0").select("shingle").distinct()
        .withColumn("hit", F.lit(1))
    )
    test = (
        sh.filter(F.col("source") == "src0")
        .select("doc_id", "shingle")
        .distinct()
    )
    return (
        test.join(train, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_hit"),
            F.round(
                F.coalesce(F.sum("hit"), F.lit(0))
                / F.count("*").cast("double"),
                6,
            ).alias("contamination"),
        )
    )


@query(
    "text_repetition",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id,
               array_to_string(list_slice(toks, i, i + {_REP_N - 1}), ' ')
                   AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS toks
              FROM documents) d,
             LATERAL (SELECT UNNEST(generate_series(
                          1, LEN(toks) - {_REP_N - 1})) AS i) g
    )
    SELECT doc_id,
           COUNT(*) AS n_grams,
           COUNT(DISTINCT shingle) AS n_distinct,
           ROUND(1.0 - COUNT(DISTINCT shingle)
                       / CAST(COUNT(*) AS DOUBLE), 6) AS rep_ratio,
           CAST(MAX(cnt) AS BIGINT) AS max_gram_count
    FROM (SELECT doc_id, shingle,
                 COUNT(*) OVER (PARTITION BY doc_id, shingle) AS cnt
          FROM sh)
    GROUP BY doc_id
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition gate: per doc, the duplicated word
    3-gram mass (1 - distinct/total) and the hottest single 3-gram's
    count — the standard filter for looping/boilerplate text.

    One shingle explode, one per-(doc, shingle) count, one per-doc
    rollup — all hash aggregates keyed by doc_id (the natural partition
    key), so the whole op is map-side-combinable and linear."""
    t = Tables(spark, sf_dir)
    sh = _word_shingles(t.documents, _REP_N).select("doc_id", "shingle")
    per = sh.groupBy("doc_id", "shingle").agg(F.count("*").alias("cnt"))
    return per.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_grams"),
        F.count("*").alias("n_distinct"),
        F.round(
            1.0 - F.count("*") / F.sum("cnt").cast("double"), 6
        ).alias("rep_ratio"),
        F.max("cnt").alias("max_gram_count"),
    )


@query(
    "pipe_mix_sources",
    oracle="""
    WITH cnt AS (
        SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    tgt AS (SELECT MIN(n) AS min_n FROM cnt),
    keep AS (
        SELECT d.doc_id, d.source, d.lang,
               CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))
                    AS INTEGER) AS bucket,
               (SELECT min_n FROM tgt) / CAST(c.n AS DOUBLE) AS rate
        FROM documents d JOIN cnt c USING (source)
    )
    SELECT source,
           COUNT(*) AS n_kept,
           COUNT(DISTINCT lang) AS n_langs
    FROM keep
    WHERE bucket < rate * 65536
    GROUP BY source
    """,
)
def pipe_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced training mixture: every source downsampled to the
    smallest source's volume by a DETERMINISTIC content-hash coin
    (md5(doc_id) bucket < rate) — the re-weighting step that turns a
    crawled corpus into a training mix, reproducible bit-for-bit across
    engines, reruns, and cluster sizes (no RNG state, no sort order
    dependence; the same md5-bucket idiom as ``pipe_stratified_sample``).

    The per-source rate is a broadcast join against a tiny count
    dimension; the keep predicate is a pushdown-able scalar filter, so
    the plan is scan -> broadcast join -> filter -> aggregate with ONE
    data-sized shuffle (the final per-source rollup)."""
    t = Tables(spark, sf_dir)
    cnt = t.documents.groupBy("source").agg(F.count("*").alias("n"))
    min_n = cnt.agg(F.min("n").alias("min_n"))
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")
    keep = (
        t.documents.join(F.broadcast(cnt), "source")
        .join(F.broadcast(min_n))
        .withColumn("bucket", bucket)
        .withColumn("rate", F.col("min_n") / F.col("n").cast("double"))
        .filter(F.col("bucket") < F.col("rate") * 65536)
    )
    return keep.groupBy("source").agg(
        F.count("*").alias("n_kept"),
        F.countDistinct("lang").alias("n_langs"),
    )


@query(
    "text_pii_scrub",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(LEN(regexp_extract_all(props, '[0-9]+'))) AS BIGINT)
               AS n_redactions,
           COUNT(DISTINCT regexp_replace(props, '[0-9]+', '#', 'g'))
               AS n_shapes
    FROM events
    GROUP BY event_type
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction accounting for a PII-scrub pass: per event type, how
    many digit-run tokens the scrubber would redact from the raw JSON
    payload and how many distinct payload SHAPES remain after masking
    (shape cardinality is the standard sanity metric that a scrubber
    didn't destroy schema diversity).

    Pure JVM regex (``regexp_count`` / ``regexp_replace``) inside one
    hash aggregate — no UDF, fully codegen'd, linear. The real scrubber
    would add patterns (emails, phones); the fixtures' payloads carry
    number-shaped tokens only, so the digit-run rule is the live one."""
    t = Tables(spark, sf_dir)
    return t.events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.regexp_count("props", F.lit(r"[0-9]+"))).alias("n_redactions"),
        F.countDistinct(
            F.regexp_replace("props", r"[0-9]+", "#")
        ).alias("n_shapes"),
    )
