"""Round-6 additions (SURVEY.md §2.2 — extras7).

- ``pipe_bpe_train`` — BPE tokenizer training (the top-R merge rules
  over the document corpus), the canonical LLM-data pipeline operator
  this engine lacked: iterative, but expressed as a VOCAB-BOUNDED
  DataFrame program (one corpus-scale word count, then every round
  operates on the distinct-word vocabulary weighted by frequency) with
  a FULL unrolled-rounds DuckDB oracle — the ``emb_kmeans_exact``
  discipline applied to string merges.
- ``text_bpe_encode`` — the inference side: apply the learned merges
  in order and report the resulting token frequencies (top-20).

Both are exact by construction: merge selection is an integer count
with a UTF-8-BYTE (lhs, rhs) tie-break (collation-independent: Spark
orders strings by UTF-16 code units, DuckDB by UTF-8 bytes — encoding
both sides to binary removes the divergence), and the greedy left-to-right
merge application is the SAME higher-order fold on both engines
(Spark ``aggregate`` / DuckDB ``list_reduce`` — verified to agree on
the overlap cases 'aaaa'→[aa,aa] and 'aaa'→[aa,a]).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import Tables

_BPE_ROUNDS = 6

# char-split and pair/fold expressions shared by both operators; the
# char split is written as an explicit substring transform so Spark and
# DuckDB construct identical arrays (their split-on-empty semantics
# differ).
_CHARS = "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
_PAIRS = (
    "CASE WHEN size(syms) < 2 THEN array() "
    "ELSE transform(sequence(1, size(syms) - 1), i -> "
    "struct(element_at(syms, i) AS lhs, element_at(syms, i + 1) AS rhs))"
    " END"
)
# greedy left-to-right merge of the (lhs, rhs) columns into the syms
# column: walk the symbols; when the accumulator's last element is lhs
# and the current one is rhs, replace the last with lhs||rhs, else
# append.  Overlap semantics are the standard BPE greedy ones
# ('aaaa' + (a,a) -> [aa, aa]; 'aaa' -> [aa, a]).
_FOLD = (
    "aggregate(slice(syms, 2, greatest(size(syms) - 1, 0)),"
    " array(element_at(syms, 1)),"
    " (acc, x) -> CASE WHEN element_at(acc, -1) = lhs AND x = rhs"
    " THEN concat(slice(acc, 1, size(acc) - 1),"
    " array(concat(lhs, rhs)))"
    " ELSE concat(acc, array(x)) END)"
)


def _vocab(t: Tables) -> DataFrame:
    """(word, f, syms): distinct corpus words with frequency and the
    initial single-character symbol arrays.  The ONE corpus-scale pass;
    every BPE round after it is vocabulary-bounded."""
    return (
        t.documents.select(
            F.explode(F.split("text", " ")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("f"))
        .withColumn("syms", F.expr(_CHARS))
    )


def _bpe_rounds(
    t: Tables, rounds: int = _BPE_ROUNDS
) -> tuple[DataFrame, DataFrame]:
    """Run ``rounds`` BPE merge rounds; returns (merge_table, vocab)
    where merge_table is one row per round (rnd, lhs, rhs, cnt) and
    vocab carries the final merged symbol arrays.

    In-plan throughout: each round's best pair is a 1-ROW DataFrame
    (orderBy cnt DESC, lhs, rhs LIMIT 1) broadcast-cross-joined into
    the merge fold — the pair never crosses to the driver; eager
    localCheckpoint per round caps the lineage (a vocab-bounded
    action, no data to the driver)."""
    vocab = _vocab(t).localCheckpoint()
    merges: list[DataFrame] = []
    # iteration economics (the graph_pagerank discipline, round 13):
    # every in-loop action is vocab-bounded (tens of thousands of
    # rows), so each round's pair aggregate at the session's full
    # shuffle width is pure near-empty-task scheduling overhead — the
    # loop runs its own narrow width (every action executes inside the
    # loop, so the restored conf never leaks to the returned plan).
    spark = t.documents.sparkSession
    before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(min(int(before), 4))
    )
    try:
        for rnd in range(1, rounds + 1):
            pairs = (
                vocab.select("f", F.explode(F.expr(_PAIRS)).alias("p"))
                .groupBy("p.lhs", "p.rhs")
                .agg(F.sum("f").alias("cnt"))
            )
            # tie-break on UTF-8 BYTES, not strings: Spark compares
            # strings by UTF-16 code units, DuckDB by UTF-8 bytes —
            # binary-encoding both sides makes a count tie
            # collation-independent (the oracle mirrors with DuckDB
            # encode() -> BLOB compares).
            best = (
                pairs.orderBy(
                    F.col("cnt").desc(),
                    F.encode("lhs", "utf-8"),
                    F.encode("rhs", "utf-8"),
                )
                .limit(1)
                .localCheckpoint()
            )
            # exhausted-merges guard: if no adjacent pair remains (every
            # vocab word already a single symbol), stop — cross-joining
            # the 0-row best would silently EMPTY the vocabulary for all
            # later rounds.  The oracle mirrors via v{r}'s NOT-EXISTS
            # fallback.
            if not best.head(1):
                break
            merges.append(
                best.select(F.lit(rnd).alias("rnd"), "lhs", "rhs", "cnt")
            )
            vocab = (
                vocab.crossJoin(F.broadcast(best.select("lhs", "rhs")))
                .withColumn("syms", F.expr(_FOLD))
                .drop("lhs", "rhs")
                .localCheckpoint()
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    if not merges:
        spark = t.documents.sparkSession
        table = spark.createDataFrame(
            [], "rnd INT, lhs STRING, rhs STRING, cnt BIGINT"
        )
        return table, vocab
    table = merges[0]
    for m in merges[1:]:
        table = table.unionByName(m)
    return table, vocab


def _bpe_oracle_ctes(rounds: int = _BPE_ROUNDS) -> str:
    """The unrolled-rounds WITH chain shared by both oracles: v0..vR
    vocab states and b1..bR best-pair rows."""
    parts = [
        """
    w AS (
        SELECT word, COUNT(*) AS f
        FROM (SELECT UNNEST(string_split(text, ' ')) AS word
              FROM documents)
        WHERE LEN(word) > 0 GROUP BY 1
    ),
    v0 AS MATERIALIZED (
        SELECT word, f,
               list_transform(range(1, LEN(word) + 1),
                              i -> substr(word, i, 1)) AS syms
        FROM w
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""
    p{r} AS (
        SELECT syms[i] AS lhs, syms[i + 1] AS rhs, SUM(f) AS cnt
        FROM v{r - 1}, UNNEST(range(1, len(syms))) AS u(i)
        GROUP BY 1, 2
    ),
    b{r} AS MATERIALIZED (
        SELECT lhs, rhs, cnt FROM p{r}
        ORDER BY cnt DESC, encode(lhs), encode(rhs) LIMIT 1
    ),
    v{r} AS MATERIALIZED (
        SELECT word, f,
               list_reduce(list_transform(syms, s -> [s]),
                   (acc, x) -> CASE WHEN acc[-1] = b{r}.lhs
                                     AND x[1] = b{r}.rhs
                                    THEN list_append(
                                        acc[1:len(acc) - 1],
                                        b{r}.lhs || b{r}.rhs)
                                    ELSE list_concat(acc, x) END) AS syms
        FROM v{r - 1} CROSS JOIN b{r}
        UNION ALL
        SELECT word, f, syms FROM v{r - 1}
        WHERE NOT EXISTS (SELECT 1 FROM b{r})
    )""")
    return ",".join(parts)


def _bpe_train_oracle() -> str:
    selects = " UNION ALL ".join(
        f"SELECT {r} AS rnd, lhs, rhs, CAST(cnt AS BIGINT) AS cnt"
        f" FROM b{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    return f"WITH {_bpe_oracle_ctes()} {selects}"


@query("pipe_bpe_train", oracle=_bpe_train_oracle)
def pipe_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training: the top-6 merge rules over the document
    corpus — one row per round (rnd, lhs, rhs, cnt), where (lhs, rhs)
    is the most frequent adjacent symbol pair (ties: UTF-8 byte order)
    and cnt its corpus frequency at selection time.

    Scale shape: ONE corpus-scale pass (the word-frequency aggregate —
    map-side partial, standard two-phase hash agg); every round after
    it is bounded by the DISTINCT-WORD vocabulary (the standard BPE
    trick): pair counting explodes <= |V|*(maxlen-1) rows, the argmax
    is a 1-row TakeOrdered, and the merge is a JVM higher-order fold
    cross-joined against the broadcast 1-row pair — no Python, no
    driver collect, no corpus re-scan.  At 100 TB the vocabulary is
    millions of rows where the corpus is billions: the rounds cost the
    same as here.

    FULL oracle: the identical unrolled-rounds computation in DuckDB
    (list_reduce mirrors Spark's aggregate fold; integer counts and
    lexicographic tie-breaks leave nothing engine-dependent)."""
    t = Tables(spark, sf_dir)
    table, _ = _bpe_rounds(t)
    return table.select(
        "rnd", "lhs", "rhs", F.col("cnt").cast("long").alias("cnt")
    )


_ENCODE_TOPN = 20


def _bpe_encode_oracle() -> str:
    return f"""WITH {_bpe_oracle_ctes()}
    SELECT tok, CAST(SUM(f) AS BIGINT) AS cnt
    FROM v{_BPE_ROUNDS}, UNNEST(syms) AS u(tok)
    GROUP BY 1
    ORDER BY cnt DESC, tok LIMIT {_ENCODE_TOPN}
    """


@query("text_bpe_encode", oracle=_bpe_encode_oracle)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE encoding (the inference side): apply the 6 learned merges in
    training order to the corpus and report the top-20 resulting
    tokens by total frequency (DESC, token lexicographic ties) —
    exactly what a tokenizer-coverage audit reads off a corpus.

    Same vocab-bounded shape as training (the per-word token counts
    weight by word frequency instead of re-scanning documents); FULL
    oracle via the shared unrolled-rounds WITH chain."""
    t = Tables(spark, sf_dir)
    _, vocab = _bpe_rounds(t)
    return (
        vocab.select("f", F.explode("syms").alias("tok"))
        .groupBy("tok")
        .agg(F.sum("f").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "tok")
        .limit(_ENCODE_TOPN)
    )
