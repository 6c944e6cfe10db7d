"""Training-data preparation operators: skip-gram pair extraction
(embedding-training prep), label-balanced sampling (classifier-training
prep), and pattern redaction (PII-style scrubbing).

The reference exports raw rows only (repository/ParameterDataRepository.java:
53-78); these are the standard last-mile transforms between a cleaned
corpus and a trainer.

All three are single-pass JVM plans with full DuckDB oracles:

- ``skipgram_pairs``: (center, context) co-occurrence counts within a
  ±2 token window — word2vec's training-pair generator. The positional
  self-join is per-document (equi-join on doc_id + position band), so
  cost is Σ len(doc)·2W, linear in corpus size — never cross-document.
- ``balanced_sample_embeddings``: downsample every class to the
  smallest class's size, choosing rows by a deterministic md5 order
  (reproducible across runs/engines, no RNG) — one window pass.
- ``redact_props``: digit-run redaction over the semi-structured props
  column with a redaction count per event — regexp_replace is
  implicitly global in Spark; the DuckDB twin passes the 'g' flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash32, stable_hash32_sql
from ..functions.text import tokens, tokens_sql
from ..sources.registry import load_table, load_table_parallel

WINDOW = 2  # skip-gram context half-width
MIN_COUNT = 5  # drop pairs rarer than this (word2vec min_count)


def skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    tok = (
        docs.select(
            "doc_id", F.posexplode(tokens("text")).alias("pos", "tok")
        )
        .filter(F.col("tok") != "")
    )
    a = tok.alias("a")
    b = tok.alias("b")
    pairs = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("b.pos").between(F.col("a.pos") - WINDOW, F.col("a.pos") + WINDOW))
        & (F.col("b.pos") != F.col("a.pos")),
    ).select(F.col("a.tok").alias("center"), F.col("b.tok").alias("context"))
    return (
        pairs.groupBy("center", "context")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= MIN_COUNT)
        .orderBy("center", "context")
    )


SKIPGRAM_SQL = f"""
WITH t AS (
  SELECT doc_id, {tokens_sql("text")} AS toks FROM documents
), tok AS (
  SELECT doc_id,
         CAST(unnest(generate_series(1, len(toks))) AS BIGINT) AS pos,
         unnest(toks) AS tok
  FROM t
), tok2 AS (
  SELECT * FROM tok WHERE tok <> ''
)
SELECT a.tok AS center, b.tok AS context, CAST(count(*) AS BIGINT) AS n
FROM tok2 a
JOIN tok2 b
  ON a.doc_id = b.doc_id
 AND b.pos BETWEEN a.pos - {WINDOW} AND a.pos + {WINDOW}
 AND b.pos <> a.pos
GROUP BY a.tok, b.tok
HAVING count(*) >= {MIN_COUNT}
ORDER BY center, context
"""


def balanced_sample_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every label downsampled to the minority-class size; selection
    order is md5(vec_id) — deterministic, engine-independent, and
    uncorrelated with the data (the hash-as-RNG idiom shared with
    operators/sampling.py)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    m = emb.groupBy("label").agg(F.count("*").alias("n")).agg(
        F.min("n").alias("m")
    )
    w = Window.partitionBy("label").orderBy(
        stable_hash32(F.col("vec_id").cast("string")), "vec_id"
    )
    ranked = emb.withColumn("rn", F.row_number().over(w))
    return (
        ranked.join(F.broadcast(m), F.col("rn") <= F.col("m"))
        .select("label", "vec_id")
        .orderBy("label", "vec_id")
    )


BALANCED_SAMPLE_SQL = f"""
WITH m AS (
  SELECT min(n) AS m
  FROM (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
), ranked AS (
  SELECT label, vec_id,
         row_number() OVER (
           PARTITION BY label
           ORDER BY {stable_hash32_sql("CAST(vec_id AS VARCHAR)")}, vec_id
         ) AS rn
  FROM embeddings
)
SELECT label, vec_id
FROM ranked, m
WHERE rn <= m.m
ORDER BY label, vec_id
"""


REDACT_TOKEN = "<NUM>"


def redact_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.regexp_replace("props", r"\d+", REDACT_TOKEN).alias("redacted"),
            F.size(F.regexp_extract_all("props", F.lit(r"\d+"), 0))
            .cast("long")
            .alias("n_redactions"),
        )
        .orderBy("event_id")
    )


REDACT_SQL = rf"""
SELECT event_id,
       regexp_replace(props, '\d+', '{REDACT_TOKEN}', 'g') AS redacted,
       CAST(len(regexp_extract_all(props, '\d+')) AS BIGINT) AS n_redactions
FROM events
ORDER BY event_id
"""


def pmi_token_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information over the skip-gram co-occurrence
    relation: PMI(a,b) = ln(n_ab·N / (n_a·n_b)) with marginals over
    pair slots. Everything up to the ln is exact integer arithmetic
    (products stay far under 2^63) collapsed into ONE double division;
    the ln output is quantized to the 1e-6 grid in both engines — the
    same libm-parity treatment operators/ranking.py applies to idf.

    Scale: reuses the linear skip-gram join; marginals are two tiny
    aggregations over the (vocab × vocab)-bounded pair counts.
    """
    pairs = skipgram_pairs(spark, sf_dir)
    marg = pairs.groupBy("center").agg(F.sum("n").alias("n_center"))
    total = pairs.agg(F.sum("n").alias("n_total"))
    ratio = (F.col("n") * F.col("n_total")) / (
        F.col("n_center") * F.col("n_context")
    )
    return (
        pairs.join(F.broadcast(marg), "center")
        .join(
            F.broadcast(
                marg.select(
                    F.col("center").alias("context"),
                    F.col("n_center").alias("n_context"),
                )
            ),
            "context",
        )
        .join(F.broadcast(total))
        .select(
            "center",
            "context",
            "n",
            (F.floor(F.log(ratio) * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
                "pmi6"
            ),
        )
        .orderBy("center", "context")
    )


PMI_SQL = f"""
WITH pairs AS (
{SKIPGRAM_SQL.replace("ORDER BY center, context", "")}
), marg AS (
  SELECT center, CAST(sum(n) AS BIGINT) AS n_center FROM pairs GROUP BY center
), total AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_total FROM pairs
)
SELECT p.center, p.context, p.n,
       floor(ln(CAST(p.n * t.n_total AS DOUBLE)
                / CAST(a.n_center * b.n_center AS DOUBLE)) * 1e6 + 0.5) / 1e6
         AS pmi6
FROM pairs p
JOIN marg a ON p.center = a.center
JOIN marg b ON p.context = b.center
CROSS JOIN total t
ORDER BY p.center, p.context
"""


QUERIES = {
    "skipgram_pairs": skipgram_pairs,
    "balanced_sample_embeddings": balanced_sample_embeddings,
    "redact_props": redact_props,
    "pmi_token_pairs": pmi_token_pairs,
}

ORACLES = {
    "skipgram_pairs": SKIPGRAM_SQL,
    "balanced_sample_embeddings": BALANCED_SAMPLE_SQL,
    "redact_props": REDACT_SQL,
    "pmi_token_pairs": PMI_SQL,
}
