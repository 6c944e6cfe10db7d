"""Intra-document repetition metrics and corpus-level boilerplate.

Gopher's rule set (Rae et al. 2021, §A1.1) filters documents by how
much of them is repeated content: fraction of duplicated words, and
the character mass covered by the most-frequent / by duplicated word
n-grams. CCNet-style pipelines additionally strip *corpus-wide*
boilerplate — fragments shared by a large fraction of documents.
The reference engine has no text pipeline at all (it exports opaque
gzip payloads — reference service/ParquetConversionService.java:60-96);
these operators extend the engine for LLM-corpus curation, next to the
quality gates in quality_rules.py (which flag only the top-bigram
count).

The testdata documents are single-line word streams, so the metrics
are word/n-gram based (the line/paragraph variants reduce to the same
shape with a different delimiter). All fractions are emitted on an
exact parts-per-million grid via one truncating integer division —
no float ever crosses the engine boundary.

Scale: every stage is explode → groupBy(doc_id, gram) → groupBy(doc_id)
— linear in corpus size, partial-aggregated map-side, no self-join.
The boilerplate pass's hot-fragment set is df-capped and tiny by
construction, so the per-doc membership probe is a broadcast join —
the same hot-key discipline as the df-capped n-gram dedup path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import norm_text, norm_text_sql, shingles_from, tokens
from ..sources.registry import load_table
from ..session import track_cache

# A shingle is "boilerplate" when it appears in more than this fraction
# of all documents (document frequency, not occurrence count).
BOILERPLATE_DF_PPM = 70_000  # 7% of the corpus


def _toks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tokens("text").alias("toks"),
        F.length(norm_text("text")).cast("long").alias("n_chars"),
    )


def repetition_metrics_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition profile on the ppm grid:

    - ``dup_word_ppm`` — fraction of word occurrences whose word
      appears more than once in the document,
    - ``top_2gram_char_ppm`` — character mass of the single most
      frequent word bigram (ties broken lexicographically) over the
      normalized character count,
    - ``dup_3gram_char_ppm`` — character mass of repeated word
      trigrams over the total trigram character mass.
    """
    t = _toks(spark, sf_dir).transform(track_cache)

    wc = (
        t.select("doc_id", F.explode("toks").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("c"))
    )
    wstats = wc.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n_words"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
        .cast("long")
        .alias("dup_words"),
    )

    g2 = (
        t.select("doc_id", F.explode(shingles_from(F.col("toks"), 2)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
    )
    top2 = (
        g2.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.col("c").desc(), F.col("g").asc()
                )
            ),
        )
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            (F.col("c") * F.length("g")).cast("long").alias("top2_mass"),
        )
    )

    g3 = (
        t.select("doc_id", F.explode(shingles_from(F.col("toks"), 3)).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .select("doc_id", "c", F.length("g").alias("glen"))
    )
    g3stats = g3.groupBy("doc_id").agg(
        F.sum(F.col("c") * F.col("glen")).cast("long").alias("tot_mass"),
        F.sum(
            F.when(F.col("c") > 1, F.col("c") * F.col("glen")).otherwise(0)
        )
        .cast("long")
        .alias("rep_mass"),
    )

    return (
        t.select("doc_id", "n_chars")
        .join(wstats, "doc_id")
        .join(top2, "doc_id")
        .join(g3stats, "doc_id")
        .select(
            "doc_id",
            "n_words",
            F.expr("dup_words * 1000000 div greatest(n_words, 1)")
            .cast("long")
            .alias("dup_word_ppm"),
            F.expr("top2_mass * 1000000 div greatest(n_chars, 1)")
            .cast("long")
            .alias("top_2gram_char_ppm"),
            F.expr("rep_mass * 1000000 div greatest(tot_mass, 1)")
            .cast("long")
            .alias("dup_3gram_char_ppm"),
        )
        .orderBy("doc_id")
    )


def _toks_cte() -> str:
    norm = norm_text_sql("text")
    return f"""toks AS (
  SELECT doc_id, string_split({norm}, ' ') AS toks,
         CAST(length({norm}) AS BIGINT) AS n_chars
  FROM documents
)"""


def _gram_list(n: int) -> str:
    return (
        f"[array_to_string(list_slice(toks, i, i + {n - 1}), ' ') "
        f"for i in range(1, greatest(len(toks) - {n - 1}, 1) + 1)]"
    )


REPETITION_SQL = f"""
WITH {_toks_cte()},
wc AS (
  SELECT doc_id, w, count(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS w FROM toks) GROUP BY doc_id, w
),
wstats AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
         CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_words
  FROM wc GROUP BY doc_id
),
g2 AS (
  SELECT doc_id, g, count(*) AS c
  FROM (SELECT doc_id, unnest({_gram_list(2)}) AS g FROM toks)
  GROUP BY doc_id, g
),
top2 AS (
  SELECT doc_id, CAST(c * length(g) AS BIGINT) AS top2_mass
  FROM (SELECT doc_id, g, c,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY c DESC, g ASC) AS rn
        FROM g2)
  WHERE rn = 1
),
g3 AS (
  SELECT doc_id, g, count(*) AS c, length(g) AS glen
  FROM (SELECT doc_id, unnest({_gram_list(3)}) AS g FROM toks)
  GROUP BY doc_id, g
),
g3stats AS (
  SELECT doc_id, CAST(sum(c * glen) AS BIGINT) AS tot_mass,
         CAST(sum(CASE WHEN c > 1 THEN c * glen ELSE 0 END) AS BIGINT)
           AS rep_mass
  FROM g3 GROUP BY doc_id
)
SELECT t.doc_id, w.n_words,
       CAST(w.dup_words * 1000000 // greatest(w.n_words, 1) AS BIGINT)
         AS dup_word_ppm,
       CAST(p.top2_mass * 1000000 // greatest(t.n_chars, 1) AS BIGINT)
         AS top_2gram_char_ppm,
       CAST(g.rep_mass * 1000000 // greatest(g.tot_mass, 1) AS BIGINT)
         AS dup_3gram_char_ppm
FROM toks t
JOIN wstats w ON t.doc_id = w.doc_id
JOIN top2 p ON t.doc_id = p.doc_id
JOIN g3stats g ON t.doc_id = g.doc_id
ORDER BY t.doc_id
"""


def boilerplate_shingle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate exposure: the fraction of the doc's
    distinct bigram shingles that are corpus-wide hot — document
    frequency above BOILERPLATE_DF_PPM. (Bigrams, because the synthetic
    corpus draws from a ~31-word vocabulary: trigram document
    frequencies top out below any meaningful threshold there, while the
    operator shape is n-independent.)

    The hot set is computed once from the distinct (doc, shingle)
    relation and is tiny by construction (df-capped), so the per-doc
    membership test is a broadcast hash join against it — no
    shuffle of the corpus on shingle keys."""
    t = _toks(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    cutoff = n_docs * BOILERPLATE_DF_PPM  # compare df*1e6 > n_docs*ppm

    pairs = t.select(
        "doc_id", F.explode(F.array_distinct(shingles_from(F.col("toks"), 2))).alias("g")
    )
    hot = (
        pairs.groupBy("g")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") * 1_000_000 > F.lit(cutoff))
        .select("g")
    )
    per_doc = (
        pairs.join(F.broadcast(hot).withColumn("is_hot", F.lit(1)), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_shingles"),
            F.sum(F.coalesce(F.col("is_hot"), F.lit(0)))
            .cast("long")
            .alias("n_hot"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_shingles",
        "n_hot",
        F.expr("n_hot * 1000000 div greatest(n_shingles, 1)")
        .cast("long")
        .alias("boilerplate_ppm"),
        (F.expr("n_hot * 1000000 div greatest(n_shingles, 1)") <= 300_000)
        .cast("long")
        .alias("keep"),
    ).orderBy("doc_id")


BOILERPLATE_SQL = f"""
WITH {_toks_cte()},
pairs AS (
  SELECT DISTINCT doc_id, g
  FROM (SELECT doc_id, unnest({_gram_list(2)}) AS g FROM toks)
),
hot AS (
  SELECT g FROM (SELECT g, count(*) AS df FROM pairs GROUP BY g)
  WHERE df * 1000000 > (SELECT count(*) FROM documents) * {BOILERPLATE_DF_PPM}
),
per_doc AS (
  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         CAST(sum(CASE WHEN h.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_hot
  FROM pairs p LEFT JOIN hot h ON p.g = h.g
  GROUP BY p.doc_id
)
SELECT doc_id, n_shingles, n_hot,
       CAST(n_hot * 1000000 // greatest(n_shingles, 1) AS BIGINT)
         AS boilerplate_ppm,
       CAST(n_hot * 1000000 // greatest(n_shingles, 1) <= 300000 AS BIGINT)
         AS keep
FROM per_doc
ORDER BY doc_id
"""


QUERIES = {
    "repetition_metrics_docs": repetition_metrics_docs,
    "boilerplate_shingle_stats": boilerplate_shingle_stats,
}

ORACLES = {
    "repetition_metrics_docs": REPETITION_SQL,
    "boilerplate_shingle_stats": BOILERPLATE_SQL,
}
