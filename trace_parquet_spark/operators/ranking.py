"""Text ranking over ``documents``: TF-IDF top terms and BM25 search.

The retrieval-side companions to the dedup/quality operators — a
training-data pipeline uses these for corpus exploration, boilerplate
term mining, and keyword-targeted subset extraction.

All scoring is pure built-in column algebra (JVM-side, one explode +
two aggregations); no UDFs.

Cross-engine determinism (driver gate hashes raw values): the ONLY
engine-dependent primitive here is ln() (libm may differ by 1 ulp), so
each idf is quantized to the 1e-6 grid — floor(x*1e6+0.5)/1e6 — right
after the log in BOTH engines; every other operation is written as the
identical IEEE sequence on identical doubles (explicit parentheses,
literals like 2.2/0.25/0.75 that parse to the same double). Scores are
rounded to 9 decimals before ranking (house rule, memory:
oracle-parity-rules) with id/token tie-breaks.

Scale: tf/df/dl are classic map-side-combinable aggregations; the
one-row corpus stats (N, avgdl) broadcast; the query-term filter for
BM25 prunes the tf relation to |terms| rows per doc before scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens, tokens_sql
from ..sources.registry import load_table, load_table_parallel

TFIDF_DOC_MAX = 100
TFIDF_TOP = 3
BM25_TERMS = ("spark", "join", "window")
BM25_TOP = 20
BM25_K1 = 1.2
BM25_B = 0.75


def _grid6(col: F.Column) -> F.Column:
    return F.floor(col * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def _token_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    return docs.select(
        "doc_id", F.explode(tokens("text")).alias("t")
    ).filter(F.col("t") != "")


_TOK_CTE = f"""
tok AS (
  SELECT doc_id, t FROM (
    SELECT doc_id, unnest({tokens_sql("text")}) AS t FROM documents
  ) WHERE t <> ''
)
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N characteristic terms per document by smoothed TF-IDF
    (idf = ln((N+1)/(df+1)) + 1, quantized; score = tf * idf).
    df/N come from the FULL corpus; output restricted to a doc slice.
    """
    tok = _token_relation(spark, sf_dir)
    tf = tok.groupBy("doc_id", "t").agg(F.count("*").alias("tf"))
    df = tf.groupBy("t").agg(F.count("*").alias("df"))
    n_docs = load_table(spark, sf_dir, "documents").agg(
        F.count("*").alias("n_docs")
    )
    idf = df.crossJoin(F.broadcast(n_docs)).select(
        "t",
        _grid6(
            F.log(
                (F.col("n_docs") + 1).cast("double")
                / (F.col("df") + 1).cast("double")
            )
            + F.lit(1.0)
        ).alias("idf6"),
    )
    scored = (
        tf.filter(F.col("doc_id") < TFIDF_DOC_MAX)
        .join(idf, "t")
        .withColumn(
            "score9",
            F.round(F.col("tf").cast("double") * F.col("idf6"), 9),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score9"), F.col("t"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TFIDF_TOP)
        .select(
            "doc_id",
            "rank",
            F.col("t").alias("token"),
            F.round("score9", 6).alias("tfidf"),
        )
        .orderBy("doc_id", "rank")
    )


TFIDF_SQL = f"""
WITH {_TOK_CTE},
tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
idf AS (
  SELECT t,
         floor((ln(CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)) + 1.0)
               * 1e6 + 0.5) / 1e6 AS idf6
  FROM df CROSS JOIN n
),
scored AS (
  SELECT tf.doc_id, tf.t,
         round(CAST(tf.tf AS DOUBLE) * idf.idf6, 9) AS score9
  FROM tf JOIN idf ON tf.t = idf.t
  WHERE tf.doc_id < {TFIDF_DOC_MAX}
),
ranked AS (
  SELECT doc_id, t, score9,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score9 DESC, t) AS rank
  FROM scored
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, t AS token,
       round(score9, 6) AS tfidf
FROM ranked WHERE rank <= {TFIDF_TOP}
ORDER BY doc_id, rank
"""


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-N documents for a fixed keyword query.

    Per-term scores are aggregated as CONDITIONAL sums (exactly one tf
    row per (doc, term), so each conditional sum is a single value —
    no float summation-order nondeterminism) and added in a fixed
    left-to-right order.
    """
    tok = _token_relation(spark, sf_dir)
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    tf = (
        tok.filter(F.col("t").isin(list(BM25_TERMS)))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("t").agg(F.count("*").alias("df"))
    stats = (
        load_table(spark, sf_dir, "documents")
        .agg(F.count("*").alias("n_docs"))
        .crossJoin(tok.agg(F.count("*").alias("total_tokens")))
        .select(
            "n_docs",
            (
                F.col("total_tokens").cast("double")
                / F.col("n_docs").cast("double")
            ).alias("avgdl"),
        )
    )
    idf = df.crossJoin(F.broadcast(stats)).select(
        "t",
        "avgdl",
        _grid6(
            F.log(
                F.lit(1.0)
                + (
                    (F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)
                )
                / (F.col("df").cast("double") + F.lit(0.5))
            )
        ).alias("idf6"),
    )
    tfd = F.col("tf").cast("double")
    denom = tfd + F.lit(BM25_K1) * (
        F.lit(1 - BM25_B)
        + F.lit(BM25_B) * (F.col("dl").cast("double") / F.col("avgdl"))
    )
    term_score = (F.col("idf6") * (tfd * F.lit(BM25_K1 + 1.0))) / denom
    per_term = (
        tf.join(idf, "t")
        .join(dl, "doc_id")
        .withColumn("term_score", term_score)
    )
    agg = per_term.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("t") == term, F.col("term_score"))),
                F.lit(0.0),
            ).alias(f"s{i}")
            for i, term in enumerate(BM25_TERMS)
        ]
    )
    total = F.col("s0")
    for i in range(1, len(BM25_TERMS)):
        total = total + F.col(f"s{i}")
    scored = agg.withColumn("score9", F.round(total, 9))
    # top-k FIRST (TakeOrderedAndProject — per-partition heaps, no
    # global sort/window over the corpus), then rank the k-row result.
    top = scored.orderBy(F.desc("score9"), F.col("doc_id")).limit(BM25_TOP)
    # global window is post-top-k bounded: <= BM25_TOP rows
    w = Window.orderBy(F.desc("score9"), F.col("doc_id"))
    return (
        top.withColumn("rank", F.row_number().over(w).cast("long"))
        .select("rank", "doc_id", F.round("score9", 6).alias("bm25"))
        .orderBy("rank")
    )


_TERMS_IN = ", ".join(f"'{t}'" for t in BM25_TERMS)
_TERM_SUMS = ",\n         ".join(
    f"coalesce(sum(CASE WHEN t = '{term}' THEN term_score END), 0.0) AS s{i}"
    for i, term in enumerate(BM25_TERMS)
)
_TERM_TOTAL = " + ".join(f"s{i}" for i in range(len(BM25_TERMS)))

BM25_SQL = f"""
WITH {_TOK_CTE},
dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY 1),
tf AS (SELECT doc_id, t, count(*) AS tf FROM tok
       WHERE t IN ({_TERMS_IN}) GROUP BY 1, 2),
df AS (SELECT t, count(*) AS df FROM tf GROUP BY 1),
stats AS (
  SELECT n_docs,
         CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE) AS avgdl
  FROM (SELECT count(*) AS n_docs FROM documents)
  CROSS JOIN (SELECT count(*) AS total_tokens FROM tok)
),
idf AS (
  SELECT t, avgdl,
         floor(ln(1.0 + (CAST(n_docs - df AS DOUBLE) + 0.5)
                        / (CAST(df AS DOUBLE) + 0.5)) * 1e6 + 0.5) / 1e6 AS idf6
  FROM df CROSS JOIN stats
),
per_term AS (
  SELECT tf.doc_id, tf.t,
         (idf.idf6 * (CAST(tf.tf AS DOUBLE) * {BM25_K1 + 1.0!r}))
         / (CAST(tf.tf AS DOUBLE)
            + {BM25_K1!r} * ({1 - BM25_B!r}
                             + {BM25_B!r} * (CAST(dl.dl AS DOUBLE) / idf.avgdl)))
           AS term_score
  FROM tf JOIN idf ON tf.t = idf.t
  JOIN dl ON tf.doc_id = dl.doc_id
),
agg AS (
  SELECT doc_id,
         {_TERM_SUMS}
  FROM per_term GROUP BY doc_id
),
ranked AS (
  SELECT doc_id, round({_TERM_TOTAL}, 9) AS score9
  FROM agg
)
SELECT CAST(row_number() OVER (ORDER BY score9 DESC, doc_id) AS BIGINT) AS rank,
       doc_id, round(score9, 6) AS bm25
FROM ranked
ORDER BY score9 DESC, doc_id
LIMIT {BM25_TOP}
"""


QUERIES = {
    "tfidf_top_terms": tfidf_top_terms,
    "bm25_search": bm25_search,
}

ORACLES = {
    "tfidf_top_terms": TFIDF_SQL,
    "bm25_search": BM25_SQL,
}


# --------------------------------------------------------------------------
# hybrid retrieval: BM25 ⊕ embedding cosine via reciprocal-rank fusion
# --------------------------------------------------------------------------

RRF_K = 60        # the standard Cormack et al. 2009 constant
RRF_TOP = 10      # fused results returned
RRF_QUERY_VEC = 0  # query embedding = vec_id 0 (doc_id ≡ vec_id in testdata)


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search, the standard RAG retrieval shape: fuse the
    lexical leg (this module's BM25 top-N for the fixed term query)
    with the semantic leg (exact cosine top-N around a fixed query
    embedding) by reciprocal-rank fusion — score(d) = Σ_legs
    1e6 div (RRF_K + rank_leg(d)), a rank-only combination that needs
    no score normalization across legs (Cormack et al. 2009). Integer
    division keeps the fused score on an exact grid, so the DuckDB
    twin hash-matches; ties break on doc_id.

    Scale: both legs are already top-N-bounded relations (BM25 takes
    TakeOrdered before ranking; the cosine leg broadcasts one query
    vector over a narrow scan), so the fusion is a full-outer join of
    two N-row relations — constant work after the legs."""
    from .similarity import TOP_K  # noqa: F401  (module import sanity)
    from ..functions.vectors import cosine
    from ..sources.registry import load_table_parallel

    lex = bm25_search(spark, sf_dir).select(
        "doc_id", F.col("rank").alias("lex_rank")
    )
    emb = load_table_parallel(spark, sf_dir, "embeddings", "vec_id")
    qv = emb.filter(F.col("vec_id") == RRF_QUERY_VEC).select(
        F.col("embedding").alias("qv")
    )
    scored = (
        emb.filter(F.col("vec_id") != RRF_QUERY_VEC)
        .crossJoin(F.broadcast(qv))
        .withColumn("cos9", F.round(cosine("qv", "embedding"), 9))
    )
    sem = (
        scored.orderBy(F.desc("cos9"), F.col("vec_id"))
        .limit(BM25_TOP)
        .withColumn(
            "sem_rank",
            F.row_number().over(
                # global window is post-top-k bounded: <= BM25_TOP rows
                Window.orderBy(F.desc("cos9"), F.col("vec_id"))
            ).cast("long"),
        )
        .select(F.col("vec_id").alias("doc_id"), "sem_rank")
    )
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
            F.coalesce("sem_rank", F.lit(0)).alias("sem_rank"),
            (
                F.when(
                    F.col("lex_rank").isNotNull(),
                    F.expr(f"CAST(1000000 div ({RRF_K} + lex_rank) AS BIGINT)"),
                ).otherwise(F.lit(0))
                + F.when(
                    F.col("sem_rank").isNotNull(),
                    F.expr(f"CAST(1000000 div ({RRF_K} + sem_rank) AS BIGINT)"),
                ).otherwise(F.lit(0))
            ).alias("rrf_micro"),
        )
    )
    w = Window.orderBy(F.desc("rrf_micro"), F.col("doc_id"))
    return (
        fused.orderBy(F.desc("rrf_micro"), F.col("doc_id"))
        .limit(RRF_TOP)
        # global window is post-top-k bounded: <= RRF_TOP rows
        .withColumn("fused_rank", F.row_number().over(w).cast("long"))
        .select("fused_rank", "doc_id", "lex_rank", "sem_rank", "rrf_micro")
        .orderBy("fused_rank")
    )


def _rrf_sql() -> str:
    from ..functions.vectors import cosine_sql

    return f"""
WITH lex AS (
{BM25_SQL.replace("ORDER BY score9 DESC, doc_id", "ORDER BY score9 DESC, doc_id ", 1)}
),
sem AS (
  SELECT CAST(vec_id AS BIGINT) AS doc_id,
         CAST(row_number() OVER (ORDER BY cos9 DESC, vec_id) AS BIGINT)
           AS sem_rank
  FROM (
    SELECT c.vec_id,
           round({cosine_sql('q.embedding', 'c.embedding')}, 9) AS cos9
    FROM embeddings c,
         (SELECT embedding FROM embeddings
          WHERE vec_id = {RRF_QUERY_VEC}) q
    WHERE c.vec_id <> {RRF_QUERY_VEC}
  )
  ORDER BY cos9 DESC, doc_id
  LIMIT {BM25_TOP}
),
fused AS (
  SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
         COALESCE(l.rank, 0) AS lex_rank,
         COALESCE(s.sem_rank, 0) AS sem_rank,
         CAST(CASE WHEN l.rank IS NULL THEN 0
                   ELSE 1000000 // ({RRF_K} + l.rank) END
            + CASE WHEN s.sem_rank IS NULL THEN 0
                   ELSE 1000000 // ({RRF_K} + s.sem_rank) END
              AS BIGINT) AS rrf_micro
  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
)
SELECT CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id) AS BIGINT)
         AS fused_rank,
       doc_id, lex_rank, sem_rank, rrf_micro
FROM fused
ORDER BY rrf_micro DESC, doc_id
LIMIT {RRF_TOP}
"""


HYBRID_RRF_SQL = _rrf_sql()

QUERIES["hybrid_search_rrf"] = hybrid_search_rrf
ORACLES["hybrid_search_rrf"] = HYBRID_RRF_SQL
