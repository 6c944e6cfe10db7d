"""Text analysis over the ``documents`` table.

Language ID, quality scoring, token counting, and document
fingerprinting — the per-document text featurization stage of a
training-data pipeline. Everything is built-in Spark SQL functions
(column builders in ``functions/text.py``) — zero Python in the hot
path, so the stage is embarrassingly parallel over document
partitions at 100 TB; the DuckDB oracles are generated from the same
builders' ``*_sql`` twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    fingerprint_md5,
    fingerprint_md5_sql,
    stable_hash32,
    stable_hash32_sql,
)
from ..functions.text import (
    alpha_ratio,
    alpha_ratio_sql,
    lang_id_from,
    lang_id_sql,
    norm_text,
    norm_text_sql,
    quality_score_from,
    quality_score_sql,
    stopword_ratio_from,
    stopword_ratio_sql,
    token_count_from,
    token_count_sql,
    tokens,
    tokens_sql,
)
from ..sources.registry import load_table, load_table_parallel

_ROLLING_MOD = 2**31


def rolling_hash(col) -> "F.Column":
    """Order-sensitive Karp-Rabin-style fingerprint over the token
    stream: fold (acc*31 + h32(token)) mod 2^31. Unlike the md5 content
    hash this survives into substring/window-dedup variants."""
    hashes = F.transform(tokens(col), lambda t: stable_hash32(t))
    return F.aggregate(
        hashes,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % F.lit(_ROLLING_MOD),
    )


def rolling_hash_sql(expr: str) -> str:
    h = f"list_transform({tokens_sql(expr)}, t -> {stable_hash32_sql('t')})"
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {h}), "
        f"(a, b) -> (a * 31 + b) % {_ROLLING_MOD})"
    )


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    staged = docs.select("doc_id", "text", tokens("text").alias("toks"))
    return staged.select(
        "doc_id",
        token_count_from("text", F.col("toks")).alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_raw"),
        F.round(alpha_ratio("text"), 6).alias("alpha_ratio"),
        F.round(stopword_ratio_from(F.col("toks")), 6).alias("stopword_ratio"),
        quality_score_from("text", F.col("toks")).alias("quality"),
    ).orderBy("doc_id")


TEXT_STATS_SQL = f"""
SELECT doc_id,
       {token_count_sql("text")}                    AS n_tokens,
       CAST(length(text) AS BIGINT)                 AS n_chars_raw,
       round({alpha_ratio_sql("text")}, 6)          AS alpha_ratio,
       round({stopword_ratio_sql("text")}, 6)       AS stopword_ratio,
       {quality_score_sql("text")}                  AS quality
FROM documents
ORDER BY doc_id
"""


def lang_id_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    staged = docs.select("text", tokens("text").alias("toks"))
    return (
        staged.select(lang_id_from("text", F.col("toks")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang_pred")
    )


LANG_ID_SQL = f"""
SELECT {lang_id_sql("text")} AS lang_pred, count(*) AS n_docs
FROM documents
GROUP BY 1
ORDER BY lang_pred
"""


def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content (md5-of-normalized) + order-sensitive rolling hashes."""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    return docs.select(
        "doc_id",
        fingerprint_md5(norm_text("text")).alias("content_fp"),
        rolling_hash("text").alias("rolling_fp"),
    ).orderBy("doc_id")


DOC_FINGERPRINTS_SQL = f"""
SELECT doc_id,
       {fingerprint_md5_sql(norm_text_sql("text"))} AS content_fp,
       {rolling_hash_sql("text")}                   AS rolling_fp
FROM documents
ORDER BY doc_id
"""


QUERIES = {
    "text_stats": text_stats,
    "lang_id_counts": lang_id_counts,
    "doc_fingerprints": doc_fingerprints,
}

ORACLES = {
    "text_stats": TEXT_STATS_SQL,
    "lang_id_counts": LANG_ID_SQL,
    "doc_fingerprints": DOC_FINGERPRINTS_SQL,
}


# GPT-2-style pre-tokenizer, restricted to lookaround-free syntax so
# Java regex (Spark) and RE2 (DuckDB) agree piece-for-piece: optional
# leading space + letter run | digit run | symbol run. (The real GPT-2
# pattern's \s+(?!\S) tail needs negative lookahead, which RE2 lacks;
# whitespace runs are dropped here instead of kept as tokens.)
BPE_PIECE_RE = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \\t\\n\\r]+"
BPE_PIECE_RE_DUCK = r" ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \t\n\r]+"


def token_budget_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per source — the report a training run
    budgets against: docs, bytes, whitespace tokens, and BPE-style
    pre-tokenizer pieces (the count that tracks real tokenizer cost
    within a few percent, since BPE only ever splits within pieces).

    Scale: one projection (two regexp passes per doc, codegen) + one
    partial-agg shuffle keyed by source.
    """
    from ..functions.text import token_count_from, tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", tokens("text").alias("toks")
    )
    per_doc = docs.select(
        "source",
        F.octet_length("text").cast("long").alias("n_bytes"),
        token_count_from("text", F.col("toks")).cast("long").alias("n_ws"),
        F.size(F.regexp_extract_all("text", F.lit(BPE_PIECE_RE), F.lit(0)))
        .cast("long")
        .alias("n_bpe"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("n_ws").alias("total_ws_tokens"),
            F.sum("n_bpe").alias("total_bpe_pieces"),
        )
        .orderBy("source")
    )


TOKEN_BUDGET_SQL = f"""
WITH per_doc AS (
  SELECT source,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         CAST({token_count_sql("text")} AS BIGINT)  AS n_ws,
         CAST(len(regexp_extract_all(text, '{BPE_PIECE_RE_DUCK}'))
              AS BIGINT)                            AS n_bpe
  FROM documents
)
SELECT source,
       count(*)                         AS n_docs,
       CAST(sum(n_bytes) AS BIGINT)     AS total_bytes,
       CAST(sum(n_ws) AS BIGINT)        AS total_ws_tokens,
       CAST(sum(n_bpe) AS BIGINT)       AS total_bpe_pieces
FROM per_doc
GROUP BY source
ORDER BY source
"""

QUERIES["token_budget_by_source"] = token_budget_by_source
ORACLES["token_budget_by_source"] = TOKEN_BUDGET_SQL


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth per source
# ---------------------------------------------------------------------------


def vocab_growth_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law fit per source: V(k) ≈ K·k^β relates cumulative
    vocabulary size V to cumulative token count k as a corpus grows —
    β far from the typical 0.4-0.6 band flags synthetic/templated
    text, and the fit predicts how much NEW vocabulary another 10×
    of a source buys (the question a data-mixture planner asks).

    Construction: docs stream in doc_id order within each source;
    a word's first occurrence is charged to min(doc_id), so
    cum_vocab after doc d is exact without re-scanning history.
    Both cumulative series then land on the micro-nat ln grid and
    β is the OLS slope in log-log space — the exact-integer-sums →
    one-double-chain discipline of ols_by_group, so DuckDB matches
    bitwise.

    Scale: two shuffles on (source, word) — distinct + min(doc_id) —
    then per-source windows and a 5-row regression. The per-doc
    checkpoint relation (one row per doc) is the largest intermediate;
    nothing driver-side."""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    tok = docs.select(
        "source", "doc_id", F.explode(tokens("text")).alias("word")
    ).where(F.col("word") != "")
    per_doc = tok.groupBy("source", "doc_id").agg(F.count("*").alias("n_tok"))
    first_occ = tok.groupBy("source", "word").agg(F.min("doc_id").alias("fo"))
    new_words = first_occ.groupBy("source", F.col("fo").alias("doc_id")).agg(
        F.count("*").alias("n_new")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    series = (
        per_doc.join(new_words, ["source", "doc_id"], "left")
        .select(
            "source",
            "doc_id",
            "n_tok",
            F.coalesce(F.col("n_new"), F.lit(0)).alias("n_new"),
        )
        .select(
            "source",
            F.sum("n_tok").over(w).alias("ct"),
            F.sum("n_new").over(w).alias("cv"),
        )
    )
    lx = F.floor(F.log(F.col("ct").cast("double")) * F.lit(1e6) + F.lit(0.5)).cast(
        "long"
    )
    ly = F.floor(F.log(F.col("cv").cast("double")) * F.lit(1e6) + F.lit(0.5)).cast(
        "long"
    )
    dec = "decimal(38,0)"
    g = (
        series.select("source", lx.alias("x"), ly.alias("y"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
            F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
            F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
        )
        # a 1-doc source has zero x-variance (ct strictly increases
        # only across docs) — no fit exists, drop it in both engines
        .where(F.col("n") >= 2)
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov = (n.cast(dec) * F.col("sxy") - sx.cast(dec) * sy).cast("double")
    varx = (n.cast(dec) * F.col("sxx") - sx.cast(dec) * sx).cast("double")
    vary = (n.cast(dec) * F.col("syy") - sy.cast(dec) * sy).cast("double")
    beta = cov / varx
    return g.select(
        "source",
        n.cast("long").alias("n_docs"),
        beta.alias("heaps_beta"),
        (
            (sy.cast("double") / n.cast("double")
             - beta * (sx.cast("double") / n.cast("double")))
            / F.lit(1e6)
        ).alias("heaps_ln_k"),
        # vary = 0 (no new vocabulary after the first checkpoint)
        # leaves r2 undefined — NULL in both engines
        F.when(vary != 0, cov * cov / (varx * vary)).alias("r2"),
    ).orderBy("source")


VOCAB_GROWTH_SQL = f"""
WITH tok AS (
  SELECT source, doc_id, unnest({tokens_sql("text")}) AS word
  FROM documents
), tok_nz AS (
  SELECT * FROM tok WHERE word <> ''
), per_doc AS (
  SELECT source, doc_id, CAST(count(*) AS BIGINT) AS n_tok
  FROM tok_nz GROUP BY source, doc_id
), first_occ AS (
  SELECT source, word, min(doc_id) AS fo FROM tok_nz GROUP BY source, word
), new_words AS (
  SELECT source, fo AS doc_id, CAST(count(*) AS BIGINT) AS n_new
  FROM first_occ GROUP BY source, fo
), series AS (
  SELECT p.source,
         sum(p.n_tok) OVER (PARTITION BY p.source ORDER BY p.doc_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS ct,
         sum(coalesce(nw.n_new, 0))
           OVER (PARTITION BY p.source ORDER BY p.doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cv
  FROM per_doc p
  LEFT JOIN new_words nw ON p.source = nw.source AND p.doc_id = nw.doc_id
), pts AS (
  SELECT source,
         CAST(floor(ln(CAST(ct AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(CAST(cv AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
  FROM series
), sums AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM pts GROUP BY source
  HAVING count(*) >= 2
), c AS (
  SELECT source, n, sx, sy,
         CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
           AS cov,
         CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
           AS varx,
         CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE)
           AS vary
  FROM sums
)
SELECT source,
       n AS n_docs,
       cov / varx AS heaps_beta,
       (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
        - (cov / varx) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 1e6
         AS heaps_ln_k,
       CASE WHEN vary <> 0 THEN cov * cov / (varx * vary) END AS r2
FROM c
ORDER BY source
"""

QUERIES["vocab_growth_by_source"] = vocab_growth_by_source
ORACLES["vocab_growth_by_source"] = VOCAB_GROWTH_SQL


# ---------------------------------------------------------------------------
# Zipf rank-frequency fit over the top-K tokens
# ---------------------------------------------------------------------------

ZIPF_TOP_K = 500


def zipf_fit_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law fit over the corpus token distribution: frequency of
    the rank-r token ≈ C·r^(−s); the exponent s (≈1 for natural text)
    is the companion diagnostic to vocab_growth_by_source's Heaps β —
    templated/synthetic corpora bend both. Fit restricted to the
    top-K tokens so the ranked relation is CONSTANT-bounded: the
    corpus-sized count relation reduces via TakeOrderedAndProject
    (never a global sort), and ranks/regression live on K rows.

    Same micro-nat log-log OLS as the Heaps fit: exact integer sums,
    one double chain per output — bit-equal cross-engine."""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    counts = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(ZIPF_TOP_K)
    )
    # global window is post-limit bounded: <= ZIPF_TOP_K rows
    w = Window.orderBy(F.desc("cnt"), F.asc("word"))
    pts = counts.select(
        F.row_number().over(w).cast("long").alias("r"), "cnt"
    ).select(
        F.floor(F.log(F.col("r").cast("double")) * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("x"),
        F.floor(F.log(F.col("cnt").cast("double")) * F.lit(1e6) + F.lit(0.5))
        .cast("long")
        .alias("y"),
    )
    dec = "decimal(38,0)"
    g = pts.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov = (n.cast(dec) * F.col("sxy") - sx.cast(dec) * sy).cast("double")
    varx = (n.cast(dec) * F.col("sxx") - sx.cast(dec) * sx).cast("double")
    vary = (n.cast(dec) * F.col("syy") - sy.cast(dec) * sy).cast("double")
    return g.select(
        n.cast("long").alias("n_points"),
        F.when(varx != 0, F.lit(0.0) - cov / varx).alias("zipf_exponent"),
        F.when((varx != 0) & (vary != 0), cov * cov / (varx * vary)).alias(
            "r2"
        ),
    )


ZIPF_SQL = f"""
WITH counts AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt
  FROM (
    SELECT unnest({tokens_sql("text")}) AS word FROM documents
  ) WHERE word <> ''
  GROUP BY word
  ORDER BY cnt DESC, word
  LIMIT {ZIPF_TOP_K}
), pts AS (
  SELECT CAST(floor(ln(CAST(row_number()
                            OVER (ORDER BY cnt DESC, word) AS DOUBLE))
                    * 1e6 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(CAST(cnt AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS y
  FROM counts
), g AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM pts
)
SELECT n AS n_points,
       CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx <> 0 THEN
         0.0 - CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
                    AS DOUBLE)
               / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                      AS DOUBLE)
       END AS zipf_exponent,
       CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx <> 0
             AND CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy <> 0 THEN
         CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         * CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         / (CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
            * CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
                   AS DOUBLE))
       END AS r2
FROM g
"""

QUERIES["zipf_fit_tokens"] = zipf_fit_tokens
ORACLES["zipf_fit_tokens"] = ZIPF_SQL


# --------------------------------------------------------------------------
# token head mass — the integer-exact df-cap diagnostic (round 12)
# --------------------------------------------------------------------------

HEAD_MASS_KS = [1, 10, 100, 1000]


def token_head_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fraction of total token mass carried by the top-k ranked tokens
    (k ∈ 1/10/100/1000), in exact integer ppm. This is the quantity
    the dedup family's SHINGLE_DF_CAP truncates: a fat head (Zipf
    crawls: top-1000 ≈ most of the mass) is exactly what the cap
    drops, so this one scan PREDICTS whether the Σdf² pairing regime
    of dedup_containment_pairs / dedup_setsim_prefix applies to a
    corpus — the round-12 probes (PERF.md) measured both regimes.

    Scale: counts reduce by vocab grain with map-side combine; the
    ranked relation is post-limit CONSTANT-bounded (top max(k) via
    TakeOrderedAndProject, never a global data sort); total mass is a
    1-row agg broadcast. All ratios are integer DIV on the ppm grid —
    bit-equal cross-engine, no doubles anywhere.

    (Reference scope: the reference exports raw rows only,
    repository/ParameterDataRepository.java:53-78 — corpus analytics
    are north-star surface.)"""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    counts = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    total = counts.agg(
        F.sum("cnt").cast("long").alias("total_tokens")
    )
    head = counts.orderBy(F.desc("cnt"), F.asc("word")).limit(
        max(HEAD_MASS_KS)
    )
    # global window is post-limit bounded: <= max(HEAD_MASS_KS) rows
    w = Window.orderBy(F.desc("cnt"), F.asc("word"))
    ranked = head.select(
        F.row_number().over(w).cast("long").alias("r"), "cnt"
    )
    ks = spark.createDataFrame([(k,) for k in HEAD_MASS_KS], "k long")
    return (
        ranked.join(F.broadcast(ks), F.col("r") <= F.col("k"))
        .groupBy("k")
        .agg(
            F.count("*").cast("long").alias("head_tokens"),
            F.sum("cnt").cast("long").alias("head_token_mass"),
        )
        .join(F.broadcast(total))
        .select(
            "k",
            "head_tokens",
            "head_token_mass",
            F.expr(
                "CAST((head_token_mass * 1000000) DIV total_tokens "
                "AS BIGINT)"
            ).alias("head_mass_ppm"),
        )
        .orderBy("k")
    )


HEAD_MASS_SQL = f"""
WITH counts AS (
  SELECT word, CAST(count(*) AS BIGINT) AS cnt
  FROM (
    SELECT unnest({tokens_sql("text")}) AS word FROM documents
  ) WHERE word <> ''
  GROUP BY word
), total AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens FROM counts
), ranked AS (
  SELECT CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT) AS r,
         cnt
  FROM counts
  ORDER BY cnt DESC, word
  LIMIT {max(HEAD_MASS_KS)}
), ks AS (
  SELECT unnest({HEAD_MASS_KS}) AS k
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS head_tokens,
       CAST(sum(cnt) AS BIGINT) AS head_token_mass,
       CAST(sum(cnt) * 1000000 // total_tokens AS BIGINT) AS head_mass_ppm
FROM ranked JOIN ks ON r <= k, total
GROUP BY k, total_tokens
ORDER BY k
"""

QUERIES["token_head_mass"] = token_head_mass
ORACLES["token_head_mass"] = HEAD_MASS_SQL


def langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the n-gram language-ID heuristic against
    the table's stored `lang` labels — the eval lang_id_counts lacks:
    per (true, predicted) cell count plus the cell's share of its
    true-label row in ppm, so per-language recall reads directly off
    the diagonal. The monitoring pattern for any cheap heuristic
    running in front of an expensive model.

    Scale: one scan computing the prediction JVM-side, one
    partial-agg shuffle to the (true × predicted) grid (language
    cardinality bounded); row margins ride an unpartitioned window
    over that grid."""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    staged = docs.select(
        F.col("lang").alias("lang_true"),
        lang_id_from("text", tokens("text")).alias("lang_pred"),
    )
    cells = staged.groupBy("lang_true", "lang_pred").agg(
        F.count("*").alias("n_docs")
    )
    wrow = Window.partitionBy("lang_true")
    return (
        cells.withColumn("row_n", F.sum("n_docs").over(wrow))
        .select(
            "lang_true",
            "lang_pred",
            "n_docs",
            F.expr("CAST(n_docs * 1000000 DIV row_n AS BIGINT)").alias(
                "row_share_ppm"
            ),
        )
        .orderBy("lang_true", "lang_pred")
    )


LANGID_CONFUSION_SQL = f"""
WITH cells AS (
  SELECT lang AS lang_true, {lang_id_sql("text")} AS lang_pred,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM documents
  GROUP BY 1, 2
)
SELECT lang_true, lang_pred, n_docs,
       CAST(n_docs * 1000000
            // sum(n_docs) OVER (PARTITION BY lang_true) AS BIGINT)
         AS row_share_ppm
FROM cells
ORDER BY lang_true, lang_pred
"""

QUERIES["langid_confusion"] = langid_confusion
ORACLES["langid_confusion"] = LANGID_CONFUSION_SQL


# --------------------------------------------------------------------------
# multinomial Naive Bayes source classifier (fastText-ish baseline)
# --------------------------------------------------------------------------


def naive_bayes_source_confusion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multinomial Naive Bayes over unigram counts, classifying each
    document's ``source`` — the classic linear-time text-classifier
    baseline a corpus pipeline trains as its cheap quality/language/
    domain screen before anything neural. Laplace-smoothed token
    likelihoods and the class prior live on the exact micro-nat grid
    (floor(ln·1e6 + 0.5), the doc_surprisal/pmi libm-parity rule), a
    document's class score is an INT64 sum of count×micro-nat terms
    plus the prior, and argmax ties break on the class name — so the
    DuckDB twin reproduces every prediction bit-for-bit. Emitted as
    the (source, predicted) confusion matrix with row shares.
    Resubstitution eval by design (train = score corpus): the entry
    gates the classifier algebra, not generalization — the held-out
    variant is the same plan with a hash-split WHERE.

    Scale: token counts are one (source, token) shuffle; scoring joins
    each doc's distinct-token counts against the 20-class likelihood
    relation — fan-out is |classes| per distinct token, the same
    bounded-fan-out shape as source_overlap_matrix; the argmax is a
    per-doc window over |classes| rows."""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    tok = docs.select(
        "doc_id", "source", F.explode(tokens("text")).alias("t")
    ).filter(F.col("t") != "")
    classes = docs.select(F.col("source").alias("s")).distinct()
    n_docs = docs.count()
    vocab = tok.select("t").distinct().count()
    # per-class token counts and totals (Laplace denominator N_s + V)
    cst = tok.groupBy(F.col("source").alias("s"), "t").agg(
        F.count("*").alias("c")
    )
    ns = cst.groupBy("s").agg(F.sum("c").alias("ns"))
    lik = cst.join(ns, "s").select(
        "s",
        "t",
        F.floor(
            F.log(
                (F.col("c") + 1).cast("double")
                / (F.col("ns") + F.lit(vocab)).cast("double")
            )
            * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("lmicro"),
    )
    default = ns.select(
        "s",
        F.floor(
            F.log(
                F.lit(1.0) / (F.col("ns") + F.lit(vocab)).cast("double")
            )
            * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("dmicro"),
    )
    prior = (
        docs.groupBy(F.col("source").alias("s"))
        .agg(F.count("*").alias("nd"))
        .select(
            "s",
            F.floor(
                F.log(F.col("nd").cast("double") / F.lit(float(n_docs)))
                * 1e6
                + F.lit(0.5)
            )
            .cast("long")
            .alias("pmicro"),
        )
    )
    doc_tok = tok.groupBy("doc_id", "source", "t").agg(
        F.count("*").alias("n")
    )
    scored = (
        doc_tok.crossJoin(F.broadcast(classes))
        .join(lik, ["s", "t"], "left")
        .join(F.broadcast(default), "s")
        .groupBy("doc_id", "source", "s")
        .agg(
            F.sum(
                F.col("n") * F.coalesce("lmicro", "dmicro")
            ).alias("ll")
        )
        .join(F.broadcast(prior), "s")
        .select(
            "doc_id",
            "source",
            "s",
            (F.col("ll") + F.col("pmicro")).alias("score"),
        )
    )
    pick = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("s"))
    pred = (
        scored.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", F.col("s").alias("predicted"))
    )
    cells = pred.groupBy("source", "predicted").agg(
        F.count("*").cast("long").alias("n_docs")
    )
    roww = Window.partitionBy("source")
    return (
        cells.withColumn(
            "row_share_ppm",
            F.expr(
                "CAST(n_docs * 1000000 div "
                "sum(n_docs) OVER (PARTITION BY source) AS BIGINT)"
            ),
        )
        .orderBy("source", "predicted")
    )


NB_SQL = f"""
WITH tok AS (
  SELECT doc_id, source, t
  FROM (SELECT doc_id, source, unnest({tokens_sql("text")}) AS t
        FROM documents)
  WHERE t <> ''
), consts AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT count(DISTINCT t) FROM tok) AS vocab
), cst AS (
  SELECT source AS s, t, count(*) AS c FROM tok GROUP BY 1, 2
), ns AS (
  SELECT s, sum(c) AS ns FROM cst GROUP BY s
), lik AS (
  SELECT cst.s, cst.t,
         CAST(floor(ln(CAST(cst.c + 1 AS DOUBLE)
                       / CAST(ns.ns + consts.vocab AS DOUBLE)) * 1e6 + 0.5)
              AS BIGINT) AS lmicro
  FROM cst JOIN ns ON cst.s = ns.s CROSS JOIN consts
), dflt AS (
  SELECT s,
         CAST(floor(ln(1.0 / CAST(ns.ns + consts.vocab AS DOUBLE))
                    * 1e6 + 0.5) AS BIGINT) AS dmicro
  FROM ns CROSS JOIN consts
), prior AS (
  SELECT source AS s,
         CAST(floor(ln(CAST(count(*) AS DOUBLE)
                       / CAST((SELECT n_docs FROM consts) AS DOUBLE))
                    * 1e6 + 0.5) AS BIGINT) AS pmicro
  FROM documents GROUP BY source
), doc_tok AS (
  SELECT doc_id, source, t, count(*) AS n FROM tok GROUP BY 1, 2, 3
), scored AS (
  SELECT d.doc_id, d.source, c.s,
         sum(d.n * COALESCE(l.lmicro, f.dmicro))
           + any_value(p.pmicro) AS score
  FROM doc_tok d
  CROSS JOIN (SELECT DISTINCT source AS s FROM documents) c
  LEFT JOIN lik l ON l.s = c.s AND l.t = d.t
  JOIN dflt f ON f.s = c.s
  JOIN prior p ON p.s = c.s
  GROUP BY d.doc_id, d.source, c.s
), pred AS (
  SELECT doc_id, source, s AS predicted
  FROM (
    SELECT doc_id, source, s,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, s ASC) AS rn
    FROM scored
  ) WHERE rn = 1
), cells AS (
  SELECT source, predicted, CAST(count(*) AS BIGINT) AS n_docs
  FROM pred GROUP BY 1, 2
)
SELECT source, predicted, n_docs,
       CAST(n_docs * 1000000
            // sum(n_docs) OVER (PARTITION BY source) AS BIGINT)
         AS row_share_ppm
FROM cells
ORDER BY source, predicted
"""

QUERIES["naive_bayes_source_confusion"] = naive_bayes_source_confusion
ORACLES["naive_bayes_source_confusion"] = NB_SQL


# --------------------------------------------------------------------------
# winnowing fingerprints (Schleimer-Wilkerson-Aiken, the MOSS selector)
# --------------------------------------------------------------------------

WIN_K = 5    # k-gram size (token grain)
WIN_W = 4    # winnowing window: one fingerprint per w consecutive grams
_POS_BITS = 20  # positions per doc < 2^20; key = h·2^20 + (2^20−1−pos)


def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection — the MOSS document-
    fingerprinting guarantee: from every window of WIN_W consecutive
    k-gram hashes keep the minimum (rightmost on ties), which selects
    ~2/(w+1) of positions yet guarantees any shared substring of
    length ≥ w+k−1 contributes at least one COMMON fingerprint to both
    documents — the local guarantee plain minhash lacks. The
    rightmost-min choice rides ONE exact int64 key per gram
    (h·2^POS_BITS + (2^POS_BITS−1−pos): minimizing it minimizes h and
    tie-breaks to the LARGEST pos), so a single frame-min window
    computes each window's selection and both engines agree
    bit-for-bit; the doc's fingerprint digest is the md5 of the
    selected (pos, h) pairs in order.

    Scale: token-linear — one projection builds the gram hashes, one
    doc-partitioned frame window selects, one aggregate digests; no
    pairing anywhere (pair generation is what simhash_hamming_pairs /
    dedup_minhash_lsh do downstream of fingerprints like these)."""
    docs = load_table_parallel(spark, sf_dir, "documents", "doc_id")
    toked = docs.select("doc_id", tokens("text").alias("tt")).filter(
        F.size("tt") >= WIN_K
    )
    grams = toked.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, size(tt) - {WIN_K}),"
                f" i -> concat_ws(' ', slice(tt, i + 1, {WIN_K})))"
            )
        ).alias("pos", "g"),
    ).select(
        "doc_id",
        "pos",
        stable_hash32(F.col("g")).alias("h"),
    )
    key = (
        F.col("h").cast("long") * F.lit(1 << _POS_BITS)
        + (F.lit((1 << _POS_BITS) - 1) - F.col("pos"))
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WIN_W - 1), 0)
    )
    picked = (
        grams.withColumn("k", key)
        .withColumn("wmin", F.min("k").over(w))
        # the first w-1 positions belong to no complete window; the
        # frame still emits them, so drop window-ends < WIN_W-1
        .filter(F.col("pos") >= WIN_W - 1)
        .select(
            "doc_id",
            (
                F.lit((1 << _POS_BITS) - 1)
                - (F.col("wmin") % F.lit(1 << _POS_BITS))
            ).alias("sel_pos"),
            F.shiftrightunsigned("wmin", _POS_BITS).alias("sel_h"),
        )
        .distinct()
    )
    return (
        picked.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_fingerprints"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.concat_ws(
                                    ":",
                                    F.lpad(
                                        F.col("sel_pos").cast("string"),
                                        7,
                                        "0",
                                    ),
                                    F.col("sel_h").cast("string"),
                                )
                            )
                        ),
                        lambda x: x,
                    ),
                    "|",
                )
            ).alias("fingerprint_md5"),
        )
        .join(
            toked.select(
                "doc_id",
                (F.size("tt") - WIN_K + 1).cast("long").alias("n_grams"),
            ),
            "doc_id",
        )
        .select(
            "doc_id",
            "n_grams",
            "n_fingerprints",
            F.expr(
                "CAST(n_fingerprints * 1000000 div n_grams AS BIGINT)"
            ).alias("density_ppm"),
            "fingerprint_md5",
        )
        .orderBy("doc_id")
    )


WINNOWING_SQL = f"""
WITH toks AS (
  SELECT doc_id, {tokens_sql('text')} AS tt FROM documents
), grams AS (
  SELECT doc_id, i - 1 AS pos,
         {stable_hash32_sql(f"array_to_string(list_slice(tt, i, i + {WIN_K} - 1), ' ')")} AS h
  FROM toks, unnest(generate_series(1, len(tt) - {WIN_K} + 1)) AS u(i)
  WHERE len(tt) >= {WIN_K}
), keyed AS (
  SELECT doc_id, pos,
         h * {1 << _POS_BITS} + ({(1 << _POS_BITS) - 1} - pos) AS k
  FROM grams
), wmins AS (
  SELECT doc_id, pos,
         min(k) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN {WIN_W - 1} PRECEDING
                      AND CURRENT ROW) AS wmin
  FROM keyed
), picked AS (
  SELECT DISTINCT doc_id,
         {(1 << _POS_BITS) - 1} - (wmin % {1 << _POS_BITS}) AS sel_pos,
         wmin // {1 << _POS_BITS} AS sel_h
  FROM wmins WHERE pos >= {WIN_W - 1}
), digests AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_fingerprints,
         md5(string_agg(lpad(CAST(sel_pos AS VARCHAR), 7, '0') || ':'
                        || CAST(sel_h AS VARCHAR), '|'
                        ORDER BY lpad(CAST(sel_pos AS VARCHAR), 7, '0')
                                 || ':' || CAST(sel_h AS VARCHAR)))
           AS fingerprint_md5
  FROM picked GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.tt) - {WIN_K} + 1 AS BIGINT) AS n_grams,
       d.n_fingerprints,
       CAST(d.n_fingerprints * 1000000
            // (len(t.tt) - {WIN_K} + 1) AS BIGINT) AS density_ppm,
       d.fingerprint_md5
FROM toks t JOIN digests d USING (doc_id)
WHERE len(t.tt) >= {WIN_K}
ORDER BY t.doc_id
"""

QUERIES["winnowing_fingerprints"] = winnowing_fingerprints
ORACLES["winnowing_fingerprints"] = WINNOWING_SQL
