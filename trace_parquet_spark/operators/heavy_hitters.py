"""Two-pass heavy hitters: a per-partition Misra-Gries (space-saving)
sketch proposes candidate tokens in bounded memory, then ONE exact
aggregation restricted to the candidates produces the true top-k — the
candidate-propose / exact-verify pattern this repo uses for LSH dedup,
applied to frequency estimation.

Why not plain groupBy+TakeOrdered? That shuffles every distinct token.
At 100 TB the token dictionary is billions of keys; the MG pass keeps
only CAPACITY counters per partition (mergeable, Arrow-batched), so
the shuffle carries <= partitions x CAPACITY rows, and the exact
recount scans the corpus once more but aggregates only the broadcast
candidate set (a semi-join prunes before the shuffle).

Exactness guarantee (tested, and why the DuckDB oracle can be the
plain exact top-k): batched MG truncation to CAPACITY counters
undercounts any token by at most n_p / CAPACITY in partition p, and a
token with global count > N / CAPACITY must exceed n_p / CAPACITY in
at least one partition (pigeonhole), so every such token survives in
some partition's sketch. With CAPACITY >> k (Zipfian text puts the
k-th token's frequency far above N/CAPACITY) the exact top-k is a
subset of the candidates; the recount then yields exactly the plain
top-k. The candidate stage can only ever ADD tokens, never lose a
qualifying one, so the result is deterministic — unlike emitting the
sketch's approximate counts.

Reference: no counterpart (single-query engine); north-star text
infrastructure.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens, tokens_sql
from ..sources.registry import load_table

CAPACITY = 256  # counters per partition sketch
TOPK = 20


def _mg_sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Misra-Gries over a partition's token stream, batched: add each
    Arrow batch's exact value_counts, then if more than CAPACITY
    counters remain subtract the smallest count that leaves CAPACITY
    (the standard batched decrement — every dropped counter absorbs at
    least as much as any survivor lost)."""
    counts: pd.Series = pd.Series(dtype="int64")
    for pdf in batches:
        batch = pdf["token"].value_counts()
        counts = counts.add(batch, fill_value=0).astype("int64")
        if len(counts) > CAPACITY:
            counts = counts.sort_values(ascending=False)
            d = int(counts.iloc[CAPACITY])
            counts = counts.iloc[:CAPACITY] - d
            counts = counts[counts > 0]
    yield pd.DataFrame({"token": counts.index.astype(str)})


def top_tokens_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus-wide top-k tokens via MG candidates + recount."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(tokens("text")).alias("token")
    ).filter(F.col("token") != "")
    candidates = (
        toks.mapInPandas(_mg_sketch, schema="token string")
        .distinct()
    )
    return (
        toks.join(F.broadcast(candidates), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(TOPK)
    )


TOP_TOKENS_SQL = f"""
SELECT token, count(*) AS n
FROM (
  SELECT unnest({tokens_sql("text")}) AS token FROM documents
)
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT {TOPK}
"""


QUERIES = {"top_tokens_exact": top_tokens_exact}
ORACLES = {"top_tokens_exact": TOP_TOKENS_SQL}
