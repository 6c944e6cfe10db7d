"""KLL-style mergeable quantile sketch (Karnin-Lang-Liberty, FOCS
2016), derandomized, with its acceptance evidence computed IN-ROW.

The missing classic in the sketch family (CMS counts, KMV/HLL
distincts, AGMS join sizes — this adds rank/quantile): a bounded-size
summary whose items at level h each stand for 2^h originals, compacted
by keep-every-other whenever a level overflows. The textbook algorithm
flips a coin for the keep-offset; this implementation always keeps the
EVEN positions of the sorted level, trading the randomized
2-competitive constant for full determinism — required here because
the result must be stable under replay and across engines. The price
is tracked, not assumed: every compaction of a level-h buffer can
shift any value's rank estimate by at most 2^h, so the sketch carries
``err`` = Σ 2^h over performed compactions, and the emitted bound per
quantile adds the top level's weight for the discretization gap. Each
output row then reports |true_rank − target_rank| (computed exactly
with one broadcast-join conditional aggregation over the data) against
that bound — the gate checks the guarantee itself, not just shape.

Scale shape: one pass builds per-partition sketches inside
``mapInPandas`` (Arrow-batched; state ≤ K·levels values per
partition); the combine stage coalesces only SKETCH rows (≤ partitions
× K × levels ≈ thousands) to one task — never the data. The
true-rank evidence is one extra scan with a ~Q-row broadcast join;
production would skip it (it exists to make the entry self-certifying,
the ivf/pq convention for rows-only entries).

Rows-only by design: the compaction cascade has no SQL twin —
the evidence columns are the acceptance gate; determinism, merge
order-invariance (the compaction result depends only on the level
multisets), and the error bound are pinned in tests/test_kll.py.

Reference: no counterpart (single-query export engine); north-star
mergeable-sketch extension alongside operators/sketches.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table

QUERIES: dict = {}
ORACLES: dict = {}

KLL_K = 256  # per-level capacity
#: quantiles reported, in ppm of rank space
KLL_Q_PPM = [10_000, 50_000, 250_000, 500_000, 750_000, 950_000, 990_000]

_SKETCH_SCHEMA = "level int, value long"
_OUT_SCHEMA = (
    "q_ppm long, est_value long, n long, target_rank long, bound long"
)


def _compact(levels: list[np.ndarray], err: int) -> tuple[list[np.ndarray], int]:
    """Cascade keep-even compactions until every level fits K items.
    Deterministic: levels are sorted ascending before halving, evens
    kept. Returns (levels, accumulated rank-error bound)."""
    h = 0
    while h < len(levels):
        if len(levels[h]) > KLL_K:
            buf = np.sort(levels[h])
            # an odd buffer would drift total weight by 2^h on promote;
            # hold the largest item back so Σ(weight) stays exactly n
            hold = buf[-1:] if len(buf) % 2 else buf[:0]
            body = buf[: len(buf) - len(hold)]
            keep_up = body[::2]  # even positions promote one level
            levels[h] = hold  # odd positions are discarded
            if h + 1 == len(levels):
                levels.append(np.empty(0, dtype=np.int64))
            levels[h + 1] = np.concatenate([levels[h + 1], keep_up])
            err += 1 << h
        h += 1
    return levels, err


def _feed(levels: list[np.ndarray], err: int, vals: np.ndarray) -> tuple[list[np.ndarray], int]:
    if not levels:
        levels = [np.empty(0, dtype=np.int64)]
    levels[0] = np.concatenate([levels[0], vals.astype(np.int64)])
    return _compact(levels, err)


def _sketch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    levels: list[np.ndarray] = []
    err = 0
    n = 0
    for pdf in batches:
        v = pdf["value"].to_numpy()
        n += len(v)
        levels, err = _feed(levels, err, v)
    rows = {"level": [], "value": []}
    for h, buf in enumerate(levels):
        rows["level"].extend([h] * len(buf))
        rows["value"].extend(int(x) for x in buf)
    # carrier rows: level -1 holds the partition count, -2 the error
    rows["level"].extend([-1, -2])
    rows["value"].extend([n, err])
    yield pd.DataFrame(rows)


def _merge_and_answer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Single-task combine over sketch rows only: rebuild the level
    multisets (order-invariant), re-run the same compaction cascade,
    then read the requested quantiles off the weighted sorted items."""
    all_rows = pd.concat(list(batches), ignore_index=True)
    n = int(all_rows.loc[all_rows["level"] == -1, "value"].sum())
    err = int(all_rows.loc[all_rows["level"] == -2, "value"].sum())
    items = all_rows[all_rows["level"] >= 0]
    levels: list[np.ndarray] = []
    for h in sorted(items["level"].unique()):
        while len(levels) <= h:
            levels.append(np.empty(0, dtype=np.int64))
        levels[h] = np.sort(
            items.loc[items["level"] == h, "value"].to_numpy(np.int64)
        )
    levels, err = _compact(levels, err)
    vals = np.concatenate(levels) if levels else np.empty(0, dtype=np.int64)
    weights = np.concatenate(
        [np.full(len(buf), 1 << h, dtype=np.int64) for h, buf in enumerate(levels)]
    ) if levels else np.empty(0, dtype=np.int64)
    order = np.argsort(vals, kind="stable")
    vals, weights = vals[order], weights[order]
    cum = np.cumsum(weights)  # est rank of each sketch point (upper)
    top_w = int(weights.max()) if len(weights) else 0
    out = {k: [] for k in ("q_ppm", "est_value", "n", "target_rank", "bound")}
    for q in KLL_Q_PPM:
        target = (q * n) // 1_000_000
        idx = int(np.searchsorted(cum, target, side="left"))
        idx = min(idx, len(vals) - 1)
        out["q_ppm"].append(q)
        out["est_value"].append(int(vals[idx]) if len(vals) else 0)
        out["n"].append(n)
        out["target_rank"].append(int(target))
        out["bound"].append(err + top_w)
    yield pd.DataFrame(out)


def kll_quantile_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles of order totals (cents grid) via the deterministic
    KLL sketch, with the rank-error guarantee checked in-row: for each
    requested quantile, |exact rank of the estimate − target rank|
    must be within the sketch's own tracked bound. Full detail
    (est_value/true_rank/rank_err/bound are sketch-specific) is
    pytest-pinned (tests/test_kll.py incl. a DuckDB rank re-derive);
    the registry entry gates the oracle-derivable subset."""
    orders = load_table(spark, sf_dir, "orders")
    vals = orders.select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("value")
    )
    sketch = vals.mapInPandas(_sketch_partition, _SKETCH_SCHEMA)
    est = sketch.coalesce(1).mapInPandas(_merge_and_answer, _OUT_SCHEMA)
    # exact-rank evidence: one scan, Q-row broadcast join, conditional agg
    ranks = (
        vals.join(F.broadcast(est), F.col("value") <= F.col("est_value"))
        .groupBy("q_ppm", "est_value", "n", "target_rank", "bound")
        .agg(F.count("*").alias("true_rank"))
    )
    return ranks.select(
        "q_ppm",
        "est_value",
        "n",
        "target_rank",
        "true_rank",
        F.abs(F.col("true_rank") - F.col("target_rank")).alias("rank_err"),
        "bound",
        (F.abs(F.col("true_rank") - F.col("target_rank")) <= F.col("bound"))
        .alias("within_bound"),
    ).orderBy("q_ppm")


def kll_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gateable form: the gated columns (quantile targets, n,
    target ranks, within_bound) are exactly what DuckDB re-derives
    from orders plus the guarantee flag. The compaction cascade has no
    SQL twin, so the sketch's estimates stay out of the hash — but if
    the sketch ever violated its own tracked rank-error bound,
    ``within_bound`` flips false and the hash gate catches it
    (round-6 verdict item 1)."""
    return kll_quantile_detail(spark, sf_dir).select(
        "q_ppm",
        "n",
        "target_rank",
        F.col("within_bound").cast("long").alias("within_bound"),
    ).orderBy("q_ppm")


_Q_VALUES = ", ".join(f"({q})" for q in KLL_Q_PPM)
KLL_SQL = f"""
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
q(q_ppm) AS (VALUES {_Q_VALUES})
SELECT CAST(q.q_ppm AS BIGINT) AS q_ppm,
       n.n,
       CAST(q.q_ppm AS BIGINT) * n.n // 1000000 AS target_rank,
       CAST(1 AS BIGINT) AS within_bound
FROM q, n
ORDER BY q_ppm
"""

QUERIES["kll_quantile_sketch"] = kll_quantile_sketch
ORACLES["kll_quantile_sketch"] = KLL_SQL
