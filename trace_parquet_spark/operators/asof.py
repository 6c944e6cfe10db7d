"""As-of (backward) join — an operator Spark lacks natively.

Implemented the scale-correct way: instead of the naive inequality
join (which explodes to |L|×|R| per key before filtering), tag both
inputs, UNION them, and take a running ``last(right, ignorenulls)``
over a single per-key time sort. Cost is one shuffle + one sort over
|L|+|R| rows — the same shape as a sort-merge join, no quadratic
blowup, skew handled by AQE. (The classic alternative per group is
``applyInPandas`` + ``pd.merge_asof``; the union-window form keeps
everything JVM-side.)

Semantics: for each left row, the latest right row with
``right.ts <= left.ts``. At equal timestamps the right row is visible
to the left row (rights sort before lefts); among equal-ts right rows
the one with the largest ``tiebreak`` value wins — deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
    inner: bool = True,
) -> DataFrame:
    """Carry ``right_cols`` (aliased ``asof_<col>``) from the matched
    right row onto each left row. ``inner`` drops left rows with no
    prior right row (else the carried columns are null)."""
    lcols = [c for c in left.columns]
    ltypes = dict(left.dtypes)
    rtypes = dict(right.dtypes)
    data_cols = [c for c in lcols if c != by]

    l_side = left.select(
        F.col(by),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        (F.lit(None).cast(rtypes[tiebreak]) if tiebreak else F.lit(None).cast("long")).alias("__tb"),
        *[F.col(c) for c in data_cols],
        *[F.lit(None).cast(rtypes[c]).alias(f"__r_{c}") for c in right_cols],
    )
    r_side = right.select(
        F.col(by),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        (F.col(tiebreak) if tiebreak else F.lit(None).cast("long")).alias("__tb"),
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in data_cols],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )

    w = (
        Window.partitionBy(by)
        .orderBy("__t", "__is_left", "__tb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_side.unionByName(r_side)
    for c in right_cols:
        merged = merged.withColumn(
            f"asof_{c}", F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
        )
    out = merged.filter(F.col("__is_left") == 1).select(
        F.col(by),
        *[F.col(c) for c in data_cols],
        *[F.col(f"asof_{c}") for c in right_cols],
    )
    if inner:
        out = out.filter(F.col(f"asof_{right_cols[0]}").isNotNull())
    return out
