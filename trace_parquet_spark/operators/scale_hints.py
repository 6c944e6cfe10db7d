"""Structured scale hints for the exact-anchor queries.

Three registry entries keep data-sized rank windows BY DESIGN — they
are the oracle ground truth whose registered ``*_approx`` twins are
the implemented 100 TB paths (mergeable-histogram cuts, no data-sized
partition). At bench scale the anchors are exact and fast; at 100×
they would silently concentrate a whole window partition on one task.
This module turns that silent cliff into an explicit, testable
operator hint: a ``WindowScaleHint`` warning naming the twin, emitted
when the largest window partition exceeds a row threshold.

The size probe is deliberately cheap: callers pass the GRAIN relation
the window partitions over (docs per language, orders globally, users
globally), so the probe is a map-side-combined count — never itself a
data-sized partition — or a count the query already collected.
Disable with ``SPARK_GRAFT_SCALE_HINT_ROWS=0``.
"""

from __future__ import annotations

import os
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# default cliff: beyond ~5M rows a single sort partition stops being
# "one task's work" on commodity executors
SCALE_HINT_ROWS = int(
    os.environ.get("SPARK_GRAFT_SCALE_HINT_ROWS", str(5_000_000))
)


class WindowScaleHint(UserWarning):
    """The largest window partition of an exact anchor crossed the
    size threshold; the registered approx twin is the scale path."""


def warn_if_window_heavy(
    operator: str,
    twin: str,
    *,
    df: DataFrame | None = None,
    keys: list[str] | None = None,
    known_rows: int | None = None,
    threshold: int | None = None,
) -> int | None:
    """Emit a WindowScaleHint when the largest window partition
    exceeds ``threshold`` rows (default SCALE_HINT_ROWS; <= 0 skips
    the probe entirely).

    Either pass ``known_rows`` (a count the query already has — zero
    extra cost) or ``df`` + ``keys``: the probe computes
    max(count per keys-group), or count(*) for a global window
    (keys=[]). Returns the measured size (None when skipped)."""
    limit = SCALE_HINT_ROWS if threshold is None else threshold
    if limit <= 0:
        return None
    if known_rows is not None:
        mx = known_rows
    elif keys:
        mx = (
            df.groupBy(*keys)
            .agg(F.count("*").alias("n"))
            .agg(F.max("n"))
            .first()[0]
        )
    else:
        mx = df.count()
    if mx and mx > limit:
        warnings.warn(
            f"{operator}: largest window partition holds {mx:,} rows "
            f"(> {limit:,}); the exact rank window puts them on ONE "
            f"task at scale — use the registered twin '{twin}' "
            "(mergeable-histogram cut, no data-sized partition)",
            WindowScaleHint,
            stacklevel=3,
        )
    return mx
