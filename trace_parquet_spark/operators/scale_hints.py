"""Structured scale hints for the exact-anchor queries.

Three registry entries keep data-sized rank windows BY DESIGN — they
are the oracle ground truth whose registered ``*_approx`` twins are
the implemented 100 TB paths (mergeable-histogram cuts, no data-sized
partition). At bench scale the anchors are exact and fast; at 100×
they would silently concentrate a whole window partition on one task.
This module turns that silent cliff into an explicit, testable
operator hint: a ``WindowScaleHint`` warning naming the twin, emitted
when the largest window partition exceeds a row threshold.

The size probe costs nothing in the common case: callers pass either
``known_rows`` (a count the query already collected) or
``table_path`` pointing at the source parquet — the footer row count
(a driver-side pyarrow metadata read, NO Spark job) is an upper bound
on any window partition, so when it is at or under the threshold the
probe is skipped entirely. Only when that upper bound crosses the
threshold does the exact per-key probe run (a map-side-combined
count over the GRAIN relation the window partitions over — never
itself a data-sized partition).

Disable with ``SPARK_GRAFT_SCALE_HINT_ROWS=0`` — read at CALL time,
so it can be set (or unset) mid-session.
"""

from __future__ import annotations

import glob
import os
import warnings

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# default cliff: beyond ~5M rows a single sort partition stops being
# "one task's work" on commodity executors. Module-level DEFAULT only
# (tests may monkeypatch it); the env var is re-read on every call.
SCALE_HINT_ROWS = 5_000_000


class WindowScaleHint(UserWarning):
    """The largest window partition of an exact anchor crossed the
    size threshold; the registered approx twin is the scale path."""


class ChunkSpaceHint(UserWarning):
    """A pigeonhole-blocked join's corpus outgrew its chunk/bucket
    space (candidates grow as d²/space past it — the round-11 30×
    probe measured exactly this on 32-bit SimHash); the registered
    wider-fingerprint twin is the scale path."""


# fire the chunk-space hint once doc count exceeds factor × space;
# at factor 32 the average bucket holds ≥ 32 docs, so candidate
# verification work is ≥ 32× the corpus — past "linear with margin"
CHUNK_HINT_FACTOR = 32


def warn_if_chunk_space_saturated(
    operator: str,
    twin: str,
    *,
    chunk_space: int,
    n_docs: int | None = None,
    table_path: str | None = None,
    factor: int | None = None,
) -> int | None:
    """Emit a ChunkSpaceHint when the corpus is more than ``factor``
    docs per pigeonhole bucket (factor: param >
    SPARK_GRAFT_CHUNK_HINT_FACTOR env, re-read per call >
    CHUNK_HINT_FACTOR default; <= 0 disables). Doc count comes from
    ``n_docs`` or the parquet footer of ``table_path`` (driver-side
    metadata, no Spark job). Returns the doc count used (None when
    skipped)."""
    if n_docs is None and table_path is None:
        raise ValueError(
            "warn_if_chunk_space_saturated needs n_docs or table_path"
        )
    if factor is None:
        env = os.environ.get("SPARK_GRAFT_CHUNK_HINT_FACTOR")
        if env is not None:
            try:
                factor = int(env)
            except ValueError:
                # same loud fallback as _current_limit gives a
                # malformed SPARK_GRAFT_SCALE_HINT_ROWS (round-12
                # advice: consistent operator feedback)
                warnings.warn(
                    f"SPARK_GRAFT_CHUNK_HINT_FACTOR={env!r} is not an "
                    f"int; using default {CHUNK_HINT_FACTOR}",
                    UserWarning,
                    stacklevel=3,
                )
                factor = CHUNK_HINT_FACTOR
        else:
            factor = CHUNK_HINT_FACTOR
    if factor <= 0:
        return None
    if n_docs is None:
        n_docs = parquet_num_rows(table_path)
        if n_docs is None:
            return None
    if n_docs > factor * chunk_space:
        warnings.warn(
            f"{operator}: {n_docs:,} docs over a {chunk_space:,}-value "
            f"chunk space (> {factor}×) — pigeonhole candidates grow "
            f"as d²/space past this point; use the registered twin "
            f"'{twin}' (wider fingerprint, buckets outnumber "
            "documents)",
            ChunkSpaceHint,
            stacklevel=3,
        )
    return n_docs


def _current_limit(threshold: int | None) -> int:
    """Explicit threshold > env var (read now, not at import) >
    module default."""
    if threshold is not None:
        return threshold
    env = os.environ.get("SPARK_GRAFT_SCALE_HINT_ROWS")
    if env is not None:
        try:
            return int(env)
        except ValueError:
            warnings.warn(
                f"SPARK_GRAFT_SCALE_HINT_ROWS={env!r} is not an int; "
                f"using default {SCALE_HINT_ROWS:,}",
                UserWarning,
                stacklevel=3,
            )
    return SCALE_HINT_ROWS


def parquet_num_rows(path: str) -> int | None:
    """Total row count of a parquet file/directory from footer
    metadata only — a driver-side pyarrow read, no Spark job.
    Returns None when the path isn't readable parquet."""
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            files = sorted(
                glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
            )
        else:
            files = [path]
        if not files:
            return None
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        return None


def warn_if_window_heavy(
    operator: str,
    twin: str,
    *,
    df: DataFrame | None = None,
    keys: list[str] | None = None,
    known_rows: int | None = None,
    table_path: str | None = None,
    threshold: int | None = None,
) -> int | None:
    """Emit a WindowScaleHint when the largest window partition
    exceeds the threshold (param > SPARK_GRAFT_SCALE_HINT_ROWS env,
    re-read per call > SCALE_HINT_ROWS default; <= 0 skips the probe
    entirely).

    Sizing sources, cheapest first:
    - ``known_rows``: a count the query already has — zero cost.
    - ``table_path``: parquet footer row count (driver-side metadata,
      no Spark job) as an UPPER bound; at or under the limit the
      probe is skipped without touching Spark. Above it, the exact
      ``df``+``keys`` probe runs (or, for a global window with no
      ``df``, the footer count itself is used — callers must then
      pass the unfiltered grain table).
    - ``df`` + ``keys``: max(count per keys-group), or count(*) for a
      global window (keys=[]).

    Returns the measured size (None when skipped)."""
    if known_rows is None and df is None and table_path is None:
        raise ValueError(
            "warn_if_window_heavy needs a sizing source: pass "
            "known_rows, df (+keys), or table_path"
        )
    limit = _current_limit(threshold)
    if limit <= 0:
        return None
    if known_rows is not None:
        mx = known_rows
    else:
        upper = parquet_num_rows(table_path) if table_path else None
        if upper is not None and upper <= limit:
            # footer bound proves no partition can cross the cliff —
            # skip the Spark probe entirely (the common bench case)
            return None
        if df is not None:
            if keys:
                mx = (
                    df.groupBy(*keys)
                    .agg(F.count("*").alias("n"))
                    .agg(F.max("n"))
                    .first()[0]
                )
            else:
                mx = df.count()
        elif upper is not None:
            mx = upper
        else:
            raise ValueError(
                f"warn_if_window_heavy({operator!r}): table_path "
                f"{table_path!r} is not readable parquet and no df "
                "was given — pass df (+keys) or known_rows"
            )
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
