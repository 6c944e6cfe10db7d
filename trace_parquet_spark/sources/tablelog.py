"""Minimal transaction-log table format over parquet — the lakehouse
mechanism (Delta/Iceberg's public design) in pure Python, for an
environment whose Spark image carries no table-format jars.

A table is a directory of immutable parquet data files plus a
``_log/`` of JSON commit files named ``{version:020d}.json``. Each
commit lists ``add`` and ``remove`` file actions; the live snapshot at
version V is (all adds ≤ V) − (all removes ≤ V). That single idea buys
the lakehouse guarantees:

- **Atomic commits**: readers only see files referenced from a
  committed log entry; a writer that dies mid-write leaves orphan
  parquet files but no log entry — invisible, vacuumable.
- **Optimistic concurrency**: the commit is an O_CREAT|O_EXCL create
  of the next version file; two writers racing the same version —
  one wins, the loser gets ``ConcurrentWriteError`` and must rebase
  (exactly Delta's protocol, with the filesystem's atomic
  create-exclusive standing in for the object-store conditional put).
- **Time travel**: reading at version V replays the log only to V.
- **Schema-on-log**: each commit records the writer's schema string;
  readers use the newest schema ≤ V (additive evolution reads old
  files with nulls via Spark's mergeSchema-free schema application).

Scale: the log is O(commits) tiny JSON; data files are never listed
(no directory scan — the log IS the manifest, which is precisely why
this design beats Hive-style listing at 100 TB: planning reads KBs of
log instead of listing millions of objects).

Reference: no counterpart (single-query export engine); north-star
storage extension. Public design: Delta Lake transaction-log paper
(Armbrust et al., VLDB 2020).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentWriteError(RuntimeError):
    """Another writer committed this version first — rebase and retry."""


def _log_dir(table: str) -> str:
    return os.path.join(table, "_log")


def _versions(table: str) -> list[int]:
    d = _log_dir(table)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f[:-5]) for f in os.listdir(d) if f.endswith(".json")
    )


def latest_version(table: str) -> int | None:
    vs = _versions(table)
    return vs[-1] if vs else None


def _read_log(table: str, as_of: int | None) -> tuple[list[str], str]:
    """Replay commits ≤ as_of → (live files, newest schema DDL)."""
    vs = _versions(table)
    if as_of is not None:
        vs = [v for v in vs if v <= as_of]
        if not vs:
            raise ValueError(f"no committed version <= {as_of}")
    elif not vs:
        raise ValueError(f"{table} has no committed versions")
    live: set[str] = set()
    schema = ""
    for v in vs:
        with open(os.path.join(_log_dir(table), f"{v:020d}.json")) as fh:
            commit = json.load(fh)
        live |= {a for a in commit.get("add", [])}
        live -= {r for r in commit.get("remove", [])}
        schema = commit.get("schema") or schema
    return sorted(live), schema


def _commit(table: str, version: int, actions: dict) -> None:
    """Publish one commit atomically; lose the race → raise."""
    os.makedirs(_log_dir(table), exist_ok=True)
    path = os.path.join(_log_dir(table), f"{version:020d}.json")
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    except FileExistsError:
        raise ConcurrentWriteError(
            f"version {version} of {table} was committed concurrently"
        ) from None
    with os.fdopen(fd, "w") as fh:
        json.dump(actions, fh)


def _stage_files(df: DataFrame, table: str) -> list[str]:
    """Write the data invisibly (no log entry yet): a unique staging
    subdir per write, then the commit references the parquet parts by
    relative path. Files are immutable once written."""
    stage = f"data-{uuid.uuid4().hex}"
    df.write.mode("overwrite").parquet(os.path.join(table, stage))
    return [
        os.path.join(stage, f)
        for f in os.listdir(os.path.join(table, stage))
        if f.startswith("part-") and f.endswith(".parquet")
    ]


def append(df: DataFrame, table: str) -> int:
    """Atomic append: new files + a commit adding them. Returns the
    committed version; raises ConcurrentWriteError on a lost race
    (the staged files stay orphaned and invisible — vacuum sweeps
    them)."""
    files = _stage_files(df, table)
    lv = latest_version(table)
    version = 0 if lv is None else lv + 1
    _commit(
        table,
        version,
        {"add": files, "remove": [], "schema": df.schema.json()},
    )
    return version


def overwrite(df: DataFrame, table: str) -> int:
    """Atomic whole-table replace: one commit that removes every live
    file and adds the new ones — readers see the old or the new
    snapshot, never a mix."""
    files = _stage_files(df, table)
    old = _read_log(table, None)[0] if _versions(table) else []
    lv = latest_version(table)
    version = 0 if lv is None else lv + 1
    _commit(
        table,
        version,
        {"add": files, "remove": old, "schema": df.schema.json()},
    )
    return version


def read_table(
    spark: SparkSession, table: str, as_of: int | None = None
) -> DataFrame:
    """Snapshot read, optionally time-traveled to ``as_of``. Plans
    from the log's file list — no directory listing — and applies the
    snapshot's schema so additively-evolved tables read old files
    with nulls in the new columns."""
    files, schema_json = _read_log(table, as_of)
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(schema_json))
    paths = [os.path.join(table, f) for f in files]
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)


def vacuum(table: str) -> list[str]:
    """Delete data files no commit references (failed writers' orphans
    and overwritten files). Never touches files live at ANY version
    still in the log — time travel keeps working."""
    referenced: set[str] = set()
    for v in _versions(table):
        with open(os.path.join(_log_dir(table), f"{v:020d}.json")) as fh:
            commit = json.load(fh)
        referenced |= set(commit.get("add", []))
    doomed = []
    for root, _dirs, names in os.walk(table):
        if os.path.basename(root) == "_log":
            continue
        for n in names:
            full = os.path.join(root, n)
            rel = os.path.relpath(full, table)
            if rel.startswith("_log"):
                continue
            if n.startswith("part-") and n.endswith(".parquet"):
                if rel not in referenced:
                    doomed.append(rel)
                    os.remove(full)
    return sorted(doomed)


# --------------------------------------------------------------------------
# driver-gated query
# --------------------------------------------------------------------------


def tablelog_time_travel_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the table format end-to-end under the oracle gate: build
    a logged table from orders in three commits (v0 = keys ≡ 0 mod 3,
    v1 appends ≡ 1, v2 overwrites with ≡ 2), then aggregate each
    version through time-traveled snapshot reads. The oracle computes
    the same three aggregates straight from orders — agreement proves
    append/overwrite/as-of semantics, not just that the plumbing ran.
    The result is three scalar rows, so the collect here is a K-row
    metadata pull (same class as the IVF centroid pulls), and the
    scratch table is removed before returning."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .registry import load_table

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    t = tempfile.mkdtemp(prefix="tablelog_q_")
    try:
        append(orders.filter(F.col("o_orderkey") % 3 == 0), t)
        append(orders.filter(F.col("o_orderkey") % 3 == 1), t)
        overwrite(orders.filter(F.col("o_orderkey") % 3 == 2), t)
        rows = []
        for v in (0, 1, 2):
            agg = (
                read_table(spark, t, as_of=v)
                .agg(
                    F.count("*").cast("long").alias("n"),
                    F.sum("cents").cast("long").alias("c"),
                )
                .collect()[0]
            )
            rows.append((v, agg.n, agg.c))
    finally:
        shutil.rmtree(t, ignore_errors=True)
    return spark.createDataFrame(
        rows, "version int, n_orders long, total_cents long"
    ).orderBy("version")


TABLELOG_SQL = """
WITH o AS (
  SELECT o_orderkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
)
SELECT 0 AS version, count(*) AS n_orders, CAST(sum(cents) AS BIGINT) AS total_cents
FROM o WHERE o_orderkey % 3 = 0
UNION ALL
SELECT 1, count(*), CAST(sum(cents) AS BIGINT) FROM o WHERE o_orderkey % 3 IN (0, 1)
UNION ALL
SELECT 2, count(*), CAST(sum(cents) AS BIGINT) FROM o WHERE o_orderkey % 3 = 2
ORDER BY version
"""

QUERIES = {"tablelog_time_travel_totals": tablelog_time_travel_totals}
ORACLES = {"tablelog_time_travel_totals": TABLELOG_SQL}
