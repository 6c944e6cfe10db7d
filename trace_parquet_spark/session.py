"""SparkSession construction tuned for both local testing and scale.

Local mode is a single JVM (``local[N]``); on a real cluster the same
conf holds except memory sizing. Scale-relevant choices:

- AQE on (runtime coalesce, skew-join splitting) — at 100 TB the static
  shuffle-partition count is always wrong for some stage; AQE fixes it.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a cluster
  this should be ~2-3× total executor cores (AQE coalesces down).
- Arrow enabled — every pandas UDF (gzip codec, multimodal decode)
  moves data in vectorized Arrow batches, not pickled rows.
- Session timezone pinned UTC: the reference interprets zoneless
  ``LocalDateTime`` in the JVM default TZ (SURVEY §1.3); pinning UTC
  makes timestamp semantics deterministic and DuckDB-comparable.
- ``TIMESTAMP_MILLIS`` parquet output to match the reference's
  physical type (reference: ParameterRecord.avsc timestamp-millis).
- ``nanosAsLong`` so parquet TIMESTAMP(NANOS) inputs (events table)
  are readable; the registry converts to timestamp_ntz.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "trace-parquet-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession."""
    cpus = cpus or default_parallelism()
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Spark's 1g default heap OOMs on the heaviest sf0.1 checks
    # (32 executor threads share the driver JVM in local mode, and a
    # multi-distinct Expand spill at sf0.1 killed the round-7 gate
    # under the bare default). Size it for the box: explicit arg >
    # SPARK_GRAFT_DRIVER_MEM env > a quarter of physical RAM capped at
    # 24g (plenty for sf0.1; the cap keeps CI boxes honest).
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if not driver_memory:
        try:
            with open("/proc/meminfo") as fh:
                kb = int(fh.readline().split()[1])  # MemTotal
            driver_memory = f"{max(4, min(24, kb // (4 * 1024 * 1024)))}g"
        except OSError:
            driver_memory = "8g"
    builder = builder.config("spark.driver.memory", driver_memory)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# ---------------------------------------------------------------- cache
# Query builders return UNEXECUTED DataFrames, so no builder can
# unpersist-after-action itself. Instead every intra-query cache goes
# through track_cache(), and harnesses call release_caches() after the
# action (check_oracle, bench) — plus __spark_entry__ releases the
# previous query's caches when the NEXT query is built, which bounds
# storage accumulation to one query in any sequential harness,
# including the driver's. Contract tiers: releasing a TRACKED cache
# before its un-collected plan runs is still correct (the unpersisted
# relation recomputes from lineage); the localCheckpoint sweep below
# is stricter — a checkpointed RDD cannot recompute after unpersist
# (lineage is truncated), so release_caches must only run BETWEEN
# queries (after the previous result was collected). Every harness in
# this repo is sequential in exactly that way: check_oracle and bench
# release after the action, __spark_entry__ releases when the NEXT
# query is built.

_TRACKED_CACHES: list = []


def track_cache(df):
    """``df.cache()`` + register for ``release_caches()``."""
    df.cache()
    _TRACKED_CACHES.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked cache; returns how many were released.

    Also sweeps localCheckpoint residue: the iterative operators
    (label propagation, k-core peel) truncate per-round lineage with
    localCheckpoint, which persists RDDs OUTSIDE the CacheManager and
    outside _TRACKED_CACHES; between queries those are dead weight
    whose eviction otherwise waits on Python GC + ContextCleaner.
    release_caches is a between-queries harness call by contract
    (see the cache-contract comment above — a swept checkpoint RDD
    cannot recompute, so never call this with an un-collected
    checkpoint-bearing plan in flight), so any persistent RDD still
    registered at that point is intra-query residue, safe to drop."""
    n = 0
    while _TRACKED_CACHES:
        df = _TRACKED_CACHES.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:  # session already gone — nothing to release
            pass
    try:
        spark = SparkSession.getActiveSession()
        if spark is not None:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            for jrdd in list(jmap.values()):
                jrdd.unpersist()
                n += 1
    except Exception:  # context shutting down — nothing to sweep
        pass
    return n


def ensure_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine conf to a session we did not build.

    The driver harness hands us its own SparkSession; these conf keys
    are all runtime-settable and required for deterministic semantics.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:  # pragma: no cover - conf may be static in some builds
        pass
    return spark
