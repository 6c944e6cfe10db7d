"""JDBC source — the reference's actual input (SURVEY §2.1 S1).

The reference reads ``TD_FD_TRACE_PARAM`` from Oracle (R2DBC) with the
predicate fully pushed into the database
(reference: repository/ParameterDataRepository.java:53-78). Spark's
JDBC datasource gives the same pushdown declaratively; for scale we
expose partitioned reads (predicate-ranged parallel scans) instead of
the reference's single reactive cursor.

No JDBC driver jar ships in this test image, so everything here is
plan-construction only; tests exercise it against the parquet fixture
through the same ``scan_trace_param`` signature.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    **options,
) -> DataFrame:
    """Parallel JDBC scan. With partition bounds Spark issues
    ``numPartitions`` range-disjoint queries — the scale path for a
    100 TB-backing table; without, a single-cursor read (reference
    behavior)."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(fetchsize))
        .option("pushDownPredicate", "true")
    )
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 32))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def project_trace_param(df: DataFrame) -> DataFrame:
    """The reference's row-mapper as a projection (SURVEY §2.1 S2):
    4 aliased columns + Number→Long widening
    (reference: repository/ParameterDataRepository.java:29-39)."""
    return df.select(
        F.col("PARAM_INDEX").cast("long").alias("paramIndex"),
        F.col("START_TIME").cast("timestamp").alias("startTime"),
        F.col("END_TIME").cast("timestamp").alias("endTime"),
        F.col("TRACE_DATA").cast("binary").alias("traceData"),
    )


# ---------------------------------------------------------------------------
# Exactly-once streaming sink into an RDBMS (Derby-tested)
# ---------------------------------------------------------------------------

_DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _jdbc_exec(spark: SparkSession, url: str, sql: str) -> None:
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            st.execute(sql)
        finally:
            st.close()
    finally:
        conn.close()


def _derby_shutdown(spark: SparkSession, db_path: str) -> None:
    """Shut a per-scan embedded Derby database down before its
    directory is deleted: without this the booted database's page
    cache and lock bookkeeping stay alive in the driver JVM for the
    life of the session (one leak per bench invocation). Derby
    signals a SUCCESSFUL single-database shutdown by throwing
    SQLException 08006 from the shutdown connection — expected,
    swallowed; anything else is best-effort too (the scratch dir is
    removed regardless)."""
    try:
        spark._jvm.java.sql.DriverManager.getConnection(
            f"jdbc:derby:{db_path};shutdown=true"
        )
    except Exception:  # noqa: BLE001 - 08006 IS the success path
        pass


def _jdbc_scalar(spark: SparkSession, url: str, sql: str):
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        st = conn.createStatement()
        try:
            rs = st.executeQuery(sql)
            try:
                return rs.getLong(1) if rs.next() else None
            finally:
                rs.close()
        finally:
            st.close()
    finally:
        conn.close()


def _bind(ps, params) -> None:
    """Bind positional params: str → setString, int → setLong."""
    for i, p in enumerate(params, start=1):
        if isinstance(p, str):
            ps.setString(i, p)
        else:
            ps.setLong(i, int(p))


def _jdbc_exec_params(spark: SparkSession, url: str, sql: str, params) -> None:
    """Execute with a PreparedStatement and bound parameters — the
    only safe way to carry caller-supplied VALUES (app names, batch
    ids): string interpolation would let a quote in the app name break
    the marker statements and silently defeat the exactly-once
    protocol. Identifiers (table names) cannot be bound in JDBC; they
    are validated against _IDENT_RE instead."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        ps = conn.prepareStatement(sql)
        try:
            _bind(ps, params)
            ps.execute()
        finally:
            ps.close()
    finally:
        conn.close()


def _jdbc_scalar_params(spark: SparkSession, url: str, sql: str, params):
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        ps = conn.prepareStatement(sql)
        try:
            _bind(ps, params)
            rs = ps.executeQuery()
            try:
                return rs.getLong(1) if rs.next() else None
            finally:
                rs.close()
        finally:
            ps.close()
    finally:
        conn.close()


#: Identifier whitelist for names that must be spliced into SQL text
#: (table names — JDBC cannot bind identifiers).
_IDENT_RE = re.compile(r"^[A-Za-z0-9_]+$")
#: App names travel only as bound parameters, so quoting is safe; the
#: charset/length check just keeps them inside the VARCHAR(64) marker
#: column and out of log-forgery territory.
_APP_RE = re.compile(r"^[A-Za-z0-9_.:-]{1,64}$")


def _require_ident(kind: str, value: str) -> str:
    if not _IDENT_RE.match(value or ""):
        raise ValueError(
            f"{kind} {value!r} must match [A-Za-z0-9_]+ — it is spliced "
            "into SQL statements and anything else would corrupt the "
            "exactly-once marker protocol"
        )
    return value


def _require_app(value: str) -> str:
    if not _APP_RE.match(value or ""):
        raise ValueError(
            f"app {value!r} must match [A-Za-z0-9_.:-]{{1,64}} (it is "
            "stored in the VARCHAR(64) marker column)"
        )
    return value


def _ensure_table(spark: SparkSession, url: str, ddl: str) -> None:
    """CREATE TABLE, tolerating Derby's 'already exists' (X0Y32 — the
    engine has no IF NOT EXISTS)."""
    try:
        _jdbc_exec(spark, url, ddl)
    except Exception as e:  # noqa: BLE001 — SQLState probe below
        if "X0Y32" not in str(e):
            raise


def jdbc_sink_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    url: str,
    table: str,
    app: str,
    batch_id: int,
    driver: str = _DERBY_DRIVER,
) -> bool:
    """Exactly-once foreachBatch sink into a plain RDBMS table — the
    tablelog txn-marker protocol translated to SQL: a marker row per
    (app, batch_id) makes replays detectable, and because Spark's
    parallel JDBC append cannot share one transaction with the
    marker, idempotence under a crash BETWEEN data write and marker
    commit comes from delete-then-insert: every attempt first deletes
    any partial rows this batch left behind, rewrites them tagged
    with (app, batch_id), then commits the marker as its own atomic
    statement. Net effect at any crash point: each input row lands
    exactly once. Returns False when the batch was already applied.

    Scale: the data write is Spark's ordinary partitioned JDBC
    append; control statements are three single-row/driver-side SQL
    round-trips per micro-batch (PreparedStatement-bound values; table
    and app names validated against [A-Za-z0-9_]+ at entry because
    identifiers cannot be bound)."""
    _require_ident("table", table)
    _require_app(app)
    _ensure_table(
        spark,
        url,
        f"CREATE TABLE {table}_markers "
        "(app VARCHAR(64) NOT NULL, batch_id BIGINT NOT NULL, "
        f"PRIMARY KEY (app, batch_id))",
    )
    seen = _jdbc_scalar_params(
        spark,
        url,
        f"SELECT count(*) FROM {table}_markers WHERE app = ? AND batch_id = ?",
        (app, batch_id),
    )
    if seen:
        return False
    tagged = batch_df.withColumn("sink_app", F.lit(app)).withColumn(
        "sink_batch_id", F.lit(batch_id).cast("long")
    )
    try:
        _jdbc_exec_params(
            spark,
            url,
            # Spark's JDBC writer creates QUOTED lower-case columns;
            # unquoted names would upper-case and miss them (Derby)
            # Spark's Derby dialect writes StringType as CLOB, which
            # cannot compare to a CHAR literal without a cast
            f'DELETE FROM {table} '
            f'WHERE CAST("sink_app" AS VARCHAR(64)) = ? '
            f'AND "sink_batch_id" = ?',
            (app, batch_id),
        )
        table_exists = True
    except Exception as e:  # noqa: BLE001 — first batch creates the table
        if "42X05" not in str(e):  # Derby: table does not exist
            raise
        table_exists = False
    tagged.write.mode("append" if table_exists else "errorifexists").format(
        "jdbc"
    ).option("url", url).option("dbtable", table).option(
        "driver", driver
    ).save()
    _jdbc_exec_params(
        spark,
        url,
        f"INSERT INTO {table}_markers VALUES (?, ?)",
        (app, batch_id),
    )
    return True


def run_jdbc_stream(
    spark: SparkSession,
    source_dir: str,
    source_schema: str,
    url: str,
    table: str,
    checkpoint_dir: str,
    app: str = "jdbc-stream",
    max_files_per_trigger: int = 1,
):
    """Stream a parquet-file source into an RDBMS table with
    end-to-end exactly-once semantics (offsets in the checkpoint,
    idempotence in the marker protocol)."""
    stream = (
        spark.readStream.schema(source_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        jdbc_sink_batch(spark, batch_df, url, table, app, batch_id)

    return (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def jdbc_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the PARTITIONED JDBC read path under the oracle gate: a
    customer slice is seeded into an embedded-Derby table (the
    reference's DataInitializer shape), read back through Spark's
    JDBC source with partitionColumn/numPartitions=4 — Spark issues
    four range-disjoint queries in parallel, the 100 TB ingest shape
    (the reference reads its trace table through one reactive cursor,
    repository/ParameterDataRepository.java:53-78) — and aggregated
    per market segment. The oracle recomputes from the parquet
    directly: agreement proves the ranged parallel scan surfaces
    exactly the seeded rows, with no boundary row lost or doubled
    across partition ranges (the classic off-by-one in hand-rolled
    range splits)."""
    import shutil
    import tempfile

    from .registry import load_table

    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 == 3)
        .select(
            F.col("c_custkey").alias("C_CUSTKEY"),
            F.col("c_mktsegment").alias("C_MKTSEGMENT"),
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
            .cast("long")
            .alias("CENTS"),
        )
    )
    d = tempfile.mkdtemp(prefix="jdbc_derby_")
    url = f"jdbc:derby:{d}/db;create=true"
    try:
        (
            cust.write.format("jdbc")
            .option("url", url)
            .option("dbtable", "CUSTOMER_SLICE")
            .option("driver", _DERBY_DRIVER)
            .mode("overwrite")
            .save()
        )
        hi = cust.agg(F.max("C_CUSTKEY")).first()[0] or 1
        out = (
            read_jdbc(
                spark,
                url,
                "CUSTOMER_SLICE",
                partition_column="C_CUSTKEY",
                lower_bound=0,
                upper_bound=int(hi) + 1,
                num_partitions=4,
                driver=_DERBY_DRIVER,
            )
            .groupBy(F.col("C_MKTSEGMENT").alias("segment"))
            .agg(
                F.count("*").cast("long").alias("n_cust"),
                F.sum("CENTS").cast("long").alias("total_cents"),
            )
            .orderBy("segment")
        )
        rows = out.collect()
    finally:
        _derby_shutdown(spark, f"{d}/db")
        shutil.rmtree(d, ignore_errors=True)
    return spark.createDataFrame(
        rows, "segment string, n_cust long, total_cents long"
    ).orderBy("segment")


JDBC_PARTITIONED_SQL = """
SELECT c_mktsegment AS segment,
       count(*) AS n_cust,
       CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM customer
WHERE c_custkey % 10 = 3
GROUP BY 1
ORDER BY segment
"""

QUERIES = {"jdbc_partitioned_scan": jdbc_partitioned_scan}
ORACLES = {"jdbc_partitioned_scan": JDBC_PARTITIONED_SQL}
