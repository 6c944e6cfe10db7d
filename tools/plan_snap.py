#!/usr/bin/env python
"""Snapshot `.explain("formatted")` for a named subset of registry
entries into plans/r15/<name>_<tag>.txt — the optimization round's
before/after plan evidence (round-14 deliverable).

Usage: python tools/plan_snap.py <tag> name [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as entry_mod
    from trace_parquet_spark.session import get_spark

    spark = get_spark(app_name="plan_snap", cpus=8, shuffle_partitions=8)
    qs = entry_mod.queries()
    os.makedirs("/root/repo/plans/r15", exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = f"/root/repo/plans/r15/{name}_{tag}.txt"
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
