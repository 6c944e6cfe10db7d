#!/usr/bin/env python
"""Per-entry driver-floor breakdown (round-15 verdict task 5).

For each named registry entry, splits one bench-identical rep into:

- build_s: ``qs[name](spark, sf_dir)`` — py4j plan construction +
  per-transformation analysis + any eager driver-side work the entry
  does while building;
- exec_s: the noop write (optimization + codegen + scheduling + run).

Run twice per entry (rep1/rep2) so the Catalyst/codegen warm-up gap is
visible. Also probes the schema-inference cost of a bare
``spark.read.parquet`` vs a schema-supplied read, since every
load_table call pays it inside build_s.

Usage: python tools/floor_probe.py [--json=OUT] name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("--json="):
            out_path = a.split("=", 1)[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from trace_parquet_spark.session import get_spark

    spark = get_spark(app_name="floor_probe")
    qs = entry_mod.queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()  # JVM warmup

    # schema-inference probe: bare read vs schema-supplied read
    probes = {}
    for tbl in ("lineitem", "documents", "events", "orders"):
        p = f"{sf_dir}/{tbl}.parquet"
        t0 = time.perf_counter()
        df = spark.read.parquet(p)
        bare = time.perf_counter() - t0
        sch = df.schema
        t0 = time.perf_counter()
        spark.read.schema(sch).parquet(p)
        with_schema = time.perf_counter() - t0
        probes[tbl] = {"bare_read_s": round(bare, 4),
                       "schema_read_s": round(with_schema, 4)}

    results = {}
    for name in names:
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            t2 = time.perf_counter()
            reps.append({"build_s": round(t1 - t0, 3),
                         "exec_s": round(t2 - t1, 3)})
        results[name] = reps
        print(name, reps, flush=True)

    out = {"sf_dir": sf_dir, "read_probes": probes, "entries": results}
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)
    print(json.dumps(probes))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
