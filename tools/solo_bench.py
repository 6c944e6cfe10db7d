#!/usr/bin/env python
"""Solo fresh-JVM min-of-N timing for named registry entries — the
round-14 adjudication protocol (PERF.md): cross-round absolute deltas
at the 1-3 s scale carry up to ~2x box-state noise inside a 175-query
run, so before/after evidence for a touched entry is measured SOLO in
a fresh JVM with bench.py's exact methodology (noop sink, min-of-N,
between-rep GC) at the bench scale factor.

Usage: python tools/solo_bench.py [--n=3] name [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 3
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=", 1)[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry_mod
    from trace_parquet_spark.session import get_spark

    spark = get_spark(app_name="solo_bench")
    qs = entry_mod.queries()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    out: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # pragma: no cover - py4j hiccup
            pass
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
