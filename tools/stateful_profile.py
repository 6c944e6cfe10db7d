#!/usr/bin/env python
"""Per-component cost split of stream_session_close_stateful (round-15
verdict task 7): capture every micro-batch's durationMs breakdown
(addBatch / getBatch / walCommit / queryPlanning / triggerExecution /
commitOffsets) across both availableNow runs, plus the wall time of the
fixture build and the gate materialization around them.

Usage: python tools/stateful_profile.py [--sf=DIR]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf_dir = "/root/testdata/sf0.1"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]

    from trace_parquet_spark.session import get_spark, release_caches
    from trace_parquet_spark.streaming import stateful_oracle, windowed_oracle

    progress: list[dict] = []
    marks: list[tuple[str, float]] = []
    real_run = windowed_oracle.run_available_now

    def probed_run(start, name):
        t0 = time.perf_counter()
        q = start()
        ok = q.awaitTermination(180)
        wall = time.perf_counter() - t0
        for p in q.recentProgress:
            progress.append(
                {
                    "batchId": p.get("batchId"),
                    "numInputRows": p.get("numInputRows"),
                    "durationMs": p.get("durationMs"),
                    "wall_run_s": round(wall, 3),
                }
            )
        if not ok:
            q.stop()
            raise RuntimeError("timeout")

    # the entry imports run_available_now by name at module load — patch
    # the reference it actually calls
    stateful_oracle.run_available_now = probed_run

    real_split = stateful_oracle.split_time_ordered

    def probed_split(ev, src):
        t0 = time.perf_counter()
        n = real_split(ev, src)
        marks.append(("split_time_ordered_s", round(time.perf_counter() - t0, 3)))
        return n

    stateful_oracle.split_time_ordered = probed_split

    spark = get_spark(app_name="stateful_profile")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    t0 = time.perf_counter()
    df = stateful_oracle.stream_session_close_stateful(spark, sf_dir)
    t1 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    t2 = time.perf_counter()
    release_caches()

    out = {
        "total_build_s": round(t1 - t0, 3),
        "exec_s": round(t2 - t1, 3),
        "marks": marks,
        "batches": progress,
    }
    print(json.dumps(out, indent=1))
    # restore and re-run ONCE more for a warm number
    stateful_oracle.run_available_now = probed_run
    progress.clear()
    marks.clear()
    t0 = time.perf_counter()
    df = stateful_oracle.stream_session_close_stateful(spark, sf_dir)
    df.write.mode("overwrite").format("noop").save()
    print(json.dumps({"warm_total_s": round(time.perf_counter() - t0, 3),
                      "marks": marks,
                      "batches": progress}, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
