#!/usr/bin/env python
"""Streaming scale probe (round-14, r13 verdict task 3): run the
round-13 streaming oracle entries at sf0.1, 10x (sf1) and 30x (sf3),
recording wall time AND each stateful operator's peak state rows
(windowed_oracle.STATE_PEAKS, fed by run_available_now from the
queries' own progress metrics).

The claim under test: state is WATERMARK-BOUNDED — while input rows
grow 10x/30x, peak state rows must grow with the state's own grain
(band-join buffer = rows inside the join horizon; dedup = keys inside
the 25h watermark; sessions = concurrently-open sessions), NOT with
stream history. Wall time is reps=1 (a streaming run is multi-batch
and self-averaging; the checkpoint I/O dominates rep noise anyway).

Usage:
  python tools/gen_sf.py /tmp/sf3 --mult 30
  python tools/stream_scale_probe.py --sf1=/tmp/sf1 --sf3=/tmp/sf3 \
      --out=BENCH_stream_scale_r14.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

ENTRIES = [
    "stream_window_finalize_totals",
    "stream_band_join_finalize",
    "stream_dedup_day_users",
    "stream_session_close_stateful",
    "stream_static_enrich_totals",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf1", default="/tmp/sf1")
    ap.add_argument("--sf3", default="/tmp/sf3")
    ap.add_argument("--out", default="BENCH_stream_scale_r14.json")
    ap.add_argument(
        "--entries",
        default=None,
        help="comma-separated subset of ENTRIES; merges into --out "
        "instead of overwriting other entries' rows",
    )
    args = ap.parse_args()

    import __spark_entry__ as entry_mod
    from trace_parquet_spark.session import get_spark
    from trace_parquet_spark.streaming import windowed_oracle as wo

    spark = get_spark(app_name="stream-scale-probe")
    qs = entry_mod.queries()
    scales = [
        ("1x", "/root/testdata/sf0.1"),
        ("10x", args.sf1),
        ("30x", args.sf3),
    ]
    entries = ENTRIES
    report: dict[str, dict] = {}
    if args.entries:
        entries = [e.strip() for e in args.entries.split(",") if e.strip()]
        try:
            with open(args.out) as fh:
                report = json.load(fh)
        except FileNotFoundError:
            pass
    for name in entries:
        report[name] = {}
        for label, sf_dir in scales:
            wo.STATE_PEAKS.clear()
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()
            wall = round(time.perf_counter() - t0, 2)
            report[name][label] = {
                "sec": wall,
                "rows": n,
                "state_peaks": dict(wo.STATE_PEAKS),
            }
            print(
                f"{name} @{label}: {wall}s, {n} rows, "
                f"peaks={dict(wo.STATE_PEAKS)}",
                flush=True,
            )
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1)
        fh.write("\n")
    spark.stop()


if __name__ == "__main__":
    main()
