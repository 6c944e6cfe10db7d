"""Empirical 10x scale soak (round-11): run the heaviest registry
entries at sf0.1 AND at a builder-generated sf1 (tools/gen_sf.py,
10x sf0.1 = 6M lineitem rows), min-of-3 each, and report the wall
ratio per entry. The structural 100 TB claims (plan-shape pins, the
window audit) cannot see a skewed shuffle key or a candidate blowup
that only manifests with more data — this does.

Pass bar: ratio <= RATIO_BAR (10x data + scheduling margin). Any
entry above it needs a named cause or a documented waiver.

Usage:
  python tools/gen_sf.py /tmp/sf1 --mult 10
  python tools/soak_scale.py --sf1=/tmp/sf1 --out=BENCH_sf1_r11.json
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

RATIO_BAR = 12.0

# the 20 heaviest BENCH_detail entries as of round 10 (plus none
# hand-picked): covers the dedup/cluster family, the tablelog stack,
# codecs, ANN, BPE and graph
HEAVY = [
    "dedup_setsim_prefix",
    "cluster_capped_sample",
    "dedup_canonical_quality",
    "tablelog_change_feed_dv",
    "split_leakage_free",
    "semantic_dedup_clusters",
    "corpus_clean",
    "tablelog_delete_vectors",
    "png_decode_roundtrip",
    "resolve_part_entities",
    "tablelog_stats_hybrid_agg",
    "tablelog_bloom_pruned_read",
    "knn_label_vote_lsh",
    "dedup_minhash_lsh",
    "tablelog_datasource_write_roundtrip",
    "tablelog_clone_totals",
    "tablelog_stream_sink_totals",
    "dedup_incremental_minhash",
    "bpe_train_merges",
    "triangle_count_parts",
]


def _run(spark, qs, names, sf_dir, reps):
    out = {}
    for name in names:
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"  {sf_dir.split('/')[-1]:>6} {name}: {out[name]}s", flush=True)
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # pragma: no cover
            pass
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf01", default="/root/testdata/sf0.1")
    ap.add_argument("--sf1", required=True)
    ap.add_argument("--out", default="BENCH_sf1_r11.json")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", default=None, help="comma-sep entry subset")
    ap.add_argument(
        "--bar",
        type=float,
        default=RATIO_BAR,
        help="ratio bar (default 12 fits a 10x step; pass e.g. 36 for "
        "a 30x step, 120 for 100x)",
    )
    ap.add_argument(
        "--metric",
        default="scale_soak_10x",
        help="metric label recorded in the report",
    )
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry_mod
    from trace_parquet_spark.session import get_spark

    spark = get_spark(app_name="soak_scale")
    spark._jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.window.WindowExec",
        spark._jvm.org.apache.logging.log4j.Level.ERROR,
    )
    qs = entry_mod.queries()
    names = args.only.split(",") if args.only else HEAVY
    missing = [n for n in names if n not in qs]
    if missing:
        raise SystemExit(f"unknown entries: {missing}")
    spark.read.parquet(f"{args.sf01}/region.parquet").count()  # warmup

    t01 = _run(spark, qs, names, args.sf01, args.reps)
    t1 = _run(spark, qs, names, args.sf1, args.reps)
    report = {
        "metric": args.metric,
        "unit": "sec",
        "reps": args.reps,
        "ratio_bar": args.bar,
        "entries": {
            n: {
                "sf0.1": t01[n],
                "sf1": t1[n],
                "ratio": round(t1[n] / t01[n], 2) if t01[n] else None,
            }
            for n in names
        },
    }
    over = {
        n: e["ratio"]
        for n, e in report["entries"].items()
        if e["ratio"] and e["ratio"] > args.bar
    }
    report["over_bar"] = over
    with open(args.out, "w") as fh:
        json.dump(report, fh, indent=1, sort_keys=True)
    print(json.dumps({"over_bar": over, "out": args.out}))


if __name__ == "__main__":
    main()
