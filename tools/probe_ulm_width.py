#!/usr/bin/env python
"""Unigram-trainer width probe (round-13 VERDICT task 7): measure
what raising ULM_MAX_WORD 8 -> 16 does BEFORE anyone raises the cap.

The Viterbi DP is unrolled into the plan: each EM round builds
O(MAX_WORD × MAX_PIECE) self-joins plus a MAX_WORD-step backtrace.
The synthetic corpus vocabulary is all ≤8-char words, so at
MAX_WORD=16 the extra 8 DP steps and 8 backtrace steps carry EMPTY
frames — any measured delta is PURE unroll overhead (Catalyst
analysis/canonicalization + per-step checkpoint jobs), isolated from
data growth, and the trained model must be IDENTICAL when both
widths complete.

Each width runs in its OWN subprocess (fresh JVM) so heap state from
one width cannot pollute the other's measurement; a width that dies
(OOM, timeout) is recorded as its failure mode — that IS the
finding.

Usage: python tools/probe_ulm_width.py [sf_dir]   (default sf0.001)
       python tools/probe_ulm_width.py --one WIDTH SF_DIR  (internal)
Prints one JSON line; paste the numbers into PERF.md.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def run_one(width: int, sf_dir: str) -> int:
    from trace_parquet_spark.session import get_spark, release_caches
    from trace_parquet_spark.operators import packing

    spark = get_spark(app_name=f"ulm-width-{width}", cpus=8,
                      shuffle_partitions=8)
    packing.ULM_MAX_WORD = width
    walls = []
    rows = []
    for _ in range(2):  # min-of-2: JVM warmup dominates run 1
        t0 = time.perf_counter()
        rows = packing.unigram_lm_train(spark, sf_dir).collect()
        walls.append(round(time.perf_counter() - t0, 2))
        release_caches()
    print(json.dumps({
        "width": width,
        "wall_s": min(walls),
        "walls": walls,
        "model": sorted([r.piece, r.usage, r.cost_micro] for r in rows),
    }))
    return 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        return run_one(int(sys.argv[2]), sys.argv[3])
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    results: dict[str, object] = {}
    models: dict[int, object] = {}
    for width in (8, 16):
        proc = subprocess.run(
            [sys.executable, __file__, "--one", str(width), sf_dir],
            capture_output=True, text=True, timeout=1200,
        )
        line = next(
            (ln for ln in proc.stdout.splitlines() if ln.startswith('{"')),
            None,
        )
        if proc.returncode == 0 and line:
            rec = json.loads(line)
            models[width] = rec["model"]
            results[f"max_word_{width}"] = {
                "wall_s": rec["wall_s"],
                "walls": rec["walls"],
                "model_pieces": len(rec["model"]),
            }
        else:
            err = "unknown"
            for marker in ("OutOfMemoryError", "StackOverflowError",
                           "TimeoutExpired"):
                if marker in proc.stderr:
                    err = marker
                    break
            results[f"max_word_{width}"] = {
                "failed": err, "returncode": proc.returncode,
            }
    if 8 in models and 16 in models:
        results["model_identical_8_vs_16"] = models[8] == models[16]
        results["ratio_16_over_8"] = round(
            results["max_word_16"]["wall_s"]
            / results["max_word_8"]["wall_s"], 2,
        )
    print(json.dumps({"metric": "ulm_width_probe", "sf_dir": sf_dir,
                      **{k: v for k, v in results.items()}}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
