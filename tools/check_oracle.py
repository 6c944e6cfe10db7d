#!/usr/bin/env python
"""Self-check harness mirroring the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, then
compares row count, column names, and (order-insensitively) values.
Floats must match exactly after the queries' own rounding — if they
don't, the per-column max abs diff is printed so the rounding can be
tightened.

Usage: python tools/check_oracle.py [query ...] [--sf=DIR]
           [--json=OUT.json]
       python tools/check_oracle.py --verify-coverage=SNAPSHOT.json...

``--verify-coverage`` diffs the LIVE registry against one or more
committed correctness snapshots (the JSON this tool writes with
``--json=``) and exits nonzero when any registry entry lacks a row —
the guard that makes "a query landed after the closing snapshot was
cut" an impossible state instead of a process gap (round-8 verdict,
missing #1). Run it as the LAST gate before a round closes; if it
fails, re-cut the snapshot with the full run.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_df) != len(oracle_df):
        problems.append(f"rowcount spark={len(spark_df)} oracle={len(oracle_df)}")
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        problems.append(f"columns spark={sc} oracle={oc}")
        return problems
    if problems:
        return problems
    s, o = norm_frame(spark_df), norm_frame(oracle_df)
    for c in s.columns:
        a, b = s[c], o[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            an = a.astype(float).to_numpy()
            bn = b.astype(float).to_numpy()
            same = np.array_equal(an, bn, equal_nan=True)
            if not same:
                diff = np.nanmax(np.abs(an - bn)) if len(an) == len(bn) else float("inf")
                problems.append(f"col {c}: float mismatch, max|Δ|={diff:.3g}")
        else:
            if not a.equals(b):
                neq = (a != b) & ~(a.isna() & b.isna())
                idx = neq[neq].index[:3].tolist()
                examples = [(c, i, a[i], b[i]) for i in idx]
                problems.append(f"col {c}: {int(neq.sum())} diffs, e.g. {examples}")
        # dtype drift worth knowing about even when values match
        if a.dtype != b.dtype:
            problems.append(f"col {c}: dtype spark={a.dtype} oracle={b.dtype}")
    return problems


def verify_coverage(snapshot_paths: list[str]) -> int:
    """Exit 0 iff every live registry entry has a (passing) row in
    EVERY given snapshot. No Spark session needed — pure JSON diff."""
    import json

    import __spark_entry__ as entry_mod

    registry = set(entry_mod.queries())
    rc = 0
    for path in snapshot_paths:
        with open(path) as fh:
            snap = json.load(fh)
        missing = sorted(registry - set(snap))
        stale = sorted(set(snap) - registry)
        failing = sorted(
            k
            for k, r in snap.items()
            if k in registry
            and not (r.get("values_match") or r.get("err") == "no_oracle")
        )
        if missing:
            print(f"{path}: MISSING {len(missing)} registry entries:")
            for m in missing:
                print(f"    {m}")
            rc = 1
        if failing:
            print(f"{path}: {len(failing)} entries not green: {failing}")
            rc = 1
        if stale:
            print(
                f"{path}: note: {len(stale)} snapshot rows no longer in "
                f"registry: {stale}"
            )
        if not missing and not failing:
            print(
                f"{path}: covers all {len(registry)} registry entries, "
                "all green"
            )
    return rc


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    json_path = None
    coverage: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a.startswith("--json="):
            json_path = a.split("=", 1)[1]
        elif a.startswith("--verify-coverage="):
            coverage.append(a.split("=", 1)[1])
    if coverage:
        return verify_coverage(coverage + args)

    import __spark_entry__ as entry_mod
    from trace_parquet_spark.session import get_spark

    spark = get_spark(app_name="check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = args or list(qs)
    n_pass = n_fail = n_weak = 0
    record: dict[str, dict] = {}
    for name in names:
        if name not in qs:
            print(f"?? {name}: no such query")
            continue
        rec = {
            "rows_match": None, "schema_match": None, "values_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        record[name] = rec
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(exc).__name__}: {str(exc)[:300]}")
            rec["err"] = f"spark error: {type(exc).__name__}"
            n_fail += 1
            continue
        rec["spark_rows"] = len(sdf)
        if name not in oracles:
            print(f"WEAK {name}: rows-only check, {len(sdf)} rows")
            rec["err"] = "no_oracle"
            n_weak += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {type(exc).__name__}: {str(exc)[:300]}")
            rec["err"] = f"oracle error: {type(exc).__name__}"
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        rec["oracle_rows"] = len(odf)
        rec["rows_match"] = len(sdf) == len(odf)
        rec["schema_match"] = sorted(sdf.columns) == sorted(odf.columns)
        rec["values_match"] = not problems
        if problems:
            print(f"FAIL {name} ({len(sdf)} rows):")
            for p in problems:
                print(f"    {p}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} rows-only")
    if json_path:
        import json

        with open(json_path, "w") as fh:
            json.dump(record, fh, indent=2)
        print(f"wrote {json_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
