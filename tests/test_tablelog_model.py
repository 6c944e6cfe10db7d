"""Model-based randomized testing of the transaction-log table format:
a seeded random walk over {append, overwrite, merge, delete (deletion
vectors), optimize, checkpoint, vacuum} is mirrored against a trivial in-memory model
(version -> set of rows); every committed version's snapshot must
equal the model at every step. The model is obviously correct, so
divergence pins a log-replay bug — the strongest cheap evidence that
commits, copy-on-write, compaction, and checkpoint-seeking replay
compose."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from trace_parquet_spark.sources.tablelog import (
    append,
    delete_where,
    merge_upsert,
    optimize_table,
    overwrite,
    read_table,
    vacuum,
    write_checkpoint,
)


def _snapshot(spark, t, v):
    return {
        (r.k, r.v) for r in read_table(spark, t, as_of=v).collect()
    }


def _df(spark, rows):
    return spark.createDataFrame(list(rows), "k long, v long")


def test_random_op_sequences_match_model(spark, tmp_path):
    rng = random.Random(20260814)
    for trial in range(4):
        t = str(tmp_path / f"m{trial}")
        model: list[set] = []  # model[version] = set of (k, v) rows
        cur: dict[int, int] = {}

        def commit_state():
            model.append({(k, v) for k, v in cur.items()})

        # seed commit
        cur = {k: k * 10 for k in range(rng.randrange(3, 8))}
        append(_df(spark, cur.items()).repartitionByRange(2, "k"), t,
               stats_col="k")
        commit_state()

        for _step in range(5):
            op = rng.choice(
                ["append", "overwrite", "merge", "delete", "optimize",
                 "checkpoint", "vacuum"]
            )
            if op == "append":
                lo = rng.randrange(100, 900)
                new = {k: k for k in range(lo, lo + rng.randrange(1, 5))}
                append(_df(spark, new.items()), t, stats_col="k")
                cur.update(new)
                commit_state()
            elif op == "overwrite":
                base = rng.randrange(0, 50)
                cur = {k: k + 1 for k in range(base, base + 4)}
                overwrite(_df(spark, cur.items()), t, stats_col="k")
                commit_state()
            elif op == "merge":
                keys = list(cur) or [0]
                upd = {rng.choice(keys): rng.randrange(1000),
                       rng.randrange(2000, 3000): 7}
                merge_upsert(spark, t, _df(spark, upd.items()), "k")
                cur.update(upd)
                commit_state()
            elif op == "delete":
                # merge-on-read: drop a random residue class of keys
                m = rng.randrange(2, 5)
                r = rng.randrange(m)
                hit = {k for k in cur if k % m == r}
                if not hit:
                    continue  # nothing to delete this step
                delete_where(spark, t, f"k % {m} = {r}")
                for k in hit:
                    del cur[k]
                commit_state()
            elif op == "optimize":
                optimize_table(spark, t, target_files=2)
                commit_state()  # content unchanged, new version
            elif op == "checkpoint":
                write_checkpoint(t)  # no new version
            else:
                vacuum(t)  # must not affect any snapshot

            # EVERY committed version equals the model
            for v, want in enumerate(model):
                assert _snapshot(spark, t, v) == want, (
                    trial, _step, op, v
                )
