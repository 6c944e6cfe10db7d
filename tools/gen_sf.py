"""Builder-owned synthetic data generator for scale soaks.

Produces the same ten-table star schema as /root/testdata (TESTDATA.md)
at an arbitrary multiple of sf0.1's row counts, with matching value
distributions (segments, priorities, flag mixes, the 31-word document
vocabulary, 64-d 10-cluster embeddings, ~0.2% exact-dup and ~2%
near-dup documents). Deterministic (numpy PCG64, fixed seed). Writes
parquet via pyarrow to a scratch dir — NEVER into /root/testdata.

Usage: python tools/gen_sf.py /path/to/out --mult 10 [--seed 7]
(mult 10 over sf0.1 == "sf1": 6M lineitem rows)
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
SEGMENTS = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]
ADJ = ["large", "hot", "blue", "old", "cold", "dim", "new", "red"]
NOUN = ["ring", "bolt", "plate", "gear", "cog", "pin", "rod", "cap"]
PTYPES = ["LARGE", "ECONOMY", "SMALL", "STANDARD", "PROMO"]

DAY_US = 86_400_000_000  # microseconds


def _ts_array(base_us: int, offsets_us) -> pa.Array:
    return pa.array(
        (base_us + offsets_us).astype("int64"), pa.timestamp("us")
    )


# Zipf document-vocabulary mode (round-12, VERDICT task 2): the
# uniform 31-word vocabulary makes every shingle's document frequency
# grow linearly with corpus size — the exact distribution that pushes
# Σ df² dedup verification superlinear while staying under the df-cap.
# Real crawls are Zipfian: a fat head of stopword-like shingles (which
# the df-cap truncates) and a long tail of rare shingles (whose df
# stays O(1) as the corpus grows). --zipf draws tokens from a
# ZIPF_V-word vocabulary with p(k) ∝ 1/k^ZIPF_S, the distribution the
# round-11 containment waiver invokes.
ZIPF_V = 30_000
ZIPF_S = 1.1


def _zipf_probs(v: int = ZIPF_V, s: float = ZIPF_S) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, v + 1, dtype="float64"), s)
    return p / p.sum()


def _alpha_word(k: int) -> str:
    """Rank k -> deterministic ALPHABETIC word (base-26 over a..z,
    ranks <26 padded to length 2 with a leading 'a' — collision-free
    because a natural base-26 encoding never has a leading 'a' digit).
    The w<digits> zipf tokens are invisible to every [a-z]+-tokenizing
    operator (BPE/WordPiece/unigram trainers see an EMPTY vocabulary —
    CORRECTNESS_zipf_r14 pass vacuously); --alpha gives the tokenizer
    family a real fat-head corpus with shared prefixes/suffixes."""
    s = []
    while True:
        s.append(chr(97 + k % 26))
        k //= 26
        if k == 0:
            break
    word = "".join(reversed(s))
    return word if len(word) >= 2 else "a" + word


def generate(
    out: str, mult: float, seed: int = 7, zipf: bool = False,
    alpha: bool = False,
) -> None:
    rng = np.random.default_rng(seed)
    os.makedirs(out, exist_ok=True)

    def w(name: str, **cols) -> None:
        pq.write_table(pa.table(cols), os.path.join(out, f"{name}.parquet"))

    n_cust = int(15_000 * mult)
    n_supp = int(1_000 * mult)
    n_part = int(20_000 * mult)
    n_ord = int(150_000 * mult)
    n_ev = int(100_000 * mult)
    n_doc = int(5_000 * mult)
    n_emb = int(2_000 * mult)
    n_users = int(1_500 * mult)

    w(
        "region",
        r_regionkey=pa.array(range(5), pa.int32()),
        r_name=["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    )
    w(
        "nation",
        n_nationkey=pa.array(range(25), pa.int32()),
        n_name=[f"NATION{i:02d}" for i in range(25)],
        n_regionkey=pa.array([i % 5 for i in range(25)], pa.int32()),
    )
    w(
        "customer",
        c_custkey=pa.array(np.arange(n_cust), pa.int64()),
        c_name=[f"Customer#{i:09d}" for i in range(n_cust)],
        c_nationkey=pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        c_acctbal=np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        c_mktsegment=pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
        ),
    )
    w(
        "supplier",
        s_suppkey=pa.array(np.arange(n_supp), pa.int64()),
        s_name=[f"Supplier#{i:09d}" for i in range(n_supp)],
        s_nationkey=pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        s_acctbal=np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    )
    w(
        "part",
        p_partkey=pa.array(np.arange(n_part), pa.int64()),
        p_name=[
            f"{ADJ[i % len(ADJ)]} {NOUN[(i // len(ADJ)) % len(NOUN)]}"
            for i in range(n_part)
        ],
        p_brand=[f"Brand#{1 + i % 25}" for i in range(n_part)],
        p_type=pa.array(np.array(PTYPES)[rng.integers(0, 5, n_part)]),
        p_size=pa.array(rng.integers(1, 51, n_part), pa.int32()),
        p_retailprice=np.round(900.0 + 0.1 * np.arange(n_part), 2),
    )

    base95 = np.datetime64("1995-01-01", "us").astype("int64")
    odate_us = rng.integers(0, 2404, n_ord) * DAY_US
    w(
        "orders",
        o_orderkey=pa.array(np.arange(n_ord), pa.int64()),
        o_custkey=pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        o_orderstatus=pa.array(
            np.array(["O", "P", "F"])[rng.integers(0, 3, n_ord)]
        ),
        o_totalprice=np.round(rng.uniform(1000.0, 500_000.0, n_ord), 2),
        o_orderdate=_ts_array(base95, odate_us),
        o_orderpriority=pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
        ),
    )

    lines = rng.integers(1, 8, n_ord)  # avg ~4 lines/order
    okeys = np.repeat(np.arange(n_ord), lines)
    n_li = len(okeys)
    qty = rng.integers(1, 51, n_li).astype("float64")
    price = np.round(900.0 + rng.uniform(0, 2000.0, n_li), 2)
    w(
        "lineitem",
        l_orderkey=pa.array(okeys, pa.int64()),
        l_partkey=pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        l_suppkey=pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        l_linenumber=pa.array(
            np.concatenate([np.arange(1, k + 1) for k in lines]),
            pa.int32(),
        ),
        l_quantity=qty,
        l_extendedprice=np.round(qty * price, 2),
        l_discount=np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        l_tax=np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        l_returnflag=pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
        ),
        l_linestatus=pa.array(
            np.array(["O", "F"])[rng.integers(0, 2, n_li)]
        ),
        l_shipdate=_ts_array(
            base95,
            np.repeat(odate_us, lines)
            + rng.integers(1, 95, n_li) * DAY_US,
        ),
    )

    base24 = np.datetime64("2024-01-01", "us").astype("int64")
    w(
        "events",
        event_id=pa.array(np.arange(n_ev), pa.int64()),
        ts=_ts_array(
            base24, np.sort(rng.integers(0, 30 * DAY_US, n_ev))
        ),
        user_id=pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        event_type=pa.array(np.array(ETYPES)[rng.integers(0, 5, n_ev)]),
        value=np.round(rng.gamma(2.0, 25.0, n_ev), 2),  # 2dp: the
        # fixture contract (TESTDATA events.value is exact cents); the
        # r13 sf1 batch caught 4dp here splitting engines on round(x,2)
        # halfway cases before the money_sum hardening
        props=[f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)],
    )

    # documents: vocab sentences; ~0.2% exact dups of earlier docs and
    # ~2% near dups (two tokens swapped) so the dedup family sees the
    # same candidate shape as the driver fixtures
    if zipf:
        if alpha:
            vocab = np.array([_alpha_word(k) for k in range(ZIPF_V)])
        else:
            vocab = np.array([f"w{k}" for k in range(ZIPF_V)])
        zp = _zipf_probs()
        # buffered draws: one vectorized choice() per ~1M tokens
        # instead of one 30k-cdf setup per document
        _buf = {"a": vocab[rng.choice(ZIPF_V, 1_000_000, p=zp)], "i": 0}

        def draw(n: int) -> np.ndarray:
            if _buf["i"] + n > len(_buf["a"]):
                _buf["a"] = vocab[rng.choice(ZIPF_V, 1_000_000, p=zp)]
                _buf["i"] = 0
            out = _buf["a"][_buf["i"] : _buf["i"] + n]
            _buf["i"] += n
            return out

    else:
        vocab = np.array(VOCAB)

        def draw(n: int) -> np.ndarray:
            return vocab[rng.integers(0, len(vocab), n)]

    texts: list[str] = []
    for i in range(n_doc):
        r = rng.random()
        if i > 10 and r < 0.002:
            texts.append(texts[rng.integers(0, i)])
            continue
        n_tok = int(rng.integers(10, 101))
        toks = draw(n_tok)
        if i > 10 and r < 0.022:
            src = texts[rng.integers(0, i)].split(" ")
            toks = np.array(src)
            repl = draw(2)
            for j in range(2):
                toks[rng.integers(0, len(toks))] = repl[j]
        texts.append(" ".join(toks))
    w(
        "documents",
        doc_id=pa.array(np.arange(n_doc), pa.int64()),
        text=texts,
        lang=pa.array(np.array(LANGS)[
            rng.choice(len(LANGS), n_doc, p=LANG_P)
        ]),
        source=pa.array([f"src{i % 20}" for i in range(n_doc)]),
        n_chars=pa.array(
            np.array([len(t) for t in texts], dtype="int64"), pa.int64()
        ),
    )

    centers = rng.normal(0.0, 0.12, (10, 64)).astype("float32")
    labels = rng.integers(0, 10, n_emb)
    vecs = centers[labels] + rng.normal(0.0, 0.08, (n_emb, 64)).astype(
        "float32"
    )
    w(
        "embeddings",
        vec_id=pa.array(np.arange(n_emb), pa.int64()),
        embedding=pa.array(list(vecs), pa.list_(pa.float32())),
        label=pa.array(labels, pa.int32()),
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--mult", type=float, default=10.0)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument(
        "--zipf",
        action="store_true",
        help="Zipfian document vocabulary (30k words, s=1.1) instead "
        "of the uniform 31-word fixture vocabulary",
    )
    ap.add_argument(
        "--alpha",
        action="store_true",
        help="with --zipf: alphabetic base-26 words instead of "
        "w<digits>, so [a-z]+-tokenizing operators see the fat head",
    )
    a = ap.parse_args()
    generate(a.out, a.mult, a.seed, zipf=a.zipf, alpha=a.alpha)
    mode = ("zipf-alpha" if a.alpha else "zipf") if a.zipf else "uniform"
    print(f"wrote mult={a.mult} ({mode} vocab) tables to {a.out}")
