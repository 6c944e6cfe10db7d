"""Cross-engine stable hashing.

Dedup operators (minhash, simhash, fingerprints) need a hash function
that (a) is deterministic across engines so the DuckDB oracle can
replicate it bit-for-bit, and (b) runs JVM-side in Spark (no Python in
the hot path). md5 exists in both engines with identical output, so a
"hash family" is: take the first 8 hex chars of md5(seed || ':' || s)
as a 32-bit unsigned int carried in a BIGINT.

Every Spark Column builder here has a ``*_sql`` twin producing the
equivalent DuckDB expression — one source of truth for both sides of
the correctness harness.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_hash32(col: Column | str) -> Column:
    """Unsigned 32-bit hash of a string column, as LongType."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def stable_hash32_sql(expr: str) -> str:
    return f"CAST(('0x' || substring(md5({expr}), 1, 8)) AS BIGINT)"


def stable_hash_seeded(col: Column | str, seed: int) -> Column:
    """Seeded member of the hash family (for minhash signatures)."""
    c = F.col(col) if isinstance(col, str) else col
    return stable_hash32(F.concat(F.lit(f"{seed}:"), c))


def stable_hash_seeded_sql(expr: str, seed: int) -> str:
    return stable_hash32_sql(f"'{seed}:' || {expr}")


def stable_hash32_x4(col: Column | str, seed: int) -> list[Column]:
    """Four independent 32-bit hashes from ONE md5 evaluation (the
    128-bit digest split into 8-hex chunks) — 4× less hashing work for
    minhash-style signature families."""
    c = F.col(col) if isinstance(col, str) else col
    digest = F.md5(F.concat(F.lit(f"{seed}:"), c))
    return [
        F.conv(F.substring(digest, 1 + 8 * k, 8), 16, 10).cast("long")
        for k in range(4)
    ]


def stable_hash32_x4_sql(expr: str, seed: int) -> list[str]:
    digest = f"md5('{seed}:' || {expr})"
    return [
        f"CAST(('0x' || substring({digest}, {1 + 8 * k}, 8)) AS BIGINT)"
        for k in range(4)
    ]


def fingerprint_md5(col: Column | str) -> Column:
    """Full 128-bit content fingerprint as hex string."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c)


def fingerprint_md5_sql(expr: str) -> str:
    return f"md5({expr})"
