"""Text-analysis primitives over the ``documents`` table.

Each builder returns a Spark Column (pure built-in functions — JVM
side, codegen-friendly, no UDFs) and has a ``*_sql`` twin emitting the
equivalent DuckDB expression for the oracle harness. The regexes stick
to syntax both Java's regex engine and DuckDB's RE2 interpret
identically (no lookaround, explicit character classes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic English stopword list used by the heuristics.
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this",
)

_WS = r"\s+"


def norm_text(col: Column | str) -> Column:
    """lower + trim + collapse whitespace — canonical text form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), _WS, " ")


def norm_text_sql(expr: str) -> str:
    return rf"regexp_replace(lower(trim({expr})), '\s+', ' ', 'g')"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of normalized text → array<string>."""
    return F.split(norm_text(col), " ")


def tokens_sql(expr: str) -> str:
    return f"string_split({norm_text_sql(expr)}, ' ')"


def token_count_from(text: Column | str, toks: Column) -> Column:
    """Token count from a MATERIALIZED tokens column — prefer this in
    multi-metric projections: each ``tokens(...)`` expression re-splits
    the text, and Catalyst's subexpression elimination does not always
    merge the duplicated trees (measured 7× on the documents table)."""
    c = F.col(text) if isinstance(text, str) else text
    return (
        F.when(F.length(F.trim(c)) == 0, F.lit(0))
        .otherwise(F.size(toks))
        .cast("long")
    )


def token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return token_count_from(c, tokens(c))


def token_count_sql(expr: str) -> str:
    return (
        f"CAST(CASE WHEN length(trim({expr})) = 0 THEN 0 "
        f"ELSE len({tokens_sql(expr)}) END AS BIGINT)"
    )


def stopword_ratio_from(toks: Column) -> Column:
    """Stopword fraction from a materialized tokens column."""
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return (n_stop / F.greatest(F.size(toks), F.lit(1))).cast("double")


def stopword_ratio(col: Column | str) -> Column:
    """Fraction of tokens that are stopwords (quality signal)."""
    return stopword_ratio_from(tokens(col))


def stopword_ratio_sql(expr: str) -> str:
    stops = ", ".join(f"'{s}'" for s in STOPWORDS)
    t = tokens_sql(expr)
    return (
        f"CAST(len(list_filter({t}, x -> x IN ({stops}))) AS DOUBLE) "
        f"/ greatest(len({t}), 1)"
    )


def alpha_ratio(col: Column | str) -> Column:
    """Fraction of characters that are ASCII letters or space."""
    c = F.col(col) if isinstance(col, str) else col
    kept = F.length(F.regexp_replace(c, "[^a-zA-Z ]", ""))
    return (kept / F.greatest(F.length(c), F.lit(1))).cast("double")


def alpha_ratio_sql(expr: str) -> str:
    return (
        f"CAST(length(regexp_replace({expr}, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)"
        f" / greatest(length({expr}), 1)"
    )


def quality_score_from(text: Column | str, toks: Column) -> Column:
    """Composite quality heuristic from a materialized tokens column."""
    n = token_count_from(text, toks)
    len_score = F.least(n / F.lit(64.0), F.lit(1.0))
    sw = stopword_ratio_from(toks)
    sw_score = F.lit(1.0) - F.abs(sw - F.lit(0.25)) * 2
    return F.round(
        (
            len_score * 0.4
            + alpha_ratio(text) * 0.3
            + F.greatest(sw_score, F.lit(0.0)) * 0.3
        ),
        6,
    ).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite quality heuristic in [0,1]: favor mid-length docs,
    alphabetic content, and a natural stopword rate."""
    c = F.col(col) if isinstance(col, str) else col
    return quality_score_from(c, tokens(c))


def quality_score_sql(expr: str) -> str:
    n = token_count_sql(expr)
    sw = stopword_ratio_sql(expr)
    return (
        f"CAST(round(least({n} / 64.0, 1.0) * 0.4 + {alpha_ratio_sql(expr)} * 0.3 "
        f"+ greatest(1.0 - abs({sw} - 0.25) * 2, 0.0) * 0.3, 6) AS DOUBLE)"
    )


def shingles_from(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles from an ALREADY-MATERIALIZED token array
    column. ``toks`` must be a column reference, not a fresh
    ``tokens(...)`` expression: expressions inside higher-order-function
    lambdas are re-evaluated per element, so an inline split would cost
    O(tokens²) per document. Docs shorter than n words yield a single
    shingle of the whole text."""
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    )
    return F.transform(
        starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n))
    )


def shingles(col: Column | str, n: int = 3) -> Column:
    """Shingles straight from text — convenience form for small inputs;
    prefer projecting ``tokens(col)`` then ``shingles_from`` in hot
    paths (see shingles_from for why)."""
    return shingles_from(tokens(col), n)


def shingles_sql(expr: str, n: int = 3) -> str:
    t = tokens_sql(expr)
    return (
        f"[array_to_string(list_slice({t}, i, i + {n - 1}), ' ') "
        f"for i in range(1, greatest(len({t}) - {n - 1}, 1) + 1)]"
    )


def lang_id_from(text: Column | str, toks: Column) -> Column:
    """Language heuristic from a materialized tokens column."""
    c = F.col(text) if isinstance(text, str) else text
    return (
        F.when(stopword_ratio_from(toks) >= 0.08, F.lit("en"))
        .when(F.length(F.regexp_replace(c, "[^a-zA-Z]", "")) > 0, F.lit("xx"))
        .otherwise(F.lit("und"))
    )


def lang_id(col: Column | str) -> Column:
    """N-gram/stopword language heuristic.

    Scores English by stopword density; the synthetic corpus is
    English-like words, so the interesting contract is determinism:
    density ≥ 0.08 → 'en', any letters → 'xx', else 'und'.
    """
    c = F.col(col) if isinstance(col, str) else col
    return lang_id_from(c, tokens(c))


def lang_id_sql(expr: str) -> str:
    return (
        f"CASE WHEN {stopword_ratio_sql(expr)} >= 0.08 THEN 'en' "
        f"WHEN length(regexp_replace({expr}, '[^a-zA-Z]', '', 'g')) > 0 THEN 'xx' "
        f"ELSE 'und' END"
    )
