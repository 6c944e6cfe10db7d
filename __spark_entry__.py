"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()``
maps every implemented operator (SURVEY.md §2 + north-star
extensions) to a (spark, sf_dir) -> DataFrame callable; ``oracle_sql()``
carries the DuckDB-equivalent SQL for the correctness gate. Column
aliases match on both sides by construction (each module keeps the
Spark plan and its oracle SQL adjacent).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H-Q1-shaped pricing summary at sf0.001."""
    from trace_parquet_spark.session import ensure_engine_conf
    from trace_parquet_spark.plans.relational import q1_pricing_summary

    ensure_engine_conf(spark)
    return q1_pricing_summary(spark, SF0001)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from trace_parquet_spark.session import ensure_engine_conf, release_caches

        # building query N releases query N-1's intra-query caches, so
        # storage never accumulates across a sequential full-registry
        # run (the driver's gate, check_oracle, bench)
        release_caches()
        ensure_engine_conf(spark)
        return fn(spark, sf_dir)

    return run


def _modules():
    from trace_parquet_spark.operators import (
        cdc,
        corpus_pipeline,
        featurize,
        forget,
        graph_metrics,
        heavy_hitters,
        hygiene,
        dedup,
        dedup_clusters,
        dataset_card,
        entity_resolution,
        feature_store,
        incremental_dedup,
        indexing,
        packing,
        semantic,
        ivf,
        kll,
        merge,
        mixture,
        pq,
        prep,
        provenance,
        quality,
        quality_rules,
        multimodal,
        ranking,
        repetition,
        sampling,
        scrub,
        similarity,
        sketches,
        skew,
        text_analysis,
        udaf,
        udtf,
        zorder,
    )
    from trace_parquet_spark.sources import (
        formats,
        jdbc,
        tablelog,
        tablelog_source,
        warc,
    )
    from trace_parquet_spark.streaming import (
        band_join_oracle,
        dedup_oracle,
        stateful_oracle,
        windowed_oracle,
    )
    from trace_parquet_spark.plans import (
        analytics_extras,
        analytics_more,
        collections as collections_plans,
        ds_shapes,
        funnels,
        graph_rank,
        grouping_sets,
        join_strategies,
        join_stats,
        incremental,
        recursive,
        relational,
        relational_extras,
        relational_more,
        sequences,
        statistics,
        subqueries,
        temporal,
        tpch_more,
        tpch_rest,
        variant_ops,
    )

    return (
        relational,
        relational_extras,
        relational_more,
        tpch_more,
        tpch_rest,
        temporal,
        grouping_sets,
        join_strategies,
        join_stats,
        ds_shapes,
        collections_plans,
        statistics,
        incremental,
        subqueries,
        funnels,
        graph_rank,
        recursive,
        sequences,
        variant_ops,
        analytics_extras,
        analytics_more,
        text_analysis,
        heavy_hitters,
        hygiene,
        ranking,
        dedup,
        dedup_clusters,
        dataset_card,
        entity_resolution,
        feature_store,
        incremental_dedup,
        semantic,
        packing,
        similarity,
        multimodal,
        corpus_pipeline,
        sampling,
        scrub,
        mixture,
        sketches,
        skew,
        indexing,
        merge,
        forget,
        cdc,
        featurize,
        graph_metrics,
        prep,
        provenance,
        quality,
        quality_rules,
        repetition,
        udaf,
        udtf,
        zorder,
        ivf,
        kll,
        pq,
        formats,
        jdbc,
        tablelog,
        tablelog_source,
        warc,
        band_join_oracle,
        dedup_oracle,
        stateful_oracle,
        windowed_oracle,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    owner: dict[str, str] = {}
    for mod in _modules():
        for name, fn in mod.QUERIES.items():
            # a repeated name would silently shadow the earlier module's
            # entry — and its oracle — turning the correctness gate into
            # a self-consistent no-op for one of the two; fail loudly
            if name in owner:
                raise RuntimeError(
                    f"duplicate registry key {name!r}: "
                    f"{owner[name]} vs {mod.__name__}"
                )
            owner[name] = mod.__name__
            out[name] = _wrap(fn)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out
