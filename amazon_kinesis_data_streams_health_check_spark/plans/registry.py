"""Named query registry — the engine's public query surface.

Each :class:`Query` pairs a Spark DataFrame builder with (where expressible)
an equivalent DuckDB SQL string over the same parquet tables; the driver's
correctness gate runs both at sf0.01 and hash-compares results
(``__spark_entry__.py`` contract). Column names/aliases are kept identical on
both sides; float aggregates are rounded identically so value hashes are
stable across engines.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL twin; None => rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable[[SparkSession, str], DataFrame]]:
    """Decorator: register a (spark, sf_dir) -> DataFrame builder."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, builder=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    # Import side-effect modules that populate the registry.
    from amazon_kinesis_data_streams_health_check_spark.plans import (  # noqa: F401
        healthcheck_queries,
        relational_queries,
        tpch_queries,
        curation_queries,
        ext_queries,
        streaming_queries,
    )

    return dict(_REGISTRY)


def get(name: str) -> Query:
    return all_queries()[name]
