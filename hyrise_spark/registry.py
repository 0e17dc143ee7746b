"""Query registry — the single source of truth for the driver contract.

Every implemented operator/query from SURVEY.md §2 registers itself here with
a DataFrame builder (Spark-first) and, when SQL-expressible, a DuckDB oracle
SQL string. `__spark_entry__.py` re-exports this registry as
`queries()` / `oracle_sql()`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    builder: QueryFn
    oracle: Optional[str]  # DuckDB SQL, or None -> rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: Optional[str] = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QueryDef(name=name, builder=fn, oracle=oracle, tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    # Import side-effect modules that populate the registry.
    import hyrise_spark.plans.tpch  # noqa: F401
    import hyrise_spark.plans.tpch_bucketed  # noqa: F401  (reuses tpch oracles)
    import hyrise_spark.plans.tpch_datesorted  # noqa: F401  (reuses tpch/ssb oracles)
    import hyrise_spark.plans.tpch_datepartitioned  # noqa: F401  (reuses tpch oracle)
    import hyrise_spark.plans.ssb  # noqa: F401
    import hyrise_spark.plans.tpcds  # noqa: F401
    import hyrise_spark.plans.tpcds_real  # noqa: F401
    import hyrise_spark.plans.job  # noqa: F401
    import hyrise_spark.plans.tpcc  # noqa: F401
    import hyrise_spark.plans.jcch  # noqa: F401
    import hyrise_spark.plans.jcch_suite  # noqa: F401  (reuses tpch oracles)
    import hyrise_spark.plans.relational  # noqa: F401
    import hyrise_spark.plans.intervals  # noqa: F401
    import hyrise_spark.plans.windows  # noqa: F401
    import hyrise_spark.plans.events  # noqa: F401
    import hyrise_spark.plans.analytic  # noqa: F401
    import hyrise_spark.pipeline.text  # noqa: F401
    import hyrise_spark.pipeline.retrieval  # noqa: F401
    import hyrise_spark.pipeline.dedup  # noqa: F401
    import hyrise_spark.pipeline.graph  # noqa: F401
    import hyrise_spark.pipeline.similarity  # noqa: F401
    import hyrise_spark.pipeline.multimodal  # noqa: F401
    import hyrise_spark.pipeline.curate  # noqa: F401

    return dict(_REGISTRY)
