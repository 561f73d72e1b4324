"""Named query registry — the correctness surface.

Every implemented operator from SURVEY.md §2 (plus the training-data-
pipeline extensions) registers here as a named query: a Spark callable
``(spark, sf_dir) -> DataFrame`` and, when SQL-expressible, an equivalent
DuckDB oracle SQL string over the same parquet tables.

Column-name discipline: the driver's compare sorts columns by name before
hashing, so every computed column is aliased identically in the Spark plan
and the oracle SQL. Float outputs are explicitly ``round()``ed on both
sides so cross-engine summation order can't flip a hash bit.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    # import for registration side effects
    from . import advanced_queries  # noqa: F401
    from . import converter_queries  # noqa: F401
    from . import curation_queries  # noqa: F401
    from . import dedup_queries  # noqa: F401
    from . import reference_core  # noqa: F401
    from . import similarity_queries  # noqa: F401
    from . import text_queries  # noqa: F401


def all_queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: spec.spark for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }
