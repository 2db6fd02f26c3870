"""Query registry: name -> (Spark builder, DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md §2 + the training-data
extensions) is declared here as a query over the driver's test tables,
with an equivalent ANSI-SQL oracle where the semantics are
SQL-expressible.  The driver runs both sides at sf0.01 and compares
row-count + schema + order-insensitive value hash.

Conventions that make the comparison byte-stable:
- every computed/aggregate column is aliased identically on both sides;
- double-valued aggregates are rounded (2-4 dp) on BOTH sides, since
  Spark's parallel partial aggregation and DuckDB's sequential sum
  differ in float summation order;
- integer sums are cast to BIGINT on both sides (DuckDB widens to
  HUGEINT by default);
- session timezone is pinned to UTC (session.py).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB-compatible ANSI SQL, or None (rows-only check)
    doc: str = ""


QUERIES: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Decorator registering a query builder (and optional oracle SQL)."""

    def deco(fn: Builder) -> Builder:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name=name, builder=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco
