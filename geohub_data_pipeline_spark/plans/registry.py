"""Query registry: name -> (Spark builder, DuckDB oracle SQL).

Design rules for oracle parity (the driver hash-compares values):

* **Determinism beats cleverness.**  Floating-point aggregation order
  differs between Spark partial aggregation and DuckDB, so every SUM /
  AVG over doubles goes through ``DECIMAL`` (exact, order-independent)
  and is cast back to DOUBLE; transcendental outputs are rounded.
* **Alias every computed column identically** in the Spark builder and
  the SQL text — the harness sorts columns by name before hashing.
* **Every LIMIT carries a total order** (explicit tie-break keys).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    category: str          # relational | pipeline | temporal | llm
    survey: str            # SURVEY.md §2 line(s) this covers, e.g. "§2.5 joins"
    fn: QueryFn
    sql: str | None        # DuckDB oracle; None => rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, category: str, survey: str, sql: str | None):
    """Decorator registering a query builder with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, category=category, survey=survey, fn=fn, sql=sql,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    return dict(_REGISTRY)


def promote(front: list[str]) -> None:
    """Rebuild the registry so ``front`` names come first (in the given
    order), followed by everything else in registration order.

    The correctness harness walks the registry in order and may
    evaluate only a prefix, so the highest-value / least-proven
    queries must lead.  Called once from plans/__init__ after all
    modules register.
    """
    missing = [n for n in front if n not in _REGISTRY]
    if missing:
        raise KeyError(f"promote: unknown queries {missing}")
    rest = [n for n in _REGISTRY if n not in set(front)]
    ordered = {n: _REGISTRY[n] for n in [*front, *rest]}
    _REGISTRY.clear()
    _REGISTRY.update(ordered)


def get_query(name: str) -> QuerySpec:
    return _REGISTRY[name]
