"""The query catalog: every operator the engine claims is registered here
as a (PySpark builder, DuckDB oracle SQL) pair.

This is the engine's equivalent of the reference's nine hand-authored app
main()s (reference: SURVEY.md §3.4) — but declarative: each entry is a pure
function (SparkSession, sf_dir) -> DataFrame whose plan Catalyst optimizes,
plus the ANSI-SQL statement DuckDB runs on the same parquet files for the
correctness gate. Queries with no SQL-expressible oracle set ``oracle=None``
and are covered by pytest semantics tests instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    # The driver's correctness gate budgets 50 rows; entries whose behavior
    # is fully covered by a gated sibling (an in-memory twin of a persisted
    # index, a duplicate sessionization surface) stay registered — callable,
    # benched, pytest-covered — but ungated so every DISTINCT behavior gets
    # a CORRECTNESS row.
    gated: bool = True


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    gated: bool = True,
) -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name``."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name, builder=fn, oracle=oracle, doc=fn.__doc__ or "",
            tags=tags, gated=gated,
        )
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every plans module so decorators populate REGISTRY, then
    overlay the round-robin gate rotation: the rotating slots cycle
    through ``rotation.POOL`` so every distinct oracle-bearing behavior
    gets a driver CORRECTNESS row at least once per pool cycle (the
    static ``gated`` flags carry the always-gated CORE and the ungated
    twins; registration flags for POOL names are overridden here each
    load)."""
    import dataclasses

    from . import llm, parity, scale, streaming_analog, temporal, tpch  # noqa: F401
    from .rotation import POOL, active_rotation

    active = set(active_rotation())
    for name in POOL:
        q = REGISTRY[name]
        want = name in active
        if q.gated != want:
            REGISTRY[name] = dataclasses.replace(q, gated=want)
    return REGISTRY
