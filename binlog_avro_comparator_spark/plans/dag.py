"""Declarative pipeline DAG: named frames, dependency-ordered
materialization -- the orchestration surface table-format stacks call
"declarative pipelines" (a graph of views/materialized tables built in
topological order), sized down to a dependency-free core.

Why a DAG layer when every operator already composes lazily: once a
pipeline has DOZENS of named intermediate frames (the curation chain:
clean -> quality -> dedup -> decontaminate -> mixture -> splits), three
operational needs appear that plain function composition doesn't give
you:

- build each shared intermediate ONCE per run (diamond dependencies
  otherwise re-execute their whole upstream per consumer -- at 100 TB
  a re-scan, not a cache hit);
- build only what a target needs (a backfill of `splits` must not run
  the unrelated reporting branch);
- fail on cycles at DEFINITION time, not as analyzer stack overflows.

The runner stays Spark-first: "materialize" means *construct the
DataFrame and optionally persist it* -- plans remain lazy, Catalyst
still sees through everything, and a node marked ``cache=True`` uses
the owned-cache discipline (functions/caching.py) so memory is
released when the run scope closes.

Usage::

    p = Pipeline()

    @p.table()
    def cleaned(spark, documents):            # depends on "documents"
        return clean_text(documents)

    @p.table(cache=True)                      # shared by two branches
    def scored(spark, cleaned):
        return quality_scores(cleaned)

    @p.source("documents")                    # bind inputs at run time
    frames = p.materialize(spark, targets=["scored"],
                           sources={"documents": docs_df})
"""

from __future__ import annotations

import inspect
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


class CycleError(ValueError):
    pass


class Pipeline:
    """A named-frame dependency graph.  Node functions take
    ``(spark, <dep>, <dep>, ...)`` -- dependency names are read from
    the signature, so the graph IS the code, never a parallel
    registry that can drift."""

    def __init__(self) -> None:
        self._nodes: dict[str, Callable] = {}
        self._deps: dict[str, list[str]] = {}
        self._cache: dict[str, bool] = {}
        self._sources: set[str] = set()

    def table(self, name: str | None = None, cache: bool = False):
        def deco(fn: Callable) -> Callable:
            node = name or fn.__name__
            params = list(inspect.signature(fn).parameters)
            if not params or params[0] != "spark":
                raise ValueError(
                    f"dag node {node!r}: first parameter must be 'spark'"
                )
            if node in self._nodes or node in self._sources:
                raise ValueError(f"dag node {node!r} defined twice")
            self._nodes[node] = fn
            self._deps[node] = params[1:]
            self._cache[node] = cache
            self._check_acyclic()
            return fn

        return deco

    def source(self, name: str) -> None:
        """Declare an input frame bound at materialize() time."""
        if name in self._nodes or name in self._sources:
            raise ValueError(f"dag node {name!r} defined twice")
        self._sources.add(name)

    def _check_acyclic(self) -> None:
        # DFS over DECLARED deps only; undeclared names may be sources
        # declared later -- full resolution happens at materialize()
        seen: dict[str, int] = {}  # 0 = in progress, 1 = done

        def visit(n: str, path: tuple) -> None:
            if n not in self._deps:
                return
            if seen.get(n) == 0:
                raise CycleError(
                    "dag cycle: " + " -> ".join(path + (n,))
                )
            if seen.get(n) == 1:
                return
            seen[n] = 0
            for d in self._deps[n]:
                visit(d, path + (n,))
            seen[n] = 1

        for n in self._deps:
            visit(n, ())

    def materialize(
        self,
        spark: SparkSession,
        targets: list[str] | None = None,
        sources: dict[str, DataFrame] | None = None,
    ) -> dict[str, DataFrame]:
        """Build ``targets`` (default: every node) and everything they
        transitively need -- each node exactly once -- and return the
        built frames by name.  ``sources`` binds declared inputs."""
        sources = sources or {}
        for s in self._sources:
            if s not in sources:
                raise ValueError(f"dag source {s!r} not bound")
        for s in sources:
            if s not in self._sources:
                raise ValueError(f"{s!r} bound but not declared as a source")
        built: dict[str, DataFrame] = dict(sources)
        if targets is None:
            targets = list(self._nodes)

        def build(n: str, path: tuple) -> DataFrame:
            if n in built:
                return built[n]
            if n not in self._nodes:
                raise ValueError(
                    f"dag node {n!r} is neither defined nor a bound source"
                )
            if n in path:
                raise CycleError("dag cycle: " + " -> ".join(path + (n,)))
            args = [build(d, path + (n,)) for d in self._deps[n]]
            df = self._nodes[n](spark, *args)
            if not isinstance(df, DataFrame):
                raise TypeError(f"dag node {n!r} returned {type(df).__name__}")
            if self._cache[n]:
                from ..functions.caching import scoped_cache

                df = scoped_cache(df)
            built[n] = df
            return df

        for t in targets:
            build(t, ())
        return {k: v for k, v in built.items() if k not in sources or k in targets}
