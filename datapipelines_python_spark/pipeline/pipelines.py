"""The pipeline itself: ordered elements, typed get-with-query, write-back
caching, min-cost transformer chains.

Reference parity (``datapipelines/pipelines.py::DataPipeline`` — SURVEY.md
§2A A1–A5, §3.1; /root/reference was empty at survey time, citations are
module::symbol):

- ``get(table, query)``: walk elements in order; the first source that
  provides ``table`` (directly or through a transformer chain) serves it;
  the result is written back into every sink *earlier* in the pipeline
  (A14 — earlier elements are nearer caches); returns exactly one Row,
  raising NotFoundError on 0 rows (the reference's one-object contract).
- ``get_many``: same resolution, returns the DataFrame (lazy — Spark's
  native plural/streaming form; ``.toLocalIterator()`` gives the
  reference's pull-iteration).
- ``put/put_many``: offer a DataFrame to every accepting sink, routing
  through transformer chains when a sink only accepts a convertible table.
- ``transform``: convert between named tables along the min-cost chain
  (Dijkstra over transformer edges, edge weight = ``cost`` — the
  reference's only planner, reimplemented in ~30 lines without networkx).

Query dicts become real pushed-down ``Column`` predicates — never
driver-side row filtering (SURVEY.md §4.2).
"""

from __future__ import annotations

import heapq
import itertools
from collections.abc import Callable, Mapping
from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from datapipelines_python_spark.pipeline.common import (
    NotFoundError,
    PipelineContext,
    UnsupportedError,
)
from datapipelines_python_spark.pipeline.elements import (
    DataTransformer,
    TableSink,
    TableSource,
)


class DataPipeline:
    """Ordered elements + transformer registry over a SparkSession."""

    def __init__(
        self,
        elements: list[TableSource | TableSink],
        transformers: list[DataTransformer] | None = None,
        spark: SparkSession | None = None,
    ) -> None:
        self.elements = list(elements)
        self.transformers = list(transformers or [])
        self.spark = spark
        # handler memoization, as in the reference (_get_handlers):
        # table -> list of (element_index, source, chain frm->table)
        self._handlers: dict[str, list[tuple[int, TableSource, list[DataTransformer]]]] = {}

    # -- context -----------------------------------------------------------

    def _context(self) -> PipelineContext:
        ctx = PipelineContext()
        ctx[PipelineContext.Keys.PIPELINE] = self
        ctx[PipelineContext.Keys.SPARK] = self.spark
        return ctx

    # -- transformer-chain planning (the reference's only optimizer) --------

    def _edges(self) -> dict[str, list[tuple[int, str, DataTransformer]]]:
        out: dict[str, list[tuple[int, str, DataTransformer]]] = {}
        for t in self.transformers:
            out.setdefault(t.frm, []).append((t.cost, t.to, t))
        return out

    def chain(self, frm: str, to: str) -> list[DataTransformer] | None:
        """Min-cost transformer chain frm→to (Dijkstra); [] if frm == to;
        None if unreachable."""
        if frm == to:
            return []
        edges = self._edges()
        # the monotonic counter breaks cost ties so heapq never falls
        # through to comparing the (unorderable) DataTransformer lists —
        # two equal-cost parallel edges used to raise TypeError here
        tie = itertools.count()
        heap: list[tuple[int, int, str, list[DataTransformer]]] = [(0, next(tie), frm, [])]
        seen: set[str] = set()
        while heap:
            cost, _, node, path = heapq.heappop(heap)
            if node == to:
                return path
            if node in seen:
                continue
            seen.add(node)
            for ecost, nxt, t in edges.get(node, []):
                if nxt not in seen:
                    heapq.heappush(heap, (cost + ecost, next(tie), nxt, path + [t]))
        return None

    def _apply_chain(self, df: DataFrame, chain: list[DataTransformer]) -> DataFrame:
        for t in chain:
            df = t.transform(df)
        return df

    # -- handler resolution --------------------------------------------------

    def _source_handlers(
        self, table: str
    ) -> list[tuple[int, TableSource, list[DataTransformer]]]:
        """Ordered handlers able to produce ``table``: a source qualifies
        if it provides the table directly, or provides some table with a
        transformer chain into it. Memoized (reference: handler cache)."""
        if table in self._handlers:
            return self._handlers[table]
        handlers: list[tuple[int, TableSource, list[DataTransformer]]] = []
        for i, el in enumerate(self.elements):
            if not isinstance(el, TableSource):
                continue
            # A cache layer (source+sink accepting the table) always
            # qualifies: it may hold the table by get time even if it is
            # empty now, and raises NotFoundError on a miss (the
            # reference's wildcard-cache semantics keep the memoized
            # handler list stable across cache fills/evictions).
            if el.can_provide(table) or (
                isinstance(el, TableSink) and el.can_accept(table)
            ):
                handlers.append((i, el, []))
                continue
            best: list[DataTransformer] | None = None
            for provided in el.provides:
                c = self.chain(provided, table)
                if c is not None and (
                    best is None or sum(t.cost for t in c) < sum(t.cost for t in best)
                ):
                    best = c
            if best:
                handlers.append((i, el, best))
        self._handlers[table] = handlers
        return handlers

    def invalidate_handlers(self) -> None:
        """Drop the memoized resolution (after adding elements/transformers)."""
        self._handlers.clear()

    # -- filters -------------------------------------------------------------

    @staticmethod
    def _apply_query(df: DataFrame, query: Mapping[str, Any]) -> DataFrame:
        """Equality predicates as real Column filters (pushdown-eligible).
        Unknown keys raise UnsupportedError, preserving the reference's
        skip-to-next-source semantics for malformed per-source queries."""
        for k, v in query.items():
            if k not in df.columns:
                raise UnsupportedError(f"no column {k!r} to filter on")
            df = df.filter(F.col(k) == F.lit(v))
        return df

    # -- public API (EP1-EP3) -------------------------------------------------

    def get_many(
        self,
        table: str,
        query: Mapping[str, Any] | None = None,
        streaming: bool = False,
    ) -> DataFrame:
        """Resolve and return the DataFrame for ``table`` with the query's
        equality predicates applied; write back into earlier sinks.

        ``streaming=True`` (the reference's A2 flag) asks providers for an
        unbounded ``readStream`` frame instead; sources that cannot stream
        are skipped, and sink write-back is skipped by design (the
        reference defers sink materialization in streaming mode)."""
        query = dict(query or {})
        ctx = self._context()
        last_err: Exception | None = None
        for idx, source, chain in self._source_handlers(table):
            # a chained handler fetches the table the source actually
            # provides (the chain's origin), then converts it to ``table``
            fetch = chain[0].frm if chain else table
            try:
                validator = source.validators.get(fetch) if source.validators else None
                q = validator.validate(query) if validator else query
                if streaming:
                    df = source.get_stream(fetch, q, ctx)
                else:
                    df = source.get_many(fetch, q, ctx)
                df = self._apply_chain(df, chain)
            except (UnsupportedError, NotFoundError) as exc:
                last_err = exc
                continue
            filtered = self._apply_query(df, q)
            if not streaming:
                # write back the UNFILTERED frame: the cache stores the
                # table itself, not this call's predicate-subset of it
                self._write_back(table, df, upto=idx, ctx=ctx)
            return filtered
        raise NotFoundError(table) from last_err

    def get(self, table: str, query: Mapping[str, Any] | None = None) -> Row:
        """One object, or NotFoundError — the reference's ``get`` contract."""
        rows = self.get_many(table, query).limit(1).collect()
        if not rows:
            raise NotFoundError(f"{table} with {dict(query or {})}")
        return rows[0]

    def put(self, table: str, df: DataFrame) -> int:
        """Offer ``df`` to every accepting sink — directly, or converted
        through the min-cost transformer chain into a table the sink does
        accept (the reference's A3 accepts/transform resolution).
        Returns the number of sinks written."""
        ctx = self._context()
        written = 0
        for el in self.elements:
            if not isinstance(el, TableSink):
                continue
            if el.can_accept(table):
                el.put(table, df, ctx)
                written += 1
                continue
            # route through the cheapest chain into any accepted table
            best_to: str | None = None
            best: list[DataTransformer] | None = None
            for accepted in el.accepts:
                c = self.chain(table, accepted)
                if c is not None and (
                    best is None or sum(t.cost for t in c) < sum(t.cost for t in best)
                ):
                    best_to, best = accepted, c
            if best_to is not None and best:
                el.put(best_to, self._apply_chain(df, best), ctx)
                written += 1
        return written

    # the reference distinguishes put/put_many by arity; with DataFrames the
    # plural IS the singular
    put_many = put

    def transform(self, df: DataFrame, frm: str, to: str) -> DataFrame:
        """Convert between named tables along the min-cost chain."""
        chain = self.chain(frm, to)
        if chain is None:
            raise UnsupportedError(f"no transformer chain {frm!r} -> {to!r}")
        return self._apply_chain(df, chain)

    def sql(self, statement: str) -> DataFrame:
        """Free SQL entry over whatever views the session has registered."""
        if self.spark is None:
            raise UnsupportedError("pipeline built without a SparkSession")
        return self.spark.sql(statement)

    # -- write-back caching (A14) ----------------------------------------------

    def _write_back(
        self, table: str, df: DataFrame, upto: int, ctx: PipelineContext
    ) -> None:
        """A hit at element ``upto`` populates every earlier sink."""
        for el in self.elements[:upto]:
            if isinstance(el, TableSink) and el.can_accept(table):
                el.put(table, df, ctx)

    # -- registration sugar ------------------------------------------------------

    def register_transformer(
        self, frm: str, to: str, cost: int = 1
    ) -> Callable[[Callable[[DataFrame], DataFrame]], Callable[[DataFrame], DataFrame]]:
        """Decorator: ``@pipeline.register_transformer("a", "b", cost=2)``."""

        def deco(fn: Callable[[DataFrame], DataFrame]) -> Callable[[DataFrame], DataFrame]:
            self.transformers.append(DataTransformer(frm, to, fn, cost))
            self.invalidate_handlers()
            return fn

        return deco
