"""Fluent query-validation DSL, re-creating the reference's largest module
(reference: ``datapipelines/queries.py::Query / QueryValidator /
QueryValidationError / validate_query`` — SURVEY.md §2A A9/A10) against
DataFrame-native queries.

A "query" here is what it is in the reference: a plain ``dict`` of
key → value the caller passes to ``pipeline.get(table, query)``. The DSL
declares, per source, which keys are required/optional, their types
(with coercion), defaults, and alternative key names:

    validator = (
        Query.has("region_key").as_(int)
        .also.can_have("name").as_(str).with_default("AFRICA")
        .also.can_have("limit").as_(int).or_("max_rows")
    )
    coerced = validator.validate({"region_key": "3"})
    # -> {"region_key": 3, "name": "AFRICA"}

On the engine side the coerced dict becomes equality predicates pushed
into the parquet scan (real ``Column`` filters, never Python-side row
filtering — SURVEY.md §4.2).
"""

from __future__ import annotations

import functools
from collections.abc import Callable, Mapping, MutableMapping
from dataclasses import dataclass, field
from typing import Any

from datapipelines_python_spark.pipeline.common import QueryValidationError


@dataclass
class _Clause:
    key: str
    required: bool
    type_: type | None = None
    default: Any = None
    has_default: bool = False
    alternatives: list[str] = field(default_factory=list)


class QueryValidator:
    """Accumulates clauses; ``validate`` checks + coerces a query dict."""

    def __init__(self) -> None:
        self._clauses: list[_Clause] = []

    # -- builder surface ---------------------------------------------------

    def has(self, key: str) -> "QueryValidator":
        self._clauses.append(_Clause(key=key, required=True))
        return self

    def can_have(self, key: str) -> "QueryValidator":
        self._clauses.append(_Clause(key=key, required=False))
        return self

    def as_(self, type_: type) -> "QueryValidator":
        self._current.type_ = type_
        return self

    def or_(self, key: str) -> "QueryValidator":
        self._current.alternatives.append(key)
        return self

    def with_default(self, value: Any) -> "QueryValidator":
        cl = self._current
        # coerce at declaration time when the type is already known, so a
        # mis-declared default (.as_(int).with_default('oops')) fails at
        # build time, not on the first query that happens to omit the key.
        # None is exempt: it means "absent" and must pass through as-is —
        # str(None) would silently store the string 'None' (ADVICE r3).
        if value is not None and cl.type_ is not None and not isinstance(value, cl.type_):
            try:
                value = cl.type_(value)
            except (TypeError, ValueError) as exc:
                raise QueryValidationError(
                    f"key {cl.key!r}: default {value!r} cannot coerce to "
                    f"{cl.type_.__name__}"
                ) from exc
        cl.default = value
        cl.has_default = True
        return self

    @property
    def also(self) -> "QueryValidator":
        """Pure chaining sugar (reads as 'and also'), as in the reference."""
        return self

    @property
    def _current(self) -> _Clause:
        if not self._clauses:
            raise QueryValidationError("no clause started; call has()/can_have() first")
        return self._clauses[-1]

    # -- validation --------------------------------------------------------

    def validate(self, query: Mapping[str, Any]) -> MutableMapping[str, Any]:
        """Return a coerced copy; raise QueryValidationError on violation."""
        out: dict[str, Any] = dict(query)
        declared: set[str] = set()
        for cl in self._clauses:
            declared.add(cl.key)
            declared.update(cl.alternatives)
            present = [k for k in (cl.key, *cl.alternatives) if k in query]
            if not present:
                if cl.required:
                    raise QueryValidationError(
                        f"query is missing required key {cl.key!r}"
                        + (f" (or {cl.alternatives})" if cl.alternatives else "")
                    )
                if cl.has_default:
                    default = cl.default
                    # backstop for the .with_default(v).as_(T) declaration
                    # order (with_default coerces eagerly when the type is
                    # already declared); keeps validate() idempotent. None
                    # means "absent" and is never coerced (ADVICE r3).
                    if default is not None and cl.type_ is not None and not isinstance(default, cl.type_):
                        try:
                            default = cl.type_(default)
                        except (TypeError, ValueError) as exc:
                            raise QueryValidationError(
                                f"key {cl.key!r}: default {cl.default!r} cannot "
                                f"coerce to {cl.type_.__name__}"
                            ) from exc
                    out[cl.key] = default
                continue
            key = present[0]
            value = query[key]
            if cl.type_ is not None and not isinstance(value, cl.type_):
                try:
                    value = cl.type_(value)
                except (TypeError, ValueError) as exc:
                    raise QueryValidationError(
                        f"key {key!r}: cannot coerce {value!r} to {cl.type_.__name__}"
                    ) from exc
            # normalize alternatives onto the canonical key
            if key != cl.key:
                out.pop(key, None)
            out[cl.key] = value
        return out

    @property
    def keys(self) -> set[str]:
        return {cl.key for cl in self._clauses}


class Query:
    """Entry points of the fluent DSL (mirrors the reference's ``Query``)."""

    @staticmethod
    def has(key: str) -> QueryValidator:
        return QueryValidator().has(key)

    @staticmethod
    def can_have(key: str) -> QueryValidator:
        return QueryValidator().can_have(key)


def validate_query(validator: QueryValidator) -> Callable:
    """Decorator for source handlers: validates/coerces the incoming query
    before the body runs (reference: ``queries.py::validate_query``)."""

    def deco(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapper(self: Any, table: str, query: Mapping[str, Any], *a: Any, **kw: Any):
            return fn(self, table, validator.validate(query), *a, **kw)

        return wrapper

    return deco
