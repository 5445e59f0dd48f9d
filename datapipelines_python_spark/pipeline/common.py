"""Pipeline-layer common types, mirroring the reference framework's
``common`` module (reference: ``datapipelines/common.py::NotFoundError /
UnsupportedError / PipelineContext / TYPE_WILDCARD`` — see SURVEY.md §2A
A11–A13; /root/reference was empty at survey time, citations are
module::symbol).

The semantics these encode drive the pipeline resolution loop:

- ``UnsupportedError``: this element cannot serve this table/query at all —
  the pipeline silently moves to the next element.
- ``NotFoundError``: the element looked and the data isn't there — also
  try the next element; if every element exhausts, the pipeline re-raises.
"""

from __future__ import annotations

from typing import Any

#: Sentinel: a source/sink that handles *any* table.
TYPE_WILDCARD = "*"


class PipelineError(Exception):
    """Base class for pipeline-layer errors."""


class NotFoundError(PipelineError):
    """The queried object does not exist in any source."""


class UnsupportedError(PipelineError):
    """The element cannot serve this table/query; resolution continues."""


class QueryValidationError(PipelineError):
    """The query dict failed validation against the declared schema."""


class PipelineContext(dict):
    """Per-call context threaded through every source/sink/transformer
    call. A plain dict subclass (like the reference) with an attribute
    handle for the pipeline itself. Driver-side only — never shipped to
    executors."""

    class Keys:
        PIPELINE = "pipeline"
        SPARK = "spark"

    def __getattr__(self, item: str) -> Any:
        try:
            return self[item]
        except KeyError as exc:  # pragma: no cover - attr sugar
            raise AttributeError(item) from exc
