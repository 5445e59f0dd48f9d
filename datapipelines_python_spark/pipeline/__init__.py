"""Pipeline framework layer: the reference's public API surface
(sources / sinks / transformers / typed get-with-query / write-back
caching / query validation), DataFrame-native. See SURVEY.md §2A/§3."""

from datapipelines_python_spark.pipeline.common import (
    TYPE_WILDCARD,
    NotFoundError,
    PipelineContext,
    PipelineError,
    QueryValidationError,
    UnsupportedError,
)
from datapipelines_python_spark.pipeline.elements import (
    CompositeDataTransformer,
    DataTransformer,
    FixtureSource,
    MemoryCache,
    ParquetCache,
    TableSink,
    TableSource,
)
from datapipelines_python_spark.pipeline.pipelines import DataPipeline
from datapipelines_python_spark.pipeline.queries import (
    Query,
    QueryValidator,
    validate_query,
)

__all__ = [
    "TYPE_WILDCARD",
    "CompositeDataTransformer",
    "DataPipeline",
    "DataTransformer",
    "FixtureSource",
    "MemoryCache",
    "NotFoundError",
    "ParquetCache",
    "PipelineContext",
    "PipelineError",
    "Query",
    "QueryValidationError",
    "QueryValidator",
    "TableSink",
    "TableSource",
    "UnsupportedError",
    "validate_query",
]
