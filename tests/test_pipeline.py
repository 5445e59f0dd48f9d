"""Pipeline-layer semantics SQL can't see: provider ordering, write-back
caching, error-driven resolution, min-cost transformer chains (reference:
pipelines.py::DataPipeline — SURVEY.md §2A/§3.1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datapipelines_python_spark.pipeline import (
    DataPipeline,
    DataTransformer,
    FixtureSource,
    MemoryCache,
    NotFoundError,
    ParquetCache,
    TableSource,
    UnsupportedError,
)
from tests.conftest import SF_SMOKE


def make_pipeline(spark, scratch):
    mem = MemoryCache()
    pq = ParquetCache(scratch)
    cold = FixtureSource(SF_SMOKE)
    return DataPipeline([mem, pq, cold], spark=spark), mem, pq, cold


def test_get_many_resolves_cold_source(spark, scratch):
    pipe, *_ = make_pipeline(spark, scratch)
    df = pipe.get_many("region")
    assert df.count() == 5


def test_get_returns_one_row_or_raises(spark, scratch):
    pipe, *_ = make_pipeline(spark, scratch)
    row = pipe.get("region", {"r_regionkey": 2})
    assert row.r_regionkey == 2
    with pytest.raises(NotFoundError):
        pipe.get("region", {"r_regionkey": 999})


def test_query_filters_are_pushed_down(spark, scratch):
    pipe, *_ = make_pipeline(spark, scratch)
    df = pipe.get_many("nation", {"n_regionkey": 1})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "n_regionkey" in plan.split("PushedFilters")[1][:200]


def test_write_back_populates_earlier_caches(spark, scratch):
    pipe, mem, pq, _ = make_pipeline(spark, scratch)
    assert "region" not in mem.provides and "region" not in pq.provides
    pipe.get_many("region")
    # a cold hit writes back into BOTH earlier cache layers (A14)
    assert "region" in mem.provides
    assert "region" in pq.provides


def test_cache_hit_does_not_write_back_further(spark, scratch):
    pipe, mem, pq, _ = make_pipeline(spark, scratch)
    pipe.get_many("region")
    pq.evict("region")
    assert "region" not in pq.provides
    # memory (element 0) now serves; nothing earlier to write back into,
    # and the colder parquet cache must NOT be touched
    pipe.get_many("region")
    assert "region" not in pq.provides


def test_provider_order_prefers_earlier_element(spark, scratch):
    pipe, mem, pq, _ = make_pipeline(spark, scratch)
    # seed the memory cache with a doctored region table
    doctored = pipe.get_many("region").withColumn("r_name", F.lit("CACHED"))
    mem.put("region", doctored, None)
    got = pipe.get_many("region")
    assert got.select("r_name").distinct().collect()[0][0] == "CACHED"


def test_unknown_table_raises_notfound(spark, scratch):
    pipe, *_ = make_pipeline(spark, scratch)
    with pytest.raises(NotFoundError):
        pipe.get_many("no_such_table")


def test_unsupported_source_is_skipped(spark, scratch):
    class Flaky(TableSource):
        provides = {"region"}

        def get_many(self, table, query, context):
            raise UnsupportedError("cannot serve this query shape")

    pipe = DataPipeline([Flaky(), FixtureSource(SF_SMOKE)], spark=spark)
    assert pipe.get_many("region").count() == 5  # fell through to fixture


def test_transform_chain_is_min_cost(spark, scratch):
    # two routes a->c: direct cost 5, via b cost 1+1=2 — must pick via-b
    calls = []

    def step(tag):
        def fn(df):
            calls.append(tag)
            return df

        return fn

    ts = [
        DataTransformer("a", "c", step("direct"), cost=5),
        DataTransformer("a", "b", step("a->b"), cost=1),
        DataTransformer("b", "c", step("b->c"), cost=1),
    ]
    pipe = DataPipeline([FixtureSource(SF_SMOKE)], transformers=ts, spark=spark)
    df = pipe.get_many("region")
    pipe.transform(df, "a", "c")
    assert calls == ["a->b", "b->c"]


def test_composite_transformer_bundles_chain_as_one_edge(spark, scratch):
    # SURVEY §2A A8: a pre-composed chain registered as a single cheap edge
    # beats the planner's discovered 2-hop route
    calls = []

    def step(tag):
        def fn(df):
            calls.append(tag)
            return df

        return fn

    from datapipelines_python_spark.pipeline import CompositeDataTransformer

    parts = [
        DataTransformer("a", "b", step("a->b"), cost=3),
        DataTransformer("b", "c", step("b->c"), cost=3),
    ]
    fused = CompositeDataTransformer(parts, cost=1)
    assert (fused.frm, fused.to) == ("a", "c")
    ts = [*parts, fused]
    pipe = DataPipeline([FixtureSource(SF_SMOKE)], transformers=ts, spark=spark)
    df = pipe.get_many("region")
    pipe.transform(df, "a", "c")
    # the planner picks the fused edge (cost 1 < 3+3); its parts run in order
    assert calls == ["a->b", "b->c"]
    # default cost = sum of parts; seam mismatch fails fast
    assert CompositeDataTransformer(parts).cost == 6
    with pytest.raises(ValueError):
        CompositeDataTransformer([parts[1], parts[0]])
    with pytest.raises(ValueError):
        CompositeDataTransformer([])


def test_transform_unreachable_raises(spark, scratch):
    pipe = DataPipeline([FixtureSource(SF_SMOKE)], spark=spark)
    df = pipe.get_many("region")
    with pytest.raises(UnsupportedError):
        pipe.transform(df, "a", "zzz")


def test_source_via_transformer_chain_qualifies(spark, scratch):
    # a source that only provides `nation` can still serve `nation_named`
    # through a registered transformer (reference: handler resolution
    # includes transform-reachable types)
    pipe = DataPipeline([FixtureSource(SF_SMOKE, tables={"nation"})], spark=spark)

    @pipe.register_transformer("nation", "nation_named", cost=1)
    def add_name(df):
        return df.withColumn("pretty", F.concat(F.lit("nation:"), "n_name"))

    df = pipe.get_many("nation_named")
    assert "pretty" in df.columns and df.count() == 25


def test_put_writes_to_accepting_sinks(spark, scratch):
    pipe, mem, pq, _ = make_pipeline(spark, scratch)
    df = pipe.get_many("nation")
    n = pipe.put("nation_copy", df)
    assert n == 2  # both cache layers accept wildcard
    assert "nation_copy" in mem.provides and "nation_copy" in pq.provides
    assert pipe.get_many("nation_copy").count() == 25


def test_handler_memoization_and_invalidation(spark, scratch):
    pipe, *_ = make_pipeline(spark, scratch)
    pipe.get_many("region")
    assert "region" in pipe._handlers
    pipe.invalidate_handlers()
    assert not pipe._handlers


def test_get_many_streaming_returns_live_stream(spark, scratch):
    """A2 streaming flag: get_many(streaming=True) yields an unbounded
    frame over the same files; drained with availableNow it equals the
    batch read, and pipeline query filters compose onto the stream."""
    import os

    pipe = DataPipeline([FixtureSource(SF_SMOKE)], spark=spark)
    stream = pipe.get_many("nation", {"n_regionkey": 1}, streaming=True)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("pipe_stream_sink")
        .option("checkpointLocation", os.path.join(scratch, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("pipe_stream_sink").count()
    want = pipe.get_many("nation", {"n_regionkey": 1}).count()
    assert got == want > 0


def test_streaming_get_skips_write_back(spark, scratch):
    mem = MemoryCache()
    pipe = DataPipeline([mem, FixtureSource(SF_SMOKE)], spark=spark)
    pipe.get_many("nation", streaming=True)
    assert "nation" not in mem.provides  # streams defer sink materialization


def test_put_routes_through_transform_chain(spark, scratch):
    """A3: a sink that only accepts `nation_named` still receives a put of
    `nation` when a transformer chain nation->nation_named exists."""
    narrow = MemoryCache(accepts={"nation_named"})
    pipe = DataPipeline([narrow, FixtureSource(SF_SMOKE)], spark=spark)

    @pipe.register_transformer("nation", "nation_named", cost=1)
    def add_name(df):
        return df.withColumn("pretty", F.concat(F.lit("nation:"), "n_name"))

    n = pipe.put("nation", pipe.get_many("nation"))
    assert n == 1
    assert "nation_named" in narrow.provides
    stored = pipe.get_many("nation_named")
    assert "pretty" in stored.columns and stored.count() == 25
