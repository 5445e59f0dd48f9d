"""End-to-end demo of the pipeline framework layer + operator registry.

Mirrors how a user of the reference framework works — ordered elements,
typed get-with-query, write-back caching, transformer chains — then drops
into the analytics operator surface on the same session.

Run:  PYTHONPATH=. python examples/pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile

from pyspark.sql import functions as F

from datapipelines_python_spark import all_queries, get_spark
from datapipelines_python_spark.pipeline import (
    DataPipeline,
    FixtureSource,
    MemoryCache,
    ParquetCache,
    Query,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="pipeline_demo")

    # --- the reference's own surface, DataFrame-native --------------------
    cache_dir = tempfile.mkdtemp(prefix="dp_cache_")
    cold = FixtureSource(sf_dir)
    # declare a query validator on the cold source, reference-style
    cold.validators = {
        "nation": Query.can_have("n_regionkey").as_(int),
    }
    pipe = DataPipeline([MemoryCache(), ParquetCache(cache_dir), cold], spark=spark)

    # typed get with a validated query dict -> pushed-down filters
    row = pipe.get("region", {"r_regionkey": 2})
    print("get one:", row.r_name)

    # get_many returns the lazy DataFrame; the cold read was written back
    # into both cache layers (verify: second call serves from memory)
    asia_nations = pipe.get_many("nation", {"n_regionkey": "2"})  # coerced by DSL
    print("nations in region 2:", asia_nations.count())

    # transformer chain: register a derived table and fetch it through it
    @pipe.register_transformer("nation", "nation_pretty", cost=1)
    def prettify(df):
        return df.withColumn("title", F.concat(F.lit("Nation: "), "n_name"))

    pretty = pipe.get_many("nation_pretty")
    pretty.select("title").show(3, truncate=False)

    # streaming form of the same API (A2): unbounded frame over the table
    stream = pipe.get_many("events", streaming=True)
    print("events stream is streaming frame:", stream.isStreaming)

    # --- the analytics operator registry ---------------------------------
    queries = all_queries()
    print(f"{len(queries)} registered operators")
    flagship = queries["agg_groupby"](spark, sf_dir)
    flagship.show(6)
    top_dups = queries["llm_dedup_near"](spark, sf_dir)
    print("near-duplicate pairs:", top_dups.count())


if __name__ == "__main__":
    main()
