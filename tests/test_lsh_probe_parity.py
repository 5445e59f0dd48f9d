"""Dual-engine oracle parity for the LSH multi-probe at PROBE-ACTIVE scale.

The driver's correctness differential runs at sf0.01 (n = 200), where the
adaptive extra-bit count E = 0 and the round-9 multi-probe machinery
degenerates to the home-bucket join — so no automated gate would notice
the two engines disagreeing on the probe set itself (margin sort,
tie-break, XOR layout) at real scale. This suite synthesizes a
deterministic mid-size corpus (n = 4100 ⇒ E = 2: probes ACTIVE, single
bucket 6 bits, band bits 6+2) and runs the full operator-vs-oracle
differential through the same comparator the sf0.01 harness uses.

Covers the three distinct probe implementations:
- single-bucket self-join (llm_dedup_embedding),
- single-bucket query probing (llm_ann_lsh_bucketed),
- banded probe×home join (graph_ann_edge_table → _ann_scored_pairs).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from scripts.check_oracle import compare

N_MID = 4100  # (4100-1)//2000 = 2 -> bit_length = 2 extra bits


@pytest.fixture(scope="module")
def mid_sf(tmp_path_factory):
    """Deterministic n=4100 embeddings fixture — big enough that E = 2."""
    root = tmp_path_factory.mktemp("midsf")
    rng = np.random.RandomState(20260816)
    # clustered structure so near-dup pairs exist: 50 centers + noise
    centers = rng.randn(50, 64).astype(np.float32)
    assign = rng.randint(0, 50, N_MID)
    emb = (centers[assign] + 0.6 * rng.randn(N_MID, 64)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(N_MID, dtype=np.int64)),
            "embedding": pa.array(list(emb), type=pa.list_(pa.float32())),
            "label": pa.array(assign.astype(np.int32)),
        }
    )
    pq.write_table(tbl, os.path.join(str(root), "embeddings.parquet"))
    return str(root)


@pytest.fixture(scope="module")
def duck(mid_sf):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{mid_sf}/embeddings.parquet')"
    )
    return con


@pytest.mark.parametrize(
    "name",
    ["llm_dedup_embedding", "llm_ann_lsh_bucketed", "graph_ann_edge_table"],
)
def test_probe_active_oracle_parity(spark, duck, mid_sf, name):
    from datapipelines_python_spark.registry import get_registry

    spec = get_registry()[name]
    ok, msg = compare(name, spec.fn(spark, mid_sf), duck.sql(spec.oracle))
    assert ok and msg == "exact", f"{name}: {msg}"


def test_probes_active_and_sane(spark, mid_sf):
    """The fixture really exercises the probe path: E = 2, so each vector
    emits exactly 1 + 2 probe buckets, all within Hamming distance 1 of
    home, and candidate pairs strictly exceed the home-only join's."""
    from pyspark.sql import functions as F

    from datapipelines_python_spark.operators.llm_training import (
        _SPARK_BUCKET,
        _SPARK_PROBE_BUCKETS,
        _with_corpus_n,
    )

    emb = spark.read.parquet(f"{mid_sf}/embeddings.parquet")
    nv = _with_corpus_n(emb.select("vec_id", "embedding")).select(
        "vec_id", "embedding", "_n", F.expr(_SPARK_BUCKET).alias("bucket")
    )
    probes = nv.select(
        "vec_id",
        "bucket",
        F.expr(_SPARK_PROBE_BUCKETS).alias("pb"),
    )
    row = probes.select(
        F.min(F.size("pb")).alias("mn"), F.max(F.size("pb")).alias("mx")
    ).collect()[0]
    assert (row["mn"], row["mx"]) == (3, 3)  # home + E=2 flips
    # every probe differs from home in exactly one bit (or is home)
    bad = probes.select(
        F.explode("pb").alias("p"), "bucket"
    ).filter(
        (F.col("p") != F.col("bucket"))
        & (F.expr("bit_count(p ^ bucket)") != 1)
    ).count()
    assert bad == 0


def test_deep_probes_active_and_sane(spark, mid_sf):
    """The dedup op's round-10 deep probe set at E = 2: exactly
    1 (home) + 2 (one-bit) + C(2,2)=1 (two-bit) = 4 probes per vector,
    every probe within Hamming distance 2 of home, and the two-bit probe
    is exactly the XOR of the two single-bit masks (so the set is the
    closure the simulation modeled, not an accidental superset)."""
    from pyspark.sql import functions as F

    from datapipelines_python_spark.operators.llm_training import (
        _SPARK_BUCKET,
        _SPARK_DEEP_PROBE_BUCKETS,
        _SPARK_SINGLES,
        _with_corpus_n,
    )

    emb = spark.read.parquet(f"{mid_sf}/embeddings.parquet")
    nv = _with_corpus_n(emb.select("vec_id", "embedding")).select(
        "vec_id", "embedding", "_n", F.expr(_SPARK_BUCKET).alias("bucket")
    )
    probes = nv.withColumn("_s", F.expr(_SPARK_SINGLES)).select(
        "vec_id", "bucket", F.expr(_SPARK_DEEP_PROBE_BUCKETS).alias("pb")
    )
    row = probes.select(
        F.min(F.size("pb")).alias("mn"), F.max(F.size("pb")).alias("mx")
    ).collect()[0]
    assert (row["mn"], row["mx"]) == (4, 4)  # home + 2 singles + 1 combo
    hist = dict(
        probes.select(F.explode("pb").alias("p"), "bucket")
        .groupBy(F.expr("bit_count(p ^ bucket)").alias("d"))
        .count()
        .collect()
    )
    n = probes.count()
    assert hist == {0: n, 1: 2 * n, 2: n}, hist
