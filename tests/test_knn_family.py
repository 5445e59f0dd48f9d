"""The kNN-graph family's shared edge source (VERDICT r1 #2).

Round 1's ``_cosine_pairs`` materialized and persisted all n(n-1) cosine
pairs and every one of its 13 consumers re-windowed that n² table. It now
builds an exact per-u top-K (K=64) table once — the n² candidate stream
feeds a top-K window without ever being materialized — and offers a banded
sign-LSH candidate mode (``SPARK_GRAFT_KNN_CANDIDATES=ann``) for the scale
path where exact kNN is off the table. These tests pin:

- the persisted table is K·n-bounded, not n²,
- the K=64 margin safely covers the deepest consumer need
  (top-3-per-cross-label in ``llm_hard_negative_mining``),
- the ANN mode's plan is bucket-join-shaped (no cartesian / nested-loop),
- exact-mode result identity is pinned separately by the 12 consumer
  oracles (scripts/check_oracle.py), which replay the full n² formulation
  in DuckDB.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datapipelines_python_spark.catalog import load_table
from datapipelines_python_spark.operators.workloads import (
    _KNN_TOPK,
    _cosine_pairs,
    _mutual_5nn,
)

SF = "/root/testdata/sf0.001"


def test_pairs_table_is_topk_bounded(spark):
    n = load_table(spark, SF, "embeddings").count()
    pairs = _cosine_pairs(spark, SF)
    cnt = pairs.count()
    assert cnt <= _KNN_TOPK * n, f"{cnt} rows > K*n = {_KNN_TOPK * n}"
    assert cnt > 5 * n  # sanity: deep enough for every top-5 consumer
    # exactly K rows per u (n > K+1 here), rank deterministic
    per_u = pairs.groupBy("u").count().agg(F.min("count"), F.max("count")).first()
    assert per_u[0] == per_u[1] == _KNN_TOPK


def test_topk_margin_covers_hard_negative_mining(spark):
    """llm_hard_negative_mining takes top-3 *cross-label* per anchor from
    the top-K table; assert every anchor has >=10 cross-label rows in its
    top-64 (>3x margin), so the K truncation can never clip its answer."""
    lab = load_table(spark, SF, "embeddings").select("vec_id", "label")
    pairs = _cosine_pairs(spark, SF)
    cross = (
        pairs.join(lab.select(F.col("vec_id").alias("u"), F.col("label").alias("lu")), "u")
        .join(lab.select(F.col("vec_id").alias("v"), F.col("label").alias("lv")), "v")
        .filter(F.col("lu") != F.col("lv"))
        .groupBy("u")
        .count()
    )
    min_cross = cross.agg(F.min("count")).first()[0]
    n_anchors = cross.count()
    n = lab.count()
    assert n_anchors == n, "some anchor has zero cross-label rows in top-K"
    assert min_cross >= 10, f"margin too thin: min cross-label depth {min_cross}"


def test_ann_candidate_mode_is_bucket_join(spark):
    os.environ["SPARK_GRAFT_KNN_CANDIDATES"] = "ann"
    try:
        pairs = _cosine_pairs(spark, SF)
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        n = load_table(spark, SF, "embeddings").count()
        cnt = pairs.count()
        assert cnt <= _KNN_TOPK * n
        # ANN survivors per u are capped by bucket co-occupancy — far below
        # the exact K=64 everywhere on isotropic fixtures
        mean_depth = cnt / n
        assert mean_depth < _KNN_TOPK, f"ann mode saturated top-K ({mean_depth})"
        pairs.unpersist()
    finally:
        del os.environ["SPARK_GRAFT_KNN_CANDIDATES"]


def test_registered_ann_twins_plan_gate(spark):
    """VERDICT r2 #2: the ANN candidate path is now *registered* (not an
    env-var override). Gate the plans: the candidate stream must be the
    (band, bucket) equi-self-join — no CartesianProduct, no
    BroadcastNestedLoopJoin — so the driver-checked plan is the Σ bucket²
    one, not n². ``graph_triangle_count_ann`` is allowed its final
    three-single-row-aggregate crossJoin (the repo-wide sanctioned scalar
    assembly pattern) but nothing else nested-loop-shaped."""
    from datapipelines_python_spark.operators.workloads import _ann_scored_pairs
    from datapipelines_python_spark.registry import get_registry

    cand_plan = (
        _ann_scored_pairs(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in cand_plan
    assert "BroadcastNestedLoopJoin" not in cand_plan

    reg = get_registry()
    # ops whose only nested loops are the sanctioned broadcast-scalar
    # assembly (1-row aggregates crossJoined into a report row)
    scalar_assembly = {
        "graph_triangle_count_ann": 2,  # (n_nodes, n_edges, n_triangles)
        "graph_kcore_ann": 6,  # 3 peel rounds × (n_nodes × n_edges)
        "graph_modularity_ann": 1,  # 1-row edge-total mm broadcast
    }
    for name in (
        "graph_ann_edge_table",
        "graph_triangle_count_ann",
        "llm_hard_negative_mining_ann",
        "ml_knn_classifier_ann",
        "ml_lof_outliers_ann",
        "llm_hubness_ann",
        "graph_local_clustering_ann",
        "graph_khop_reach_ann",
        "graph_link_prediction_ann",
        "graph_assortativity_ann",
        "graph_kcore_ann",
        "graph_modularity_ann",
        "graph_degree_distribution_ann",
        "ml_oversample_interpolate_ann",
    ):
        df = reg[name].fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        bnlj = plan.count("BroadcastNestedLoopJoin")
        cap = scalar_assembly.get(name, 0)
        if cap:
            assert bnlj <= cap and plan.count("Cross") == bnlj, name
        else:
            assert bnlj == 0, name


def test_ann_edge_table_shape(spark):
    """The registered ANN edge table is per-u top-<=5, rank-dense from 1,
    and never pairs a vector with itself."""
    from datapipelines_python_spark.operators.workloads import _ann_edge_table_df

    edges = _ann_edge_table_df(spark, SF)
    assert edges.filter(F.col("u") == F.col("v")).count() == 0
    per_u = edges.groupBy("u").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx"), F.min("rank").alias("mn")
    )
    bad = per_u.filter(
        (F.col("n") > 5) | (F.col("mn") != 1) | (F.col("mx") != F.col("n"))
    ).count()
    assert bad == 0


def test_mutual_edges_symmetric_undirected(spark):
    edges = _mutual_5nn(spark, SF)
    assert edges.filter(F.col("u") >= F.col("v")).count() == 0
    # every edge's endpoints are real vec_ids
    ids = load_table(spark, SF, "embeddings").select(F.col("vec_id").alias("u"))
    assert edges.join(ids, "u", "left_anti").count() == 0


def test_ann_mode_recall_measured(spark):
    """Pin the documented ANN trade: banded sign-LSH candidates on these
    ISOTROPIC fixtures recover a meaningful but partial fraction of the
    exact top-5 (the docstring's ~1/3 claim). Deterministic, so a band is
    assertable; a real clustered corpus would sit far higher."""
    exact = _cosine_pairs(spark, SF)
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window
    top5 = lambda df: (  # noqa: E731
        df.withColumn(
            "rn",
            F.row_number().over(w.partitionBy("u").orderBy(F.desc("c"), F.asc("v"))),
        )
        .filter(F.col("rn") <= 5)
        .select("u", "v")
    )
    exact5 = top5(exact)
    os.environ["SPARK_GRAFT_KNN_CANDIDATES"] = "ann"
    try:
        ann5 = top5(_cosine_pairs(spark, SF))
    finally:
        del os.environ["SPARK_GRAFT_KNN_CANDIDATES"]
    n_exact = exact5.count()
    n_hit = exact5.join(ann5, ["u", "v"]).count()
    recall = n_hit / n_exact
    assert 0.15 <= recall < 1.0, f"ann top-5 recall {recall:.3f} out of expected band"


def test_blocked_numpy_fold_is_bit_exact_with_jvm(spark):
    """_exact_pairs_blocked accumulates the similarity block one dimension
    at a time so its IEEE addition sequence matches llm.dot's JVM fold
    (and DuckDB's list_reduce) bit-for-bit. Pin that equivalence on real
    fixture vectors — a future 'optimization' to a BLAS matmul would pass
    every tolerance check while flipping round4 at grid boundaries."""
    import numpy as np

    from pyspark.sql import functions as F

    from datapipelines_python_spark.operators._helpers import round4
    from datapipelines_python_spark.operators.llm import dot

    emb = (
        load_table(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(25)
    )
    rows = emb.collect()
    M = np.array([r["embedding"] for r in rows], dtype=np.float32).astype(
        np.float64
    )
    n, d = M.shape
    sims = np.zeros((n, n))
    for i in range(d):
        sims += np.outer(M[:, i], M[:, i])
    nrm = np.zeros(n)
    for i in range(d):
        nrm += M[:, i] * M[:, i]
    nrm = np.sqrt(nrm)
    c_np = np.floor(sims / np.outer(nrm, nrm) * 10000.0 + 0.5) / 10000.0

    a = emb.select(F.col("vec_id").alias("u"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("v"), F.col("embedding").alias("eb"))
    jvm = a.join(b).select(
        "u",
        "v",
        dot("ea", "eb").alias("dp"),
        round4(
            dot("ea", "eb")
            / (F.sqrt(dot("ea", "ea")) * F.sqrt(dot("eb", "eb")))
        ).alias("c"),
    )
    idx = {r["vec_id"]: i for i, r in enumerate(rows)}
    for r in jvm.collect():
        i, j = idx[r["u"]], idx[r["v"]]
        assert sims[i, j] == r["dp"], (r["u"], r["v"], sims[i, j], r["dp"])
        assert c_np[i, j] == r["c"], (r["u"], r["v"], c_np[i, j], r["c"])


def test_build_shard_invariance(spark):
    """VERDICT r6 #4: the broadcast-shard path (SPARK_GRAFT_KNN_BUILD_
    SHARDS) is the executable form of the 100 TB plan — S contiguous
    build-row blocks, one kernel pass per block, pooled re-window merges
    the per-block top-Ks. It must be BIT-exact with the S=1 single-
    broadcast kernel: same (u, v) membership and identical round4
    cosines, because per-pair folds don't depend on block membership and
    a globally-ranked row always survives its own block's top-K."""
    os.environ.pop("SPARK_GRAFT_KNN_CANDIDATES", None)
    base = _cosine_pairs(spark, SF)  # S=1 default
    rows1 = sorted(
        ((r["u"], r["v"], r["c"]) for r in base.collect()),
        key=lambda t: (t[0], t[1]),
    )
    os.environ["SPARK_GRAFT_KNN_BUILD_SHARDS"] = "4"
    try:
        sharded = _cosine_pairs(spark, SF)
        rows4 = sorted(
            ((r["u"], r["v"], r["c"]) for r in sharded.collect()),
            key=lambda t: (t[0], t[1]),
        )
        sharded.unpersist()
    finally:
        del os.environ["SPARK_GRAFT_KNN_BUILD_SHARDS"]
    assert len(rows1) == len(rows4)
    assert rows1 == rows4


def test_exact_build_budget_guard(spark, monkeypatch):
    """VERDICT r9 #5: the exact kernel's driver collect is CONDITIONAL.
    It measures the build side with a 1-row aggregate first and refuses
    past SPARK_GRAFT_KNN_EXACT_BUILD_BUDGET_MB with an UnsupportedError
    that names the scale path (SPARK_GRAFT_KNN_CANDIDATES=ann), instead
    of silently materializing an unbounded corpus on the driver."""
    import pytest

    from datapipelines_python_spark.operators.workloads import (
        _exact_pairs_blocked,
    )
    from datapipelines_python_spark.pipeline.common import UnsupportedError

    # ~1.6 MB estimated build side vs the 1 MiB budget floor
    big = spark.range(3000).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(1, 64), i -> CAST(id + i AS float))"
        ).alias("embedding"),
    )
    monkeypatch.setenv("SPARK_GRAFT_KNN_EXACT_BUILD_BUDGET_MB", "0")
    with pytest.raises(UnsupportedError, match="KNN_CANDIDATES=ann"):
        _exact_pairs_blocked(spark, big)


def test_auto_shard_matches_single_broadcast(spark, monkeypatch):
    """Round-10 auto-sharding (each broadcast block ≤ _KNN_SHARD_BYTES)
    must be bit-exact with the single-broadcast kernel — forced here by
    shrinking the block size so the sf0.001 build (~103 KiB) splits into
    4 blocks without any env knob."""
    import datapipelines_python_spark.operators.workloads as wl

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    base = sorted(
        ((r["u"], r["v"], r["c"]) for r in wl._exact_pairs_blocked(spark, emb).collect())
    )
    monkeypatch.setattr(wl, "_KNN_SHARD_BYTES", 32 << 10)
    auto = sorted(
        ((r["u"], r["v"], r["c"]) for r in wl._exact_pairs_blocked(spark, emb).collect())
    )
    assert base == auto and len(base) > 0
