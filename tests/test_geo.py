"""Geo operator invariants the fixtures may not exercise.

The md5-derived fixture coordinates only rarely straddle the ±180°
antimeridian, so the blocked radius join's longitude wrap (found by
review: an unwrapped 1° grid silently drops cross-seam neighbors that
the periodic haversine oracle counts) is pinned here directly on the
cell expressions, plus the geohash test vector."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_store_neighborhood_wraps_at_antimeridian(spark):
    # the exact cell expression join_geo_bucketed explodes on the store side
    expr = (
        "flatten(transform(sequence(-1, 1), dy ->"
        " transform(sequence(-1, 1), dx ->"
        " struct(CAST(floor(lat) + dy AS INT) AS cy,"
        "        CAST(pmod(floor(lon) + dx + 180, 360) - 180 AS INT) AS cx))))"
    )
    df = spark.createDataFrame(
        [(-179.95, 10.0), (179.90, 10.0)], "lon double, lat double"
    ).select("lon", F.explode(F.expr(expr)).alias("cell"))
    cells = {
        (r["lon"], r["cell"]["cx"]) for r in df.collect()
    }
    # west-of-seam store probes the east-of-seam cell and vice versa
    assert (-179.95, 179) in cells
    assert (179.90, -180) in cells
    # and no out-of-range cells survive
    assert all(-180 <= cx <= 179 for _, cx in cells)


def test_geohash_known_vector(spark):
    # canonical reference point (57.64911, 10.40744) -> geohash 'u4pruy'
    from datapipelines_python_spark.operators.scalar_functions import _GEOHASH32

    df = spark.createDataFrame([(57.64911, 10.40744)], "lat double, lon double")
    bits = df.select(
        F.floor((F.col("lat") + 90.0) / 180.0 * 32768.0).cast("bigint").alias("latb"),
        F.floor((F.col("lon") + 180.0) / 360.0 * 32768.0).cast("bigint").alias("lonb"),
    )
    inter = bits.withColumn(
        "v",
        F.expr(
            "aggregate(sequence(0, 14), 0L, (acc, k) -> acc"
            " + shiftleft(shiftright(lonb, k) & 1, 2*k + 1)"
            " + shiftleft(shiftright(latb, k) & 1, 2*k))"
        ),
    )
    gh = inter.select(
        F.expr(
            "array_join(transform(sequence(0, 5), j -> "
            f"substring('{_GEOHASH32}', CAST((shiftright(v, 5 * (5 - j)) & 31) + 1 AS INT), 1)), '')"
        ).alias("gh")
    ).first()["gh"]
    assert gh == "u4pruy"
