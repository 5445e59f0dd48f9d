"""Pin the divergence classes the driver-hasher parity harness
(scripts/driver_hash_parity.py) exists to catch — the classes
check_oracle.py's collect()/fetchall() path is structurally blind to
(VERDICT r5 "Next round" #7).

Class 1 (r5's actual driver reds): DuckDB returns uncast integer SUM as
HUGEINT; pandas ``fetchdf()`` converts HUGEINT to float64, so the driver
hashes 2648.0 against Spark's int64 2648 — red — while fetchall() yields
a Python int on both sides and check_oracle passes. test_registry.py's
DESCRIBE lint now forbids HUGEINT oracle outputs.

Class 2: raw doubles differing in the last ulp render differently under
shortest-round-trip repr — the parity harness is bit-exact where a
tolerance comparison would hide the driver-visible difference.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)

from driver_hash_parity import dtype_family, frame_digest, render_cell


def test_hugeint_fetchdf_renders_float64():
    """The r5 mechanism, reproduced from first principles: an uncast
    integer SUM comes back float64 through fetchdf and hashes differently
    from the int64 frame, while the CAST AS BIGINT twin hashes equal."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1, 10), (1, 20), (2, 5)) v(k, x)")
    uncast = con.execute("SELECT k, SUM(x) AS s FROM t GROUP BY k ORDER BY k").fetchdf()
    cast = con.execute(
        "SELECT k, CAST(SUM(x) AS BIGINT) AS s FROM t GROUP BY k ORDER BY k"
    ).fetchdf()
    spark_like = pd.DataFrame({"k": [1, 2], "s": [30, 5]}).astype("int64")

    assert dtype_family(uncast["s"].dtype) == "float"
    assert dtype_family(cast["s"].dtype) == "int"
    h_spark, _, _ = frame_digest(spark_like)
    h_uncast, _, _ = frame_digest(uncast)
    h_cast, _, _ = frame_digest(cast)
    assert h_uncast != h_spark  # the r5 red
    assert h_cast == h_spark  # the fix


def test_last_ulp_doubles_hash_differently():
    a = pd.DataFrame({"x": [0.1 + 0.2]})
    b = pd.DataFrame({"x": [0.3]})
    assert abs(a["x"][0] - b["x"][0]) < 1e-15  # tolerance compare passes
    ha, _, _ = frame_digest(a)
    hb, _, _ = frame_digest(b)
    assert ha != hb  # driver-style bit-exact rendering catches it


def test_render_cell_sentinels():
    import numpy as np

    assert render_cell(None) == "<NULL>"
    assert render_cell(float("nan")) == "<NaN>"
    assert render_cell(float("inf")) == "<+Inf>"
    assert render_cell(np.int64(5)) == "5"
    assert render_cell(np.float64(5.0)) == "5.0"  # float 5 ≠ int 5
    assert render_cell(pd.NaT) == "<NULL>"


def test_date_renders_as_midnight_instant():
    """Spark toPandas yields datetime.date objects for DATE columns while
    DuckDB fetchdf yields midnight datetime64 — the driver hashes DATE
    clean (r2 diag probe), so the harness must align the two renderings
    (32 date-bearing, driver-green ops false-FAILed before the fix)."""
    import datetime

    d = datetime.date(1999, 5, 7)
    ts = pd.Timestamp("1999-05-07")
    assert render_cell(d) == render_cell(ts) == "1999-05-07T00:00:00"
    # true sub-day instants stay distinct from the date
    assert render_cell(pd.Timestamp("1999-05-07 13:30:00")) != render_cell(d)
    spark_like = pd.DataFrame({"d": [d]})  # object dtype of date
    duck_like = pd.DataFrame({"d": [ts]})  # datetime64
    assert frame_digest(spark_like)[0] == frame_digest(duck_like)[0]
