"""Grid-blocked spatial neighbor join (operators/spatial) — q259 gates
content; these pin boundary/negative-coordinate correctness and the
no-cross-join plan shape."""

import pytest
from pyspark.sql import functions as F

from etl_market_survey_spark.operators.spatial import grid_neighbor_join


def _pairs(spark, rows, r):
    df = spark.createDataFrame(rows, "id long, x long, y long")
    return {
        (p["id_a"], p["id_b"], p["dist2"])
        for p in grid_neighbor_join(df, "id", "x", "y", r).collect()
    }


def test_boundary_inclusive_and_exact(spark):
    # distance exactly r is included; r+1 excluded
    got = _pairs(spark, [(1, 0, 0), (2, 5, 0), (3, 6, 0)], 5)
    assert (1, 2, 25) in got
    assert all(a != 1 or b != 3 for a, b, _ in got)


def test_negative_coordinates_floor_cells(spark):
    # points straddling 0 with negative coords: python-style floor
    # division must keep them in adjacent cells, not collapse at 0
    got = _pairs(spark, [(1, -3, -3), (2, 2, 2), (3, -300, -300)], 10)
    assert (1, 2, 50) in got
    assert not any(3 in (a, b) for a, b, _ in got)


def test_pairs_unique_no_duplicates(spark):
    # two points in the same cell must yield exactly one pair row
    df_rows = [(1, 100, 100), (2, 101, 101), (4, 102, 102)]
    rows = grid_neighbor_join(
        spark.createDataFrame(df_rows, "id long, x long, y long"),
        "id", "x", "y", 50,
    ).collect()
    keys = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(keys) == len(set(keys)) == 3


def test_no_cartesian_in_plan(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 7 % 97).alias("x"), (F.col("id") * 13 % 89).alias("y")
    )
    plan = grid_neighbor_join(df, "id", "x", "y", 10)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_invalid_radius(spark):
    df = spark.range(1).select("id", F.lit(0).alias("x"), F.lit(0).alias("y"))
    with pytest.raises(ValueError):
        grid_neighbor_join(df, "id", "x", "y", 0)


def test_point_in_polygon_known_cases(spark):
    from etl_market_survey_spark.operators.spatial import point_in_polygon

    square = [(0, 0), (10, 0), (10, 10), (0, 10)]
    # notch: the top dips to (5,5) — interior at x is y in (0, min(x, 10-x)+5)
    concave = [(0, 0), (10, 0), (10, 10), (5, 5), (0, 10)]
    pts = [
        (1, 5, 5),   # concave-polygon VERTEX -> boundary -> outside
        (2, 15, 5), (3, -1, 5), (4, 5, 15),
        (5, 5, 8),   # in the notch cut out of the concave polygon
        (6, 2, 7),   # below the notch edge y = 10 - x = 8 -> inside both
    ]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    sq = {r["id"]: r["inside"] for r in point_in_polygon(df, "x", "y", square).collect()}
    assert sq == {1: True, 2: False, 3: False, 4: False, 5: True, 6: True}
    cc = {r["id"]: r["inside"] for r in point_in_polygon(df, "x", "y", concave).collect()}
    assert cc[1] is False  # vertex: half-open boundary convention
    assert cc[5] is False  # notch
    assert cc[6] is True

    import pytest as _pytest

    with _pytest.raises(ValueError):
        point_in_polygon(df, "x", "y", [(0, 0), (1, 1)])
