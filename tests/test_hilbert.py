"""Hilbert index (operators/hilbert) — q274 pins the arithmetic vs SQL;
this unit proves the DEFINING property: consecutive indices are unit
steps in (x, y) — the locality guarantee Z-order lacks."""

from pyspark.sql import functions as F

from etl_market_survey_spark.operators.hilbert import with_hilbert


def test_full_order4_curve_is_a_unit_step_tour(spark):
    n = 16  # order-4: the full 16x16 grid, 256 cells
    grid = spark.range(n * n).select(
        (F.col("id") % n).alias("x"), (F.col("id") / n).cast("long").alias("y")
    )
    rows = (
        with_hilbert(grid, "x", "y", order=4)
        .orderBy("hilbert_d")
        .collect()
    )
    assert len(rows) == n * n
    # a bijection onto [0, 256)
    assert [r["hilbert_d"] for r in rows] == list(range(n * n))
    # every consecutive pair of indices is one grid step apart
    for a, b in zip(rows, rows[1:]):
        assert abs(a["x"] - b["x"]) + abs(a["y"] - b["y"]) == 1
