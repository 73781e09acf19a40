"""Grouped fit operators: ``applyInPandas`` UDAFs (SURVEY §2.9 U1-U3).

Per-group semantics copied from the reference:
- histogram the samples with the numpy-'auto' policy (clean_beta_scan.py:65)
- data-driven initial guesses (argmax bin, MAD) (clean_beta_scan.py:73-75)
- fit; on failure emit a NaN row instead of raising
  (time_resolution_beta_scan.py:192-193 warn-and-continue semantics).

Scale notes: groups are repartitioned by key before the UDF; each group's
samples fit in one Arrow batch (the reference's groups are per-device /
per-voltage — thousands of rows). Order-insensitive: fits consume
histograms, so shuffle order cannot perturb results.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .curve_fit import curve_fit
from .models import erf_model, gaussian, langauss

K_MAD = 1.4826


def _auto_hist(samples: np.ndarray):
    """np.histogram(bins='auto') with density, plus edge extension —
    mirrors binned_fit_langauss's binning (clean_beta_scan.py:64-71)."""
    counts, edges = np.histogram(samples, bins="auto", density=True)
    centers = (edges[:-1] + edges[1:]) / 2
    return counts, centers


def fit_gaussian_samples(samples: np.ndarray) -> tuple[float, float, float, bool]:
    """U2 — (mu, sigma, amplitude, converged) from raw samples."""
    samples = samples[np.isfinite(samples)]
    if samples.size < 8:
        return (math.nan, math.nan, math.nan, False)
    counts, centers = _auto_hist(samples)
    med = float(np.median(samples))
    mad = float(np.median(np.abs(samples - med))) * K_MAD
    p0 = np.array([med, mad if mad > 0 else samples.std() + 1e-9, counts.max()])
    try:
        p, ok = curve_fit(gaussian, centers, counts, p0)
    except Exception:
        return (math.nan, math.nan, math.nan, False)
    if not ok:
        return (math.nan, math.nan, math.nan, False)
    return (float(p[0]), abs(float(p[1])), float(p[2]), True)


def fit_langauss_samples(samples: np.ndarray) -> tuple[float, float, float, bool]:
    """U1 — (mpv, xi, sigma, converged); guesses from argmax bin + MAD
    (clean_beta_scan.py:73-75).

    Scale-invariant: samples are standardized by (median, MAD) before the
    fit and the parameters mapped back, so picocoulomb-scale charges fit
    as reliably as O(1) values (finite-difference Jacobians lose precision
    on 1e-12-magnitude parameters otherwise).
    """
    samples = samples[np.isfinite(samples)]
    if samples.size < 16:
        return (math.nan, math.nan, math.nan, False)
    med = float(np.median(samples))
    mad = float(np.median(np.abs(samples - med))) * K_MAD
    scale = mad if mad > 0 else (float(samples.std()) or 1.0)
    z = (samples - med) / scale

    counts, centers = _auto_hist(z)
    mpv0 = float(centers[np.argmax(counts)])
    amp0 = float(counts.max())
    p0 = np.array([mpv0, 0.5, 0.5, amp0])

    def model(x, mpv, xi, sigma, amp):
        return langauss(x, mpv, xi, sigma, amplitude=1.0) * amp

    try:
        p, ok = curve_fit(model, centers, counts, p0)
    except Exception:
        return (math.nan, math.nan, math.nan, False)
    if not ok:
        return (math.nan, math.nan, math.nan, False)
    return (
        med + float(p[0]) * scale,
        abs(float(p[1])) * scale,
        abs(float(p[2])) * scale,
        True,
    )


def _landau_unit(x, mpv, xi):
    from .models import landau

    return landau(np.asarray(x, dtype=float), mpv, xi)


def fit_erf_xy(x: np.ndarray, y: np.ndarray, sign: float = 1.0):
    """U3 — (y_scale, laser_sigma, x_offset, y_offset, converged) with
    bounds like the reference lmfit model (fit_erf...py:49-63)."""
    m = np.isfinite(x) & np.isfinite(y)
    x, y = x[m], y[m]
    if x.size < 5:
        return (math.nan, math.nan, math.nan, math.nan, False)
    y_scale0 = float(y.max() - y.min()) or 1.0
    x_off0 = float(x[np.argmin(np.abs(y - (y.min() + y_scale0 / 2)))])
    sigma0 = float((x.max() - x.min()) / 10) or 1.0
    p0 = np.array([y_scale0, sigma0, x_off0, float(y.min())])
    span = float(x.max() - x.min()) or 1.0
    bounds = (
        np.array([y_scale0 * 0.1, sigma0 * 1e-3, float(x.min()) - span, float(y.min()) - y_scale0]),
        np.array([y_scale0 * 10, span, float(x.max()) + span, float(y.max())]),
    )

    def model(xx, y_scale, laser_sigma, x_offset, y_offset):
        return erf_model(xx, y_scale, laser_sigma, x_offset, y_offset, sign=sign)

    try:
        p, ok = curve_fit(model, x, y, p0, bounds=bounds)
    except Exception:
        return (math.nan, math.nan, math.nan, math.nan, False)
    if not ok:
        return (math.nan, math.nan, math.nan, math.nan, False)
    return (float(p[0]), abs(float(p[1])), float(p[2]), float(p[3]), True)


# ---------------------------------------------------------------------------
# Spark grouped wrappers
# ---------------------------------------------------------------------------

def fit_gaussian_per_group(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """groupBy(keys).applyInPandas gaussian fit -> one row per group."""
    keys = list(keys)
    key_fields = ", ".join(
        f"`{k}` {dict(df.dtypes)[k]}" for k in keys
    )
    schema = f"{key_fields}, mu double, sigma double, amplitude double, converged boolean"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        mu, sigma, amp, ok = fit_gaussian_samples(pdf[value_col].to_numpy(dtype=float))
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out.update({"mu": [mu], "sigma": [sigma], "amplitude": [amp], "converged": [ok]})
        return pd.DataFrame(out)

    return df.repartition(*[F.col(k) for k in keys]).groupBy(*keys).applyInPandas(fit, schema)


def fit_langauss_per_group(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """U1 per group -> (keys..., mpv, xi, sigma, converged)."""
    keys = list(keys)
    key_fields = ", ".join(f"`{k}` {dict(df.dtypes)[k]}" for k in keys)
    schema = f"{key_fields}, mpv double, xi double, sigma double, converged boolean"

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        mpv, xi, sigma, ok = fit_langauss_samples(pdf[value_col].to_numpy(dtype=float))
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out.update({"mpv": [mpv], "xi": [xi], "sigma": [sigma], "converged": [ok]})
        return pd.DataFrame(out)

    return df.repartition(*[F.col(k) for k in keys]).groupBy(*keys).applyInPandas(fit, schema)


def fit_erf_per_group(
    df: DataFrame,
    keys: Sequence[str],
    x_col: str,
    y_col: str,
    sign: float = 1.0,
) -> DataFrame:
    """U3 per group -> (keys..., y_scale, laser_sigma, x_offset, y_offset,
    converged)."""
    keys = list(keys)
    key_fields = ", ".join(f"`{k}` {dict(df.dtypes)[k]}" for k in keys)
    schema = (
        f"{key_fields}, y_scale double, laser_sigma double, x_offset double, "
        f"y_offset double, converged boolean"
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(x_col)
        ys, ls, xo, yo, ok = fit_erf_xy(
            pdf[x_col].to_numpy(dtype=float), pdf[y_col].to_numpy(dtype=float), sign
        )
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out.update(
            {"y_scale": [ys], "laser_sigma": [ls], "x_offset": [xo],
             "y_offset": [yo], "converged": [ok]}
        )
        return pd.DataFrame(out)

    return df.repartition(*[F.col(k) for k in keys]).groupBy(*keys).applyInPandas(fit, schema)
