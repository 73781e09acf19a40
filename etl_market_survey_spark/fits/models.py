"""Model functions for the grouped fits (reference SURVEY §2.9).

- ``gaussian``  — U2 (time_resolution_beta_scan.py:18-19).
- ``erf_model`` — U3 (fit_erf_and_calculate_calibration_factor.py:19-73);
  left/right mirror via ``sign``.
- ``landau``    — Moyal approximation of the Landau pdf (the reference
  uses the public pure-python ``landaupy``; Moyal is the standard
  closed-form stand-in with the same (mpv, xi) parameterization).
- ``langauss``  — U1 Landau⊗Gauss via numerical convolution on the
  sample grid (clean_beta_scan.py:60-83 semantics).

All pure numpy, vectorized, deterministic.
"""

from __future__ import annotations

import math

import numpy as np

_ERF = np.vectorize(math.erf, otypes=[float])


def gaussian(x, mu, sigma, amplitude=1.0):
    sigma = abs(sigma) + 1e-300
    return amplitude * np.exp(-(((x - mu) / sigma) ** 2) / 2)


def erf_model(x, y_scale, laser_sigma, x_offset, y_offset, sign=1.0):
    """Step-like transition of width ``laser_sigma`` centered at
    ``x_offset``; sign=+1 rising, -1 falling (mirrored pad)."""
    laser_sigma = abs(laser_sigma) + 1e-300
    z = (x - x_offset) / (laser_sigma * math.sqrt(2.0))
    return y_offset + y_scale / 2.0 * (1.0 + sign * _ERF(z))


def landau(x, mpv, xi):
    """Moyal approximation of the Landau density."""
    xi = abs(xi) + 1e-300
    lam = (x - mpv) / xi
    return np.exp(-(lam + np.exp(-lam)) / 2.0) / math.sqrt(2.0 * math.pi) / xi


def langauss(x, mpv, xi, sigma, amplitude=1.0):
    """Landau (Moyal) convolved with a Gaussian, evaluated at x.

    Numerical convolution over a +-5 sigma kernel on a uniform grid
    spanning the requested points — adequate for histogram fitting.
    """
    x = np.asarray(x, dtype=float)
    sigma = abs(sigma) + 1e-300
    xi = abs(xi) + 1e-300
    span = x.max() - x.min() if x.size > 1 else max(abs(sigma), xi)
    step = max(min(xi, sigma) / 4.0, span / 4000.0 if span > 0 else sigma / 4.0)
    grid = np.arange(x.min() - 5 * sigma, x.max() + 5 * sigma + step, step)
    ker_x = np.arange(-5 * sigma, 5 * sigma + step, step)
    kernel = gaussian(ker_x, 0.0, sigma)
    ksum = kernel.sum()
    if ksum <= 0:
        return amplitude * landau(x, mpv, xi)
    kernel = kernel / ksum
    conv = np.convolve(landau(grid, mpv, xi), kernel, mode="same")
    return amplitude * np.interp(x, grid, conv)
