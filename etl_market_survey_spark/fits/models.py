"""Model functions for the grouped fits (reference SURVEY §2.9).

- ``gaussian``  — U2 (time_resolution_beta_scan.py:18-19).
- ``erf_model`` — U3 (fit_erf_and_calculate_calibration_factor.py:19-73);
  left/right mirror via ``sign``.
- ``landau``    — true Landau density via the CERNLIB G110 ``DENLAN``
  piecewise rational approximation (Kölbig & Schorr, "A program package
  for the Landau distribution", Comput. Phys. Commun. 31 (1984) 97;
  the same published algorithm behind ROOT's TMath::Landau and the
  reference's ``landaupy``), with the MPV-shift convention so ``mpv``
  is the density's actual mode (clean_beta_scan.py:60-83 semantics).
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


# CERNLIB G110 DENLAN rational-approximation coefficients (Kölbig &
# Schorr 1984, CPC 31, 97) — the published piecewise fit of the Landau
# density in the standardized variable v; accuracy ~1e-6 everywhere.
_P1 = (0.4259894875, -0.1249762550, 0.03984243700, -0.006298287635, 0.001511162253)
_Q1 = (1.0, -0.3388260629, 0.09594393323, -0.01608042283, 0.003778942063)
_P2 = (0.1788541609, 0.1173957403, 0.01488850518, -0.001394989411, 0.0001283617211)
_Q2 = (1.0, 0.7428795082, 0.3153932961, 0.06694219548, 0.008790609714)
_P3 = (0.1788544503, 0.09359161662, 0.006325387654, 0.00006611667319, -0.000002031049101)
_Q3 = (1.0, 0.6097809921, 0.2560616665, 0.04746722384, 0.006957301675)
_P4 = (0.9874054407, 118.6723273, 849.2794360, -743.7792444, 427.0262186)
_Q4 = (1.0, 106.8615961, 337.6496214, 2016.712389, 1597.063511)
_P5 = (1.003675074, 167.5702434, 4789.711289, 21217.86767, -22324.94910)
_Q5 = (1.0, 156.9424537, 3745.310488, 9834.698876, 66924.28357)
_P6 = (1.000827619, 664.9143136, 62972.92665, 475554.6998, -5743609.109)
_Q6 = (1.0, 651.4101098, 56974.73333, 165917.4725, -2815759.939)
_A1 = (0.04166666667, -0.01996527778, 0.02709538966)
_A2 = (-1.845568670, -4.284640743)

#: location of the mode of the standardized Landau density (DENLAN's v
#: grid); ``landau(x, mpv, xi)`` shifts by this so mpv IS the mode —
#: landaupy's pdf(x, x_mpv, xi) convention, which the reference fits.
_MPV_SHIFT = -0.22278298


def _poly(cs, v):
    out = np.full_like(v, cs[-1])
    for c in cs[-2::-1]:
        out = out * v + c
    return out


def _denlan(v):
    """Standardized Landau density φ(v), vectorized piecewise DENLAN."""
    v = np.asarray(v, dtype=float)
    out = np.zeros_like(v)

    m = v < -5.5
    if m.any():
        u = np.exp(v[m] + 1.0)
        with np.errstate(divide="ignore", over="ignore"):
            val = np.where(
                u < 1e-10,
                0.0,
                0.3989422803
                * (np.exp(-1.0 / np.maximum(u, 1e-300)) / np.sqrt(np.maximum(u, 1e-300)))
                * (1.0 + (_A1[0] + (_A1[1] + _A1[2] * u) * u) * u),
            )
        out[m] = val
    m = (v >= -5.5) & (v < -1.0)
    if m.any():
        vm = v[m]
        u = np.exp(-vm - 1.0)
        out[m] = np.exp(-u) * np.sqrt(u) * _poly(_P1, vm) / _poly(_Q1, vm)
    m = (v >= -1.0) & (v < 1.0)
    if m.any():
        out[m] = _poly(_P2, v[m]) / _poly(_Q2, v[m])
    m = (v >= 1.0) & (v < 5.0)
    if m.any():
        out[m] = _poly(_P3, v[m]) / _poly(_Q3, v[m])
    m = (v >= 5.0) & (v < 12.0)
    if m.any():
        u = 1.0 / v[m]
        out[m] = u * u * _poly(_P4, u) / _poly(_Q4, u)
    m = (v >= 12.0) & (v < 50.0)
    if m.any():
        u = 1.0 / v[m]
        out[m] = u * u * _poly(_P5, u) / _poly(_Q5, u)
    m = (v >= 50.0) & (v < 300.0)
    if m.any():
        u = 1.0 / v[m]
        out[m] = u * u * _poly(_P6, u) / _poly(_Q6, u)
    m = v >= 300.0
    if m.any():
        vm = v[m]
        u = 1.0 / (vm - vm * np.log(vm) / (vm + 1.0))
        out[m] = u * u * (1.0 + (_A2[0] + _A2[1] * u) * u)
    return out


def landau(x, mpv, xi):
    """Landau density with mode at ``mpv`` and width ``xi`` (DENLAN;
    same heavy right tail as the reference's landaupy, unlike the Moyal
    closed form which systematically underweights it)."""
    xi = abs(xi) + 1e-300
    x = np.asarray(x, dtype=float)
    x0 = mpv - _MPV_SHIFT * xi  # shift so the mode sits at mpv
    return _denlan((x - x0) / xi) / xi


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
